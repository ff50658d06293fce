"""SipHash-2-4 for DHE hashing (csiphash replacement).

Three implementations, picked in order:
  1. native C++ (`native/siphash.cpp`), built on first use with the system
     compiler and loaded via ctypes — the production path;
  2. vectorized NumPy uint64 (B×K fully vectorized) — always available;
  3. a pure-python scalar version used as the test oracle.

All operate on 8-byte little-endian messages (the reference hashes
`id.to_bytes(8, 'little')`, `dh_embedder.py:137,152`) with 16-byte keys.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_LIB_TRIED = False

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")


def _load_native() -> Optional[ctypes.CDLL]:
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    so = os.path.join(_NATIVE_DIR, "libsiphash.so")
    src = os.path.join(_NATIVE_DIR, "siphash.cpp")
    try:
        if not os.path.isfile(so) or os.path.getmtime(so) < os.path.getmtime(src):
            for cc in ("c++", "g++", "cc"):
                try:
                    subprocess.run(
                        [cc, "-O3", "-shared", "-fPIC", src, "-o", so],
                        check=True, capture_output=True, timeout=120,
                    )
                    break
                except (FileNotFoundError, subprocess.CalledProcessError):
                    continue
        lib = ctypes.CDLL(so)
        lib.siphash24_batch.argtypes = [
            ctypes.POINTER(ctypes.c_uint64), ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_uint64), ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_uint64),
        ]
        lib.siphash24_batch.restype = None
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def keys_to_u64(keys_bytes) -> np.ndarray:
    """List of 16-byte keys → (K, 2) uint64 little-endian halves."""
    out = np.empty((len(keys_bytes), 2), dtype=np.uint64)
    for i, k in enumerate(keys_bytes):
        out[i, 0] = int.from_bytes(k[:8], "little")
        out[i, 1] = int.from_bytes(k[8:], "little")
    return out


def siphash24_batch(msgs: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """(B,) uint64 msgs × (K, 2) uint64 keys → (B, K) uint64 digests."""
    msgs = np.ascontiguousarray(msgs, dtype=np.uint64)
    keys = np.ascontiguousarray(keys, dtype=np.uint64)
    lib = _load_native()
    if lib is not None:
        out = np.empty((len(msgs), len(keys)), dtype=np.uint64)
        lib.siphash24_batch(
            msgs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            len(msgs),
            keys.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            len(keys),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        )
        return out
    return _siphash24_numpy(msgs, keys)


def _siphash24_numpy(msgs: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """Vectorized over the full (B, K) grid in uint64."""
    u64 = np.uint64

    def rotl(x, b):
        return (x << u64(b)) | (x >> u64(64 - b))

    k0 = keys[:, 0][None, :]
    k1 = keys[:, 1][None, :]
    m = msgs[:, None]
    with np.errstate(over="ignore"):
        v0 = u64(0x736F6D6570736575) ^ k0
        v1 = u64(0x646F72616E646F6D) ^ k1
        v2 = u64(0x6C7967656E657261) ^ k0
        v3 = u64(0x7465646279746573) ^ k1
        v0 = np.broadcast_to(v0, (len(msgs), len(keys))).copy()
        v1 = np.broadcast_to(v1, v0.shape).copy()
        v2 = np.broadcast_to(v2, v0.shape).copy()
        v3 = np.broadcast_to(v3, v0.shape).copy()

        def sipround(v0, v1, v2, v3):
            v0 += v1
            v1 = rotl(v1, 13)
            v1 ^= v0
            v0 = rotl(v0, 32)
            v2 += v3
            v3 = rotl(v3, 16)
            v3 ^= v2
            v0 += v3
            v3 = rotl(v3, 21)
            v3 ^= v0
            v2 += v1
            v1 = rotl(v1, 17)
            v1 ^= v2
            v2 = rotl(v2, 32)
            return v0, v1, v2, v3

        v3 ^= m
        v0, v1, v2, v3 = sipround(v0, v1, v2, v3)
        v0, v1, v2, v3 = sipround(v0, v1, v2, v3)
        v0 ^= m
        b = u64(8 << 56)
        v3 ^= b
        v0, v1, v2, v3 = sipround(v0, v1, v2, v3)
        v0, v1, v2, v3 = sipround(v0, v1, v2, v3)
        v0 ^= b
        v2 ^= u64(0xFF)
        for _ in range(4):
            v0, v1, v2, v3 = sipround(v0, v1, v2, v3)
        return v0 ^ v1 ^ v2 ^ v3


def siphash24_py(key: bytes, msg: bytes) -> bytes:
    """Scalar pure-python SipHash-2-4 (test oracle; full message support)."""
    MASK = (1 << 64) - 1

    def rotl(x, b):
        return ((x << b) | (x >> (64 - b))) & MASK

    k0 = int.from_bytes(key[:8], "little")
    k1 = int.from_bytes(key[8:], "little")
    v0 = 0x736F6D6570736575 ^ k0
    v1 = 0x646F72616E646F6D ^ k1
    v2 = 0x6C7967656E657261 ^ k0
    v3 = 0x7465646279746573 ^ k1

    def sipround():
        nonlocal v0, v1, v2, v3
        v0 = (v0 + v1) & MASK
        v1 = rotl(v1, 13)
        v1 ^= v0
        v0 = rotl(v0, 32)
        v2 = (v2 + v3) & MASK
        v3 = rotl(v3, 16)
        v3 ^= v2
        v0 = (v0 + v3) & MASK
        v3 = rotl(v3, 21)
        v3 ^= v0
        v2 = (v2 + v1) & MASK
        v1 = rotl(v1, 17)
        v1 ^= v2
        v2 = rotl(v2, 32)

    b = len(msg)
    full = b // 8
    for i in range(full):
        mi = int.from_bytes(msg[8 * i : 8 * i + 8], "little")
        v3 ^= mi
        sipround()
        sipround()
        v0 ^= mi
    last = (b & 0xFF) << 56
    tail = msg[8 * full :]
    for i, ch in enumerate(tail):
        last |= ch << (8 * i)
    v3 ^= last
    sipround()
    sipround()
    v0 ^= last
    v2 ^= 0xFF
    for _ in range(4):
        sipround()
    return ((v0 ^ v1 ^ v2 ^ v3) & MASK).to_bytes(8, "little")
