"""On-device OOV bucket hashing — int64 semantics on uint32 pairs.

The bucket hash family (`inductive/hashes.py`, bit-exact vs the
reference's `random_mapper.py:70-114`) operates on int64 with wraparound
multiplies and arithmetic shifts. TPUs have no native int64, so the host
normally hashes and ships int32 bucket columns. The device-resident OOV
sub-epoch (train/device_epoch.py) needs the same hashes INSIDE a jitted
program; this module emulates them on (hi, lo) uint32 pairs — the same
technique as ops/siphash_device.py — bit-exactly (parity-tested against
the host implementations in tests/test_device_epoch.py).

Supported: '3round' (default), 'fast', '64bit', 'mod'.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# NOTE all constants here are NumPy scalars, never jnp arrays: a jnp
# scalar is a device-resident Array that jax may LIFT into a hidden
# computation parameter instead of baking as a literal (observed when a
# mesh-traced program created it first — the next single-device program
# then expects an extra argument its caller never supplies). NumPy
# scalars always lower to literals.
_MASK16 = np.uint32(0xFFFF)


def _mul32(a, b):
    """uint32 × uint32 → (hi, lo) uint32 (full 64-bit product)."""
    a0, a1 = a & _MASK16, a >> 16
    b0, b1 = b & _MASK16, b >> 16
    ll = a0 * b0
    lh = a0 * b1
    hl = a1 * b0
    hh = a1 * b1
    mid = (ll >> 16) + (lh & _MASK16) + (hl & _MASK16)
    lo = (ll & _MASK16) | ((mid & _MASK16) << 16)
    hi = hh + (lh >> 16) + (hl >> 16) + (mid >> 16)
    return hi, lo


def _mul64_const(ah, al, c: int):
    """(ah, al) * c mod 2^64 for a python constant c."""
    ch = np.uint32((c >> 32) & 0xFFFFFFFF)
    cl = np.uint32(c & 0xFFFFFFFF)
    hi1, lo = _mul32(al, cl)
    hi = hi1 + al * ch + ah * cl
    return hi, lo


def _add64_const(ah, al, c: int):
    ch = np.uint32((c >> 32) & 0xFFFFFFFF)
    cl = np.uint32(c & 0xFFFFFFFF)
    lo = al + cl
    carry = (lo < al).astype(jnp.uint32)
    return ah + ch + carry, lo


def _shr64(ah, al, k: int, arithmetic: bool):
    """Shift right by 1 ≤ k ≤ 31 (arithmetic = sign-extending int64)."""
    lo = (al >> k) | (ah << (32 - k))
    hi = ah >> k
    if arithmetic:
        sign = -(ah >> 31)  # 0 or 0xFFFFFFFF (uint32 wraparound)
        hi = hi | (sign << (32 - k))
    return hi, lo


def _xor_shr(ah, al, k: int, arithmetic: bool = True):
    sh, sl = _shr64(ah, al, k, arithmetic)
    return ah ^ sh, al ^ sl


def _three_round(ah, al):
    """`three_round_int_hash` (hashes.py:50-61), int64 semantics."""
    ah, al = _xor_shr(ah, al, 17)
    ah, al = _mul64_const(ah, al, 0xED5AD4BB)
    ah, al = _xor_shr(ah, al, 11)
    ah, al = _mul64_const(ah, al, 0xAC4C1B51)
    ah, al = _xor_shr(ah, al, 15)
    ah, al = _mul64_const(ah, al, 0x31848BAB)
    ah, al = _xor_shr(ah, al, 14)
    return ah, al


def _fast(ah, al):
    """`fast_int_hash` (hashes.py:38-47)."""
    ah, al = _xor_shr(ah, al, 16)
    ah, al = _mul64_const(ah, al, 0x21F0AAAD)
    ah, al = _xor_shr(ah, al, 15)
    ah, al = _mul64_const(ah, al, 0xD35A2D97)
    ah, al = _xor_shr(ah, al, 15)
    return ah, al


def _splitmix_swapped(ah, al):
    """`big_64bit_hash` core (hashes.py:64-79) — uint64, logical shifts,
    byte-swapped splitmix constants (checkpoint-compat quirk)."""
    ah, al = _xor_shr(ah, al, 30, arithmetic=False)
    ah, al = _mul64_const(ah, al, 0xB9E5E41C6D4758BF)
    ah, al = _xor_shr(ah, al, 27, arithmetic=False)
    ah, al = _mul64_const(ah, al, 0xEB113113BB49D094)
    ah, al = _xor_shr(ah, al, 31, arithmetic=False)
    return ah, al


def _mod64(ah, al, b: int, signed: bool):
    """(ah, al) mod b with int64 floor-mod (signed) or uint64 semantics.

    b must stay ≤ 2^16 so every intermediate product fits uint32 —
    OOV bucket counts are thousands, far below that."""
    assert 0 < b <= (1 << 16), f"n_buckets {b} too large for device mod"
    b32 = np.uint32(b)
    two32_mod = np.uint32((1 << 32) % b)
    u_mod = ((ah % b32) * two32_mod + (al % b32)) % b32
    if signed:
        # signed value = U − 2^64·sign; floor-mod stays non-negative
        corr = np.uint32((b - ((1 << 64) % b)) % b)
        sign = ah >> 31
        u_mod = (u_mod + sign * corr) % b32
    return u_mod.astype(jnp.int32)


def sim_buckets_device(ids, n_original: int, n_buckets: int,
                       hash_function: str, prime_pad: int):
    """Bucket of `id + prime_pad` under the mapper's hash — the device
    twin of `OOVSimulator._sim_buckets` (inductive/transform.py:47-50):
    hash((id + prime_pad) − n_original) % n_buckets, bit-exact vs the
    host `hashes.hash_ids` path."""
    al = ids.astype(jnp.uint32)
    ah = jnp.zeros_like(al)
    k = prime_pad - n_original  # ids ≥ 0 and k > 0 in every real config
    assert k >= 0, "prime_pad must exceed n_original"
    ah, al = _add64_const(ah, al, k)
    if hash_function == "mod":
        return _mod64(ah, al, n_buckets, signed=True)
    if hash_function == "3round":
        ah, al = _three_round(ah, al)
        return _mod64(ah, al, n_buckets, signed=True)
    if hash_function == "fast":
        ah, al = _fast(ah, al)
        return _mod64(ah, al, n_buckets, signed=True)
    if hash_function == "64bit":
        ah, al = _splitmix_swapped(ah, al)
        return _mod64(ah, al, n_buckets, signed=False)
    raise NotImplementedError(hash_function)
