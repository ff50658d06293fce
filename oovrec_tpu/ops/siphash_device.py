"""On-device SipHash-2-4 for DHE (SURVEY §2.9: replace the host csiphash
call with hashing that runs per batch on the TPU).

TPU has no int64, so the 64-bit lanes are emulated as uint32 (lo, hi)
pairs — adds carry via unsigned compare, rotations split across the two
words. Bit-exact against the host oracle (`ops/siphash.py`), tested in
tests/test_dhe.py.

The host ships each (possibly prime-padded) int64 id as two int32 columns
(`<field>_dhe_lo/_dhe_hi`, 4× less transfer than the (B, 128) float hash
matrix) and the model hashes against the 128 keys on device.

Reference: `recbole/inductive/dh_embedder.py:137-152` (csiphash per id).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

MAX_HASH = 16_777_216  # 2^24, `dh_embedder.py:53`

_U = jnp.uint32


def _add64(alo, ahi, blo, bhi):
    lo = alo + blo
    carry = (lo < alo).astype(_U)
    return lo, ahi + bhi + carry


def _rotl64(lo, hi, b: int):
    if b == 32:
        return hi, lo
    if b < 32:
        return ((lo << b) | (hi >> (32 - b)),
                (hi << b) | (lo >> (32 - b)))
    b -= 32
    return ((hi << b) | (lo >> (32 - b)),
            (lo << b) | (hi >> (32 - b)))


def _sipround(s):
    v0l, v0h, v1l, v1h, v2l, v2h, v3l, v3h = s
    v0l, v0h = _add64(v0l, v0h, v1l, v1h)
    v1l, v1h = _rotl64(v1l, v1h, 13)
    v1l, v1h = v1l ^ v0l, v1h ^ v0h
    v0l, v0h = _rotl64(v0l, v0h, 32)
    v2l, v2h = _add64(v2l, v2h, v3l, v3h)
    v3l, v3h = _rotl64(v3l, v3h, 16)
    v3l, v3h = v3l ^ v2l, v3h ^ v2h
    v0l, v0h = _add64(v0l, v0h, v3l, v3h)
    v3l, v3h = _rotl64(v3l, v3h, 21)
    v3l, v3h = v3l ^ v0l, v3h ^ v0h
    v2l, v2h = _add64(v2l, v2h, v1l, v1h)
    v1l, v1h = _rotl64(v1l, v1h, 17)
    v1l, v1h = v1l ^ v2l, v1h ^ v2h
    v2l, v2h = _rotl64(v2l, v2h, 32)
    return v0l, v0h, v1l, v1h, v2l, v2h, v3l, v3h


def siphash24_u32(msg_lo, msg_hi, k0_lo, k0_hi, k1_lo, k1_hi):
    """(B,) uint32 msg halves × (K,) uint32 key halves → (B, K) digest
    halves (lo, hi). 8-byte message (the id), SipHash-2-4."""
    ml = msg_lo.astype(_U)[:, None]
    mh = msg_hi.astype(_U)[:, None]
    shape = jnp.broadcast_shapes(ml.shape, k0_lo[None, :].shape)

    def bc(x):
        return jnp.broadcast_to(x, shape).astype(_U)

    v0l = bc(jnp.uint32(0x70736575) ^ k0_lo)
    v0h = bc(jnp.uint32(0x736F6D65) ^ k0_hi)
    v1l = bc(jnp.uint32(0x6E646F6D) ^ k1_lo)
    v1h = bc(jnp.uint32(0x646F7261) ^ k1_hi)
    v2l = bc(jnp.uint32(0x6E657261) ^ k0_lo)
    v2h = bc(jnp.uint32(0x6C796765) ^ k0_hi)
    v3l = bc(jnp.uint32(0x79746573) ^ k1_lo)
    v3h = bc(jnp.uint32(0x74656462) ^ k1_hi)

    ml, mh = bc(ml), bc(mh)
    v3l, v3h = v3l ^ ml, v3h ^ mh
    s = (v0l, v0h, v1l, v1h, v2l, v2h, v3l, v3h)
    s = _sipround(s)
    s = _sipround(s)
    v0l, v0h, v1l, v1h, v2l, v2h, v3l, v3h = s
    v0l, v0h = v0l ^ ml, v0h ^ mh
    bh = jnp.uint32(8 << 24)  # b = (8-byte length) << 56, high word only
    v3h = v3h ^ bh
    s = (v0l, v0h, v1l, v1h, v2l, v2h, v3l, v3h)
    s = _sipround(s)
    s = _sipround(s)
    v0l, v0h, v1l, v1h, v2l, v2h, v3l, v3h = s
    v0h = v0h ^ bh
    v2l = v2l ^ jnp.uint32(0xFF)
    s = (v0l, v0h, v1l, v1h, v2l, v2h, v3l, v3h)
    for _ in range(4):
        s = _sipround(s)
    v0l, v0h, v1l, v1h, v2l, v2h, v3l, v3h = s
    return v0l ^ v1l ^ v2l ^ v3l, v0h ^ v1h ^ v2h ^ v3h


def dhe_codes_device(msg_lo, msg_hi, key_parts) -> jnp.ndarray:
    """(B,) id halves → (B, K) float32 of digests % 2^24 (the DHE input).
    `key_parts` = tuple of 4 (K,) uint32 arrays from `split_keys`."""
    lo, _hi = siphash24_u32(msg_lo, msg_hi, *key_parts)
    return (lo & jnp.uint32(MAX_HASH - 1)).astype(jnp.float32)


def split_keys(keys_u64: np.ndarray):
    """(K, 2) uint64 host keys → 4 (K,) uint32 device arrays."""
    k = np.asarray(keys_u64, dtype=np.uint64)
    return (
        jnp.asarray((k[:, 0] & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
        jnp.asarray((k[:, 0] >> np.uint64(32)).astype(np.uint32)),
        jnp.asarray((k[:, 1] & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
        jnp.asarray((k[:, 1] >> np.uint64(32)).astype(np.uint32)),
    )


def split_ids(ids: np.ndarray):
    """(B,) int64 host ids → two int32 halves (shipped to device)."""
    u = np.asarray(ids, dtype=np.int64).astype(np.uint64)
    return ((u & np.uint64(0xFFFFFFFF)).astype(np.int32),
            (u >> np.uint64(32)).astype(np.int32))
