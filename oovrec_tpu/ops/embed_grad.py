"""Embedding gathers whose BACKWARD is a one-hot matmul, not a scatter.

XLA's TPU scatter-add executes ~70 ns/row serialized (measured,
EXPERIMENTS.md round 4): materializing dense embedding grads for a
40k-row batch costs ~2.9 ms/step — the single largest item in the CTR
train step. Rewriting the transpose-of-gather as
    dtable = onehot(ids)ᵀ @ g
lets XLA lower it through the MXU path instead (measured 0.67 ms f32 /
0.48 ms bf16 at the same shape — 4-6×), with full f32 accumulation, and
it IS the mathematical adjoint (duplicate ids sum).

`gather_rows(table, ids)` is a drop-in `table[ids]` whose VJP uses the
one-hot form on TPU and the plain `.at[ids].add` elsewhere (a dense
one-hot matmul on CPU would be catastrophically slow).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


import os

# XLA's TPU scatter-add runs ~70 ns/row regardless of table size; the
# one-hot matmul costs 2·V·R·D flops. A controlled in-program A/B on the
# v5e (bench shapes, EXPERIMENTS round 4) measured the one-hot backward
# 3× SLOWER than the scatter for LARGE tables (xDeepFM 7.4→23.7 ms, BPR
# 3.1M→1.6M ex/s) — an earlier isolated probe suggesting a 6× win was
# invalid (only one output element was consumed, so XLA sliced the matmul
# away). For SMALL vocabularies the matmul is trivial (V·R·D flops ≪ the
# 70 ns/row serialization), so the backward picks per table.
SMALL_VOCAB_ONEHOT = 4096


def _use_onehot(n_rows: int) -> bool:
    flag = os.environ.get("OOVREC_ONEHOT_GRADS", "auto")
    if flag in ("0", "false"):
        return False
    if flag in ("1", "true"):
        return True
    return (
        n_rows <= SMALL_VOCAB_ONEHOT
        and jax.devices()[0].platform == "tpu"
    )


def onehot_scatter_add(n_rows: int, ids: jnp.ndarray,
                       vals: jnp.ndarray) -> jnp.ndarray:
    """Σ_b onehot(ids[b]) · vals[b] → (n_rows, D): the scatter-add adjoint
    of a row gather, expressed as a comparison matmul (TPU-fast form)."""
    oh = (
        ids[None, :] == jnp.arange(n_rows, dtype=ids.dtype)[:, None]
    ).astype(vals.dtype)
    return jax.lax.dot_general(
        oh, vals, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(vals.dtype)


from functools import lru_cache


@lru_cache(maxsize=None)
def _gather_fn(n_rows: int):
    # the table row count is static per call site — closed over (custom_vjp
    # residuals must be JAX types, so it can't ride in them)
    @jax.custom_vjp
    def f(table, ids):
        return jnp.asarray(table)[ids]

    def fwd(table, ids):
        return jnp.asarray(table)[ids], ids

    def bwd(ids, g):
        flat_ids = ids.reshape(-1)
        flat_g = g.reshape(-1, g.shape[-1])
        if _use_onehot(n_rows):
            dtable = onehot_scatter_add(n_rows, flat_ids, flat_g)
        else:
            dtable = jnp.zeros(
                (n_rows, flat_g.shape[-1]), flat_g.dtype
            ).at[flat_ids].add(flat_g)
        return dtable, None

    f.defvjp(fwd, bwd)
    return f


def gather_rows(table: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    """`table[ids]` with a one-hot-matmul backward on TPU."""
    return _gather_fn(int(table.shape[0]))(table, ids)


@lru_cache(maxsize=None)
def _packed_gather_fn(dims: tuple, offsets: tuple, n_rows: int,
                      _backend: str = ""):
    """Packed-field gather (B, F) → (B, F, D) over one offset-packed
    table, with a field-split backward: big-vocab fields scatter-add
    (70 ns/row is the floor XLA gives us), small-vocab fields go through
    the one-hot matmul into their own table region (trivial flops) and a
    dynamic-update-slice — the regions are disjoint by construction."""
    big = tuple(
        i for i, d in enumerate(dims) if not _use_onehot(int(d))
    )
    small = tuple(i for i in range(len(dims)) if i not in big)

    def _gather_mixed(table, ids):
        """Forward: XLA's TPU gather is row-serialized (~4-8 ns/row
        measured — 0.48 ms/step at bench shapes for the full (B, F)
        matrix), so only BIG-vocab fields gather; small-vocab fields
        select their row by an exact one-hot matmul against their own
        contiguous table slice (one nonzero per row → bit-identical)."""
        if not small:
            return jnp.asarray(table)[ids]
        table = jnp.asarray(table)
        D = table.shape[-1]
        cols = [None] * len(dims)
        if big:
            bi = jnp.stack([ids[:, i] for i in big], axis=1)
            bg = table[bi]                          # (B, n_big, D)
            for k, i in enumerate(big):
                cols[i] = bg[:, k]
        for i in small:
            d_i, off = int(dims[i]), int(offsets[i])
            seg = jax.lax.slice(table, (off, 0), (off + d_i, D))
            oh = (
                ids[:, i:i + 1] - off
                == jnp.arange(d_i, dtype=ids.dtype)[None, :]
            ).astype(table.dtype)
            cols[i] = oh @ seg
        return jnp.stack(cols, axis=1)

    @jax.custom_vjp
    def f(table, ids):
        return _gather_mixed(table, ids)

    def fwd(table, ids):
        return _gather_mixed(table, ids), ids

    def bwd(ids, g):
        D = g.shape[-1]
        dtable = jnp.zeros((n_rows, D), g.dtype)
        if big:
            bi = jnp.stack([ids[:, i] for i in big], axis=1).reshape(-1)
            bg = jnp.stack([g[:, i] for i in big], axis=1).reshape(-1, D)
            dtable = dtable.at[bi].add(bg)
        for i in small:
            seg = onehot_scatter_add(
                int(dims[i]), ids[:, i] - int(offsets[i]), g[:, i]
            )
            dtable = jax.lax.dynamic_update_slice(
                dtable, seg, (int(offsets[i]), 0)
            )
        return dtable, None

    f.defvjp(fwd, bwd)
    return f


def packed_gather(table, ids, dims, offsets):
    """`table[ids]` for an offset-packed (B, F) id matrix; backward is
    split per field (scatter for big vocabularies, one-hot matmul for
    small ones). `ids` must already carry the offsets."""
    # the platform rides in the cache key: the big/small partition is
    # resolved at factory time and a process could touch CPU before TPU
    return _packed_gather_fn(
        tuple(int(d) for d in dims), tuple(int(o) for o in offsets),
        int(table.shape[0]), jax.default_backend(),
    )(table, ids)
