"""Pallas TPU in-place sparse row update (the r4 'sorted scatter' retry).

XLA:TPU scatter performs a whole-operand pass — measured V-proportional
and n-independent (tools/probe_scatter.py: n=512 and n=24576 scatters
into a (300k, 64) table both ~1.8 ms; (3M, 64) ~6.4 ms) — so a
row-sparse adam built on jnp scatter stays O(V) and caps at ~1.3x the
dense sweep. This kernel is the O(touched-rows) form.

Design (Mosaic requires 8-aligned sublane blocks, the r4 blocker):
  * grid = (n,) over the SORTED row ids (scalar-prefetched);
  * every ref is blocked (8, D) with index_map j -> ids[j] // 8: the
    param/mu/nu blocks are the 8-row tile CONTAINING row ids[j], fetched
    through `input_output_aliases` so untouched tiles are never moved;
  * sorted ids make all grid steps hitting one tile consecutive, and
    Pallas only refetches/writes a block when its index CHANGES — so a
    tile is read once, updated in VMEM across its steps, written once;
  * the in-tile row is selected by a broadcasted-iota mask (no dynamic
    sublane slicing — the other r4 Mosaic blocker);
  * duplicate ids (coalesced upstream, identical g) are SKIPPED via
    pl.when(ids[j] != ids[j-1]) — re-applying adam on the in-VMEM tile
    would double-step the row;
  * zero-g rows pass through untouched (lazy-adam semantics).

Traffic: 12 KB per DISTINCT 8-row tile visited (3 buffers x 8 x D x 4 B
read+write) — O(touched rows), independent of V.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(bc_ref, ids_ref, g_ref, p_ref, mu_ref, nu_ref,
            po_ref, muo_ref, nuo_ref, *, lr, b1, b2, eps):
    j = pl.program_id(0)
    rid = ids_ref[j]
    prev = ids_ref[jnp.maximum(j - 1, 0)]
    is_dup = jnp.logical_and(j > 0, rid == prev)

    # pass the incoming tile through; the update below overwrites the
    # target sublane. When several grid steps share one tile, Pallas
    # keeps the block in VMEM (same block index) — po_ref already holds
    # the running value, so only refresh it on a NEW tile.
    is_new_tile = jnp.logical_or(j == 0, (prev // 8) != (rid // 8))

    @pl.when(is_new_tile)
    def _():
        po_ref[...] = p_ref[...]
        muo_ref[...] = mu_ref[...]
        nuo_ref[...] = nu_ref[...]

    @pl.when(jnp.logical_not(is_dup))
    def _():
        D = g_ref.shape[1]
        row_in_g = (j % 8).astype(jnp.int32)
        sub = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
        g = jnp.sum(
            jnp.where(sub == row_in_g, g_ref[...], 0.0),
            axis=0, keepdims=True,
        )  # (1, D): the step's gradient row
        touched = jnp.any(g != 0)
        mask = (sub == (rid % 8).astype(jnp.int32)) & touched  # (8, 1)
        m = muo_ref[...]
        v = nuo_ref[...]
        p = po_ref[...]
        gb = jnp.broadcast_to(g, p.shape)
        m2 = jnp.where(mask, b1 * m + (1 - b1) * gb, m)
        v2 = jnp.where(mask, b2 * v + (1 - b2) * gb * gb, v)
        # bias corrections precomputed host/XLA-side (Mosaic has no
        # scalar powf): bc_ref = [1-b1**c, 1-b2**c]
        mh = m2 / bc_ref[0]
        vh = v2 / bc_ref[1]
        step = jnp.where(mask, mh / (jnp.sqrt(vh) + eps),
                         jnp.zeros_like(p))
        po_ref[...] = p - lr * step
        muo_ref[...] = m2
        nuo_ref[...] = v2


def sparse_adam_rows_kernel(p, mu, nu, ids, g, count, lr,
                            b1=0.9, b2=0.999, eps=1e-8,
                            interpret: bool = False):
    """(p, mu, nu) updated in place at `ids` given row grads `g` (n, D).

    Caller contract (train/sparse_update.py enforces it):
      * ids sorted ascending; duplicate positions carry identical
        (coalesced) g rows,
      * V and n divisible by 8 (pad n with id V_pad-1 + zero g rows —
        zero-g steps write back unchanged values),
      * D equal to the table width (blocks span the full row).
    Returns the three updated (V, D) buffers (aliased with inputs)."""
    n = ids.shape[0]
    V, D = p.shape
    assert n % 8 == 0 and V % 8 == 0, (n, V)

    def row_map(j, bc_ref, ids_ref):  # noqa: ARG001
        return (ids_ref[j] // 8, 0)

    def g_map(j, bc_ref, ids_ref):  # noqa: ARG001
        return (j // 8, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((8, D), g_map),
            pl.BlockSpec((8, D), row_map),
            pl.BlockSpec((8, D), row_map),
            pl.BlockSpec((8, D), row_map),
        ],
        out_specs=[
            pl.BlockSpec((8, D), row_map),
            pl.BlockSpec((8, D), row_map),
            pl.BlockSpec((8, D), row_map),
        ],
    )
    out_shape = [
        jax.ShapeDtypeStruct(p.shape, p.dtype),
        jax.ShapeDtypeStruct(mu.shape, mu.dtype),
        jax.ShapeDtypeStruct(nu.shape, nu.dtype),
    ]
    fn = pl.pallas_call(
        functools.partial(_kernel, lr=lr, b1=b1, b2=b2, eps=eps),
        grid_spec=grid_spec,
        out_shape=out_shape,
        # logical inputs: bc, ids, g, p, mu, nu → p/mu/nu alias outputs
        input_output_aliases={3: 0, 4: 1, 5: 2},
        interpret=interpret,
    )
    c = jnp.asarray(count, jnp.float32)
    bc = jnp.stack([1.0 - b1**c, 1.0 - b2**c])
    return fn(bc, ids.astype(jnp.int32), g, p, mu, nu)
