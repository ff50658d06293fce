"""Row-sparse adam for big embedding tables (VERDICT r4 #3).

`learner: sparse_adam` (the reference's own option,
`ref:recbole/trainer/trainer.py:155-206`) means: rows whose gradient is
identically zero this step receive NO update and their moments do not
advance. `train/optimizers.scale_by_lazy_adam` implements those
semantics over DENSE gradient trees (a jnp.where sweep over the whole
table every step — correct, but O(vocab) HBM traffic). This module is
the O(touched-rows) form used by the device-resident epoch and the
bench's `bpr_sparse_adam` variant:

  1. `reduce_params_for_batch` — the reduced-tree trick: replace each
     big table leaf (V, D) in the param tree with its GATHERED rows for
     this batch (n, D) and remap the batch's id fields to positions, so
     the model's internal lookup reads rows[iota]. `jax.grad` of the
     loss w.r.t. the reduced tree then yields ROW gradients directly —
     no dense (V, D) cotangent is ever materialized.
  2. `sparse_adam_update_table` — coalesce duplicate ids (sort +
     segment-sum), advance adam moments for touched rows only, and
     scatter the updated param/mu/nu rows back (sorted indices;
     duplicate positions write identical values so scatter order cannot
     matter). Bias correction uses the optimizer-global step count —
     exactly `scale_by_lazy_adam`'s semantics (tested equal).

Hardware honesty (tools/probe_scatter.py, v5e measured): XLA:TPU scatter
performs a whole-operand pass — cost is V-proportional and independent
of n (n=512 and n=24576 scatters into a 300k x 64 table both ~1.8 ms;
3M x 64 ~6.4 ms) — so this path is a measured ~1.3x over the dense
sweep at bench shapes, not the O(n/V) ideal; `dynamic_update_slice` is
O(n) but needs contiguous rows. The remaining lever is a Pallas
scalar-prefetch row writer (input_output_aliasing), tracked in
EXPERIMENTS round 5.

Training-time invariant: ids handed to the reduced lookup must be
< vocab (true for all training paths — split columns are remapped
contiguous ids; OOV simulation flags ride separate `_oov` columns).
Inductive EVAL maps ids >= vocab and must not use the reduced tree.
"""

from __future__ import annotations

from typing import Dict, List, NamedTuple, Tuple

import jax
import jax.numpy as jnp


class SparseTableState(NamedTuple):
    """Per-table adam moments kept OUT of the optax state (the optax tx
    never sees the big tables — `build_optimizer` output is applied to
    the stripped tree)."""

    mu: jnp.ndarray  # (V, D) float32
    nu: jnp.ndarray  # (V, D) float32


def init_sparse_state(table: jnp.ndarray) -> SparseTableState:
    return SparseTableState(
        jnp.zeros_like(table), jnp.zeros_like(table)
    )


def coalesce_rows(ids: jnp.ndarray, rows: jnp.ndarray):
    """Sort ids and sum duplicate rows. Returns (sid, gsum) where `sid`
    is sorted (duplicates retained, static shape) and `gsum[i]` is the
    FULL segment sum for sid[i] — every duplicate position carries the
    identical total, so downstream scatter-sets are order-independent."""
    order = jnp.argsort(ids)
    sid = ids[order]
    sg = rows[order]
    first = jnp.searchsorted(sid, sid, side="left")
    sums = jax.ops.segment_sum(sg, first, num_segments=sid.shape[0])
    return sid, sums[first]


def sparse_adam_update_table(
    table: jnp.ndarray,
    state: SparseTableState,
    ids: jnp.ndarray,
    grows: jnp.ndarray,
    count: jnp.ndarray,
    lr: float,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> Tuple[jnp.ndarray, SparseTableState]:
    """One lazy-adam step on the rows `ids` of `table` given their row
    gradients `grows` (duplicates allowed — they are coalesced). `count`
    is the optimizer-global POST-increment step number (optax state
    count semantics: the first update sees count=1). Zero-gradient rows
    (after coalescing) are written back unchanged — bit-identical to
    `scale_by_lazy_adam` + `optax.apply_updates` on a dense grad."""
    sid, g = coalesce_rows(ids, grows)
    touched = jnp.any(g != 0, axis=1, keepdims=True)
    mu_r = state.mu[sid]
    nu_r = state.nu[sid]
    p_r = table[sid]
    new_mu = jnp.where(touched, b1 * mu_r + (1 - b1) * g, mu_r)
    new_nu = jnp.where(touched, b2 * nu_r + (1 - b2) * g * g, nu_r)
    c = count.astype(new_mu.dtype)
    mu_hat = new_mu / (1 - b1**c)
    nu_hat = new_nu / (1 - b2**c)
    step = jnp.where(touched, mu_hat / (jnp.sqrt(nu_hat) + eps), 0.0)
    new_p = p_r - lr * step
    kw = dict(indices_are_sorted=True)
    return (
        table.at[sid].set(new_p, **kw),
        SparseTableState(
            state.mu.at[sid].set(new_mu, **kw),
            state.nu.at[sid].set(new_nu, **kw),
        ),
    )


def gather_rows_for_batch(
    params: Dict,
    batch: Dict,
    table_map: Dict[str, Tuple[str, List[str]]],
) -> Tuple[Dict, Dict, Dict[str, jnp.ndarray]]:
    """Prepare a batch for the sparse fast path. `table_map` is the
    model's `sparse_table_fields()` declaration
    `{side: (param_module_name, [id_fields])}` — each module's leaf is
    an `embedding` (V, D) table indexed only by those batch fields.

    Returns (rows, new_batch, gathered):
      * rows[side]    — gathered (n, D) table rows for the concatenation
                        of the side's id fields (the DIFFERENTIABLE leaf
                        the step's grad targets),
      * new_batch     — fields remapped to row positions (the model's
                        internal lookup becomes rows[iota]); the caller
                        sets `_sparse_rows_<side>` from the grad-traced
                        rows inside its loss_fn,
      * gathered[side] — the original ids, aligned with rows (the
                        scatter targets for `sparse_adam_update_table`).
    """
    new_batch = dict(batch)
    rows: Dict[str, jnp.ndarray] = {}
    gathered: Dict[str, jnp.ndarray] = {}
    for side, (name, fields) in table_map.items():
        table = params[name]["embedding"]
        ids = jnp.concatenate(
            [batch[f].reshape(-1).astype(jnp.int32) for f in fields]
        )
        rows[side] = table[ids]
        off = 0
        for f in fields:
            m = batch[f].reshape(-1).shape[0]
            new_batch[f] = (
                off + jnp.arange(m, dtype=jnp.int32)
            ).reshape(batch[f].shape)
            off += m
        gathered[side] = ids
    return rows, new_batch, gathered


def sparse_table_map(model) -> Dict[str, Tuple[str, List[str]]]:
    """The model's sparse-table declaration (empty dict → the model does
    not support the sparse fast path)."""
    fn = getattr(model, "sparse_table_fields", None)
    if fn is None:
        return {}
    return fn() if callable(fn) else dict(fn)
