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
    impl: str = "xla",
) -> Tuple[jnp.ndarray, SparseTableState]:
    """One lazy-adam step on the rows `ids` of `table` given their row
    gradients `grows` (duplicates allowed — they are coalesced). `count`
    is the optimizer-global POST-increment step number (optax state
    count semantics: the first update sees count=1). Zero-gradient rows
    (after coalescing) are written back unchanged — bit-identical to
    `scale_by_lazy_adam` + `optax.apply_updates` on a dense grad.

    impl: 'xla' (scatter-set write-back — whole-operand pass on TPU) or
    'pallas' (ops/sparse_rows.py in-place row kernel — O(touched rows),
    requires V % 8 == 0; ids are padded to a multiple of 8 with a
    duplicate of the last id + zero grads, which the kernel skips)."""
    sid, g = coalesce_rows(ids, grows)
    if impl == "pallas":
        from oovrec_tpu.ops.sparse_rows import sparse_adam_rows_kernel

        pad = (-sid.shape[0]) % 8
        if pad:
            sid = jnp.concatenate([sid, jnp.repeat(sid[-1:], pad)])
            g = jnp.concatenate(
                [g, jnp.zeros((pad, g.shape[1]), g.dtype)]
            )
        p2, mu2, nu2 = sparse_adam_rows_kernel(
            table, state.mu, state.nu, sid, g, count, lr,
            b1=b1, b2=b2, eps=eps,
        )
        return p2, SparseTableState(mu2, nu2)
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


def prune_tables(tree: Dict, table_names) -> Dict:
    """Remove the `embedding` leaf of each table module from a
    param-structured tree (params, adam mu/nu) — the 'rest' tree the
    plain optax chain keeps handling. Module dicts stay present (possibly
    empty) so grads/state/params prune to IDENTICAL treedefs."""
    return {
        k: (
            {kk: vv for kk, vv in v.items() if kk != "embedding"}
            if k in table_names and isinstance(v, dict) else v
        )
        for k, v in tree.items()
    }


def merge_tables(rest: Dict, tables: Dict[str, jnp.ndarray]) -> Dict:
    """Inverse of `prune_tables`: re-insert `embedding` leaves."""
    out = dict(rest)
    for name, arr in tables.items():
        out[name] = dict(out.get(name, {}), embedding=arr)
    return out


def split_lazy_opt_state(opt_state, table_names, table_map):
    """Split a `chain(scale_by_lazy_adam(), scale(-lr))` state into the
    rest-tree state (feedable to the SAME chain over pruned grads) and
    per-side SparseTableStates. Pure tree surgery — no data movement."""
    from oovrec_tpu.train.optimizers import ScaleByLazyAdamState

    lazy = opt_state[0]
    assert isinstance(lazy, ScaleByLazyAdamState), type(lazy)
    sparse = {
        side: SparseTableState(
            lazy.mu[name]["embedding"], lazy.nu[name]["embedding"]
        )
        for side, (name, _f) in table_map.items()
    }
    rest_state = (
        ScaleByLazyAdamState(
            lazy.count,
            prune_tables(lazy.mu, table_names),
            prune_tables(lazy.nu, table_names),
        ),
    ) + tuple(opt_state[1:])
    return rest_state, sparse


def merge_lazy_opt_state(rest_state, sparse, table_map):
    """Inverse of `split_lazy_opt_state`."""
    from oovrec_tpu.train.optimizers import ScaleByLazyAdamState

    lazy = rest_state[0]
    mu = dict(lazy.mu)
    nu = dict(lazy.nu)
    for side, (name, _f) in table_map.items():
        mu[name] = dict(mu.get(name, {}), embedding=sparse[side].mu)
        nu[name] = dict(nu.get(name, {}), embedding=sparse[side].nu)
    return (
        ScaleByLazyAdamState(lazy.count, mu, nu),
    ) + tuple(rest_state[1:])


def sparse_epoch_table_map(trainer, model, spec, frozen: bool):
    """Eligibility of the device-epoch sparse fast path: returns the
    model's table map, or None. Requires `learner: sparse_adam` with no
    weight decay / clipping / torch-adam override (the optax chain must
    be exactly (scale_by_lazy_adam, scale)), a single-device run (the
    mesh path keeps GSPMD-dense updates), plain nn.Embed tables, an
    embedder that never reads the whole table, and an unfrozen pass
    (frozen-IV sub-epochs skip table updates entirely via the dense
    freeze-mask machinery)."""
    cfg = trainer.config
    if (
        trainer.learner != "sparse_adam"
        or trainer.weight_decay
        or trainer.clip is not None
        or cfg.get("optimizer_skip_zero_grads")
        or trainer.mesh is not None
        or frozen
        or cfg.get("sparse_update_impl") == "dense"
    ):
        return None
    m = sparse_table_map(model)
    if not m:
        return None
    if spec is not None and getattr(spec, "active", False) and (
        spec.embedder in ("mean", "knn")
    ):
        return None
    params = trainer.variables["params"]
    for _side, (name, _f) in m.items():
        if name not in params or "embedding" not in params[name]:
            return None
    return m


def resolve_sparse_impl(cfg, params, table_map) -> str:
    """'sparse_update_impl: auto|xla|pallas' — auto picks the Pallas
    in-place row kernel once the combined table rows clear ~2.5M (the
    measured crossover where the V-proportional XLA scatter pass
    overtakes the kernel's flat ~16 ms per-row grid cost — EXPERIMENTS
    round 5: dense/xla/pallas = 26.9/21.4/~16.5 ms at 3M rows,
    3.3/6.5/16.2 ms at 300k) and every vocab is 8-row aligned; xla
    otherwise."""
    impl = cfg.get("sparse_update_impl", "auto")
    if impl in ("xla", "pallas"):
        return impl
    vocabs = [
        params[name]["embedding"].shape[0]
        for _s, (name, _f) in table_map.items()
    ]
    if sum(vocabs) >= 2_500_000 and all(v % 8 == 0 for v in vocabs):
        return "pallas"
    return "xla"


def sparse_table_map(model) -> Dict[str, Tuple[str, List[str]]]:
    """The model's sparse-table declaration (empty dict → the model does
    not support the sparse fast path)."""
    fn = getattr(model, "sparse_table_fields", None)
    if fn is None:
        return {}
    return fn() if callable(fn) else dict(fn)
