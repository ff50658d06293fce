"""Row-sparse adam (train/sparse_update.py): exact semantics vs the
dense lazy-adam sweep, and the reduced-tree trick's gradient identity."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from oovrec_tpu.train.optimizers import scale_by_lazy_adam
from oovrec_tpu.train.sparse_update import (
    SparseTableState,
    coalesce_rows,
    init_sparse_state,
    gather_rows_for_batch,
    sparse_adam_update_table,
)


def test_coalesce_rows_sums_duplicates():
    ids = jnp.asarray([5, 2, 5, 9, 2, 5], jnp.int32)
    rows = jnp.arange(6 * 3, dtype=jnp.float32).reshape(6, 3)
    sid, gsum = coalesce_rows(ids, rows)
    np.testing.assert_array_equal(np.asarray(sid), [2, 2, 5, 5, 5, 9])
    # every duplicate position carries the full segment sum
    exp2 = rows[1] + rows[4]
    exp5 = rows[0] + rows[2] + rows[5]
    np.testing.assert_allclose(np.asarray(gsum[0]), exp2)
    np.testing.assert_allclose(np.asarray(gsum[1]), exp2)
    np.testing.assert_allclose(np.asarray(gsum[2]), exp5)
    np.testing.assert_allclose(np.asarray(gsum[5]), rows[3])


@pytest.mark.parametrize("steps", [1, 4])
def test_sparse_adam_matches_dense_lazy_adam(steps):
    """sparse_adam_update_table over (ids, row grads) ==
    scale_by_lazy_adam + apply_updates over the equivalent dense grad —
    duplicates coalesced, untouched rows bit-identical (no decay)."""
    rng = np.random.default_rng(0)
    V, D, n = 40, 8, 12
    table0 = rng.standard_normal((V, D)).astype(np.float32)
    lr = 1e-2

    tx = optax.chain(scale_by_lazy_adam(), optax.scale(-lr))
    dense_p = jnp.asarray(table0)
    dense_s = tx.init(dense_p)

    sp_p = jnp.asarray(table0)
    sp_s = init_sparse_state(sp_p)

    for step in range(steps):
        ids = rng.integers(0, V, n).astype(np.int32)
        ids[3] = ids[0]  # force duplicates
        rows = rng.standard_normal((n, D)).astype(np.float32)
        rows[5] = 0.0  # an explicitly zero row gradient
        zero_id = ids[5]

        g_dense = jnp.zeros((V, D)).at[jnp.asarray(ids)].add(
            jnp.asarray(rows)
        )
        upd, dense_s = tx.update(g_dense, dense_s, dense_p)
        dense_p = optax.apply_updates(dense_p, upd)

        sp_p, sp_s = sparse_adam_update_table(
            sp_p, sp_s, jnp.asarray(ids), jnp.asarray(rows),
            jnp.int32(step + 1), lr,
        )
        # a row whose coalesced grad is zero must be bit-unchanged —
        # unless another duplicate of the same id carried gradient
        if (ids == zero_id).sum() == 1:
            np.testing.assert_array_equal(
                np.asarray(sp_p[zero_id]), np.asarray(dense_p[zero_id])
            )

    np.testing.assert_allclose(
        np.asarray(sp_p), np.asarray(dense_p), rtol=1e-6, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(sp_s.mu), np.asarray(dense_s[0].mu), rtol=1e-6,
        atol=1e-7,
    )
    np.testing.assert_allclose(
        np.asarray(sp_s.nu), np.asarray(dense_s[0].nu), rtol=1e-6,
        atol=1e-7,
    )

def _bpr_fixture():
    from oovrec_tpu.inductive.spec import InductiveSpec
    from oovrec_tpu.models import BPR

    spec = InductiveSpec(
        mapper="random", add_oov_buckets=True,
        n_user_buckets=8, n_item_buckets=8, embedding_size=8,
    )
    model = BPR(n_users=50, n_items=40, embedding_size=8, spec=spec)
    rng = np.random.default_rng(0)
    B = 16
    b = {
        "user_id": rng.integers(0, 50, B).astype(np.int32),
        "item_id": rng.integers(1, 40, B).astype(np.int32),
        "neg_item_id": rng.integers(1, 40, B).astype(np.int32),
        "weight": np.ones(B, np.float32),
    }
    b["user_id"][3] = b["user_id"][0]  # duplicate ids in-batch
    for f in ("user_id", "item_id", "neg_item_id"):
        b[f + "_oov"] = (rng.random(B) < 0.2).astype(np.int32)
        b[f + "_bucket"] = rng.integers(0, 8, B).astype(np.int32)
    variables = model.init(
        jax.random.key(0), b, {}, method=model.calculate_loss
    )
    return model, variables["params"], b


def test_sparse_rows_override_matches_full_model():
    """The `_sparse_rows_<side>` batch override through the REAL BPR
    model (OOV routing included): identical loss, and row grads
    scatter-added by the gathered ids equal the dense table grads."""
    model, params, batch = _bpr_fixture()
    tmap = model.sparse_table_fields()
    rows, new_batch, gathered = gather_rows_for_batch(params, batch, tmap)

    def loss_full(p):
        return model.apply({"params": p}, batch, {},
                           method=model.calculate_loss)

    def loss_sparse(rows, p):
        b2 = dict(new_batch)
        for side in rows:
            b2["_sparse_rows_" + side] = rows[side]
        return model.apply({"params": p}, b2, {},
                           method=model.calculate_loss)

    l_full, g_full = jax.value_and_grad(loss_full)(params)
    (l_sp, (g_rows, g_rest)) = (
        loss_sparse(rows, params),
        jax.grad(loss_sparse, argnums=(0, 1))(rows, params),
    )
    np.testing.assert_allclose(float(l_sp), float(l_full), rtol=1e-6)

    for side, (name, _fields) in tmap.items():
        V = params[name]["embedding"].shape[0]
        scat = jnp.zeros((V, 8)).at[gathered[side]].add(g_rows[side])
        np.testing.assert_allclose(
            np.asarray(scat), np.asarray(g_full[name]["embedding"]),
            rtol=1e-5, atol=1e-6,
        )
    # non-table grads unchanged (e.g. OOV bucket tables)
    np.testing.assert_allclose(
        np.asarray(g_rest["user_oov_buckets"]["embedding"]),
        np.asarray(g_full["user_oov_buckets"]["embedding"]),
        rtol=1e-5, atol=1e-6,
    )


def test_sparse_device_epoch_matches_dense_lazy_sweep(tmp_path):
    """PRODUCTION integration: `learner: sparse_adam` through the
    device-resident epoch — the row-sparse fast path (gathered rows,
    touched-row lazy adam, scatter write-back) must produce the SAME
    trained params and metrics as the dense scale_by_lazy_adam sweep
    (`sparse_update_impl: dense` forces the old path; identical rng
    streams make the trajectories comparable to float tolerance)."""
    from oovrec_tpu.cli.quick_start import run

    def cfg(impl):
        return {
            "model": "BPR",
            "dataset": "toy",
            "data_path": "tests/assets",
            "load_col": {
                "inter": ["user_id", "item_id", "rating", "timestamp"]
            },
            "epochs": 3,
            "train_batch_size": 8,
            "eval_batch_size": 64,
            "embedding_size": 8,
            "topk": [2, 5],
            "valid_metric": "MRR@2",
            "eval_args": {
                "split": {"RS": [0.8, 0.1, 0.1]},
                "order": "TO", "group_by": "user", "mode": "full",
            },
            "device_epoch": True,
            "learner": "sparse_adam",
            "sparse_update_impl": impl,
            "checkpoint_dir": str(tmp_path),
            "seed": 11,
        }

    dense = run(config_dict=cfg("dense"), saved=False)
    sparse = run(config_dict=cfg("xla"), saved=False)
    de = next(iter(sparse["trainer"]._device_epochs.values()))
    assert de.sparse_tables, "sparse fast path did not engage"
    de_d = next(iter(dense["trainer"]._device_epochs.values()))
    assert de_d.sparse_tables is None, "dense control engaged sparse path"

    p_s = jax.device_get(sparse["trainer"].variables["params"])
    p_d = jax.device_get(dense["trainer"].variables["params"])
    for name in ("user_embedding", "item_embedding"):
        np.testing.assert_allclose(
            np.asarray(p_s[name]["embedding"]),
            np.asarray(p_d[name]["embedding"]),
            rtol=2e-5, atol=2e-6,
        )
    for k, v in sparse["test_result"].items():
        np.testing.assert_allclose(
            float(v), float(dense["test_result"][k]), rtol=1e-4, atol=1e-5
        )
