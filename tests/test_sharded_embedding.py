"""shard_map sharded-embedding lookup: forward + gradient parity vs dense."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from oovrec_tpu.parallel.mesh import make_mesh
from oovrec_tpu.parallel.sharded_embedding import (
    from_sharded_layout,
    make_sharded_lookup,
    place_sharded_table,
    to_sharded_layout,
)


def test_layout_roundtrip():
    rng = np.random.default_rng(0)
    t = rng.standard_normal((10, 4)).astype(np.float32)
    s = to_sharded_layout(t, 4)
    assert s.shape == (4, 3, 4)  # 10 → padded 12 → 3 rows/shard
    np.testing.assert_array_equal(from_sharded_layout(s, 10), t)


def test_sharded_lookup_matches_dense():
    mesh = make_mesh(2, 4)
    rng = np.random.default_rng(1)
    V, D, B = 37, 8, 16
    table = rng.standard_normal((V, D)).astype(np.float32)
    ids = rng.integers(0, V, B).astype(np.int32)

    st = place_sharded_table(mesh, table)
    lookup = make_sharded_lookup(mesh)
    out = jax.jit(lookup)(st, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(out), table[ids], rtol=1e-6)


def test_sharded_lookup_gradients():
    mesh = make_mesh(2, 4)
    rng = np.random.default_rng(2)
    V, D, B = 16, 4, 8
    table = rng.standard_normal((V, D)).astype(np.float32)
    ids = rng.integers(0, V, B).astype(np.int32)
    st = place_sharded_table(mesh, table)
    lookup = make_sharded_lookup(mesh)

    def loss_sharded(t):
        return jnp.sum(lookup(t, jnp.asarray(ids)) ** 2)

    def loss_dense(t):
        return jnp.sum(t[ids] ** 2)

    g_sharded = jax.jit(jax.grad(loss_sharded))(st)
    g_dense = jax.grad(loss_dense)(jnp.asarray(table))
    got = from_sharded_layout(np.asarray(g_sharded), V)
    np.testing.assert_allclose(got, np.asarray(g_dense), rtol=1e-5, atol=1e-6)


def test_alltoall_lookup_matches_dense():
    from oovrec_tpu.parallel.sharded_embedding import make_alltoall_lookup

    mesh = make_mesh(2, 4)
    rng = np.random.default_rng(3)
    V, D, B = 37, 8, 64  # b = B/data = 32, divisible by S=4
    table = rng.standard_normal((V, D)).astype(np.float32)
    ids = rng.integers(0, V, B).astype(np.int32)
    st = place_sharded_table(mesh, table)
    lookup = make_alltoall_lookup(mesh, capacity_factor=8.0)
    out, overflow = jax.jit(lookup)(st, jnp.asarray(ids))
    assert int(overflow) == 0
    np.testing.assert_allclose(np.asarray(out), table[ids], rtol=1e-6)


def test_alltoall_lookup_gradients_match_psum_path():
    from oovrec_tpu.parallel.sharded_embedding import make_alltoall_lookup

    mesh = make_mesh(2, 4)
    rng = np.random.default_rng(4)
    V, D, B = 16, 4, 32
    table = rng.standard_normal((V, D)).astype(np.float32)
    ids = rng.integers(0, V, B).astype(np.int32)
    st = place_sharded_table(mesh, table)
    lookup = make_alltoall_lookup(mesh, capacity_factor=8.0)

    def loss_sharded(t):
        out, _ = lookup(t, jnp.asarray(ids))
        return jnp.sum(out ** 2)

    def loss_dense(t):
        return jnp.sum(t[ids] ** 2)

    g_sharded = jax.jit(jax.grad(loss_sharded))(st)
    g_dense = jax.grad(loss_dense)(jnp.asarray(table))
    got = from_sharded_layout(np.asarray(g_sharded), V)
    np.testing.assert_allclose(got, np.asarray(g_dense), rtol=1e-5,
                               atol=1e-6)


def test_alltoall_lookup_overflow_counts():
    """When a destination bucket exceeds capacity the excess ids must get
    ZERO rows (never someone else's embedding) and be counted."""
    from oovrec_tpu.parallel.sharded_embedding import make_alltoall_lookup

    mesh = make_mesh(2, 4)
    rng = np.random.default_rng(5)
    V, D, B = 40, 4, 64
    table = rng.standard_normal((V, D)).astype(np.float32)
    # adversarial: every id owned by shard 0 (multiples of S=4)
    ids = (rng.integers(0, V // 4, B).astype(np.int32)) * 4
    st = place_sharded_table(mesh, table)
    # capacity 1 per destination → per device slice bs=8 all to shard 0
    lookup = make_alltoall_lookup(mesh, capacity_factor=0.5)
    out, overflow = jax.jit(lookup)(st, jnp.asarray(ids))
    assert int(overflow) > 0
    out = np.asarray(out)
    dense = table[ids]
    # every row is either exact or exactly zero
    for i in range(B):
        assert (
            np.allclose(out[i], dense[i], rtol=1e-6)
            or np.allclose(out[i], 0.0)
        )
    assert np.any(np.all(out == 0.0, axis=1))


def test_make_lookup_auto_selection():
    """auto → psum at model<4, all-to-all at model>=4; both normalize to
    a plain (table, ids) -> rows callable."""
    from oovrec_tpu.parallel.sharded_embedding import make_lookup

    rng = np.random.default_rng(6)
    V, D, B = 32, 4, 32
    table = rng.standard_normal((V, D)).astype(np.float32)
    ids = rng.integers(0, V, B).astype(np.int32)

    for n_data, n_model in ((4, 2), (2, 4)):
        mesh = make_mesh(n_data, n_model)
        st = place_sharded_table(mesh, table)
        f = make_lookup(mesh, "auto", capacity_factor=8.0)
        out = jax.jit(f)(st, jnp.asarray(ids))
        np.testing.assert_allclose(np.asarray(out), table[ids], rtol=1e-6)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        make_lookup(make_mesh(4, 2), "bogus")


# ---------------------------------------------- production ShardedEmbed


def _prod_cfg(tmp_path, **over):
    from tests.test_mesh_production import _cfg

    d = _cfg(checkpoint_dir=str(tmp_path), mesh={"data": 4, "model": 2},
             row_shard_threshold=4)  # toy-ind has 7 users / ~9 items
    d.update(over)
    return d


@pytest.mark.parametrize("kind", ["psum", "alltoall"])
def test_sharded_lookup_engages_in_production(tmp_path, kind):
    """`sharded_lookup: psum|alltoall` through the PRODUCTION CLI: the
    model's ID tables become ShardedEmbed ((S, V/S, D) mod-sharded layout,
    axis 0 committed to the 'model' axis), training + eval + the
    inductive OOV regime all run, metrics finite (round-4 VERDICT #3:
    the config key is read and reaches real training)."""
    from oovrec_tpu.cli.quick_start import run

    res = run(
        config_dict=_prod_cfg(tmp_path, sharded_lookup=kind),
        saved=False,
    )
    params = res["trainer"].variables["params"]
    assert "embedding_sharded" in params["user_embedding"], (
        "ShardedEmbed did not engage"
    )
    tbl = params["user_embedding"]["embedding_sharded"]
    assert tbl.ndim == 3 and tbl.shape[0] == 2
    assert not tbl.sharding.is_fully_replicated
    for v in res["test_result"].values():
        assert np.isfinite(float(v))


def test_sharded_embed_weight_copy_identity(tmp_path):
    """Copy a dense-trained BPR table into the sharded layout: predict()
    through the explicit exchange must equal the dense model bit-for-bit
    (same math, different exchange)."""
    from oovrec_tpu.cli.quick_start import run
    from oovrec_tpu.parallel.sharded_embedding import to_sharded_layout

    dense = run(config_dict=_prod_cfg(tmp_path, epochs=1), saved=False)
    tr = dense["trainer"]
    dp = jax.tree.map(np.asarray, jax.device_get(tr.variables["params"]))

    sharded = run(
        config_dict=_prod_cfg(tmp_path, epochs=1, sharded_lookup="psum"),
        saved=False,
    )
    tr2 = sharded["trainer"]
    sp = jax.tree.map(np.asarray, jax.device_get(tr2.variables["params"]))
    # graft the dense tables into the sharded params
    for name in ("user_embedding", "item_embedding"):
        sp[name] = {
            "embedding_sharded": to_sharded_layout(
                dp[name]["embedding"], 2
            )
        }  # noqa: E501
    for name in ("user_oov_buckets", "item_oov_buckets"):
        sp[name] = dp[name]

    batch = {
        "user_id": np.arange(8, dtype=np.int32),
        "item_id": np.arange(1, 9, dtype=np.int32),
        "user_id_oov": np.array([0, 1] * 4, np.int32),
        "item_id_oov": np.array([0, 0, 1, 1] * 2, np.int32),
        "user_id_bucket": np.arange(8, dtype=np.int32) % 8,
        "item_id_bucket": np.arange(8, dtype=np.int32) % 8,
        "weight": np.ones(8, np.float32),
    }
    m1, m2 = tr.model, tr2.model
    e = tr.estate or {}
    s1 = np.asarray(m1.apply({"params": dp}, batch, e, method=m1.predict))
    s2 = np.asarray(m2.apply({"params": sp}, batch, e, method=m2.predict))
    np.testing.assert_allclose(s1, s2, rtol=1e-6, atol=1e-7)


def test_reconcile_layouts_directions():
    """`reconcile_layouts` converts stored checkpoint layouts to the
    current tree (ADVICE r4 #4): sharded→dense, dense→sharded,
    sharded→sharded across model-axis sizes, and scalar structural
    leaves (per-param adam counts) rename without conversion."""
    from oovrec_tpu.parallel.sharded_embedding import reconcile_layouts

    rng = np.random.default_rng(3)
    dense = rng.standard_normal((10, 4)).astype(np.float32)

    # sharded (S=2) → dense
    raw = {"t": {"embedding_sharded": to_sharded_layout(dense, 2)}}
    tgt = {"t": {"embedding": np.zeros((10, 4), np.float32)}}
    reconcile_layouts(tgt, raw)
    np.testing.assert_array_equal(raw["t"]["embedding"], dense)

    # dense → sharded (S=4)
    raw = {"t": {"embedding": dense.copy()}}
    tgt = {"t": {"embedding_sharded": np.zeros((4, 3, 4), np.float32)}}
    reconcile_layouts(tgt, raw)
    np.testing.assert_array_equal(
        from_sharded_layout(raw["t"]["embedding_sharded"], 10), dense
    )

    # sharded S=2 → sharded S=4
    raw = {"t": {"embedding_sharded": to_sharded_layout(dense, 2)}}
    tgt = {"t": {"embedding_sharded": np.zeros((4, 3, 4), np.float32)}}
    reconcile_layouts(tgt, raw)
    np.testing.assert_array_equal(
        from_sharded_layout(raw["t"]["embedding_sharded"], 10), dense
    )

    # scalar structural leaf (adam per-param count): rename only
    raw = {"t": {"embedding_sharded": np.int32(5)}}
    tgt = {"t": {"embedding": np.int32(0)}}
    reconcile_layouts(tgt, raw)
    assert raw["t"]["embedding"] == 5


def test_sharded_checkpoint_resumes_into_dense(tmp_path):
    """A checkpoint written under `sharded_lookup: psum` (tables stored
    as gathered (S, V/S, D) host arrays) resumes into a DENSE model on
    the same corpus: resume_checkpoint converts the layout instead of
    failing structurally, and the dense tables equal the sharded run's
    logical tables."""
    from oovrec_tpu.cli.quick_start import run

    res = run(
        config_dict=_prod_cfg(
            tmp_path, epochs=1, sharded_lookup="psum",
            checkpoint_dir=str(tmp_path),
        ),
        saved=True,
    )
    tr = res["trainer"]
    stored = np.asarray(
        jax.device_get(
            tr.variables["params"]["user_embedding"]["embedding_sharded"]
        )
    )

    dense = run(
        config_dict=_prod_cfg(tmp_path, epochs=1, checkpoint_dir=str(tmp_path)),
        saved=False,
    )
    tr2 = dense["trainer"]
    assert "embedding" in tr2.variables["params"]["user_embedding"]
    tr2.resume_checkpoint(tr.saved_model_file, params_only=True)
    got = np.asarray(
        jax.device_get(tr2.variables["params"]["user_embedding"]["embedding"])
    )
    np.testing.assert_allclose(
        got, from_sharded_layout(stored, got.shape[0]), rtol=1e-6
    )


def test_sharded_embed_composes_with_device_epochs(tmp_path):
    """VERDICT r4 #5: the explicit-exchange tables (ShardedEmbed) and the
    device-resident epochs — the two headline mechanisms — run TOGETHER:
    `sharded_lookup: alltoall` + `device_epoch: True` through the
    production CLI on the 4x2 mesh compiles the whole-epoch SPMD program
    (normal + OOV sub-epoch) against the mod-sharded tables, the trained
    table stays committed to the 'model' axis (not silently replicated),
    and metrics are finite."""
    from oovrec_tpu.cli.quick_start import run

    res = run(
        config_dict=_prod_cfg(
            tmp_path, sharded_lookup="alltoall", device_epoch=True,
            train_oov=True, oov_only_epoch=True,
        ),
        saved=False,
    )
    tr = res["trainer"]
    de_keys = set(getattr(tr, "_device_epochs", {}) or {})
    assert any(not k[1] for k in de_keys), "plain device epoch missing"
    assert any(k[1] for k in de_keys), "OOV device epoch missing"
    tbl = tr.variables["params"]["user_embedding"]["embedding_sharded"]
    assert tbl.ndim == 3 and not tbl.sharding.is_fully_replicated
    for v in res["test_result"].values():
        assert np.isfinite(float(v))
