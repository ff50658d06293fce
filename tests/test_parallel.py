"""Sharded-execution parity: the 8-device mesh step must match the
single-device step numerically (same math, different layout)."""

import numpy as np
import jax
import pytest

from __graft_entry__ import _example, dryrun_multichip
from oovrec_tpu.parallel.mesh import make_mesh, param_sharding
from oovrec_tpu.parallel.train_step import make_sharded_train_step
from oovrec_tpu.train.optimizers import build_optimizer


def test_dryrun_multichip_8():
    dryrun_multichip(8)


def test_sharded_step_matches_single_device():
    import optax

    model, variables, batch = _example(
        n_users=512, n_items=1024, batch=64, emb=32
    )
    tx = build_optimizer("adam", 1e-2)
    params = variables["params"]

    # single-device reference
    def step(params, opt_state, b):
        def lf(p):
            return model.apply({"params": p}, b, {},
                               method=model.calculate_loss)

        loss, g = jax.value_and_grad(lf)(params)
        u, o2 = tx.update(g, opt_state, params)
        return loss, optax.apply_updates(params, u), o2

    l0, p0, _ = jax.jit(step)(params, tx.init(params), batch)

    mesh = make_mesh(4, 2)
    sstep, sh = make_sharded_train_step(
        model, tx, mesh, params, batch, {}, row_shard_threshold=512
    )
    p = jax.tree.map(jax.device_put, params, sh["params"])
    o = jax.tree.map(jax.device_put, tx.init(p), sh["opt_state"])
    db = jax.tree.map(jax.device_put, batch, sh["batch"])
    l1, p1, _ = sstep(p, o, db, {})

    assert float(l0) == pytest.approx(float(l1), rel=1e-5)
    for k in ("user_embedding", "item_embedding"):
        np.testing.assert_allclose(
            np.asarray(p0[k]["embedding"]),
            np.asarray(p1[k]["embedding"]),
            rtol=2e-5, atol=2e-6,
        )
    # the big tables really are row-sharded over 'model'
    assert not p1["item_embedding"]["embedding"].sharding.is_fully_replicated


def test_param_sharding_rule():
    mesh = make_mesh(4, 2)
    params = {
        "big": np.zeros((8192, 64)),
        "small": np.zeros((10, 64)),
        "vec": np.zeros((100,)),
    }
    sh = param_sharding(mesh, params, row_shard_threshold=4096)
    assert "model" in str(sh["big"].spec)
    assert sh["small"].spec == jax.sharding.PartitionSpec()


def test_sharded_step_sequential_model():
    """SASRec train step sharded over the 8-device mesh: data-parallel
    batch, replicated (small) tables — compiles and runs one step."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from oovrec_tpu.models import get_model_class
    from oovrec_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(4, 2)
    cls = get_model_class("SASRec")
    B, L, NI = 16, 8, 40
    m = cls(n_users=20, n_items=NI, embedding_size=16, max_seq_length=L,
            inner_size=16)
    rng = np.random.default_rng(0)
    batch = {
        "item_id_list": jnp.asarray(rng.integers(1, NI, (B, L))),
        "item_length": jnp.asarray(rng.integers(1, L + 1, (B,))),
        "item_id": jnp.asarray(rng.integers(1, NI, (B,))),
        "weight": jnp.ones((B,)),
    }
    vs = m.init({"params": jax.random.key(0), "dropout": jax.random.key(1)},
                batch, method=m.calculate_loss)
    tx = optax.adam(1e-3)
    opt = tx.init(vs["params"])

    dp = NamedSharding(mesh, P("data"))
    db = {k: jax.device_put(v, NamedSharding(mesh, P("data", *(None,) * (v.ndim - 1))))
          for k, v in batch.items()}
    rep = NamedSharding(mesh, P())
    params = jax.device_put(vs["params"], rep)
    opt = jax.device_put(opt, rep)

    @jax.jit
    def step(params, opt, b):
        loss, g = jax.value_and_grad(
            lambda p: m.apply({"params": p}, b, method=m.calculate_loss,
                              rngs={"dropout": jax.random.key(2)})
        )(params)
        u, opt2 = tx.update(g, opt)
        return loss, optax.apply_updates(params, u), opt2

    loss, params, opt = step(params, opt, db)
    assert np.isfinite(float(loss))


def test_sharded_full_sort_eval():
    """Full-sort scoring + top-k sharded over the mesh: users split on
    'data', item table replicated; results equal the single-device path."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from oovrec_tpu.eval.full_sort import mask_and_topk
    from oovrec_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(8, 1)
    B, NI, K, H, Pp = 16, 64, 5, 4, 3
    rng = np.random.default_rng(1)
    scores = jnp.asarray(rng.standard_normal((B, NI)).astype(np.float32))
    hist = jnp.asarray(rng.integers(1, NI, (B, H)))
    hist_len = jnp.asarray(rng.integers(0, H + 1, (B,)))
    pos = jnp.asarray(rng.integers(1, NI, (B, Pp)))
    pos_len = jnp.asarray(rng.integers(1, Pp + 1, (B,)))

    f = jax.jit(mask_and_topk, static_argnums=5)
    ref = f(scores, hist, hist_len, pos, pos_len, K)
    sh = NamedSharding(mesh, P("data", None))
    sh1 = NamedSharding(mesh, P("data"))
    out = f(jax.device_put(scores, sh), jax.device_put(hist, sh),
            jax.device_put(hist_len, sh1), jax.device_put(pos, sh),
            jax.device_put(pos_len, sh1), K)
    for a, b in zip(jax.tree_util.tree_leaves(ref),
                    jax.tree_util.tree_leaves(out)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
