"""gather_rows (ops/embed_grad.py): identical forward to plain indexing
and an EXACT adjoint — duplicate ids sum — through both backward forms
(one-hot matmul and scatter-add)."""

import numpy as np

import jax
import jax.numpy as jnp

from oovrec_tpu.ops import embed_grad
from oovrec_tpu.ops.embed_grad import gather_rows, onehot_scatter_add


def test_forward_matches_indexing():
    rng = np.random.default_rng(0)
    t = jnp.asarray(rng.standard_normal((50, 8)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, 50, (4, 6)), jnp.int32)
    np.testing.assert_array_equal(
        np.asarray(gather_rows(t, ids)), np.asarray(t[ids])
    )


def test_onehot_scatter_add_sums_duplicates():
    ids = jnp.asarray([3, 1, 3, 0], jnp.int32)
    vals = jnp.asarray(
        [[1.0, 2.0], [3.0, 4.0], [5.0, 6.0], [7.0, 8.0]], jnp.float32
    )
    out = np.asarray(onehot_scatter_add(5, ids, vals))
    expect = np.zeros((5, 2), np.float32)
    np.add.at(expect, np.asarray(ids), np.asarray(vals))
    np.testing.assert_allclose(out, expect)


def test_grad_equals_scatter_adjoint_both_branches(monkeypatch):
    rng = np.random.default_rng(1)
    t = jnp.asarray(rng.standard_normal((40, 8)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, 40, 64), jnp.int32)  # many duplicates
    co = jnp.asarray(rng.standard_normal((64, 8)), jnp.float32)

    def loss_plain(t):
        return jnp.sum(t[ids] * co)

    def loss_gr(t):
        return jnp.sum(gather_rows(t, ids) * co)

    g_ref = np.asarray(jax.grad(loss_plain)(t))
    for onehot in (False, True):
        monkeypatch.setattr(embed_grad, "_use_onehot", lambda n: onehot)
        g = np.asarray(jax.grad(loss_gr)(t))
        np.testing.assert_allclose(g, g_ref, rtol=1e-5, atol=1e-6,
                                   err_msg=f"onehot={onehot}")


def test_grad_2d_ids(monkeypatch):
    rng = np.random.default_rng(2)
    t = jnp.asarray(rng.standard_normal((30, 4)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, 30, (8, 5)), jnp.int32)
    co = jnp.asarray(rng.standard_normal((8, 5, 4)), jnp.float32)
    g_ref = np.asarray(jax.grad(lambda t: jnp.sum(t[ids] * co))(t))
    monkeypatch.setattr(embed_grad, "_use_onehot", lambda n: True)
    g = np.asarray(
        jax.grad(lambda t: jnp.sum(gather_rows(t, ids) * co))(t)
    )
    np.testing.assert_allclose(g, g_ref, rtol=1e-5, atol=1e-6)


def test_packed_gather_grads_match_plain(monkeypatch):
    """Field-split backward (scatter for big, one-hot for small vocab)
    equals the plain-indexing adjoint exactly."""
    from oovrec_tpu.ops.embed_grad import packed_gather
    from oovrec_tpu.ops import embed_grad as eg

    rng = np.random.default_rng(4)
    dims = (30, 20, 3, 6)           # 2 "big", 2 "small" under threshold 8
    offsets = (0, 30, 50, 53)
    V = sum(dims)
    t = jnp.asarray(rng.standard_normal((V, 8)), jnp.float32)
    B = 64
    ids = jnp.stack(
        [jnp.asarray(rng.integers(0, d, B) + o, jnp.int32)
         for d, o in zip(dims, offsets)], axis=1,
    )
    co = jnp.asarray(rng.standard_normal((B, 4, 8)), jnp.float32)
    g_ref = np.asarray(jax.grad(lambda t: jnp.sum(t[ids] * co))(t))
    monkeypatch.setattr(eg, "_use_onehot", lambda n: n <= 8)
    eg._packed_gather_fn.cache_clear()
    g = np.asarray(jax.grad(
        lambda t: jnp.sum(packed_gather(t, ids, dims, offsets) * co)
    )(t))
    np.testing.assert_allclose(g, g_ref, rtol=1e-5, atol=1e-6)
    eg._packed_gather_fn.cache_clear()
