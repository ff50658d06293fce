"""Fused Pallas CIN (ops/cin_fused.py) == the XLA slab path, fwd + grad,
kernel-level and through the full xDeepFM loss."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from oovrec_tpu.ops.cin_fused import cin_layer, cin_layer_reference


@pytest.mark.parametrize("H,F,D,B,L", [(5, 7, 4, 16, 6), (7, 7, 16, 128, 100)])
def test_cin_layer_matches_reference(H, F, D, B, L):
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((H, D, B)), jnp.float32)
    b0 = jnp.asarray(rng.standard_normal((F, D, B)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((H * F, L)) * 0.2, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(L) * 0.1, jnp.float32)
    np.testing.assert_allclose(
        np.asarray(cin_layer(a, b0, w, bias)),
        np.asarray(cin_layer_reference(a, b0, w, bias)),
        rtol=1e-5, atol=1e-5,
    )

    def lk(*args):
        return jnp.sum(jnp.sin(cin_layer(*args)))

    def lr(*args):
        return jnp.sum(jnp.sin(cin_layer_reference(*args)))

    gk = jax.grad(lk, argnums=(0, 1, 2, 3))(a, b0, w, bias)
    gr = jax.grad(lr, argnums=(0, 1, 2, 3))(a, b0, w, bias)
    for name, x, y in zip("a b0 w bias".split(), gk, gr):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), rtol=2e-4, atol=2e-4,
            err_msg=f"grad {name}",
        )


def test_xdeepfm_fused_cin_matches_xla_path():
    """Full model: loss and gradients identical (float tolerance) between
    `fused_cin` (interpret-mode kernel on CPU) and the XLA slab path —
    same params, same batch."""
    from oovrec_tpu.models import get_model_class
    from oovrec_tpu.models.context import FieldSpec

    fields = FieldSpec(
        token_names=("user_id", "item_id", "cat"),
        token_dims=(50, 40, 8),
        float_names=("price",),
        float_dims=(2,),
    )
    rng = np.random.default_rng(3)
    B = 16
    batch = {
        "user_id": rng.integers(0, 50, B).astype(np.int32),
        "item_id": rng.integers(1, 40, B).astype(np.int32),
        "cat": rng.integers(0, 8, B).astype(np.int32),
        "price": rng.random(B).astype(np.float32),
        "price__bucket": np.ones(B, np.int64),
        "label": (rng.random(B) < 0.5).astype(np.float32),
        "weight": np.ones(B, np.float32),
    }
    cls = get_model_class("xDeepFM")
    m_xla = cls(fields=fields, embedding_size=8, dropout_prob=0.0,
                cin_layer_size=(10, 10), fused_cin=False)
    m_fus = cls(fields=fields, embedding_size=8, dropout_prob=0.0,
                cin_layer_size=(10, 10), fused_cin=True)
    variables = m_xla.init(jax.random.key(0), batch, {},
                           method=m_xla.calculate_loss)

    def loss(m, v):
        return m.apply(v, batch, {}, method=m.calculate_loss)

    l1 = float(loss(m_xla, variables))
    l2 = float(loss(m_fus, variables))
    assert abs(l1 - l2) < 1e-5, (l1, l2)
    g1 = jax.grad(lambda p: loss(m_xla, {"params": p}))(variables["params"])
    g2 = jax.grad(lambda p: loss(m_fus, {"params": p}))(variables["params"])
    l1p = {str(k): v for k, v in jax.tree_util.tree_leaves_with_path(g1)}
    l2p = {str(k): v for k, v in jax.tree_util.tree_leaves_with_path(g2)}
    assert set(l1p) == set(l2p)
    for k in l1p:
        np.testing.assert_allclose(
            np.asarray(l1p[k]), np.asarray(l2p[k]), rtol=1e-4, atol=1e-5,
            err_msg=k,
        )


@pytest.mark.parametrize("H,F,D,B,L,nh,pool_all,tol", [
    (5, 7, 4, 16, 6, 3, False, 1e-5),     # mid layer (split halves)
    (5, 5, 8, 32, 10, 10, True, 1e-5),    # direct mode (hidden == all)
    (7, 7, 16, 128, 100, 0, True, 1e-5),  # last layer (pooled only)
    (7, 7, 16, 128, 100, 50, False, 1e-5),
])
def test_cin_layer_pooled_matches_reference(H, F, D, B, L, nh, pool_all,
                                            tol):
    """cin_layer_pooled == slice/pool of the XLA slab path, fwd + grad,
    for all three layer modes the model uses."""
    from oovrec_tpu.ops.cin_fused import cin_layer_pooled

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((H, D, B)), jnp.float32)
    b0 = jnp.asarray(rng.standard_normal((F, D, B)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((H * F, L)) * 0.2, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(L) * 0.1, jnp.float32)
    ps = 0 if pool_all else nh

    def ref(a, b0, w, bias):
        out = cin_layer_reference(a, b0, w, bias)
        return out[:nh], jnp.sum(out[ps:], axis=1)

    hid, pooled = cin_layer_pooled(a, b0, w, bias, n_hidden=nh,
                                   pool_all=pool_all)
    rhid, rpooled = ref(a, b0, w, bias)
    if nh:
        np.testing.assert_allclose(np.asarray(hid), np.asarray(rhid),
                                   rtol=tol, atol=tol)
    else:
        assert hid is None
    np.testing.assert_allclose(np.asarray(pooled), np.asarray(rpooled),
                               rtol=tol, atol=tol)

    def lk(*args):
        h, p = cin_layer_pooled(*args, n_hidden=nh, pool_all=pool_all)
        s = jnp.sum(jnp.sin(p))
        if nh:
            s = s + jnp.sum(jnp.cos(h.astype(jnp.float32)))
        return s

    def lr(*args):
        h, p = ref(*args)
        s = jnp.sum(jnp.sin(p))
        if nh:
            s = s + jnp.sum(jnp.cos(h))
        return s

    gk = jax.grad(lk, argnums=(0, 1, 2, 3))(a, b0, w, bias)
    gr = jax.grad(lr, argnums=(0, 1, 2, 3))(a, b0, w, bias)
    for name, x, y in zip("a b0 w bias".split(), gk, gr):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), rtol=2e-4, atol=2e-4,
            err_msg=f"grad {name}",
        )


def test_cin_layer_pooled_bf16_io():
    """Under the bf16 policy with (16, 128)-aligned blocks the kernel's
    I/O rides bf16 (cin_io_dtype) — values track the f32 reference to
    bf16 tolerance and hidden comes back in bf16."""
    from oovrec_tpu.ops.cin_fused import cin_io_dtype, cin_layer_pooled

    H, F, D, B, L, nh = 7, 7, 16, 128, 100, 50
    assert cin_io_dtype(D, B, "bfloat16") == jnp.bfloat16
    assert cin_io_dtype(4, 16, "bfloat16") == jnp.float32
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.standard_normal((H, D, B)), jnp.bfloat16)
    b0 = jnp.asarray(rng.standard_normal((F, D, B)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((H * F, L)) * 0.2, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(L) * 0.1, jnp.float32)
    hid, pooled = cin_layer_pooled(a, b0, w, bias, mxu_dtype="bfloat16",
                                   n_hidden=nh, pool_all=False)
    assert hid.dtype == jnp.bfloat16
    out = cin_layer_reference(a.astype(jnp.float32),
                              b0.astype(jnp.float32), w, bias)
    np.testing.assert_allclose(np.asarray(hid, dtype=np.float32),
                               np.asarray(out[:nh]), rtol=0.1, atol=0.15)
    np.testing.assert_allclose(np.asarray(pooled),
                               np.asarray(jnp.sum(out[nh:], axis=1)),
                               rtol=0.1, atol=0.3)
