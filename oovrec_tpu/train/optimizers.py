"""Optimizer factory (`Trainer._build_optimizer`, `trainer.py:155-206`).

torch-semantics notes:
  * `weight_decay` in torch optimizers adds wd·param to the gradient BEFORE
    the adaptive transform — optax equivalent is `add_decayed_weights`
    chained BEFORE `scale_by_adam` (NOT adamw's decoupled decay).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class ScaleByLazyAdamState(NamedTuple):
    count: jnp.ndarray
    mu: optax.Updates
    nu: optax.Updates


def scale_by_lazy_adam(b1=0.9, b2=0.999, eps=1e-8):
    """torch SparseAdam semantics: rows of 2D (embedding-like) params whose
    gradient is entirely zero skip the moment update AND produce no
    parameter update — the step cost becomes O(touched rows) of HBM
    traffic instead of O(vocab). 1D/scalar params fall back to dense adam.
    """

    def init(params):
        z = jax.tree.map(jnp.zeros_like, params)
        return ScaleByLazyAdamState(jnp.zeros([], jnp.int32), z,
                                    jax.tree.map(jnp.zeros_like, params))

    def update(updates, state, params=None):
        count = state.count + 1

        def upd(g, mu, nu):
            if g.ndim == 2:
                touched = jnp.any(g != 0, axis=1, keepdims=True)
                new_mu = jnp.where(touched, b1 * mu + (1 - b1) * g, mu)
                new_nu = jnp.where(touched, b2 * nu + (1 - b2) * g * g, nu)
                mu_hat = new_mu / (1 - b1**count)
                nu_hat = new_nu / (1 - b2**count)
                step = jnp.where(
                    touched, mu_hat / (jnp.sqrt(nu_hat) + eps), 0.0
                )
                return step, new_mu, new_nu
            new_mu = b1 * mu + (1 - b1) * g
            new_nu = b2 * nu + (1 - b2) * g * g
            step = (new_mu / (1 - b1**count)) / (
                jnp.sqrt(new_nu / (1 - b2**count)) + eps
            )
            return step, new_mu, new_nu

        flat_u, treedef = jax.tree_util.tree_flatten(updates)
        flat_mu = treedef.flatten_up_to(state.mu)
        flat_nu = treedef.flatten_up_to(state.nu)
        out = [upd(g, m, n) for g, m, n in zip(flat_u, flat_mu, flat_nu)]
        steps = jax.tree_util.tree_unflatten(treedef, [o[0] for o in out])
        mus = jax.tree_util.tree_unflatten(treedef, [o[1] for o in out])
        nus = jax.tree_util.tree_unflatten(treedef, [o[2] for o in out])
        return steps, ScaleByLazyAdamState(count, mus, nus)

    return optax.GradientTransformation(init, update)


class ScaleByTorchAdamState(NamedTuple):
    count: optax.Updates  # PER-LEAF step counts (torch keeps one per param)
    mu: optax.Updates
    nu: optax.Updates


def scale_by_torch_adam(b1=0.9, b2=0.999, eps=1e-8, mu_dtype=None):
    """Bit-faithful torch plain-Adam step semantics for sparse touch
    patterns: a param whose gradient is identically zero this step
    (torch: `.grad is None` → the optimizer skips it) receives NO update,
    its moments do not advance, and — crucially — its PER-PARAM step
    count does not advance, so bias correction reflects how often the
    param was actually touched.

    optax's scale_by_adam differs twice for rarely-touched tables (e.g.
    OOV buckets trained only in OOV sub-epochs):
      (1) momentum glide — every-leaf-every-step updates keep moving the
          table on decaying mu through zero-grad steps (~1/(1-β1) extra
          travel per real gradient), and
      (2) a SHARED step count — `1/(1-β2^k)` uses the global k, so the
          second-moment bias correction is ~3× weaker than torch's
          per-param k, yielding ~2-3× larger effective steps early on.

    Off by default: both effects measurably IMPROVE inductive bucket
    quality (PARITY.md round-3 ablation — the mechanism behind the
    0.58-vs-0.14 lsh gap vs the reference). `optimizer_skip_zero_grads:
    true` reproduces the torch dynamics exactly.
    """

    def init(params):
        return ScaleByTorchAdamState(
            jax.tree.map(lambda p: jnp.zeros([], jnp.int32), params),
            jax.tree.map(
                lambda p: jnp.zeros_like(
                    p, dtype=mu_dtype or p.dtype
                ),
                params,
            ),
            jax.tree.map(jnp.zeros_like, params),
        )

    def update(updates, state, params=None):
        def upd(g, c, mu, nu):
            touched = jnp.any(g != 0)
            c2 = c + touched.astype(jnp.int32)
            new_mu = jnp.where(
                touched, b1 * mu.astype(g.dtype) + (1 - b1) * g,
                mu.astype(g.dtype),
            )
            new_nu = jnp.where(touched, b2 * nu + (1 - b2) * g * g, nu)
            k = jnp.maximum(c2, 1).astype(g.dtype)
            mu_hat = new_mu / (1 - b1**k)
            nu_hat = new_nu / (1 - b2**k)
            step = jnp.where(
                touched, mu_hat / (jnp.sqrt(nu_hat) + eps),
                jnp.zeros_like(g),
            )
            return step, c2, new_mu.astype(mu.dtype), new_nu

        flat_u, treedef = jax.tree_util.tree_flatten(updates)
        flat_c = treedef.flatten_up_to(state.count)
        flat_mu = treedef.flatten_up_to(state.mu)
        flat_nu = treedef.flatten_up_to(state.nu)
        out = [upd(g, c, m, n)
               for g, c, m, n in zip(flat_u, flat_c, flat_mu, flat_nu)]
        steps = treedef.unflatten([o[0] for o in out])
        counts = treedef.unflatten([o[1] for o in out])
        mus = treedef.unflatten([o[2] for o in out])
        nus = treedef.unflatten([o[3] for o in out])
        return steps, ScaleByTorchAdamState(counts, mus, nus)

    return optax.GradientTransformation(init, update)


def build_optimizer(learner: str, learning_rate: float, weight_decay: float = 0.0,
                    mu_dtype=None):
    """`mu_dtype='bfloat16'` stores Adam's first moment in bf16 — halves
    that buffer's HBM traffic (+13% train throughput on TPU v5e at the
    bench shapes) at negligible quality cost (second moment stays f32)."""
    learner = (learner or "adam").lower()
    if isinstance(mu_dtype, str):
        import jax.numpy as _jnp

        mu_dtype = _jnp.dtype(mu_dtype)
    txs = []
    if weight_decay:
        txs.append(optax.add_decayed_weights(weight_decay))
    if learner == "adam":
        txs.append(optax.scale_by_adam(mu_dtype=mu_dtype))
    elif learner == "sgd":
        pass
    elif learner == "adagrad":
        txs.append(optax.scale_by_rss())
    elif learner == "rmsprop":
        txs.append(optax.scale_by_rms())
    elif learner == "sparse_adam":
        txs.append(scale_by_lazy_adam())
    else:
        # reference falls back to adam with a warning
        txs.append(optax.scale_by_adam())
    txs.append(optax.scale(-learning_rate))
    return optax.chain(*txs)


def clip_by_norm(clip_args):
    """`clip_grad_norm` config dict → optax transform."""
    if not clip_args:
        return None
    max_norm = clip_args.get("max_norm", clip_args.get("max", 1.0))
    return optax.clip_by_global_norm(float(max_norm))
