"""Loss functions (`recbole/model/loss.py` analog), weight-mask aware.

Every loss takes an optional per-row `weight` (1 real / 0 pad) so padded
static-shape batches produce exactly the same value the reference computes
on its variable-size batches.
"""

from __future__ import annotations

import jax.numpy as jnp


def _wmean(x: jnp.ndarray, weight=None) -> jnp.ndarray:
    if weight is None:
        return jnp.mean(x)
    w = weight.astype(x.dtype)
    return jnp.sum(x * w) / jnp.maximum(jnp.sum(w), 1.0)


def bpr_loss(pos_score, neg_score, weight=None, gamma: float = 1e-10):
    """-log(gamma + sigmoid(pos - neg)), mean (`loss.py` BPRLoss)."""
    return _wmean(-jnp.log(gamma + jax_sigmoid(pos_score - neg_score)), weight)


def jax_sigmoid(x):
    return 1.0 / (1.0 + jnp.exp(-x))


def bce_with_logits(logits, labels, weight=None):
    """Numerically-stable binary cross entropy on logits."""
    loss = jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    return _wmean(loss, weight)


def bce(probs, labels, weight=None, eps: float = 1e-8):
    """BCE on probabilities (DCNv2 applies sigmoid before BCELoss)."""
    p = jnp.clip(probs, eps, 1.0 - eps)
    loss = -(labels * jnp.log(p) + (1.0 - labels) * jnp.log(1.0 - p))
    return _wmean(loss, weight)


def emb_loss(*embeddings, norm: int = 2, require_pow: bool = False):
    """EmbLoss: sum of embedding norms / batch (`loss.py` EmbLoss)."""
    total = 0.0
    batch = embeddings[-1].shape[0]
    for e in embeddings:
        if require_pow:
            total = total + jnp.sum(jnp.abs(e) ** norm)
        else:
            total = total + jnp.linalg.norm(e.reshape(-1), ord=norm)
    if require_pow:
        total = total / norm
    return total / batch


def l2_reg(params_list):
    """Sum of squared L2 norms (RegLoss analog for weight lists)."""
    total = 0.0
    for p in params_list:
        total = total + jnp.sum(p**2)
    return total
