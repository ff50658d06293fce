"""Shared model layers (`recbole/model/layers.py` analogs)."""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from oovrec_tpu.models.init import xavier_normal


def activation_fn(name: Optional[str]):
    if name is None or name == "none":
        return lambda x: x
    name = name.lower()
    return {
        "sigmoid": nn.sigmoid,
        "tanh": nn.tanh,
        "relu": nn.relu,
        "gelu": nn.gelu,
        "leakyrelu": nn.leaky_relu,
        "softmax": nn.softmax,
    }.get(name, nn.relu)


class MLPLayers(nn.Module):
    """Dropout→Dense→(BN)→activation stacks (`layers.py:33-95`).

    `layers` lists every width including the input width; activation (and
    BN) follow every Dense, including the last — exactly like the
    reference's module list.
    """

    layers: Sequence[int]
    dropout: float = 0.0
    activation: str = "relu"
    use_bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        from oovrec_tpu.utils.precision import compute_dtype

        act = activation_fn(self.activation)
        dt = compute_dtype()
        for out_size in self.layers[1:]:
            if self.dropout > 0:
                x = nn.Dropout(self.dropout, deterministic=not train)(x)
            x = nn.Dense(out_size, kernel_init=xavier_normal, dtype=dt)(x)
            if self.use_bn:
                x = nn.BatchNorm(use_running_average=not train, dtype=dt)(x)
            x = act(x)
        return x.astype(jnp.float32)


def masked_mean_pool(emb: jnp.ndarray, mask: jnp.ndarray, eps: float = 1e-8):
    """(B, L, D) × (B, L) → (B, D): the reference's token_seq mean mode
    (`abstract_recommender.py:553-566`)."""
    m = mask.astype(emb.dtype)[..., None]
    s = jnp.sum(emb * m, axis=1)
    cnt = jnp.sum(mask.astype(emb.dtype), axis=1, keepdims=True)
    return s / (cnt + eps)
