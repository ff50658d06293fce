"""DCNv2 (`recbole/model/context_aware_recommender/dcnv2.py:30-267`):
CrossNet v2 (xₗ₊₁ = x₀⊙(Wxₗ+b)+xₗ) or mixture-of-experts low-rank cross,
parallel/stacked MLP head, BCE + L2 over cross weights.

TPU note: the per-expert python loops of the reference collapse into
batched einsums over an (experts, …) leading axis — one MXU-friendly
contraction per cross layer instead of expert_num small matmuls."""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from oovrec_tpu.models.base import Batch, register_model
from oovrec_tpu.models.context import ContextRecommender
from oovrec_tpu.models.init import xavier_normal, normal_init
from oovrec_tpu.models.layers import MLPLayers
from oovrec_tpu.models.losses import bce


@register_model
class DCNV2(ContextRecommender):
    # loss consumes inter columns + joined feature columns + label,
    # all of which the pointwise device epoch provides
    supports_device_epoch = True
    mixed: bool = False
    structure: str = "stacked"
    cross_layer_num: int = 3
    expert_num: int = 4
    low_rank: int = 128
    mlp_hidden_size: Tuple[int, ...] = (768, 768)
    reg_weight: float = 2.0
    dropout_prob: float = 0.2

    def setup(self):
        self._setup_context()
        d = self.in_feature_num
        L = self.cross_layer_num
        init = normal_init(1.0)  # reference: torch.randn
        if self.mixed:
            k, r = self.expert_num, self.low_rank
            self.cross_layer_u = self.param("cross_layer_u", init, (L, k, d, r))
            self.cross_layer_v = self.param("cross_layer_v", init, (L, k, d, r))
            self.cross_layer_c = self.param("cross_layer_c", init, (L, k, r, r))
            self.gating = [
                nn.Dense(1, kernel_init=xavier_normal, name=f"gating_{i}")
                for i in range(k)
            ]
        else:
            self.cross_layer_w = self.param("cross_layer_w", init, (L, d, d))
        self.cross_bias = self.param(
            "cross_bias", nn.initializers.zeros, (L, d)
        )
        self.mlp_layers = MLPLayers(
            (d,) + tuple(self.mlp_hidden_size),
            dropout=self.dropout_prob, use_bn=True,
        )
        head_in = (
            d + self.mlp_hidden_size[-1]
            if self.structure == "parallel"
            else self.mlp_hidden_size[-1]
        )
        self.predict_layer = nn.Dense(1, kernel_init=xavier_normal)

    def cross_network(self, x0):
        # global precision policy (utils/precision.py): bf16 operands on
        # the MXU (fp32 accumulate) when compute_dtype=bfloat16
        from oovrec_tpu.utils.precision import compute_dtype

        dt = compute_dtype()
        x0 = x0.astype(dt)
        xl = x0
        for i in range(self.cross_layer_num):
            xl_w = jnp.einsum("ij,bj->bi", self.cross_layer_w[i].astype(dt), xl)
            xl = x0 * (xl_w + self.cross_bias[i][None, :].astype(dt)) + xl
        return xl.astype(jnp.float32)

    def cross_network_mix(self, x0):
        """MoE low-rank cross: experts batched on a leading axis."""
        from oovrec_tpu.utils.precision import compute_dtype

        dt = compute_dtype()
        x0 = x0.astype(dt)
        xl = x0
        for i in range(self.cross_layer_num):
            # (B, k, r): project into low-rank space per expert
            xl_v = jnp.einsum(
                "kdr,bd->bkr", self.cross_layer_v[i].astype(dt), xl)
            xl_c = jnp.tanh(xl_v)
            xl_c = jnp.einsum(
                "krs,bks->bkr", self.cross_layer_c[i].astype(dt), xl_c)
            xl_c = jnp.tanh(xl_c)
            xl_u = jnp.einsum(
                "kdr,bkr->bkd", self.cross_layer_u[i].astype(dt), xl_c)
            xl_dot = x0[:, None, :] * (
                xl_u + self.cross_bias[i][None, None, :].astype(dt))
            gates = jnp.concatenate(
                [g(xl) for g in self.gating], axis=1
            )  # (B, k)
            gates = nn.softmax(gates.astype(jnp.float32), axis=1).astype(dt)
            xl = xl + jnp.einsum("bkd,bk->bd", xl_dot, gates)
        return xl.astype(jnp.float32)

    def forward(self, batch: Batch, estate=None, train: bool = False):
        emb = self.concat_embed_input_fields(batch, estate)
        b = emb.shape[0]
        x0 = emb.reshape(b, -1)
        cross = self.cross_network_mix(x0) if self.mixed else self.cross_network(x0)
        if self.structure == "parallel":
            deep = self.mlp_layers(x0, train=train)
            out = self.predict_layer(jnp.concatenate([cross, deep], axis=-1))
        else:
            deep = self.mlp_layers(cross, train=train)
            out = self.predict_layer(deep)
        return nn.sigmoid(out).squeeze(-1)

    def calculate_loss(self, batch: Batch, estate=None):
        label = batch[self.label_field]
        out = self.forward(batch, estate, train=True)
        if self.mixed:
            reg = (
                _norm2(self.cross_layer_c)
                + _norm2(self.cross_layer_v)
                + _norm2(self.cross_layer_u)
            )
        else:
            reg = _norm2(self.cross_layer_w)
        return bce(out, label, batch.get("weight")) + self.reg_weight * reg

    def predict(self, batch: Batch, estate=None):
        return self.forward(batch, estate)


def _norm2(w):
    """RegLoss semantics: Frobenius norm per parameter list entry, summed
    (`loss.py:50-62`); the reference iterates a ParameterList of per-layer
    tensors, so sum per-layer norms."""
    return jnp.sum(
        jnp.sqrt(jnp.sum(w.reshape(w.shape[0], -1) ** 2, axis=1))
    )
