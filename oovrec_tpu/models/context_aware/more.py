"""Additional CTR towers on the shared context base.

References: `context_aware_recommender/dcn.py`, `autoint.py`, `fnn.py`,
`pnn.py`, `afm.py`, `fwfm.py` — each docstring notes the exact forward
semantics mirrored.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from oovrec_tpu.models.base import Batch, register_model
from oovrec_tpu.models.context import ContextRecommender
from oovrec_tpu.models.init import normal_init, xavier_normal
from oovrec_tpu.models.layers import MLPLayers
from oovrec_tpu.models.losses import bce, bce_with_logits, l2_reg


@register_model
class DCN(ContextRecommender):
    """DCN v1 (`dcn.py`): cross layers xₗ₊₁ = x₀·(xₗᵀwₗ) + bₗ + xₗ,
    parallel MLP, sigmoid head, BCE + L2 on cross weights."""

    cross_layer_num: int = 6
    mlp_hidden_size: Tuple[int, ...] = (256, 256, 256)
    reg_weight: float = 2.0
    dropout_prob: float = 0.2

    def setup(self):
        self._setup_context()
        d = self.in_feature_num
        init = normal_init(1.0)
        self.cross_w = self.param("cross_w", init, (self.cross_layer_num, d))
        self.cross_b = self.param(
            "cross_b", nn.initializers.zeros, (self.cross_layer_num, d)
        )
        self.mlp_layers = MLPLayers(
            (d,) + tuple(self.mlp_hidden_size),
            dropout=self.dropout_prob, use_bn=True,
        )
        self.predict_layer = nn.Dense(1, kernel_init=xavier_normal)

    def cross_network(self, x0):
        xl = x0
        for i in range(self.cross_layer_num):
            xlw = jnp.sum(xl * self.cross_w[i][None, :], axis=1, keepdims=True)
            xl = x0 * xlw + self.cross_b[i][None, :] + xl
        return xl

    def forward(self, batch: Batch, estate=None, train: bool = False):
        emb = self.concat_embed_input_fields(batch, estate)
        x0 = emb.reshape(emb.shape[0], -1)
        deep = self.mlp_layers(x0, train=train)
        cross = self.cross_network(x0)
        out = self.predict_layer(jnp.concatenate([cross, deep], axis=-1))
        return nn.sigmoid(out).squeeze(-1)

    def calculate_loss(self, batch: Batch, estate=None):
        reg = jnp.sum(
            jnp.sqrt(jnp.sum(self.cross_w**2, axis=1))
        )
        return bce(
            self.forward(batch, estate, train=True),
            batch[self.label_field], batch.get("weight"),
        ) + self.reg_weight * reg

    def predict(self, batch: Batch, estate=None):
        return self.forward(batch, estate)


@register_model
class AutoInt(ContextRecommender):
    """AutoInt (`autoint.py`): multi-head self-attention over field
    embeddings with residual projection, + first-order + deep part."""

    attention_size: int = 16
    n_layers: int = 3
    num_heads: int = 2
    dropout_probs: Tuple[float, ...] = (0.2, 0.2, 0.2)
    mlp_hidden_size: Tuple[int, ...] = (128, 128)

    def setup(self):
        self._setup_context()
        self.att_embedding = nn.Dense(
            self.attention_size, kernel_init=xavier_normal
        )
        self.attn_layers = [
            nn.MultiHeadDotProductAttention(
                num_heads=self.num_heads,
                qkv_features=self.attention_size,
                deterministic=True,
                name=f"attn_{i}",
            )
            for i in range(self.n_layers)
        ]
        self.v_res = nn.Dense(self.attention_size, kernel_init=xavier_normal)
        self.attn_fc = nn.Dense(1, kernel_init=xavier_normal)
        self.mlp_layers = MLPLayers(
            (self.in_feature_num,) + tuple(self.mlp_hidden_size),
            dropout=self.dropout_probs[1],
        )
        self.deep_predict_layer = nn.Dense(1, kernel_init=xavier_normal)

    def forward(self, batch: Batch, estate=None, train: bool = False):
        emb = self.concat_embed_input_fields(batch, estate)  # (B, F, D)
        att = self.att_embedding(emb)  # (B, F, att)
        x = att
        for layer in self.attn_layers:
            x = nn.relu(layer(x, x) + self.v_res(emb))
        att_out = self.attn_fc(x.reshape(x.shape[0], -1))
        deep = self.deep_predict_layer(
            self.mlp_layers(emb.reshape(emb.shape[0], -1), train=train)
        )
        y = self.first_order_linear(batch, estate) + att_out + deep
        return y.squeeze(-1)

    def calculate_loss(self, batch: Batch, estate=None):
        return bce_with_logits(
            self.forward(batch, estate, train=True),
            batch[self.label_field], batch.get("weight"),
        )

    def predict(self, batch: Batch, estate=None):
        return nn.sigmoid(self.forward(batch, estate))


@register_model
class FNN(ContextRecommender):
    """FNN (`fnn.py`): plain MLP over concatenated field embeddings."""

    mlp_hidden_size: Tuple[int, ...] = (128, 128)
    dropout_prob: float = 0.2

    def setup(self):
        self._setup_context()
        self.mlp_layers = MLPLayers(
            (self.in_feature_num,) + tuple(self.mlp_hidden_size),
            dropout=self.dropout_prob,
        )
        self.predict_layer = nn.Dense(1, kernel_init=xavier_normal)

    def forward(self, batch: Batch, estate=None, train: bool = False):
        emb = self.concat_embed_input_fields(batch, estate)
        out = self.predict_layer(
            self.mlp_layers(emb.reshape(emb.shape[0], -1), train=train)
        )
        return out.squeeze(-1)

    def calculate_loss(self, batch: Batch, estate=None):
        return bce_with_logits(
            self.forward(batch, estate, train=True),
            batch[self.label_field], batch.get("weight"),
        )

    def predict(self, batch: Batch, estate=None):
        return nn.sigmoid(self.forward(batch, estate))


@register_model
class PNN(ContextRecommender):
    """PNN (`pnn.py`): inner/outer product interactions ∥ linear part → MLP."""

    mlp_hidden_size: Tuple[int, ...] = (128, 128)
    dropout_prob: float = 0.2
    use_inner: bool = True
    use_outer: bool = False
    reg_weight: float = 0.0

    def setup(self):
        self._setup_context()
        F = self.fields.num_feature_field
        self._n_pairs = F * (F - 1) // 2
        in_size = self.in_feature_num
        if self.use_inner:
            in_size += self._n_pairs
        if self.use_outer:
            in_size += self._n_pairs
            self.outer_kernel = self.param(
                "outer_kernel", xavier_normal,
                (self._n_pairs, self.embedding_size),
            )
        self.mlp_layers = MLPLayers(
            (in_size,) + tuple(self.mlp_hidden_size),
            dropout=self.dropout_prob,
        )
        self.predict_layer = nn.Dense(1, kernel_init=xavier_normal)

    def _pairs(self, emb):
        F = emb.shape[1]
        iu, ju = jnp.triu_indices(F, k=1)
        return emb[:, iu, :], emb[:, ju, :]

    def forward(self, batch: Batch, estate=None, train: bool = False):
        emb = self.concat_embed_input_fields(batch, estate)
        parts = [emb.reshape(emb.shape[0], -1)]
        a, b = self._pairs(emb)
        if self.use_inner:
            parts.append(jnp.sum(a * b, axis=-1))
        if self.use_outer:
            parts.append(
                jnp.sum((a + b) * self.outer_kernel[None], axis=-1)
            )
        x = jnp.concatenate(parts, axis=1)
        out = self.predict_layer(self.mlp_layers(x, train=train))
        return out.squeeze(-1)

    def calculate_loss(self, batch: Batch, estate=None):
        return bce_with_logits(
            self.forward(batch, estate, train=True),
            batch[self.label_field], batch.get("weight"),
        )

    def predict(self, batch: Batch, estate=None):
        return nn.sigmoid(self.forward(batch, estate))


@register_model
class AFM(ContextRecommender):
    """AFM (`afm.py`): attention-weighted pairwise interactions + first
    order; BCE-with-logits + attention-W L2."""

    attention_size: int = 25
    dropout_prob: float = 0.3
    reg_weight: float = 2.0

    def setup(self):
        self._setup_context()
        self.attn_w = nn.Dense(self.attention_size, kernel_init=xavier_normal)
        self.attn_h = self.param(
            "attn_h", xavier_normal, (self.attention_size, 1)
        )
        self.attn_p = self.param(
            "attn_p", xavier_normal, (self.embedding_size, 1)
        )
        self.dropout = nn.Dropout(self.dropout_prob)

    def forward(self, batch: Batch, estate=None, train: bool = False):
        emb = self.concat_embed_input_fields(batch, estate)
        F = emb.shape[1]
        iu, ju = jnp.triu_indices(F, k=1)
        pair = emb[:, iu, :] * emb[:, ju, :]  # (B, P, D)
        att = nn.relu(self.attn_w(pair))  # (B, P, A)
        score = nn.softmax((att @ self.attn_h).squeeze(-1), axis=1)  # (B, P)
        weighted = jnp.sum(pair * score[:, :, None], axis=1)  # (B, D)
        weighted = self.dropout(weighted, deterministic=not train)
        afm_out = (weighted @ self.attn_p).squeeze(-1)
        y = self.first_order_linear(batch, estate).squeeze(-1) + afm_out
        return y

    def calculate_loss(self, batch: Batch, estate=None):
        out = self.forward(batch, estate, train=True)  # creates attn params
        reg = jnp.sum(self.attn_w.variables["params"]["kernel"] ** 2)
        return bce_with_logits(
            out, batch[self.label_field], batch.get("weight")
        ) + self.reg_weight * reg

    def predict(self, batch: Batch, estate=None):
        return nn.sigmoid(self.forward(batch, estate))


@register_model
class FwFM(ContextRecommender):
    """FwFM (`fwfm.py`): field-weighted pairwise interactions + first order."""

    dropout_prob: float = 0.2

    def setup(self):
        self._setup_context()
        F = self.fields.num_feature_field
        self._n_pairs = F * (F - 1) // 2
        self.pair_weight = self.param(
            "pair_weight", nn.initializers.ones, (self._n_pairs,)
        )

    def forward(self, batch: Batch, estate=None, train: bool = False):
        emb = self.concat_embed_input_fields(batch, estate)
        F = emb.shape[1]
        iu, ju = jnp.triu_indices(F, k=1)
        inner = jnp.sum(emb[:, iu, :] * emb[:, ju, :], axis=-1)  # (B, P)
        fwfm = jnp.sum(inner * self.pair_weight[None, :], axis=1)
        return self.first_order_linear(batch, estate).squeeze(-1) + fwfm

    def calculate_loss(self, batch: Batch, estate=None):
        return bce_with_logits(
            self.forward(batch, estate, train=True),
            batch[self.label_field], batch.get("weight"),
        )

    def predict(self, batch: Batch, estate=None):
        return nn.sigmoid(self.forward(batch, estate))
