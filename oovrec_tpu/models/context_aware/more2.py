"""Context models, third batch.

References: `context_aware_recommender/dssm.py`, `fignn.py`,
`eulernet.py`.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from oovrec_tpu.models.base import Batch, register_model
from oovrec_tpu.models.context import ContextRecommender
from oovrec_tpu.models.init import xavier_normal
from oovrec_tpu.models.layers import MLPLayers
from oovrec_tpu.models.losses import bce_with_logits


@register_model
class DSSM(ContextRecommender):
    """DSSM (`dssm.py`): user-field tower vs item-field tower, cosine
    similarity, BCE. Field split: user_id+user features | item_id+item
    features (the reference's double-tower split)."""

    mlp_hidden_size: Tuple[int, ...] = (256, 256, 128)
    dropout_prob: float = 0.3

    def setup(self):
        self._setup_context()
        self.user_mlp = MLPLayers(
            (self.embedding_size * len(self.fields.user_token_idx),)
            + tuple(self.mlp_hidden_size),
            dropout=self.dropout_prob, name="user_mlp",
        )
        self.item_mlp = MLPLayers(
            (self.embedding_size * len(self.fields.item_token_idx),)
            + tuple(self.mlp_hidden_size),
            dropout=self.dropout_prob, name="item_mlp",
        )

    def forward(self, batch: Batch, estate=None, train: bool = False):
        sparse, dense = self.field_embedding(batch, estate)
        parts = [sparse] if sparse is not None else []
        if dense is not None:
            parts.append(dense)
        emb = jnp.concatenate(parts, axis=1)  # (B, F, D)
        n_seq = len(self.fields.token_seq_names)
        tok = emb[:, n_seq : n_seq + len(self.fields.token_names), :]
        uf = jnp.asarray(self.fields.user_token_idx)
        itf = jnp.asarray(self.fields.item_token_idx)
        u = tok[:, uf, :].reshape(tok.shape[0], -1)
        i = tok[:, itf, :].reshape(tok.shape[0], -1)
        u = self.user_mlp(u, train=train)
        i = self.item_mlp(i, train=train)
        nu = jnp.sqrt(jnp.sum(u**2, axis=1) + 1e-12)
        ni = jnp.sqrt(jnp.sum(i**2, axis=1) + 1e-12)
        return jnp.sum(u * i, axis=1) / (nu * ni)

    def calculate_loss(self, batch: Batch, estate=None):
        return bce_with_logits(
            self.forward(batch, estate, train=True),
            batch[self.label_field], batch.get("weight"),
        )

    def predict(self, batch: Batch, estate=None):
        return nn.sigmoid(self.forward(batch, estate))


@register_model
class FiGNN(ContextRecommender):
    """FiGNN (`fignn.py`): fully-connected field graph; GRU-style state
    updates driven by attentional edge weights; attentional readout."""

    attention_size: int = 16
    n_layers: int = 2
    num_heads: int = 2
    dropout_probs: Tuple[float, float] = (0.2, 0.2)

    def setup(self):
        self._setup_context()
        F = self.fields.num_feature_field
        self.att_embedding = nn.Dense(self.attention_size,
                                      kernel_init=xavier_normal)
        self.self_attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=self.attention_size,
            deterministic=True,
        )
        self.res_proj = nn.Dense(self.attention_size, use_bias=False,
                                 kernel_init=xavier_normal)
        # edge attention (leaky relu of pair concat)
        self.edge_w = nn.Dense(1, use_bias=False, kernel_init=xavier_normal)
        self.gru = nn.GRUCell(features=self.attention_size)
        self.readout_w1 = nn.Dense(1, kernel_init=xavier_normal)
        self.readout_w2 = nn.Dense(1, kernel_init=xavier_normal)

    def forward(self, batch: Batch, estate=None, train: bool = False):
        emb = self.concat_embed_input_fields(batch, estate)  # (B, F, D)
        B, F, _ = emb.shape
        h = nn.relu(self.self_attn(self.att_embedding(emb)) +
                    self.res_proj(emb))                      # (B, F, A)
        h0 = h
        # attentional adjacency over field pairs
        hi = jnp.repeat(h0[:, :, None, :], F, axis=2)
        hj = jnp.repeat(h0[:, None, :, :], F, axis=1)
        e = nn.leaky_relu(
            self.edge_w(jnp.concatenate([hi, hj], axis=-1))
        ).squeeze(-1)                                        # (B, F, F)
        e = e - 1e9 * jnp.eye(F)[None]
        adj = nn.softmax(e, axis=-1)
        state = h
        for _ in range(self.n_layers):
            agg = jnp.einsum("bfg,bgd->bfd", adj, state)
            flat_state = state.reshape(B * F, -1)
            flat_agg = agg.reshape(B * F, -1)
            new_state, _ = self.gru(flat_state, flat_agg)
            state = new_state.reshape(B, F, -1) + h0
        score = (
            self.readout_w1(state).squeeze(-1)
            * nn.sigmoid(self.readout_w2(state)).squeeze(-1)
        ).sum(axis=1)
        return score

    def calculate_loss(self, batch: Batch, estate=None):
        return bce_with_logits(
            self.forward(batch, estate, train=True),
            batch[self.label_field], batch.get("weight"),
        )

    def predict(self, batch: Batch, estate=None):
        return nn.sigmoid(self.forward(batch, estate))


@register_model
class EulerNet(ContextRecommender):
    """EulerNet (`eulernet.py`): feature interactions in the complex
    (Euler) domain — adaptive-order interactions as rotations
    (modulus-log/phase-linear maps)."""

    order_list: Tuple[int, ...] = (7,)
    drop_ex: float = 0.3
    drop_im: float = 0.3
    apply_norm: bool = False

    def setup(self):
        self._setup_context()
        F = self.fields.num_feature_field
        n_out = sum([1] * len(self.order_list))
        self.order_w = self.param(
            "order_w", xavier_normal, (F, F * len(self.order_list))
        )
        self.mu = self.param("mu", nn.initializers.ones, (F,))
        self.reg = nn.Dense(1, use_bias=False, kernel_init=xavier_normal)
        self.drop_ex_l = nn.Dropout(self.drop_ex)
        self.drop_im_l = nn.Dropout(self.drop_im)

    def forward(self, batch: Batch, estate=None, train: bool = False):
        emb = self.concat_embed_input_fields(batch, estate)  # (B, F, D)
        r = self.mu[None, :, None] * jnp.cos(emb)
        p = self.mu[None, :, None] * jnp.sin(emb)
        # log-modulus / phase linear transform (adaptive order)
        lam = jnp.sqrt(r**2 + p**2 + 1e-12)
        theta = jnp.arctan2(p, r)
        log_lam = jnp.log(lam)
        log_lam = self.drop_ex_l(log_lam, deterministic=not train)
        theta = self.drop_ex_l(theta, deterministic=not train)
        o_log = jnp.einsum("bfd,fg->bgd", log_lam, self.order_w)
        o_theta = jnp.einsum("bfd,fg->bgd", theta, self.order_w)
        r_out = jnp.exp(o_log) * jnp.cos(o_theta)
        p_out = jnp.exp(o_log) * jnp.sin(o_theta)
        r_out = self.drop_im_l(r_out, deterministic=not train)
        p_out = self.drop_im_l(p_out, deterministic=not train)
        both = jnp.concatenate(
            [r_out.reshape(r_out.shape[0], -1), p_out.reshape(p_out.shape[0], -1)],
            axis=1,
        )
        return self.reg(both).squeeze(-1)

    def calculate_loss(self, batch: Batch, estate=None):
        return bce_with_logits(
            self.forward(batch, estate, train=True),
            batch[self.label_field], batch.get("weight"),
        )

    def predict(self, batch: Batch, estate=None):
        return nn.sigmoid(self.forward(batch, estate))
