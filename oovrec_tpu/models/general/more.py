"""Additional general recommenders.

References: `general_recommender/ease.py`, `multivae.py`, `dmf.py`.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from oovrec_tpu.models.base import Batch, GeneralRecommender, register_model
from oovrec_tpu.models.init import xavier_normal
from oovrec_tpu.utils.enums import InputType, ModelType


@register_model
class EASE(GeneralRecommender):
    """EASE (`ease.py`): closed-form item-item model
    B = −P / diag(P), P = (XᵀX + λI)⁻¹, diag(B)=0 — solved once on the
    host; scoring is hist-row @ B."""

    model_type = ModelType.TRADITIONAL
    input_type = InputType.POINTWISE
    reg_weight: float = 250.0

    def setup(self):
        self.dummy = self.param("dummy", nn.initializers.zeros, (1,))

    def calculate_loss(self, batch: Batch, estate=None):
        return jnp.sum(self.dummy * 0.0)

    def predict(self, batch: Batch, estate=None):
        s = self.full_sort_scores(batch, estate)
        return s[jnp.arange(s.shape[0]), batch[self.iid_field]]

    def full_sort_scores(self, batch: Batch, estate=None):
        hist = estate["user_hist_matrix"][batch[self.uid_field]]
        return hist @ estate["ease_B"]

    @staticmethod
    def build_estate(train_split, reg_weight: float = 250.0) -> dict:
        uid = train_split.inter[train_split.uid_field]
        iid = train_split.inter[train_split.iid_field]
        X = np.zeros((train_split.user_num, train_split.item_num), np.float32)
        X[uid, iid] = 1.0
        G = X.T @ X + reg_weight * np.eye(X.shape[1], dtype=np.float32)
        P = np.linalg.inv(G)
        # column-wise division: B_ij = −P_ij / P_jj (`ease.py:48`, the
        # paper's B = I − P·diagMat(1/diag P))
        B = -P / np.diag(P)[None, :]
        np.fill_diagonal(B, 0.0)
        return {"ease_B": B.astype(np.float32), "user_hist_matrix": X}


@register_model
class MultiVAE(GeneralRecommender):
    """Mult-VAE (`multivae.py`): variational autoencoder over the user's
    interaction vector with multinomial likelihood + KL annealing."""

    input_type = InputType.POINTWISE
    train_on_users = True
    latent_dim: int = 64
    encoder_hidden: Tuple[int, ...] = (256,)
    dropout_prob: float = 0.5
    anneal_cap: float = 0.2
    total_anneal_steps: int = 200000

    def setup(self):
        enc = []
        for i, h in enumerate(self.encoder_hidden):
            enc.append(nn.Dense(h, kernel_init=xavier_normal, name=f"enc_{i}"))
        self.enc_layers = enc
        self.enc_mu = nn.Dense(self.latent_dim, kernel_init=xavier_normal)
        self.enc_logvar = nn.Dense(self.latent_dim, kernel_init=xavier_normal)
        dec = []
        for i, h in enumerate(reversed(self.encoder_hidden)):
            dec.append(nn.Dense(h, kernel_init=xavier_normal, name=f"dec_{i}"))
        self.dec_layers = dec
        self.dec_out = nn.Dense(self.n_items, kernel_init=xavier_normal)
        self.in_dropout = nn.Dropout(self.dropout_prob)

    def _encode(self, x, train):
        h = x / jnp.maximum(
            jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12
        )
        h = self.in_dropout(h, deterministic=not train)
        for layer in self.enc_layers:
            h = nn.tanh(layer(h))
        return self.enc_mu(h), self.enc_logvar(h)

    def _decode(self, z):
        h = z
        for layer in self.dec_layers:
            h = nn.tanh(layer(h))
        return self.dec_out(h)

    def forward(self, hist, train: bool = False):
        mu, logvar = self._encode(hist, train)
        if train:
            eps = jax.random.normal(self.make_rng("dropout"), mu.shape)
            z = mu + eps * jnp.exp(0.5 * logvar)
        else:
            z = mu
        return self._decode(z), mu, logvar

    def calculate_loss(self, batch: Batch, estate=None):
        hist = estate["user_hist_matrix"][batch[self.uid_field]]
        w = batch.get("weight")
        logits, mu, logvar = self.forward(hist, train=True)
        logp = jax.nn.log_softmax(logits, axis=-1)
        ce = -jnp.sum(logp * hist, axis=1)
        kl = -0.5 * jnp.sum(1 + logvar - mu**2 - jnp.exp(logvar), axis=1)
        anneal = self.anneal_cap  # simplified constant annealing cap
        per_user = ce + anneal * kl
        if w is None:
            return jnp.mean(per_user)
        return jnp.sum(per_user * w) / jnp.maximum(jnp.sum(w), 1.0)

    def predict(self, batch: Batch, estate=None):
        s = self.full_sort_scores(batch, estate)
        return s[jnp.arange(s.shape[0]), batch[self.iid_field]]

    def full_sort_scores(self, batch: Batch, estate=None):
        hist = estate["user_hist_matrix"][batch[self.uid_field]]
        logits, _, _ = self.forward(hist, train=False)
        return logits

    @staticmethod
    def build_estate(train_split) -> dict:
        uid = train_split.inter[train_split.uid_field]
        iid = train_split.inter[train_split.iid_field]
        X = np.zeros((train_split.user_num, train_split.item_num), np.float32)
        X[uid, iid] = 1.0
        return {"user_hist_matrix": X}
