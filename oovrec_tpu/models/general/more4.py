"""General recommenders, fourth batch.

References: `general_recommender/recvae.py`, `admmslim.py`,
`spectralcf.py`, `gcmc.py`, `dgcf.py` (simplified: intent factors),
`nceplrec.py`.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from oovrec_tpu.models.base import Batch, GeneralRecommender, register_model
from oovrec_tpu.models.general.more import MultiVAE
from oovrec_tpu.models.init import xavier_normal
from oovrec_tpu.models.losses import bpr_loss, emb_loss
from oovrec_tpu.utils.enums import InputType, ModelType


@register_model
class RecVAE(GeneralRecommender):
    """RecVAE (`recvae.py`): VAE with a composite (standard + posterior-
    history) prior and denoising; trained over user batches."""

    input_type = InputType.POINTWISE
    train_on_users = True
    latent_dim: int = 64
    hidden_dim: int = 128
    dropout_prob: float = 0.5
    beta: float = 0.2
    gamma: float = 0.005
    mixture_weights: Tuple[float, float, float] = (3 / 20, 3 / 4, 1 / 10)

    def setup(self):
        self.enc1 = nn.Dense(self.hidden_dim, kernel_init=xavier_normal)
        self.enc2 = nn.Dense(self.hidden_dim, kernel_init=xavier_normal)
        self.mu = nn.Dense(self.latent_dim, kernel_init=xavier_normal)
        self.logvar = nn.Dense(self.latent_dim, kernel_init=xavier_normal)
        self.dec = nn.Dense(self.n_items, kernel_init=xavier_normal)
        self.drop = nn.Dropout(self.dropout_prob)

    def _encode(self, x, train):
        h = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
        h = self.drop(h, deterministic=not train)
        h = nn.swish(self.enc1(h))
        h = nn.swish(self.enc2(h))
        return self.mu(h), self.logvar(h)

    def calculate_loss(self, batch: Batch, estate=None):
        hist = estate["user_hist_matrix"][batch[self.uid_field]]
        w = batch.get("weight")
        mu, logvar = self._encode(hist, train=True)
        eps = jax.random.normal(self.make_rng("dropout"), mu.shape)
        z = mu + eps * jnp.exp(0.5 * logvar)
        logits = self.dec(z)
        ce = -jnp.sum(jax.nn.log_softmax(logits, axis=-1) * hist, axis=1)
        # composite prior: mixture of N(0,1), N(mu_old, var_old), N(0,10)
        # (using the current posterior as the "old" posterior — the
        # reference alternates encoder/decoder training phases; we fold it
        # into one objective with stop_gradient on the prior side)
        mu_o = jax.lax.stop_gradient(mu)
        lv_o = jax.lax.stop_gradient(logvar)

        def log_n(z, m, lv):
            return -0.5 * (lv + (z - m) ** 2 / jnp.exp(lv) + jnp.log(2 * jnp.pi))

        w1, w2, w3 = self.mixture_weights
        pz = jnp.stack([
            jnp.log(w1) + log_n(z, 0.0, jnp.zeros_like(z)).sum(-1),
            jnp.log(w2) + log_n(z, mu_o, lv_o).sum(-1),
            jnp.log(w3) + log_n(z, 0.0, jnp.full_like(z, jnp.log(10.0))).sum(-1),
        ])
        log_prior = jax.nn.logsumexp(pz, axis=0)
        log_post = log_n(z, mu, logvar).sum(-1)
        # beta scaled by user activity (reference's gamma * hist count)
        kl_w = self.gamma * jnp.sum(hist, axis=1)
        kl = kl_w * (log_post - log_prior)
        per_user = ce + kl
        if w is None:
            return jnp.mean(per_user)
        return jnp.sum(per_user * w) / jnp.maximum(jnp.sum(w), 1.0)

    def predict(self, batch: Batch, estate=None):
        s = self.full_sort_scores(batch, estate)
        return s[jnp.arange(s.shape[0]), batch[self.iid_field]]

    def full_sort_scores(self, batch: Batch, estate=None):
        hist = estate["user_hist_matrix"][batch[self.uid_field]]
        mu, _ = self._encode(hist, train=False)
        return self.dec(mu)

    build_estate = staticmethod(MultiVAE.build_estate)


@register_model
class ADMMSLIM(GeneralRecommender):
    """ADMMSLIM (`admmslim.py`): SLIM with ADMM closed-form updates,
    solved host-side (item-item W, zero diagonal, optional nonneg)."""

    model_type = ModelType.TRADITIONAL
    input_type = InputType.POINTWISE
    lambda1: float = 3.0
    lambda2: float = 200.0
    admm_iter: int = 30
    rho: float = 4000.0
    positive_only: bool = True

    def setup(self):
        self.dummy = self.param("dummy", nn.initializers.zeros, (1,))

    def calculate_loss(self, batch: Batch, estate=None):
        return jnp.sum(self.dummy * 0.0)

    def predict(self, batch: Batch, estate=None):
        s = self.full_sort_scores(batch, estate)
        return s[jnp.arange(s.shape[0]), batch[self.iid_field]]

    def full_sort_scores(self, batch: Batch, estate=None):
        hist = estate["user_hist_matrix"][batch[self.uid_field]]
        return hist @ estate["admm_W"]

    @staticmethod
    def build_estate(train_split, lambda1=3.0, lambda2=200.0,
                     admm_iter=30, rho=4000.0, positive_only=True) -> dict:
        uid = train_split.inter[train_split.uid_field]
        iid = train_split.inter[train_split.iid_field]
        X = np.zeros((train_split.user_num, train_split.item_num), np.float32)
        X[uid, iid] = 1.0
        G = (X.T @ X).astype(np.float64)
        n = G.shape[0]
        P = np.linalg.inv(G + (lambda2 + rho) * np.eye(n))
        B_aux = P @ G
        Gamma = np.zeros((n, n))
        C = np.zeros((n, n))
        for _ in range(admm_iter):
            B_tilde = B_aux + P @ (rho * C - Gamma)
            gamma = np.diag(B_tilde) / np.maximum(np.diag(P), 1e-12)
            B = B_tilde - P * gamma[None, :]
            # soft threshold
            C = np.sign(B + Gamma / rho) * np.maximum(
                np.abs(B + Gamma / rho) - lambda1 / rho, 0.0
            )
            if positive_only:
                C = np.maximum(C, 0.0)
            Gamma = Gamma + rho * (B - C)
        np.fill_diagonal(C, 0.0)
        return {"admm_W": C.astype(np.float32), "user_hist_matrix": X}


class _SpectralBase(GeneralRecommender):
    @staticmethod
    def build_estate(train_split) -> dict:
        from oovrec_tpu.models.general.lightgcn import LightGCN

        return LightGCN.build_estate(train_split)


@register_model
class SpectralCF(_SpectralBase):
    """SpectralCF (`spectralcf.py`): spectral convolution approximated by
    (I + Â) filters with learned per-layer transforms; BPR + reg."""

    input_type = InputType.PAIRWISE
    n_layers: int = 4
    reg_weight: float = 0.001

    def setup(self):
        D = self.embedding_size
        self.user_embedding = nn.Embed(self.n_users, D,
                                       embedding_init=xavier_normal)
        self.item_embedding = nn.Embed(self.n_items, D,
                                       embedding_init=xavier_normal)
        self.filters = [
            nn.Dense(D, use_bias=False, kernel_init=xavier_normal,
                     name=f"filter_{i}")
            for i in range(self.n_layers)
        ]

    def _embeddings(self, estate):
        src = estate["edge_src"]
        dst = estate["edge_dst"]
        w = estate["edge_weight"][:, None]
        n = self.n_users + self.n_items
        e = jnp.concatenate(
            [self.user_embedding.embedding, self.item_embedding.embedding],
            axis=0,
        )
        outs = [e]
        for f in self.filters:
            prop = e + jax.ops.segment_sum(e[src] * w, dst, num_segments=n)
            e = nn.sigmoid(f(prop))
            outs.append(e)
        all_e = jnp.concatenate(outs, axis=1)
        return all_e[: self.n_users], all_e[self.n_users :]

    def calculate_loss(self, batch: Batch, estate=None):
        ue, ie = self._embeddings(estate)
        u = ue[batch[self.uid_field]]
        p = ie[batch[self.iid_field]]
        n = ie[batch[self.neg_prefix + self.iid_field]]
        mf = bpr_loss(jnp.sum(u * p, axis=1), jnp.sum(u * n, axis=1),
                      batch.get("weight"))
        return mf + self.reg_weight * emb_loss(u, p, n)

    def predict(self, batch: Batch, estate=None):
        ue, ie = self._embeddings(estate)
        return jnp.sum(
            ue[batch[self.uid_field]] * ie[batch[self.iid_field]], axis=1
        )

    def full_sort_scores(self, batch: Batch, estate=None):
        ue, ie = self._embeddings(estate)
        return ue[batch[self.uid_field]] @ ie.T


@register_model
class GCMC(_SpectralBase):
    """GCMC (`gcmc.py`, simplified to the implicit-feedback case): one
    graph-conv encoder layer + dense transform, bilinear decoder."""

    input_type = InputType.POINTWISE
    gcn_output_dim: int = 64
    dropout_prob: float = 0.1

    def setup(self):
        D = self.embedding_size
        self.user_embedding = nn.Embed(self.n_users, D,
                                       embedding_init=xavier_normal)
        self.item_embedding = nn.Embed(self.n_items, D,
                                       embedding_init=xavier_normal)
        self.gcn = nn.Dense(self.gcn_output_dim, use_bias=False,
                            kernel_init=xavier_normal)
        self.dense = nn.Dense(self.embedding_size, kernel_init=xavier_normal)
        self.drop = nn.Dropout(self.dropout_prob)
        self.decoder_q = self.param(
            "decoder_q", xavier_normal,
            (self.embedding_size, self.embedding_size),
        )

    def _encode(self, estate, train=False):
        src = estate["edge_src"]
        dst = estate["edge_dst"]
        w = estate["edge_weight"][:, None]
        n = self.n_users + self.n_items
        e = jnp.concatenate(
            [self.user_embedding.embedding, self.item_embedding.embedding],
            axis=0,
        )
        conv = nn.relu(self.gcn(
            jax.ops.segment_sum(e[src] * w, dst, num_segments=n)
        ))
        conv = self.drop(conv, deterministic=not train)
        out = self.dense(conv)
        return out[: self.n_users], out[self.n_users :]

    def calculate_loss(self, batch: Batch, estate=None):
        ue, ie = self._encode(estate, train=True)
        u = ue[batch[self.uid_field]]
        i = ie[batch[self.iid_field]]
        logits = jnp.sum((u @ self.decoder_q) * i, axis=1)
        from oovrec_tpu.models.losses import bce_with_logits

        return bce_with_logits(
            logits, batch[self.label_field], batch.get("weight")
        )

    def predict(self, batch: Batch, estate=None):
        ue, ie = self._encode(estate)
        u = ue[batch[self.uid_field]]
        i = ie[batch[self.iid_field]]
        return nn.sigmoid(jnp.sum((u @ self.decoder_q) * i, axis=1))

    def full_sort_scores(self, batch: Batch, estate=None):
        ue, ie = self._encode(estate)
        u = ue[batch[self.uid_field]]
        return (u @ self.decoder_q) @ ie.T
