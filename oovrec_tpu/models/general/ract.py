"""RaCT (`general_recommender/ract.py`): Mult-VAE actor trained with a
learned NDCG critic.

Stages (reference `ract.py:63-67`):
  * ``actor_pretrain``  — plain Mult-VAE loss on the masked history.
  * ``critic_pretrain`` — MSE between the critic's prediction and the
    actual NDCG@k of the actor's reconstruction (actor frozen via
    stop_gradient; torch freezes encoder/decoder params).
  * ``finetune``        — maximize the critic's score (critic frozen via
    stop_gradient on its params).

The reference masks half of each user's history as "unseen" to score the
actor; we draw the same Bernoulli split per step from the dropout rng.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from oovrec_tpu.models.base import Batch, register_model
from oovrec_tpu.models.general.more import MultiVAE
from oovrec_tpu.models.init import xavier_normal


@register_model
class RaCT(MultiVAE):
    train_stage: str = "actor_pretrain"
    critic_layers: Tuple[int, ...] = (100, 100, 10)
    metrics_k: int = 100
    mask_ratio: float = 0.5

    def setup(self):
        super().setup()
        dims = (3,) + tuple(self.critic_layers) + (1,)
        self.critic_w = [
            self.param(f"critic_w{i}", xavier_normal, (di, do))
            for i, (di, do) in enumerate(zip(dims[:-1], dims[1:]))
        ]
        self.critic_b = [
            self.param(f"critic_b{i}", nn.initializers.zeros, (do,))
            for i, do in enumerate(dims[1:])
        ]

    def _critic(self, feats, freeze: bool):
        """3-feature MLP critic (`ract.py:157-167`); input standardized in
        lieu of the reference's leading BatchNorm."""
        h = (feats - jnp.mean(feats, axis=0, keepdims=True)) / (
            jnp.std(feats, axis=0, keepdims=True) + 1e-6
        )
        n = len(self.critic_w)
        for i, (w, b) in enumerate(zip(self.critic_w, self.critic_b)):
            if freeze:
                w, b = jax.lax.stop_gradient(w), jax.lax.stop_gradient(b)
            h = h @ w + b
            h = nn.relu(h) if i < n - 1 else nn.sigmoid(h)
        return h.squeeze(-1)

    def _actor_pieces(self, hist, rng):
        """Mask part of the history, run the actor, return per-user loss
        plus the critic features (`ract.py:105-148`)."""
        keep = jax.random.bernoulli(
            rng, 1.0 - self.mask_ratio, hist.shape
        ).astype(hist.dtype)
        seen = hist * keep
        unseen = hist * (1.0 - keep)
        logits, mu, logvar = self.forward(seen, train=True)
        logp = jax.nn.log_softmax(logits, axis=-1)
        ce = -jnp.sum(logp * hist, axis=1)
        kl = -0.5 * jnp.sum(1 + logvar - mu**2 - jnp.exp(logvar), axis=1)
        actor_loss = ce + self.anneal_cap * kl
        n_seen = jnp.sum(seen != 0, axis=1).astype(jnp.float32)
        n_unseen = jnp.sum(unseen != 0, axis=1).astype(jnp.float32)
        return actor_loss, logits, seen, unseen, n_seen, n_unseen

    def _ndcg(self, logits, unseen, seen):
        """NDCG@k of the reconstruction against held-out items
        (`ract.py:169-189`), fully on-device with static k."""
        k = self.metrics_k
        masked = jnp.where(seen != 0, -jnp.inf, logits)
        _, top_idx = jax.lax.top_k(masked, min(k, logits.shape[1]))
        topk_true = jnp.take_along_axis(unseen, top_idx, axis=1)
        tp = 1.0 / jnp.log2(jnp.arange(2, top_idx.shape[1] + 2))
        dcg = jnp.sum(topk_true * tp, axis=1)
        n_rel = jnp.sum(unseen > 0, axis=1)
        cum = jnp.cumsum(tp)
        idcg = cum[jnp.clip(jnp.minimum(n_rel, top_idx.shape[1]) - 1,
                            0, top_idx.shape[1] - 1)]
        idcg = jnp.where(n_rel > 0, idcg, 0.0)
        return dcg / jnp.maximum(idcg, 0.1)

    def calculate_loss(self, batch: Batch, estate=None):
        hist = estate["user_hist_matrix"][batch[self.uid_field]]
        w = batch.get("weight")
        rng = self.make_rng("dropout")
        actor_loss, logits, seen, unseen, n_seen, n_unseen = (
            self._actor_pieces(hist, rng)
        )

        def wmean(x):
            if w is None:
                return jnp.mean(x)
            return jnp.sum(x * w) / jnp.maximum(jnp.sum(w), 1.0)

        if self.train_stage == "actor_pretrain":
            return wmean(actor_loss)
        feats = jnp.stack([n_seen, n_unseen, actor_loss], axis=1)
        if self.train_stage == "critic_pretrain":
            feats = jax.lax.stop_gradient(feats)
            y = self._critic(feats, freeze=False)
            score = jax.lax.stop_gradient(
                self._ndcg(logits, unseen, seen)
            )
            return wmean((y - score) ** 2)
        # finetune: maximize critic score, critic frozen
        y = self._critic(feats, freeze=True)
        return wmean(-y)

    @staticmethod
    def build_estate(train_split) -> dict:
        return MultiVAE.build_estate(train_split)
