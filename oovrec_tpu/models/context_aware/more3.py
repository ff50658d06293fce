"""Context models, fourth batch.

References: `context_aware_recommender/nfm.py`, `kd_dagfm.py`.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from oovrec_tpu.models.base import Batch, register_model
from oovrec_tpu.models.context import ContextRecommender
from oovrec_tpu.models.init import xavier_normal
from oovrec_tpu.models.losses import bce_with_logits


def _fm_no_reduce(emb):
    """Bi-interaction pooling (BaseFactorizationMachine reduce_sum=False,
    `layers.py` analog): 0.5 * ((Σe)² − Σe²), shape (B, D)."""
    s = jnp.sum(emb, axis=1)
    sq = jnp.sum(emb**2, axis=1)
    return 0.5 * (s**2 - sq)


@register_model
class NFM(ContextRecommender):
    """NFM (`nfm.py`): bi-interaction pooled embedding, batch-normed, fed
    through a sigmoid MLP; plus first-order linear term."""

    mlp_hidden_size: Tuple[int, ...] = (64, 32, 16)
    dropout_prob: float = 0.2

    def setup(self):
        self._setup_context()
        self.bn = nn.BatchNorm(momentum=0.9)
        self.hidden = [
            nn.Dense(h, kernel_init=xavier_normal, name=f"mlp_{i}")
            for i, h in enumerate(self.mlp_hidden_size)
        ]
        self.bns = [
            nn.BatchNorm(momentum=0.9, name=f"mlp_bn_{i}")
            for i in range(len(self.mlp_hidden_size))
        ]
        self.drop = nn.Dropout(self.dropout_prob)
        self.predict_layer = nn.Dense(1, use_bias=False,
                                      kernel_init=xavier_normal)

    def forward(self, batch: Batch, estate=None, train: bool = False):
        emb = self.concat_embed_input_fields(batch, estate)  # (B, F, D)
        h = self.bn(_fm_no_reduce(emb), use_running_average=not train)
        for layer, bn in zip(self.hidden, self.bns):
            h = bn(layer(h), use_running_average=not train)
            h = nn.sigmoid(h)
            h = self.drop(h, deterministic=not train)
        out = self.predict_layer(h) + self.first_order_linear(batch, estate)
        return out.squeeze(-1)

    def calculate_loss(self, batch: Batch, estate=None):
        return bce_with_logits(
            self.forward(batch, estate, train=True),
            batch[self.label_field], batch.get("weight"),
        )

    def predict(self, batch: Batch, estate=None):
        return nn.sigmoid(self.forward(batch, estate))


class _DAGFMCore(nn.Module):
    """DAGFM student (`kd_dagfm.py:117-183`): DAG propagation over field
    pairs with an upper-triangular adjacency; per-depth pooled states."""

    field_num: int
    embedding_size: int
    depth: int = 3
    interaction_type: str = "inner"

    @nn.compact
    def __call__(self, feature):
        F_, D = self.field_num, self.embedding_size
        adj = jnp.triu(jnp.ones((F_, F_)))[:, :, None]  # (F, F, 1)
        connect = self.param("connect_layer",
                             lambda k, s: jnp.eye(F_), (F_, F_))
        h0 = jnp.einsum("fg,bgd->bfd", connect, feature)
        ht = h0
        states = [jnp.sum(h0, axis=-1)]
        for i in range(self.depth):
            p = self.param(f"p_{i}", xavier_normal, (F_, F_, D))
            if self.interaction_type == "inner":
                aggr = jnp.einsum("bfd,fsd->bsd", ht, p * adj)
            else:  # outer
                q = self.param(f"q_{i}", xavier_normal, (F_, F_, D))
                term = jnp.einsum("bfd,fsd->bfs", ht, p * adj)
                aggr = jnp.einsum("bfs,fsd->bsd", term, q)
            ht = h0 * aggr
            states.append(jnp.sum(ht, axis=-1))
        state = jnp.concatenate(states, axis=-1)
        return nn.Dense(1, kernel_init=xavier_normal,
                        name="out")(state).squeeze(-1)


class _CrossNetTeacher(nn.Module):
    """CrossNet teacher (`kd_dagfm.py:186-221`)."""

    in_dim: int
    depth: int = 2

    @nn.compact
    def __call__(self, x0):
        x = x0
        for i in range(self.depth):
            w = nn.Dense(self.in_dim, kernel_init=xavier_normal,
                         name=f"cross_{i}")
            x = x0 * w(x) + x
        return nn.Dense(1, kernel_init=xavier_normal,
                        name="out")(x).squeeze(-1)


@register_model
class KD_DAGFM(ContextRecommender):
    """KD-DAGFM (`kd_dagfm.py`): DAGFM student distilled from a CrossNet
    teacher. `phase`: teacher_training → distillation → finetuning. In
    distillation the loss is α·CTR + β·(teacher_logit − student_logit)²
    with the teacher frozen via stop_gradient (torch `.eval()` + no-grad
    analog)."""

    phase: str = "teacher_training"
    alpha: float = 0.1
    beta: float = 1.0
    depth: int = 3
    interaction_type: str = "inner"
    teacher_depth: int = 2

    def setup(self):
        self._setup_context()
        F_ = self.fields.num_feature_field
        self.student = _DAGFMCore(
            field_num=F_, embedding_size=self.embedding_size,
            depth=self.depth, interaction_type=self.interaction_type,
        )
        self.teacher = _CrossNetTeacher(
            in_dim=F_ * self.embedding_size, depth=self.teacher_depth,
        )

    def _logits(self, batch, estate, train):
        emb = self.concat_embed_input_fields(batch, estate)  # (B, F, D)
        t = self.teacher(emb.reshape(emb.shape[0], -1))
        s = self.student(emb)
        return t, s

    def forward(self, batch: Batch, estate=None, train: bool = False):
        t, s = self._logits(batch, estate, train)
        return t if self.phase == "teacher_training" else s

    def calculate_loss(self, batch: Batch, estate=None):
        t, s = self._logits(batch, estate, True)
        label = batch[self.label_field]
        w = batch.get("weight")
        if self.phase == "teacher_training":
            return bce_with_logits(t, label, w)
        if self.phase == "finetuning":
            return bce_with_logits(s, label, w)
        # distillation
        ctr = bce_with_logits(s, label, w)
        kd = (jax.lax.stop_gradient(t) - s) ** 2
        kd = jnp.mean(kd) if w is None else (
            jnp.sum(kd * w) / jnp.maximum(jnp.sum(w), 1.0)
        )
        return self.alpha * ctr + self.beta * kd

    def predict(self, batch: Batch, estate=None):
        return nn.sigmoid(self.forward(batch, estate))
