"""Sequential recommenders, sixth batch: RepeatNet, GRU4RecKG, KSR.

References: `sequential_recommender/repeatnet.py`, `gru4reckg.py`,
`ksr.py`.

GRU4RecKG and KSR consume pretrained KG entity vectors via the dataset's
``preload_weight`` mechanism (`get_preload_weight`); when no preload file
is configured they fall back to a seeded random matrix (documented
deviation — the reference hard-requires the preload file)."""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from oovrec_tpu.models.base import Batch, register_model
from oovrec_tpu.models.init import xavier_normal
from oovrec_tpu.models.losses import bpr_loss
from oovrec_tpu.models.sequential.base import SequentialRecommender, _log_softmax
from oovrec_tpu.models.sequential.gru4rec import GRU4Rec


def _scatter_probs(probs, seq, n_items):
    """(B, L) position probabilities → (B, n_items) via scatter-add over
    the sequence item ids (reference `build_map` one-hot matmul,
    `repeatnet.py:312-330`, without materializing the (B, L, N) map)."""
    B = probs.shape[0]
    out = jnp.zeros((B, n_items), probs.dtype)
    b_idx = jnp.arange(B)[:, None]
    return out.at[b_idx, seq].add(probs)


@register_model
class RepeatNet(SequentialRecommender):
    """RepeatNet (`repeatnet.py`): GRU encoder + repeat/explore gate;
    the repeat decoder redistributes attention over history items, the
    explore decoder scores the full vocabulary with history masked out."""

    hidden_size: int = 64
    dropout_prob: float = 0.5
    joint_train: bool = False

    def setup(self):
        D = self.embedding_size
        H = self.hidden_size
        self.item_embedding = nn.Embed(self.n_items, D,
                                       embedding_init=xavier_normal)
        ScanGRU = nn.scan(
            nn.GRUCell, variable_broadcast="params",
            split_rngs={"params": False}, in_axes=1, out_axes=1,
        )
        self.gru = ScanGRU(features=H, name="gru")
        # repeat/explore gate
        self.w_re = nn.Dense(H, use_bias=False, kernel_init=xavier_normal)
        self.u_re = nn.Dense(H, use_bias=False, kernel_init=xavier_normal)
        self.v_re = nn.Dense(1, use_bias=False, kernel_init=xavier_normal)
        self.w_cre = nn.Dense(2, use_bias=False, kernel_init=xavier_normal)
        # repeat decoder
        self.w_r = nn.Dense(H, use_bias=False, kernel_init=xavier_normal)
        self.u_r = nn.Dense(H, use_bias=False, kernel_init=xavier_normal)
        self.v_r = nn.Dense(1, kernel_init=xavier_normal)
        # explore decoder
        self.w_e = nn.Dense(H, kernel_init=xavier_normal)
        self.u_e = nn.Dense(H, kernel_init=xavier_normal)
        self.v_e = nn.Dense(1, kernel_init=xavier_normal)
        self.explore_out = nn.Dense(self.n_items, use_bias=False,
                                    kernel_init=xavier_normal)
        self.drop = nn.Dropout(self.dropout_prob)

    def _probs(self, batch, train):
        seq = batch[self.iid_field + self.list_suffix]
        lengths = batch[self.length_field]
        B, L = seq.shape
        valid = jnp.arange(L)[None, :] < lengths[:, None]
        x = self.item_embedding(seq)
        carry = self.gru.initialize_carry(jax.random.key(0),
                                          (B, x.shape[-1]))
        _, mem = self.gru(carry, x)                     # (B, L, H)
        last = self._gather_last(mem, lengths)          # (B, H)
        dn = lambda t: self.drop(t, deterministic=not train)

        def attn(w_last, u_all, v, mask_fill):
            e = v(nn.tanh(dn(u_all(mem)) + dn(w_last(last))[:, None, :]))
            e = e.squeeze(-1)
            return jnp.where(mask_fill, e, -1e9)

        # gate
        a = nn.softmax(attn(self.w_re, self.u_re, self.v_re, valid), axis=1)
        gate = nn.softmax(
            self.w_cre(jnp.sum(a[:, :, None] * mem, axis=1)), axis=-1
        )                                               # (B, 2)
        # repeat decoder: probs over history positions → vocab
        ar = nn.softmax(attn(self.w_r, self.u_r, self.v_r, valid), axis=1)
        p_repeat = _scatter_probs(ar * valid, seq, self.n_items)
        # explore decoder
        ae = nn.softmax(attn(self.w_e, self.u_e, self.v_e, valid), axis=1)
        ctx = jnp.sum(ae[:, :, None] * mem, axis=1)
        logits_e = dn(self.explore_out(jnp.concatenate([ctx, last], axis=1)))
        in_hist = _scatter_probs(valid.astype(logits_e.dtype), seq,
                                 self.n_items) > 0
        logits_e = jnp.where(in_hist, -jnp.inf, logits_e)
        p_explore = nn.softmax(logits_e, axis=-1)
        probs = p_repeat * gate[:, :1] + p_explore * gate[:, 1:]
        return probs, gate, seq, valid

    def calculate_loss(self, batch: Batch, estate=None):
        probs, gate, seq, valid = self._probs(batch, train=True)
        pos = batch[self.iid_field]
        w = batch.get("weight")
        nll = -jnp.log(
            jnp.take_along_axis(probs, pos[:, None], axis=1).squeeze(1) + 1e-8
        )
        if self.joint_train:
            is_rep = jnp.any((seq == pos[:, None]) & valid, axis=1)
            nll = nll - 0.5 * jnp.where(
                is_rep, jnp.log(gate[:, 0] + 1e-8), jnp.log(gate[:, 1] + 1e-8)
            )
        if w is None:
            return jnp.mean(nll)
        return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1.0)

    def predict(self, batch: Batch, estate=None):
        probs, *_ = self._probs(batch, train=False)
        return probs[jnp.arange(probs.shape[0]), batch[self.iid_field]]

    def full_sort_scores(self, batch: Batch, estate=None):
        probs, *_ = self._probs(batch, train=False)
        return probs


class _PreloadKGMixin:
    """Loads pretrained entity vectors at model-build time."""

    @classmethod
    def derive_kwargs(cls, dataset, config) -> dict:
        ksize = int(config["kg_embedding_size"]
                    or config.get("embedding_size", 64))
        try:
            ent = dataset.get_preload_weight("ent_id")
            ent = np.asarray(ent[: dataset.item_num], np.float32)
            if ent.shape[0] < dataset.item_num:
                ent = np.pad(ent,
                             ((0, dataset.item_num - ent.shape[0]), (0, 0)))
            ksize = ent.shape[1]
        except (ValueError, KeyError, TypeError):
            rng = np.random.default_rng(int(config["seed"] or 2020))
            ent = (0.02 * rng.standard_normal(
                (dataset.item_num, ksize))).astype(np.float32)
        out = {"pretrained_ent": ent, "kg_embedding_size": ksize}
        if hasattr(dataset, "relation_num"):
            out["n_relations"] = int(dataset.relation_num)
        return out

    def _make_entity_param(self):
        """Call from setup(): entity table param seeded from the preload."""
        return self.param(
            "entity_embedding",
            lambda rng, shape: jnp.asarray(self.pretrained_ent)
            if self.pretrained_ent is not None
            else xavier_normal(rng, shape),
            (self.n_items, self.kg_embedding_size),
        )

    def _entity_table(self):
        table = self._entity_param
        if self.freeze_kg:
            table = jax.lax.stop_gradient(table)
        return table


@register_model
class GRU4RecKG(GRU4Rec, _PreloadKGMixin):
    """GRU4RecKG (`gru4reckg.py`): twin GRUs — one over item embeddings,
    one over (pretrained) entity embeddings — concatenated at readout."""

    kg_embedding_size: int = 64
    freeze_kg: bool = True
    pretrained_ent: Any = None

    def setup(self):
        super().setup()
        ScanGRU = nn.scan(
            nn.GRUCell, variable_broadcast="params",
            split_rngs={"params": False}, in_axes=1, out_axes=1,
        )
        self.entity_gru = ScanGRU(features=self.hidden_size,
                                  name="entity_gru")
        self.dense_fuse = nn.Dense(self.embedding_size,
                                   kernel_init=xavier_normal)
        self._entity_param = self._make_entity_param()

    def seq_output(self, batch, estate=None, train: bool = False):
        seq = batch[self.iid_field + self.list_suffix]
        lengths = batch[self.length_field]
        B = seq.shape[0]
        x = self.item_embedding(seq)
        x = self.emb_dropout(x, deterministic=not train)
        for gru in self.gru_layers:
            carry = gru.initialize_carry(jax.random.key(0), (B, x.shape[-1]))
            carry, x = gru(carry, x)
        ent = self._entity_table()[seq]
        ent = self.emb_dropout(ent, deterministic=not train)
        ec = self.entity_gru.initialize_carry(jax.random.key(0),
                                              (B, ent.shape[-1]))
        _, ent = self.entity_gru(ec, ent)
        out = self.dense_fuse(jnp.concatenate([x, ent], axis=-1))
        return self._gather_last(out, lengths)


@register_model
class KSR(SequentialRecommender):
    """KSR (`ksr.py`): GRU sequence encoder + key-value memory over KG
    relations. Memory keys are relation vectors; values are gated
    accumulations of per-step tail embeddings (head + relation). The scan
    masks updates past each row's length, so the final carry equals the
    reference's memory at the last valid step."""

    hidden_size: int = 64
    kg_embedding_size: int = 64
    n_relations: int = 4
    gamma: float = 10.0
    dropout_prob: float = 0.3
    freeze_kg: bool = True
    pretrained_ent: Any = None
    loss_type: str = "CE"

    derive_kwargs = _PreloadKGMixin.__dict__["derive_kwargs"]
    _make_entity_param = _PreloadKGMixin._make_entity_param
    _entity_table = _PreloadKGMixin._entity_table

    def setup(self):
        D, H, K = self.embedding_size, self.hidden_size, self.kg_embedding_size
        self.item_embedding = nn.Embed(self.n_items, D,
                                       embedding_init=xavier_normal)
        self.relation_embedding = self.param(
            "relation_embedding", xavier_normal, (self.n_relations, K)
        )
        ScanGRU = nn.scan(
            nn.GRUCell, variable_broadcast="params",
            split_rngs={"params": False}, in_axes=1, out_axes=1,
        )
        self.gru = ScanGRU(features=H, name="gru")
        self.dense = nn.Dense(K, kernel_init=xavier_normal)
        self.dense_u = nn.Dense(D, kernel_init=xavier_normal)
        self.dense_i = nn.Dense(D, kernel_init=xavier_normal)
        self.emb_dropout = nn.Dropout(self.dropout_prob)
        self._entity_param = self._make_entity_param()

    def _memory(self, seq, lengths):
        """Gated memory write scan (`ksr.py:120-147`)."""
        ent = self._entity_table()[seq]                        # (B, L, K)
        upd = ent[:, :, None, :] + self.relation_embedding[None, None]
        B, L = seq.shape
        valid = (jnp.arange(L)[None, :] < lengths[:, None])

        def step(mem, inp):
            u, v = inp                                          # (B,R,K),(B,)
            z = nn.sigmoid(jnp.sum(mem * u, axis=-1))[..., None]
            new = (1.0 - z) * mem + z * u
            return jnp.where(v[:, None, None], new, mem), None

        mem0 = jnp.zeros((B, self.n_relations, self.kg_embedding_size))
        mem, _ = jax.lax.scan(
            step, mem0, (jnp.moveaxis(upd, 1, 0), jnp.moveaxis(valid, 1, 0))
        )
        return mem

    def seq_output(self, batch, estate=None, train: bool = False):
        seq = batch[self.iid_field + self.list_suffix]
        lengths = batch[self.length_field]
        B = seq.shape[0]
        x = self.emb_dropout(self.item_embedding(seq),
                             deterministic=not train)
        carry = self.gru.initialize_carry(jax.random.key(0),
                                          (B, x.shape[-1]))
        _, h = self.gru(carry, x)
        h_last = self._gather_last(h, lengths)                 # (B, H)
        mem = self._memory(seq, lengths)                       # (B, R, K)
        q = self.dense(h_last)                                 # (B, K)
        att = nn.softmax(self.gamma * (q @ self.relation_embedding.T),
                         axis=-1)
        u_m = jnp.sum(mem * att[:, :, None], axis=1)           # (B, K)
        return self.dense_u(jnp.concatenate([h_last, u_m], axis=-1))

    def _item_comb(self, items):
        return self.dense_i(jnp.concatenate(
            [self.item_embedding(items), self._entity_table()[items]], axis=-1
        ))

    def _all_items_comb(self):
        return self.dense_i(jnp.concatenate(
            [self.item_embedding.embedding, self._entity_table()], axis=-1
        ))

    def calculate_loss(self, batch: Batch, estate=None):
        out = self.seq_output(batch, estate, train=True)
        pos = batch[self.iid_field]
        w = batch.get("weight")
        if self.loss_type == "BPR":
            neg = batch[self.neg_prefix + self.iid_field]
            return bpr_loss(
                jnp.sum(out * self._item_comb(pos), axis=1),
                jnp.sum(out * self._item_comb(neg), axis=1), w,
            )
        logits = out @ self._all_items_comb().T
        logp = _log_softmax(logits)
        nll = -jnp.take_along_axis(logp, pos[:, None], axis=1).squeeze(1)
        if w is None:
            return jnp.mean(nll)
        return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1.0)

    def predict(self, batch: Batch, estate=None):
        out = self.seq_output(batch, estate)
        return jnp.sum(
            out * self._item_comb(batch[self.iid_field]), axis=1
        )

    def full_sort_scores(self, batch: Batch, estate=None):
        out = self.seq_output(batch, estate)
        return out @ self._all_items_comb().T
