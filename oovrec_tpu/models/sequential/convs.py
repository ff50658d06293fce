"""Convolutional sequential recommenders.

References: `sequential_recommender/caser.py`, `nextitnet.py`.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from oovrec_tpu.models.base import register_model
from oovrec_tpu.models.init import xavier_normal
from oovrec_tpu.models.sequential.base import SequentialRecommender


@register_model
class Caser(SequentialRecommender):
    # loss consumes only split columns (+ sampled neg) → device-epoch OK
    supports_device_epoch = True
    """Caser (`caser.py`): horizontal (per-height) + vertical convolutions
    over the embedded sequence image, fused with a user embedding."""

    n_h: int = 16
    n_v: int = 4
    dropout_prob: float = 0.4
    heights: Tuple[int, ...] = (2, 3, 4)

    def setup(self):
        self.user_embedding = nn.Embed(
            self.n_users, self.embedding_size, embedding_init=xavier_normal
        )
        self.item_embedding = nn.Embed(
            self.n_items, self.embedding_size, embedding_init=xavier_normal
        )
        self.h_convs = [
            nn.Conv(self.n_h, kernel_size=(h, self.embedding_size),
                    padding="VALID", name=f"hconv_{h}")
            for h in self.heights
        ]
        self.v_conv = nn.Conv(
            self.n_v, kernel_size=(self.max_seq_length, 1), padding="VALID"
        )
        self.fc = nn.Dense(self.embedding_size, kernel_init=xavier_normal)
        self.out = nn.Dense(self.embedding_size, kernel_init=xavier_normal)
        self.drop = nn.Dropout(self.dropout_prob)

    def seq_output(self, batch, estate=None, train: bool = False):
        seq = batch[self.iid_field + self.list_suffix]
        E = self.item_embedding(seq)[..., None]  # (B, L, D, 1)
        outs = []
        for conv in self.h_convs:
            c = nn.relu(conv(E))            # (B, L-h+1, 1, n_h)
            outs.append(jnp.max(c, axis=(1, 2)))  # (B, n_h)
        v = self.v_conv(E)                   # (B, 1, D, n_v)
        outs.append(v.reshape(v.shape[0], -1))
        z = jnp.concatenate(outs, axis=1)
        z = self.drop(z, deterministic=not train)
        z = nn.relu(self.fc(z))
        u = self.user_embedding(batch[self.uid_field])
        return self.out(jnp.concatenate([z, u], axis=1))


class DilatedBlock(nn.Module):
    channels: int
    dilation: int
    kernel: int = 3

    @nn.compact
    def __call__(self, x):
        # causal dilated conv: left-pad (kernel-1)*dilation
        pad = (self.kernel - 1) * self.dilation
        h = nn.LayerNorm()(x)
        h = nn.relu(h)
        h = nn.Conv(
            self.channels, kernel_size=(self.kernel,),
            kernel_dilation=(self.dilation,),
            padding=[(pad, 0)],
        )(h)
        h = nn.LayerNorm()(h)
        h = nn.relu(h)
        h = nn.Conv(
            self.channels, kernel_size=(self.kernel,),
            kernel_dilation=(2 * self.dilation,),
            padding=[((self.kernel - 1) * 2 * self.dilation, 0)],
        )(h)
        return x + h


@register_model
class NextItNet(SequentialRecommender):
    # loss consumes only split columns (+ sampled neg) → device-epoch OK
    supports_device_epoch = True
    """NextItNet (`nextitnet.py`): stacked causal dilated-conv residual
    blocks over the item sequence."""

    block_dilations: Tuple[int, ...] = (1, 4)
    kernel_size: int = 3

    def setup(self):
        self.item_embedding = nn.Embed(
            self.n_items, self.embedding_size, embedding_init=xavier_normal
        )
        self.blocks = [
            DilatedBlock(self.embedding_size, d, self.kernel_size,
                         name=f"block_{i}")
            for i, d in enumerate(self.block_dilations)
        ]
        self.final = nn.Dense(self.embedding_size, kernel_init=xavier_normal)

    def seq_output(self, batch, estate=None, train: bool = False):
        seq = batch[self.iid_field + self.list_suffix]
        x = self.item_embedding(seq)  # (B, L, D)
        for blk in self.blocks:
            x = blk(x)
        x = self.final(x)
        return self._gather_last(x, batch[self.length_field])
