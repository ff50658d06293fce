"""General recommenders, fifth batch.

References: `general_recommender/nceplrec.py`, `nncf.py`, `dgcf.py`,
`ncl.py`, `macridvae.py`.
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
from oovrec_tpu.utils.seeding import host_rng


@register_model
class NCEPLRec(GeneralRecommender):
    """NCE-PLRec (`nceplrec.py`): closed-form — NCE-reweighted SVD of the
    interaction matrix, then per-user linear regression; host-solved."""

    model_type = ModelType.TRADITIONAL
    input_type = InputType.POINTWISE
    rank: int = 64
    beta: float = 1.0
    reg_weight: float = 15000.0

    def setup(self):
        self.dummy = self.param("dummy", nn.initializers.zeros, (1,))

    def calculate_loss(self, batch: Batch, estate=None):
        return jnp.sum(self.dummy * 0.0)

    def predict(self, batch: Batch, estate=None):
        s = self.full_sort_scores(batch, estate)
        return s[jnp.arange(s.shape[0]), batch[self.iid_field]]

    def full_sort_scores(self, batch: Batch, estate=None):
        return estate["plrec_scores"][batch[self.uid_field]]

    @staticmethod
    def build_estate(train_split, rank: int = 64, beta: float = 1.0,
                     reg_weight: float = 15000.0) -> dict:
        uid = train_split.inter[train_split.uid_field]
        iid = train_split.inter[train_split.iid_field]
        X = np.zeros((train_split.user_num, train_split.item_num), np.float32)
        X[uid, iid] = 1.0
        pop = X.sum(axis=0)
        # NCE de-popularization weights
        d = np.maximum(pop, 1.0) ** beta
        D = X * np.log(np.maximum(X.sum() / d, 1.0))[None, :]
        rank = min(rank, min(D.shape) - 1)
        U, s, Vt = np.linalg.svd(D, full_matrices=False)
        Q = Vt[:rank].T * s[:rank][None, :]  # item factors (n_items, r)
        # per-user ridge regression: w_u = (QᵀQ + λI)⁻¹ Qᵀ x_u
        A = np.linalg.inv(Q.T @ Q + reg_weight * np.eye(rank))
        W = X @ Q @ A  # (n_users, r)
        scores = W @ Q.T
        return {"plrec_scores": scores.astype(np.float32)}


@register_model
class NNCF(GeneralRecommender):
    """NNCF (`nncf.py`): neighborhood-enhanced NCF — convolutions over
    fixed-size sampled neighbor sets of the user and the item."""

    input_type = InputType.POINTWISE
    neigh_num: int = 8
    conv_kernel_size: int = 2
    conv_channels: int = 16
    mlp_hidden_size: Tuple[int, ...] = (64, 32)
    dropout_prob: float = 0.2

    def setup(self):
        D = self.embedding_size
        self.user_embedding = nn.Embed(self.n_users, D,
                                       embedding_init=xavier_normal)
        self.item_embedding = nn.Embed(self.n_items, D,
                                       embedding_init=xavier_normal)
        self.u_conv = nn.Conv(self.conv_channels,
                              kernel_size=(self.conv_kernel_size,))
        self.i_conv = nn.Conv(self.conv_channels,
                              kernel_size=(self.conv_kernel_size,))
        self.mlp_layers = [
            nn.Dense(h, kernel_init=xavier_normal, name=f"mlp_{i}")
            for i, h in enumerate(self.mlp_hidden_size)
        ]
        self.out = nn.Dense(1, kernel_init=xavier_normal)
        self.drop = nn.Dropout(self.dropout_prob)

    def _score(self, users, items, estate, train=False):
        u = self.user_embedding(users)
        i = self.item_embedding(items)
        # user's item-neighbors and item's user-neighbors
        ni = self.item_embedding(estate["user_neighbors"][users])  # (B,K,D)
        nu = self.user_embedding(estate["item_neighbors"][items])
        ci = jnp.max(nn.relu(self.u_conv(ni)), axis=1)
        cu = jnp.max(nn.relu(self.i_conv(nu)), axis=1)
        x = jnp.concatenate([u * i, u, i, ci, cu], axis=-1)
        for l in self.mlp_layers:
            x = nn.relu(l(x))
            x = self.drop(x, deterministic=not train)
        return self.out(x).squeeze(-1)

    def calculate_loss(self, batch: Batch, estate=None):
        from oovrec_tpu.models.losses import bce_with_logits

        out = self._score(
            batch[self.uid_field], batch[self.iid_field], estate, train=True
        )
        return bce_with_logits(out, batch[self.label_field], batch.get("weight"))

    def predict(self, batch: Batch, estate=None):
        return nn.sigmoid(
            self._score(batch[self.uid_field], batch[self.iid_field], estate)
        )

    def full_sort_scores(self, batch: Batch, estate=None):
        users = batch[self.uid_field]

        def per_item(it):
            return self._score(
                users, jnp.broadcast_to(it, users.shape), estate
            )

        return jax.vmap(per_item, out_axes=1)(jnp.arange(self.n_items))

    @staticmethod
    def build_estate(train_split, neigh_num: int = 8, seed: int = 2020) -> dict:
        rng = host_rng(seed, "nncf_neighbors")
        per_user = train_split.used_ids_per_user()
        n_u, n_i = train_split.user_num, train_split.item_num
        K = neigh_num
        un = np.zeros((n_u, K), np.int64)
        for u, items in enumerate(per_user):
            if len(items):
                un[u] = np.asarray(items)[rng.integers(0, len(items), K)]
        item_users = [[] for _ in range(n_i)]
        uid = train_split.inter[train_split.uid_field]
        iid = train_split.inter[train_split.iid_field]
        for u, i in zip(uid, iid):
            item_users[i].append(u)
        inn = np.zeros((n_i, K), np.int64)
        for i, us in enumerate(item_users):
            if us:
                inn[i] = np.asarray(us)[rng.integers(0, len(us), K)]
        return {"user_neighbors": un, "item_neighbors": inn}


@register_model
class DGCF(GeneralRecommender):
    """DGCF (`dgcf.py`, simplified): factor-wise LightGCN propagation with
    learned per-edge factor weights (softmax over factors), BPR + reg."""

    input_type = InputType.PAIRWISE
    n_factors: int = 4
    n_layers: int = 1
    reg_weight: float = 1e-3

    def setup(self):
        D = self.embedding_size
        assert D % self.n_factors == 0
        self.user_embedding = nn.Embed(self.n_users, D,
                                       embedding_init=xavier_normal)
        self.item_embedding = nn.Embed(self.n_items, D,
                                       embedding_init=xavier_normal)

    def _embeddings(self, estate):
        src = estate["edge_src"]
        dst = estate["edge_dst"]
        w = estate["edge_weight"]
        n = self.n_users + self.n_items
        F = self.n_factors
        e = jnp.concatenate(
            [self.user_embedding.embedding, self.item_embedding.embedding],
            axis=0,
        )
        chunks = jnp.stack(jnp.split(e, F, axis=1), axis=0)  # (F, n, d/F)
        for _ in range(self.n_layers):
            # factor affinity per edge: cosine of src/dst factor chunks
            aff = jnp.einsum("fed,fed->fe",
                             chunks[:, src, :], chunks[:, dst, :])
            att = nn.softmax(aff, axis=0)                    # (F, E)
            new_chunks = []
            for f in range(F):
                msg = chunks[f][src] * (att[f] * w)[:, None]
                new_chunks.append(
                    jax.ops.segment_sum(msg, dst, num_segments=n)
                )
            chunks = jnp.stack(new_chunks, axis=0) + chunks
        out = jnp.concatenate([chunks[f] for f in range(F)], axis=1)
        return out[: self.n_users], out[self.n_users :]

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

    @staticmethod
    def build_estate(train_split) -> dict:
        from oovrec_tpu.models.general.lightgcn import LightGCN

        return LightGCN.build_estate(train_split)


@register_model
class NCL(GeneralRecommender):
    """NCL (`ncl.py`): LightGCN + structural neighbor contrast (even-layer
    outputs) + prototype contrast. The reference clusters with faiss
    k-means; here k-means runs in JAX on-device (`_kmeans`), removing the
    faiss dependency."""

    input_type = InputType.PAIRWISE
    n_layers: int = 2
    ssl_temp: float = 0.1
    ssl_reg: float = 1e-6
    proto_reg: float = 1e-6
    num_clusters: int = 16
    reg_weight: float = 1e-4

    def setup(self):
        D = self.embedding_size
        self.user_embedding = nn.Embed(self.n_users, D,
                                       embedding_init=xavier_normal)
        self.item_embedding = nn.Embed(self.n_items, D,
                                       embedding_init=xavier_normal)

    def _lightgcn_all(self, estate):
        src = estate["edge_src"]
        dst = estate["edge_dst"]
        w = estate["edge_weight"][:, None]
        n = self.n_users + self.n_items
        e = jnp.concatenate(
            [self.user_embedding.embedding, self.item_embedding.embedding],
            axis=0,
        )
        layers = [e]
        cur = e
        for _ in range(self.n_layers):
            cur = jax.ops.segment_sum(cur[src] * w, dst, num_segments=n)
            layers.append(cur)
        final = sum(layers) / (self.n_layers + 1)
        return final, layers

    @staticmethod
    def _kmeans(x, k, iters=4):
        """Tiny on-device k-means (faiss replacement)."""
        centers = x[:k]
        for _ in range(iters):
            d = (
                jnp.sum(x**2, axis=1)[:, None]
                - 2 * x @ centers.T
                + jnp.sum(centers**2, axis=1)[None, :]
            )
            assign = jnp.argmin(d, axis=1)
            counts = jax.ops.segment_sum(
                jnp.ones(len(x)), assign, num_segments=k
            )
            sums = jax.ops.segment_sum(x, assign, num_segments=k)
            centers = sums / jnp.maximum(counts[:, None], 1.0)
        return centers, assign

    def _info_nce(self, a, b, tau):
        a = a / jnp.sqrt(jnp.sum(a**2, axis=1, keepdims=True) + 1e-12)
        b = b / jnp.sqrt(jnp.sum(b**2, axis=1, keepdims=True) + 1e-12)
        pos = jnp.sum(a * b, axis=1) / tau
        all_s = (a @ b.T) / tau
        return jnp.mean(-pos + jax.nn.logsumexp(all_s, axis=1))

    def calculate_loss(self, batch: Batch, estate=None):
        final, layers = self._lightgcn_all(estate)
        ue, ie = final[: self.n_users], final[self.n_users :]
        users = batch[self.uid_field]
        pos = batch[self.iid_field]
        neg = batch[self.neg_prefix + self.iid_field]
        u, p, ng = ue[users], ie[pos], ie[neg]
        mf = bpr_loss(jnp.sum(u * p, axis=1), jnp.sum(u * ng, axis=1),
                      batch.get("weight"))

        # structural contrast: layer-0 vs layer-2 representations
        l0, l2 = layers[0], layers[min(2, self.n_layers)]
        ssl = self._info_nce(
            l2[users], l0[users], self.ssl_temp
        ) + self._info_nce(
            l2[self.n_users + pos], l0[self.n_users + pos], self.ssl_temp
        )

        # prototype contrast against on-device k-means centers
        centers_u, assign_u = self._kmeans(
            jax.lax.stop_gradient(layers[0][: self.n_users]),
            self.num_clusters,
        )
        proto = self._info_nce(
            layers[0][users], centers_u[assign_u[users]], self.ssl_temp
        )
        reg = emb_loss(
            self.user_embedding(users), self.item_embedding(pos),
            self.item_embedding(neg),
        )
        return (
            mf + self.ssl_reg * ssl + self.proto_reg * proto
            + self.reg_weight * reg
        )

    def predict(self, batch: Batch, estate=None):
        final, _ = self._lightgcn_all(estate)
        ue, ie = final[: self.n_users], final[self.n_users :]
        return jnp.sum(
            ue[batch[self.uid_field]] * ie[batch[self.iid_field]], axis=1
        )

    def full_sort_scores(self, batch: Batch, estate=None):
        final, _ = self._lightgcn_all(estate)
        ue, ie = final[: self.n_users], final[self.n_users :]
        return ue[batch[self.uid_field]] @ ie.T

    @staticmethod
    def build_estate(train_split) -> dict:
        from oovrec_tpu.models.general.lightgcn import LightGCN

        return LightGCN.build_estate(train_split)


@register_model
class MacridVAE(GeneralRecommender):
    """MacridVAE (`macridvae.py`): disentangled VAE — K concept prototypes
    route items; per-concept VAE encodings compose the user repr."""

    input_type = InputType.POINTWISE
    train_on_users = True
    kfac: int = 4
    latent_dim: int = 32
    encoder_hidden: Tuple[int, ...] = (64,)
    dropout_prob: float = 0.5
    tau: float = 0.1
    anneal_cap: float = 0.2

    def setup(self):
        self.item_embedding = nn.Embed(self.n_items, self.latent_dim,
                                       embedding_init=xavier_normal)
        self.concepts = self.param(
            "concepts", xavier_normal, (self.kfac, self.latent_dim)
        )
        self.enc_layers = [
            nn.Dense(h, kernel_init=xavier_normal, name=f"enc_{i}")
            for i, h in enumerate(self.encoder_hidden)
        ]
        self.mu = nn.Dense(self.latent_dim, kernel_init=xavier_normal)
        self.logvar = nn.Dense(self.latent_dim, kernel_init=xavier_normal)
        self.drop = nn.Dropout(self.dropout_prob)

    def _cates(self):
        items = self.item_embedding.embedding
        items_n = items / jnp.sqrt(
            jnp.sum(items**2, axis=1, keepdims=True) + 1e-12
        )
        cores = self.concepts / jnp.sqrt(
            jnp.sum(self.concepts**2, axis=1, keepdims=True) + 1e-12
        )
        return nn.softmax(items_n @ cores.T / self.tau, axis=1)  # (n_items, K)

    def forward(self, hist, train: bool = False):
        cates = self._cates()                              # (N, K)
        items = self.item_embedding.embedding
        z_list, mu_list, lv_list = [], [], []
        probs = None
        for k in range(self.kfac):
            xk = hist * cates[:, k][None, :]
            h = xk / jnp.sqrt(jnp.sum(xk**2, axis=1, keepdims=True) + 1e-12)
            h = self.drop(h, deterministic=not train)
            for l in self.enc_layers:
                h = nn.tanh(l(h))
            mu = self.mu(h)
            mu = mu / jnp.sqrt(jnp.sum(mu**2, axis=1, keepdims=True) + 1e-12)
            lv = self.logvar(h)
            if train:
                eps = jax.random.normal(self.make_rng("dropout"), mu.shape)
                z = mu + eps * jnp.exp(0.5 * lv)
            else:
                z = mu
            items_n = items / jnp.sqrt(
                jnp.sum(items**2, axis=1, keepdims=True) + 1e-12
            )
            logits_k = (z @ items_n.T) / self.tau
            pk = jnp.exp(jax.nn.log_softmax(logits_k, axis=1)) * cates[:, k][None, :]
            probs = pk if probs is None else probs + pk
            mu_list.append(mu)
            lv_list.append(lv)
        return jnp.log(jnp.maximum(probs, 1e-12)), mu_list, lv_list

    def calculate_loss(self, batch: Batch, estate=None):
        hist = estate["user_hist_matrix"][batch[self.uid_field]]
        w = batch.get("weight")
        logp, mu_list, lv_list = self.forward(hist, train=True)
        ce = -jnp.sum(logp * hist, axis=1)
        kl = sum(
            -0.5 * jnp.sum(1 + lv - mu**2 - jnp.exp(lv), axis=1)
            for mu, lv in zip(mu_list, lv_list)
        )
        per_user = ce + self.anneal_cap * kl
        if w is None:
            return jnp.mean(per_user)
        return jnp.sum(per_user * w) / jnp.maximum(jnp.sum(w), 1.0)

    def predict(self, batch: Batch, estate=None):
        s = self.full_sort_scores(batch, estate)
        return s[jnp.arange(s.shape[0]), batch[self.iid_field]]

    def full_sort_scores(self, batch: Batch, estate=None):
        hist = estate["user_hist_matrix"][batch[self.uid_field]]
        logp, _, _ = self.forward(hist, train=False)
        return logp

    build_estate = staticmethod(MultiVAE.build_estate)
