"""InductiveEvaluator — 7-way old/new slice evaluation over the `_ind` corpus.

Equivalent of `recbole/inductive/evaluator.py:15-180` +
`filtered_collector.py` + `collector_filter.py`, re-designed as ONE batched
device pass: instead of 7 collector copies each re-masking/re-top-k-ing the
score matrix, the jitted step computes top-k for three item variants
(full / old-items / new-items, each with its own tie-break permutation) and
the host assigns rows to slices with user old/new masks:

    slice        rows (users)   item variant
    overall      all            full (unperturbed, like the base Collector)
    old_users    uid < n_old    full (perturbed)
    new_users    uid ≥ n_old    full (perturbed)
    old_old      uid < n_old    old items only
    old_new      uid < n_old    new items only
    new_old      uid ≥ n_old    old items only
    new_new      uid ≥ n_old    new items only

Known reference deviation (documented, intentional): the reference's
`FastUserItemCollectorFilter.apply_score_filter` keys its item-column
masking on `return_old_users` (`collector_filter.py:171-175`) and shifts
new-item positive ids by −n_old_items (`collector_filter.py:255`), which
makes its old_new / new_old slices compare shifted positive positions
against unshifted score columns. We implement the evidently intended
semantics — mask the complementary item half, keep positive ids unshifted —
under which old_old/new_new agree with the reference exactly and
old_new/new_old measure what their names say.

Tie-breaking follows `use_perturbed_hits` (`filtered_collector.py:38-55`):
top-k runs on column-permuted scores so ties (e.g. many identical zero/mean
OOV scores) don't resolve by index order.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from oovrec_tpu.eval.collector import Collector, Evaluator
from oovrec_tpu.eval.runner import to_device_batch, _device_estate
from oovrec_tpu.utils.seeding import host_rng

SLICES = (
    "overall", "old_users", "new_users",
    "old_old", "old_new", "new_old", "new_new",
)


class InductiveEvaluator:
    def __init__(self, model, config, n_old_users: int, n_old_items: int,
                 estate=None, mapper=None):
        self.model = model
        self.config = config
        self.n_old_users = n_old_users
        self.n_old_items = n_old_items
        self.estate = estate or {}
        self.mapper = mapper
        self.maxk = max(config["topk"])
        self.use_perturbed = bool(config.get("use_perturbed_hits", True))
        self._step = None
        self._fused = False
        self._all_items = None
        self._rng = host_rng(int(config["seed"] or 2020), "perturbed_hits")
        self.dhe_hasher = None
        spec = getattr(model, "spec", None)
        if spec is not None and spec.embedder in ("dhe", "fdhe"):
            from oovrec_tpu.inductive.dhe import DHEHasher

            self.dhe_hasher = DHEHasher(
                spec.dhe_num_hashes,
                config.get("hash_key_dir", "./hash_keys"),
                keys_u64=(self.estate or {}).get("dhe_keys"),
                on_device=bool(config["dhe_on_device"]),
            )
            if self.dhe_hasher.on_device:
                from oovrec_tpu.ops.siphash_device import split_keys

                self.estate["dhe_key_parts"] = split_keys(
                    self.dhe_hasher.keys
                )

    # ------------------------------------------------------------ device

    def _make_step(self):
        """One jitted pass computing ALL four item variants.

        The PAD/history masking and the positive scatter run once; the
        variant tail (item mask + permuted top_k) is vmapped over a
        stacked (4, N) perm/mask axis (`variant_topk`), so XLA compiles a
        single batched top_k instead of four unrolled `mask_and_topk`
        bodies — the compile-time fix for the 7-slice evaluator."""
        model, maxk = self.model, self.maxk

        @jax.jit
        def step(variables, batch, all_item_e, estate, perms, imasks):
            scores = model.apply(
                variables, batch, all_item_e, estate,
                method=model.score_against,
            )
            from oovrec_tpu.eval.full_sort import variant_topk

            ti, pi, plen = variant_topk(
                scores,
                batch["hist_items"], batch["hist_len"],
                batch["pos_items"], batch["pos_len"],
                maxk, perms, imasks,
            )
            return {
                v: (ti[i], pi[i], plen[i])
                for i, v in enumerate(("overall", "full", "old", "new"))
            }

        return step

    def _use_fused(self, n_ext: int) -> bool:
        """Mirror of `EvalRunner._use_fused`: block-candidate Pallas
        scoring for two-tower models on large corpora."""
        flag = self.config.get("use_fused_topk", "auto")
        if flag is False:
            return False
        supported = hasattr(self.model, "user_tower")
        if flag == "auto":
            return (
                supported
                and n_ext >= 100_000
                and jax.devices()[0].platform != "cpu"
            )
        return bool(flag) and supported

    def _make_fused_step(self, n_ext: int, interpret: bool = False):
        """Block-candidate (Pallas) variant of `_make_step` for large
        corpora: no (B, N) score matrix ever materializes.

        The old/new item split partitions each item block, so per-class
        kernel passes give exact slice top-ks AND the full-corpus top-k
        for free: top-k(old ∪ new) ⊆ top-k(old) ∪ top-k(new), so the
        `full`/`overall` variants are a 2k-candidate merge. Four kernel
        invocations per batch (old/new × unpermuted/permuted) — one
        compiled kernel, shapes identical — replace the dense path's
        4 full-width top_ks. Perturbed tie-breaking is exact: the item
        axis is permuted BEFORE blocking (item rows gathered through
        `perm`, history/class bitmaps rebuilt in permuted coordinates),
        one shared permutation per batch across the three perturbed
        variants (the reference draws independent ones per collector —
        statistically equivalent, `filtered_collector.py:38-55`)."""
        from oovrec_tpu.ops.topk_score import (
            NEG_INF as K_NEG_INF,
            build_hist_bitmap,
            fused_topk_scores,
            pack_bitplane,
        )

        model, maxk = self.model, self.maxk
        n_old = self.n_old_items
        tn = 4096

        def merge(va, ia, vb, ib):
            v = jnp.concatenate([va, vb], axis=1)
            i = jnp.concatenate([ia, ib], axis=1)
            tv, p = jax.lax.top_k(v, maxk)
            return tv, jnp.take_along_axis(i, p, axis=1)

        def hits(topk_idx, topk_val, pos_items, pos_valid):
            live = topk_val > K_NEG_INF / 2  # excluded-column candidates
            hit = (topk_idx[:, :, None] == pos_items[:, None, :]) \
                & pos_valid[:, None, :]
            return (jnp.any(hit, axis=-1) & live).astype(jnp.int32)

        @jax.jit
        def step(variables, batch, all_item_e, estate, perm):
            user_e = model.apply(
                variables, batch, estate, method=model.user_tower
            )
            ids = jnp.arange(n_ext)
            old_keep = (ids >= 1) & (ids < n_old)
            new_keep = ids >= n_old
            xo = pack_bitplane(~old_keep, tn)[None, :]  # excl for old slice
            xn = pack_bitplane(~new_keep, tn)[None, :]
            bm = build_hist_bitmap(
                batch["hist_items"], batch["hist_len"], n_ext, tn=tn,
                exclude_col0=False,
            )
            fused = lambda it, b: fused_topk_scores(
                user_e, it, b, k=maxk, tn=tn, interpret=interpret
            )
            v_o0, i_o0 = fused(all_item_e, bm | xo)
            v_n0, i_n0 = fused(all_item_e, bm | xn)
            v_all0, i_all0 = merge(v_o0, i_o0, v_n0, i_n0)

            inv = jnp.zeros((n_ext,), jnp.int32).at[perm].set(
                jnp.arange(n_ext, dtype=jnp.int32)
            )
            item_p = all_item_e[perm]
            bm_p = build_hist_bitmap(
                inv[batch["hist_items"]], batch["hist_len"], n_ext, tn=tn,
                exclude_col0=False,
            )
            xo_p = pack_bitplane(~old_keep[perm], tn)[None, :]
            xn_p = pack_bitplane(~new_keep[perm], tn)[None, :]
            v_op, i_op = fused(item_p, bm_p | xo_p)
            v_np_, i_np_ = fused(item_p, bm_p | xn_p)
            i_op, i_np_ = perm[i_op], perm[i_np_]
            v_allp, i_allp = merge(v_op, i_op, v_np_, i_np_)

            pos, plen = batch["pos_items"], batch["pos_len"]
            P = pos.shape[1]
            pos_valid = jnp.arange(P)[None, :] < plen[:, None]
            pv_old = pos_valid & (pos >= 1) & (pos < n_old)
            pv_new = pos_valid & (pos >= n_old)
            plen_old = jnp.sum(pv_old, axis=1)
            plen_new = jnp.sum(pv_new, axis=1)
            return {
                "overall": (
                    i_all0, hits(i_all0, v_all0, pos, pos_valid), plen
                ),
                "full": (
                    i_allp, hits(i_allp, v_allp, pos, pos_valid), plen
                ),
                "old": (i_op, hits(i_op, v_op, pos, pv_old), plen_old),
                "new": (i_np_, hits(i_np_, v_np_, pos, pv_new), plen_new),
            }

        return step

    def _all_item_embeddings(self, variables, n_ext_items: int, estate):
        item_ids = np.arange(n_ext_items, dtype=np.int32)
        buckets = np.zeros(n_ext_items, np.int32)
        if self.mapper is not None:
            oov = item_ids >= self.n_old_items
            if oov.any():
                buckets[oov] = self.mapper.item_buckets(
                    item_ids[oov].astype(np.int64)
                ).astype(np.int32)
        item_dhe = None
        if self.dhe_hasher is not None:
            item_dhe = jnp.asarray(self.dhe_hasher.hash_ids(item_ids))
        fn = jax.jit(
            lambda v, ids, b, es, dhe: self.model.apply(
                v, ids, b, es, dhe, method=self.model.all_item_embeddings
            )
        )
        return fn(
            variables, jnp.asarray(item_ids), jnp.asarray(buckets), estate,
            item_dhe,
        )

    def _variant_perms_masks(self, n_ext: int):
        """Stacked (4, N) tie-break permutations + item masks for the
        (overall, full, old, new) variant axis. `overall` is unperturbed
        (identity — the base Collector's semantics); the three perturbed
        variants draw fresh permutations per batch
        (`filtered_collector.py:38-55`)."""
        identity = np.arange(n_ext)
        if self.use_perturbed:
            draw = self._rng.permutation
            perms = np.stack(
                [identity, draw(n_ext), draw(n_ext), draw(n_ext)]
            )
        else:
            perms = np.broadcast_to(identity, (4, n_ext)).copy()
        ar = np.arange(n_ext)
        ones = np.ones(n_ext, np.int32)
        old = (ar < self.n_old_items).astype(np.int32)
        imasks = np.stack([ones, ones, old, 1 - old])
        return jnp.asarray(perms), jnp.asarray(imasks)

    # ------------------------------------------------------------ driver

    def evaluate_model(self, variables, test_loader, show_progress=False):
        """`evaluate_model` (`inductive/evaluator.py:136-179`).

        Ranking (VALUE-metric) models dispatch to the pooled-score slice
        path; retrieval models run the batched full-sort top-k path.
        """
        from oovrec_tpu.data.dataloader import NegSampleEvalBatcher
        from oovrec_tpu.utils.enums import EvaluatorType

        if self.config["eval_type"] == EvaluatorType.VALUE:
            return self._evaluate_value(variables, test_loader)
        if isinstance(test_loader, NegSampleEvalBatcher):
            # the paper protocol: uni250 sampled-negative inductive eval
            # (test_neg_sample_args derived from the eval mode,
            #  `configurator.py:548-567`; `neg_sample_batch_eval` +
            #  FilteredCollector slices)
            return self._evaluate_sampled(variables, test_loader)
        n_ext = test_loader.item_num
        estate = _device_estate(self.estate)
        all_item_e = self._all_item_embeddings(variables, n_ext, estate)
        if self._step is None:
            self._fused = self._use_fused(n_ext)
            if self._fused:
                self._step = self._make_fused_step(
                    n_ext,
                    interpret=jax.devices()[0].platform == "cpu",
                )
            else:
                self._step = self._make_step()

        collectors = {s: Collector(self.config) for s in SLICES}

        for batch in test_loader:
            db = self._annotate_users(batch)
            ddb = to_device_batch(db)
            if self._fused:
                perm = (
                    self._rng.permutation(n_ext)
                    if self.use_perturbed
                    else np.arange(n_ext)
                )
                out = self._step(
                    variables, ddb, all_item_e, estate,
                    jnp.asarray(perm, jnp.int32),
                )
            else:
                perms, imasks = self._variant_perms_masks(n_ext)
                out = self._step(
                    variables, ddb, all_item_e, estate, perms, imasks
                )

            users = np.asarray(batch["user_id"])
            w = np.asarray(batch["weight"]) > 0
            old_u = (users < self.n_old_users) & w
            new_u = (users >= self.n_old_users) & w

            plan = {
                "overall": ("overall", w),
                "old_users": ("full", old_u),
                "new_users": ("full", new_u),
                "old_old": ("old", old_u),
                "old_new": ("new", old_u),
                "new_old": ("old", new_u),
                "new_new": ("new", new_u),
            }
            for slice_name, (variant, rows) in plan.items():
                _, pos_idx, pos_len = out[variant]
                pos_idx = np.asarray(pos_idx)
                pos_len = np.asarray(pos_len)
                keep = rows & (pos_len > 0)  # drop rows with no slice positives
                if keep.any():
                    collectors[slice_name].collect_topk(
                        pos_idx[keep], pos_len[keep]
                    )

        evaluator = Evaluator(self.config)
        results: "OrderedDict[str, OrderedDict]" = OrderedDict()
        for s in SLICES:
            struct = collectors[s].get_data_struct()
            if struct.has("rec.topk"):
                results[s] = evaluator.evaluate(struct)
            else:
                results[s] = OrderedDict()
        return results

    def _evaluate_sampled(self, variables, test_loader):
        """Retrieval slices over scattered uni-N score matrices."""
        from oovrec_tpu.eval.full_sort import (
            positives_matrix,
            scatter_scores,
            variant_matrix_topk,
        )
        from oovrec_tpu.eval.runner import to_device_batch

        model, maxk = self.model, self.maxk
        n_ext = test_loader.item_num
        n_users = test_loader.max_users
        estate = _device_estate(self.estate)

        @jax.jit
        def step(variables, batch, estate, perms, imasks):
            scores = model.apply(variables, batch, estate, method=model.predict)
            mat = scatter_scores(
                batch["row_user"], batch[model.iid_field], scores,
                batch["weight"], n_users, n_ext,
            )
            mat = mat.at[:, 0].set(-jnp.inf)
            pos = positives_matrix(
                batch["positive_u"], batch["positive_i"],
                batch["positive_weight"], n_users, n_ext,
            )
            ti, pi, plen = variant_matrix_topk(mat, pos, maxk, perms, imasks)
            return {
                v: (ti[i], pi[i], plen[i])
                for i, v in enumerate(("overall", "full", "old", "new"))
            }

        collectors = {s: Collector(self.config) for s in SLICES}
        for batch in test_loader:
            batch = self._annotate_rows(batch)
            db = to_device_batch(batch)
            perms, imasks = self._variant_perms_masks(n_ext)
            out = step(variables, db, estate, perms, imasks)

            slot_users = np.asarray(batch["slot_users"])
            w = np.arange(n_users) < int(batch["n_users"])
            old_u = (slot_users < self.n_old_users) & w
            new_u = (slot_users >= self.n_old_users) & w
            plan = {
                "overall": ("overall", w),
                "old_users": ("full", old_u),
                "new_users": ("full", new_u),
                "old_old": ("old", old_u),
                "old_new": ("new", old_u),
                "new_old": ("old", new_u),
                "new_new": ("new", new_u),
            }
            for slice_name, (variant, rows) in plan.items():
                _, pos_idx, pos_len = out[variant]
                pos_idx = np.asarray(pos_idx)
                pos_len = np.asarray(pos_len)
                keep = rows & (pos_len > 0)
                if keep.any():
                    collectors[slice_name].collect_topk(
                        pos_idx[keep], pos_len[keep]
                    )

        evaluator = Evaluator(self.config)
        results = OrderedDict()
        for s in SLICES:
            struct = collectors[s].get_data_struct()
            results[s] = (
                evaluator.evaluate(struct)
                if struct.has("rec.topk")
                else OrderedDict()
            )
        return results

    def _evaluate_value(self, variables, test_loader):
        """Ranking-model slices: per-row user/item old-new masks over
        pooled (score, label) pairs — the VALUE branch of the reference's
        FilteredCollector (`filtered_collector.py:70-79`,
        `collector_filter.py:179-203` `_compute_ranking_mask`)."""
        import jax as _jax

        from oovrec_tpu.eval.runner import to_device_batch

        estate = _device_estate(self.estate)
        model = self.model
        predict = _jax.jit(
            lambda v, b, es: model.apply(v, b, es, method=model.predict)
        )
        collectors = {s: Collector(self.config) for s in SLICES}
        uidf, iidf = model.uid_field, model.iid_field

        for batch in test_loader:
            batch = self._annotate_rows(batch)
            db = to_device_batch(batch)
            scores = np.asarray(predict(variables, db, estate))
            labels = np.asarray(batch[model.label_field])
            w = np.asarray(batch["weight"]) > 0
            users = np.asarray(batch[uidf])
            items = np.asarray(batch[iidf])
            old_u = users < self.n_old_users
            old_i = items < self.n_old_items
            plan = {
                "overall": w,
                "old_users": w & old_u,
                "new_users": w & ~old_u,
                "old_old": w & old_u & old_i,
                "old_new": w & old_u & ~old_i,
                "new_old": w & ~old_u & old_i,
                "new_new": w & ~old_u & ~old_i,
            }
            for s, rows in plan.items():
                if rows.any():
                    collectors[s].collect_scores(scores[rows], labels[rows])

        evaluator = Evaluator(self.config)
        results = OrderedDict()
        for s in SLICES:
            struct = collectors[s].get_data_struct()
            if struct.has("rec.score"):
                results[s] = evaluator.evaluate(struct)
            else:
                results[s] = OrderedDict()
        return results

    def _annotate_rows(self, batch: dict) -> dict:
        """Flags/buckets/DHE for the expanded rows' user AND item columns."""
        out = dict(batch)
        uidf, iidf = self.model.uid_field, self.model.iid_field
        for field, n_old, bucket_fn in (
            (uidf, self.n_old_users,
             self.mapper.user_buckets if self.mapper else None),
            (iidf, self.n_old_items,
             self.mapper.item_buckets if self.mapper else None),
        ):
            ids = np.asarray(out[field], np.int64)
            oov = (ids >= n_old).astype(np.int32)
            out[field + "_oov"] = oov
            if bucket_fn is not None and oov.any():
                out[field + "_bucket"] = np.where(oov > 0, bucket_fn(ids), 0)
            else:
                out[field + "_bucket"] = np.zeros_like(ids)
            if self.dhe_hasher is not None:
                self.dhe_hasher.annotate_batch(
                    out, field, 0, padded_when_flagged=False
                )
        return out

    def _annotate_users(self, batch: dict) -> dict:
        """Host-side OOV flags/buckets for the user block."""
        out = dict(batch)
        users = np.asarray(batch["user_id"], np.int64)
        oov = (users >= self.n_old_users).astype(np.int32)
        out["user_id_oov"] = oov
        if self.mapper is not None:
            buckets = np.zeros_like(users)
            if oov.any():
                buckets = np.where(
                    oov > 0, self.mapper.user_buckets(users), 0
                )
            out["user_id_bucket"] = buckets
        else:
            out["user_id_bucket"] = np.zeros_like(users)
        if self.dhe_hasher is not None:
            # eval hashes the RAW inductive id (no prime pad)
            self.dhe_hasher.annotate_batch(
                out, "user_id", 0, padded_when_flagged=False
            )
        return out
