"""Evaluation runner: loader → jitted device step → collector → metrics.

Equivalent of `Trainer.evaluate` (`recbole/trainer/trainer.py:566-642`) for
both eval protocols:
  * full-sort ranking (FullSortEvalBatcher batches)
  * sampled-negative ranking / value eval (NegSampleEvalBatcher batches,
    the paper's `uni250` validation protocol)
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from oovrec_tpu.data.dataloader import FullSortEvalBatcher, NegSampleEvalBatcher
from oovrec_tpu.eval.collector import Collector, Evaluator
from oovrec_tpu.eval.full_sort import mask_and_topk, positives_matrix, scatter_scores
from oovrec_tpu.utils.enums import EvaluatorType


def to_device_batch(batch: Dict[str, np.ndarray]) -> Dict[str, jnp.ndarray]:
    """Cast host batches to device dtypes (int64→int32, float64→float32).

    All IDs/buckets are < 2^31 by design (hashing happens on the host in
    int64); the device never needs 64-bit integers.
    """
    out = {}
    for k, v in batch.items():
        v = np.asarray(v)
        if v.dtype == np.int64:
            v = v.astype(np.int32)
        elif v.dtype == np.float64:
            v = v.astype(np.float32)
        out[k] = v
    return out


class EvalRunner:
    def __init__(self, model, config, estate=None, mesh=None):
        self.model = model
        self.config = config
        self.estate = estate
        self.maxk = max(config["topk"])
        self.eval_type = config["eval_type"]
        self._full_steps = {}
        self._neg_steps = {}
        self._predict = None
        self._masked_scores = None
        # scanned-eval sweep programs, built once per runner so repeated
        # eval passes (one per epoch) reuse the jit cache instead of
        # recompiling a fresh local closure every call
        self._fullsort_sweep = None
        self._neg_sweeps = {}
        self.train_split = None  # set by the trainer for popularity metrics
        # production multi-chip eval: batches 'data'-sharded over the mesh
        # (user axis for full-sort), per-process metric map-reduce — the
        # TPU-native analog of the reference's sharded eval + all-gather
        # (`trainer.py:644-666`).
        if mesh is None:
            from oovrec_tpu.parallel.mesh import maybe_mesh_from_config

            mesh = maybe_mesh_from_config(config)
        self.mesh = mesh

    def _to_device(self, batch):
        """Host batch → device batch; 'data'-sharded global arrays when a
        mesh is active (host rows padded first so collector weights match
        device shapes)."""
        if self.mesh is None:
            return batch, to_device_batch(batch)
        from oovrec_tpu.parallel.mesh import pad_batch, place_batch

        batch = pad_batch(batch, self.mesh.shape["data"])
        return batch, place_batch(self.mesh, to_device_batch(batch))

    # ---------------------------------------------------------- full sort

    def _make_full_step(self):
        model, maxk = self.model, self.maxk

        @jax.jit
        def step(variables, batch, estate):
            scores = model.apply(
                variables, batch, estate, method=model.full_sort_scores
            )
            return mask_and_topk(
                scores,
                batch["hist_items"], batch["hist_len"],
                batch["pos_items"], batch["pos_len"],
                maxk,
            )

        return step

    def _make_fused_full_step(self, n_items: int):
        """Pallas fast path for two-tower models: fused block scoring +
        bitmap masking + top-k (ops/topk_score.py), identical results to
        the dense path up to tie order."""
        from oovrec_tpu.ops.topk_score import (
            build_hist_bitmap,
            fused_topk_scores,
        )

        model, maxk = self.model, self.maxk
        tn = 4096

        @jax.jit
        def step(variables, batch, estate):
            user_e = model.apply(
                variables, batch, estate, method=model.user_tower
            )
            item_e = model.apply(variables, method=model.item_tower)
            bm = build_hist_bitmap(
                batch["hist_items"], batch["hist_len"], n_items, tn=tn
            )
            _, topk_idx = fused_topk_scores(
                user_e, item_e, bm, k=maxk, tn=tn
            )
            # hits: topk index ∈ this user's positives
            pos = batch["pos_items"]
            P = pos.shape[1]
            pos_valid = jnp.arange(P)[None, :] < batch["pos_len"][:, None]
            hit = (topk_idx[:, :, None] == pos[:, None, :]) & pos_valid[:, None, :]
            pos_idx = jnp.any(hit, axis=-1).astype(jnp.int32)
            return topk_idx, pos_idx, batch["pos_len"]

        return step

    def _use_fused(self, n_items: int) -> bool:
        flag = self.config.get("use_fused_topk", "auto")
        if flag is False:
            return False
        supported = hasattr(self.model, "user_tower")
        if flag == "auto":
            import jax as _j

            # the fused kernel's win grows with corpus size (HBM-bound
            # scoring beats materializing (U, N) once N is large; at small
            # N the per-block top-k rounds dominate and XLA matches it)
            return (
                supported
                and n_items >= 100_000
                and _j.devices()[0].platform != "cpu"
            )
        return bool(flag) and supported

    def _use_scanned_eval(self, eval_loader, collector) -> bool:
        """Whole-eval-in-one-program fast path: the per-batch dispatch
        (host slice → H2D → step → D2H) pays a full tunnel/dispatch RTT
        per ~⌊eval_batch/n_items⌋ users; scanning all user batches inside
        one jitted program pays it once. Gated `device_eval: auto|bool`
        (auto: ≥1024 users), plain top-k collection only."""
        flag = self.config.get("device_eval", "auto")
        if flag is False or self.mesh is not None:
            return False
        if self.eval_type != EvaluatorType.RANKING:
            return False
        from oovrec_tpu.data.sequential import SeqFullSortEvalBatcher

        if type(eval_loader) in (FullSortEvalBatcher, SeqFullSortEvalBatcher):
            if not hasattr(self.model, "full_sort_scores"):
                return False
            n_rows = (
                len(eval_loader.uid_list)
                if type(eval_loader) is FullSortEvalBatcher
                else len(eval_loader.split)
            )
        elif type(eval_loader) is NegSampleEvalBatcher:
            n_rows = len(eval_loader.uid_list)
        else:
            return False
        extra_needs = {"rec.items", "rec.meanrank", "rec.score",
                       "data.label"}
        if collector.need & extra_needs:
            return False
        # device-memory safety is handled INSIDE the scanned passes: they
        # chunk the stacked batches to `device_eval_max_elements` elements
        # per program call, so giant eval sets stay on the device path
        # (the old all-or-nothing bound silently degraded a 10M-corpus
        # uni250 test eval to ~2300 per-batch tunnel dispatches ≈ 1 h)
        if flag == "auto":
            return n_rows >= 1024
        return bool(flag)

    def _evaluate_scanned(self, variables, eval_loader, collector, estate):
        """Stack every eval batch and lax.scan the scoring step over them
        in one compiled program; one D2H of (n_users, k) hits."""
        if type(eval_loader) is NegSampleEvalBatcher:
            return self._evaluate_scanned_neg(
                variables, eval_loader, collector, estate
            )
        restore_upb = None
        if (type(eval_loader) is FullSortEvalBatcher
                and eval_loader.process_count == 1):
            # `eval_batch_size` (paper protocol: 1e5) is the reference's
            # GPU-memory knob — at large corpora it degrades to a few
            # users per block and the scan spends its time on per-step
            # top-k overhead. Block width does not affect metrics (users
            # are independent), so the device pass re-blocks to a
            # chip-sized score slab (~`device_eval_score_elements`
            # elements per step, default 2^24 ≈ 64 MB fp32). The override
            # is restored afterwards — a later host per-batch pass over
            # the same loader must keep the configured eval_batch_size
            # blocking (device-sized blocks blow up host memory there).
            block = int(self.config.get("device_eval_score_elements")
                        or (1 << 24))
            want = max(1, block // max(1, eval_loader.item_num))
            if want > eval_loader.users_per_batch:
                restore_upb = eval_loader.users_per_batch
                eval_loader.users_per_batch = min(
                    want, max(1, len(eval_loader.uid_list))
                )
        try:
            return self._evaluate_scanned_fullsort(
                variables, eval_loader, collector, estate
            )
        finally:
            if restore_upb is not None:
                eval_loader.users_per_batch = restore_upb

    def _evaluate_scanned_fullsort(self, variables, eval_loader,
                                   collector, estate):
        batches = (to_device_batch(b) for b in eval_loader)
        if self._fullsort_sweep is None:
            model, maxk = self.model, self.maxk

            @jax.jit
            def sweep(variables, sb, estate):
                def body(_, batch):
                    scores = model.apply(
                        variables, batch, estate,
                        method=model.full_sort_scores
                    )
                    _, pos_idx, pos_len = mask_and_topk(
                        scores,
                        batch["hist_items"], batch["hist_len"],
                        batch["pos_items"], batch["pos_len"],
                        maxk,
                    )
                    return None, (pos_idx, pos_len)

                _, (pos_idx, pos_len) = jax.lax.scan(body, None, sb)
                return pos_idx, pos_len

            self._fullsort_sweep = sweep

        n = 0.0
        for stacked, chunk in self._stack_chunks(batches):
            pos_idx, pos_len = self._fullsort_sweep(
                variables, stacked, estate)
            steps, U = pos_idx.shape[:2]
            weight = np.concatenate(
                [np.asarray(b["weight"]) for b in chunk])
            collector.collect_topk(
                np.asarray(pos_idx).reshape(steps * U, -1),
                np.asarray(pos_len).reshape(steps * U),
                weight,
            )
            n += float(weight.sum())
        return n

    def _stack_chunks(self, batches):
        """Yield (stacked, chunk_batches): batches stacked on a leading
        scan axis in chunks bounded by `device_eval_max_elements` device
        elements per program call. Accepts an ITERATOR and buffers only
        one chunk of host batches at a time (a 10M-corpus uni250 pass has
        ~200M expanded rows — materializing every batch OOMs the host).
        Equal-size chunks reuse one compiled sweep; at most one remainder
        shape compiles extra."""
        it = iter(batches)
        first = next(it, None)
        if first is None:
            return
        per_batch = sum(int(np.asarray(v).size) for v in first.values())
        max_el = float(self.config.get("device_eval_max_elements") or 5e8)
        chunk = max(1, int(max_el // max(1, per_batch)))

        def _stack(cb):
            return {
                k: jnp.asarray(np.stack([b[k] for b in cb]))
                for k in cb[0]
            }

        buf = [first]
        for b in it:
            if len(buf) == chunk:
                yield _stack(buf), buf
                buf = []
            buf.append(b)
        if buf:
            yield _stack(buf), buf

    def _evaluate_scanned_neg(self, variables, eval_loader, collector,
                              estate):
        """Scanned uni-N sampled-negative eval (the paper's uni250
        validation protocol): every batch's scatter + top-k runs inside
        one program (`_make_neg_step` body), replacing one dispatch RTT
        per ~step users. Host negative sampling still happens in the
        loader (fresh draws per eval pass)."""
        n_items = eval_loader.item_num
        n_users = eval_loader.max_users
        key = (n_items, n_users)
        if key not in self._neg_sweeps:
            model, maxk = self.model, self.maxk

            @jax.jit
            def sweep(variables, sb, estate):
                def body(_, batch):
                    scores = model.apply(
                        variables, batch, estate, method=model.predict
                    )
                    mat = scatter_scores(
                        batch["row_user"], batch[model.iid_field], scores,
                        batch["weight"], n_users, n_items,
                    )
                    mat = mat.at[:, 0].set(-jnp.inf)
                    pos = positives_matrix(
                        batch["positive_u"], batch["positive_i"],
                        batch["positive_weight"], n_users, n_items,
                    )
                    from oovrec_tpu.eval.full_sort import matrix_topk

                    _, pos_idx, pos_len = matrix_topk(mat, pos, maxk)
                    user_w = (
                        jnp.arange(n_users) < batch["n_users"]
                    ).astype(jnp.float32)
                    return None, (pos_idx, pos_len, user_w)

                _, out = jax.lax.scan(body, None, sb)
                return out

            self._neg_sweeps[key] = sweep

        batches = (to_device_batch(b) for b in eval_loader)
        n = 0.0
        for stacked, _chunk in self._stack_chunks(batches):
            pos_idx, pos_len, user_w = self._neg_sweeps[key](
                variables, stacked, estate)
            steps, U = pos_idx.shape[:2]
            collector.collect_topk(
                np.asarray(pos_idx).reshape(steps * U, -1),
                np.asarray(pos_len).reshape(steps * U),
                np.asarray(user_w).reshape(steps * U),
            )
            n += float(np.asarray(user_w).sum())
        return n

    # ------------------------------------------------------- neg-sample

    def _make_neg_step(self, n_items: int, n_users: int):
        model, maxk = self.model, self.maxk

        @jax.jit
        def step(variables, batch, estate):
            scores = model.apply(variables, batch, estate, method=model.predict)
            mat = scatter_scores(
                batch["row_user"], batch[model.iid_field], scores,
                batch["weight"], n_users, n_items,
            )
            mat = mat.at[:, 0].set(-jnp.inf)
            pos = positives_matrix(
                batch["positive_u"], batch["positive_i"],
                batch["positive_weight"], n_users, n_items,
            )
            from oovrec_tpu.eval.full_sort import matrix_topk

            return matrix_topk(mat, pos, maxk)

        return step

    def _make_predict(self):
        model = self.model

        @jax.jit
        def step(variables, batch, estate):
            return model.apply(variables, batch, estate, method=model.predict)

        return step

    def _make_masked_scores(self):
        from oovrec_tpu.eval.full_sort import apply_masks

        model = self.model

        @jax.jit
        def step(variables, batch, estate):
            scores = model.apply(
                variables, batch, estate, method=model.full_sort_scores
            )
            return apply_masks(
                scores, batch["hist_items"], batch["hist_len"]
            )

        return step

    @staticmethod
    def _host(x):
        """Device output → host numpy; on a multi-process mesh only this
        process's rows come back (the collector is per-process, reduced at
        the end by map_reduce_metrics)."""
        from oovrec_tpu.parallel.mesh import local_rows

        return local_rows(x)

    # ------------------------------------------------------------ driver

    def evaluate(
        self,
        variables,
        eval_loader,
        show_progress: bool = False,
        sample_eval_ratio: Optional[float] = None,
        rng: Optional[np.random.Generator] = None,
    ):
        """Run one evaluation pass; returns OrderedDict of metrics.

        `sample_eval_ratio` reproduces the InductiveTrainer's random
        batch-skipping sampled validation (`trainer.py:1916-1921`).
        """
        collector = Collector(self.config)
        n_local = 0.0
        if self.train_split is not None and (
            "data.count_items" in collector.need
            or "data.num_items" in collector.need
        ):
            collector.data_collect(self.train_split)
        estate = _device_estate(self.estate)

        if isinstance(eval_loader, NegSampleEvalBatcher):
            # expanded-row feature joins are only consumed by CONTEXT
            # models' predict(); for id-only models they multiply uniN
            # batch memory (uid/iid/label/row_user vs every feature
            # column on ~200M rows at the 10M-corpus scale)
            from oovrec_tpu.utils.enums import ModelType

            eval_loader.join_features = (
                getattr(self.model, "model_type", None) == ModelType.CONTEXT
            )

        from oovrec_tpu.data.sequential import SeqFullSortEvalBatcher

        if sample_eval_ratio is None and self._use_scanned_eval(
            eval_loader, collector
        ):
            n_local = self._evaluate_scanned(
                variables, eval_loader, collector, estate
            )
            evaluator = Evaluator(self.config)
            return evaluator.evaluate(collector.get_data_struct())
        if isinstance(eval_loader, (FullSortEvalBatcher, SeqFullSortEvalBatcher)):
            key = eval_loader.item_num
            if key not in self._full_steps:
                if self._use_fused(eval_loader.item_num):
                    self._full_steps[key] = self._make_fused_full_step(
                        eval_loader.item_num
                    )
                else:
                    self._full_steps[key] = self._make_full_step()
            full_step = self._full_steps[key]
            for i, batch in enumerate(eval_loader):
                if (
                    sample_eval_ratio is not None
                    and i >= 1
                    and rng is not None
                    and rng.random() > sample_eval_ratio
                ):
                    continue
                batch, db = self._to_device(batch)
                topk_idx, pos_idx, pos_len = full_step(
                    variables, db, estate
                )
                n_local += float(np.sum(batch["weight"]))
                collector.collect_topk(
                    self._host(pos_idx), self._host(pos_len), batch["weight"]
                )
                if "rec.items" in collector.need:
                    collector.collect_items(
                        self._host(topk_idx), batch["weight"]
                    )
                if "rec.meanrank" in collector.need:
                    from oovrec_tpu.eval.collector import meanrank_from_scores

                    if self._masked_scores is None:
                        self._masked_scores = self._make_masked_scores()
                    sc = self._host(
                        self._masked_scores(variables, db, estate)
                    )
                    prs, ul, pl = meanrank_from_scores(
                        sc, np.asarray(batch["pos_items"]),
                        np.asarray(batch["pos_len"]),
                    )
                    collector.collect_meanrank(prs, ul, pl, batch["weight"])
        elif isinstance(eval_loader, NegSampleEvalBatcher):
            if self.eval_type == EvaluatorType.RANKING:
                key = (eval_loader.item_num, eval_loader.max_users)
                if key not in self._neg_steps:
                    self._neg_steps[key] = self._make_neg_step(
                        eval_loader.item_num, eval_loader.max_users
                    )
                neg_step = self._neg_steps[key]
                for i, batch in enumerate(eval_loader):
                    if (
                        sample_eval_ratio is not None
                        and i >= 1
                        and rng is not None
                        and rng.random() > sample_eval_ratio
                    ):
                        continue
                    batch, db = self._to_device(batch)
                    topk_idx, pos_idx, pos_len = neg_step(
                        variables, db, estate
                    )
                    # multi-process: slots span the pod
                    # ([offset, offset+local_users) is this process's
                    # range — dataloader.py slot_offset); each process
                    # collects only its own users, map-reduced at the end
                    off = getattr(eval_loader, "slot_offset", 0)
                    idx = np.arange(eval_loader.max_users)
                    user_w = (
                        (idx >= off) & (idx < off + int(batch["n_users"]))
                    ).astype(np.float32)
                    n_local += float(np.sum(user_w))
                    from oovrec_tpu.parallel.mesh import host_copy

                    collector.collect_topk(
                        host_copy(pos_idx), host_copy(pos_len), user_w
                    )
            else:  # VALUE metrics: pooled scores + labels
                if self._predict is None:
                    self._predict = self._make_predict()
                for i, batch in enumerate(eval_loader):
                    if (
                        sample_eval_ratio is not None
                        and i >= 1
                        and rng is not None
                        and rng.random() > sample_eval_ratio
                    ):
                        continue
                    batch, db = self._to_device(batch)
                    scores = self._predict(variables, db, estate)
                    n_local += float(np.sum(batch["weight"]))
                    collector.collect_scores(
                        self._host(scores),
                        batch[self.model.label_field],
                        batch["weight"],
                    )
        else:
            from oovrec_tpu.data.dataloader import PlainEvalBatcher

            if isinstance(eval_loader, PlainEvalBatcher):
                if self._predict is None:
                    self._predict = self._make_predict()
                for batch in eval_loader:
                    batch, db = self._to_device(batch)
                    scores = self._predict(variables, db, estate)
                    n_local += float(np.sum(batch["weight"]))
                    collector.collect_scores(
                        self._host(scores),
                        batch[self.model.label_field],
                        batch["weight"],
                    )
            else:
                raise NotImplementedError(type(eval_loader))

        import jax as _jax

        multiproc = self.mesh is not None and _jax.process_count() > 1
        # pre-reduce locals stay unrounded (12 dp); the merged result is
        # rounded once to the configured precision
        evaluator = Evaluator(
            self.config, decimal_place=12 if multiproc else None
        )
        result = evaluator.evaluate(collector.get_data_struct())
        if self.mesh is not None:
            from oovrec_tpu.parallel.distributed import map_reduce_metrics

            result = map_reduce_metrics(result, int(n_local))
            if multiproc:
                dp = int(self.config["metric_decimal_place"])
                result = type(result)(
                    (k, round(float(v), dp)) for k, v in result.items()
                )
        return result


def _device_estate(estate):
    if not estate:
        return {}
    out = {}
    for k, v in estate.items():
        if isinstance(v, np.ndarray) and v.dtype == np.uint64:
            continue  # host-only state (e.g. DHE SipHash keys)
        out[k] = jnp.asarray(v) if isinstance(v, np.ndarray) else v
    return out
