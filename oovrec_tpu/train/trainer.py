"""Trainer: jitted train step + epoch loop + the inductive OOV regime.

Equivalent of `recbole/trainer/trainer.py` `Trainer` (:103-685) and
`InductiveTrainer` (:1496-1943), re-designed functionally:

  * one jitted, donated train step `(params, opt_state, batch) → (loss, ...)`
    compiled once thanks to static batch shapes;
  * a second step variant with OOV-frozen updates: non-OOV parameter
    updates AND their optimizer-state advance are masked out — the exact
    semantics of torch's `requires_grad=False` + untouched `None`-grad
    optimizer slots (`bpr.py:86-92`, `trainer.py:1559-1568`);
  * the OOV-simulation sub-epoch: Bernoulli batch keep (`trainer.py:1796`),
    prime-pad/feature-mask transform on the host (`transform.OOVSimulator`),
    optional optimizer snapshot/rollback (`oov_freeze_skip_optim`);
  * mixed-mode augmentation (`_augment_with_oov`, `trainer.py:1654-1667`)
    as a fixed-capacity batch extension (appended rows beyond the sampled
    count carry weight 0 — static shapes preserved);
  * early stopping + best-checkpoint saving on validation improvement.
"""

from __future__ import annotations

import os
import pickle
import time
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import serialization

from oovrec_tpu.eval.collector import calculate_valid_score
from oovrec_tpu.eval.runner import EvalRunner, to_device_batch, _device_estate
from oovrec_tpu.inductive.transform import OOVSimulator
from oovrec_tpu.train.early_stopping import early_stopping
from oovrec_tpu.train.optimizers import build_optimizer, clip_by_norm
from oovrec_tpu.utils.logging import init_logger
from oovrec_tpu.utils.seeding import host_rng


def _is_oov_param_path(path) -> bool:
    """The freeze filter: trainable-during-OOV iff the name carries
    'oov_bucket' or 'oov_mlp' (reference name filter `dcnv2.py:110-118`,
    table freezing `bpr.py:86-92`)."""
    s = "/".join(str(getattr(p, "key", p)) for p in path)
    return "oov_bucket" in s or "oov_mlp" in s


class Trainer:
    def __init__(self, config, model, variables, estate=None):
        self.config = config
        self.model = model
        self.variables = variables
        self.estate = estate or {}
        self.logger = init_logger(config)

        self.learner = config["learner"]
        self.learning_rate = float(config["learning_rate"])
        self.weight_decay = float(config["weight_decay"] or 0.0)
        self.epochs = int(config["epochs"])
        self.eval_step = min(int(config["eval_step"]), self.epochs)
        self.stopping_step = int(config["stopping_step"])
        self.valid_metric_bigger = bool(config["valid_metric_bigger"])
        self.clip = clip_by_norm(config["clip_grad_norm"])

        self.tx = self._wrap_clip(
            build_optimizer(
                self.learner, self.learning_rate, self.weight_decay,
                mu_dtype=self.config["optimizer_mu_dtype"],
            )
        )
        if self.config["optimizer_skip_zero_grads"]:
            # torch-faithful adam (per-param step counts, skip-on-zero):
            # replaces the adam chain; wd/clip wrap it like before
            from oovrec_tpu.train.optimizers import scale_by_torch_adam

            txs = []
            if self.weight_decay:
                txs.append(optax.add_decayed_weights(self.weight_decay))
            txs.append(scale_by_torch_adam(
                mu_dtype=self.config["optimizer_mu_dtype"] and
                jnp.dtype(self.config["optimizer_mu_dtype"])
            ))
            txs.append(optax.scale(-self.learning_rate))
            self.tx = self._wrap_clip(optax.chain(*txs))

        # production multi-chip path: when a mesh is configured, params /
        # optimizer state / batches live on the ('data','model') mesh and
        # every jitted step below compiles to SPMD with XLA collectives —
        # the TPU-native replacement of the reference's DDP wrap
        # (`trainer.py:68-72`) reachable from the CLI (`--mesh=...`).
        from oovrec_tpu.parallel.mesh import maybe_mesh_from_config

        self.mesh = maybe_mesh_from_config(config)
        self.opt_state = self.tx.init(self.variables["params"])
        if self.mesh is not None:
            self._place_state_on_mesh()

        self.start_epoch = 0
        self.cur_step = 0
        self.best_valid_score = None
        self.best_valid_result = None
        self.train_loss_dict: Dict[int, float] = {}
        self.oov_loss_dict: Dict[int, float] = {}

        ckpt_dir = config.get("checkpoint_dir", "saved")
        os.makedirs(ckpt_dir, exist_ok=True)
        self.saved_model_file = os.path.join(
            ckpt_dir, f"{config['model']}-{config['dataset']}.ckpt"
        )

        self.eval_runner = EvalRunner(
            model, config, estate=self.estate, mesh=self.mesh
        )
        self._train_step = None
        self._train_step_frozen = None

        # observability: JSONL metrics stream (tensorboard-scalar analog,
        # `trainer.py:371-407`) + optional jax profiler trace
        self.metrics_log_path = config.get("metrics_log_path")
        self.profile_dir = config.get("profile_dir")
        self._profiling = False
        from oovrec_tpu.utils.wandblogger import WandbLogger

        self.wandblogger = WandbLogger(config)
        # real TB event files (`trainer.py:371-407` analog), lazy writer
        from oovrec_tpu.utils.tensorboard import TensorboardLogger

        self.tensorboard = TensorboardLogger(
            config,
            base_dir=config.get("tensorboard_dir") or "./log_tensorboard",
        )

        # inductive regime
        self.train_oov = bool(config["train_oov"])
        self.oov_only_epoch = bool(config["oov_only_epoch"])
        self.oov_train_ratio = float(config["oov_train_ratio"] or 0.0)
        self.oov_freeze_embedding = bool(config["oov_freeze_embedding"])
        self.oov_freeze_skip_optim = bool(config["oov_freeze_skip_optim"])
        self.valid_sample_ratio = config["eval_valid_sample_ratio"]
        self._oov_rng = host_rng(int(config["seed"] or 0), "oov_regime")
        self.oov_simulator: Optional[OOVSimulator] = None
        self._dropout_key = jax.random.key(int(config["seed"] or 0) + 101)
        self._global_step = 0

        # DHE/fDHE: host-side SipHash annotation of (padded) ID columns
        self.dhe_hasher = None
        spec = getattr(model, "spec", None)
        if spec is not None and spec.embedder in ("dhe", "fdhe"):
            from oovrec_tpu.inductive.dhe import DHEHasher

            self.dhe_hasher = DHEHasher(
                spec.dhe_num_hashes,
                config.get("hash_key_dir", "./hash_keys"),
                keys_u64=self.estate.get("dhe_keys"),
                on_device=bool(config["dhe_on_device"]),
            )
            self.estate["dhe_keys"] = self.dhe_hasher.keys
            if self.dhe_hasher.on_device:
                from oovrec_tpu.ops.siphash_device import split_keys

                self.estate["dhe_key_parts"] = split_keys(
                    self.dhe_hasher.keys
                )

    # ------------------------------------------------------------ mesh

    def _place_state_on_mesh(self) -> None:
        """Commit params/extra-vars/opt-state to the mesh: big tables
        row-sharded on 'model' (param_sharding rule), optimizer subtrees
        mirroring their params (exact treedef alignment), the rest
        replicated. jit then compiles SPMD from the committed shardings."""
        import jax.numpy as _jnp  # noqa: F401

        from oovrec_tpu.parallel.mesh import param_sharding, replicated
        from oovrec_tpu.parallel.train_step import opt_state_sharding

        threshold = int(self.config.get("row_shard_threshold") or 4096)
        if jax.process_count() > 1:
            # multi-host: init produced process-local committed arrays;
            # round-trip through host numpy so device_put re-commits them
            # as GLOBAL arrays under the pod-spanning shardings (every
            # process holds identical values — same seed, same init)
            def put(x, s):
                return jax.device_put(np.asarray(x), s)
        else:
            put = jax.device_put
        params = self.variables["params"]
        self._p_shard = param_sharding(self.mesh, params, threshold)
        params = jax.tree.map(put, params, self._p_shard)
        extra = {k: v for k, v in self.variables.items() if k != "params"}
        if extra:
            extra = jax.tree.map(put, extra, replicated(self.mesh, extra))
        self.variables = dict(extra, params=params)
        self._o_shard = opt_state_sharding(
            self.mesh, self.opt_state, self._p_shard
        )
        self.opt_state = jax.tree.map(put, self.opt_state, self._o_shard)

    def _place_batch(self, db):
        """Host batch → device ('data'-sharded when a mesh is active,
        with zero-row padding up to the data-axis multiple; padded rows
        carry weight 0 so every loss/metric ignores them)."""
        if self.mesh is None:
            return db
        from oovrec_tpu.parallel.mesh import place_batch

        return place_batch(self.mesh, db)

    # ------------------------------------------------------------ steps

    def _wrap_clip(self, tx):
        if self.clip is not None:
            return optax.chain(self.clip, tx)
        return tx

    def _make_step(self, frozen: bool):
        model, tx = self.model, self.tx
        freeze_mask = None
        if frozen:
            freeze_mask = jax.tree_util.tree_map_with_path(
                lambda path, _: _is_oov_param_path(path),
                self.variables["params"],
            )

        # donate params + opt_state so updated tables reuse the input
        # buffers (halves HBM traffic on the embedding tables). Not safe
        # under dynamic negative sampling: the loader's scorer callback
        # reads self.variables["params"] concurrently with the step.
        nsa = self.config["train_neg_sample_args"] or {}
        donate = (0, 2) if not nsa.get("dynamic") else ()

        @partial(jax.jit, donate_argnums=donate)
        def step(params, extra_vars, opt_state, batch, estate, rng):
            def loss_fn(p):
                out, new_vars = model.apply(
                    {"params": p, **extra_vars}, batch, estate,
                    method=model.calculate_loss,
                    rngs={"dropout": rng},
                    mutable=["batch_stats"],
                )
                return out, new_vars

            (loss, new_vars), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params)
            updates, new_opt_state = tx.update(grads, opt_state, params)
            if freeze_mask is not None:
                # zero masked updates AND keep their optimizer slots frozen
                updates = jax.tree.map(
                    lambda m, u: u if m else jnp.zeros_like(u),
                    freeze_mask, updates,
                )
                new_opt_state = _select_opt_state(
                    freeze_mask, opt_state, new_opt_state
                )
            new_params = optax.apply_updates(params, updates)
            return loss, new_params, new_vars, new_opt_state

        return step

    def _get_step(self, frozen: bool):
        if frozen:
            if self._train_step_frozen is None:
                self._train_step_frozen = self._make_step(True)
            return self._train_step_frozen
        if self._train_step is None:
            self._train_step = self._make_step(False)
        return self._train_step

    # ----------------------------------------------- host-scan dispatch

    def _make_scan_step(self, frozen: bool):
        """K host batches per device dispatch: stacked batches lax.scan
        through the SAME per-step program as `_make_step` (identical loss,
        rng = fold_in(dropout_key, global_step), freeze semantics). On a
        tunneled device the per-dispatch RTT dominates a 2048-row step
        (BENCH_r03: host pipeline collapsed to 59k ex/s at ~30 ms/dispatch)
        — amortizing it over K steps recovers the kernel-bound rate."""
        model, tx = self.model, self.tx
        freeze_mask = None
        if frozen:
            freeze_mask = jax.tree_util.tree_map_with_path(
                lambda path, _: _is_oov_param_path(path),
                self.variables["params"],
            )

        @partial(jax.jit, donate_argnums=(0, 2))
        def scan_step(params, extra_vars, opt_state, batches, estate,
                      drop_key, step0):
            K = jax.tree_util.tree_leaves(batches)[0].shape[0]
            idxs = step0 + jnp.arange(K, dtype=jnp.int32)

            def body(carry, xs):
                p, ev, os_ = carry
                batch, idx = xs

                def loss_fn(p):
                    out, new_vars = model.apply(
                        {"params": p, **ev}, batch, estate,
                        method=model.calculate_loss,
                        rngs={"dropout": jax.random.fold_in(drop_key, idx)},
                        mutable=["batch_stats"],
                    )
                    return out, new_vars

                (loss, new_vars), grads = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(p)
                updates, nos = tx.update(grads, os_, p)
                if freeze_mask is not None:
                    updates = jax.tree.map(
                        lambda m, u: u if m else jnp.zeros_like(u),
                        freeze_mask, updates,
                    )
                    nos = _select_opt_state(freeze_mask, os_, nos)
                np_ = optax.apply_updates(p, updates)
                if "batch_stats" in new_vars:
                    ev = dict(ev, batch_stats=new_vars["batch_stats"])
                return (np_, ev, nos), loss

            (params, extra_vars, opt_state), losses = jax.lax.scan(
                body, (params, extra_vars, opt_state), (batches, idxs)
            )
            return losses, params, extra_vars, opt_state

        return scan_step

    def _get_scan_step(self, frozen: bool):
        if getattr(self, "_scan_steps", None) is None:
            self._scan_steps = {}
        if frozen not in self._scan_steps:
            self._scan_steps[frozen] = self._make_scan_step(frozen)
        return self._scan_steps[frozen]

    def _host_scan_k(self, loader) -> int:
        """Batches per dispatch for the host pipeline. `host_scan_steps:
        auto` engages K=64 on single-process static-shape loaders with
        >= 128 batches (~K x batch rows buffered on the host); dynamic
        hard negatives need live params per batch (the scorer callback) so
        they stay per-batch; tiny loaders keep the per-batch path so
        seeded fixture trajectories don't re-compile twice for a one-off
        remainder program."""
        flag = self.config.get("host_scan_steps", "auto")
        if flag in (False, 0, 1, None):
            return 1
        if getattr(loader, "dynamic", False):
            return 1
        if self.config["oov_debug_skip_train"]:
            return 1
        if jax.process_count() > 1:
            return 1
        # K=64 amortizes the per-dispatch RTT to noise (measured ladder on
        # the tunnel-shared chip: K=16 → 621k ex/s, K=64 → 921k at the
        # bench shapes); the buffered group is ~K×batch rows of host RAM
        k = 64 if flag == "auto" else max(1, int(flag))
        if flag == "auto" and len(loader) < 2 * k:
            return 1
        return k

    # ------------------------------------------------------------ epochs

    def _train_epoch(self, train_loader, epoch_idx: int,
                     oov_transform=None, keep_ratio: Optional[float] = None,
                     frozen: bool = False) -> float:
        """One pass over the loader. `oov_transform` applies the OOV
        simulation to each kept batch; `keep_ratio` is the Bernoulli batch
        keep probability of the OOV sub-epoch (`trainer.py:1796`)."""
        from oovrec_tpu.data.prefetch import maybe_prefetch

        if oov_transform is None and keep_ratio is None and not frozen:
            de = self._maybe_device_epoch(train_loader)
            if de is not None:
                return self._run_device_epoch(de, epoch_idx)
        elif (
            keep_ratio is not None
            and oov_transform is self.oov_simulator
            and self.oov_simulator is not None
        ):
            # OOV-only sub-epoch fully on device: option-of-3 padding,
            # id masking, on-device bucket hashing, Bernoulli step keep
            de = self._maybe_device_epoch(
                train_loader, oov=True, frozen=frozen
            )
            if de is not None:
                return self._run_device_epoch(de, epoch_idx)

        train_loader = maybe_prefetch(train_loader, self.config)
        step = self._get_step(frozen)
        params = self.variables["params"]
        extra_vars = {k: v for k, v in self.variables.items() if k != "params"}
        opt_state = self.opt_state
        estate = _device_estate(self.estate)
        if self.mesh is not None and estate:
            from oovrec_tpu.parallel.mesh import replicated

            estate = jax.tree.map(
                jax.device_put, estate, replicated(self.mesh, estate)
            )
        total_loss = None
        losses = []
        n_examples = 0
        t_epoch = time.time()
        # host-scan dispatch: group K prepared batches per device call
        # (single-process, static shapes; mesh batches shard per-batch on
        # axis 0 so the mesh path stays per-batch)
        K = self._host_scan_k(train_loader) if self.mesh is None else 1
        scan_step = self._get_scan_step(frozen) if K > 1 else None
        buf: list = []
        buf_sig = None

        def run_one(db):
            nonlocal params, extra_vars, opt_state
            rng = jax.random.fold_in(self._dropout_key, self._global_step)
            self._global_step += 1
            loss, params, new_vars, opt_state = step(
                params, extra_vars, opt_state, self._place_batch(db),
                estate, rng
            )
            # keep the live params visible to concurrent readers — the
            # dynamic hard-negative scorer reads them per batch (the
            # reference scores with the live model, train_data.get_model);
            # donation is disabled in dynamic mode so this is safe
            self._live_params = params
            if "batch_stats" in new_vars:
                extra_vars = dict(
                    extra_vars, batch_stats=new_vars["batch_stats"]
                )
            # do NOT block on the loss here: keeping it a device value
            # lets host batch assembly overlap device compute (the
            # reference's per-batch .item() is the stall we're removing)
            losses.append(loss)

        def flush(final: bool):
            nonlocal params, extra_vars, opt_state, buf
            if len(buf) == K:
                stacked = {
                    k: np.stack([b[k] for b in buf]) for k in buf[0]
                }
                ls, params, extra_vars, opt_state = scan_step(
                    params, extra_vars, opt_state, stacked, estate,
                    self._dropout_key, np.int32(self._global_step),
                )
                self._global_step += K
                self._live_params = params
                losses.append(ls)
            else:
                # remainder (or shape-signature change): same per-step
                # program as the K=1 path — identical trajectory
                for b in buf:
                    run_one(b)
            buf = []

        for batch in train_loader:
            if keep_ratio is not None and self._oov_rng.random() > keep_ratio:
                continue
            if oov_transform is not None:
                batch = oov_transform(batch)
            if self.dhe_hasher is not None:
                spec = self.model.spec
                for f in (self.model.uid_field, self.model.iid_field,
                          self.model.neg_prefix + self.model.iid_field):
                    if f in batch:
                        self.dhe_hasher.annotate_batch(
                            batch, f, spec.prime_pad, padded_when_flagged=True
                        )
            db = to_device_batch(batch)
            n_examples += int(np.asarray(batch["weight"]).sum())
            if K == 1:
                run_one(db)
            else:
                sig = tuple(sorted(
                    (k, v.shape, str(v.dtype)) for k, v in db.items()
                ))
                if buf and sig != buf_sig:
                    flush(final=False)
                buf_sig = sig
                buf.append(db)
                if len(buf) == K:
                    flush(final=False)
            if self.config["oov_debug_skip_train"]:
                break
        if buf:
            flush(final=True)
        self.variables = dict(extra_vars, params=params)
        self.opt_state = opt_state
        if losses:
            from oovrec_tpu.parallel.mesh import host_local_value

            # host-scan entries are (K,) loss vectors, per-batch entries
            # scalars — flatten both
            vals = np.concatenate([
                np.atleast_1d(
                    np.asarray(host_local_value(l), dtype=np.float64)
                )
                for l in losses
            ])
            if np.isnan(vals).any():
                raise ValueError("Training loss is nan")
            total_loss = float(vals.sum())
        dt = max(time.time() - t_epoch, 1e-9)
        self.last_examples_per_sec = n_examples / dt
        return total_loss

    def _maybe_device_epoch(self, train_loader, oov: bool = False,
                            frozen: bool = False):
        """Whole-epoch-on-device fast path (train/device_epoch.py) for
        eligible two-tower pairwise loads; None → host pipeline."""
        from oovrec_tpu.train.device_epoch import (
            DeviceEpoch,
            device_epoch_eligible,
        )

        if not device_epoch_eligible(self, train_loader, self.config):
            return None
        if oov:
            spec = getattr(self.model, "spec", None)
            if train_loader.mode != "pairwise":
                return None
            if spec is None or spec.hash_function not in (
                "mod", "fast", "3round", "64bit"
            ):
                return None
            if max(spec.n_user_buckets or 0,
                   spec.n_item_buckets or 0) > (1 << 16):
                return None  # device mod emulation bound
        key = (id(train_loader), oov, frozen)
        if getattr(self, "_device_epochs", None) is None:
            self._device_epochs = {}
        if key not in self._device_epochs:
            self._device_epochs[key] = DeviceEpoch(
                self, train_loader, oov=oov, frozen=frozen
            )
        return self._device_epochs[key]

    def _run_device_epoch(self, de, epoch_idx: int) -> float:
        params = self.variables["params"]
        extra_vars = {k: v for k, v in self.variables.items()
                      if k != "params"}
        estate = _device_estate(self.estate)
        rng = jax.random.fold_in(self._dropout_key, 1_000_000 + epoch_idx)
        t_epoch = time.time()
        params, extra_vars, opt_state, loss_sum, losses = de.run(
            params, extra_vars, self.opt_state, estate, rng,
            self._global_step,
        )
        from oovrec_tpu.parallel.mesh import host_local_value

        vals = np.asarray(host_local_value(losses), dtype=np.float64)
        if np.isnan(vals).any():
            raise ValueError("Training loss is nan")
        self.variables = dict(extra_vars, params=params)
        self._live_params = params
        self.opt_state = opt_state
        self._global_step += de.n_steps
        dt = max(time.time() - t_epoch, 1e-9)
        self.last_examples_per_sec = de.n_real / dt
        return float(vals.sum())

    def _augment_batch(self, batch: dict) -> dict:
        """Mixed-mode augmentation (`_augment_with_oov`, `trainer.py:1654`):
        sample ~ratio of rows, OOV-transform copies, append (into a fixed
        2B-capacity batch; unused capacity keeps weight 0), shuffle."""
        n = len(batch["weight"])
        sel = self._oov_rng.random(n) < self.oov_train_ratio
        sel = sel & (batch["weight"] > 0)
        copy = {k: np.asarray(v)[sel] for k, v in batch.items()}
        copy = self.oov_simulator(copy)
        out = {}
        perm = self._oov_rng.permutation(2 * n)
        for k, v in batch.items():
            v = np.asarray(v)
            pad_shape = (2 * n - n - len(copy[k]),) + v.shape[1:]
            ext = np.concatenate(
                [v, copy[k], np.zeros(pad_shape, v.dtype)], axis=0
            )
            out[k] = ext[perm]
        return out

    # ------------------------------------------------------------ fit

    def fit(self, train_loader, valid_loader=None, saved: bool = True,
            show_progress: bool = False, callback_fn=None):
        """Train with periodic validation + early stopping
        (`trainer.py:409-524`, inductive variant `:1520-1652`)."""
        if self.train_oov and self.oov_simulator is None:
            self.oov_simulator = OOVSimulator(
                self.model.spec,
                self.model.n_users,
                self.model.n_items,
                float(self.config["oov_feature_mask_rate"] or 0.0),
                self._oov_rng,
                uid_field=self.model.uid_field,
                iid_field=self.model.iid_field,
            )
        valid_rng = host_rng(int(self.config["seed"] or 0), "valid_sampling")
        # dynamic hard-negative sampling: give the batcher a jitted scorer
        # bound to the CURRENT params (the reference's train_data.get_model,
        # `trainer.py:1551`)
        nsa = self.config["train_neg_sample_args"] or {}
        if nsa.get("dynamic") and hasattr(train_loader, "set_model_scorer"):
            import jax.numpy as jnp

            model = self.model

            @jax.jit
            def _score(params, users, items):
                b = {model.uid_field: users, model.iid_field: items}
                return model.apply(
                    {"params": params}, b, {}, method=model.predict
                )

            self._live_params = self.variables["params"]
            train_loader.set_model_scorer(
                lambda u, i: _score(
                    self._live_params,
                    jnp.asarray(u.astype(np.int32)),
                    jnp.asarray(i.astype(np.int32)),
                )
            )
        # dataset-level eval resources (popularity metrics; reference's
        # eval_collector.data_collect(train_data), trainer.py:1549)
        self.eval_runner.train_split = getattr(train_loader, "split", None)

        from oovrec_tpu.utils.enums import ModelType

        if getattr(self.model, "model_type", None) == ModelType.TRADITIONAL:
            # traditional models have no gradient training
            # (TraditionalTrainer, `trainer.py:1006-1019`)
            if valid_loader is not None:
                self.best_valid_result = self.eval_runner.evaluate(
                    self.variables, valid_loader
                )
                self.best_valid_score = calculate_valid_score(
                    self.best_valid_result, self.config["valid_metric"]
                )
            if saved:
                self._save_checkpoint(0)
            return self.best_valid_score, self.best_valid_result

        for epoch_idx in range(self.start_epoch, self.epochs):
            t0 = time.time()
            if self.profile_dir and epoch_idx == self.start_epoch:
                from jax import profiler as _jprof

                _jprof.start_trace(self.profile_dir)
                self._profiling = True
            if self.train_oov and not self.oov_only_epoch:
                train_loss = self._train_epoch(
                    train_loader, epoch_idx, oov_transform=self._augment_batch
                )
            else:
                train_loss = self._train_epoch(train_loader, epoch_idx)
            self.train_loss_dict[epoch_idx] = train_loss
            self._log_metrics(
                {
                    "epoch": epoch_idx,
                    "train_loss": train_loss,
                    "examples_per_sec": round(
                        getattr(self, "last_examples_per_sec", 0.0), 1
                    ),
                },
                head="train",
            )

            oov_loss = None
            if self.train_oov and self.oov_only_epoch:
                # true device copies — the donated train step reuses the
                # live opt-state buffers, so aliases would be deleted
                opt_snapshot = (
                    jax.tree.map(
                        lambda x: jnp.array(x, copy=True)
                        if isinstance(x, jax.Array) else x,
                        self.opt_state,
                    )
                    if self.oov_freeze_embedding and self.oov_freeze_skip_optim
                    else None
                )
                oov_loss = self._train_epoch(
                    train_loader, epoch_idx,
                    oov_transform=self.oov_simulator,
                    keep_ratio=self.oov_train_ratio,
                    frozen=self.oov_freeze_embedding,
                )
                if opt_snapshot is not None:
                    self.opt_state = opt_snapshot
                if oov_loss is not None:
                    self.oov_loss_dict[epoch_idx] = oov_loss

            self.logger.info(
                "epoch %d training [time: %.2fs, train loss: %s%s]"
                % (
                    epoch_idx,
                    time.time() - t0,
                    f"{train_loss:.4f}" if train_loss is not None else "None",
                    f", oov loss: {oov_loss:.4f}" if oov_loss is not None else "",
                )
            )
            self.tensorboard.add_scalar("Loss/Train", train_loss, epoch_idx)
            if oov_loss is not None:
                self.tensorboard.add_scalar("Loss/OOV", oov_loss, epoch_idx)

            if self.eval_step <= 0 or valid_loader is None:
                if saved:
                    self._save_checkpoint(epoch_idx)
                continue
            if (epoch_idx + 1) % self.eval_step == 0:
                t1 = time.time()
                ratio = self.valid_sample_ratio
                ratio = ratio if (ratio is not None and 0 < ratio < 1) else None
                valid_result = self.eval_runner.evaluate(
                    self.variables, valid_loader,
                    sample_eval_ratio=ratio, rng=valid_rng,
                )
                valid_score = calculate_valid_score(
                    valid_result, self.config["valid_metric"]
                )
                (
                    self.best_valid_score,
                    self.cur_step,
                    stop_flag,
                    update_flag,
                ) = early_stopping(
                    valid_score,
                    self.best_valid_score,
                    self.cur_step,
                    max_step=self.stopping_step,
                    bigger=self.valid_metric_bigger,
                )
                self.logger.info(
                    "epoch %d evaluating [time: %.2fs, valid_score: %f]"
                    % (epoch_idx, time.time() - t1, valid_score)
                )
                self.logger.info(f"valid result: {dict(valid_result)}")
                if update_flag:
                    if saved:
                        self._save_checkpoint(epoch_idx)
                    self.best_valid_result = valid_result
                if callback_fn:
                    callback_fn(epoch_idx, valid_score)
                self._log_metrics(
                    {**{k: float(v) for k, v in valid_result.items()},
                     "epoch": epoch_idx},
                    head="valid",
                )
                self.wandblogger.log_metrics(
                    dict(valid_result), head="valid"
                )
                self.tensorboard.add_scalar(
                    "Valid_score", valid_score, epoch_idx
                )
                self.tensorboard.add_scalars(
                    "Valid", dict(valid_result), epoch_idx
                )
                if stop_flag:
                    self.logger.info(
                        "Finished training, best eval result in epoch %d"
                        % (epoch_idx - self.cur_step * self.eval_step)
                    )
                    break
        if self._profiling:
            from jax import profiler as _jprof

            _jprof.stop_trace()
            self._profiling = False
        self.tensorboard.add_hparams(self.best_valid_score)
        self.tensorboard.close()
        return self.best_valid_score, self.best_valid_result

    def _log_metrics(self, metrics: dict, head: str = "train") -> None:
        if not self.metrics_log_path:
            return
        import json

        os.makedirs(os.path.dirname(self.metrics_log_path) or ".", exist_ok=True)
        with open(self.metrics_log_path, "a") as f:
            f.write(json.dumps({"head": head, **metrics}) + "\n")

    # ------------------------------------------------------------ eval

    def evaluate(self, eval_loader, load_best_model: bool = True,
                 model_file: Optional[str] = None):
        if eval_loader is None:
            return None
        if load_best_model:
            path = model_file or self.saved_model_file
            if jax.process_count() > 1:
                self._resume_best_multiprocess(path)
            elif os.path.isfile(path):
                self.resume_checkpoint(path, params_only=True)
        return self.eval_runner.evaluate(self.variables, eval_loader)

    def _resume_best_multiprocess(self, path: str) -> None:
        """Collective-consistent best-model reload on a pod: every rank
        must make the SAME resume decision (device_put to pod-spanning
        shardings synchronizes across processes — a rank that skips it
        deadlocks the others). Ranks agree via allgather; when only some
        hold the file (rank-0-only write to a non-shared checkpoint_dir),
        the holder broadcasts the host state to everyone — the pod analog
        of the reference's rank-0 save / all-rank load (`trainer.py:301`,
        `:644`)."""
        from jax.experimental import multihost_utils

        from oovrec_tpu.parallel.mesh import host_copy

        have = bool(os.path.isfile(path))
        flags = np.asarray(
            multihost_utils.process_allgather(np.array([have]))
        ).reshape(-1)
        if not flags.any():
            return  # nobody has it — keep current state everywhere
        if flags.all():
            self.resume_checkpoint(path, params_only=True)
            return
        src = int(np.argmax(flags))
        params_host = host_copy(self.variables["params"])
        extra_host = host_copy(
            {k: v for k, v in self.variables.items() if k != "params"}
        )
        if have:
            with open(path, "rb") as f:
                state = pickle.load(f)
            params_host = serialization.from_bytes(
                params_host, state["params"]
            )
            if state.get("extra_vars") and extra_host:
                extra_host = serialization.from_bytes(
                    extra_host, state["extra_vars"]
                )
        is_source = jax.process_index() == src
        params_host = multihost_utils.broadcast_one_to_all(
            params_host, is_source=is_source
        )
        if extra_host:
            extra_host = multihost_utils.broadcast_one_to_all(
                extra_host, is_source=is_source
            )
        self.variables = dict(
            jax.tree.map(np.asarray, extra_host), params=jax.tree.map(
                np.asarray, params_host
            )
        )
        if self.mesh is not None:
            self._place_state_on_mesh()

    # ------------------------------------------------------ checkpointing

    def _save_checkpoint(self, epoch: int, path: Optional[str] = None):
        """Full state: config, epoch, best score, params, opt state, estate
        (`_save_checkpoint`, `trainer.py:294-317`). Sharded arrays are
        gathered to host first (a collective every process joins); only
        process 0 writes — the reference's rank-0-only save."""
        from oovrec_tpu.parallel.mesh import host_copy

        params_host = host_copy(self.variables["params"])
        extra_host = host_copy(
            {k: v for k, v in self.variables.items() if k != "params"}
        )
        opt_host = host_copy(self.opt_state)
        if jax.process_index() != 0:
            return
        state = {
            "config": self.config.as_dict() if hasattr(self.config, "as_dict") else dict(self.config),
            "epoch": epoch,
            "cur_step": self.cur_step,
            "best_valid_score": self.best_valid_score,
            "params": serialization.to_bytes(params_host),
            "extra_vars": serialization.to_bytes(extra_host),
            "opt_state": serialization.to_bytes(opt_host),
            "estate": {k: np.asarray(v) for k, v in self.estate.items()},
        }
        with open(path or self.saved_model_file, "wb") as f:
            pickle.dump(state, f)

    def resume_checkpoint(self, path: str, params_only: bool = False):
        with open(path, "rb") as f:
            state = pickle.load(f)
        # layout reconciliation (ADVICE r4 #4): checkpoints written under
        # `sharded_lookup != gspmd` store tables as `embedding_sharded`
        # (S, V_pad/S, D) keyed to the writing mesh's model-axis size;
        # convert stored ↔ current layouts (both directions, any S)
        # instead of failing structurally on a topology change
        from oovrec_tpu.parallel.sharded_embedding import reconcile_layouts

        raw_params = serialization.msgpack_restore(state["params"])
        target_params = serialization.to_state_dict(self.variables["params"])
        reconcile_layouts(target_params, raw_params)
        params = serialization.from_state_dict(
            self.variables["params"], raw_params
        )
        self.variables = dict(self.variables, params=params)
        if state.get("extra_vars"):
            extra_t = {k: v for k, v in self.variables.items() if k != "params"}
            if extra_t:
                extra = serialization.from_bytes(extra_t, state["extra_vars"])
                self.variables = dict(extra, params=params)
        self.estate.update(state.get("estate", {}))
        if not params_only:
            raw_opt = serialization.msgpack_restore(state["opt_state"])
            reconcile_layouts(
                serialization.to_state_dict(self.opt_state), raw_opt
            )
            self.opt_state = serialization.from_state_dict(
                self.opt_state, raw_opt
            )
            self.start_epoch = state["epoch"] + 1
            self.cur_step = state["cur_step"]
            self.best_valid_score = state["best_valid_score"]
        if self.mesh is not None:
            # checkpoints hold full host arrays; re-commit them to the mesh
            # so subsequent steps keep compiling SPMD from known shardings
            self._place_state_on_mesh()
        return state


def _select_opt_state(mask, old_state, new_state, params=None):
    """Per-leaf select between old/new optimizer state for frozen params.

    Optimizer states embed param-structured subtrees (adam mu/nu, rss
    sums) whose treedef is identical to the parameter treedef — the exact
    alignment key (utils/tree_align.py). Frozen params (mask False) keep
    their OLD state leaves — the exact behavior of torch skipping
    None-grad params; structural leaves (step counts, empty states)
    always take the new value.
    """
    from oovrec_tpu.utils.tree_align import map_param_subtrees

    return map_param_subtrees(
        mask,
        lambda new_sub, old_sub: jax.tree.map(
            lambda m, n, o: n if m else o, mask, new_sub, old_sub
        ),
        lambda new_leaf, _old_leaf: new_leaf,
        new_state,
        old_state,
    )


def get_trainer(model_type=None, model_name: str = "") -> type:
    """Trainer dispatch (`recbole/utils/utils.py:88-112` get_trainer
    analog). The reference selects one of ~10 Trainer subclasses by model
    name; here specialty behaviors live in model fields (S3Rec
    `train_stage`, RaCT stages, KD_DAGFM `phase`, KG joint batches via
    KGTrainBatcher, traditional short-circuit), so every model trains
    under the one functional Trainer."""
    return Trainer
