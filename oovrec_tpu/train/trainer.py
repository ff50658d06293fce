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
        self.opt_state = self.tx.init(self.variables["params"])

        self.start_epoch = 0
        self.cur_step = 0
        self.best_valid_score = None
        self.best_valid_result = None
        self.train_loss_dict: Dict[int, float] = {}

        ckpt_dir = config.get("checkpoint_dir", "saved")
        os.makedirs(ckpt_dir, exist_ok=True)
        self.saved_model_file = os.path.join(
            ckpt_dir, f"{config['model']}-{config['dataset']}.ckpt"
        )

        self.eval_runner = EvalRunner(model, config, estate=self.estate)
        self._train_step = None
        self._train_step_frozen = None

        # observability: JSONL metrics stream (tensorboard-scalar analog,
        # `trainer.py:371-407`) + optional jax profiler trace
        self.metrics_log_path = config.get("metrics_log_path")
        self.profile_dir = config.get("profile_dir")
        self._profiling = False
        from oovrec_tpu.utils.wandblogger import WandbLogger

        self.wandblogger = WandbLogger(config)

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

    # ------------------------------------------------------------ epochs

    def _train_epoch(self, train_loader, epoch_idx: int,
                     oov_transform=None, keep_ratio: Optional[float] = None,
                     frozen: bool = False) -> float:
        """One pass over the loader. `oov_transform` applies the OOV
        simulation to each kept batch; `keep_ratio` is the Bernoulli batch
        keep probability of the OOV sub-epoch (`trainer.py:1796`)."""
        from oovrec_tpu.data.prefetch import maybe_prefetch

        train_loader = maybe_prefetch(train_loader, self.config)
        step = self._get_step(frozen)
        params = self.variables["params"]
        extra_vars = {k: v for k, v in self.variables.items() if k != "params"}
        opt_state = self.opt_state
        estate = _device_estate(self.estate)
        total_loss = None
        losses = []
        n_examples = 0
        t_epoch = time.time()
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
            rng = jax.random.fold_in(self._dropout_key, self._global_step)
            self._global_step += 1
            loss, params, new_vars, opt_state = step(
                params, extra_vars, opt_state, db, estate, rng
            )
            if "batch_stats" in new_vars:
                extra_vars = dict(extra_vars, batch_stats=new_vars["batch_stats"])
            # do NOT block on the loss here: keeping it a device value lets
            # host batch assembly overlap device compute (the reference's
            # per-batch .item() is the stall we're removing)
            losses.append(loss)
            n_examples += int(np.asarray(batch["weight"]).sum())
            if self.config["oov_debug_skip_train"]:
                break
        self.variables = dict(extra_vars, params=params)
        self.opt_state = opt_state
        if losses:
            vals = np.asarray(jax.device_get(losses), dtype=np.float64)
            if np.isnan(vals).any():
                raise ValueError("Training loss is nan")
            total_loss = float(vals.sum())
        dt = max(time.time() - t_epoch, 1e-9)
        self.last_examples_per_sec = n_examples / dt
        return total_loss

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

            train_loader.set_model_scorer(
                lambda u, i: _score(
                    self.variables["params"],
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

            self.logger.info(
                "epoch %d training [time: %.2fs, train loss: %s%s]"
                % (
                    epoch_idx,
                    time.time() - t0,
                    f"{train_loss:.4f}" if train_loss is not None else "None",
                    f", oov loss: {oov_loss:.4f}" if oov_loss is not None else "",
                )
            )

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
            if os.path.isfile(path):
                self.resume_checkpoint(path, params_only=True)
        return self.eval_runner.evaluate(self.variables, eval_loader)

    # ------------------------------------------------------ checkpointing

    def _save_checkpoint(self, epoch: int, path: Optional[str] = None):
        """Full state: config, epoch, best score, params, opt state, estate
        (`_save_checkpoint`, `trainer.py:294-317`). Only process 0 writes."""
        if jax.process_index() != 0:
            return
        state = {
            "config": self.config.as_dict() if hasattr(self.config, "as_dict") else dict(self.config),
            "epoch": epoch,
            "cur_step": self.cur_step,
            "best_valid_score": self.best_valid_score,
            "params": serialization.to_bytes(self.variables["params"]),
            "extra_vars": serialization.to_bytes(
                {k: v for k, v in self.variables.items() if k != "params"}
            ),
            "opt_state": serialization.to_bytes(self.opt_state),
            "estate": {k: np.asarray(v) for k, v in self.estate.items()},
        }
        with open(path or self.saved_model_file, "wb") as f:
            pickle.dump(state, f)

    def resume_checkpoint(self, path: str, params_only: bool = False):
        with open(path, "rb") as f:
            state = pickle.load(f)
        params = serialization.from_bytes(
            self.variables["params"], state["params"]
        )
        self.variables = dict(self.variables, params=params)
        if state.get("extra_vars"):
            extra_t = {k: v for k, v in self.variables.items() if k != "params"}
            if extra_t:
                extra = serialization.from_bytes(extra_t, state["extra_vars"])
                self.variables = dict(extra, params=params)
        self.estate.update(state.get("estate", {}))
        if not params_only:
            self.opt_state = serialization.from_bytes(
                self.opt_state, state["opt_state"]
            )
            self.start_epoch = state["epoch"] + 1
            self.cur_step = state["cur_step"]
            self.best_valid_score = state["best_valid_score"]
        return state


def _select_opt_state(mask, old_state, new_state, params=None):
    """Per-leaf select between old/new optimizer state for frozen params.

    Optimizer states embed param-structured subtrees (adam mu/nu, rss sums);
    a state leaf belongs to param P iff its key path ends with P's key path.
    Frozen params (mask False) keep their OLD state leaves — the exact
    behavior of torch skipping None-grad params; structural leaves (step
    counts, empty states) always take the new value.
    """
    mask_by_path = {}
    jax.tree_util.tree_map_with_path(
        lambda p, m: mask_by_path.__setitem__(jax.tree_util.keystr(p), bool(m)),
        mask,
    )

    def sel(path, new_leaf, old_leaf):
        ps = jax.tree_util.keystr(path)
        for param_path, m in mask_by_path.items():
            if ps.endswith(param_path):
                return new_leaf if m else old_leaf
        return new_leaf

    return jax.tree_util.tree_map_with_path(sel, new_state, old_state)


def get_trainer(model_type=None, model_name: str = "") -> type:
    """Trainer dispatch (`recbole/utils/utils.py:88-112` get_trainer
    analog). The reference selects one of ~10 Trainer subclasses by model
    name; here specialty behaviors live in model fields (S3Rec
    `train_stage`, RaCT stages, KD_DAGFM `phase`, KG joint batches via
    KGTrainBatcher, traditional short-circuit), so every model trains
    under the one functional Trainer."""
    return Trainer
