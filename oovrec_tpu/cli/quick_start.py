"""run / objective_function — the end-to-end driver.

Equivalent of `recbole/quick_start/quick_start.py:42-168` +
`src/run_recbole.py:39-200`: config → dataset → loaders → model →
trainer.fit → test evaluation. Returns the result dict the reference's
`objective_function` produces (used by tests and hyper-tuning).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import numpy as np

from oovrec_tpu.config import Config
from oovrec_tpu.data.utils import create_dataset, data_preparation
from oovrec_tpu.eval.collector import calculate_valid_score
from oovrec_tpu.inductive.factory import build_embedder_state
from oovrec_tpu.inductive.mapper import RandomOOVMapper
from oovrec_tpu.inductive.spec import InductiveSpec
from oovrec_tpu.models import get_model_class
from oovrec_tpu.train.trainer import Trainer
from oovrec_tpu.utils.logging import init_logger
from oovrec_tpu.utils.seeding import init_seed


def build_model_and_state(config, dataset, mode: str = "transductive",
                          n_entities=None, template_batch=None,
                          fields_from=None):
    """Instantiate the model + init params + embedder state.

    `n_entities=(n_users, n_items)` overrides table sizes when rebuilding a
    model against an inductive corpus with the ORIGINAL counts
    (`perform_hashing.py:141-163`). `template_batch` (any host batch with
    the model's input columns) drives lazy param init; a minimal synthetic
    one is derived when omitted. `fields_from` supplies the dataset the
    CONTEXT field spec is derived from — the inductive rebuild passes the
    original training dataset so packed-table shapes match the checkpoint
    (the reference rebuilds on orig_dataset, `perform_hashing.py:150-163`),
    while feature matrices (estate) still come from `dataset`.
    """
    import dataclasses

    from oovrec_tpu.models.context import (
        ContextRecommender,
        field_spec_from_dataset,
    )

    cls = get_model_class(config["model"])
    spec = InductiveSpec.from_config(config)
    if not spec.active:
        spec = None

    n_users, n_items = n_entities or (dataset.user_num, dataset.item_num)
    uid = config["USER_ID_FIELD"]
    iid = config["ITEM_ID_FIELD"]
    is_context = issubclass(cls, ContextRecommender)

    kwargs: Dict[str, Any] = dict(
        spec=spec,
        uid_field=uid,
        iid_field=iid,
        label_field=config["LABEL_FIELD"],
        neg_prefix=config["NEG_PREFIX"],
    )
    if is_context:
        fields = field_spec_from_dataset(fields_from or dataset, config)
        if n_entities is not None:
            # rebuild against the _ind corpus with ORIGINAL vocab sizes
            dims = list(fields.token_dims)
            dims[0], dims[1] = n_users, n_items
            fields = dataclasses.replace(fields, token_dims=tuple(dims))
        kwargs["fields"] = fields
        kwargs["embedding_size"] = int(config.get("embedding_size", 10))
    else:
        kwargs.update(
            n_users=n_users,
            n_items=n_items,
            embedding_size=int(config.get("embedding_size", 64)),
        )
        # explicit row-sharded lookup (`sharded_lookup: psum|alltoall|
        # auto`): hand the model the mesh so `_embed_table` builds
        # ShardedEmbed tables wired through the shard_map exchange
        slk = config.get("sharded_lookup")
        if slk and slk != "gspmd":
            from oovrec_tpu.parallel.mesh import maybe_mesh_from_config

            mesh = maybe_mesh_from_config(config)
            if mesh is not None and mesh.shape["model"] > 1:
                kwargs["sharded_mesh"] = mesh
        from oovrec_tpu.utils.enums import ModelType as _MT

        if getattr(cls, "model_type", None) == _MT.SEQUENTIAL:
            kwargs["max_seq_length"] = int(config["MAX_ITEM_LIST_LENGTH"])
        if hasattr(dataset, "entity_num"):
            kwargs["n_entities"] = dataset.entity_num
            kwargs["n_relations"] = dataset.relation_num
    # config-driven hyperparameters declared by the model dataclass
    claimed = set(kwargs) | {"parent", "name", "fields", "spec"}
    for f in dataclasses.fields(cls):
        if f.name in claimed or f.name not in config.keys():
            continue
        v = config[f.name]
        if v is None:
            continue
        if isinstance(v, list):
            v = tuple(v)
        elif f.type in ("float", float) and isinstance(v, (str, int)):
            v = float(v)  # YAML quirk: '1e-05' parses as a string
        elif f.type in ("int", int) and isinstance(v, str):
            v = int(v)
        elif f.type in ("bool", bool) and isinstance(v, str):
            v = v.lower() in ("true", "1", "yes")
        kwargs[f.name] = v
    if hasattr(cls, "derive_kwargs"):
        # dataset-dependent static fields (e.g. packed feature vocab sizes
        # for GRU4RecF/SASRecF/FDSA)
        kwargs.update(cls.derive_kwargs(dataset, config))
    model = cls(**kwargs)

    estate = {}
    if spec is not None and (
        spec.needs_features or spec.embedder in ("lsh", "slsh", "dhe", "fdhe")
    ):
        estate = build_embedder_state(
            spec, dataset, n_users, n_items, mode=mode,
            seed=int(config["seed"] or 2020),
            hash_key_dir=config.get("hash_key_dir", "./hash_keys"),
        )

    # dataset-derived model state (Pop counts, ItemKNN similarity,
    # LightGCN edges, ...) must exist before init traces the loss
    if hasattr(cls, "build_estate"):
        import inspect

        if "config" in inspect.signature(cls.build_estate).parameters:
            estate.update(cls.build_estate(dataset.build()[0], config=config))
        else:
            estate.update(cls.build_estate(dataset.build()[0]))

    if template_batch is None:
        template_batch = {
            uid: np.zeros(2, np.int32),
            iid: np.zeros(2, np.int32),
            config["NEG_PREFIX"] + iid: np.zeros(2, np.int32),
            config["LABEL_FIELD"]: np.zeros(2, np.float32),
            "weight": np.ones(2, np.float32),
        }
        if spec is not None:
            for f in (uid, iid, config["NEG_PREFIX"] + iid):
                template_batch[f + "_oov"] = np.zeros(2, np.int32)
                template_batch[f + "_bucket"] = np.zeros(2, np.int32)
    from oovrec_tpu.eval.runner import to_device_batch

    est = {k: np.asarray(v) for k, v in estate.items()}
    seed = int(config["seed"] or 2020)
    variables = model.init(
        {"params": jax.random.key(seed), "dropout": jax.random.key(seed + 1)},
        to_device_batch(template_batch), est, method=model.calculate_loss,
    )
    return model, dict(variables), estate


def run(
    model: Optional[str] = None,
    dataset: Optional[str] = None,
    config_file_list: Optional[List[str]] = None,
    config_dict: Optional[Dict[str, Any]] = None,
    saved: bool = True,
):
    """Full train+eval run (`quick_start.py:42` run_recbole analog)."""
    config = Config(model, dataset, config_file_list, config_dict)
    # `--jax_platforms=cpu` pins the backend BEFORE first device use (this
    # jax build ignores the JAX_PLATFORMS env var; the config API is the
    # only working override — parity tooling and CPU A/B runs rely on it)
    if config["jax_platforms"]:
        jax.config.update("jax_platforms", str(config["jax_platforms"]))
    # multi-host bootstrap BEFORE any device use (the reference's NCCL
    # process-group init, `configurator.py:487-516`; here
    # jax.distributed.initialize wires every host into one runtime so the
    # ('data','model') mesh spans the pod slice)
    if config["coordinator_address"] or (config["num_processes"] or 0) > 1:
        from oovrec_tpu.parallel.distributed import initialize_distributed

        info = initialize_distributed(
            config["coordinator_address"],
            config["num_processes"],
            config["process_id"],
        )
        print(f"distributed runtime: {info}")
    init_seed(int(config["seed"] or 2020), config["reproducibility"])
    logger = init_logger(config)
    from oovrec_tpu.utils.precision import set_policy

    set_policy(config.get("compute_dtype", "float32"))

    ds = create_dataset(config)
    train_loader, valid_loader, test_loader = data_preparation(config, ds)

    template = train_loader._make_batch(
        np.arange(min(2, max(len(ds.build()[0]), 1)))
    )
    model_obj, variables, estate = build_model_and_state(
        config, ds, template_batch=template
    )
    if config["import_torch_checkpoint"]:
        # migration path: seed params from a trained reference .pth
        # (utils/torch_import.py; layout maps proven output-identical
        # in tests/test_reference_parity.py)
        import jax.numpy as _jnp
        import jax as _jax

        from oovrec_tpu.utils.torch_import import (
            import_reference_checkpoint,
        )

        imported = import_reference_checkpoint(
            config["model"], config["import_torch_checkpoint"]
        )

        def _merge(ours, new):
            if isinstance(new, dict) and isinstance(ours, dict):
                return {k: (_merge(ours[k], new[k]) if k in new else ours[k])
                        for k in ours}
            return _jnp.asarray(new)

        variables = dict(variables,
                         params=_merge(variables["params"], imported))
        logger.info(
            "imported reference checkpoint "
            f"[{config['import_torch_checkpoint']}]"
        )
    # startup cost report (`get_flops`, src/run_recbole.py:90 analog)
    try:
        from oovrec_tpu.utils.flops import count_params

        logger.info(
            f"model: {config['model']}  trainable params: "
            f"{count_params(variables['params']):,}"
        )
    except Exception:
        pass
    trainer = Trainer(config, model_obj, variables, estate)

    best_valid_score, best_valid_result = trainer.fit(
        train_loader, valid_loader, saved=saved
    )
    test_result = trainer.evaluate(test_loader, load_best_model=saved)

    logger.info(f"best valid: {best_valid_result}")
    logger.info(f"test result: {test_result}")
    return {
        "best_valid_score": best_valid_score,
        "valid_score_bigger": config["valid_metric_bigger"],
        "best_valid_result": best_valid_result,
        "test_result": test_result,
        "trainer": trainer,
        "config": config,
        "dataset": ds,
    }


def objective_function(config_dict=None, config_file_list=None, saved: bool = False):
    """Hyper-tuning / test objective (`quick_start.py:131` analog)."""
    res = run(
        config_dict=config_dict, config_file_list=config_file_list, saved=saved
    )
    return {
        "best_valid_score": res["best_valid_score"],
        "valid_score_bigger": res["valid_score_bigger"],
        "best_valid_result": res["best_valid_result"],
        "test_result": res["test_result"],
    }


import dataclasses as _dc


@_dc.dataclass
class LoadedRun:
    """Everything `load_data_and_model` restores. Iterating yields the
    reference's 6-tuple `(config, model, dataset, train_data, valid_data,
    test_data)` (`recbole/quick_start/quick_start.py:168-200`) so existing
    call sites unpack it reference-style; the extra functional-state
    fields (variables/estate/trainer) ride as attributes."""

    config: Any
    model: Any
    dataset: Any
    train_loader: Any
    valid_loader: Any
    test_loader: Any
    variables: Dict[str, Any]
    estate: Dict[str, Any]
    trainer: Any

    def __iter__(self):
        return iter((self.config, self.model, self.dataset,
                     self.train_loader, self.valid_loader, self.test_loader))


def load_data_and_model(model_file: str,
                        config_overrides: Optional[Dict[str, Any]] = None
                        ) -> LoadedRun:
    """One-call checkpoint restore (`quick_start.py:168` analog): the
    resolved config stored in the checkpoint rebuilds the dataset,
    loaders and model, then params/extra-vars/estate are restored — so
    analysis entry points (eval-only re-runs, case studies, significance
    re-evaluation) stop re-deriving the rebuild dance by hand.

    The same seed re-seeds loader RNG streams, so a `trainer.evaluate`
    on the returned loaders reproduces the saved run's test metrics
    exactly (uniN candidate redraws included)."""
    import pickle

    with open(model_file, "rb") as f:
        state = pickle.load(f)
    cfg_dict = dict(state["config"])
    if config_overrides:
        cfg_dict.update(config_overrides)
    config = Config(config_dict=cfg_dict)
    init_seed(int(config["seed"] or 2020), config["reproducibility"])
    from oovrec_tpu.utils.precision import set_policy

    set_policy(config.get("compute_dtype", "float32"))
    ds = create_dataset(config)
    train_loader, valid_loader, test_loader = data_preparation(config, ds)
    template = train_loader._make_batch(
        np.arange(min(2, max(len(ds.build()[0]), 1)))
    )
    model, variables, estate = build_model_and_state(
        config, ds, template_batch=template
    )
    trainer = Trainer(config, model, variables, estate)
    trainer.resume_checkpoint(model_file)
    return LoadedRun(
        config=config, model=model, dataset=ds,
        train_loader=train_loader, valid_loader=valid_loader,
        test_loader=test_loader, variables=trainer.variables,
        estate=trainer.estate, trainer=trainer,
    )
