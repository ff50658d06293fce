"""perform_inductive_eval — checkpoint → `_ind` corpus → 7-slice metrics.

Equivalent of `src/perform_hashing.py:37-170`:
  * rebuild the inductive corpus `<dataset>_ind` with benchmark files
    ['train','empty','test_filt'] and topk [3,5,10,20]
    (`perform_hashing.py:101-108`),
  * reconcile vocabularies to the training dataset and cross-check that
    shared-entity feature rows are identical (`:115-138`),
  * rebuild mapper/embedder state in mode='inductive' with the ORIGINAL
    user/item counts (`:141-149`), restore weights, run the
    InductiveEvaluator.
"""

from __future__ import annotations

import pickle
from typing import Dict, Optional

import numpy as np
from flax import serialization

from oovrec_tpu.config import Config
from oovrec_tpu.data.utils import create_dataset, data_preparation
from oovrec_tpu.eval.inductive import InductiveEvaluator
from oovrec_tpu.inductive.factory import (
    InductiveFeatureCache,
    build_embedder_state,
)
from oovrec_tpu.inductive.mapper import RandomOOVMapper
from oovrec_tpu.inductive.spec import InductiveSpec
from oovrec_tpu.utils.logging import init_logger


def create_ind_dataset(config: Config, orig_dataset):
    """Build `<dataset>_ind` (`create_ind_dataset`, `perform_hashing.py:37-83`)."""
    ind_cfg = Config(config_dict=config.as_dict())
    ind_cfg["dataset"] = config["dataset"] + "_ind"
    ind_cfg["benchmark_filename"] = ["train", "empty", "test_filt"]
    ind_cfg["topk"] = [3, 5, 10, 20]
    # the _ind corpus has no is_new column in its benchmark files
    lc = dict(ind_cfg["load_col"] or {})
    if "inter" in lc and "is_new" in (lc["inter"] or []):
        lc["inter"] = [c for c in lc["inter"] if c != "is_new"]
        ind_cfg["load_col"] = lc
    if config["oov_eval_batch_size"] and int(config["oov_eval_batch_size"]) > 0:
        ind_cfg["eval_batch_size"] = int(config["oov_eval_batch_size"])
    ind_dataset = create_dataset(ind_cfg, inductive=True)
    ind_dataset.set_orig_dataset(orig_dataset)
    return ind_cfg, ind_dataset


def check_feature_consistency(orig_dataset, ind_dataset) -> None:
    """Shared-entity feature rows must be bit-identical after
    reconciliation (`perform_hashing.py:115-138`)."""
    ind_dataset.remap_features()
    for getter in ("get_user_feature", "get_item_feature"):
        orig_f = getattr(orig_dataset, getter)()
        ind_f = getattr(ind_dataset, getter)()
        for field, ov in orig_f.items():
            if field.endswith("_len") or field not in ind_f:
                continue
            n = len(ov)
            iv = ind_f[field]
            if iv.ndim > 1 and ov.ndim > 1 and iv.shape[1] != ov.shape[1]:
                iv = iv[:, : ov.shape[1]]
            if not np.array_equal(np.asarray(iv)[1:n], np.asarray(ov)[1:]):
                raise AssertionError(
                    f"feature rows differ between train and inductive "
                    f"datasets for field [{field}]"
                )


def perform_inductive_eval(
    orig_dataset,
    checkpoint_path: str,
    oov_eval_batch_size: Optional[int] = None,
    variables=None,
    config: Optional[Config] = None,
) -> Dict[str, Dict[str, float]]:
    """Run the 7-slice inductive evaluation from a saved checkpoint
    (`perform_inductive_eval`, `perform_hashing.py:85-170`)."""
    from oovrec_tpu.cli.quick_start import build_model_and_state

    logger = init_logger()

    if orig_dataset is None:
        # standalone entry: restore everything from the checkpoint alone
        # (the reference's perform_hashing.py rebuilds via
        # load_data_and_model, `perform_hashing.py:95-100`)
        from oovrec_tpu.cli.quick_start import load_data_and_model

        loaded = load_data_and_model(checkpoint_path)
        orig_dataset = loaded.dataset
        if config is None:
            config = loaded.config

    with open(checkpoint_path, "rb") as f:
        ckpt = pickle.load(f)
    if config is None:
        config = Config(config_dict=ckpt["config"])
    if oov_eval_batch_size:
        config["oov_eval_batch_size"] = oov_eval_batch_size

    ind_cfg, ind_dataset = create_ind_dataset(config, orig_dataset)
    check_feature_consistency(orig_dataset, ind_dataset)

    train_loader, _, test_loader = data_preparation(ind_cfg, ind_dataset)

    n_old_users = orig_dataset.user_num
    n_old_items = orig_dataset.item_num

    spec = InductiveSpec.from_config(config)
    if not spec.active:
        spec = None

    # model with ORIGINAL table sizes; embedder state in inductive mode
    # (feature matrices over the _ind corpus; planes/keys from checkpoint).
    # Context models need every feature column at init — take the template
    # from the _ind train loader, like quick_start.run does.
    n_train = len(train_loader.split)
    if n_train == 0:
        raise ValueError(
            f"the inductive corpus '{ind_cfg['dataset']}' produced an empty "
            "train split — cannot build a feature template for model init; "
            "check eval_args.split and the _ind benchmark files"
        )
    template = train_loader._make_batch(np.arange(min(2, n_train)))
    model, init_vars, estate = build_model_and_state(
        ind_cfg, ind_dataset, mode="inductive",
        n_entities=(n_old_users, n_old_items),
        template_batch=template,
        fields_from=orig_dataset,
    )
    params = serialization.from_bytes(init_vars["params"], ckpt["params"])
    variables = {"params": params}
    # non-param collections (e.g. DCNv2's BatchNorm batch_stats) ride the
    # checkpoint's extra_vars; the rebuilt model needs them at eval time
    extra_t = {k: v for k, v in init_vars.items() if k != "params"}
    if extra_t:
        if ckpt.get("extra_vars"):
            variables.update(
                serialization.from_bytes(extra_t, ckpt["extra_vars"])
            )
        else:
            variables.update(extra_t)
    ckpt_estate = ckpt.get("estate", {})
    for k in ("user_planes", "item_planes", "dhe_keys"):
        if k in ckpt_estate:
            estate[k] = ckpt_estate[k]

    mapper = None
    if spec is not None and spec.mapper is not None:
        mapper = RandomOOVMapper(
            spec, n_old_users, n_old_items,
            ind_dataset.user_num, ind_dataset.item_num,
        )
        mapper.set_eval()

    evaluator = InductiveEvaluator(
        model, ind_cfg, n_old_users, n_old_items,
        estate=estate, mapper=mapper,
    )
    results = evaluator.evaluate_model(variables, test_loader)
    for s, r in results.items():
        logger.info(f"[{s}] {dict(r)}")
    if any(results.get(s) for s in ("old_new", "new_old")):
        logger.info(
            "note: old_new/new_old use the intended complementary-mask "
            "semantics (see eval/inductive.py docstring) and are NOT "
            "numerically comparable with reference-produced numbers for "
            "those two slices"
        )
    return results
