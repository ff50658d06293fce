"""Dataset/dataloader factory glue (`recbole/data/utils.py:28-367` analog)."""

from __future__ import annotations

import re
from typing import Optional, Tuple

from oovrec_tpu.data.dataloader import (
    FullSortEvalBatcher,
    NegSampleEvalBatcher,
    TrainBatcher,
)
from oovrec_tpu.data.dataset import Dataset
from oovrec_tpu.data.inductive_dataset import InductiveDataset
from oovrec_tpu.data.sampler import Sampler
from oovrec_tpu.utils.enums import InputType


DATASET_CACHE_ARGS = (
    "dataset", "data_path", "load_col", "unload_col", "rm_dup_inter",
    "val_interval", "user_inter_num_interval", "item_inter_num_interval",
    "filter_inter_by_user_or_item", "threshold", "normalize_field",
    "normalize_all", "discretization", "numerical_features", "seed",
    "benchmark_filename", "MAX_ITEM_LIST_LENGTH",
)


def _dataset_cache_path(config):
    import hashlib
    import json as _json

    key = {k: config[k] for k in DATASET_CACHE_ARGS}
    digest = hashlib.sha1(
        _json.dumps(key, sort_keys=True, default=str).encode()
    ).hexdigest()[:16]
    d = config.get("checkpoint_dir", "saved")
    return f"{d}/{config['dataset']}-dataset-{digest}.pkl"


def create_dataset(config, inductive: bool = False, removal_setting=None):
    """Build the Dataset variant for the model type
    (`recbole/data/utils.py:28-55` analog). When `save_dataset` is on, the
    processed dataset round-trips through a pickle keyed on the dataset
    arguments (`data/utils.py:57-70` caching)."""
    if inductive:
        return InductiveDataset(config, removal_setting=removal_setting)
    import os
    import pickle

    cache_path = None
    if config.get("save_dataset"):
        cache_path = config.get("dataset_save_path") or _dataset_cache_path(config)
        if os.path.isfile(cache_path):
            with open(cache_path, "rb") as f:
                ds = pickle.load(f)
            ds.config = config
            return ds
    try:
        from oovrec_tpu.models import get_model_class
        from oovrec_tpu.utils.enums import ModelType

        mt = (
            get_model_class(config["model"]).model_type
            if config["model"]
            else None
        )
        if mt == ModelType.SEQUENTIAL:
            from oovrec_tpu.data.sequential import SequentialDataset

            if config["model"] in ("GRU4RecKG", "KSR"):
                # KG-enhanced sequential corpora (`kg_seq_dataset.py`);
                # fall back to the plain sequential pipeline when no
                # .kg/.link side files ship with the dataset
                try:
                    from oovrec_tpu.data.kg_seq_dataset import KGSeqDataset

                    return KGSeqDataset(config)
                except ValueError:
                    pass
            return SequentialDataset(config)
        if mt == ModelType.KNOWLEDGE:
            from oovrec_tpu.data.kg_dataset import KnowledgeBasedDataset

            return KnowledgeBasedDataset(config)
    except (ValueError, ImportError):
        pass
    ds = Dataset(config)
    if cache_path:
        import os as _os
        import pickle as _pickle

        _os.makedirs(_os.path.dirname(cache_path), exist_ok=True)
        with open(cache_path, "wb") as f:
            _pickle.dump(ds, f)
    return ds


def eval_mode_to_neg_args(mode: str) -> Optional[dict]:
    """'uni250' → {'distribution':'uniform','sample_num':250}; 'full'/'labeled' → None."""
    if mode in ("full", "labeled"):
        return None
    m = re.fullmatch(r"(uni|pop)(\d+)", mode)
    if not m:
        raise NotImplementedError(f"eval mode [{mode}] is not supported")
    dist = "uniform" if m.group(1) == "uni" else "popularity"
    return {"distribution": dist, "sample_num": int(m.group(2))}


def data_preparation(config, dataset) -> Tuple[TrainBatcher, object, object]:
    """Split + samplers + three batchers (train, valid, test).

    Mirrors `recbole/data/utils.py:144-208`: cumulative-phase sampler built
    over the three splits; valid/test loader type chosen from the per-phase
    eval mode ('full' → full-sort, 'uniN'/'popN' → sampled-negative eval).
    """
    built = dataset.build()
    train_split, valid_split, test_split = built[0], built[1], built[2]

    nsa = config["train_neg_sample_args"] or {"distribution": "none"}
    sampler = Sampler(
        ["train", "valid", "test"],
        [train_split, valid_split, test_split],
        distribution=nsa.get("distribution", "uniform")
        if nsa.get("distribution", "none") != "none"
        else "uniform",
        alpha=nsa.get("alpha", 1.0),
        seed=int(config["seed"] or 2020),
        repeatable=bool(config["repeatable"]),
    )

    input_type = config["MODEL_INPUT_TYPE"] or InputType.POINTWISE
    train_on_users = False
    try:
        from oovrec_tpu.models import get_model_class

        train_on_users = bool(
            getattr(get_model_class(config["model"]), "train_on_users", False)
        )
    except (ValueError, ImportError):
        pass
    from oovrec_tpu.data.kg_dataset import KnowledgeBasedDataset

    if isinstance(dataset, KnowledgeBasedDataset):
        from oovrec_tpu.data.dataloader import KGTrainBatcher
        from oovrec_tpu.data.sampler import KGSampler

        heads, rels, tails = dataset.kg_triples
        kg_sampler = KGSampler(
            heads, tails, dataset.entity_num,
            seed=int(config["seed"] or 2020),
        )
        train_loader = KGTrainBatcher(
            train_split, sampler, config, input_type, phase="train",
            kg_dataset=dataset, kg_sampler=kg_sampler,
        )
    elif train_on_users:
        from oovrec_tpu.data.dataloader import UserTrainBatcher

        train_loader = UserTrainBatcher(train_split, config)
    else:
        train_loader = TrainBatcher(
            train_split, sampler, config, input_type, phase="train"
        )

    def eval_loader(split, phase):
        from oovrec_tpu.data.sequential import (
            SeqDatasetSplit,
            SeqFullSortEvalBatcher,
        )

        mode = config["eval_args"]["mode"][
            "valid" if phase == "valid" else "test"
        ]
        neg_args = eval_mode_to_neg_args(mode)
        if isinstance(split, SeqDatasetSplit) and neg_args is None:
            return SeqFullSortEvalBatcher(split, config)
        if mode == "labeled":
            from oovrec_tpu.data.dataloader import PlainEvalBatcher

            return PlainEvalBatcher(split, config)
        if neg_args is None:
            return FullSortEvalBatcher(split, sampler, config, phase=phase)
        return NegSampleEvalBatcher(
            split, sampler, config, phase=phase, neg_sample_args=neg_args
        )

    valid_loader = eval_loader(valid_split, "valid") if len(valid_split) else None
    test_loader = eval_loader(test_split, "test") if len(test_split) else None
    return train_loader, valid_loader, test_loader
