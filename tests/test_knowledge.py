"""Knowledge-graph stack: dataset remap + CKE/CFKG end-to-end."""

import numpy as np
import pytest

from oovrec_tpu.cli.quick_start import objective_function
from oovrec_tpu.config import Config
from oovrec_tpu.data.kg_dataset import KnowledgeBasedDataset

from tests.test_dataset import ASSETS


def _cfg(model="CKE", **over):
    d = {
        "model": model,
        "dataset": "toy-kg",
        "data_path": ASSETS,
        "load_col": {"inter": ["user_id", "item_id", "rating", "timestamp"]},
        "epochs": 2,
        "train_batch_size": 16,
        "eval_batch_size": 64,
        "embedding_size": 8,
        "kg_embedding_size": 8,
        "topk": [2, 5],
        "valid_metric": "MRR@2",
        "eval_args": {
            "split": {"RS": [0.8, 0.1, 0.1]},
            "order": "TO",
            "group_by": "user",
            "mode": "full",
        },
        "checkpoint_dir": "/tmp/oovrec_kg_ckpt",
    }
    d.update(over)
    return d


def test_kg_dataset_entity_alignment():
    c = Config(config_dict=_cfg())
    ds = KnowledgeBasedDataset(c)
    # linked entities share item ids: e1 ↔ i1
    i1 = ds.field2token_id["item_id"]["i1"]
    assert ds._entity2id["e1"] == i1
    # non-item entities get ids >= item_num
    assert ds._entity2id["e20"] >= ds.item_num
    assert ds.entity_num > ds.item_num
    # relations: PAD + 3 distinct + [UI-Relation]
    assert ds.relation_num == 5
    assert ds.field2id_token["relation_id"][-1] == "[UI-Relation]"
    heads, rels, tails = ds.kg_triples
    assert len(heads) == 8
    assert rels.min() >= 1 and rels.max() <= 3


@pytest.mark.parametrize("model", ["CKE", "CFKG"])
def test_kg_models_end_to_end(model):
    res = objective_function(config_dict=_cfg(model), saved=False)
    assert "recall@5" in res["test_result"]


def test_cfkg_transe_variant():
    res = objective_function(
        config_dict=_cfg("CFKG", loss_function="transe"), saved=False
    )
    assert "recall@5" in res["test_result"]
