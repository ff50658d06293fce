"""Sequential family: augmentation semantics + GRU4Rec/SASRec end-to-end."""

import numpy as np
import pytest

from oovrec_tpu.cli.quick_start import objective_function
from oovrec_tpu.config import Config
from oovrec_tpu.data.sequential import SequentialDataset

from tests.test_dataset import ASSETS


def _cfg(model="GRU4Rec", **over):
    d = {
        "model": model,
        "dataset": "toy",
        "data_path": ASSETS,
        "load_col": {"inter": ["user_id", "item_id", "rating", "timestamp"]},
        "epochs": 2,
        "train_batch_size": 16,
        "eval_batch_size": 64,
        "embedding_size": 8,
        "hidden_size": 8,
        "inner_size": 16,
        "MAX_ITEM_LIST_LENGTH": 4,
        "topk": [2, 5],
        "valid_metric": "MRR@2",
        "train_neg_sample_args": {"distribution": "none"},
        "eval_args": {
            "split": {"LS": "valid_and_test"},
            "order": "TO",
            "group_by": "user",
            "mode": "full",
        },
        "checkpoint_dir": "/tmp/oovrec_seq_ckpt",
    }
    d.update(over)
    return d


def test_augmentation_semantics():
    c = Config(config_dict=_cfg())
    ds = SequentialDataset(c)
    aug = ds.data_augmentation()
    # u1 has 4 interactions (i1,i2,i3,i4 in time order) → 3 examples
    u1 = ds.field2token_id["user_id"]["u1"]
    rows = np.where(aug["user_id"] == u1)[0]
    assert len(rows) == 3
    i = {t: ds.field2token_id["item_id"][t] for t in ("i1", "i2", "i3", "i4")}
    # first example: prefix <i1> → target i2
    r0 = rows[0]
    assert aug["item_id"][r0] == i["i2"]
    assert aug["item_length"][r0] == 1
    assert aug["item_id_list"][r0, 0] == i["i1"]
    # third example: prefix <i1,i2,i3> → target i4
    r2 = rows[2]
    assert aug["item_id"][r2] == i["i4"]
    assert aug["item_length"][r2] == 3
    np.testing.assert_array_equal(
        aug["item_id_list"][r2, :3], [i["i1"], i["i2"], i["i3"]]
    )


def test_window_truncation():
    c = Config(config_dict=_cfg(MAX_ITEM_LIST_LENGTH=2))
    ds = SequentialDataset(c)
    aug = ds.data_augmentation()
    assert aug["item_id_list"].shape[1] == 2
    assert aug["item_length"].max() <= 2


def test_splits_leave_one_out():
    c = Config(config_dict=_cfg())
    ds = SequentialDataset(c)
    train, valid, test = ds.build()
    # 5 users; u1-u4: 3 examples each, u5: 4 → valid/test get 1 per user
    assert len(valid) == 5 and len(test) == 5
    assert len(train) + len(valid) + len(test) == sum(
        len(np.where(ds.data_augmentation()["user_id"] == u)[0])
        for u in range(ds.user_num)
    )


@pytest.mark.parametrize("model", ["GRU4Rec", "SASRec"])
def test_sequential_end_to_end(model):
    res = objective_function(config_dict=_cfg(model), saved=False)
    assert "recall@5" in res["test_result"]
    for v in res["test_result"].values():
        assert 0.0 <= v <= 1.0
