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


def test_dien_presampled_negative_sequence():
    """`dien_neg_sampling: presampled` (DIENDataset semantics,
    `ref:customized_dataset.py:38-70`): one fixed uniform negative per
    interaction position, never colliding with the positive, windowed
    exactly like item_list; DIEN's auxiliary loss consumes the column
    and the run trains to finite metrics."""
    c = Config(config_dict=_cfg(
        model="DIEN", dien_neg_sampling="presampled", seed=5,
    ))
    ds = SequentialDataset(c)
    aug = ds.data_augmentation()
    neg_col = "neg_item_id" + ds.list_suffix
    assert neg_col in aug
    pos = aug["item_id" + ds.list_suffix]
    neg = aug[neg_col]
    lengths = aug[ds.item_list_length_field]
    assert neg.shape == pos.shape
    for r in range(len(lengths)):
        n_ = int(lengths[r])
        row_pos, row_neg = pos[r, :n_], neg[r, :n_]
        assert (row_neg != row_pos).all(), "negative collided with positive"
        assert (row_neg >= 1).all() and (row_neg < ds.item_num).all()
        assert (neg[r, n_:] == 0).all(), "padding must stay zero"
    # window alignment: the same (user, prefix) windows as item_list —
    # consecutive examples of one user share their overlapping prefix
    u1 = ds.field2token_id["user_id"]["u1"]
    rows = np.where(aug["user_id"] == u1)[0]
    r0, r1 = rows[0], rows[1]
    np.testing.assert_array_equal(neg[r1, :1], neg[r0, :1])

    res = objective_function(config_dict=_cfg(
        model="DIEN", dien_neg_sampling="presampled", seed=5,
        mlp_hidden_size=[8], att_hidden=[8], alpha=0.5,
        train_neg_sample_args={"distribution": "uniform", "sample_num": 1},
    ), saved=False)
    for v in res["test_result"].values():
        assert np.isfinite(float(v))
