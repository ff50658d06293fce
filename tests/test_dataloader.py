"""Batcher tests: shapes, negative-sampling invariants, eval grouping."""

import numpy as np
import pytest

from oovrec_tpu.config import Config
from oovrec_tpu.data.dataset import Dataset
from oovrec_tpu.data.sampler import Sampler
from oovrec_tpu.data.utils import data_preparation, eval_mode_to_neg_args
from oovrec_tpu.utils.enums import InputType

from tests.test_dataset import toy_config, toyind_config


def _prep(cfg=None, **over):
    c = cfg or toy_config(**over)
    ds = Dataset(c)
    return c, ds, data_preparation(c, ds)


def test_train_batches_static_shapes_pairwise():
    c = toy_config(train_batch_size=8)
    c["MODEL_INPUT_TYPE"] = InputType.PAIRWISE
    ds = Dataset(c)
    train, valid, test = data_preparation(c, ds)
    shapes = None
    n_real = 0
    for b in train:
        cur = {k: v.shape for k, v in b.items()}
        assert shapes is None or cur == shapes
        shapes = cur
        assert "neg_item_id" in b
        n_real += int(b["weight"].sum())
    assert n_real == len(ds.build()[0]) * train.times


def test_negatives_avoid_used_ids():
    c = toy_config(train_batch_size=8)
    c["MODEL_INPUT_TYPE"] = InputType.PAIRWISE
    ds = Dataset(c)
    train_split = ds.build()[0]
    train, _, _ = data_preparation(c, ds)
    used = train.sampler.used_ids["train"]
    for b in train:
        w = b["weight"] > 0
        for u, neg in zip(b["user_id"][w], b["neg_item_id"][w]):
            assert neg not in used[u]
            assert neg != 0  # PAD never sampled


def test_pointwise_expansion_labels():
    c = toy_config(train_batch_size=9)
    c["MODEL_INPUT_TYPE"] = InputType.POINTWISE
    ds = Dataset(c)
    train, _, _ = data_preparation(c, ds)
    b = next(iter(train))
    # times = 2 → step 4, batch 8
    assert len(b["label"]) == 8
    n_pos = int(b["label"].sum())
    assert n_pos == 4 or n_pos == int(b["weight"].sum()) // 2


def test_full_sort_eval_batches():
    c, ds, (train, valid, test) = _prep(eval_batch_size=30)
    # users_per_batch = max(1, 30 // 9) = 3
    assert test.users_per_batch == 3
    total_users = 0
    for b in test:
        assert b["user_id"].shape == (3,)
        assert b["pos_items"].shape[0] == 3
        real = b["weight"] > 0
        total_users += int(real.sum())
        # positives belong to the test split; history disjoint from positives
        for i in np.where(real)[0]:
            p = b["pos_items"][i][: b["pos_len"][i]]
            h = b["hist_items"][i][: b["hist_len"][i]]
            assert len(np.intersect1d(p, h)) == 0
            assert (p > 0).all()
    assert total_users == 5  # all 5 users have test rows


def test_full_sort_history_is_train_plus_valid():
    c, ds, (train, valid, test) = _prep(eval_batch_size=1000)
    train_split, valid_split, _ = ds.build()
    b = next(iter(test))
    u = b["user_id"][0]
    expect = np.union1d(
        train_split.used_ids_per_user()[u], valid_split.used_ids_per_user()[u]
    )
    got = np.sort(b["hist_items"][0][: b["hist_len"][0]])
    np.testing.assert_array_equal(got, expect)


def test_uni_eval_mode_parsing():
    assert eval_mode_to_neg_args("uni250") == {
        "distribution": "uniform",
        "sample_num": 250,
    }
    assert eval_mode_to_neg_args("pop100") == {
        "distribution": "popularity",
        "sample_num": 100,
    }
    assert eval_mode_to_neg_args("full") is None
    with pytest.raises(NotImplementedError):
        eval_mode_to_neg_args("bogus")


def test_neg_sample_eval_batcher():
    c = toy_config(
        eval_batch_size=40,
        eval_args={
            "split": {"RS": [0.8, 0.1, 0.1]},
            "order": "TO",
            "group_by": "user",
            "mode": "uni3",
        },
    )
    ds = Dataset(c)
    train, valid, test = data_preparation(c, ds)
    # every user has 1 test row → 4 expanded rows per user; 40//4=10 ≥ 5 users
    b = next(iter(test))
    w = b["weight"] > 0
    assert int(w.sum()) == 5 * 4
    # positives first per user block, labels mark them
    assert b["label"][w].sum() == 5
    # row_user maps rows to batch slots
    assert set(b["row_user"][w]) == {0, 1, 2, 3, 4}
    # negatives in expanded rows never collide with that user's cumulative
    # used ids (train+valid+test)
    used = test.sampler.used_ids["test"]
    rows_w = np.where(w)[0]
    for r in rows_w:
        if b["label"][r] == 0:
            assert b["item_id"][r] not in used[b["user_id"][r]]


def test_sampler_cumulative_phases():
    c = toy_config()
    ds = Dataset(c)
    tr, va, te = ds.build()
    s = Sampler(["train", "valid", "test"], [tr, va, te], seed=1)
    for u in range(1, ds.user_num):
        a = s.used_ids["train"][u]
        b = s.used_ids["valid"][u]
        cdu = s.used_ids["test"][u]
        assert set(a) <= set(b) <= set(cdu)


def test_features_joined_into_batches():
    c = toyind_config(train_batch_size=8)
    c["MODEL_INPUT_TYPE"] = InputType.PAIRWISE
    ds = Dataset(c)
    train, _, _ = data_preparation(c, ds)
    b = next(iter(train))
    assert "age" in b and "gender" in b
    assert "price" in b and "category" in b
    assert "neg_price" in b and "neg_category" in b
    uf = ds.get_user_feature()
    w = b["weight"] > 0
    np.testing.assert_array_equal(b["age"][w], uf["age"][b["user_id"][w]])


def test_uni_eval_vectorized_matches_reference_loop():
    """The vectorized uniN batch assembly (NegSampleEvalBatcher.__iter__)
    must equal the per-user-loop oracle (_iter_reference) batch-for-batch
    — same expansion order, same per-user seeded candidates, same pads."""
    import numpy as np
    from oovrec_tpu.config import Config
    from oovrec_tpu.data.utils import create_dataset, data_preparation

    from tests.test_dataset import ASSETS

    cfg = Config(config_dict={
        "model": "BPR",
        "dataset": "toy",
        "data_path": ASSETS,
        "load_col": {"inter": ["user_id", "item_id", "rating", "timestamp"]},
        "eval_batch_size": 16,  # forces several row-budget groups
        "eval_args": {"split": {"RS": [0.8, 0.1, 0.1]}, "order": "TO",
                      "group_by": "user", "mode": "uni7"},
    })
    ds = create_dataset(cfg)
    _, valid_loader, test_loader = data_preparation(cfg, ds)
    for loader in (valid_loader, test_loader):
        fast = list(loader)
        loader._neg_cache = {}  # oracle draws fresh; cache must not leak
        slow = list(loader._iter_reference())
        assert len(fast) == len(slow) and len(fast) > 1
        for bf, bs in zip(fast, slow):
            assert set(bf) == set(bs)
            for k in bs:
                np.testing.assert_array_equal(
                    np.asarray(bf[k]), np.asarray(bs[k]), err_msg=k
                )
        # second pass hits the candidate cache — still identical
        again = list(loader)
        for bf, ba in zip(fast, again):
            for k in bf:
                np.testing.assert_array_equal(
                    np.asarray(bf[k]), np.asarray(ba[k]), err_msg=k
                )


def test_sampler_bitmap_membership_equals_searchsorted():
    """The O(1) packed-bitmap _is_used must agree with the sorted-key
    binary search on every (user, item) probe, including the cap
    fallback path."""
    import numpy as np
    from oovrec_tpu.config import Config
    from oovrec_tpu.data.utils import create_dataset, data_preparation

    from tests.test_dataset import ASSETS

    cfg = Config(config_dict={
        "model": "BPR", "dataset": "toy", "data_path": ASSETS,
        "load_col": {"inter": ["user_id", "item_id", "rating",
                               "timestamp"]},
        "eval_args": {"split": {"RS": [0.8, 0.1, 0.1]}, "order": "TO",
                      "group_by": "user", "mode": "full"},
    })
    ds = create_dataset(cfg)
    train_loader, _, _ = data_preparation(cfg, ds)
    s = train_loader.sampler
    rng = np.random.default_rng(0)
    users = rng.integers(0, s.user_num, 5000)
    items = rng.integers(0, s.item_num, 5000)
    for phase in s.phases:
        got = s._is_used(phase, users, items)
        # force the searchsorted fallback for the oracle
        s._bitmaps = {phase: None}
        want = s._is_used(phase, users, items)
        s._bitmaps = {}
        np.testing.assert_array_equal(got, want, err_msg=phase)
        assert want.any(), "oracle degenerate: no used pairs probed"
