"""Sequence-transform semantics (mirrors `ref:tests/data/test_transform.py`).

Each transform is checked against the invariants the reference test file
asserts: full-mask tokens for mask_itemseq at mask_ratio=1, right-alignment
for inverse_itemseq, zero-tail + contiguous-window for crop_itemseq, and
window-multiset preservation for reorder_itemseq; plus the user hook, which
the reference ships as an empty stub but we make usable.
"""

import numpy as np
import pytest

from oovrec_tpu.data.transform import construct_transform


def _cfg(transform, **extra):
    cfg = {
        "transform": transform,
        "ITEM_ID_FIELD": "item_id",
        "LIST_SUFFIX": "_list",
        "ITEM_LIST_LENGTH_FIELD": "item_length",
        "MAX_ITEM_LIST_LENGTH": 8,
        "seed": 2020,
    }
    cfg.update(extra)
    return cfg


def _batch():
    seq = np.array(
        [
            [1, 2, 3, 0, 0, 0, 0, 0],
            [4, 5, 6, 7, 8, 0, 0, 0],
            [2, 0, 0, 0, 0, 0, 0, 0],
            [7, 6, 5, 4, 3, 2, 1, 8],
        ],
        np.int64,
    )
    lengths = np.array([3, 5, 1, 8], np.int64)
    return {"item_id_list": seq, "item_length": lengths}


def test_inverse_itemseq_right_aligns():
    t = construct_transform(_cfg("inverse_itemseq"))
    out = t(_batch())
    inv = out["Inverse_item_id_list"]
    # ref transform.py:195-222: [1,2,3,0,0] -> [0,0,1,2,3]
    np.testing.assert_array_equal(inv[0], [0, 0, 0, 0, 0, 1, 2, 3])
    np.testing.assert_array_equal(inv[1], [0, 0, 0, 4, 5, 6, 7, 8])
    np.testing.assert_array_equal(inv[2], [0, 0, 0, 0, 0, 0, 0, 2])
    np.testing.assert_array_equal(inv[3], [7, 6, 5, 4, 3, 2, 1, 8])
    # original fields untouched
    np.testing.assert_array_equal(out["item_id_list"], _batch()["item_id_list"])


@pytest.mark.parametrize("eta", [0.6, 0.3, 1.0])
def test_crop_itemseq_invariants(eta):
    t = construct_transform(_cfg("crop_itemseq", eta=eta))
    batch = _batch()
    out = t(batch)
    crop = out["Crop_item_id_list"]
    crop_len = out["Crop_item_id_listitem_length"]
    seq, n = batch["item_id_list"], batch["item_length"]
    for b in range(len(n)):
        cl = int(np.floor(int(n[b]) * eta))
        assert crop_len[b] == cl
        # zero tail beyond crop_len (the reference's assertion)
        assert (crop[b, cl:] == 0).all()
        # the kept window is a contiguous subsequence of the original
        if cl > 0:
            window = crop[b, :cl]
            found = any(
                (seq[b, s : s + cl] == window).all()
                for s in range(int(n[b]) - cl + 1)
            )
            assert found, (b, window, seq[b])


def test_crop_begin_covers_full_range():
    # begin must be uniform over [0, n-crop_len] INCLUSIVE (randint semantics)
    t = construct_transform(_cfg("crop_itemseq", eta=0.5))
    seq = np.tile(np.arange(1, 9, dtype=np.int64), (512, 1))
    n = np.full(512, 8, np.int64)
    out = t({"item_id_list": seq, "item_length": n})
    starts = out["Crop_item_id_list"][:, 0]  # first kept item = begin+1
    assert set(np.unique(starts)) == {1, 2, 3, 4, 5}  # begins 0..4 all hit


def test_reorder_itemseq_window_permutation():
    beta = 0.9
    t = construct_transform(_cfg("reorder_itemseq", beta=beta))
    batch = _batch()
    out = t(batch)
    re = out["Reorder_item_id_list"]
    seq, n = batch["item_id_list"], batch["item_length"]
    changed = False
    for b in range(len(n)):
        # global multiset preserved; positions outside [begin, begin+rlen)
        # unchanged — detectable as: sorted rows equal
        np.testing.assert_array_equal(np.sort(re[b]), np.sort(seq[b]))
        # padding untouched
        assert (re[b, int(n[b]) :] == 0).all()
        changed |= (re[b] != seq[b]).any()
    assert changed  # ref test: (reorder != item_seq).any()


def test_reorder_only_window_moves():
    # beta small enough that exactly a 2-slot window may shuffle; everything
    # outside any length-2 window must be explainable as one window swap
    t = construct_transform(_cfg("reorder_itemseq", beta=0.25))
    seq = np.tile(np.arange(1, 9, dtype=np.int64), (256, 1))
    n = np.full(256, 8, np.int64)
    out = t({"item_id_list": seq, "item_length": n})
    re = out["Reorder_item_id_list"]
    for b in range(256):
        diff = np.nonzero(re[b] != seq[b])[0]
        if len(diff):  # rlen=2: a single adjacent swap
            assert len(diff) == 2 and diff[1] == diff[0] + 1
            assert re[b, diff[0]] == seq[b, diff[1]]
            assert re[b, diff[1]] == seq[b, diff[0]]


def test_mask_itemseq_full_ratio_masks_every_valid_position():
    t = construct_transform(_cfg("mask_itemseq", mask_ratio=1.0), n_items=9)
    batch = _batch()
    out = t(batch)
    seq, n = _batch()["item_id_list"], batch["item_length"]
    masked = out["item_id_list"]
    for b in range(len(n)):
        # ref test_mask_itemseq: with ratio 1.0 all valid slots become the
        # mask token (= n_items) and padding stays 0
        assert (masked[b, : int(n[b])] == 9).all()
        assert (masked[b, int(n[b]) :] == 0).all()
    assert (out["mask_count"] == np.minimum(n, t.max_masked)).all()


def _double_items(batch):
    batch = dict(batch)
    batch["item_id_list"] = batch["item_id_list"] * 2
    return batch


def test_user_defined_transform_resolves_dotted_path():
    t = construct_transform(
        _cfg(
            "user_defined",
            user_defined_transform="tests.test_transform:_double_items",
        )
    )
    out = t(_batch())
    np.testing.assert_array_equal(
        out["item_id_list"], _batch()["item_id_list"] * 2
    )


def test_unknown_transform_raises():
    with pytest.raises(NotImplementedError):
        construct_transform(_cfg("bogus_transform"))


def test_shan_transform_path_invariance():
    """SHAN via `transform: inverse_itemseq` (the reference's configured
    path, `ref:config/model/SHAN.yaml`) must reproduce the in-model
    last-K indexing exactly — same seed, same metrics."""
    from oovrec_tpu.cli.quick_start import objective_function
    from tests.test_sequential import _cfg as seq_cfg

    base = objective_function(
        config_dict=seq_cfg("SHAN", epochs=1), saved=False
    )
    via_transform = objective_function(
        config_dict=seq_cfg("SHAN", epochs=1, transform="inverse_itemseq"),
        saved=False,
    )
    assert base["test_result"] == via_transform["test_result"]
