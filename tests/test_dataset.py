"""Data pipeline tests (fixture-driven, like the reference's tests/data)."""

import os

import numpy as np
import pytest

from oovrec_tpu.config import Config
from oovrec_tpu.data.dataset import Dataset, _calcu_split_ids
from oovrec_tpu.data.inductive_dataset import InductiveDataset

ASSETS = os.path.join(os.path.dirname(__file__), "assets")


def toy_config(**over):
    d = {
        "model": "BPR",
        "dataset": "toy",
        "data_path": ASSETS,
        "load_col": {"inter": ["user_id", "item_id", "rating", "timestamp"]},
        "eval_args": {
            "split": {"RS": [0.8, 0.1, 0.1]},
            "order": "TO",
            "group_by": "user",
            "mode": "full",
        },
    }
    d.update(over)
    return Config(config_dict=d)


def toyind_config(**over):
    d = {
        "model": "BPR",
        "dataset": "toy-ind",
        "data_path": ASSETS,
        "load_col": {
            "inter": ["user_id", "item_id", "rating", "timestamp", "is_new"],
            "user": ["user_id", "age", "gender"],
            "item": ["item_id", "price", "category"],
        },
        "eval_args": {
            "split": {"RS": [0.8, 0.1, 0.1]},
            "order": "TO",
            "group_by": "user",
            "mode": "full",
        },
    }
    d.update(over)
    return Config(config_dict=d)


def indind_config(**over):
    d = toyind_config(**over).as_dict()
    d["dataset"] = "toy-ind_ind"
    d["benchmark_filename"] = ["train", "empty", "test_filt"]
    d["load_col"] = {
        "inter": ["user_id", "item_id", "rating", "timestamp"],
        "user": ["user_id", "age", "gender"],
        "item": ["item_id", "price", "category"],
    }
    return Config(config_dict=d)


def test_basic_load_and_remap():
    ds = Dataset(toy_config())
    # 5 users + PAD, 8 items + PAD
    assert ds.user_num == 6
    assert ds.item_num == 9
    assert len(ds) == 21
    # remap order = first appearance in the inter file; PAD=0
    assert ds.field2token_id["user_id"]["[PAD]"] == 0
    assert ds.field2token_id["user_id"]["u1"] == 1
    assert ds.field2token_id["item_id"]["i1"] == 1
    assert ds.field2token_id["item_id"]["i5"] == 5
    assert list(ds.field2id_token["user_id"][:3]) == ["[PAD]", "u1", "u2"]


def test_split_by_ratio_grouped():
    ds = Dataset(toy_config())
    train, valid, test = ds.build()
    # 5 users: u1-u4 have 4 inters (3/0/1), u5 has 5 (4/0/1) per RS 0.8/0.1/0.1
    # reference rounding: cnt=[tot-sum, floor, floor] then 0<r*tot<1 bump
    assert len(train) + len(valid) + len(test) == 21
    assert _calcu_split_ids(4, [0.8, 0.1, 0.1]) == [2, 3]
    assert _calcu_split_ids(5, [0.8, 0.1, 0.1]) == [3, 4]
    assert _calcu_split_ids(10, [0.8, 0.1, 0.1]) == [8, 9]
    assert len(valid) == 5 and len(test) == 5  # one per user each


def test_to_order_is_noop_in_transductive():
    """Fork quirk: TO ordering preserved as file order (`dataset.py:1791`)."""
    ds = Dataset(toy_config())
    train, _, _ = ds.build()
    u1_rows = train.inter["timestamp"][train.inter["user_id"] == 1]
    assert list(u1_rows) == sorted(u1_rows)  # file order is already temporal


def test_remove_new_samples_in_transductive():
    ds = Dataset(toyind_config())
    # the 3 is_new=1 rows are dropped
    assert len(ds) == 21
    # but u6/i9/i10 still got IDs (they're in the feature files)
    assert "u6" in ds.field2token_id["user_id"]
    assert "i9" in ds.field2token_id["item_id"]
    assert ds.user_num == 7  # PAD + u1..u6
    assert ds.item_num == 11  # PAD + i1..i10


def test_user_item_feature_tables_dense():
    ds = Dataset(toyind_config())
    uf = ds.get_user_feature()
    itf = ds.get_item_feature()
    assert uf["user_id"].shape == (7,)
    assert uf["age"].shape == (7,)
    # PAD row 0 gets mean-imputed age
    assert uf["age"][0] == pytest.approx(np.mean([20, 21, 22, 23, 24, 25]))
    assert uf["age"][1] == 20.0  # u1
    assert itf["price"][1] == 1.0  # i1
    # token feature remapped: first appearance order M,F -> 1,2
    assert uf["gender"][1] == 1 and uf["gender"][2] == 2


def test_inductive_dataset_keeps_new_and_remaps_vocab():
    orig = Dataset(toyind_config())
    ind = InductiveDataset(indind_config())
    ind.set_orig_dataset(orig)
    train, empty, test = ind.build()
    assert len(train) == 21 and len(empty) == 0 and len(test) == 6
    # old entities occupy the same low IDs as in training (first-appearance
    # order of the 'train' benchmark file == original inter file order)
    for tok in ["u1", "u2", "u3", "u4", "u5"]:
        assert ind.field2token_id["user_id"][tok] == orig.field2token_id["user_id"][tok]
    # new users get IDs >= n_old (u6 was in orig's user file so it has an
    # orig id too; u7 is brand new in the _ind corpus)
    assert ind.field2token_id["user_id"]["u7"] >= 6
    # feature vocab reconciliation: gender/category ids match training
    uf_ind = ind.get_user_feature()
    uf_orig = orig.get_user_feature()
    n_shared = len(uf_orig["gender"])
    np.testing.assert_array_equal(
        uf_ind["gender"][1:n_shared], uf_orig["gender"][1:n_shared]
    )
    # float repair: shared rows bit-identical
    np.testing.assert_array_equal(
        uf_ind["age"][1:n_shared], uf_orig["age"][1:n_shared]
    )


def test_inductive_pad_row_repair():
    """PAD-row float means differ between corpora; shared non-PAD rows must
    still be identical after remap_features."""
    orig = Dataset(toyind_config())
    ind = InductiveDataset(indind_config())
    ind.set_orig_dataset(orig)
    ind.build()
    itf_ind = ind.get_item_feature()
    itf_orig = orig.get_item_feature()
    n = len(itf_orig["price"])
    np.testing.assert_array_equal(itf_ind["price"][1:n], itf_orig["price"][1:n])


def test_kcore_filtering():
    c = toy_config(user_inter_num_interval="[5,inf)")
    ds = Dataset(c)
    # only u5 has 5 interactions
    assert ds.user_num == 2  # PAD + u5
    assert len(ds) == 5


def test_val_interval_filtering():
    c = toy_config(val_interval={"rating": "[4,inf)"})
    ds = Dataset(c)
    assert all(r >= 4 for r in ds.inter_feat["rating"].values)


def test_rm_dup_inter():
    c = toy_config(rm_dup_inter="first")
    ds = Dataset(c)
    assert len(ds) == 21  # no dups in fixture


def test_used_ids_per_user():
    ds = Dataset(toy_config())
    train, _, _ = ds.build()
    used = train.used_ids_per_user()
    assert len(used) == ds.user_num
    u1 = ds.field2token_id["user_id"]["u1"]
    # u1 has 4 inters; RS [0.8,0.1,0.1] with reference rounding → 2/1/1
    assert len(used[u1]) == 2


def test_get_preload_weight():
    """additional_feat_suffix + preload_weight (reference dataset.py
    get_preload_weight): vectors aligned to the item vocabulary."""
    from oovrec_tpu.config.configurator import Config
    from oovrec_tpu.data.dataset import Dataset

    c = Config(config_dict={
        "model": "GRU4Rec", "dataset": "toy",
        "data_path": os.path.join(os.path.dirname(__file__), "assets"),
        "load_col": {"inter": ["user_id", "item_id", "rating", "timestamp"]},
        "additional_feat_suffix": ["ent"],
        "preload_weight": {"ent_id": "ent_vec"},
    })
    ds = Dataset(c)
    w = ds.get_preload_weight("ent_id")
    assert w.shape == (ds.item_num, 8)
    # pad row is zeros; real items carry their file vectors
    assert np.all(w[0] == 0)
    i3 = ds.field2token_id["item_id"]["i3"]
    assert abs(w[i3, 0] - 0.3) < 1e-6


def test_kg_seq_dataset():
    """KGSeqDataset (reference kg_seq_dataset.py): sequential augmentation
    over an entity-aligned KG corpus."""
    from oovrec_tpu.config.configurator import Config
    from oovrec_tpu.data.kg_seq_dataset import KGSeqDataset

    c = Config(config_dict={
        "model": "KSR", "dataset": "toy-kg",
        "data_path": os.path.join(os.path.dirname(__file__), "assets"),
        "load_col": {"inter": ["user_id", "item_id", "rating", "timestamp"],
                     "kg": ["head_id", "relation_id", "tail_id"],
                     "link": ["item_id", "entity_id"]},
        "MAX_ITEM_LIST_LENGTH": 4,
    })
    ds = KGSeqDataset(c)
    assert ds.entity_num >= ds.item_num           # kg side loaded
    aug = ds.data_augmentation()                  # seq side active
    assert "item_id_list" in aug
    h, r, t = ds.kg_triples
    assert len(h) == len(r) == len(t) > 0


def test_decisiontree_tabularize():
    from oovrec_tpu.config.configurator import Config
    from oovrec_tpu.data.decisiontree import (
        DecisionTreeDataset,
        tabularize_split,
    )

    c = Config(config_dict={
        "model": "BPR", "dataset": "toy",
        "data_path": os.path.join(os.path.dirname(__file__), "assets"),
        "load_col": {"inter": ["user_id", "item_id", "rating", "timestamp"]},
    })
    ds = DecisionTreeDataset(c)
    X, y, names = ds.tabularize()
    assert X.shape == (21, 4) and "user_id" in names
    X2, _, _ = tabularize_split(ds.build()[0])
    assert X2.shape[1] == 4 and 0 < X2.shape[0] < 21


def test_decisiontree_trainer_gated():
    """DecisionTreeTrainer end-to-end when the optional wheel exists;
    clean ImportError otherwise (environment ships no boosters)."""
    pytest.importorskip("xgboost")
    from oovrec_tpu.config.configurator import Config
    from oovrec_tpu.data.decisiontree import DecisionTreeDataset
    from oovrec_tpu.models.exlib.decision_tree import XGBoostModel
    from oovrec_tpu.train.decision_tree_trainer import DecisionTreeTrainer

    c = Config(config_dict={
        "model": "BPR", "dataset": "toy",
        "data_path": os.path.join(os.path.dirname(__file__), "assets"),
        "load_col": {"inter": ["user_id", "item_id", "rating", "timestamp"]},
        "metrics": ["AUC", "LogLoss"], "metric_decimal_place": 4,
    })
    ds = DecisionTreeDataset(c)
    tr, va, te = ds.build()
    model = XGBoostModel(c, fields=["user_id", "item_id"], label_field="label")
    t = DecisionTreeTrainer(c, model)
    t.fit(tr, va)
    res = t.evaluate(te)
    assert "auc" in res


def test_native_reader_parity_with_pandas():
    """The C++ atomic reader must produce the same frame content as the
    pandas path (token columns as Categoricals in pd.factorize order)."""
    import pandas as pd

    from oovrec_tpu.data import native_reader
    from oovrec_tpu.data.atomic import load_atomic_file

    if not native_reader.native_available():
        import pytest as _pytest

        _pytest.skip("no C++ toolchain")
    path = os.path.join(ASSETS, "toy", "toy.inter")
    df_n, t_n = load_atomic_file(path)  # native path (scalar columns)
    assert isinstance(df_n["user_id"].dtype, pd.CategoricalDtype)
    # force the pandas path by reading via read_csv semantics
    import oovrec_tpu.data.atomic as atomic_mod

    orig = native_reader.read_atomic_native
    try:
        native_reader.read_atomic_native = lambda *a, **k: None
        import importlib

        df_p, t_p = load_atomic_file(path)
    finally:
        native_reader.read_atomic_native = orig
    assert t_n == t_p
    assert len(df_n) == len(df_p)
    for col in df_p.columns:
        a = df_n[col].astype(str) if col in ("user_id", "item_id") \
            else df_n[col]
        b = df_p[col].astype(str) if col in ("user_id", "item_id") \
            else df_p[col]
        assert (np.asarray(a) == np.asarray(b)).all() or np.allclose(
            np.asarray(a, float), np.asarray(b, float), equal_nan=True
        ), col
    # factorize-order categories
    cats = list(df_n["user_id"].cat.categories)
    seen = list(dict.fromkeys(df_p["user_id"].astype(str)))
    assert cats == seen
