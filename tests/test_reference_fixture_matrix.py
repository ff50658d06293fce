"""Differential data-pipeline tests ON THE REFERENCE'S OWN micro
fixtures (`RecBole/tests/data/<case>/`): the reference Dataset and ours
run the same config over the same atomic files; row counts and vocab
sizes must agree. Mirrors the upstream test matrix
(`tests/data/test_dataset.py`)."""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference/RecBole"
FIXDIR = os.path.join(REF, "tests", "data")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(FIXDIR), reason="reference checkout not mounted"
)


@pytest.fixture(scope="module")
def ref_env():
    sys.path.insert(0, os.path.dirname(__file__))
    from test_reference_parity import ref_metrics, ref_dataset_cls  # noqa

    # reuse the shim logic by invoking the fixtures' bodies directly
    import types

    for name in ("colorlog", "thop", "ray", "hyperopt", "texttable"):
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.modules["colorlog"].ColoredFormatter = object
    sys.modules["texttable"].Texttable = object
    class _SummaryWriter:  # must accept args: the reference caches this
        def __init__(self, *a, **k):  # symbol at import, and the capstone
            pass                      # test later constructs it

        def __getattr__(self, name):
            return lambda *a, **k: None

    tb = types.ModuleType("torch.utils.tensorboard")
    tb.SummaryWriter = _SummaryWriter
    sys.modules["torch.utils.tensorboard"] = tb
    for alias, typ in (("float", float), ("int", int), ("bool", bool)):
        if not hasattr(np, alias):
            setattr(np, alias, typ)
    np.float_ = np.float64
    np.complex_ = np.complex128
    np.unicode_ = np.str_
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import logging

    logging.disable(logging.CRITICAL)
    import warnings

    warnings.filterwarnings("ignore")
    from recbole.config import Config as RefConfig
    from recbole.data.dataset import Dataset as RefDataset

    return RefConfig, RefDataset


CASES = [
    ("filter_nan_user_or_item", {}),
    ("remove_duplication", {"rm_dup_inter": "first"}),
    ("remove_duplication", {"rm_dup_inter": "last"}),
    ("filter_by_field_value", {"val_interval": {"timestamp": "[4,inf)"}}),
    ("filter_by_field_value", {"val_interval": {"timestamp": "(-inf,4]"}}),
    ("filter_by_field_value", {"val_interval": {"rating": "[0,0]"}}),
    ("filter_by_field_value",
     {"val_interval": {"rating": "(-inf,4);(4,inf)"}}),
    ("filter_by_field_value",
     {"val_interval": {"timestamp": "[3,8]",
                       "rating": "(-inf,4);(4,inf)"}}),
    ("filter_inter_by_user_or_item",
     {"filter_inter_by_user_or_item": True}),
    ("filter_inter_by_user_or_item",
     {"filter_inter_by_user_or_item": False}),
    ("filter_by_inter_num", {"user_inter_num_interval": "[2,inf)"}),
    ("filter_by_inter_num", {"item_inter_num_interval": "[2,inf)"}),
    ("filter_by_inter_num", {"user_inter_num_interval": "[2,inf)",
                             "item_inter_num_interval": "[2,inf)"}),
    ("rm_dup_and_filter_value",
     {"rm_dup_inter": "first", "val_interval": {"rating": "[1,inf)"}}),
    # remap_id: the reference itself fails on this fixture under
    # pandas 2.x (empty token_seq cell reads as NaN) — covered by the
    # toy-fixture remap parity instead.
    ("set_label_by_threshold", {"threshold": {"rating": 4}}),
    ("rm_dup_and_filter_by_inter_num",
     {"rm_dup_inter": "first",
      "user_inter_num_interval": "[2,inf)",
      "item_inter_num_interval": "[2,inf)"}),
    ("filter_value_and_filter_inter_by_ui",
     {"val_interval": {"age": "(-inf,2]", "price": "(-inf,2);(2,inf)"},
      "filter_inter_by_user_or_item": True}),
    ("filter_value_and_inter_num",
     {"val_interval": {"rating": "(-inf,0]", "age": "(-inf,0]",
                       "price": "(-inf,0]"},
      "user_inter_num_interval": "[2,inf)",
      "item_inter_num_interval": "[2,inf)"}),
    ("filter_inter_by_ui_and_inter_num",
     {"filter_inter_by_user_or_item": True,
      "user_inter_num_interval": "[2,inf)",
      "item_inter_num_interval": "[2,inf)"}),
]


@pytest.mark.parametrize("case,extra", CASES)
def test_fixture_matrix(ref_env, case, extra):
    RefConfig, RefDataset = ref_env
    from oovrec_tpu.config.configurator import Config
    from oovrec_tpu.data.dataset import Dataset

    cfg = {"data_path": FIXDIR, "load_col": None, **extra}
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        rds = RefDataset(RefConfig(model="BPR", dataset=case,
                                   config_dict=dict(cfg)))
    ods = Dataset(Config(config_dict=dict(cfg, model="BPR", dataset=case)))
    assert len(rds.inter_feat) == len(ods.inter_feat), "inter rows differ"
    assert rds.user_num == ods.user_num
    assert rds.item_num == ods.item_num
    # token maps agree wherever both define the field
    for f in ("user_id", "item_id"):
        assert list(rds.field2id_token[f]) == list(ods.field2id_token[f])


def _build_kg_pair(ref_env, case, extra):
    RefConfig, _ = ref_env
    import warnings

    from recbole.data.dataset import KnowledgeBasedDataset as RefKG

    from oovrec_tpu.config.configurator import Config
    from oovrec_tpu.data.kg_dataset import KnowledgeBasedDataset

    cfg = {"data_path": FIXDIR, "load_col": None, **extra}
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        rds = RefKG(RefConfig(model="KGAT", dataset=case,
                              config_dict=dict(cfg)))
    ods = KnowledgeBasedDataset(
        Config(config_dict=dict(cfg, model="KGAT", dataset=case)))
    return rds, ods


KG_CASES = [
    ("kg_remap_id", {}),
    ("kg_reverse_r", {"kg_reverse_r": True}),
    ("kg_filter_by_triple_num", {"entity_kg_num_interval": "[2,inf)"}),
    ("kg_filter_by_triple_num", {"relation_kg_num_interval": "[2,inf)"}),
]


@pytest.mark.parametrize("case,extra", KG_CASES)
def test_kg_fixture_matrix(ref_env, case, extra):
    rds, ods = _build_kg_pair(ref_env, case, extra)
    assert len(rds.inter_feat) == len(ods.inter_feat)
    assert rds.user_num == ods.user_num
    assert rds.item_num == ods.item_num
    assert rds.entity_num == ods.entity_num
    assert rds.relation_num == ods.relation_num
    assert list(rds.field2id_token["relation_id"]) == list(
        ods.field2id_token["relation_id"])
    # triples agree as sets (row order may differ after filtering)
    rh = rds.kg_feat["head_id"].numpy() if hasattr(
        rds.kg_feat, "numpy") else rds.kg_feat["head_id"]
    ref_triples = sorted(zip(
        np.asarray(rds.kg_feat["head_id"]).tolist(),
        np.asarray(rds.kg_feat["relation_id"]).tolist(),
        np.asarray(rds.kg_feat["tail_id"]).tolist(),
    ))
    h, r, t = ods.kg_triples
    our_triples = sorted(zip(h.tolist(), r.tolist(), t.tolist()))
    assert ref_triples == our_triples


@pytest.mark.parametrize("extra", [
    {"normalize_all": True},
    {"normalize_field": ["rating"], "normalize_all": False},
])
def test_normalize_fixture(ref_env, extra):
    RefConfig, RefDataset = ref_env
    import warnings

    from oovrec_tpu.config.configurator import Config
    from oovrec_tpu.data.dataset import Dataset

    cfg = {"data_path": FIXDIR, "load_col": None, **extra}
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        rds = RefDataset(RefConfig(model="BPR", dataset="normalize",
                                   config_dict=dict(cfg)))
    ods = Dataset(Config(config_dict=dict(cfg, model="BPR",
                                          dataset="normalize")))
    for f in ("rating", "star"):
        np.testing.assert_allclose(
            np.asarray(ods.inter_feat[f], np.float64),
            np.asarray(rds.inter_feat[f], np.float64), rtol=1e-12,
        )


@pytest.mark.parametrize("split,order", [
    ({"RS": [0.8, 0.1, 0.1]}, "TO"),
    ({"RS": [0.8, 0.2, 0.0]}, "TO"),
    ({"RS": [0.8, 0.0, 0.2]}, "TO"),
    ({"RS": [0.88, 0.02, 0.1]}, "TO"),   # the paper's split ratios
    ({"LS": "valid_and_test"}, "TO"),
])
def test_build_split_fixture(ref_env, split, order):
    """Split building on the reference's build_dataset fixture: per-split
    (user, item) rows identical under deterministic TO ordering."""
    RefConfig, RefDataset = ref_env
    import warnings

    from oovrec_tpu.config.configurator import Config
    from oovrec_tpu.data.dataset import Dataset

    cfg = {"data_path": FIXDIR, "load_col": None,
           "eval_args": {"split": split, "order": order, "mode": "labeled",
                         "group_by": "user"}}
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        rds = RefDataset(RefConfig(model="BPR", dataset="build_dataset",
                                   config_dict=dict(cfg)))
        rsplits = rds.build()
    ods = Dataset(Config(config_dict=dict(cfg, model="BPR",
                                          dataset="build_dataset")))
    osplits = ods.build()
    for r, o in zip(rsplits, osplits):
        rr = list(zip(np.asarray(r.inter_feat["user_id"]).tolist(),
                      np.asarray(r.inter_feat["item_id"]).tolist()))
        oo = list(zip(o.inter["user_id"].tolist(),
                      o.inter["item_id"].tolist()))
        assert sorted(rr) == sorted(oo)


def test_full_sort_dataloader_parity(ref_env):
    """Full-sort eval loader contents on the reference's own fixture:
    per-user history and positive sets identical to the reference
    FullSortEvalDataLoader for valid and test phases."""
    RefConfig, _ = ref_env
    import warnings

    cfg = {
        "model": "BPR", "dataset": "general_full_dataloader",
        "data_path": FIXDIR, "load_col": None,
        "train_neg_sample_args": {"distribution": "uniform",
                                  "sample_num": 1},
        "eval_args": {"split": {"RS": [0.8, 0.1, 0.1]}, "order": "TO",
                      "mode": "full"},
        "train_batch_size": 6, "eval_batch_size": 100,
    }
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        from recbole.config import Config as RefConfig2
        from recbole.data.utils import create_dataset as ref_create
        from recbole.data.utils import data_preparation as ref_prep

        rcfg = RefConfig2(model="BPR", dataset="general_full_dataloader",
                          config_dict=dict(cfg))
        rds = ref_create(rcfg)
        _, rvalid, rtest = ref_prep(rcfg, rds)

    import jax

    from oovrec_tpu.config.configurator import Config
    from oovrec_tpu.data.utils import create_dataset, data_preparation

    oc = Config(config_dict=dict(cfg))
    ods = create_dataset(oc)
    _, ovalid, otest = data_preparation(oc, ods)

    def ref_maps(loader):
        hist, pos = {}, {}
        for user_df, history_index, positive_u, positive_i in loader:
            users = user_df["user_id"].numpy()
            hr, hc = history_index
            hr, hc = hr.numpy(), hc.numpy()
            pu, pi = positive_u.numpy(), positive_i.numpy()
            for j, u in enumerate(users):
                hist[int(u)] = set(hc[hr == j].tolist())
                pos[int(u)] = set(pi[pu == j].tolist())
        return hist, pos

    def our_maps(loader):
        hist, pos = {}, {}
        for b in loader:
            for j, u in enumerate(np.asarray(b["user_id"])):
                if b["weight"][j] == 0:
                    continue
                hl = int(b["hist_len"][j])
                pl = int(b["pos_len"][j])
                hist[int(u)] = set(
                    np.asarray(b["hist_items"][j][:hl]).tolist())
                pos[int(u)] = set(
                    np.asarray(b["pos_items"][j][:pl]).tolist())
        return hist, pos

    for rl, ol in ((rvalid, ovalid), (rtest, otest)):
        rh, rp = ref_maps(rl)
        oh, op = our_maps(ol)
        assert rp == op, "positive sets differ"
        assert rh == oh, "history sets differ"


def test_uni100_dataloader_structure_parity(ref_env):
    """uni100 (sampled-negative) eval loader STRUCTURE on the reference's
    fixture: same users, same positive sets, and 100 negatives per
    positive row (sampled ids differ — RNG streams are framework-local)."""
    RefConfig, _ = ref_env
    import warnings

    cfg = {
        "model": "BPR", "dataset": "general_uni100_dataloader",
        "data_path": FIXDIR, "load_col": None,
        "train_neg_sample_args": {"distribution": "uniform",
                                  "sample_num": 1},
        "eval_args": {"split": {"RS": [0.8, 0.1, 0.1]}, "order": "TO",
                      "mode": "uni100"},
        "train_batch_size": 6, "eval_batch_size": 101,
    }
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        from recbole.config import Config as RefConfig2
        from recbole.data.utils import create_dataset as ref_create
        from recbole.data.utils import data_preparation as ref_prep

        rcfg = RefConfig2(model="BPR",
                          dataset="general_uni100_dataloader",
                          config_dict=dict(cfg))
        _, rvalid, rtest = ref_prep(rcfg, ref_create(rcfg))

    from oovrec_tpu.config.configurator import Config
    from oovrec_tpu.data.utils import create_dataset, data_preparation

    oc = Config(config_dict=dict(cfg))
    _, ovalid, otest = data_preparation(oc, create_dataset(oc))

    def ref_struct(loader):
        pos, rows = {}, {}
        for user_df, row_idx, positive_u, positive_i in loader:
            users = user_df["user_id"].numpy()
            items = user_df["item_id"].numpy()
            pu, pi = positive_u.numpy(), positive_i.numpy()
            uniq = np.unique(users)
            for u in uniq:
                rows[int(u)] = rows.get(int(u), 0) + int(
                    (users == u).sum())
            # positive_u indexes the batch's unique-user order
            uorder = list(dict.fromkeys(users.tolist()))
            for j, i in zip(pu.tolist(), pi.tolist()):
                pos.setdefault(int(uorder[j]), set()).add(int(i))
        return pos, rows

    def our_struct(loader):
        pos, rows = {}, {}
        for b in loader:
            users = np.asarray(b["user_id"])
            w = np.asarray(b["weight"]) > 0
            lab = np.asarray(b["label"])
            for u in np.unique(users[w]):
                m = w & (users == u)
                rows[int(u)] = rows.get(int(u), 0) + int(m.sum())
                ppos = np.asarray(b["item_id"])[m & (lab > 0)]
                pos.setdefault(int(u), set()).update(
                    int(x) for x in ppos)
        return pos, rows

    for rl, ol in ((rvalid, ovalid), (rtest, otest)):
        rp, rr = ref_struct(rl)
        op, orows = our_struct(ol)
        assert rp == op, "positive sets differ"
        assert rr == orows, "per-user candidate row counts differ"
