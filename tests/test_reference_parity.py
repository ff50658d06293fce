"""Golden parity vs the ACTUAL reference implementation.

Imports the reference's metric classes (read-only, with its optional deps
stubbed) and asserts our per-user metric matrices and pooled values are
numerically identical on random inputs. This is the strongest possible
metric-parity evidence — the oracle IS the reference code.
"""

import sys
import types

import numpy as np
import pytest

import oovrec_tpu.eval.metrics as om

REF = "/root/reference/RecBole"


@pytest.fixture(scope="module")
def ref_metrics():
    for name in ("colorlog", "thop", "ray", "hyperopt", "texttable"):
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.modules["colorlog"].ColoredFormatter = object
    sys.modules["texttable"].Texttable = object
    class _SummaryWriter:
        def __init__(self, *a, **k):
            pass

        def __getattr__(self, name):  # add_scalar/add_hparams/… all no-op
            return lambda *a, **k: None

    tb = types.ModuleType("torch.utils.tensorboard")
    tb.SummaryWriter = _SummaryWriter
    sys.modules["torch.utils.tensorboard"] = tb
    if REF not in sys.path:
        sys.path.insert(0, REF)
    # the reference targets an older numpy that still had these aliases
    for alias, typ in (("float", float), ("int", int), ("bool", bool)):
        if not hasattr(np, alias):
            setattr(np, alias, typ)
    # optional native wheels the inductive modules import
    pl = types.ModuleType("pyLSHash")
    st = types.ModuleType("pyLSHash.storage")

    class _Store:
        def __init__(self, *a, **k):
            pass

    st.StorageBase = st.InMemoryStorage = st.RedisStorage = _Store
    pl.storage = st
    sys.modules.setdefault("pyLSHash", pl)
    sys.modules.setdefault("pyLSHash.storage", st)
    sys.modules.setdefault("scann", types.ModuleType("scann"))
    csip = types.ModuleType("csiphash")
    from oovrec_tpu.ops.siphash import siphash24_py

    csip.siphash24 = siphash24_py
    sys.modules.setdefault("csiphash", csip)
    from recbole.evaluator import metrics as rm

    return rm


def _rand_topk(rng, B=64, K=10):
    pos_index = rng.random((B, K)) < 0.3
    pos_len = rng.integers(1, 15, (B,))
    return pos_index.astype(bool), pos_len.astype(np.int64)


CASES = [
    ("Hit", "hit_", False),
    ("MRR", "mrr_", False),
    ("MAP", "map_", True),
    ("Recall", "recall_", True),
    ("NDCG", "ndcg_", True),
    ("Precision", "precision_", False),
]


@pytest.mark.parametrize("ref_name,ours,needs_len", CASES)
def test_topk_metric_matrix_parity(ref_metrics, ref_name, ours, needs_len):
    rng = np.random.default_rng(11)
    pos_index, pos_len = _rand_topk(rng)
    cls = getattr(ref_metrics, ref_name)
    obj = cls.__new__(cls)  # skip __init__ (wants a Config)
    expect = obj.metric_info(
        *( (pos_index, pos_len) if _ref_wants_len(cls) else (pos_index,) )
    )
    mine = getattr(om, ours)(
        pos_index, pos_len
    ) if True else None
    np.testing.assert_allclose(np.asarray(mine, np.float64),
                               np.asarray(expect, np.float64),
                               rtol=1e-10, atol=1e-12)


def _ref_wants_len(cls) -> bool:
    import inspect

    return len(inspect.signature(cls.metric_info).parameters) > 2


def test_auc_parity(ref_metrics):
    rng = np.random.default_rng(5)
    preds = rng.random(500)
    trues = (rng.random(500) < 0.4).astype(np.float64)
    cls = ref_metrics.AUC
    obj = cls.__new__(cls)
    obj.decimal_place = 10
    expect = obj.metric_info(preds, trues)
    mine = om.auc_(preds, trues)
    assert abs(mine - expect) < 1e-9


def test_gauc_parity(ref_metrics):
    rng = np.random.default_rng(9)
    B = 40
    user_len = rng.integers(5, 50, B).astype(np.float64)
    pos_len = np.minimum(rng.integers(1, 5, B), user_len - 1).astype(
        np.float64)
    # pos_rank_sum must be a feasible sum of pos_len ranks in [1, user_len]
    pos_rank_sum = np.array([
        np.sum(rng.choice(np.arange(1, int(u) + 1), int(p), replace=False))
        for u, p in zip(user_len, pos_len)
    ], dtype=np.float64).reshape(-1, 1)
    cls = ref_metrics.GAUC
    obj = cls.__new__(cls)
    expect = obj.metric_info(pos_rank_sum.squeeze(), user_len, pos_len)
    mine = om.gauc_(pos_rank_sum.squeeze(), user_len, pos_len)
    assert abs(mine - expect) < 1e-9


def test_distribution_metrics_parity(ref_metrics):
    rng = np.random.default_rng(21)
    num_items = 60
    item_matrix = rng.integers(1, num_items, (40, 10))
    counts = {int(i): int(c) for i, c in
              zip(*np.unique(rng.integers(1, num_items, 400),
                             return_counts=True))}

    # ItemCoverage
    cov = ref_metrics.ItemCoverage.__new__(ref_metrics.ItemCoverage)
    expect = cov.get_coverage(item_matrix, num_items)
    assert abs(om.item_coverage_(item_matrix, num_items) - expect) < 1e-12

    # GiniIndex
    gini = ref_metrics.GiniIndex.__new__(ref_metrics.GiniIndex)
    expect = gini.get_gini(item_matrix, num_items)
    assert abs(om.gini_index_(item_matrix, num_items) - expect) < 1e-12

    # ShannonEntropy
    ent = ref_metrics.ShannonEntropy.__new__(ref_metrics.ShannonEntropy)
    expect = ent.get_entropy(item_matrix)
    assert abs(om.shannon_entropy_(item_matrix) - expect) < 1e-12

    # AveragePopularity per-user matrix
    pop = ref_metrics.AveragePopularity.__new__(ref_metrics.AveragePopularity)
    expect = pop.metric_info(pop.get_pop(item_matrix, counts))
    dense = np.zeros(num_items)
    for i, c in counts.items():
        dense[i] = c
    mine = om.average_popularity_(item_matrix, dense)
    np.testing.assert_allclose(mine, expect, rtol=1e-12)

    # TailPercentage per-user matrix
    tp = ref_metrics.TailPercentage.__new__(ref_metrics.TailPercentage)
    tp.tail = 0.1
    expect = tp.metric_info(tp.get_tail(item_matrix, counts))
    # our dense variant treats missing items as count 0 — align by
    # restricting to items present in `counts`
    dense_tail = np.full(num_items, np.inf)
    for i, c in counts.items():
        dense_tail[i] = c
    mine = om.tail_percentage_(item_matrix, dense_tail, tail=0.1)
    np.testing.assert_allclose(mine, expect, rtol=1e-12)


def test_hash_family_parity(ref_metrics):
    """All four bucket hash functions vs the reference's actual
    RandomOOVInductiveMapper methods (incl. the byte-swapped splitmix64
    constants quirk, `random_mapper.py:98-100`)."""
    import torch
    from recbole.inductive.random_mapper import RandomOOVInductiveMapper

    from oovrec_tpu.inductive import hashes as oh

    m = RandomOOVInductiveMapper.__new__(RandomOOVInductiveMapper)
    rng = np.random.default_rng(0)
    ids = torch.tensor(rng.integers(0, 2**45, 2000, dtype=np.int64))
    assert (m._fast_int_hash(ids).numpy()
            == oh.fast_int_hash(ids.numpy())).all()
    assert (m._three_round_int_hash(ids).numpy()
            == oh.three_round_int_hash(ids.numpy())).all()
    for nb in (7, 200, 1024):
        assert (m._big_64bit_hash(ids, nb).numpy()
                == oh.big_64bit_hash(ids.numpy(), nb)).all()
    for fn in ("mod", "fast", "3round", "64bit"):
        m.hash_function = fn
        assert (m._hash_ids(ids, 321).numpy()
                == oh.hash_ids(ids.numpy(), 321, fn)).all()


@pytest.fixture(scope="module")
def ref_dataset_cls(ref_metrics):
    """Reference Config+Dataset, importable thanks to the same shims."""
    np.float_ = np.float64
    np.complex_ = np.complex128
    np.unicode_ = np.str_
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        for a, t in (("object", object), ("str", str), ("long", int),
                     ("unicode", str)):
            if not hasattr(np, a):
                setattr(np, a, t)
    import logging

    logging.disable(logging.CRITICAL)
    from recbole.config import Config as RefConfig
    from recbole.data.dataset import Dataset as RefDataset

    return RefConfig, RefDataset


def test_dataset_pipeline_parity(ref_dataset_cls):
    """Full data-pipeline parity on the toy fixture: identical token
    remaps and identical per-split row sets (TO order, RS [0.8,0.1,0.1],
    group_by user) vs the ACTUAL reference Dataset."""
    RefConfig, RefDataset = ref_dataset_cls
    import os
    import warnings

    from oovrec_tpu.config.configurator import Config
    from oovrec_tpu.data.dataset import Dataset

    common = {
        "data_path": os.path.join(os.path.dirname(__file__), "assets"),
        "load_col": {"inter": ["user_id", "item_id", "rating", "timestamp"]},
        "eval_args": {"split": {"RS": [0.8, 0.1, 0.1]}, "order": "TO",
                      "group_by": "user", "mode": "full"},
        "seed": 2020,
    }
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        rds = RefDataset(RefConfig(model="BPR", dataset="toy",
                                   config_dict=dict(common)))
        rsplits = rds.build()
    ods = Dataset(Config(config_dict=dict(common, model="BPR",
                                          dataset="toy")))
    osplits = ods.build()

    assert list(rds.field2id_token["user_id"]) == list(
        ods.field2id_token["user_id"])
    assert list(rds.field2id_token["item_id"]) == list(
        ods.field2id_token["item_id"])
    for r, o in zip(rsplits, osplits):
        rr = sorted(zip(r.inter_feat["user_id"].numpy().tolist(),
                        r.inter_feat["item_id"].numpy().tolist()))
        oo = sorted(zip(o.inter[o.uid_field].tolist(),
                        o.inter[o.iid_field].tolist()))
        assert rr == oo


def test_sequential_augmentation_parity(ref_dataset_cls):
    """Row-exact augmentation + leave-one-out parity vs the reference
    SequentialDataset (prefix windows, targets, lengths)."""
    RefConfig, _ = ref_dataset_cls
    import os
    import warnings

    from recbole.data.dataset import SequentialDataset as RefSeq

    from oovrec_tpu.config.configurator import Config
    from oovrec_tpu.data.sequential import SequentialDataset

    common = {
        "data_path": os.path.join(os.path.dirname(__file__), "assets"),
        "load_col": {"inter": ["user_id", "item_id", "rating", "timestamp"]},
        "MAX_ITEM_LIST_LENGTH": 4,
        "train_neg_sample_args": None,
        "eval_args": {"split": {"LS": "valid_and_test"}, "order": "TO",
                      "group_by": "user", "mode": "full"},
        "seed": 2020,
    }
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        rds = RefSeq(RefConfig(model="GRU4Rec", dataset="toy",
                               config_dict=dict(common)))
        rsplits = rds.build()
    ods = SequentialDataset(
        Config(config_dict=dict(common, model="GRU4Rec", dataset="toy")))
    osplits = ods.build()

    def ref_rows(split):
        f = split.inter_feat
        return sorted(zip(
            f["user_id"].numpy().tolist(),
            [tuple(r) for r in f["item_id_list"].numpy().tolist()],
            f["item_id"].numpy().tolist(),
            f["item_length"].numpy().tolist(),
        ))

    def our_rows(s):
        return sorted(zip(
            s.inter["user_id"].tolist(),
            [tuple(r) for r in s.inter["item_id_list"].tolist()],
            s.inter["item_id"].tolist(),
            s.inter["item_length"].tolist(),
        ))

    for r, o in zip(rsplits, osplits):
        assert ref_rows(r) == our_rows(o)


def test_bpr_oov_routing_parity(ref_dataset_cls):
    """Crown-jewel parity: the reference's inductive BPR fork with OUR
    trained weights copied in produces IDENTICAL user/item embeddings for
    mixed in-vocab + new-entity ids (random mapper, 64bit hash, OOV
    buckets) — i.e. our branchless routing is the reference's
    zero-then-overwrite routing, checkpoint-compatibly."""
    RefConfig, RefDataset = ref_dataset_cls
    import os
    import warnings

    import jax
    import torch

    from oovrec_tpu.inductive.mapper import RandomOOVMapper
    from oovrec_tpu.inductive.spec import InductiveSpec
    from oovrec_tpu.models.bpr import BPR

    common = {
        "data_path": os.path.join(os.path.dirname(__file__), "assets"),
        "load_col": {"inter": ["user_id", "item_id", "rating", "timestamp"]},
        "embedding_size": 8,
        "add_oov_buckets": True,
        "user_oov_buckets": 13,
        "item_oov_buckets": 11,
        "oov_freeze_embedding": False,
        "seed": 2020,
    }
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        rcfg = RefConfig(model="BPR", dataset="toy",
                         config_dict=dict(common))
        rds = RefDataset(rcfg)
        from recbole.inductive.random_mapper import RandomOOVInductiveMapper
        from recbole.model.general_recommender.bpr import BPR as RefBPR

        n_u, n_i = rds.user_num, rds.item_num
        rmapper = RandomOOVInductiveMapper(
            np.zeros((n_u + 5, 1)), np.zeros((n_i + 7, 1)), n_u, n_i,
            13, 11, 8, torch.device("cpu"), 112062759511, "64bit",
        )
        rmapper.set_eval()
        rmodel = RefBPR(rcfg, rds, inductive_mapper=rmapper)
        rmodel.eval()

    spec = InductiveSpec(mapper="random", add_oov_buckets=True,
                         n_user_buckets=13, n_item_buckets=11,
                         embedding_size=8, hash_function="64bit")
    ours = BPR(n_users=n_u, n_items=n_i, embedding_size=8, spec=spec)
    B = 6
    tmpl = {
        "user_id": np.zeros(B, np.int32),
        "item_id": np.zeros(B, np.int32),
        "neg_item_id": np.zeros(B, np.int32),
        "weight": np.ones(B, np.float32),
    }
    for f in ("user_id", "item_id", "neg_item_id"):
        tmpl[f + "_oov"] = np.zeros(B, np.int32)
        tmpl[f + "_bucket"] = np.zeros(B, np.int32)
    vs = ours.init(jax.random.key(0), tmpl, {}, method=ours.calculate_loss)
    p = vs["params"]

    with torch.no_grad():
        rmodel.user_embedding.weight.copy_(torch.tensor(
            np.asarray(p["user_embedding"]["embedding"])))
        rmodel.item_embedding.weight.copy_(torch.tensor(
            np.asarray(p["item_embedding"]["embedding"])))
        rmodel.user_oov_buckets.weight.copy_(torch.tensor(
            np.asarray(p["user_oov_buckets"]["embedding"])))
        rmodel.item_oov_buckets.weight.copy_(torch.tensor(
            np.asarray(p["item_oov_buckets"]["embedding"])))

    # mixed ids: in-vocab and new (>= n)
    user_ids = np.array([1, 3, n_u + 2, n_u + 40, 2, n_u + 7], np.int64)
    item_ids = np.array([2, n_i + 1, 4, n_i + 33, n_i + 5, 1], np.int64)
    with torch.no_grad():
        ref_ue = rmodel.get_user_embedding(torch.tensor(user_ids)).numpy()
        ref_ie = rmodel.get_item_embedding(torch.tensor(item_ids)).numpy()

    mapper = RandomOOVMapper(spec, n_u, n_i)
    batch = {"user_id": user_ids.copy(), "item_id": item_ids.copy(),
             "neg_item_id": item_ids.copy()}
    mapper.annotate(batch, "user_id", "item_id")
    # our device path indexes the IV table with clipped ids
    b = {k: np.asarray(v) for k, v in batch.items()}
    b["user_id"] = np.minimum(b["user_id"], n_u - 1).astype(np.int32)
    b["item_id"] = np.minimum(b["item_id"], n_i - 1).astype(np.int32)
    our_ue = np.asarray(ours.apply(
        vs, jax.numpy.asarray(b["user_id"]), b, {}, method=ours.user_e))
    our_ie = np.asarray(ours.apply(
        vs, jax.numpy.asarray(b["item_id"]), b, {}, method=ours.item_e))
    np.testing.assert_allclose(our_ue, ref_ue, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(our_ie, ref_ie, rtol=1e-6, atol=1e-7)


def test_lsh_embedder_parity(ref_metrics):
    """LSH bucket-mean embeddings vs the reference LSHInductiveEmbedder
    with identical hyperplanes / feature matrices / bucket tables."""
    import torch

    from recbole.inductive.lsh_embedder import LSHInductiveEmbedder
    from recbole.inductive.torch_hash import TorchLSHash

    import jax.numpy as jnp
    from oovrec_tpu.inductive.routing import oov_embedding
    from oovrec_tpu.inductive.spec import InductiveSpec

    rng = np.random.default_rng(33)
    N, F, BITS, D = 30, 6, 13, 8
    feats = rng.standard_normal((N, F)).astype(np.float32)
    planes = rng.standard_normal((BITS, F)).astype(np.float32)
    buckets = rng.standard_normal((BITS, D)).astype(np.float32)

    import torch.nn as _nn

    ref = LSHInductiveEmbedder.__new__(LSHInductiveEmbedder)
    if isinstance(ref, _nn.Module):
        _nn.Module.__init__(ref)
    ref.training = False
    ref.device = torch.device("cpu")
    ref.prime_pad = 112062759511
    ref.user_feature_mat = torch.tensor(feats)
    lsh = TorchLSHash.__new__(TorchLSHash)
    import torch.nn as nn

    nn.Module.__init__(lsh)

    lsh.uniform_planes = nn.ParameterList(
        [nn.Parameter(torch.tensor(planes))])
    ref.user_lsh = lsh

    class FakeModel:
        user_oov_buckets = nn.Embedding.from_pretrained(
            torch.tensor(buckets))

    ids = np.array([0, 3, 7, 29, 15], np.int64)
    with torch.no_grad():
        expect = ref.embed_user_ids(torch.tensor(ids), FakeModel()).numpy()

    spec = InductiveSpec(embedder="lsh", embedding_size=D)
    estate = {"user_feat_mat": jnp.asarray(feats),
              "user_planes": jnp.asarray(planes)}
    mine = np.asarray(oov_embedding(
        spec, "user", jnp.asarray(ids.astype(np.int32)), None,
        jnp.zeros((5, D), jnp.float32), jnp.asarray(buckets), estate,
    ))
    np.testing.assert_allclose(mine, expect, rtol=1e-5, atol=1e-6)


def test_dhe_mlp_arch_parity(ref_metrics):
    """EmbedderMLP ≡ the reference's hash_net Sequential
    (`dh_embedder.py:70-78`: Linear(num_hashes,512)+GELU ×3 + Linear(512,D)
    + Sigmoid) — same weights → same outputs."""
    import jax
    import torch
    import torch.nn as nn

    from oovrec_tpu.models.base import EmbedderMLP

    H, L, D, B = 16, 32, 8, 5
    m = EmbedderMLP(layer_size=L, out_size=D)
    x = np.random.default_rng(2).standard_normal((B, H)).astype(np.float32)
    vs = m.init(jax.random.key(0), x)

    net = nn.Sequential(
        nn.Linear(H, L), nn.GELU(),
        nn.Linear(L, L), nn.GELU(),
        nn.Linear(L, L), nn.GELU(),
        nn.Linear(L, D), nn.Sigmoid(),
    )
    lin = [l for l in net if isinstance(l, nn.Linear)]
    with torch.no_grad():
        for i, l in enumerate(lin):
            p = vs["params"][f"Dense_{i}"]
            l.weight.copy_(torch.tensor(np.asarray(p["kernel"]).T))
            l.bias.copy_(torch.tensor(np.asarray(p["bias"])))
        expect = net(torch.tensor(x)).numpy()
    mine = np.asarray(m.apply(vs, x))
    np.testing.assert_allclose(mine, expect, rtol=2e-5, atol=2e-6)


def test_loss_parity(ref_metrics):
    """BPRLoss / EmbLoss (both modes) vs `recbole/model/loss.py`."""
    import torch

    from recbole.model.loss import BPRLoss, EmbLoss

    from oovrec_tpu.models import losses as ol

    rng = np.random.default_rng(4)
    pos = rng.standard_normal(64).astype(np.float32)
    neg = rng.standard_normal(64).astype(np.float32)
    expect = BPRLoss()(torch.tensor(pos), torch.tensor(neg)).item()
    assert abs(float(ol.bpr_loss(pos, neg)) - expect) < 1e-6

    e1 = rng.standard_normal((32, 8)).astype(np.float32)
    e2 = rng.standard_normal((32, 8)).astype(np.float32)
    el = EmbLoss()
    expect = el(torch.tensor(e1), torch.tensor(e2)).item()
    assert abs(float(ol.emb_loss(e1, e2)) - expect) < 1e-5
    expect = el(torch.tensor(e1), torch.tensor(e2),
                require_pow=True).item()
    assert abs(float(ol.emb_loss(e1, e2, require_pow=True)) - expect) < 1e-5


def test_slsh_embedder_parity(ref_metrics):
    """Single-LSH quirk ((2**bits).sum() % B bucket id) vs the reference
    SingleLSHInductiveEmbedder._hash_node."""
    import torch
    import torch.nn as nn

    from recbole.inductive.single_lsh_embedder import (
        SingleLSHInductiveEmbedder,
    )
    from recbole.inductive.torch_hash import TorchLSHash

    import jax.numpy as jnp
    from oovrec_tpu.inductive.routing import oov_embedding
    from oovrec_tpu.inductive.spec import InductiveSpec

    rng = np.random.default_rng(44)
    N, F, BITS, NB, D = 30, 6, 5, 7, 8
    feats = rng.standard_normal((N, F)).astype(np.float32)
    planes = rng.standard_normal((BITS, F)).astype(np.float32)
    buckets = rng.standard_normal((NB, D)).astype(np.float32)

    ref = SingleLSHInductiveEmbedder.__new__(SingleLSHInductiveEmbedder)
    if isinstance(ref, nn.Module):
        nn.Module.__init__(ref)
    ref.device = torch.device("cpu")
    lsh = TorchLSHash.__new__(TorchLSHash)
    nn.Module.__init__(lsh)
    lsh.uniform_planes = nn.ParameterList(
        [nn.Parameter(torch.tensor(planes))])
    ids = np.array([0, 3, 7, 29, 15], np.int64)
    with torch.no_grad():
        bucket_ids = ref._hash_node(
            torch.tensor(ids), lsh, torch.tensor(feats), NB
        ).numpy()
    expect = buckets[bucket_ids]

    spec = InductiveSpec(embedder="slsh", embedding_size=D)
    estate = {"user_feat_mat": jnp.asarray(feats),
              "user_planes": jnp.asarray(planes)}
    mine = np.asarray(oov_embedding(
        spec, "user", jnp.asarray(ids.astype(np.int32)), None,
        jnp.zeros((5, D), jnp.float32), jnp.asarray(buckets), estate,
    ))
    np.testing.assert_allclose(mine, expect, rtol=1e-6)


def test_widedeep_context_routing_parity(ref_dataset_cls):
    """Paper ranking-model parity: the reference inductive WideDeep
    (packed token/float tables + first-order twin + MLP, OOV cells routed
    through mapper buckets) with OUR weights returns IDENTICAL logits for
    mixed in-vocab/new ids — the whole InductiveContextRecommender stack
    (`abstract_recommender.py:715-842`, `layers.py:1617-1693`) matches."""
    RefConfig, RefDataset = ref_dataset_cls
    import os
    import warnings

    import jax
    import torch

    from oovrec_tpu.config.configurator import Config
    from oovrec_tpu.data.dataset import Dataset
    from oovrec_tpu.inductive.mapper import RandomOOVMapper
    from oovrec_tpu.inductive.spec import InductiveSpec
    from oovrec_tpu.models import get_model_class
    from oovrec_tpu.models.context import field_spec_from_dataset

    common = {
        "data_path": os.path.join(os.path.dirname(__file__), "assets"),
        "load_col": {
            "inter": ["user_id", "item_id", "rating", "timestamp", "is_new"],
            "user": ["user_id", "age", "gender"],
            "item": ["item_id", "price", "category"],
        },
        "embedding_size": 8,
        "numerical_features": ["age", "price"],
        "threshold": {"rating": 4},
        "mlp_hidden_size": [32, 16, 8],
        "dropout_prob": 0.0,
        "add_oov_buckets": True, "user_oov_buckets": 13,
        "item_oov_buckets": 11, "oov_freeze_embedding": False,
        "inductive_mapper": "random",
        "oov_prime_pad": 112062759511,
        "oov_hash_function": "64bit",
    }
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        rcfg = RefConfig(model="WideDeep", dataset="toy-ind",
                         config_dict=dict(common))
        rds = RefDataset(rcfg)
        from recbole.inductive.random_mapper import RandomOOVInductiveMapper
        from recbole.model.context_aware_recommender.widedeep import (
            WideDeep as RefWD,
        )

        n_u, n_i = rds.user_num, rds.item_num
        rmap = RandomOOVInductiveMapper(
            np.zeros((n_u + 5, 1)), np.zeros((n_i + 5, 1)), n_u, n_i,
            13, 11, 8, torch.device("cpu"), 112062759511, "64bit")
        rmap.set_eval()
        rm = RefWD(rcfg, rds, inductive_mapper=rmap)
        rm.eval()

    oc = Config(config_dict=dict(common, model="WideDeep",
                                 dataset="toy-ind"))
    ods = Dataset(oc)
    fs = field_spec_from_dataset(ods, oc)
    spec = InductiveSpec(mapper="random", add_oov_buckets=True,
                         n_user_buckets=13, n_item_buckets=11,
                         embedding_size=8, hash_function="64bit")
    om = get_model_class("WideDeep")(
        fields=fs, spec=spec, embedding_size=8,
        mlp_hidden_size=(32, 16, 8), dropout_prob=0.0)
    assert fs.token_dims == tuple(rm.token_field_dims)

    B = 5
    batch = {
        "user_id": np.array([1, 3, n_u + 2, 2, n_u + 9], np.int64),
        "item_id": np.array([2, n_i + 4, 4, n_i + 1, 1], np.int64),
        "is_new": np.array([1, 1, 2, 1, 2], np.int64),
        "gender": np.array([1, 2, 1, 2, 1], np.int64),
        "category": np.array([1, 3, 2, 1, 3], np.int64),
        "age": np.array([0.5, 0.8, 0.2, 1.0, 0.3], np.float32),
        "age__bucket": np.ones(B, np.int64),
        "price": np.array([0.1, 0.9, 0.4, 0.6, 0.2], np.float32),
        "price__bucket": np.ones(B, np.int64),
        "label": np.zeros(B, np.float32),
        "weight": np.ones(B, np.float32),
    }
    RandomOOVMapper(spec, n_u, n_i).annotate(batch, "user_id", "item_id")
    ob = dict(batch)
    ob["user_id"] = np.minimum(ob["user_id"], n_u - 1).astype(np.int32)
    ob["item_id"] = np.minimum(ob["item_id"], n_i - 1).astype(np.int32)
    vs = om.init(jax.random.key(0), ob, {}, method=om.calculate_loss)
    p = vs["params"]

    def T(x):
        return torch.tensor(np.asarray(x))

    with torch.no_grad():
        rm.token_embedding_table.embedding.weight.copy_(
            T(p["fields"]["token_embedding_table"]["embedding"]))
        rm.float_embedding_table.embedding.weight.copy_(
            T(p["fields"]["float_embedding_table"]["embedding"]))
        rm.user_oov_buckets.weight.copy_(
            T(p["fields"]["user_oov_buckets"]["embedding"]))
        rm.item_oov_buckets.weight.copy_(
            T(p["fields"]["item_oov_buckets"]["embedding"]))
        fo = p["first_order_linear"]
        rm.first_order_linear.bias.copy_(T(fo["bias"]))
        rm.first_order_linear.token_embedding_table.embedding.weight.copy_(
            T(fo["fo"]["token_embedding_table"]["embedding"]))
        rm.first_order_linear.float_embedding_table.embedding.weight.copy_(
            T(fo["fo"]["float_embedding_table"]["embedding"]))
        rm.first_order_linear.user_oov_buckets.weight.copy_(
            T(fo["fo"]["user_oov_buckets"]["embedding"]))
        rm.first_order_linear.item_oov_buckets.weight.copy_(
            T(fo["fo"]["item_oov_buckets"]["embedding"]))
        lin = [l for l in rm.mlp_layers.mlp_layers
               if isinstance(l, torch.nn.Linear)]
        for i, l in enumerate(lin):
            l.weight.copy_(T(p["mlp_layers"][f"Dense_{i}"]["kernel"]).T)
            l.bias.copy_(T(p["mlp_layers"][f"Dense_{i}"]["bias"]))
        rm.deep_predict_layer.weight.copy_(
            T(p["deep_predict_layer"]["kernel"]).T)
        rm.deep_predict_layer.bias.copy_(T(p["deep_predict_layer"]["bias"]))

    inter = {}
    for f in ("user_id", "item_id", "is_new", "gender", "category"):
        inter[f] = torch.tensor(batch[f])
    for f in ("age", "price"):
        inter[f] = torch.stack(
            [torch.tensor(batch[f]),
             torch.tensor(batch[f + "__bucket"], dtype=torch.float32)],
            dim=1)
    with torch.no_grad():
        ref_out = rm.forward(inter).numpy()
    our_out = np.asarray(om.apply(vs, ob, {}, method=om.forward))
    np.testing.assert_allclose(our_out, ref_out, rtol=1e-5, atol=1e-6)


def test_dcnv2_cross_network_parity(ref_dataset_cls):
    """DCNv2 (paper ranking model) cross-network + stacked MLP parity:
    identical probabilities with shared weights vs the reference, OOV
    rows routed through mapper buckets."""
    RefConfig, RefDataset = ref_dataset_cls
    import os
    import warnings

    import jax
    import torch

    from oovrec_tpu.config.configurator import Config
    from oovrec_tpu.data.dataset import Dataset
    from oovrec_tpu.inductive.mapper import RandomOOVMapper
    from oovrec_tpu.inductive.spec import InductiveSpec
    from oovrec_tpu.models import get_model_class
    from oovrec_tpu.models.context import field_spec_from_dataset

    common = {
        "data_path": os.path.join(os.path.dirname(__file__), "assets"),
        "load_col": {
            "inter": ["user_id", "item_id", "rating", "timestamp", "is_new"],
            "user": ["user_id", "age", "gender"],
            "item": ["item_id", "price", "category"],
        },
        "embedding_size": 8,
        "numerical_features": ["age", "price"],
        "threshold": {"rating": 4},
        "mlp_hidden_size": [16, 8],
        "dropout_prob": 0.0,
        "cross_layer_num": 2,
        "structure": "stacked",
        "mixed": False,
        "reg_weight": 0.0,
        "add_oov_buckets": True, "user_oov_buckets": 13,
        "item_oov_buckets": 11, "oov_freeze_embedding": False,
        "inductive_mapper": "random",
        "oov_prime_pad": 112062759511,
        "oov_hash_function": "64bit",
    }
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        rcfg = RefConfig(model="DCNV2", dataset="toy-ind",
                         config_dict=dict(common))
        rds = RefDataset(rcfg)
        from recbole.inductive.random_mapper import RandomOOVInductiveMapper
        from recbole.model.context_aware_recommender.dcnv2 import (
            DCNV2 as RefDCN,
        )

        n_u, n_i = rds.user_num, rds.item_num
        rmap = RandomOOVInductiveMapper(
            np.zeros((n_u + 5, 1)), np.zeros((n_i + 5, 1)), n_u, n_i,
            13, 11, 8, torch.device("cpu"), 112062759511, "64bit")
        rmap.set_eval()
        rm = RefDCN(rcfg, rds, inductive_mapper=rmap)
        rm.eval()

    oc = Config(config_dict=dict(common, model="DCNV2",
                                 dataset="toy-ind"))
    ods = Dataset(oc)
    fs = field_spec_from_dataset(ods, oc)
    spec = InductiveSpec(mapper="random", add_oov_buckets=True,
                         n_user_buckets=13, n_item_buckets=11,
                         embedding_size=8, hash_function="64bit")
    om = get_model_class("DCNV2")(
        fields=fs, spec=spec, embedding_size=8, mlp_hidden_size=(16, 8),
        dropout_prob=0.0, cross_layer_num=2, structure="stacked",
        mixed=False, reg_weight=0.0)

    B = 5
    batch = {
        "user_id": np.array([1, 3, n_u + 2, 2, n_u + 9], np.int64),
        "item_id": np.array([2, n_i + 4, 4, n_i + 1, 1], np.int64),
        "is_new": np.array([1, 1, 2, 1, 2], np.int64),
        "gender": np.array([1, 2, 1, 2, 1], np.int64),
        "category": np.array([1, 3, 2, 1, 3], np.int64),
        "age": np.array([0.5, 0.8, 0.2, 1.0, 0.3], np.float32),
        "age__bucket": np.ones(B, np.int64),
        "price": np.array([0.1, 0.9, 0.4, 0.6, 0.2], np.float32),
        "price__bucket": np.ones(B, np.int64),
        "label": np.zeros(B, np.float32),
        "weight": np.ones(B, np.float32),
    }
    RandomOOVMapper(spec, n_u, n_i).annotate(batch, "user_id", "item_id")
    ob = dict(batch)
    ob["user_id"] = np.minimum(ob["user_id"], n_u - 1).astype(np.int32)
    ob["item_id"] = np.minimum(ob["item_id"], n_i - 1).astype(np.int32)
    vs = om.init(jax.random.key(0), ob, {}, method=om.calculate_loss)
    p = vs["params"]

    def T(x):
        return torch.tensor(np.asarray(x))

    with torch.no_grad():
        rm.token_embedding_table.embedding.weight.copy_(
            T(p["fields"]["token_embedding_table"]["embedding"]))
        rm.float_embedding_table.embedding.weight.copy_(
            T(p["fields"]["float_embedding_table"]["embedding"]))
        rm.user_oov_buckets.weight.copy_(
            T(p["fields"]["user_oov_buckets"]["embedding"]))
        rm.item_oov_buckets.weight.copy_(
            T(p["fields"]["item_oov_buckets"]["embedding"]))
        # (first_order_linear exists on the reference base class but is
        # unused by DCNV2.forward — no copy needed)
        for i in range(2):
            rm.cross_layer_w[i].copy_(T(p["cross_layer_w"][i]))
            rm.bias[i].copy_(T(p["cross_bias"][i]).reshape(-1, 1))
        lin = [l for l in rm.mlp_layers.mlp_layers
               if isinstance(l, torch.nn.Linear)]
        for i, l in enumerate(lin):
            l.weight.copy_(T(p["mlp_layers"][f"Dense_{i}"]["kernel"]).T)
            l.bias.copy_(T(p["mlp_layers"][f"Dense_{i}"]["bias"]))
        rm.predict_layer.weight.copy_(T(p["predict_layer"]["kernel"]).T)
        rm.predict_layer.bias.copy_(T(p["predict_layer"]["bias"]))

    inter = {}
    for f in ("user_id", "item_id", "is_new", "gender", "category"):
        inter[f] = torch.tensor(batch[f])
    for f in ("age", "price"):
        inter[f] = torch.stack(
            [torch.tensor(batch[f]),
             torch.tensor(batch[f + "__bucket"], dtype=torch.float32)],
            dim=1)
    with torch.no_grad():
        ref_out = rm.forward(inter).numpy()
    our_out = np.asarray(om.apply(vs, ob, {}, method=om.predict))
    np.testing.assert_allclose(our_out, ref_out, rtol=1e-5, atol=1e-6)


def _context_parity_pair(ref_dataset_cls, model_name, cfg_extra, our_extra):
    """Shared scaffolding: build reference + our context model on toy-ind
    with a random 64bit mapper, init our params, return everything."""
    RefConfig, RefDataset = ref_dataset_cls
    import os
    import warnings

    import jax
    import torch

    from oovrec_tpu.config.configurator import Config
    from oovrec_tpu.data.dataset import Dataset
    from oovrec_tpu.inductive.mapper import RandomOOVMapper
    from oovrec_tpu.inductive.spec import InductiveSpec
    from oovrec_tpu.models import get_model_class
    from oovrec_tpu.models.context import field_spec_from_dataset

    common = {
        "data_path": os.path.join(os.path.dirname(__file__), "assets"),
        "load_col": {
            "inter": ["user_id", "item_id", "rating", "timestamp", "is_new"],
            "user": ["user_id", "age", "gender"],
            "item": ["item_id", "price", "category"],
        },
        "embedding_size": 8,
        "numerical_features": ["age", "price"],
        "threshold": {"rating": 4},
        "dropout_prob": 0.0,
        "add_oov_buckets": True, "user_oov_buckets": 13,
        "item_oov_buckets": 11, "oov_freeze_embedding": False,
        "inductive_mapper": "random",
        "oov_prime_pad": 112062759511,
        "oov_hash_function": "64bit",
    }
    common.update(cfg_extra)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        rcfg = RefConfig(model=model_name, dataset="toy-ind",
                         config_dict=dict(common))
        rds = RefDataset(rcfg)
        from recbole.inductive.random_mapper import RandomOOVInductiveMapper
        import importlib

        mod = importlib.import_module(
            f"recbole.model.context_aware_recommender.{model_name.lower()}")
        RefCls = getattr(mod, model_name)
        n_u, n_i = rds.user_num, rds.item_num
        rmap = RandomOOVInductiveMapper(
            np.zeros((n_u + 5, 1)), np.zeros((n_i + 5, 1)), n_u, n_i,
            13, 11, 8, torch.device("cpu"), 112062759511, "64bit")
        rmap.set_eval()
        rm = RefCls(rcfg, rds, inductive_mapper=rmap)
        rm.eval()

    oc = Config(config_dict=dict(common, model=model_name,
                                 dataset="toy-ind"))
    ods = Dataset(oc)
    fs = field_spec_from_dataset(ods, oc)
    spec = InductiveSpec(mapper="random", add_oov_buckets=True,
                         n_user_buckets=13, n_item_buckets=11,
                         embedding_size=8, hash_function="64bit")
    om = get_model_class(model_name)(
        fields=fs, spec=spec, embedding_size=8, dropout_prob=0.0,
        **our_extra)

    B = 5
    batch = {
        "user_id": np.array([1, 3, n_u + 2, 2, n_u + 9], np.int64),
        "item_id": np.array([2, n_i + 4, 4, n_i + 1, 1], np.int64),
        "is_new": np.array([1, 1, 2, 1, 2], np.int64),
        "gender": np.array([1, 2, 1, 2, 1], np.int64),
        "category": np.array([1, 3, 2, 1, 3], np.int64),
        "age": np.array([0.5, 0.8, 0.2, 1.0, 0.3], np.float32),
        "age__bucket": np.ones(B, np.int64),
        "price": np.array([0.1, 0.9, 0.4, 0.6, 0.2], np.float32),
        "price__bucket": np.ones(B, np.int64),
        "label": np.zeros(B, np.float32),
        "weight": np.ones(B, np.float32),
    }
    RandomOOVMapper(spec, n_u, n_i).annotate(batch, "user_id", "item_id")
    ob = dict(batch)
    ob["user_id"] = np.minimum(ob["user_id"], n_u - 1).astype(np.int32)
    ob["item_id"] = np.minimum(ob["item_id"], n_i - 1).astype(np.int32)
    vs = om.init(jax.random.key(0), ob, {}, method=om.calculate_loss)

    inter = {}
    for f in ("user_id", "item_id", "is_new", "gender", "category"):
        inter[f] = torch.tensor(batch[f])
    for f in ("age", "price"):
        inter[f] = torch.stack(
            [torch.tensor(batch[f]),
             torch.tensor(batch[f + "__bucket"], dtype=torch.float32)],
            dim=1)
    return rm, om, vs, ob, inter


def _copy_context_tables(rm, p, with_fo=True):
    import torch

    def T(x):
        return torch.tensor(np.asarray(x))

    with torch.no_grad():
        rm.token_embedding_table.embedding.weight.copy_(
            T(p["fields"]["token_embedding_table"]["embedding"]))
        rm.float_embedding_table.embedding.weight.copy_(
            T(p["fields"]["float_embedding_table"]["embedding"]))
        rm.user_oov_buckets.weight.copy_(
            T(p["fields"]["user_oov_buckets"]["embedding"]))
        rm.item_oov_buckets.weight.copy_(
            T(p["fields"]["item_oov_buckets"]["embedding"]))
        if with_fo:
            fo = p["first_order_linear"]
            rm.first_order_linear.bias.copy_(T(fo["bias"]))
            rm.first_order_linear.token_embedding_table.embedding.weight.copy_(
                T(fo["fo"]["token_embedding_table"]["embedding"]))
            rm.first_order_linear.float_embedding_table.embedding.weight.copy_(
                T(fo["fo"]["float_embedding_table"]["embedding"]))
            rm.first_order_linear.user_oov_buckets.weight.copy_(
                T(fo["fo"]["user_oov_buckets"]["embedding"]))
            rm.first_order_linear.item_oov_buckets.weight.copy_(
                T(fo["fo"]["item_oov_buckets"]["embedding"]))


def test_xdeepfm_cin_parity(ref_dataset_cls):
    """xDeepFM (paper ranking model): CIN outer-product maps + 1×1 conv
    (ours: Dense over the pair axis) + MLP + first-order twin — identical
    logits with shared weights, OOV rows bucket-routed."""
    import torch

    rm, om, vs, ob, inter = _context_parity_pair(
        ref_dataset_cls, "xDeepFM",
        {"cin_layer_size": [8, 8], "mlp_hidden_size": [16, 8],
         "direct": False, "reg_weight": 0.0},
        {"cin_layer_size": (8, 8), "mlp_hidden_size": (16, 8),
         "direct": False, "reg_weight": 0.0},
    )
    p = vs["params"]
    _copy_context_tables(rm, p, with_fo=True)

    def T(x):
        return torch.tensor(np.asarray(x))

    with torch.no_grad():
        for i, conv in enumerate(rm.conv1d_list):
            # our Dense kernel (in, out) ↔ conv1d weight (out, in, 1)
            conv.weight.copy_(
                T(p[f"conv1d_{i}"]["kernel"]).T.unsqueeze(-1))
            conv.bias.copy_(T(p[f"conv1d_{i}"]["bias"]))
        rm.cin_linear.weight.copy_(T(p["cin_linear"]["kernel"]).T)
        rm.cin_linear.bias.copy_(T(p["cin_linear"]["bias"]))
        lin = [l for l in rm.mlp_layers.mlp_layers
               if isinstance(l, torch.nn.Linear)]
        for i, l in enumerate(lin):
            l.weight.copy_(T(p["mlp_layers"][f"Dense_{i}"]["kernel"]).T)
            l.bias.copy_(T(p["mlp_layers"][f"Dense_{i}"]["bias"]))

    with torch.no_grad():
        ref_out = rm.forward(inter).numpy()
    import jax

    our_out = np.asarray(om.apply(vs, ob, {}, method=om.forward))
    np.testing.assert_allclose(our_out, ref_out, rtol=1e-5, atol=1e-6)


def test_directau_loss_parity(ref_dataset_cls):
    """DirectAU (paper retrieval): alignment + γ·uniformity loss value
    identical with shared weights on mixed in-vocab/OOV ids (pdist
    semantics of `directau.py:80-99` preserved)."""
    RefConfig, RefDataset = ref_dataset_cls
    import os
    import warnings

    import jax
    import torch

    from oovrec_tpu.inductive.mapper import RandomOOVMapper
    from oovrec_tpu.inductive.spec import InductiveSpec
    from oovrec_tpu.models.directau import DirectAU

    common = {
        "data_path": os.path.join(os.path.dirname(__file__), "assets"),
        "load_col": {"inter": ["user_id", "item_id", "rating", "timestamp"]},
        "embedding_size": 8,
        "gamma": 0.5,
        "add_oov_buckets": True, "user_oov_buckets": 13,
        "item_oov_buckets": 11, "oov_freeze_embedding": False,
        "seed": 2020,
    }
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        rcfg = RefConfig(model="DirectAU", dataset="toy",
                         config_dict=dict(common))
        rds = RefDataset(rcfg)
        from recbole.inductive.random_mapper import RandomOOVInductiveMapper
        from recbole.model.general_recommender.directau import (
            DirectAU as RefDAU,
        )

        n_u, n_i = rds.user_num, rds.item_num
        rmap = RandomOOVInductiveMapper(
            np.zeros((n_u + 5, 1)), np.zeros((n_i + 5, 1)), n_u, n_i,
            13, 11, 8, torch.device("cpu"), 112062759511, "64bit")
        rmap.set_eval()
        rm = RefDAU(rcfg, rds, inductive_mapper=rmap)
        rm.eval()

    spec = InductiveSpec(mapper="random", add_oov_buckets=True,
                         n_user_buckets=13, n_item_buckets=11,
                         embedding_size=8, hash_function="64bit")
    om = DirectAU(n_users=n_u, n_items=n_i, embedding_size=8, spec=spec,
                  gamma=0.5)
    B = 6
    batch = {
        "user_id": np.array([1, 3, n_u + 2, 2, n_u + 9, 4], np.int64),
        "item_id": np.array([2, n_i + 4, 4, n_i + 1, 1, 3], np.int64),
        "weight": np.ones(B, np.float32),
    }
    RandomOOVMapper(spec, n_u, n_i).annotate(batch, "user_id", "item_id")
    ob = dict(batch)
    ob["user_id"] = np.minimum(ob["user_id"], n_u - 1).astype(np.int32)
    ob["item_id"] = np.minimum(ob["item_id"], n_i - 1).astype(np.int32)
    ob["neg_item_id"] = ob["item_id"]
    batch_t = {"user_id": torch.tensor(batch["user_id"]),
               "item_id": torch.tensor(batch["item_id"])}
    vs = om.init(jax.random.key(0), ob, {}, method=om.calculate_loss)
    p = vs["params"]

    def T(x):
        return torch.tensor(np.asarray(x))

    with torch.no_grad():
        rm.user_embedding.weight.copy_(T(p["user_embedding"]["embedding"]))
        rm.item_embedding.weight.copy_(T(p["item_embedding"]["embedding"]))
        rm.user_oov_buckets.weight.copy_(
            T(p["user_oov_buckets"]["embedding"]))
        rm.item_oov_buckets.weight.copy_(
            T(p["item_oov_buckets"]["embedding"]))
        expect = rm.calculate_loss(batch_t).item()
    mine = float(om.apply(vs, ob, {}, method=om.calculate_loss))
    assert abs(mine - expect) < 1e-5, (mine, expect)


def test_gru4rec_forward_parity(ref_dataset_cls):
    """Sequential-family parity: GRU4Rec seq_output identical with shared
    weights (torch GRU gates mapped onto the scanned flax GRUCell —
    r/z biases summed, n-gate biases kept separate)."""
    RefConfig, _ = ref_dataset_cls
    import os
    import warnings

    import jax
    import jax.numpy as jnp
    import torch

    from oovrec_tpu.models import get_model_class

    common = {
        "data_path": os.path.join(os.path.dirname(__file__), "assets"),
        "load_col": {"inter": ["user_id", "item_id", "rating", "timestamp"]},
        "embedding_size": 8,
        "hidden_size": 12,
        "num_layers": 1,
        "dropout_prob": 0.0,
        "MAX_ITEM_LIST_LENGTH": 6,
        "train_neg_sample_args": None,
        "eval_args": {"split": {"LS": "valid_and_test"}, "order": "TO",
                      "group_by": "user", "mode": "full"},
    }
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        from recbole.data.dataset import SequentialDataset as RefSeq
        from recbole.model.sequential_recommender.gru4rec import (
            GRU4Rec as RefGRU,
        )

        rcfg = RefConfig(model="GRU4Rec", dataset="toy",
                         config_dict=dict(common))
        rds = RefSeq(rcfg)
        rm = RefGRU(rcfg, rds)
        rm.eval()

    n_items = rds.item_num
    om = get_model_class("GRU4Rec")(
        n_users=rds.user_num, n_items=n_items, embedding_size=8,
        hidden_size=12, num_layers=1, dropout_prob=0.0, max_seq_length=6)
    B, L = 4, 6
    rng = np.random.default_rng(3)
    seq = rng.integers(1, n_items, (B, L)).astype(np.int64)
    lengths = np.array([2, 6, 4, 1], np.int64)
    for i in range(B):
        seq[i, lengths[i]:] = 0
    batch = {"item_id_list": jnp.asarray(seq),
             "item_length": jnp.asarray(lengths),
             "item_id": jnp.asarray(seq[:, 0]),
             "weight": jnp.ones((B,))}
    vs = om.init({"params": jax.random.key(0),
                  "dropout": jax.random.key(1)}, batch,
                 method=om.calculate_loss)
    p = vs["params"]

    def T(x):
        return torch.tensor(np.asarray(x))

    with torch.no_grad():
        rm.item_embedding.weight.copy_(
            T(p["item_embedding"]["embedding"]))
        rm.dense.weight.copy_(T(p["dense"]["kernel"]).T)
        rm.dense.bias.copy_(T(p["dense"]["bias"]))
        g = p["gru_0"]["cell"] if "cell" in p.get("gru_0", {}) else p["gru_0"]
        W_ih = np.concatenate([
            np.asarray(g["ir"]["kernel"]).T,
            np.asarray(g["iz"]["kernel"]).T,
            np.asarray(g["in"]["kernel"]).T], 0)
        W_hh = np.concatenate([
            np.asarray(g["hr"]["kernel"]).T,
            np.asarray(g["hz"]["kernel"]).T,
            np.asarray(g["hn"]["kernel"]).T], 0)
        rm.gru_layers.weight_ih_l0.copy_(T(W_ih))
        rm.gru_layers.weight_hh_l0.copy_(T(W_hh))
        # the reference GRU is bias-free (`gru4rec.py:57`); zero ours
        import jax.numpy as _jnp

        for gate in ("ir", "iz", "in", "hn"):
            p["gru_0"][gate]["bias"] = _jnp.zeros_like(
                p["gru_0"][gate]["bias"])
        ref_out = rm.forward(torch.tensor(seq),
                             torch.tensor(lengths)).numpy()
    vs = {"params": p}
    mine = np.asarray(om.apply(vs, batch, method=om.seq_output))
    np.testing.assert_allclose(mine, ref_out, rtol=1e-5, atol=1e-6)


def test_dcnv2_mixed_moe_parity(ref_dataset_cls):
    """DCN-mix (MoE low-rank cross, `dcnv2.py:146-213`): identical
    probabilities with shared expert/gating weights."""
    import torch

    rm, om, vs, ob, inter = _context_parity_pair(
        ref_dataset_cls, "DCNV2",
        {"mlp_hidden_size": [16, 8], "cross_layer_num": 2,
         "structure": "stacked", "mixed": True, "expert_num": 2,
         "low_rank": 4, "reg_weight": 0.0},
        {"mlp_hidden_size": (16, 8), "cross_layer_num": 2,
         "structure": "stacked", "mixed": True, "expert_num": 2,
         "low_rank": 4, "reg_weight": 0.0},
    )
    p = vs["params"]
    _copy_context_tables(rm, p, with_fo=False)

    def T(x):
        return torch.tensor(np.asarray(x))

    with torch.no_grad():
        for i in range(2):
            rm.cross_layer_u[i].copy_(T(p["cross_layer_u"][i]))
            rm.cross_layer_v[i].copy_(T(p["cross_layer_v"][i]))
            rm.cross_layer_c[i].copy_(T(p["cross_layer_c"][i]))
            rm.bias[i].copy_(T(p["cross_bias"][i]).reshape(-1, 1))
        for e in range(2):
            rm.gating[e].weight.copy_(
                T(p[f"gating_{e}"]["kernel"]).T)
            if rm.gating[e].bias is not None:
                rm.gating[e].bias.copy_(T(p[f"gating_{e}"]["bias"]))
        lin = [l for l in rm.mlp_layers.mlp_layers
               if isinstance(l, torch.nn.Linear)]
        for i, l in enumerate(lin):
            l.weight.copy_(T(p["mlp_layers"][f"Dense_{i}"]["kernel"]).T)
            l.bias.copy_(T(p["mlp_layers"][f"Dense_{i}"]["bias"]))
        rm.predict_layer.weight.copy_(T(p["predict_layer"]["kernel"]).T)
        rm.predict_layer.bias.copy_(T(p["predict_layer"]["bias"]))
        ref_out = rm.forward(inter).numpy()
    our_out = np.asarray(om.apply(vs, ob, {}, method=om.predict))
    np.testing.assert_allclose(our_out, ref_out, rtol=1e-5, atol=1e-6)


def test_lightgcn_propagation_parity(ref_dataset_cls):
    """Graph-family parity: LightGCN full-sort scores identical with
    shared ego embeddings — our segment-sum propagation over normalized
    bipartite edges ≡ the reference's sparse Â matmul."""
    RefConfig, RefDataset = ref_dataset_cls
    import os
    import warnings

    import jax
    import torch

    from oovrec_tpu.models import get_model_class

    common = {
        "data_path": os.path.join(os.path.dirname(__file__), "assets"),
        "load_col": {"inter": ["user_id", "item_id", "rating", "timestamp"]},
        "embedding_size": 8,
        "n_layers": 2,
        "reg_weight": 1e-5,
        "train_neg_sample_args": {"distribution": "uniform",
                                  "sample_num": 1},
        "eval_args": {"split": {"RS": [0.8, 0.1, 0.1]}, "order": "TO",
                      "group_by": "user", "mode": "full"},
        "seed": 2020,
    }
    # newer scipy removed dok_matrix._update, which the reference uses
    import scipy.sparse as sp

    if not hasattr(sp.dok_matrix, "_update"):
        def _update(self, data):
            for k, v in data.items():
                self[k] = v

        sp.dok_matrix._update = _update
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        from recbole.model.general_recommender.lightgcn import (
            LightGCN as RefLG,
        )

        rcfg = RefConfig(model="LightGCN", dataset="toy",
                         config_dict=dict(common))
        rds = RefDataset(rcfg)
        rtrain = rds.build()[0]
        rm = RefLG(rcfg, rtrain)
        rm.eval()

    from oovrec_tpu.config.configurator import Config
    from oovrec_tpu.data.dataset import Dataset

    oc = Config(config_dict=dict(common, model="LightGCN", dataset="toy"))
    ods = Dataset(oc)
    otrain = ods.build()[0]
    cls = get_model_class("LightGCN")
    om = cls(n_users=ods.user_num, n_items=ods.item_num, embedding_size=8,
             n_layers=2)
    estate = cls.build_estate(otrain)
    B = 4
    batch = {"user_id": np.array([1, 2, 3, 4], np.int32),
             "item_id": np.array([1, 2, 3, 4], np.int32),
             "neg_item_id": np.array([2, 3, 4, 5], np.int32),
             "weight": np.ones(B, np.float32)}
    vs = om.init(jax.random.key(0), batch,
                 {k: np.asarray(v) for k, v in estate.items()},
                 method=om.calculate_loss)
    p = vs["params"]

    with torch.no_grad():
        rm.user_embedding.weight.copy_(torch.tensor(
            np.asarray(p["user_embedding"]["embedding"])))
        rm.item_embedding.weight.copy_(torch.tensor(
            np.asarray(p["item_embedding"]["embedding"])))
        ref_scores = rm.full_sort_predict(
            {"user_id": torch.tensor(batch["user_id"].astype(np.int64))}
        ).reshape(B, -1).numpy()
    mine = np.asarray(om.apply(
        vs, batch, {k: np.asarray(v) for k, v in estate.items()},
        method=om.full_sort_scores))
    np.testing.assert_allclose(mine, ref_scores, rtol=1e-4, atol=1e-5)


def test_torch_checkpoint_import(ref_dataset_cls):
    """Migration path: a RANDOM reference WideDeep state_dict imported via
    utils/torch_import gives identical logits — i.e. users can load their
    trained reference checkpoints into this framework."""
    import torch

    from oovrec_tpu.utils.torch_import import import_state_dict

    rm, om, vs, ob, inter = _context_parity_pair(
        ref_dataset_cls, "WideDeep",
        {"mlp_hidden_size": [32, 16, 8]},
        {"mlp_hidden_size": (32, 16, 8)},
    )
    sd = {k: v.detach().numpy() for k, v in rm.state_dict().items()}
    imported = import_state_dict("WideDeep", sd)
    # graft imported weights onto our param tree (structure must line up)
    import jax

    def merge(ours, new):
        if isinstance(new, dict):
            return {k: merge(ours[k], new[k]) if k in new else ours[k]
                    for k in ours} | {
                k: new[k] for k in new if k not in ours}
        return new

    p2 = merge(vs["params"], imported)
    chex_equal = jax.tree_util.tree_structure(
        p2) == jax.tree_util.tree_structure(vs["params"])
    assert chex_equal, "imported tree shape mismatch"
    with torch.no_grad():
        ref_out = rm.forward(inter).numpy()
    our_out = np.asarray(om.apply({"params": p2}, ob, {}, method=om.forward))
    np.testing.assert_allclose(our_out, ref_out, rtol=1e-5, atol=1e-6)


def test_torch_checkpoint_import_bpr(ref_dataset_cls):
    import torch

    from oovrec_tpu.utils.torch_import import import_state_dict
    from oovrec_tpu.inductive.spec import InductiveSpec
    from oovrec_tpu.models.bpr import BPR
    import jax
    import jax.numpy as jnp

    RefConfig, RefDataset = ref_dataset_cls
    import os
    import warnings

    common = {
        "data_path": os.path.join(os.path.dirname(__file__), "assets"),
        "load_col": {"inter": ["user_id", "item_id", "rating", "timestamp"]},
        "embedding_size": 8,
        "add_oov_buckets": True, "user_oov_buckets": 13,
        "item_oov_buckets": 11, "oov_freeze_embedding": False,
    }
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        rcfg = RefConfig(model="BPR", dataset="toy",
                         config_dict=dict(common))
        rds = RefDataset(rcfg)
        from recbole.inductive.random_mapper import RandomOOVInductiveMapper
        from recbole.model.general_recommender.bpr import BPR as RefBPR

        n_u, n_i = rds.user_num, rds.item_num
        rmap = RandomOOVInductiveMapper(
            np.zeros((n_u + 5, 1)), np.zeros((n_i + 5, 1)), n_u, n_i,
            13, 11, 8, torch.device("cpu"), 112062759511, "64bit")
        rmap.set_eval()
        rm = RefBPR(rcfg, rds, inductive_mapper=rmap)
        rm.eval()
    sd = {k: v.detach().numpy() for k, v in rm.state_dict().items()}
    p = import_state_dict("BPR", sd)
    spec = InductiveSpec(mapper="random", add_oov_buckets=True,
                         n_user_buckets=13, n_item_buckets=11,
                         embedding_size=8, hash_function="64bit")
    om = BPR(n_users=n_u, n_items=n_i, embedding_size=8, spec=spec)
    ids = np.array([1, 3, n_u + 2, 2], np.int64)
    from oovrec_tpu.inductive.mapper import RandomOOVMapper

    batch = {"user_id": ids.copy(), "item_id": ids.copy(),
             "neg_item_id": ids.copy()}
    RandomOOVMapper(spec, n_u, n_i).annotate(batch, "user_id", "item_id")
    batch["user_id"] = np.minimum(batch["user_id"], n_u - 1).astype(np.int32)
    with torch.no_grad():
        ref_ue = rm.get_user_embedding(torch.tensor(ids)).numpy()
    our_ue = np.asarray(om.apply(
        {"params": jax.tree.map(jnp.asarray, p)},
        jnp.asarray(batch["user_id"]), batch, {}, method=om.user_e))
    np.testing.assert_allclose(our_ue, ref_ue, rtol=1e-6, atol=1e-7)


def test_cross_framework_checkpoint_eval(ref_dataset_cls, tmp_path):
    """CAPSTONE: train the reference BPR end-to-end (torch, CPU), save its
    checkpoint, import it with utils/torch_import, evaluate with OUR
    loaders/evaluator on the identical split — test metrics equal the
    reference's own evaluation to 4 decimals (model + data + eval parity
    all at once)."""
    RefConfig, RefDataset = ref_dataset_cls
    import os
    import warnings

    import torch

    _orig_load = torch.load

    def _load(*a, **k):
        k.setdefault("weights_only", False)
        return _orig_load(*a, **k)

    torch.load = _load
    torch.manual_seed(7)  # deterministic ref init/training regardless of
    np.random.seed(7)     # test order (metric granularity is 0.2/user)
    try:
        common = {
            "data_path": os.path.join(os.path.dirname(__file__), "assets"),
            "load_col": {"inter": ["user_id", "item_id", "rating",
                                   "timestamp"]},
            "embedding_size": 8, "epochs": 2, "train_batch_size": 16,
            "eval_batch_size": 64,
            "add_oov_buckets": True, "user_oov_buckets": 13,
            "item_oov_buckets": 11, "oov_freeze_embedding": False,
            "train_neg_sample_args": {"distribution": "uniform",
                                      "sample_num": 1},
            "eval_args": {"split": {"RS": [0.8, 0.1, 0.1]}, "order": "TO",
                          "group_by": "user", "mode": "full"},
            "topk": [2, 5],
            "metrics": ["Recall", "MRR", "NDCG", "Hit", "Precision"],
            "valid_metric": "MRR@2", "seed": 2020,
        }
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            from recbole.data.dataloader import NegSampleEvalDataLoader
            from recbole.data.utils import data_preparation as ref_prep
            from recbole.inductive.random_mapper import (
                RandomOOVInductiveMapper,
            )
            from recbole.model.general_recommender.bpr import BPR as RefBPR
            import recbole.trainer.trainer as rtt
            from recbole.trainer import Trainer as RefTrainer

            rtt.NegSampleEvalDataloader = NegSampleEvalDataLoader
            rcfg = RefConfig(model="BPR", dataset="toy", config_dict=dict(
                common, device="cpu", use_gpu=False,
                checkpoint_dir=str(tmp_path)))
            rds = RefDataset(rcfg)
            rtr, rva, rte = ref_prep(rcfg, rds)
            n_u, n_i = rds.user_num, rds.item_num
            rmap = RandomOOVInductiveMapper(
                np.zeros((n_u + 5, 1)), np.zeros((n_i + 5, 1)), n_u, n_i,
                13, 11, 8, torch.device("cpu"), 112062759511, "64bit")
            rmap.set_eval()
            rmodel = RefBPR(rcfg, rds, inductive_mapper=rmap)
            rtrainer = RefTrainer(rcfg, rmodel)
            rtrainer.fit(rtr, rva, saved=True, show_progress=False)
            ref_result = dict(rtrainer.evaluate(
                rte, load_best_model=True, show_progress=False))
            ckpt_path = rtrainer.saved_model_file
    finally:
        torch.load = _orig_load

    # ---- our side: same config, imported weights, our evaluator
    from oovrec_tpu.cli.quick_start import build_model_and_state
    from oovrec_tpu.config.configurator import Config
    from oovrec_tpu.data.utils import create_dataset, data_preparation
    from oovrec_tpu.train.trainer import Trainer
    from oovrec_tpu.utils.torch_import import import_reference_checkpoint

    oc = Config(config_dict=dict(
        common, model="BPR", dataset="toy",
        inductive_mapper="random", oov_hash_function="64bit",
        n_user_oov_buckets=13, n_item_oov_buckets=11,
        checkpoint_dir=str(tmp_path / "ours")))
    ods = create_dataset(oc)
    _, _, otest = data_preparation(oc, ods)
    model_obj, variables, estate = build_model_and_state(oc, ods)
    import jax

    imported = import_reference_checkpoint("BPR", ckpt_path)
    variables = dict(variables, params=jax.tree.map(
        np.asarray, imported))
    trainer = Trainer(oc, model_obj, variables, estate)
    our_result = trainer.evaluate(otest, load_best_model=False)
    for k, v in ref_result.items():
        assert abs(our_result[k] - float(v)) < 5e-4, (k, our_result[k], v)


def test_ease_closed_form_parity(ref_dataset_cls):
    """EASE closed form: full-sort scores identical to the reference on
    the same split (caught a transposed-B bug: B_ij = −P_ij / P_jj is a
    COLUMN-wise division, `ease.py:48`)."""
    RefConfig, RefDataset = ref_dataset_cls
    import os
    import warnings

    import jax
    import torch

    from oovrec_tpu.models import get_model_class

    common = {
        "data_path": os.path.join(os.path.dirname(__file__), "assets"),
        "load_col": {"inter": ["user_id", "item_id", "rating", "timestamp"]},
        "reg_weight": 10.0,
        "eval_args": {"split": {"RS": [0.8, 0.1, 0.1]}, "order": "TO",
                      "group_by": "user", "mode": "full"},
    }
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        from recbole.model.general_recommender.ease import EASE as RefEASE

        rcfg = RefConfig(model="EASE", dataset="toy",
                         config_dict=dict(common, train_neg_sample_args=None))
        rds = RefDataset(rcfg)
        rm = RefEASE(rcfg, rds.build()[0])
        users = torch.tensor([1, 2, 3])
        with torch.no_grad():
            ref_scores = rm.full_sort_predict(
                {"user_id": users}).reshape(3, -1).numpy()

    from oovrec_tpu.config.configurator import Config
    from oovrec_tpu.data.dataset import Dataset

    oc = Config(config_dict=dict(common, model="EASE", dataset="toy"))
    ods = Dataset(oc)
    cls = get_model_class("EASE")
    estate = cls.build_estate(ods.build()[0], reg_weight=10.0)
    om = cls(n_users=ods.user_num, n_items=ods.item_num)
    batch = {"user_id": np.array([1, 2, 3], np.int32),
             "item_id": np.zeros(3, np.int32),
             "weight": np.ones(3, np.float32)}
    vs = om.init(jax.random.key(0), batch, estate,
                 method=om.full_sort_scores)
    mine = np.asarray(om.apply(vs, batch, estate,
                               method=om.full_sort_scores))
    np.testing.assert_allclose(mine, ref_scores, rtol=1e-4, atol=1e-6)


def test_itemknn_similarity_parity(ref_dataset_cls):
    """ItemKNN: full-sort scores bit-identical (cosine top-k similarity
    with shrinkage, `itemknn.py` ComputeSimilarity)."""
    RefConfig, RefDataset = ref_dataset_cls
    import os
    import warnings

    import jax
    import torch

    from oovrec_tpu.models import get_model_class

    common = {
        "data_path": os.path.join(os.path.dirname(__file__), "assets"),
        "load_col": {"inter": ["user_id", "item_id", "rating", "timestamp"]},
        "eval_args": {"split": {"RS": [0.8, 0.1, 0.1]}, "order": "TO",
                      "group_by": "user", "mode": "full"},
        "k": 3, "shrink": 0.0,
    }
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        from recbole.model.general_recommender.itemknn import (
            ItemKNN as RefKNN,
        )

        rcfg = RefConfig(model="ItemKNN", dataset="toy",
                         config_dict=dict(common, train_neg_sample_args=None))
        rds = RefDataset(rcfg)
        rm = RefKNN(rcfg, rds.build()[0])
        with torch.no_grad():
            ref_scores = rm.full_sort_predict(
                {"user_id": torch.tensor([1, 2, 3])}).reshape(3, -1).numpy()

    from oovrec_tpu.config.configurator import Config
    from oovrec_tpu.data.dataset import Dataset

    oc = Config(config_dict=dict(common, model="ItemKNN", dataset="toy"))
    ods = Dataset(oc)
    cls = get_model_class("ItemKNN")
    estate = cls.build_estate(ods.build()[0], k=3)
    om = cls(n_users=ods.user_num, n_items=ods.item_num)
    batch = {"user_id": np.array([1, 2, 3], np.int32),
             "item_id": np.zeros(3, np.int32),
             "weight": np.ones(3, np.float32)}
    vs = om.init(jax.random.key(0), batch, estate,
                 method=om.full_sort_scores)
    mine = np.asarray(om.apply(vs, batch, estate,
                               method=om.full_sort_scores))
    np.testing.assert_allclose(mine, ref_scores, rtol=1e-6, atol=1e-7)
