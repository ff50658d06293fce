"""Inductive OOV layer tests: mapper parity, OOV simulation, frozen
training, LSH/SLSH routing, and the 7-slice inductive evaluation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from oovrec_tpu.cli.inductive_eval import perform_inductive_eval
from oovrec_tpu.cli.quick_start import build_model_and_state, run
from oovrec_tpu.config import Config
from oovrec_tpu.data.dataset import Dataset
from oovrec_tpu.inductive.hashes import hash_ids, three_round_int_hash
from oovrec_tpu.inductive.mapper import RandomOOVMapper
from oovrec_tpu.inductive.routing import route
from oovrec_tpu.inductive.spec import InductiveSpec
from oovrec_tpu.inductive.transform import OOVSimulator
from oovrec_tpu.utils.seeding import host_rng

from tests.test_dataset import ASSETS, toyind_config

PRIME_PAD = 112062759511


def _spec(**over):
    d = dict(
        mapper="random", add_oov_buckets=True,
        n_user_buckets=16, n_item_buckets=16,
    )
    d.update(over)
    return InductiveSpec(**d)


# ------------------------------------------------------------------ mapper


def test_mapper_matches_reference_semantics():
    """map_user_ids: IV pass-through, OOV → n_orig + hash(id−n_orig)%B
    (`random_mapper.py:116-122`)."""
    spec = _spec()
    m = RandomOOVMapper(spec, n_original_users=100, n_original_items=50,
                        n_new_users=130, n_new_items=70)
    m.set_eval()
    ids = np.array([0, 5, 99, 100, 101, 129], dtype=np.int64)
    out = m.map_user_ids(ids)
    np.testing.assert_array_equal(out[:3], ids[:3])
    exp = three_round_int_hash(ids[3:] - 100) % 16 + 100
    np.testing.assert_array_equal(out[3:], exp)
    assert m.n_new_users == 130
    m.set_train()
    assert m.n_new_users == 200  # doubled in train mode (`:48-51`)


def test_sim_bucket_equals_padded_reference_mapping():
    """The OOVSimulator's bucket must equal the reference's mapping of the
    prime-padded ID."""
    spec = _spec()
    sim = OOVSimulator(spec, 100, 50, feature_mask_rate=0.0,
                       rng=host_rng(0, "t"))
    ids = np.arange(10, dtype=np.int64)
    got = sim._sim_buckets(ids, 100, 16)
    expect = hash_ids(ids + PRIME_PAD - 100, 16, "3round")
    np.testing.assert_array_equal(got, expect)


def test_oov_transform_masks_and_flags():
    spec = _spec()
    rng = host_rng(1, "t2")
    sim = OOVSimulator(spec, 100, 50, feature_mask_rate=0.5, rng=rng)
    batch = {
        "user_id": np.arange(1, 33, dtype=np.int64),
        "item_id": np.arange(1, 33, dtype=np.int64),
        "age": np.ones(32, np.float32),
        "weight": np.ones(32, np.float32),
    }
    out = sim(batch)
    flagged = ("user_id_oov" in out) or ("item_id_oov" in out)
    assert flagged
    # weight column never masked
    np.testing.assert_array_equal(out["weight"], batch["weight"])
    # ~half the feature entries zeroed
    assert 0 < out["age"].sum() < 32
    # any zeroed flagged ID has its flag cleared
    if "user_id_oov" in out:
        zeroed = out["user_id"] == 0
        assert (out["user_id_oov"][zeroed] == 0).all()


# ------------------------------------------------------------------ routing


def test_routing_selects_iv_vs_oov():
    table = jnp.arange(20.0).reshape(10, 2)
    buckets_t = 100.0 + jnp.arange(8.0).reshape(4, 2)
    spec = _spec(n_user_buckets=4, n_item_buckets=4)
    ids = jnp.array([1, 2, 3])
    flags = jnp.array([0, 1, 0])
    bks = jnp.array([0, 2, 0])
    out = route(spec, "user", ids, flags, bks, table, buckets_t, {})
    np.testing.assert_allclose(np.asarray(out[0]), [2.0, 3.0])
    np.testing.assert_allclose(np.asarray(out[1]), [104.0, 105.0])  # bucket 2
    np.testing.assert_allclose(np.asarray(out[2]), [6.0, 7.0])
    # ids beyond vocab are OOV even without flags
    out2 = route(spec, "user", jnp.array([12]), None, jnp.array([1]),
                 table, buckets_t, {})
    np.testing.assert_allclose(np.asarray(out2[0]), [102.0, 103.0])


def test_zero_and_mean_embedders():
    table = jnp.arange(20.0).reshape(10, 2)
    ids = jnp.array([3, 12])
    z = route(_spec(embedder="zero", add_oov_buckets=False, mapper=None),
              "user", ids, None, None, table, None, {})
    np.testing.assert_allclose(np.asarray(z[1]), [0.0, 0.0])
    np.testing.assert_allclose(np.asarray(z[0]), [6.0, 7.0])
    m = route(_spec(embedder="mean", add_oov_buckets=False, mapper=None),
              "user", ids, None, None, table, None, {})
    np.testing.assert_allclose(np.asarray(m[1]), np.asarray(table).mean(0))


def test_lsh_routing_is_bucket_mean():
    """LSH OOV embedding = mean of bucket rows on the positive side of the
    hyperplanes (`lsh_embedder.py:141-159`)."""
    spec = _spec(embedder="lsh", n_user_buckets=4, mapper=None,
                 add_oov_buckets=False)
    feats = np.array([[1.0, 0.0], [0.0, 1.0], [-1.0, 0.5]], np.float32)
    planes = np.array(
        [[1, 0], [0, 1], [-1, 0], [1, 1]], np.float32
    )  # 4 buckets
    bucket_table = jnp.arange(8.0).reshape(4, 2)
    estate = {"user_feat_mat": jnp.asarray(feats),
              "user_planes": jnp.asarray(planes)}
    table = jnp.zeros((2, 2))
    ids = jnp.array([0, 1, 2])
    out = route(spec, "user", ids, jnp.ones(3, jnp.int32), None, table,
                bucket_table, estate)
    # id0 feats (1,0): proj = [1,0,-1,1] → bits [1,1,0,1] → mean of rows 0,1,3
    exp0 = np.asarray(bucket_table)[[0, 1, 3]].mean(0)
    np.testing.assert_allclose(np.asarray(out[0]), exp0)
    # id2 feats (-1,.5): proj [-1,.5,1,-.5] → bits [0,1,1,0] → rows 1,2
    exp2 = np.asarray(bucket_table)[[1, 2]].mean(0)
    np.testing.assert_allclose(np.asarray(out[2]), exp2)


def test_slsh_bucket_formula():
    """slsh bucket = (n_bits + popcount) % n_buckets — the reference's
    (2**bits).sum() quirk (`single_lsh_embedder.py:82-87`)."""
    spec = _spec(embedder="slsh", n_user_buckets=4, mapper=None,
                 add_oov_buckets=False)
    feats = np.array([[1.0, 1.0]], np.float32)
    planes = np.array([[1, 0], [0, 1]], np.float32)  # 2 bits
    bucket_table = jnp.arange(8.0).reshape(4, 2)
    estate = {"user_feat_mat": jnp.asarray(feats),
              "user_planes": jnp.asarray(planes)}
    out = route(spec, "user", jnp.array([0]), jnp.ones(1, jnp.int32), None,
                jnp.zeros((2, 2)), bucket_table, estate)
    # bits [1,1] → (2 + 2) % 4 = 0 → bucket row 0
    np.testing.assert_allclose(np.asarray(out[0]), [0.0, 1.0])


# ------------------------------------------------------- end-to-end regime


def _ind_cfg(**over):
    d = {
        "model": "BPR",
        "dataset": "toy-ind",
        "data_path": ASSETS,
        "load_col": {
            "inter": ["user_id", "item_id", "rating", "timestamp", "is_new"],
            "user": ["user_id", "age", "gender"],
            "item": ["item_id", "price", "category"],
        },
        "epochs": 3,
        "train_batch_size": 16,
        "eval_batch_size": 64,
        "embedding_size": 8,
        "topk": [2, 5],
        "valid_metric": "MRR@2",
        "eval_args": {
            "split": {"RS": [0.8, 0.1, 0.1]},
            "order": "TO",
            "group_by": "user",
            "mode": "full",
        },
        "inductive_mapper": "random",
        "add_oov_buckets": True,
        "n_user_oov_buckets": 8,
        "n_item_oov_buckets": 8,
        "train_oov": True,
        "oov_only_epoch": True,
        "oov_train_ratio": 0.8,
        "oov_feature_mask_rate": 0.2,
    }
    d.update(over)
    return d


def test_oov_training_updates_buckets(tmp_path):
    cfg = _ind_cfg(checkpoint_dir=str(tmp_path))
    res = run(config_dict=cfg, saved=True)
    tr = res["trainer"]
    buckets = np.asarray(tr.variables["params"]["user_oov_buckets"]["embedding"])
    # OOV epochs must have moved some bucket rows off their init
    assert np.abs(buckets).sum() > 0


def test_frozen_oov_training_preserves_iv_tables(tmp_path):
    cfg = _ind_cfg(
        checkpoint_dir=str(tmp_path),
        epochs=1,
        oov_freeze_embedding=True,
        learning_rate=0.0,  # normal pass is a no-op → isolate OOV pass
    )
    # learning_rate 0 makes everything a no-op; instead run lr>0 but check
    # via the frozen step directly below
    cfg["learning_rate"] = 0.05
    res = run(config_dict=cfg, saved=False)
    tr = res["trainer"]
    # run a frozen OOV epoch manually and compare IV tables before/after
    from oovrec_tpu.data.utils import data_preparation

    ds = res["dataset"]
    train_loader, _, _ = data_preparation(res["config"], ds)
    before = np.asarray(tr.variables["params"]["user_embedding"]["embedding"]).copy()
    before_b = np.asarray(tr.variables["params"]["user_oov_buckets"]["embedding"]).copy()
    tr._train_epoch(
        train_loader, 0, oov_transform=tr.oov_simulator,
        keep_ratio=1.0, frozen=True,
    )
    after = np.asarray(tr.variables["params"]["user_embedding"]["embedding"])
    after_b = np.asarray(tr.variables["params"]["user_oov_buckets"]["embedding"])
    np.testing.assert_array_equal(before, after)  # IV frozen
    assert np.abs(after_b - before_b).sum() > 0  # buckets trained


def test_inductive_eval_seven_slices(tmp_path):
    cfg = _ind_cfg(checkpoint_dir=str(tmp_path))
    res = run(config_dict=cfg, saved=True)
    orig_ds = res["dataset"]
    results = perform_inductive_eval(
        orig_ds, res["trainer"].saved_model_file, config=res["config"]
    )
    assert set(results) == {
        "overall", "old_users", "new_users",
        "old_old", "old_new", "new_old", "new_new",
    }
    # topk forced to [3,5,10,20] by the inductive protocol
    assert "recall@3" in results["overall"]
    assert "recall@20" in results["overall"]
    for s in ("overall", "old_users", "new_users"):
        assert len(results[s]) > 0
    # metrics in range
    for s, r in results.items():
        for v in r.values():
            assert 0.0 <= v <= 1.0


def test_inductive_eval_fused_matches_dense(tmp_path):
    """The block-candidate Pallas path (`_make_fused_step`, interpret mode
    on CPU) must reproduce the dense 4-variant path exactly when
    tie-breaking is deterministic (use_perturbed_hits=False → identity
    permutation on both paths, ties resolve to lowest index)."""
    cfg = _ind_cfg(checkpoint_dir=str(tmp_path), use_perturbed_hits=False)
    res = run(config_dict=cfg, saved=True)
    dense = perform_inductive_eval(
        res["dataset"], res["trainer"].saved_model_file, config=res["config"]
    )
    res["config"]["use_fused_topk"] = True
    fused = perform_inductive_eval(
        res["dataset"], res["trainer"].saved_model_file, config=res["config"]
    )
    assert set(dense) == set(fused)
    for s in dense:
        assert set(dense[s]) == set(fused[s]), s
        for m, v in dense[s].items():
            assert abs(v - fused[s][m]) < 1e-9, (s, m, v, fused[s][m])


def test_inductive_eval_lsh(tmp_path):
    cfg = _ind_cfg(
        checkpoint_dir=str(tmp_path),
        inductive_embedder="lsh",
        inductive_mapper=None,
    )
    res = run(config_dict=cfg, saved=True)
    results = perform_inductive_eval(
        res["dataset"], res["trainer"].saved_model_file, config=res["config"]
    )
    assert "recall@3" in results["overall"]
