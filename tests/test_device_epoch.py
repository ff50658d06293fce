"""Device-resident epoch fast path (train/device_epoch.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from oovrec_tpu.cli.quick_start import run
from oovrec_tpu.config import Config
from oovrec_tpu.data.utils import create_dataset, data_preparation
from oovrec_tpu.train.device_epoch import (
    build_used_bitmap,
    device_epoch_eligible,
)

from tests.test_dataset import ASSETS


def _cfg(**over):
    d = {
        "model": "BPR",
        "dataset": "toy",
        "data_path": ASSETS,
        "load_col": {"inter": ["user_id", "item_id", "rating", "timestamp"]},
        "epochs": 3,
        "train_batch_size": 8,
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
    }
    d.update(over)
    return d


def test_used_bitmap_layout():
    per_user = [np.array([], np.int64), np.array([1, 33]), np.array([2])]
    bm = build_used_bitmap(per_user, 3, 40).view(np.uint32)
    assert bm.shape == (3, 2)
    # PAD column set everywhere
    assert all(bm[u, 0] & 1 for u in range(3))
    assert (bm[1, 0] >> 1) & 1 and (bm[1, 1] >> 1) & 1  # items 1, 33
    assert (bm[2, 0] >> 2) & 1
    assert not (bm[0, 0] >> 1) & 1


def test_on_device_negative_sampling_avoids_used():
    """The bitmap-resampling negative draw never returns PAD or a
    used (user, item) pair when unused items exist (sampler.py:106-126
    semantics on device)."""
    from oovrec_tpu.data.sampler import _MAX_RESAMPLE_ROUNDS

    n_users, n_items, B = 4, 64, 256
    per_user = [
        np.arange(1, 32),          # user 0: half the corpus used
        np.array([5]),
        np.arange(1, 48),          # user 2: 16 unused items left
        np.array([], np.int64),
    ]
    bm = jnp.asarray(build_used_bitmap(per_user, n_users, n_items))
    users = jnp.asarray(np.resize(np.arange(n_users), B).astype(np.int32))

    def sample(rng, u):
        def test_used(c):
            return ((bm[u, c >> 5] >> (c & 31)) & 1) == 1

        cand = jax.random.randint(
            jax.random.fold_in(rng, 0), (B,), 1, n_items, jnp.int32
        )

        def round_(r, c):
            redraw = jax.random.randint(
                jax.random.fold_in(rng, r + 1), (B,), 1, n_items, jnp.int32
            )
            return jnp.where(test_used(c), redraw, c)

        return jax.lax.fori_loop(0, _MAX_RESAMPLE_ROUNDS, round_, cand)

    negs = np.asarray(jax.jit(sample)(jax.random.PRNGKey(0), users))
    u = np.asarray(users)
    assert (negs != 0).all()
    for b in range(B):
        assert negs[b] not in per_user[u[b]], (b, u[b], negs[b])


def test_device_epoch_trains(tmp_path):
    cfg = _cfg(device_epoch=True, checkpoint_dir=str(tmp_path))
    res = run(config_dict=cfg, saved=False)
    assert res["test_result"]["recall@5"] >= 0.0
    trainer = res["trainer"]
    assert getattr(trainer, "_device_epochs", None), (
        "fast path did not activate with device_epoch=True"
    )


def test_device_epoch_matches_host_quality(tmp_path):
    """Same config trained through both paths reaches comparable metrics
    (RNG streams differ — assert the fast path learns, not bit-equality)."""
    host = run(
        config_dict=_cfg(device_epoch=False,
                         checkpoint_dir=str(tmp_path / "h")),
        saved=False,
    )
    dev = run(
        config_dict=_cfg(device_epoch=True,
                         checkpoint_dir=str(tmp_path / "d")),
        saved=False,
    )
    assert getattr(dev["trainer"], "_device_epochs", None)
    assert not getattr(host["trainer"], "_device_epochs", None)
    h = host["test_result"]["ndcg@5"]
    d = dev["test_result"]["ndcg@5"]
    assert d >= 0.0 and abs(h - d) < 0.6  # tiny corpus, loose band


def test_eligibility_gates(tmp_path):
    cfg = Config(config_dict=_cfg(device_epoch="auto"))
    ds = create_dataset(cfg)
    train_loader, _, _ = data_preparation(cfg, ds)

    class FakeTrainer:
        mesh = None
        dhe_hasher = None

        class model:
            supports_device_epoch = True

    # auto: tiny corpus stays on the host path
    assert not device_epoch_eligible(FakeTrainer(), train_loader, cfg)
    cfg2 = Config(config_dict=_cfg(device_epoch=True))
    assert device_epoch_eligible(FakeTrainer(), train_loader, cfg2)
    # dynamic sampling disables it
    train_loader.dynamic = True
    assert not device_epoch_eligible(FakeTrainer(), train_loader, cfg2)


def test_scanned_eval_matches_per_batch(tmp_path):
    """device_eval fast path (one scanned program) must reproduce the
    per-batch full-sort eval exactly — same masking, same top-k."""
    base = _cfg(checkpoint_dir=str(tmp_path), epochs=2)
    host = run(config_dict={**base, "device_eval": False}, saved=False)
    dev = run(config_dict={**base, "device_eval": True}, saved=False)
    h, d = host["test_result"], dev["test_result"]
    assert set(h) == set(d)
    for k in h:
        assert abs(h[k] - d[k]) < 1e-9, (k, h[k], d[k])


def test_scanned_eval_reblocks_tiny_eval_batch(tmp_path):
    """A tiny eval_batch_size degrades full-sort blocks to ~1 user (the
    reference's GPU-memory knob); the scanned device pass re-blocks to a
    chip-sized score slab (device_eval_score_elements) WITHOUT changing
    metrics — block width is metric-invariant."""
    base = _cfg(checkpoint_dir=str(tmp_path), epochs=1,
                eval_batch_size=1)  # 1 user per block before re-blocking
    host = run(config_dict={**base, "device_eval": False}, saved=False)
    dev = run(config_dict={**base, "device_eval": True}, saved=False)
    h, d = host["test_result"], dev["test_result"]
    assert set(h) == set(d)
    for k in h:
        assert abs(h[k] - d[k]) < 1e-9, (k, h[k], d[k])


def test_scanned_eval_chunks_when_over_element_bound(tmp_path):
    """A tiny `device_eval_max_elements` forces the scanned pass to split
    the stacked batches into many chunks (instead of silently degrading
    to per-batch dispatch, which cost ~1 h at the 10M-corpus scale);
    chunking is metric-invariant."""
    base = _cfg(checkpoint_dir=str(tmp_path), epochs=1,
                eval_batch_size=64)
    host = run(config_dict={**base, "device_eval": False}, saved=False)
    dev = run(config_dict={**base, "device_eval": True,
                           "device_eval_max_elements": 500}, saved=False)
    h, d = host["test_result"], dev["test_result"]
    assert set(h) == set(d)
    for k in h:
        assert abs(h[k] - d[k]) < 1e-9, (k, h[k], d[k])


def test_scanned_uni_eval_matches_per_batch(tmp_path):
    """Scanned uni-N sampled-negative eval == per-batch path. Negative
    draws are host-side in both cases; same seed → same candidate sets,
    so metrics must match exactly."""
    base = _cfg(
        checkpoint_dir=str(tmp_path), epochs=2,
        eval_args={
            "split": {"RS": [0.8, 0.1, 0.1]},
            "order": "TO", "group_by": "user", "mode": "uni10",
        },
    )
    host = run(config_dict={**base, "device_eval": False}, saved=False)
    dev = run(config_dict={**base, "device_eval": True}, saved=False)
    h, d = host["test_result"], dev["test_result"]
    assert set(h) == set(d)
    for k in h:
        assert abs(h[k] - d[k]) < 1e-9, (k, h[k], d[k])


def test_scanned_seq_eval_matches_per_batch(tmp_path):
    """Scanned eval over sequential full-sort batches (GRU4Rec, LS
    protocol) == per-batch path."""
    from tests.test_sequential import _cfg as seq_cfg

    base = seq_cfg("GRU4Rec", epochs=1,
                   checkpoint_dir=str(tmp_path))
    host = run(config_dict={**base, "device_eval": False}, saved=False)
    dev = run(config_dict={**base, "device_eval": True}, saved=False)
    h, d = host["test_result"], dev["test_result"]
    for k in h:
        assert abs(h[k] - d[k]) < 1e-9, (k, h[k], d[k])


def test_device_epoch_on_mesh(tmp_path):
    """Device-resident epochs compile SPMD over an active
    ('data','model') mesh: same fast path, sharded tables, sane metrics."""
    cfg = _cfg(
        device_epoch=True,
        checkpoint_dir=str(tmp_path),
        mesh={"data": 4, "model": 2},
        row_shard_threshold=8,
        train_batch_size=8,  # local_step 8 % data=4 == 0
    )
    res = run(config_dict=cfg, saved=False)
    trainer = res["trainer"]
    assert trainer.mesh is not None
    assert getattr(trainer, "_device_epochs", None), (
        "fast path did not activate on the mesh"
    )
    # the whole-epoch program must hand back the state in the trainer's
    # committed shardings (out_shardings pin — GSPMD would otherwise
    # replicate the tables and silently undo the 'model' row sharding)
    import jax as _jax

    def check(p, sh):
        assert p.sharding == sh, (p.shape, p.sharding, sh)

    _jax.tree.map(check, trainer.variables["params"], trainer._p_shard)
    for v in res["test_result"].values():
        assert np.isfinite(float(v))


def test_device_epoch_on_mesh_with_sharded_table(tmp_path):
    """A divisible bucket table stays 'model'-row-sharded through the
    whole-epoch program (out_shardings pin actually exercised)."""
    cfg = _cfg(
        device_epoch=True,
        checkpoint_dir=str(tmp_path),
        mesh={"data": 4, "model": 2},
        row_shard_threshold=8,
        train_batch_size=8,
        inductive_mapper="random",
        add_oov_buckets=True,
        n_user_oov_buckets=8,
        n_item_oov_buckets=8,
    )
    res = run(config_dict=cfg, saved=False)
    trainer = res["trainer"]
    assert getattr(trainer, "_device_epochs", None)
    tbl = trainer.variables["params"]["item_oov_buckets"]["embedding"]
    assert not tbl.sharding.is_fully_replicated, "bucket table should shard"
    for v in res["test_result"].values():
        assert np.isfinite(float(v))


def test_device_oov_epoch_trains_buckets(tmp_path):
    """OOV-only sub-epochs run fully on device: bucket tables move, the
    fast path has both (plain, oov) compiled epochs, metrics finite."""
    cfg = _cfg(
        device_epoch=True,
        checkpoint_dir=str(tmp_path),
        inductive_mapper="random",
        add_oov_buckets=True,
        n_user_oov_buckets=8,
        n_item_oov_buckets=8,
        train_oov=True,
        oov_only_epoch=True,
        oov_train_ratio=1.0,   # keep every step: buckets must move
        oov_feature_mask_rate=0.2,
    )
    res = run(config_dict=cfg, saved=False)
    trainer = res["trainer"]
    keys = set(trainer._device_epochs)
    assert any(k[1] for k in keys), "no OOV device epoch compiled"
    assert any(not k[1] for k in keys), "no plain device epoch compiled"
    for v in res["test_result"].values():
        assert np.isfinite(float(v))


def test_device_oov_epoch_frozen_preserves_iv(tmp_path):
    """frozen OOV device epochs must not touch IV tables."""
    cfg = _cfg(
        device_epoch=True,
        checkpoint_dir=str(tmp_path),
        inductive_mapper="random",
        add_oov_buckets=True,
        n_user_oov_buckets=8,
        n_item_oov_buckets=8,
        train_oov=True,
        oov_only_epoch=True,
        oov_train_ratio=1.0,
        oov_feature_mask_rate=0.0,
        oov_freeze_embedding=True,
        epochs=1,
    )
    from oovrec_tpu.cli.quick_start import build_model_and_state
    from oovrec_tpu.train.trainer import Trainer

    c = Config(config_dict=cfg)
    ds = create_dataset(c)
    train_loader, valid_loader, _ = data_preparation(c, ds)
    template = train_loader._make_batch(np.arange(2))
    model, variables, estate = build_model_and_state(
        c, ds, template_batch=template
    )
    trainer = Trainer(c, model, variables, estate)
    iv_before = np.asarray(
        trainer.variables["params"]["item_embedding"]["embedding"]
    ).copy()
    bk_before = np.asarray(
        trainer.variables["params"]["item_oov_buckets"]["embedding"]
    ).copy()
    trainer.fit(train_loader, None, saved=False)
    keys = set(trainer._device_epochs)
    assert any(k[1] and k[2] for k in keys), "frozen OOV epoch not on device"
    bk_after = np.asarray(
        trainer.variables["params"]["item_oov_buckets"]["embedding"]
    )
    # buckets only move in OOV epochs (plain epochs never route OOV)
    assert not np.allclose(bk_before, bk_after), "buckets did not train"
    # run ONE more frozen OOV device epoch directly: IV must stay put
    de = trainer._device_epochs[(id(train_loader), True, True)]
    from oovrec_tpu.eval.runner import _device_estate

    iv0 = np.asarray(
        trainer.variables["params"]["item_embedding"]["embedding"]
    ).copy()
    import jax as _jax

    params, extra, opt, _, _ = de.run(
        trainer.variables["params"],
        {k: v for k, v in trainer.variables.items() if k != "params"},
        trainer.opt_state, _device_estate(trainer.estate),
        _jax.random.PRNGKey(5), 1000,
    )
    iv1 = np.asarray(params["item_embedding"]["embedding"])
    np.testing.assert_array_equal(iv0, iv1)
    bk1 = np.asarray(params["item_oov_buckets"]["embedding"])
    assert not np.allclose(bk_after, bk1), "buckets frozen too"


def test_device_hash_parity_with_host():
    """ops/inthash_device must be bit-exact vs the host hash family for
    prime-padded OOV ids (the device OOV sub-epoch's bucket source)."""
    from oovrec_tpu.inductive.hashes import hash_ids
    from oovrec_tpu.ops.inthash_device import sim_buckets_device

    PRIME = 112062759511
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 2**31 - 1, 4096).astype(np.int32)
    for fn in ("mod", "3round", "fast", "64bit"):
        for n_orig, B in ((1801, 200), (100, 16), (7, 65536)):
            host = hash_ids(ids.astype(np.int64) + PRIME - n_orig, B, fn)
            dev = np.asarray(jax.jit(
                lambda i, n_orig=n_orig, B=B, fn=fn: sim_buckets_device(
                    i, n_orig, B, fn, PRIME
                )
            )(jnp.asarray(ids)))
            np.testing.assert_array_equal(host, dev, err_msg=f"{fn} {B}")


def test_plain_mode_device_epoch_gru4rec(tmp_path):
    """Sequential CE training (plain mode, no negatives) runs as a
    device-resident epoch and learns."""
    from tests.test_sequential import _cfg as seq_cfg

    cfg = seq_cfg("GRU4Rec", epochs=2, device_epoch=True,
                  checkpoint_dir=str(tmp_path))
    res = run(config_dict=cfg, saved=False)
    trainer = res["trainer"]
    assert getattr(trainer, "_device_epochs", None), (
        "plain-mode fast path did not activate"
    )
    for v in res["test_result"].values():
        assert np.isfinite(float(v))


def test_repeatable_sampler_skips_bitmap(tmp_path):
    """A repeatable sampler (no used-pair avoidance) gets plain uniform
    draws — the DeviceEpoch carries no bitmap."""
    from oovrec_tpu.train.device_epoch import DeviceEpoch

    cfg = Config(config_dict=_cfg(device_epoch=True,
                                  checkpoint_dir=str(tmp_path)))
    ds = create_dataset(cfg)
    train_loader, _, _ = data_preparation(cfg, ds)
    train_loader.sampler.repeatable = True

    from oovrec_tpu.cli.quick_start import build_model_and_state
    from oovrec_tpu.train.trainer import Trainer

    template = train_loader._make_batch(np.arange(2))
    model, variables, estate = build_model_and_state(
        cfg, ds, template_batch=template
    )
    trainer = Trainer(cfg, model, variables, estate)
    de = DeviceEpoch(trainer, train_loader)
    assert de.bitmap is None
    out = de.run(
        trainer.variables["params"],
        {}, trainer.opt_state, {}, jax.random.PRNGKey(0), 0,
    )
    assert np.isfinite(float(out[3]))


def test_pointwise_device_epoch_widedeep(tmp_path):
    """CTR (pointwise 1-neg) training runs device-resident: inter columns
    tiled, on-device feature joins, generated labels — metrics finite and
    comparable to the host path."""
    from tests.test_context_models import _ranking_cfg

    base = _ranking_cfg("WideDeep", epochs=2)
    base["checkpoint_dir"] = str(tmp_path)
    host = run(config_dict={**base, "device_epoch": False}, saved=False)
    dev = run(config_dict={**base, "device_epoch": True}, saved=False)
    assert getattr(dev["trainer"], "_device_epochs", None), (
        "pointwise fast path did not activate"
    )
    assert not getattr(host["trainer"], "_device_epochs", None)
    h, d = host["test_result"], dev["test_result"]
    assert set(h) == set(d)
    for k in d:
        assert np.isfinite(float(d[k]))
    # same protocol, different RNG streams: loose quality band
    assert abs(h["rmse"] - d["rmse"]) < 0.3


def test_dhe_device_epoch_engages(tmp_path):
    """Round-3: `dhe_on_device: true` configs get device epochs — the
    epoch program attaches uint32 id halves of the effective
    (prime-padded when flagged) id and the model SipHashes on device
    (`dh_embedder.py:122-152` semantics). Host-side hashing still forces
    the host pipeline (memoized numpy SipHash can't live inside jit)."""
    from tests.test_inductive import _ind_cfg

    def dhe_cfg(on_device, **over):
        return _ind_cfg(
            checkpoint_dir=str(tmp_path),
            inductive_embedder="dhe",
            inductive_mapper=None,
            add_oov_buckets=False,
            epochs=2,
            dhe_num_hashes=8,
            dhe_layer_size=16,
            hash_key_dir=str(tmp_path / "hash_keys"),
            dhe_on_device=on_device,
            device_epoch=True,
            **over,
        )

    # host hashing: the gate must refuse
    res_host = run(config_dict=dhe_cfg(False), saved=False)
    assert not getattr(res_host["trainer"], "_device_epochs", None)

    # on-device hashing: plain AND OOV sub-epochs compile on device
    res = run(config_dict=dhe_cfg(True, oov_train_ratio=1.0), saved=True)
    trainer = res["trainer"]
    keys = set(getattr(trainer, "_device_epochs", {}) or {})
    assert any(not k[1] for k in keys), "no plain device epoch compiled"
    assert any(k[1] for k in keys), "no OOV device epoch compiled"
    # the DHE tower trained during the device OOV epochs
    params = trainer.variables["params"]
    assert "user_oov_mlp" in params
    for v in res["test_result"].values():
        assert np.isfinite(float(v))
    # and the inductive eval consumes the checkpoint end-to-end
    from oovrec_tpu.cli.inductive_eval import perform_inductive_eval

    results = perform_inductive_eval(
        res["dataset"], res["trainer"].saved_model_file, config=res["config"]
    )
    assert "recall@3" in results["overall"]


def test_device_epoch_dhe_padded_halves_bit_exact():
    """The epoch program's uint32-pair (id + prime_pad) equals the host
    split of the int64 sum for ids spanning the full vocab range."""
    from oovrec_tpu.ops.siphash_device import split_ids

    prime_pad = 112062759511
    ids = np.array([0, 1, 7, 2**20, 2**31 - 1], np.int64)
    # device formula (train/device_epoch.py add_dhe)
    u = jnp.asarray(ids.astype(np.int32)).astype(jnp.uint32)
    PAD_LO = jnp.uint32(prime_pad & 0xFFFFFFFF)
    PAD_HI = jnp.uint32(prime_pad >> 32)
    plo = u + PAD_LO
    carry = (plo < PAD_LO).astype(jnp.uint32)
    phi = PAD_HI + carry
    lo_h, hi_h = split_ids(ids + prime_pad)
    assert (np.asarray(plo, np.uint32) == lo_h.view(np.uint32)).all()
    assert (np.asarray(phi, np.uint32) == hi_h.view(np.uint32)).all()


def test_popularity_device_epoch_engages(tmp_path):
    """Popularity negative sampling (`ref:sampler.py:78-99`,
    counts**alpha) rides the device fast path as an O(1) alias-table
    draw (data/alias.py; round-5 replacement of the round-4 inverse-CDF
    searchsorted). The carried table must reconstruct the host sampler's
    pop_p exactly."""
    cfg = _cfg(
        device_epoch=True, checkpoint_dir=str(tmp_path),
        train_neg_sample_args={
            "distribution": "popularity", "sample_num": 1, "alpha": 1.0,
        },
    )
    res = run(config_dict=cfg, saved=False)
    trainer = res["trainer"]
    assert getattr(trainer, "_device_epochs", None), (
        "popularity config did not engage the device epoch"
    )
    de = next(iter(trainer._device_epochs.values()))
    assert de.pop_tab is not None
    assert np.isfinite(float(res["test_result"]["ndcg@5"]))
    from oovrec_tpu.data.alias import reconstruct_p

    prob, alias = (np.asarray(t) for t in de.pop_tab)
    p_hat = reconstruct_p(prob, alias)
    np.testing.assert_allclose(p_hat.sum(), 1.0, atol=1e-9)
    assert p_hat[0] == 0.0, "PAD must carry zero popularity mass"


def test_device_popularity_draw_matches_host_distribution():
    """The alias-table draw reproduces the host popularity distribution:
    (a) the table decomposition reconstructs p EXACTLY (Walker
    invariant), (b) empirical device-draw frequencies track pop_p, and
    (c) PAD (item 0, pop_p=0) is never drawn."""
    from oovrec_tpu.data.alias import (
        alias_draw, build_alias_table, reconstruct_p,
    )

    rng = np.random.default_rng(5)
    counts = rng.integers(1, 50, size=32).astype(np.float64)
    counts[0] = 0.0
    p = counts / counts.sum()
    prob, alias = build_alias_table(p)
    np.testing.assert_allclose(reconstruct_p(prob, alias), p, atol=1e-7)
    key = jax.random.key(3)
    draws = np.asarray(
        alias_draw(key, (200_000,), jnp.asarray(prob), jnp.asarray(alias))
    )
    assert (draws > 0).all() and (draws < 32).all()
    freq = np.bincount(draws, minlength=32) / len(draws)
    np.testing.assert_allclose(freq, p, atol=5e-3)


def test_pointwise_times4_device_epoch(tmp_path):
    """times > 2 (3 negatives per positive) engages the widened pointwise
    device epoch: columns tiled ×4, [pos ∥ negs] item layout, labels
    [1,0,0,0] — finite metrics, comparable to the host path."""
    from tests.test_context_models import _ranking_cfg

    base = _ranking_cfg("WideDeep", epochs=2)
    base["checkpoint_dir"] = str(tmp_path)
    base["train_neg_sample_args"] = {
        "distribution": "uniform", "sample_num": 3,
    }
    host = run(config_dict={**base, "device_epoch": False}, saved=False)
    dev = run(config_dict={**base, "device_epoch": True}, saved=False)
    assert getattr(dev["trainer"], "_device_epochs", None), (
        "times=4 pointwise fast path did not activate"
    )
    de = next(iter(dev["trainer"]._device_epochs.values()))
    assert de.times == 4
    h, d = host["test_result"], dev["test_result"]
    assert set(h) == set(d)
    for k in d:
        assert np.isfinite(float(d[k]))
    assert abs(h["rmse"] - d["rmse"]) < 0.3
