"""SipHash-2-4 + DHE/fDHE/DNN/KNN embedder tests."""

import json
import os

import numpy as np
import pytest

from oovrec_tpu.cli.quick_start import run
from oovrec_tpu.cli.inductive_eval import perform_inductive_eval
from oovrec_tpu.inductive.dhe import MAX_HASH, DHEHasher
from oovrec_tpu.ops.siphash import (
    _siphash24_numpy,
    keys_to_u64,
    siphash24_batch,
    siphash24_py,
)

from tests.test_inductive import _ind_cfg


def test_siphash_known_vectors():
    """Canonical SipHash-2-4 vectors (key 000102..0f)."""
    key = bytes(range(16))
    # empty message: the classic 0x726fdb47dd0e0e31
    assert int.from_bytes(siphash24_py(key, b""), "little") == 0x726FDB47DD0E0E31
    # 8-byte message 00..07
    assert (
        int.from_bytes(siphash24_py(key, bytes(range(8))), "little")
        == 0x93F5F5799A932462
    )


def test_numpy_matches_python_oracle():
    rng = np.random.Generator(np.random.PCG64(5))
    keys_b = [rng.bytes(16) for _ in range(7)]
    keys = keys_to_u64(keys_b)
    ids = rng.integers(0, 2**62, size=50, dtype=np.int64).astype(np.uint64)
    got = _siphash24_numpy(ids, keys)
    for i, v in enumerate(ids):
        msg = int(v).to_bytes(8, "little")
        for k, kb in enumerate(keys_b):
            expect = int.from_bytes(siphash24_py(kb, msg), "little")
            assert got[i, k] == expect


def test_native_matches_numpy():
    rng = np.random.Generator(np.random.PCG64(6))
    keys = keys_to_u64([rng.bytes(16) for _ in range(16)])
    ids = rng.integers(0, 2**62, size=200, dtype=np.int64).astype(np.uint64)
    from oovrec_tpu.ops import siphash as sp

    native = sp._load_native()
    if native is None:
        pytest.skip("native siphash lib unavailable")
    got = siphash24_batch(ids, keys)  # uses native
    ref = _siphash24_numpy(ids, keys)
    np.testing.assert_array_equal(got, ref)


def test_dhe_hasher_key_file_roundtrip(tmp_path):
    h1 = DHEHasher(8, str(tmp_path))
    h2 = DHEHasher(8, str(tmp_path))  # reloads same file
    np.testing.assert_array_equal(h1.keys, h2.keys)
    # file format compatible with the reference (hex json list)
    with open(os.path.join(str(tmp_path), "8.hashes")) as f:
        keys = json.load(f)
    assert len(keys) == 8 and all(len(k) == 32 for k in keys)
    ids = np.array([1, 2, 112062759512], dtype=np.int64)
    out = h1.hash_ids(ids)
    assert out.shape == (3, 8)
    assert (out >= 0).all() and (out < MAX_HASH).all()
    # memoization stable
    np.testing.assert_array_equal(out, h1.hash_ids(ids))


def test_dhe_matches_reference_semantics(tmp_path):
    """digest = little-endian u64 of siphash24(key, id.to_bytes(8,'little'))
    % 2^24 (`dh_embedder.py:137`)."""
    h = DHEHasher(4, str(tmp_path))
    with open(os.path.join(str(tmp_path), "4.hashes")) as f:
        keys_b = [bytes.fromhex(x) for x in json.load(f)]
    ids = np.array([0, 42, 112062759553], dtype=np.int64)
    got = h.hash_ids(ids)
    for i, v in enumerate(ids):
        msg = int(v).to_bytes(8, "little")
        for k, kb in enumerate(keys_b):
            expect = int.from_bytes(siphash24_py(kb, msg), "little") % MAX_HASH
            assert got[i, k] == float(expect)


@pytest.mark.parametrize("embedder", ["dhe", "fdhe", "dnn", "knn"])
def test_embedder_end_to_end(embedder, tmp_path):
    cfg = _ind_cfg(
        checkpoint_dir=str(tmp_path),
        inductive_embedder=embedder,
        inductive_mapper=None,
        add_oov_buckets=False,
        epochs=2,
        dhe_num_hashes=8,
        dhe_layer_size=16,
        hash_key_dir=str(tmp_path / "hash_keys"),
    )
    res = run(config_dict=cfg, saved=True)
    results = perform_inductive_eval(
        res["dataset"], res["trainer"].saved_model_file, config=res["config"]
    )
    assert "recall@3" in results["overall"]
    if embedder in ("dhe", "fdhe", "dnn"):
        # the embedder MLP trained during OOV epochs
        params = res["trainer"].variables["params"]
        assert "user_oov_mlp" in params


def test_device_siphash_bit_exact():
    """ops/siphash_device.py: uint32-pair SipHash-2-4 equals the host
    implementation bit-for-bit, including prime-padded id range."""
    from oovrec_tpu.ops.siphash import siphash24_batch
    from oovrec_tpu.ops.siphash_device import (
        dhe_codes_device, siphash24_u32, split_ids, split_keys)
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    keys = rng.integers(0, 2**64, (16, 2), dtype=np.uint64)
    ids = np.concatenate([
        rng.integers(0, 2**31, 64).astype(np.int64),
        rng.integers(0, 2**40, 64).astype(np.int64) + 112062759511,
    ])
    host = siphash24_batch(ids.astype(np.uint64), keys)
    lo, hi = split_ids(ids)
    kp = split_keys(keys)
    dlo, dhi = siphash24_u32(jnp.asarray(lo), jnp.asarray(hi), *kp)
    dev = (np.asarray(dhi, np.uint64) << np.uint64(32)) | np.asarray(
        dlo, np.uint64)
    assert (dev == host).all()
    codes = np.asarray(dhe_codes_device(jnp.asarray(lo), jnp.asarray(hi), kp))
    assert (codes == (host % np.uint64(MAX_HASH)).astype(np.float32)).all()


@pytest.mark.parametrize("embedder", ["dhe", "fdhe"])
def test_embedder_on_device_hashing(embedder, tmp_path):
    """dhe_on_device: the jitted step hashes id halves on-device; results
    stay a valid end-to-end pipeline (same keys as the host path)."""
    cfg = _ind_cfg(
        checkpoint_dir=str(tmp_path),
        inductive_embedder=embedder,
        inductive_mapper=None,
        add_oov_buckets=False,
        epochs=2,
        dhe_num_hashes=8,
        dhe_layer_size=16,
        hash_key_dir=str(tmp_path / "hash_keys"),
        dhe_on_device=True,
    )
    res = run(config_dict=cfg, saved=True)
    results = perform_inductive_eval(
        res["dataset"], res["trainer"].saved_model_file, config=res["config"]
    )
    assert "recall@3" in results["overall"]
