"""Fused top-k scoring kernel: exactness vs the dense XLA reference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from oovrec_tpu.ops.topk_score import (
    _plane_coords,
    build_hist_bitmap,
    fused_topk_scores,
)


def _dense_reference(u, it, hist, hist_len, k):
    scores = np.asarray(u @ it.T, dtype=np.float32)
    scores[:, 0] = -np.inf
    for b in range(scores.shape[0]):
        scores[b, hist[b, : hist_len[b]]] = -np.inf
    idx = np.argsort(-scores, axis=1, kind="stable")[:, :k]
    vals = np.take_along_axis(scores, idx, axis=1)
    return vals, idx


@pytest.mark.parametrize("B,N,D,k", [(8, 300, 32, 10), (13, 1000, 64, 20)])
def test_fused_topk_matches_dense(B, N, D, k):
    tn = 256
    rng = np.random.Generator(np.random.PCG64(11))
    u = rng.standard_normal((B, D)).astype(np.float32)
    it = rng.standard_normal((N, D)).astype(np.float32)
    hist = np.zeros((B, 5), np.int64)
    hist_len = rng.integers(0, 5, B)
    for b in range(B):
        hist[b, : hist_len[b]] = rng.choice(
            np.arange(1, N), size=hist_len[b], replace=False
        )
    bm = build_hist_bitmap(jnp.asarray(hist), jnp.asarray(hist_len), N, tn=tn)
    vals, idx = fused_topk_scores(
        jnp.asarray(u), jnp.asarray(it), bm, k=k, tn=tn, interpret=True
    )
    ref_vals, ref_idx = _dense_reference(u, it, hist, hist_len, k)
    np.testing.assert_allclose(np.asarray(vals), ref_vals, rtol=1e-5, atol=1e-5)
    # indices may differ on exact ties; verify score equality instead
    got_scores = np.take_along_axis(
        np.asarray(u @ it.T), np.asarray(idx), axis=1
    )
    np.testing.assert_allclose(got_scores, ref_vals, rtol=1e-5, atol=1e-5)
    # masked entries never surface
    for b in range(B):
        masked = set(hist[b, : hist_len[b]].tolist()) | {0}
        assert not (set(np.asarray(idx)[b].tolist()) & masked)


def test_bitmap_builder_plane_layout():
    tn = 256  # builder clamps to >= 128 two-power window
    n_items = 300
    hist = jnp.asarray([[3, 40, 260], [0, 0, 0]])
    hist_len = jnp.asarray([3, 0])
    bm = np.asarray(build_hist_bitmap(hist, hist_len, n_items, tn=tn))

    def bit_at(row, item):
        w, b = _plane_coords(jnp.asarray([item]), tn)
        return (bm[row, int(w[0])] >> int(b[0])) & 1

    for item in (3, 40, 260):
        assert bit_at(0, item) == 1
        if item != 0:
            assert bit_at(1, item) == 0 or item >= n_items
    # PAD and padded tail always masked, for every row
    for row in (0, 1):
        assert bit_at(row, 0) == 1
        assert bit_at(row, n_items) == 1
        assert bit_at(row, bm.shape[1] * 32 - 1) == 1
    # a random in-range unmasked item
    assert bit_at(1, 100) == 0


def test_pack_bitplane_matches_plane_coords():
    """pack_bitplane's reshape/shift layout must agree bit-for-bit with
    the scatter-based `_plane_coords` convention the kernel reads."""
    from oovrec_tpu.ops.topk_score import pack_bitplane

    tn = 256
    n = 300
    rng = np.random.default_rng(7)
    mask = rng.integers(0, 2, n).astype(np.int32)
    packed = np.asarray(pack_bitplane(jnp.asarray(mask), tn=tn))
    for item in rng.choice(n, 64, replace=False):
        w, b = _plane_coords(jnp.asarray([int(item)]), tn)
        assert ((packed[int(w[0])] >> int(b[0])) & 1) == mask[item], item
    # padded tail stays zero (exclusion there is the hist bitmap's job)
    wpad, bpad = _plane_coords(jnp.asarray([n]), tn)
    assert ((packed[int(wpad[0])] >> int(bpad[0])) & 1) == 0
