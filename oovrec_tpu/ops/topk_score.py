"""Fused full-corpus retrieval scoring kernel (Pallas TPU).

The retrieval eval hot path is `scores = U @ Iᵀ` over the whole item
corpus followed by PAD/history masking and top-k
(`bpr.py:151-156` + `evaluator.py:91-95` in the reference). XLA executes
that as: materialize the (B, N) score matrix in HBM, read it back for
masking, read it again for top_k — 3× HBM traffic on a matrix that is
pure intermediate.

This kernel keeps each (TU × TN) score block in VMEM and reduces it to k
candidates before anything touches HBM:

  grid (user_tiles, item_blocks):
    scores_blk = U_tile @ I_blkᵀ                (MXU)
    mask       = per-user packed bitmap         (history ∪ PAD, 1 bit/item)
    candidates = k-round max+suppress           (VPU)
  output: (B, n_blocks, k) values + global indices  — N/TN·k ≪ N

A final `lax.top_k` over the (B, n_blocks·k) candidates yields the exact
global top-k (every true top-k element is a top-k element of its block).
HBM traffic drops from O(B·N·3) to O(B·N/32 + B·n_blocks·k) beyond the
unavoidable item-table read.

The packed `hist_bitmap` ((B, N/32) int32) replaces the reference's
scatter of -inf into the dense matrix; `build_hist_bitmap` constructs it
from the padded per-user history lists. The bitmap uses a per-block
BIT-PLANE layout chosen for the TPU vector unit: within an item block of
TN items (W_b = TN/32 words), item l lives in word (l mod W_b) at bit
(l div W_b) — so the in-kernel expansion is a single native lane-tile
(`pltpu.repeat`) plus a vector shift, with no cross-lane element repeat.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(-3.0e38)


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _resolve_tn(tn: int, n_items: int) -> int:
    """Clamp the item-tile size. At large corpora the per-block bitmap
    slice offset is (tn/32)·block; Mosaic must prove it 128-aligned, so
    keep tn/32 ≥ 128 (tn ≥ 4096) whenever the corpus allows."""
    cap = max(128, 1 << (n_items - 1).bit_length())
    tn = min(tn, cap)
    if cap >= 4096:
        tn = max(tn, 4096)
    return tn


def _kernel(u_ref, it_ref, bm_ref, vals_ref, idx_ref, *, k: int, tn: int):
    j = pl.program_id(0)  # item-block axis (slow): item tile loads ONCE
                          # per block and is reused across all user tiles
    u = u_ref[...]                       # (TU, D)
    it = it_ref[...]                     # (TN, D)
    scores = jax.lax.dot_general(
        u, it, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                    # (TU, TN)

    # bit-plane mask unpack: this block's W_b words ride in the full
    # bitmap row; lane l reads bit (l // W_b) of word (l mod W_b), so the
    # word vector is just the 32-fold lane-tile of the W_b words.
    wb = tn // 32
    words = bm_ref[:, pl.ds(j * wb, wb)]  # (TU, W_b) int32
    tu = scores.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (tu, tn), 1)
    w = pltpu.repeat(words, repeats=32, axis=1)  # tile → word (l mod W_b)
    bit = lane // wb
    # (w >> b) & 1 extracts bit b under arithmetic shift too (sign
    # extension only fills bits above the mask)
    masked = ((w >> bit) & 1) == 1
    scores = jnp.where(masked, NEG_INF, scores)

    # k rounds of (row max+argmax, suppress) → per-block top-k candidates
    base = j * tn
    for i in range(k):
        m = jnp.max(scores, axis=1)                           # (TU,)
        pos = jnp.argmax(scores, axis=1).astype(jnp.int32)    # (TU,)
        vals_ref[0, :, i] = m
        idx_ref[0, :, i] = pos + base
        scores = jnp.where(lane == pos[:, None], NEG_INF, scores)


@functools.partial(
    jax.jit, static_argnames=("k", "tn", "tu", "interpret")
)
def fused_topk_scores(
    user_e: jnp.ndarray,       # (B, D)
    item_e: jnp.ndarray,       # (N, D)
    hist_bitmap: jnp.ndarray,  # (B, Np/32) int32 bit-plane bitmap for this tn
    k: int = 20,
    tn: int = 1024,
    tu: int = 128,   # full MXU row utilization per (tu, D)@(D, tn) tile
    interpret: bool = False,
):
    """Exact top-k of masked U@Iᵀ → (values (B,k), indices (B,k)).

    `hist_bitmap` must come from `build_hist_bitmap(..., tn=tn)` (the
    bit-plane layout is tn-dependent).
    """
    B, D = user_e.shape
    N = item_e.shape[0]
    tn = _resolve_tn(tn, N)
    n_blocks = _cdiv(N, tn)
    k_eff = min(k, tn)

    # pad shapes to tile multiples
    Bp = _cdiv(B, tu) * tu
    Np = n_blocks * tn
    W = Np // 32
    assert hist_bitmap.shape[1] == W, (
        f"bitmap width {hist_bitmap.shape[1]} != {W}; rebuild with tn={tn}"
    )
    u = jnp.zeros((Bp, D), user_e.dtype).at[:B].set(user_e)
    it = jnp.zeros((Np, D), item_e.dtype).at[:N].set(item_e)
    bm = jnp.full((Bp, W), jnp.int32(-1))
    bm = bm.at[:B].set(hist_bitmap.astype(jnp.int32))

    # grid: item blocks on the SLOW axis so each (tn, D) item tile is
    # fetched once and stays in VMEM while every user tile sweeps past —
    # HBM traffic = one pass over the item matrix per batch, not per tile
    grid = (n_blocks, Bp // tu)
    vals, idx = pl.pallas_call(
        functools.partial(_kernel, k=k_eff, tn=tn),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tu, D), lambda j, i: (i, 0)),
            pl.BlockSpec((tn, D), lambda j, i: (j, 0)),
            pl.BlockSpec((tu, W), lambda j, i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, tu, k_eff), lambda j, i: (j, i, 0)),
            pl.BlockSpec((1, tu, k_eff), lambda j, i: (j, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_blocks, Bp, k_eff), jnp.float32),
            jax.ShapeDtypeStruct((n_blocks, Bp, k_eff), jnp.int32),
        ],
        interpret=interpret,
    )(u, it, bm)

    cand_v = vals[:, :B].transpose(1, 0, 2).reshape(B, n_blocks * k_eff)
    cand_i = idx[:, :B].transpose(1, 0, 2).reshape(B, n_blocks * k_eff)
    top_v, pos = jax.lax.top_k(cand_v, min(k, cand_v.shape[1]))
    top_i = jnp.take_along_axis(cand_i, pos, axis=1)
    return top_v, top_i


def _plane_coords(item_ids, tn: int):
    """item id → (word index, bit) in the per-block bit-plane layout."""
    wb = tn // 32
    blk = item_ids // tn
    l = item_ids % tn
    return blk * wb + (l % wb), l // wb


def build_hist_bitmap(
    hist_items: jnp.ndarray,  # (B, H) padded with 0
    hist_len: jnp.ndarray,    # (B,)
    n_items: int,
    tn: int = 1024,
    exclude_col0: bool = True,
) -> jnp.ndarray:
    """Bit-plane exclusion bitmap: history bits ∪ PAD column 0 ∪ pad tail.

    Layout matches `fused_topk_scores(tn=tn)`: within each tn-item block
    (W_b = tn/32 words), item l sets bit (l // W_b) of word (l % W_b).
    `exclude_col0=False` skips the PAD-column bit — used when the item
    axis is permuted (the PAD item no longer sits at position 0; its
    exclusion then rides in the caller's class bitmap instead).
    """
    tn = _resolve_tn(tn, n_items)
    B, H = hist_items.shape
    n_blocks = _cdiv(n_items, tn)
    Np = n_blocks * tn
    W = Np // 32
    valid = jnp.arange(H)[None, :] < hist_len[:, None]
    word, bit = _plane_coords(hist_items, tn)
    contrib = jnp.where(valid, jnp.int32(1) << bit, jnp.int32(0))
    rows = jnp.arange(B)[:, None]
    # add == or here: each item id contributes a distinct (word, bit) and
    # histories are unique per row
    bm = jnp.zeros((B, W), jnp.int32).at[rows, word].add(contrib)
    # PAD column 0 + padded tail [n_items, Np) always excluded
    first = jnp.array([0], jnp.int32) if exclude_col0 else jnp.zeros(
        (0,), jnp.int32
    )
    extra = jnp.concatenate([first, jnp.arange(n_items, Np)])
    ew, eb = _plane_coords(extra, tn)
    tail = jnp.zeros((W,), jnp.int32).at[ew].add(jnp.int32(1) << eb)
    return bm | tail[None, :]


def pack_bitplane(mask: jnp.ndarray, tn: int = 1024) -> jnp.ndarray:
    """Pack a dense (N,) 0/1 exclusion mask into the (W,) bit-plane word
    vector used by `fused_topk_scores` (1 bit per item, tn-dependent
    layout). Pure reshape+shift — no scatter: within each tn-block, item
    l = bit·W_b + word, so a (n_blocks, 32, W_b) reshape puts every bit
    plane on its own axis."""
    n = mask.shape[0]
    tn = _resolve_tn(tn, n)
    n_blocks = _cdiv(n, tn)
    Np = n_blocks * tn
    wb = tn // 32
    m = jnp.zeros((Np,), jnp.int32).at[:n].set(mask.astype(jnp.int32))
    m = m.reshape(n_blocks, 32, wb)
    shifts = jnp.arange(32, dtype=jnp.int32)[None, :, None]
    return jnp.sum(m << shifts, axis=1, dtype=jnp.int32).reshape(-1)
