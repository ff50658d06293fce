"""Jitted full-sort / sampled-negative scoring steps.

The retrieval eval kernel: score a block of users against the item corpus,
mask PAD + history, build the positive matrix, take top-k — all on device
in one compiled function (the reference materializes score matrices and
calls torch.topk per batch, `trainer.py:526-564`, `inductive/evaluator.py:70-95`).
Only the small (U, maxk) hit matrices travel back to the host.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -jnp.inf


def apply_masks(scores, hist_items, hist_len):
    """PAD + history −inf masking (shared by top-k and meanrank paths)."""
    U = scores.shape[0]
    H = hist_items.shape[1]
    row = jnp.arange(U)[:, None]
    scores = scores.at[:, 0].set(NEG_INF)
    hist_valid = jnp.arange(H)[None, :] < hist_len[:, None]
    return scores.at[row, hist_items].min(
        jnp.where(hist_valid, NEG_INF, jnp.inf)
    )


def mask_and_topk(
    scores: jnp.ndarray,        # (U, N)
    hist_items: jnp.ndarray,    # (U, H) padded with 0
    hist_len: jnp.ndarray,      # (U,)
    pos_items: jnp.ndarray,     # (U, P) padded with 0
    pos_len: jnp.ndarray,       # (U,)
    maxk: int,
    perm: Optional[jnp.ndarray] = None,  # (N,) tie-break permutation
    item_mask: Optional[jnp.ndarray] = None,  # (N,) 1 = keep column
):
    """PAD/history masking + positive matrix + top-k.

    Masking mirrors `evaluator.py:92-94` (scores[:,0]=-inf; history→-inf).
    `perm` implements the FilteredCollector's perturbed-hits tie-breaking
    (`filtered_collector.py:38-55`): top-k runs on column-permuted scores
    and indices map back through the permutation.
    `item_mask` restricts the corpus to an item slice (old/new split).
    Returns (topk_idx, pos_idx, slice_pos_len) each (U, k)/(U,).
    """
    U, N = scores.shape
    H = hist_items.shape[1]
    P = pos_items.shape[1]
    row = jnp.arange(U)[:, None]

    scores = scores.at[:, 0].set(NEG_INF)
    hist_valid = jnp.arange(H)[None, :] < hist_len[:, None]
    scores = scores.at[row, hist_items].min(
        jnp.where(hist_valid, NEG_INF, jnp.inf)
    )
    if item_mask is not None:
        scores = jnp.where(item_mask[None, :] > 0, scores, NEG_INF)

    pos_valid = jnp.arange(P)[None, :] < pos_len[:, None]
    if item_mask is not None:
        pos_valid = pos_valid & (item_mask[pos_items] > 0)
    pos_matrix = jnp.zeros((U, N), jnp.int32)
    pos_matrix = pos_matrix.at[row, pos_items].max(pos_valid.astype(jnp.int32))
    pos_matrix = pos_matrix.at[:, 0].set(0)
    slice_pos_len = jnp.sum(pos_valid, axis=1)

    k_eff = min(maxk, N)  # tiny corpora: ranks beyond N can never be hits
    if perm is not None:
        _, topk_p = jax.lax.top_k(scores[:, perm], k_eff)
        topk_idx = perm[topk_p]
    else:
        _, topk_idx = jax.lax.top_k(scores, k_eff)
    pos_idx = jnp.take_along_axis(pos_matrix, topk_idx, axis=1)
    if k_eff < maxk:
        pad = jnp.zeros((U, maxk - k_eff), topk_idx.dtype)
        topk_idx = jnp.concatenate([topk_idx, pad], axis=1)
        pos_idx = jnp.concatenate([pos_idx, pad.astype(pos_idx.dtype)], axis=1)
    return topk_idx, pos_idx, slice_pos_len


def variant_topk(
    scores: jnp.ndarray,        # (U, N) raw scores
    hist_items: jnp.ndarray,    # (U, H) padded with 0
    hist_len: jnp.ndarray,      # (U,)
    pos_items: jnp.ndarray,     # (U, P) padded with 0
    pos_len: jnp.ndarray,       # (U,)
    maxk: int,
    perms: jnp.ndarray,         # (V, N) per-variant tie-break permutations
    item_masks: jnp.ndarray,    # (V, N) per-variant 1 = keep column
):
    """All V slice variants of one score matrix in a single fused pass.

    The 7-slice inductive evaluator needs top-k of the SAME masked scores
    under V item-mask/permutation variants (full / old-items / new-items,
    `collector_filter.py:157-177` + `filtered_collector.py:38-55`). Doing
    that as V independent `mask_and_topk` calls re-compiles and re-executes
    the PAD/history scatter and the positive-matrix scatter V times; here
    they run once and only the cheap mask+top_k tail is vmapped over the
    variant axis, so XLA compiles one batched top_k instead of V.

    Returns (topk_idx, pos_idx, slice_pos_len) with leading axis V.
    """
    U, N = scores.shape
    P = pos_items.shape[1]
    row = jnp.arange(U)[:, None]

    masked = apply_masks(scores, hist_items, hist_len)       # once
    pos_valid = jnp.arange(P)[None, :] < pos_len[:, None]
    pos_matrix = jnp.zeros((U, N), jnp.int32)
    pos_matrix = pos_matrix.at[row, pos_items].max(
        pos_valid.astype(jnp.int32)
    )
    pos_matrix = pos_matrix.at[:, 0].set(0)                   # once

    k_eff = min(maxk, N)

    def one(perm, imask):
        s = jnp.where(imask[None, :] > 0, masked, NEG_INF)
        _, topk_p = jax.lax.top_k(s[:, perm], k_eff)
        topk_idx = perm[topk_p]
        # indices outside the slice can only surface when the slice has
        # fewer than k live columns; the gather below must not count them
        in_slice = imask[topk_idx] > 0
        pos_idx = jnp.take_along_axis(pos_matrix, topk_idx, axis=1)
        pos_idx = jnp.where(in_slice, pos_idx, 0)
        slice_pos_len = jnp.sum(
            pos_valid & (imask[pos_items] > 0), axis=1
        )
        return topk_idx, pos_idx, slice_pos_len

    topk_idx, pos_idx, slice_len = jax.vmap(one)(perms, item_masks)
    if k_eff < maxk:
        V = perms.shape[0]
        pad = jnp.zeros((V, U, maxk - k_eff), topk_idx.dtype)
        topk_idx = jnp.concatenate([topk_idx, pad], axis=2)
        pos_idx = jnp.concatenate([pos_idx, pad.astype(pos_idx.dtype)], axis=2)
    return topk_idx, pos_idx, slice_len


def variant_matrix_topk(
    mat: jnp.ndarray,           # (U, N) pre-scattered scores (−inf unscored)
    pos_matrix: jnp.ndarray,    # (U, N) 0/1 positives
    maxk: int,
    perms: jnp.ndarray,         # (V, N)
    item_masks: jnp.ndarray,    # (V, N)
):
    """`variant_topk` for the sampled-negative path: V slice variants of
    one pre-scattered score matrix in a single vmapped top_k."""
    U, N = mat.shape
    k_eff = min(maxk, N)

    def one(perm, imask):
        m = jnp.where(imask[None, :] > 0, mat, NEG_INF)
        pm = pos_matrix * imask[None, :]
        _, topk_p = jax.lax.top_k(m[:, perm], k_eff)
        topk_idx = perm[topk_p]
        pos_idx = jnp.take_along_axis(pm, topk_idx, axis=1)
        return topk_idx, pos_idx, jnp.sum(pm, axis=1)

    topk_idx, pos_idx, pos_len = jax.vmap(one)(perms, item_masks)
    if k_eff < maxk:
        V = perms.shape[0]
        pad = jnp.zeros((V, U, maxk - k_eff), topk_idx.dtype)
        topk_idx = jnp.concatenate([topk_idx, pad], axis=2)
        pos_idx = jnp.concatenate([pos_idx, pad.astype(pos_idx.dtype)], axis=2)
    return topk_idx, pos_idx, pos_len


def matrix_topk(
    mat: jnp.ndarray,           # (U, N) score matrix (−inf where unscored)
    pos_matrix: jnp.ndarray,    # (U, N) 0/1 positives
    maxk: int,
    perm: Optional[jnp.ndarray] = None,
    item_mask: Optional[jnp.ndarray] = None,
):
    """Perturbed top-k over a pre-scattered score matrix (the sampled-
    negative inductive path: `neg_sample_batch_eval` + FilteredCollector)."""
    U, N = mat.shape
    if item_mask is not None:
        mat = jnp.where(item_mask[None, :] > 0, mat, NEG_INF)
        pos_matrix = pos_matrix * item_mask[None, :]
    pos_len = jnp.sum(pos_matrix, axis=1)
    k_eff = min(maxk, N)
    if perm is not None:
        _, topk_p = jax.lax.top_k(mat[:, perm], k_eff)
        topk_idx = perm[topk_p]
    else:
        _, topk_idx = jax.lax.top_k(mat, k_eff)
    pos_idx = jnp.take_along_axis(pos_matrix, topk_idx, axis=1)
    if k_eff < maxk:
        pad = jnp.zeros((U, maxk - k_eff), topk_idx.dtype)
        topk_idx = jnp.concatenate([topk_idx, pad], axis=1)
        pos_idx = jnp.concatenate([pos_idx, pad.astype(pos_idx.dtype)], axis=1)
    return topk_idx, pos_idx, pos_len


def scatter_scores(
    row_user: jnp.ndarray,      # (R,) batch-local user slot per scored row
    item_ids: jnp.ndarray,      # (R,)
    scores: jnp.ndarray,        # (R,)
    weight: jnp.ndarray,        # (R,)
    n_users: int,
    n_items: int,
):
    """Sampled-negative eval: scatter row scores into a (U, n_items) −inf
    matrix (`trainer.py:547-564` `_neg_sample_batch_eval`)."""
    mat = jnp.full((n_users, n_items), NEG_INF, scores.dtype)
    # padded rows all target slot 0/item 0 with weight 0 — send them to a
    # dummy row instead so they can't collide with real scores
    safe_row = jnp.where(weight > 0, row_user, n_users - 1)
    safe_item = jnp.where(weight > 0, item_ids, 0)
    mat = mat.at[safe_row, safe_item].max(
        jnp.where(weight > 0, scores, NEG_INF)
    )
    return mat


def positives_matrix(
    positive_u: jnp.ndarray, positive_i: jnp.ndarray,
    positive_weight: jnp.ndarray, n_users: int, n_items: int,
):
    mat = jnp.zeros((n_users, n_items), jnp.int32)
    mat = mat.at[positive_u, positive_i].max(
        (positive_weight > 0).astype(jnp.int32)
    )
    mat = mat.at[:, 0].set(0)
    return mat
