"""Batch-level transforms (`recbole/data/transform.py:14-309` analog).

`construct_transform(config)` keys on `config['transform']` and accepts the
reference's full name set (`ref transform.py:21-28`):
  * None / 'Equal'                            — identity
  * 'mask_itemseq' / 'MaskItemSequence'       — BERT4Rec-style cloze masking:
    random sequence positions are replaced by the mask token (= n_items, one
    extra row in the item table) and recorded as (positions, original items).
  * 'inverse_itemseq' / 'InverseItemSequence' — right-align each sequence
    (`ref transform.py:195-222`): `[1,2,3,0,0] -> [0,0,1,2,3]`, emitted as
    `Inverse_<seq_field>`.
  * 'crop_itemseq' / 'CropItemSequence'       — random contiguous crop of
    `floor(len*eta)` items (`ref transform.py:225-262`), emitted as
    `Crop_<seq_field>` + its length field.
  * 'reorder_itemseq' / 'ReorderItemSequence' — shuffle a random window of
    `floor(len*beta)` positions (`ref transform.py:265-297`), emitted as
    `Reorder_<seq_field>`.
  * 'user_defined' / 'UserDefinedTransform'   — resolved from the dotted
    path in `config['user_defined_transform']` (the reference's class is an
    empty stub, `ref transform.py:300-305`; here it is actually usable).

All transforms are vectorized numpy batch ops over the fixed-shape
dict-of-arrays batch (no per-row Python loops in the non-mask paths), so
they keep shapes static for the jitted step that consumes them.
"""

from __future__ import annotations

import importlib
from typing import Optional

import numpy as np

from oovrec_tpu.utils.seeding import host_rng


class Equal:
    def __call__(self, batch: dict) -> dict:
        return batch


class MaskItemSequence:
    """Cloze masking over `item_id_list` (`transform.py:44-140` semantics):
    each position masks with `mask_ratio`; at least one position per
    sequence; outputs fixed-capacity `mask_index` / `pos_items` arrays."""

    def __init__(self, config, n_items: int):
        self.mask_ratio = float(config.get("mask_ratio", 0.2))
        self.max_len = int(config["MAX_ITEM_LIST_LENGTH"])
        self.mask_token = n_items  # one past the real vocab
        self.list_field = config["ITEM_ID_FIELD"] + config["LIST_SUFFIX"]
        self.length_field = config["ITEM_LIST_LENGTH_FIELD"]
        self.rng = host_rng(int(config["seed"] or 0), "mask_item_sequence")
        # capacity for masked positions per row
        self.max_masked = max(1, int(self.max_len * self.mask_ratio * 2))

    def __call__(self, batch: dict) -> dict:
        out = dict(batch)
        seq = np.asarray(batch[self.list_field]).copy()
        lengths = np.asarray(batch[self.length_field])
        B, L = seq.shape
        mask_index = np.zeros((B, self.max_masked), np.int64)
        pos_items = np.zeros((B, self.max_masked), np.int64)
        mask_count = np.zeros(B, np.int64)
        for b in range(B):
            n = int(lengths[b])
            if n == 0:
                continue
            flips = np.where(self.rng.random(n) < self.mask_ratio)[0]
            if len(flips) == 0:
                flips = np.array([int(self.rng.integers(0, n))])
            flips = flips[: self.max_masked]
            pos_items[b, : len(flips)] = seq[b, flips]
            mask_index[b, : len(flips)] = flips
            mask_count[b] = len(flips)
            seq[b, flips] = self.mask_token
        out[self.list_field] = seq
        out["mask_index"] = mask_index
        out["mask_pos_items"] = pos_items
        out["mask_count"] = mask_count
        return out


class InverseItemSequence:
    """Right-align each sequence so padding moves to the front
    (`ref transform.py:195-222`): the model can then read "the last K
    events" as a plain tail slice. Deterministic, shape-preserving."""

    def __init__(self, config):
        self.list_field = config["ITEM_ID_FIELD"] + config["LIST_SUFFIX"]
        self.length_field = config["ITEM_LIST_LENGTH_FIELD"]
        self.out_field = "Inverse_" + self.list_field

    def __call__(self, batch: dict) -> dict:
        out = dict(batch)
        seq = np.asarray(batch[self.list_field])
        n = np.asarray(batch[self.length_field]).astype(np.int64)
        _B, L = seq.shape
        # out[b, L-n+j] = seq[b, j]: gather form with source index p-(L-n)
        src = np.arange(L)[None, :] - (L - n)[:, None]
        gathered = np.take_along_axis(seq, np.clip(src, 0, L - 1), axis=1)
        out[self.out_field] = np.where(src >= 0, gathered, 0).astype(seq.dtype)
        return out


class CropItemSequence:
    """Random contiguous crop (`ref transform.py:225-262`): per row keep
    `crop_len = floor(len * eta)` items starting at a uniform offset in
    `[0, len - crop_len]` (inclusive, like the reference's randint), left-
    packed into a fresh sequence; emits the cropped lengths alongside."""

    def __init__(self, config):
        self.list_field = config["ITEM_ID_FIELD"] + config["LIST_SUFFIX"]
        self.length_field = config["ITEM_LIST_LENGTH_FIELD"]
        self.out_field = "Crop_" + self.list_field
        self.out_length_field = self.out_field + self.length_field
        self.eta = float(config.get("eta", 0.6))
        self.rng = host_rng(int(config["seed"] or 0), "crop_itemseq")

    def __call__(self, batch: dict) -> dict:
        out = dict(batch)
        seq = np.asarray(batch[self.list_field])
        n = np.asarray(batch[self.length_field]).astype(np.int64)
        B, L = seq.shape
        crop_len = np.floor(n * self.eta).astype(np.int64)
        # uniform integer in [0, n - crop_len] per row, vectorized
        begin = np.floor(
            self.rng.random(B) * (n - crop_len + 1)
        ).astype(np.int64)
        pos = np.arange(L)[None, :]
        src = np.clip(begin[:, None] + pos, 0, L - 1)
        cropped = np.take_along_axis(seq, src, axis=1)
        out[self.out_field] = np.where(
            pos < crop_len[:, None], cropped, 0
        ).astype(seq.dtype)
        out[self.out_length_field] = crop_len
        return out


class ReorderItemSequence:
    """Shuffle a random window of `floor(len * beta)` positions
    (`ref transform.py:265-297`). Vectorized via a sort-key trick: window
    positions get keys `begin + U[0,1)` (which sort into the window slots
    in random order), non-window positions keep their integer index — one
    argsort per batch, no per-row Python shuffle."""

    def __init__(self, config):
        self.list_field = config["ITEM_ID_FIELD"] + config["LIST_SUFFIX"]
        self.length_field = config["ITEM_LIST_LENGTH_FIELD"]
        self.out_field = "Reorder_" + self.list_field
        self.beta = float(config.get("beta", 0.6))
        self.rng = host_rng(int(config["seed"] or 0), "reorder_itemseq")

    def __call__(self, batch: dict) -> dict:
        out = dict(batch)
        seq = np.asarray(batch[self.list_field])
        n = np.asarray(batch[self.length_field]).astype(np.int64)
        B, L = seq.shape
        rlen = np.floor(n * self.beta).astype(np.int64)
        begin = np.floor(
            self.rng.random(B) * (n - rlen + 1)
        ).astype(np.int64)
        pos = np.arange(L)[None, :]
        in_window = (pos >= begin[:, None]) & (pos < (begin + rlen)[:, None])
        keys = np.where(
            in_window,
            begin[:, None] + self.rng.random((B, L)),
            pos.astype(np.float64),
        )
        src = np.argsort(keys, axis=1, kind="stable")
        out[self.out_field] = np.take_along_axis(seq, src, axis=1)
        return out


class UserDefinedTransform:
    """User hook (`ref transform.py:300-305` — an empty stub there). Here
    `config['user_defined_transform']` names a callable as
    `'pkg.module:attr'` (or dotted `pkg.module.attr`); it is called with
    the batch dict and must return the (possibly new) batch dict. Without
    the key this is the identity."""

    def __init__(self, config):
        path = config.get("user_defined_transform")
        self.fn = None
        if path:
            if ":" in path:
                mod, attr = path.split(":", 1)
            else:
                mod, _, attr = path.rpartition(".")
            self.fn = getattr(importlib.import_module(mod), attr)

    def __call__(self, batch: dict) -> dict:
        return self.fn(batch) if self.fn is not None else batch


def construct_transform(config, n_items: Optional[int] = None):
    name = config.get("transform")
    if not name or name == "Equal":
        return Equal()
    if name in ("MaskItemSequence", "mask_itemseq"):
        return MaskItemSequence(config, n_items)
    if name in ("InverseItemSequence", "inverse_itemseq"):
        return InverseItemSequence(config)
    if name in ("CropItemSequence", "crop_itemseq"):
        return CropItemSequence(config)
    if name in ("ReorderItemSequence", "reorder_itemseq"):
        return ReorderItemSequence(config)
    if name in ("UserDefinedTransform", "user_defined"):
        return UserDefinedTransform(config)
    raise NotImplementedError(f"transform [{name}] is not implemented")
