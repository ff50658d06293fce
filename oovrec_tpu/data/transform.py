"""Batch-level transforms (`recbole/data/transform.py:14-309` analog).

`construct_transform(config)` keys on `config['transform']`:
  * None / 'Equal'          — identity
  * 'MaskItemSequence'      — BERT4Rec-style cloze masking: random sequence
    positions are replaced by the mask token (= n_items, one extra row in
    the item table) and recorded as (masked positions, original items).
"""

from __future__ import annotations

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


def construct_transform(config, n_items: Optional[int] = None):
    name = config.get("transform")
    if not name or name == "Equal":
        return Equal()
    if name in ("MaskItemSequence", "mask_itemseq"):
        return MaskItemSequence(config, n_items)
    raise NotImplementedError(f"transform [{name}] is not implemented")
