"""Sequential dataset: next-item augmentation (SequentialDataset analog).

Re-implements `recbole/data/dataset/sequential_dataset.py:23-225`
vectorized: after standard processing, interactions are sorted by
(user, time) and every position i with a same-user predecessor becomes a
training example (prefix window of up to MAX_ITEM_LIST_LENGTH items →
target item i). The augmented table is materialized as padded arrays
(`item_id_list` (n, L) int64, `item_length`, target `item_id`) — the
static-shape form the TPU batchers need.
"""

from __future__ import annotations

from typing import List

import numpy as np

from oovrec_tpu.data.dataset import Dataset, DatasetSplit, _grouped_index


class SequentialDataset(Dataset):
    def __init__(self, config):
        self.max_item_list_len = int(config["MAX_ITEM_LIST_LENGTH"])
        self.item_list_length_field = config["ITEM_LIST_LENGTH_FIELD"]
        self.list_suffix = config["LIST_SUFFIX"]
        self.neg_prefix = config.get("NEG_PREFIX") or "neg_"
        super().__init__(config)
        self._augmented = None

    def data_augmentation(self) -> dict:
        """(uid, prefix-window, target) examples (`sequential_dataset.py:77-150`)."""
        if self._augmented is not None:
            return self._augmented
        df = self.inter_feat.sort_values(
            by=[self.uid_field, self.time_field], kind="stable"
        ).reset_index(drop=True)
        uid = df[self.uid_field].values
        iid = df[self.iid_field].values
        L = self.max_item_list_len

        uid_list: List[int] = []
        seq_rows: List[np.ndarray] = []
        target_rows: List[int] = []
        lengths: List[int] = []
        last_uid = None
        seq_start = 0
        for i, u in enumerate(uid):
            if last_uid != u:
                last_uid = u
                seq_start = i
            else:
                if i - seq_start > L:
                    seq_start += 1
                uid_list.append(u)
                seq_rows.append(iid[seq_start:i])
                target_rows.append(iid[i])
                lengths.append(i - seq_start)

        n = len(uid_list)
        item_list = np.zeros((n, L), dtype=np.int64)
        for r, s in enumerate(seq_rows):
            item_list[r, : len(s)] = s
        self._augmented = {
            self.uid_field: np.asarray(uid_list, np.int64),
            self.iid_field: np.asarray(target_rows, np.int64),
            self.iid_field + self.list_suffix: item_list,
            self.item_list_length_field: np.asarray(lengths, np.int64),
        }
        if self.config.get("dien_neg_sampling") == "presampled":
            # DIENDataset semantics (`ref:customized_dataset.py:38-70` +
            # `ref:sampler.py:472-490` SeqSampler.sample_neg_sequence):
            # ONE fixed uniform negative per interaction position, drawn
            # at dataset-build time (resampled on collision with the
            # positive at that position), then windowed exactly like
            # item_list — the auxiliary-loss negatives are fixed for the
            # whole run instead of fresh per step (models/sequential/
            # din.py on-device default).
            rng = np.random.default_rng(int(self.config.get("seed") or 0))
            neg_flat = np.zeros(len(iid), np.int64)
            pending = np.arange(len(iid))
            while len(pending):
                neg_flat[pending] = rng.integers(
                    1, self.item_num, len(pending)
                )
                pending = pending[neg_flat[pending] == iid[pending]]
            neg_list = np.zeros((n, L), dtype=np.int64)
            row = 0
            last_uid = None
            seq_start = 0
            for i, u in enumerate(uid):
                if last_uid != u:
                    last_uid = u
                    seq_start = i
                else:
                    if i - seq_start > L:
                        seq_start += 1
                    neg_list[row, : i - seq_start] = neg_flat[seq_start:i]
                    row += 1
            self._augmented[
                self.neg_prefix + self.iid_field + self.list_suffix
            ] = neg_list
        return self._augmented

    def build(self):
        """Augment, then leave-one-out by user over augmented examples
        (the standard sequential protocol)."""
        aug = self.data_augmentation()
        n = len(aug[self.uid_field])
        index = np.arange(n)
        grouped = list(_grouped_index(aug[self.uid_field]))
        train_idx, valid_idx, test_idx = [], [], []
        for g in grouped:
            g = list(g)
            if len(g) >= 3:
                train_idx.extend(g[:-2])
                valid_idx.append(g[-2])
                test_idx.append(g[-1])
            elif len(g) == 2:
                train_idx.append(g[0])
                test_idx.append(g[1])
            else:
                train_idx.extend(g)
        return [
            SeqDatasetSplit(self, np.asarray(ix, np.int64))
            for ix in (train_idx, valid_idx, test_idx)
        ]


class SeqFullSortEvalBatcher:
    """Full-sort eval over augmented sequence examples: one row per
    example (LS protocol → one per user), positives = {target}, history =
    the input sequence (masked unless `repeatable`)."""

    def __init__(self, split: "SeqDatasetSplit", config,
                 batch_size=None):
        self.split = split
        self.config = config
        self.item_num = split.item_num
        bs = batch_size or config["eval_batch_size"]
        self.rows_per_batch = max(1, bs // self.item_num)
        self.repeatable = bool(config["repeatable"])
        self.list_field = (
            split.iid_field + config["LIST_SUFFIX"]
        )
        self.length_field = config["ITEM_LIST_LENGTH_FIELD"]

    def __len__(self):
        n = len(self.split)
        return (n + self.rows_per_batch - 1) // self.rows_per_batch

    def __iter__(self):
        inter = self.split.inter
        n = len(self.split)
        R = self.rows_per_batch
        L = inter[self.list_field].shape[1]
        for start in range(0, n, R):
            idx = np.arange(start, min(start + R, n))
            batch = {k: v[idx] for k, v in inter.items()}
            pad = R - len(idx)
            if pad:
                batch = {
                    k: np.concatenate(
                        [v, np.zeros((pad,) + v.shape[1:], v.dtype)]
                    )
                    for k, v in batch.items()
                }
            batch["pos_items"] = batch[self.split.iid_field][:, None]
            batch["pos_len"] = np.ones(R, np.int64)
            if self.repeatable:
                batch["hist_items"] = np.zeros((R, 1), np.int64)
                batch["hist_len"] = np.zeros(R, np.int64)
            else:
                batch["hist_items"] = batch[self.list_field]
                batch["hist_len"] = batch[self.length_field]
            w = np.zeros(R, np.float32)
            w[: len(idx)] = 1.0
            batch["weight"] = w
            yield batch


class SeqDatasetSplit(DatasetSplit):
    """A split over the augmented example table."""

    def __init__(self, parent: SequentialDataset, index: np.ndarray):
        self.parent = parent
        self.index = np.asarray(index, dtype=np.int64)
        self.config = parent.config
        self.uid_field = parent.uid_field
        self.iid_field = parent.iid_field
        self.label_field = parent.label_field
        aug = parent.data_augmentation()
        self.inter = {k: v[self.index] for k, v in aug.items()}
