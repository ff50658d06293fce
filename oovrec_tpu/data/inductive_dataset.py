"""InductiveDataset — the `<ds>_ind` evaluation corpus.

Equivalent of `recbole/data/dataset/inductive_dataset.py:7-233`: keeps OOV
rows (no `_remove_new_samples`), reconciles its categorical vocabularies to
the training dataset's token→id maps so row i of its feature tables equals
row i of the training tables for shared entities, and splits strictly by
benchmark file sizes.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from oovrec_tpu.data.dataset import Dataset, DatasetSplit
from oovrec_tpu.utils.enums import FeatureType


class InductiveDataset(Dataset):
    def __init__(self, config, removal_setting: Optional[str] = None):
        self.remove_old = removal_setting == "remove_old"
        self.remove_new = removal_setting == "remove_new"
        self.orig_dataset: Optional[Dataset] = None
        self._features_remapped = False
        super().__init__(config)

    def _data_processing(self) -> None:
        """Same as Dataset._data_processing but WITHOUT `_remove_new_samples`
        (`inductive_dataset.py:49-68`)."""
        self._data_filtering()
        self._remap_id_all()
        self._user_item_feat_preparation()
        self._fill_nan()
        self._set_label_by_threshold()
        self._normalize()
        self._discretization()

    def set_orig_dataset(self, orig_dataset: Dataset) -> None:
        self.orig_dataset = orig_dataset

    def remap_features(self) -> None:
        """Vocabulary reconciliation (`inductive_dataset.py:73-168`).

        For every non-ID token field, rewrite this dataset's ids into the
        training dataset's id space (tokens unseen in training → 0/[PAD]);
        then repair mean-imputed float columns so shared-entity rows are
        bit-identical with the training feature tables.
        """
        if self.orig_dataset is None:
            raise ValueError("The original dataset has not been set.")
        if self._features_remapped:
            return
        orig = self.orig_dataset

        id2id: Dict[str, np.ndarray] = {}
        for field, orig_t2i in orig.field2token_id.items():
            if field in (self.uid_field, self.iid_field):
                continue
            ind_t2i = self.field2token_id.get(field)
            if ind_t2i is None or ind_t2i == orig_t2i:
                continue
            # ind_id -> orig_id lookup (unseen token -> 0)
            lut = np.zeros(len(ind_t2i), dtype=np.int64)
            for token, ind_id in ind_t2i.items():
                lut[ind_id] = orig_t2i.get(token, 0)
            id2id[field] = lut
            self.field2id_token[field] = orig.field2id_token[field]
            merged = dict(orig_t2i)
            for token in ind_t2i:
                merged.setdefault(token, 0)
            self.field2token_id[field] = merged

        for field, lut in id2id.items():
            for feat_name in ("user_feat", "item_feat"):
                feat = getattr(self, feat_name)
                if feat is None or field not in feat.columns:
                    continue
                ftype = self.field2type[field]
                if ftype == FeatureType.TOKEN:
                    feat[field] = lut[feat[field].values.astype(np.int64)]
                elif ftype == FeatureType.TOKEN_SEQ:
                    train_feat = getattr(orig, feat_name)
                    maxlen = (
                        max((len(v) for v in train_feat[field].values), default=0)
                        if train_feat is not None and field in train_feat.columns
                        else None
                    )
                    vals = []
                    for v in feat[field].values:
                        v = lut[np.asarray(v, dtype=np.int64)]
                        # shape-trim to the transductive width
                        # (`inductive_dataset.py:128-132`)
                        if maxlen is not None and len(v) > maxlen:
                            v = v[:maxlen]
                        vals.append(v)
                    feat[field] = vals

        # float mean-imputation repair (`inductive_dataset.py:139-166`):
        # where the shared-entity slice disagrees with training, all
        # mismatches must be the (different) imputed means; overwrite with
        # the training value.
        for field, ftype in self.field2type.items():
            if ftype != FeatureType.FLOAT:
                continue
            for feat_name in ("user_feat", "item_feat"):
                feat = getattr(self, feat_name)
                train_feat = getattr(orig, feat_name)
                if (
                    feat is None
                    or train_feat is None
                    or field not in feat.columns
                    or field not in train_feat.columns
                ):
                    continue
                n_shared = len(train_feat)
                train_vals = train_feat[field].values[1:n_shared]
                ind_vals = feat[field].values[1:n_shared]
                mism = train_vals != ind_vals
                if not mism.any():
                    continue
                ind_mism = ind_vals[mism]
                orig_mism = train_vals[mism]
                assert np.all(ind_mism == ind_mism[0]), (
                    f"inconsistent imputed values in {field}"
                )
                assert np.all(orig_mism == orig_mism[0]), (
                    f"inconsistent training values in {field}"
                )
                col = feat[field].values.copy()
                col[1:n_shared][mism] = orig_mism[0]
                feat[field] = col

        self._features_remapped = True

    def build(self):
        """remap_features, then split strictly by benchmark file sizes
        (`inductive_dataset.py:170-233`). Unlike the base class, 'TO'
        ordering here DOES sort by time when no benchmark files exist."""
        self.remap_features()

        if self.benchmark_filename_list is not None:
            cumsum = list(np.cumsum(self.file_size_list))
            return [
                DatasetSplit(self, np.arange(start, end))
                for start, end in zip([0] + cumsum[:-1], cumsum)
            ]

        order = self.config["eval_args"]["order"]
        if order == "TO" and self.time_field in self.inter_feat.columns:
            self.inter_feat = self.inter_feat.sort_values(
                by=self.time_field, kind="stable"
            ).reset_index(drop=True)
        return super().build()

    @property
    def n_new_users(self) -> int:
        return self.user_num

    @property
    def n_new_items(self) -> int:
        return self.item_num
