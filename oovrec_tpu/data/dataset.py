"""Dataset: atomic files → filtered, ID-remapped arrays + split builder.

Re-implements the behavior of `recbole/data/dataset/dataset.py` (2185 LoC)
as a one-shot host preprocessing pass that ends in NumPy arrays (the device
only ever sees fixed-shape batches cut from these arrays).

Behavioral parity notes (file:line refer to the reference):
  * remap via factorize-in-order with ``[PAD]``=0, interaction columns before
    user/item feature columns (`dataset.py:1188-1243`, `:1162-1186`) — this
    ordering is what gives old entities IDs < n_old in the `_ind` corpora.
  * `_remove_new_samples` drops rows whose `is_new` token equals '1' AFTER
    remapping (`dataset.py:174-181`), transductive datasets only.
  * split: benchmark files bypass ordering/splitting (`dataset.py:1769-1785`);
    RS ratio split grouped by user with the reference's exact rounding
    (`_calcu_split_ids` `dataset.py:1623-1645`); **fork quirk preserved**:
    'TO' ordering is a no-op in the base dataset (`dataset.py:1791-1793`).
  * float normalization is min-max (`dataset.py:682-740`); nan imputation is
    PAD for tokens / mean for floats (`dataset.py:655-680`).
"""

from __future__ import annotations

import os
import re
from collections import OrderedDict
from typing import Dict, List, Optional

import numpy as np
import pandas as pd

from oovrec_tpu.data.atomic import load_atomic_file
from oovrec_tpu.utils.enums import FeatureSource, FeatureType
from oovrec_tpu.utils.logging import init_logger
from oovrec_tpu.utils.seeding import host_rng


def _parse_interval(s: Optional[str]):
    """Parse '[A,B)' style interval strings — incl. ';'-separated unions
    like '(-inf,4);(4,inf)' (reference `_filter_by_field_value` regex,
    `dataset.py:740-760`) — into a list of (lo, hi, lo_inc, hi_inc)."""
    if not s:
        return None
    parts = []
    for piece in str(s).split(";"):
        m = re.fullmatch(
            r"\s*([\[(])\s*([^,]+)\s*,\s*([^)\]]+)\s*([)\]])\s*", piece
        )
        if not m:
            raise ValueError(f"Invalid interval: {s!r}")
        parts.append((float(m.group(2)), float(m.group(3)),
                      m.group(1) == "[", m.group(4) == "]"))
    return parts


def _in_interval(x: np.ndarray, ivs) -> np.ndarray:
    out = np.zeros(len(x), bool)
    for lo, hi, lo_inc, hi_inc in ivs:
        left = x >= lo if lo_inc else x > lo
        right = x <= hi if hi_inc else x < hi
        out |= left & right
    return out


class Dataset:
    """Transductive dataset (the training corpus)."""

    def __init__(self, config, _defer_processing: bool = False):
        self.config = config
        self.dataset_name: str = config["dataset"]
        self.logger = init_logger()

        self.uid_field: str = config["USER_ID_FIELD"]
        self.iid_field: str = config["ITEM_ID_FIELD"]
        self.label_field: str = config["LABEL_FIELD"]
        self.time_field: str = config["TIME_FIELD"]

        self.field2type: Dict[str, FeatureType] = {}
        self.field2source: Dict[str, FeatureSource] = {}
        self.field2seqlen: Dict[str, int] = {}
        self.field2id_token: Dict[str, np.ndarray] = {}
        self.field2token_id: Dict[str, Dict[str, int]] = {}
        self.field2bucketnum: Dict[str, int] = {}

        self.inter_feat: Optional[pd.DataFrame] = None
        self.user_feat: Optional[pd.DataFrame] = None
        self.item_feat: Optional[pd.DataFrame] = None
        self.benchmark_filename_list = config["benchmark_filename"]
        self.file_size_list: List[int] = []

        if not _defer_processing:
            self._from_scratch()

    # ------------------------------------------------------------------ load

    def _from_scratch(self) -> None:
        self._load_data()
        self._data_processing()

    def _data_processing(self) -> None:
        """Pipeline order mirrors `dataset.py:160-173` (fork variant)."""
        self._data_filtering()
        self._remap_id_all()
        self._remove_new_samples()
        self._user_item_feat_preparation()
        self._fill_nan()
        self._set_label_by_threshold()
        self._normalize()
        self._discretization()

    def _dataset_path(self) -> str:
        return os.path.join(self.config["data_path"], self.dataset_name)

    def _load_data(self) -> None:
        path = self._dataset_path()
        token = self.dataset_name
        sep = self.config["field_separator"]
        seq_sep = self.config["seq_separator"]
        load_col_cfg = self.config["load_col"]
        unload_col_cfg = self.config["unload_col"] or {}

        def cols_for(suffix: str):
            if load_col_cfg is None:
                return None, set(unload_col_cfg.get(suffix, []) or [])
            if suffix in load_col_cfg:
                lc = load_col_cfg[suffix]
                load = None if lc == "*" else set(lc)
            else:
                load = set()
            if load:
                # the fork force-loads the is_new split flag whenever a
                # column selection is given (`dataset.py:443`), so context
                # models DO see it as a token field when the file has it
                load.add("is_new")
            return load, set(unload_col_cfg.get(suffix, []) or [])

        # interactions (single file or concatenated benchmark files)
        inter_load, inter_unload = cols_for("inter")
        if self.benchmark_filename_list is None:
            fp = os.path.join(path, f"{token}.inter")
            if not os.path.isfile(fp):
                raise ValueError(f"File {fp} not exist.")
            self.inter_feat, f2t = load_atomic_file(
                fp, sep, seq_sep, inter_load, inter_unload
            )
            self._register_fields(f2t, FeatureSource.INTERACTION)
        else:
            feats = []
            sizes = []
            for name in self.benchmark_filename_list:
                fp = os.path.join(path, f"{token}.{name}.inter")
                if not os.path.isfile(fp):
                    raise ValueError(f"File {fp} not exist.")
                df, f2t = load_atomic_file(fp, sep, seq_sep, inter_load, inter_unload)
                self._register_fields(f2t, FeatureSource.INTERACTION)
                feats.append(df)
                sizes.append(len(df))
            self.inter_feat = pd.concat(feats, ignore_index=True)
            self.file_size_list = sizes

        # user / item feature files
        for suffix, source, id_field in (
            ("user", FeatureSource.USER, self.uid_field),
            ("item", FeatureSource.ITEM, self.iid_field),
        ):
            fp = os.path.join(path, f"{token}.{suffix}")
            load, unload = cols_for(suffix)
            if os.path.isfile(fp) and (load is None or load):
                df, f2t = load_atomic_file(fp, sep, seq_sep, load, unload)
                if df.empty:
                    continue
                if id_field not in df.columns:
                    raise ValueError(
                        f"{id_field} must be loaded if {suffix} features are loaded."
                    )
                self._register_fields(f2t, source)
                self.field2source[id_field] = (
                    FeatureSource.USER_ID
                    if suffix == "user"
                    else FeatureSource.ITEM_ID
                )
                setattr(self, f"{suffix}_feat", df)

        # additional side tables (`additional_feat_suffix`, reference
        # `dataset.py` _load_additional_feat): kept raw for
        # `get_preload_weight` — not remapped with the main tables.
        self.additional_feats: Dict[str, pd.DataFrame] = {}
        for suffix in self.config["additional_feat_suffix"] or []:
            fp = os.path.join(path, f"{token}.{suffix}")
            if os.path.isfile(fp):
                df, _ = load_atomic_file(fp, sep, seq_sep, None, set())
                self.additional_feats[suffix] = df

        if self.uid_field and self.uid_field not in self.field2type:
            self.field2type[self.uid_field] = FeatureType.TOKEN
        if self.iid_field and self.iid_field not in self.field2type:
            self.field2type[self.iid_field] = FeatureType.TOKEN

    def _register_fields(self, f2t: Dict[str, FeatureType], source) -> None:
        for field, ftype in f2t.items():
            self.field2source.setdefault(field, source)
            self.field2type[field] = ftype
            if not ftype.value.endswith("seq"):
                self.field2seqlen[field] = 1
            if "float" in ftype.value:
                self.field2bucketnum.setdefault(field, 2)

    # -------------------------------------------------------------- filtering

    def _data_filtering(self) -> None:
        """nan-ID drop, dedup, value filter, k-core (`dataset.py:192-290`)."""
        inter = self.inter_feat
        # missing user/item id
        for f in (self.uid_field, self.iid_field):
            if f in inter.columns:
                inter = inter[~inter[f].isna()]

        rm_dup = self.config["rm_dup_inter"]
        if rm_dup in ("first", "last"):
            inter = inter.drop_duplicates(
                subset=[self.uid_field, self.iid_field], keep=rm_dup
            )

        # value filter applies to EVERY table holding the field — inter
        # rows drop directly; user/item feature rows drop, and their
        # interactions go in the ui-filter step (`dataset.py:744-790`)
        val_interval = self.config["val_interval"]
        if val_interval:
            for field, iv_s in val_interval.items():
                iv = _parse_interval(iv_s)
                if field in inter.columns:
                    inter = inter[_in_interval(inter[field].values, iv)]
                if (self.user_feat is not None
                        and field in self.user_feat.columns):
                    self.user_feat = self.user_feat[
                        _in_interval(self.user_feat[field].values, iv)
                    ].reset_index(drop=True)
                if (self.item_feat is not None
                        and field in self.item_feat.columns):
                    self.item_feat = self.item_feat[
                        _in_interval(self.item_feat[field].values, iv)
                    ].reset_index(drop=True)

        # drop interactions whose user/item has no feature row — BEFORE
        # k-core, matching the reference order (`dataset.py:205-210`)
        if self.config["filter_inter_by_user_or_item"]:
            if self.user_feat is not None:
                inter = inter[
                    inter[self.uid_field].isin(self.user_feat[self.uid_field].values)
                ]
            if self.item_feat is not None:
                inter = inter[
                    inter[self.iid_field].isin(self.item_feat[self.iid_field].values)
                ]

        # iterative k-core on interaction counts. Banned ids also drop
        # from the FEATURE tables (so they leave the vocab), and
        # feature-only ids with zero interactions count as banned when
        # the interval excludes 0 (`dataset.py:928-985`).
        u_iv = _parse_interval(self.config["user_inter_num_interval"])
        i_iv = _parse_interval(self.config["item_inter_num_interval"])
        if (
            self.uid_field in inter.columns
            and self.iid_field in inter.columns
            and (u_iv or i_iv)
        ):
            def banned(field, feat, iv):
                if not iv:
                    return set()
                counts = inter[field].value_counts()
                # Categorical columns (native reader) report dropped
                # categories with count 0 — phantom ids that would make
                # the k-core loop ban them forever
                counts = counts[counts > 0]
                ids = set(counts.index[
                    ~_in_interval(counts.values.astype(np.float64), iv)
                ])
                if feat is not None and field in feat.columns:
                    zero = set(feat[field].values) - set(counts.index)
                    if zero and not _in_interval(
                        np.zeros(1), iv
                    )[0]:
                        ids |= zero
                return ids

            while True:
                ban_u = banned(self.uid_field, self.user_feat, u_iv)
                ban_i = banned(self.iid_field, self.item_feat, i_iv)
                if not ban_u and not ban_i:
                    break
                if self.user_feat is not None and ban_u:
                    self.user_feat = self.user_feat[
                        ~self.user_feat[self.uid_field].isin(ban_u)
                    ].reset_index(drop=True)
                if self.item_feat is not None and ban_i:
                    self.item_feat = self.item_feat[
                        ~self.item_feat[self.iid_field].isin(ban_i)
                    ].reset_index(drop=True)
                inter = inter[
                    ~inter[self.uid_field].isin(ban_u)
                    & ~inter[self.iid_field].isin(ban_i)
                ]

        self.inter_feat = inter.reset_index(drop=True)

    # ---------------------------------------------------------------- remap

    def _alias_groups(self) -> "OrderedDict[str, np.ndarray]":
        alias = OrderedDict()
        alias[self.uid_field] = np.array(
            [self.uid_field] + list(self.config["alias_of_user_id"] or [])
        )
        alias[self.iid_field] = np.array(
            [self.iid_field] + list(self.config["alias_of_item_id"] or [])
        )
        return alias

    def _field_feats(self, field: str) -> List[pd.DataFrame]:
        """DataFrames holding `field`, interaction first (`dataset.py:1162`)."""
        feats = []
        if self.inter_feat is not None and field in self.inter_feat.columns:
            feats.append(self.inter_feat)
        if self.user_feat is not None and field in self.user_feat.columns:
            feats.append(self.user_feat)
        if self.item_feat is not None and field in self.item_feat.columns:
            feats.append(self.item_feat)
        return feats

    def _remap_id_all(self) -> None:
        alias = self._alias_groups()
        remapped = set()
        for fields in alias.values():
            fields = [f for f in fields if f in self.field2type]
            self._remap_fields(fields)
            remapped.update(fields)
        rest = [
            f
            for f, t in self.field2type.items()
            if t in (FeatureType.TOKEN, FeatureType.TOKEN_SEQ) and f not in remapped
        ]
        for f in rest:
            self._remap_fields([f])

    def _remap_fields(self, fields: List[str]) -> None:
        """factorize-in-order remap with [PAD]=0 (`dataset.py:1219-1243`)."""
        remap_list = []
        for field in fields:
            ftype = self.field2type[field]
            for feat in self._field_feats(field):
                remap_list.append((feat, field, ftype))
        if not remap_list:
            return

        # each chunk becomes (codes, uniques-in-first-appearance-order):
        # native-parsed Categoricals already carry exactly that; string
        # chunks factorize per-chunk. Merging chunk vocabularies in
        # first-appearance order reproduces pd.factorize over the
        # concatenated token stream bit-for-bit, without materializing
        # strings for the (multi-M-row) categorical case.
        pairs = []
        for feat, field, ftype in remap_list:
            if ftype == FeatureType.TOKEN:
                col = feat[field]
                if isinstance(col.dtype, pd.CategoricalDtype):
                    codes = np.asarray(col.cat.codes, dtype=np.int64)
                    cats = np.asarray(col.cat.categories, dtype=object)
                    # row filtering leaves unused categories behind;
                    # compact to the FILTERED stream's first-appearance
                    # order — exactly pd.factorize over its strings
                    used, first_pos, inv = np.unique(
                        codes, return_index=True, return_inverse=True
                    )
                    if len(used) != len(cats) or (
                        len(used) and not np.all(np.diff(first_pos) > 0)
                    ):
                        order = np.argsort(first_pos, kind="stable")
                        rank = np.empty(len(used), np.int64)
                        rank[order] = np.arange(len(used))
                        codes = rank[inv]
                        cats = cats[used[order]]
                    pairs.append((codes, cats))
                    continue
                arr = col.values.astype(str)
            else:  # TOKEN_SEQ
                vals = list(feat[field].values)
                arr = (np.concatenate(vals) if vals
                       else np.array([], dtype=str))
            codes, uniq = pd.factorize(arr)
            pairs.append((codes.astype(np.int64), np.asarray(uniq)))

        lookup: Dict = {}
        merged: List = []
        new_ids_list = []
        for codes, uniq in pairs:
            remap = np.empty(len(uniq), np.int64)
            for j, t in enumerate(uniq):
                g = lookup.get(t)
                if g is None:
                    g = len(merged)
                    lookup[t] = g
                    merged.append(t)
                remap[j] = g
            new_ids_list.append(
                (remap[codes] if len(uniq) else codes) + 1
            )
        mp = np.array(["[PAD]"] + merged)
        token_id = {t: i for i, t in enumerate(mp)}

        for (feat, field, ftype), ids in zip(remap_list, new_ids_list):
            if field not in self.field2id_token:
                self.field2id_token[field] = mp
                self.field2token_id[field] = token_id
            if ftype == FeatureType.TOKEN:
                feat[field] = ids
            else:
                sp = np.cumsum([len(v) for v in feat[field].values])[:-1]
                feat[field] = np.split(ids, sp)

    def _remove_new_samples(self) -> None:
        """Drop is_new=='1' rows — transductive phase only (`dataset.py:174`)."""
        if self.inter_feat is None or "is_new" not in self.inter_feat.columns:
            return
        new_id = self.field2token_id["is_new"].get("1")
        if new_id is None:
            return
        keep = self.inter_feat["is_new"] != new_id
        self.inter_feat = self.inter_feat[keep].reset_index(drop=True)

    # ------------------------------------------------------- feat preparation

    def _user_item_feat_preparation(self) -> None:
        """Reindex user/item feature tables to dense [0, n) rows
        (`dataset.py:637-653`): every remapped ID gets exactly one row; IDs
        absent from the feature file get a NaN row (filled by `_fill_nan`)."""
        if self.user_feat is not None:
            new_index = pd.DataFrame({self.uid_field: np.arange(self.user_num)})
            self.user_feat = pd.merge(
                new_index, self.user_feat, on=self.uid_field, how="left"
            )
        if self.item_feat is not None:
            new_index = pd.DataFrame({self.iid_field: np.arange(self.item_num)})
            self.item_feat = pd.merge(
                new_index, self.item_feat, on=self.iid_field, how="left"
            )

    def _fill_nan(self) -> None:
        """Impute cells left missing by the dense reindex (semantics of
        `recbole/data/dataset/dataset.py:655-680`): token ids fall back to
        PAD (0), scalar floats to the column mean, and sequence cells —
        which hold either an ndarray or a NaN placeholder — to an empty
        array of the field's dtype."""
        seq_dtypes = {
            FeatureType.TOKEN_SEQ: np.int64,
            FeatureType.FLOAT_SEQ: np.float64,
        }
        for feat in self._feats():
            for field in feat.columns:
                ftype = self.field2type[field]
                column = feat[field]
                if ftype == FeatureType.TOKEN:
                    feat[field] = column.fillna(0).astype(np.int64)
                elif ftype == FeatureType.FLOAT:
                    feat[field] = column.fillna(column.mean())
                else:
                    empty = np.array([], dtype=seq_dtypes[ftype])
                    feat[field] = [
                        cell if isinstance(cell, np.ndarray) else empty
                        for cell in column
                    ]

    def _set_label_by_threshold(self) -> None:
        """Binarize one rating-like column into the label field
        (semantics of `recbole/data/dataset/dataset.py:1140-1160`)."""
        spec = self.config["threshold"]
        if not spec:
            return
        if len(spec) != 1:
            raise ValueError(
                f"threshold must name exactly one field, got {sorted(spec)}"
            )
        ((src_field, cutoff),) = spec.items()
        if src_field not in self.inter_feat.columns:
            raise ValueError(
                f"threshold field [{src_field}] absent from inter_feat"
            )
        self.field2type[self.label_field] = FeatureType.FLOAT
        self.field2source[self.label_field] = FeatureSource.INTERACTION
        self.field2seqlen[self.label_field] = 1
        labels = self.inter_feat[src_field].to_numpy() >= cutoff
        self.inter_feat[self.label_field] = labels.astype(np.int64)
        if src_field != self.label_field:
            self.inter_feat = self.inter_feat.drop(columns=[src_field])

    def _normalize(self) -> None:
        """Min-max scale float fields into [0, 1] (semantics of
        `recbole/data/dataset/dataset.py:682-740`; a constant column maps
        to all-ones like the reference). Seq fields are scaled over the
        flattened pool of every element, then re-split per row."""
        by_field = self.config["normalize_field"]
        all_floats = self.config["normalize_all"]
        if by_field and all_floats:
            raise ValueError(
                "normalize_field and normalize_all are mutually exclusive"
            )
        float_types = (FeatureType.FLOAT, FeatureType.FLOAT_SEQ)
        if by_field:
            fields = by_field
        elif all_floats:
            fields = [f for f, t in self.field2type.items() if t in float_types]
        else:
            return

        def minmax(values: np.ndarray) -> np.ndarray:
            lo, hi = values.min(), values.max()
            if hi == lo:
                return np.ones_like(values)
            return (values - lo) / (hi - lo)

        for field in fields:
            ftype = self.field2type.get(field)
            if ftype not in float_types:
                continue
            for feat in self._field_feats(field):
                if ftype == FeatureType.FLOAT:
                    feat[field] = minmax(feat[field].to_numpy(np.float64))
                else:
                    cells = list(feat[field])
                    lengths = [len(c) for c in cells]
                    if sum(lengths) == 0:
                        continue
                    scaled = minmax(np.concatenate(cells))
                    feat[field] = np.split(scaled, np.cumsum(lengths)[:-1])

    def _discretization(self) -> None:
        """Numerical features → (value, bucket) pairs for FLEmbedding
        (`dataset.py:740-838` exact semantics). The pair is stored as the
        value column `field` plus an int companion column `field__bucket`:
          * ED: value=1, bucket=floor((x−lo)·B/(hi−lo)+1), bucketnum=max+1
          * LD: value=1, bucket=unique-rank of floor(log(x)²+1) (x>2 mask)
          * not configured: value=x, bucket=1, bucketnum=2
        """
        dis_info = dict(self.config["discretization"] or {})
        for field in self.config["numerical_features"] or []:
            if field not in self.field2type:
                continue
            if field in dis_info:
                info = dis_info[field]
                method = info["method"]
                bucket_cnt = info.get("bucket")
                if method == "ED" and bucket_cnt is None:
                    raise ValueError(
                        "The number of buckets must be set when apply equal discretization."
                    )
                for feat in self._field_feats(field):
                    arr = feat[field].values.astype(np.float64)
                    if method == "ED":
                        lower, upper = arr.min(), arr.max() + 1e-9
                        if upper != lower:
                            res = np.floor(
                                (arr - lower) * bucket_cnt / (upper - lower) + 1
                            )
                        else:
                            res = np.ones_like(arr) * bucket_cnt
                    elif method == "LD":
                        mask = arr > 2
                        x = np.floor(np.log(arr * mask + 1e-9) ** 2 + 1)
                        x = np.where(mask, x, arr)
                        _, res = np.unique(x, return_inverse=True)
                    else:
                        raise ValueError(f"Method [{method}] does not exist.")
                    self.field2bucketnum[field] = int(res.max() + 1)
                    feat[field + "__bucket"] = res.astype(np.int64)
                    feat[field] = np.ones_like(arr)
            else:
                for feat in self._field_feats(field):
                    feat[field + "__bucket"] = np.ones(len(feat), np.int64)
                self.field2bucketnum.setdefault(field, 2)

    def _feats(self) -> List[pd.DataFrame]:
        return [
            f
            for f in (self.inter_feat, self.user_feat, self.item_feat)
            if f is not None
        ]

    # ---------------------------------------------------------------- counts

    @property
    def user_num(self) -> int:
        return len(self.field2id_token[self.uid_field])

    @property
    def item_num(self) -> int:
        return len(self.field2id_token[self.iid_field])

    def get_preload_weight(self, kid: str) -> np.ndarray:
        """Pretrained weight matrix keyed by `preload_weight: {kid: value}`
        (reference `dataset.py` get_preload_weight). Rows are aligned to an
        existing id vocabulary when the kid tokens match one (entity or
        item ids); otherwise rows follow file order with row 0 = pad."""
        pw = self.config["preload_weight"] or {}
        if kid not in pw:
            raise ValueError(f"Field [{kid}] not in preload_weight config.")
        vfield = pw[kid]
        df = None
        for d in self.additional_feats.values():
            if kid in d.columns and vfield in d.columns:
                df = d
                break
        if df is None:
            raise ValueError(
                f"No additional feat file holds [{kid}] and [{vfield}]."
            )
        tokens = df[kid].astype(str).to_numpy()
        vecs = np.stack([np.asarray(v, np.float32) for v in df[vfield]])
        # align with an existing vocab whose tokens cover this file
        for vocab_field in (getattr(self, "entity_field", None),
                            self.iid_field, self.uid_field):
            if vocab_field and vocab_field in self.field2token_id:
                t2i = self.field2token_id[vocab_field]
                if sum(t in t2i for t in tokens) >= 0.5 * len(tokens):
                    out = np.zeros((len(self.field2id_token[vocab_field]),
                                    vecs.shape[1]), np.float32)
                    for t, v in zip(tokens, vecs):
                        if t in t2i:
                            out[t2i[t]] = v
                    return out
        out = np.zeros((len(tokens) + 1, vecs.shape[1]), np.float32)
        out[1:] = vecs
        return out

    def num(self, field: str) -> int:
        ftype = self.field2type.get(field)
        if ftype is None:
            raise ValueError(f"Field [{field}] not defined in dataset.")
        if ftype in (FeatureType.FLOAT, FeatureType.FLOAT_SEQ) and field in (
            self.config["numerical_features"] or []
        ):
            return self.field2bucketnum[field]
        if ftype not in (FeatureType.TOKEN, FeatureType.TOKEN_SEQ):
            return self.field2seqlen[field]
        return len(self.field2id_token[field])

    def __len__(self) -> int:
        return 0 if self.inter_feat is None else len(self.inter_feat)

    @property
    def avg_actions_of_users(self) -> float:
        return float(
            self.inter_feat.groupby(self.uid_field).size().mean()
        )

    def token2id(self, field: str, tokens):
        t2i = self.field2token_id[field]
        if isinstance(tokens, str):
            return t2i[tokens]
        return np.array([t2i[t] for t in tokens])

    def id2token(self, field: str, ids):
        return self.field2id_token[field][ids]

    # ---------------------------------------------------------------- build

    def build(self) -> List["DatasetSplit"]:
        """Group/order/split into [train, valid, test] index views."""
        if self.benchmark_filename_list is not None:
            cumsum = list(np.cumsum(self.file_size_list))
            return [
                self._make_split(np.arange(start, end))
                for start, end in zip([0] + cumsum[:-1], cumsum)
            ]

        order = self.config["eval_args"]["order"]
        n = len(self.inter_feat)
        index = np.arange(n)
        if order == "RO":
            rng = host_rng(self.config["seed"] or 0, "dataset_shuffle")
            rng.shuffle(index)
        elif order == "TO":
            # Fork quirk preserved: the reference's TO sort is commented out
            # (`dataset.py:1791-1793`) so splits use file order.
            pass
        else:
            raise NotImplementedError(f"The ordering_method [{order}] has not been implemented.")

        split_args = self.config["eval_args"]["split"]
        mode = list(split_args.keys())[0]
        group_by = self.config["eval_args"]["group_by"]
        if mode == "RS":
            ratios = split_args["RS"]
            tot = sum(ratios)
            ratios = [r / tot for r in ratios]
            if group_by is None or str(group_by).lower() == "none":
                split_ids = _calcu_split_ids(n, ratios)
                parts = [
                    index[start:end]
                    for start, end in zip([0] + split_ids, split_ids + [n])
                ]
            elif group_by == "user":
                uid = self.inter_feat[self.uid_field].values[index]
                parts = [[] for _ in ratios]
                for grouped in _grouped_index(uid):
                    grouped = index[grouped]
                    split_ids = _calcu_split_ids(len(grouped), ratios)
                    for part, start, end in zip(
                        parts, [0] + split_ids, split_ids + [len(grouped)]
                    ):
                        part.extend(grouped[start:end])
                parts = [np.array(p, dtype=np.int64) for p in parts]
            else:
                raise NotImplementedError(
                    f"The grouping method [{group_by}] has not been implemented."
                )
        elif mode == "LS":
            parts = self._leave_one_out(index, split_args["LS"])
        else:
            raise NotImplementedError(
                f"The splitting_method [{mode}] has not been implemented."
            )
        return [self._make_split(p) for p in parts]

    def _leave_one_out(self, index: np.ndarray, leave_one_mode: str):
        uid = self.inter_feat[self.uid_field].values[index]
        grouped = list(_grouped_index(uid))
        leave_one_num = 2 if leave_one_mode == "valid_and_test" else 1
        next_index = [[] for _ in range(leave_one_num + 1)]
        for g in grouped:
            g = list(index[g])
            tot = len(g)
            legal = min(leave_one_num, tot - 1)
            pr = tot - legal
            next_index[0].extend(g[:pr])
            for i in range(legal):
                next_index[-legal + i].append(g[pr])
                pr += 1
        if leave_one_mode == "valid_and_test":
            parts = next_index
        elif leave_one_mode == "valid_only":
            parts = [next_index[0], next_index[1], []]
        elif leave_one_mode == "test_only":
            parts = [next_index[0], [], next_index[1]]
        else:
            raise NotImplementedError(
                f"The leave_one_mode [{leave_one_mode}] has not been implemented."
            )
        return [np.array(p, dtype=np.int64) for p in parts]

    def _make_split(self, index: np.ndarray) -> "DatasetSplit":
        return DatasetSplit(self, index)

    # ------------------------------------------------------------- exports

    def __repr__(self) -> str:
        try:
            n_u, n_i, n = self.user_num - 1, self.item_num - 1, len(self)
            sparsity = 100 * (1 - n / max(n_u * n_i, 1))
            return (
                f"{self.dataset_name}\n"
                f"The number of users: {self.user_num}\n"
                f"Average actions of users: {n / max(n_u, 1):.4f}\n"
                f"The number of items: {self.item_num}\n"
                f"Average actions of items: {n / max(n_i, 1):.4f}\n"
                f"The number of inters: {n}\n"
                f"The sparsity of the dataset: {sparsity:.6f}%"
            )
        except Exception:
            return f"Dataset({self.dataset_name})"

    def get_user_feature(self) -> Dict[str, np.ndarray]:
        """Dense per-user feature arrays keyed by field (row i = user i)."""
        if self.user_feat is None:
            return {self.uid_field: np.arange(self.user_num)}
        return _frame_to_arrays(self.user_feat, self.field2type)

    def get_item_feature(self) -> Dict[str, np.ndarray]:
        if self.item_feat is None:
            return {self.iid_field: np.arange(self.item_num)}
        return _frame_to_arrays(self.item_feat, self.field2type)

    def history_item_matrix(self, max_history_len: Optional[int] = None):
        """(history (n_users, H), lengths (n_users,)) padded per-user item
        histories (`dataset.py:2073` analog)."""
        uid = self.inter_feat[self.uid_field].values
        iid = self.inter_feat[self.iid_field].values
        counts = np.bincount(uid, minlength=self.user_num)
        H = max_history_len or (int(counts.max()) if len(counts) else 1)
        out = np.zeros((self.user_num, H), dtype=np.int64)
        lens = np.zeros(self.user_num, dtype=np.int64)
        for u, i in zip(uid, iid):
            if lens[u] < H:
                out[u, lens[u]] = i
                lens[u] += 1
        return out, lens

    def inter_matrix(self, form: str = "coo", value_field: Optional[str] = None):
        """Sparse user×item interaction matrix (`dataset.py:1968`)."""
        import scipy.sparse as sp

        uid = self.inter_feat[self.uid_field].values
        iid = self.inter_feat[self.iid_field].values
        data = (
            np.ones(len(uid))
            if value_field is None
            else self.inter_feat[value_field].values
        )
        mat = sp.coo_matrix(
            (data, (uid, iid)), shape=(self.user_num, self.item_num)
        )
        return mat.tocsr() if form == "csr" else mat


class DatasetSplit:
    """A phase view over a parent Dataset: interaction rows as numpy arrays."""

    def __init__(self, parent: Dataset, index: np.ndarray):
        self.parent = parent
        self.index = np.asarray(index, dtype=np.int64)
        self.config = parent.config
        self.uid_field = parent.uid_field
        self.iid_field = parent.iid_field
        self.label_field = parent.label_field
        df = parent.inter_feat.iloc[self.index]
        self.inter = _frame_to_arrays(df, parent.field2type)

    def __len__(self) -> int:
        return len(self.index)

    @property
    def user_num(self) -> int:
        return self.parent.user_num

    @property
    def item_num(self) -> int:
        return self.parent.item_num

    def used_ids_per_user(self) -> List[np.ndarray]:
        """Per-user arrays of interacted item ids within this split."""
        uid = self.inter[self.uid_field]
        iid = self.inter[self.iid_field]
        order = np.argsort(uid, kind="stable")
        out: List[np.ndarray] = [np.array([], dtype=np.int64)] * self.user_num
        if len(uid) == 0:
            return out
        su, si = uid[order], iid[order]
        bounds = np.flatnonzero(np.diff(su)) + 1
        starts = np.concatenate([[0], bounds])
        ends = np.concatenate([bounds, [len(su)]])
        for s, e in zip(starts, ends):
            out[su[s]] = si[s:e]
        return out


def _frame_to_arrays(
    df: pd.DataFrame, field2type: Dict[str, FeatureType]
) -> Dict[str, np.ndarray]:
    """DataFrame → dict of arrays; *_seq fields padded to their max length."""
    out: Dict[str, np.ndarray] = {}
    for col in df.columns:
        if col.endswith("__bucket"):
            out[col] = df[col].values.astype(np.int64)
            continue
        ftype = field2type.get(col, FeatureType.FLOAT)
        if ftype == FeatureType.TOKEN:
            out[col] = df[col].values.astype(np.int64)
        elif ftype == FeatureType.FLOAT:
            out[col] = df[col].values.astype(np.float32)
        else:
            vals = list(df[col].values)
            maxlen = max((len(v) for v in vals), default=0)
            dtype = np.int64 if ftype == FeatureType.TOKEN_SEQ else np.float32
            arr = np.zeros((len(vals), maxlen), dtype=dtype)
            for i, v in enumerate(vals):
                arr[i, : len(v)] = v
            out[col] = arr
            out[col + "_len"] = np.array([len(v) for v in vals], dtype=np.int64)
    return out


def _grouped_index(group_by_list: np.ndarray):
    """First-appearance-ordered per-key index lists (`dataset.py:1614`)."""
    index: "OrderedDict[int, List[int]]" = OrderedDict()
    for i, key in enumerate(group_by_list):
        index.setdefault(key, []).append(i)
    return index.values()


def _calcu_split_ids(tot: int, ratios: List[float]) -> List[int]:
    """The reference's exact rounding (`dataset.py:1623-1645`)."""
    cnt = [int(ratios[i] * tot) for i in range(len(ratios))]
    cnt[0] = tot - sum(cnt[1:])
    for i in range(1, len(ratios)):
        if cnt[0] <= 1:
            break
        if 0 < ratios[-i] * tot < 1:
            cnt[-i] += 1
            cnt[0] -= 1
    return list(np.cumsum(cnt)[:-1])
