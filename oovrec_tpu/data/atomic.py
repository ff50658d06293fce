"""Atomic-file reader (.inter/.user/.item typed TSVs).

Implements the reference's file format (`recbole/data/dataset/dataset.py:450`):
tab-separated files whose header cells are ``field:type`` with types
token / float / token_seq / float_seq. Sequence cells are `seq_separator`-
joined values.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Set, Tuple

import numpy as np
import pandas as pd

from oovrec_tpu.utils.enums import FeatureType


def load_atomic_file(
    filepath: str,
    field_separator: str = "\t",
    seq_separator: str = " ",
    load_col: Optional[Set[str]] = None,
    unload_col: Optional[Set[str]] = None,
    encoding: str = "utf-8",
) -> Tuple[pd.DataFrame, Dict[str, FeatureType]]:
    """Load one atomic file.

    Returns a DataFrame (token columns as str, float columns as float64,
    *_seq columns as object arrays of np arrays) and the field→type map of
    the loaded columns.
    """
    with open(filepath, "r", encoding=encoding) as f:
        head = f.readline().rstrip("\n")

    columns: List[str] = []
    usecols: List[str] = []
    dtype: Dict[str, type] = {}
    field2type: Dict[str, FeatureType] = {}

    for field_type in head.split(field_separator):
        field, _, ftype_s = field_type.partition(":")
        ftype = FeatureType(ftype_s)
        if load_col is not None and field not in load_col:
            continue
        if unload_col is not None and field in unload_col:
            continue
        field2type[field] = ftype
        columns.append(field)
        usecols.append(field_type)
        dtype[field_type] = np.float64 if ftype == FeatureType.FLOAT else str

    if not columns:
        return pd.DataFrame(), {}

    # native one-pass parse + token coding (C++, data/native_reader.py):
    # serves scalar-column files (the multi-M-row .inter hot case); token
    # columns come back as Categoricals whose categories are in
    # pd.factorize order — `Dataset._remap_fields` merges them without
    # materializing strings. Seq columns / empty cells → pandas below.
    if all(
        field2type[f] in (FeatureType.TOKEN, FeatureType.FLOAT)
        for f in columns
    ):
        from oovrec_tpu.data.native_reader import read_atomic_native

        header_fields = head.split(field_separator)
        phys = [header_fields.index(u) for u in usecols]
        ndf = read_atomic_native(
            filepath, columns, phys, field2type, field_separator
        )
        if ndf is not None:
            return ndf, field2type

    df = pd.read_csv(
        filepath,
        delimiter=field_separator,
        usecols=usecols,
        dtype=dtype,
        encoding=encoding,
        # the C engine (the reference's default, `dataset.py:484`) parses
        # ~20× faster; it only requires a single-char separator
        engine="c" if len(field_separator) == 1 else "python",
    )
    # preserve declared column order (usecols order is not guaranteed)
    df = df[usecols]
    df.columns = columns

    for field in columns:
        ftype = field2type[field]
        if ftype == FeatureType.TOKEN_SEQ:
            df[field] = df[field].fillna(value="")
            df[field] = [
                np.array(list(filter(None, str(v).split(seq_separator))))
                for v in df[field].values
            ]
        elif ftype == FeatureType.FLOAT_SEQ:
            df[field] = df[field].fillna(value="")
            df[field] = [
                np.array(
                    list(map(float, filter(None, str(v).split(seq_separator)))),
                    dtype=np.float64,
                )
                for v in df[field].values
            ]
    return df, field2type
