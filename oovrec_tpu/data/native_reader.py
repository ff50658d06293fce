"""ctypes wrapper for the native atomic-file reader
(native/atomic_reader.cpp): one-pass TSV parse + first-appearance token
coding. Returns token columns as pandas Categoricals (codes + uniques in
pd.factorize order) so `Dataset._remap_fields` can merge vocabularies
bit-identically without materializing strings.

Auto-compiles the shared library like ops/siphash.py; returns None when
the native path cannot serve a request (seq columns, empty token cells,
no compiler) and the pandas path takes over.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, Optional

import numpy as np
import pandas as pd

from oovrec_tpu.utils.enums import FeatureType

_LIB: Optional[ctypes.CDLL] = None
_LIB_TRIED = False
_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native"
)


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    so = os.path.join(_NATIVE_DIR, "libatomic_reader.so")
    src = os.path.join(_NATIVE_DIR, "atomic_reader.cpp")
    try:
        if (not os.path.isfile(so)
                or os.path.getmtime(so) < os.path.getmtime(src)):
            for cc in ("c++", "g++", "cc"):
                try:
                    subprocess.run(
                        [cc, "-O3", "-std=c++17", "-shared", "-fPIC",
                         "-pthread", src, "-o", so],
                        check=True, capture_output=True, timeout=180,
                    )
                    break
                except (FileNotFoundError, subprocess.CalledProcessError):
                    continue
        lib = ctypes.CDLL(so)
        lib.ar_parse.restype = ctypes.c_void_p
        lib.ar_parse.argtypes = [
            ctypes.c_char_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.c_char,
        ]
        lib.ar_num_rows.restype = ctypes.c_int64
        lib.ar_num_rows.argtypes = [ctypes.c_void_p]
        for name in ("ar_token_empty", "ar_uniques_count",
                     "ar_uniques_bytes"):
            fn = getattr(lib, name)
            fn.restype = ctypes.c_int64
            fn.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.ar_token_codes.restype = None
        lib.ar_token_codes.argtypes = [
            ctypes.c_void_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.ar_uniques.restype = None
        lib.ar_uniques.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.ar_floats.restype = None
        lib.ar_floats.argtypes = [
            ctypes.c_void_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_double),
        ]
        lib.ar_free.restype = None
        lib.ar_free.argtypes = [ctypes.c_void_p]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def native_available() -> bool:
    return _load() is not None


def read_atomic_native(
    filepath: str,
    columns,                       # output field names, header order
    phys_idx,                      # physical column index per field
    field2type: Dict[str, FeatureType],
    field_separator: str,
) -> Optional[pd.DataFrame]:
    """Parse a scalar-column atomic file natively; None → caller falls
    back to pandas (seq columns, empty token cells, load failure)."""
    lib = _load()
    if lib is None or len(field_separator) != 1:
        return None
    types = []
    for f in columns:
        t = field2type[f]
        if t == FeatureType.TOKEN:
            types.append(0)
        elif t == FeatureType.FLOAT:
            types.append(1)
        else:
            return None  # seq columns: pandas path
    n = len(columns)
    ci = (ctypes.c_int * n)(*phys_idx)
    ct = (ctypes.c_int * n)(*types)
    h = lib.ar_parse(filepath.encode(), n, ci, ct,
                     field_separator.encode())
    if not h:
        return None
    try:
        n_rows = lib.ar_num_rows(h)
        data = {}
        for i, f in enumerate(columns):
            if types[i] == 0:
                if lib.ar_token_empty(h, i):
                    return None  # NaN-cell semantics: pandas path
                codes = np.empty(n_rows, np.int32)
                lib.ar_token_codes(
                    h, i, codes.ctypes.data_as(
                        ctypes.POINTER(ctypes.c_int32))
                )
                n_u = lib.ar_uniques_count(h, i)
                blob = ctypes.create_string_buffer(
                    int(lib.ar_uniques_bytes(h, i)))
                offs = np.empty(n_u + 1, np.int64)
                lib.ar_uniques(
                    h, i, blob,
                    offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                )
                raw = blob.raw
                uniques = [
                    raw[offs[j]:offs[j + 1]].decode("utf-8")
                    for j in range(n_u)
                ]
                data[f] = pd.Categorical.from_codes(
                    codes, categories=pd.Index(uniques, dtype=object)
                )
            else:
                vals = np.empty(n_rows, np.float64)
                lib.ar_floats(
                    h, i, vals.ctypes.data_as(
                        ctypes.POINTER(ctypes.c_double))
                )
                data[f] = vals
        return pd.DataFrame(data)
    finally:
        lib.ar_free(h)
