"""Benchmark-dataset download helper (`recbole/utils/url.py:1-126` analog).

This environment has zero egress; the function resolves local copies and
raises a clear error otherwise (documenting the expected layout)."""

from __future__ import annotations

import os

DATASET_REGISTRY = {
    # name -> canonical RecBole download file (for documentation)
    "ml-100k": "ml-100k.zip",
    "ml-1m": "ml-1m.zip",
    "yelp": "yelp.zip",
    "amazon-books": "Amazon_Books.zip",
    "lfm1b-artists": "lfm1b-artists.zip",
}


def ensure_dataset(name: str, data_path: str = "dataset/") -> str:
    """Return the dataset directory, verifying the atomic files exist."""
    d = os.path.join(data_path, name)
    inter = os.path.join(d, f"{name}.inter")
    if os.path.isfile(inter):
        return d
    raise FileNotFoundError(
        f"Dataset [{name}] not found at {d}. This environment has no "
        f"network egress; place the atomic files ({name}.inter[, .user, "
        f".item]) there manually. Known public names: "
        f"{sorted(DATASET_REGISTRY)}"
    )
