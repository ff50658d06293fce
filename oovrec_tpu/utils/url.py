"""Benchmark-dataset download (`recbole/utils/url.py:1-126` analog).

Resolution order for `ensure_dataset(name)`:
  1. the atomic files are already at `<data_path>/<name>/` → return it;
  2. the name is in the URL registry (`config/dataset_urls.yaml` +
     `kg_dataset_urls.yaml`, the reference's own dataset tables) and the
     environment has egress → download the zip, extract, return;
  3. otherwise raise with the expected layout.

The download leg is a straight urllib fetch + zip extract (the
reference's `download_url`/`extract_zip`, `url.py:44-103`); in the
zero-egress build environment it fails fast with a clear message instead
of hanging (short connect timeout).
"""

from __future__ import annotations

import os
import zipfile
from typing import Dict, Optional

import yaml

_URL_FILES = ("dataset_urls.yaml", "kg_dataset_urls.yaml")
_registry: Optional[Dict[str, str]] = None


def dataset_url_registry() -> Dict[str, str]:
    """name → zip URL, loaded from the bundled tables (lazy, cached)."""
    global _registry
    if _registry is None:
        _registry = {}
        base = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "config")
        # plain table wins over the KG variant for overlapping names
        # (e.g. ml-1m exists in both; KG zips carry the .kg/.link files)
        for fn in reversed(_URL_FILES):
            p = os.path.join(base, fn)
            if os.path.isfile(p):
                with open(p) as f:
                    _registry.update(yaml.safe_load(f) or {})
    return _registry


def download_dataset(name: str, url: str, data_path: str,
                     timeout: float = 10.0) -> str:
    """Fetch + extract one dataset zip into `<data_path>/<name>/`."""
    import urllib.request

    os.makedirs(data_path, exist_ok=True)
    zip_path = os.path.join(data_path, url.rpartition("/")[2])
    if not os.path.isfile(zip_path):
        with urllib.request.urlopen(url, timeout=timeout) as r, \
                open(zip_path + ".part", "wb") as f:
            while True:
                chunk = r.read(1 << 20)
                if not chunk:
                    break
                f.write(chunk)
        os.replace(zip_path + ".part", zip_path)
    target = os.path.join(data_path, name)
    with zipfile.ZipFile(zip_path) as z:
        names = z.namelist()
        root = names[0].split("/")[0] if names and "/" in names[0] else ""
        z.extractall(data_path)
    # normalize the extracted dir name to the requested dataset name
    if root and root != name and os.path.isdir(
            os.path.join(data_path, root)) and not os.path.isdir(target):
        os.rename(os.path.join(data_path, root), target)
    return target


def ensure_dataset(name: str, data_path: str = "dataset/") -> str:
    """Return the dataset directory, downloading it if needed & possible."""
    d = os.path.join(data_path, name)
    inter = os.path.join(d, f"{name}.inter")
    if os.path.isfile(inter):
        return d
    url = dataset_url_registry().get(name)
    if url is not None:
        try:
            out = download_dataset(name, url, data_path)
            if os.path.isfile(os.path.join(out, f"{name}.inter")):
                return out
        except OSError as e:
            raise FileNotFoundError(
                f"Dataset [{name}] is downloadable from {url} but the "
                f"fetch failed ({e}); in a zero-egress environment place "
                f"the atomic files at {d} manually."
            ) from e
    raise FileNotFoundError(
        f"Dataset [{name}] not found at {d} and not in the URL registry. "
        f"Place the atomic files ({name}.inter[, .user, .item]) there "
        f"manually. {len(dataset_url_registry())} public datasets are "
        f"auto-downloadable by name."
    )
