"""DHE host-side hashing: ID → num_hashes SipHash-2-4 digests mod 2^24.

Equivalent of `DeepHashEmbedder._hash_ids` / `FeatDeepHashEmbedder`
(`dh_embedder.py:122-170`, `feat_dh_embedder.py:133-197`): the reference
hashes the (possibly prime-padded) ID's 8-byte little-endian
representation with 128 persisted SipHash keys, memoized per ID. Here the
whole batch hashes in one native/NumPy call; an LRU-ish dict memoizes rows
across batches like the reference's functools.cache.

Key persistence matches `get_hash_keys` (`dh_embedder.py:95-120`):
`<hash_key_dir>/<num_hashes>.hashes` holding hex-encoded 16-byte keys —
files written by the reference are readable by this class and vice versa.
"""

from __future__ import annotations

import json
import os
import secrets
from typing import Dict, Optional

import numpy as np

from oovrec_tpu.ops.siphash import keys_to_u64, siphash24_batch

MAX_HASH = 16777216  # 2^24 (`dh_embedder.py:53`)


class DHEHasher:
    def __init__(self, num_hashes: int = 128,
                 hash_key_dir: str = "./hash_keys",
                 keys_u64: Optional[np.ndarray] = None,
                 on_device: bool = False):
        self.num_hashes = num_hashes
        self.hash_key_dir = hash_key_dir
        self.on_device = on_device
        if keys_u64 is not None:
            self.keys = np.asarray(keys_u64, dtype=np.uint64).reshape(-1, 2)
            assert len(self.keys) == num_hashes
        else:
            self.keys = self._load_or_create_keys()
        self._memo: Dict[int, np.ndarray] = {}

    def _load_or_create_keys(self) -> np.ndarray:
        os.makedirs(self.hash_key_dir, exist_ok=True)
        path = os.path.join(self.hash_key_dir, f"{self.num_hashes}.hashes")
        if os.path.exists(path):
            with open(path) as f:
                hexes = json.load(f)
            assert len(hexes) == self.num_hashes
            return keys_to_u64([bytes.fromhex(x) for x in hexes])
        key_bytes = [secrets.token_bytes(16) for _ in range(self.num_hashes)]
        with open(path, "w") as f:
            json.dump([k.hex() for k in key_bytes], f)
        return keys_to_u64(key_bytes)

    def hash_ids(self, ids: np.ndarray) -> np.ndarray:
        """(B,) int → (B, num_hashes) float32 of digests % 2^24."""
        ids = np.asarray(ids, dtype=np.int64)
        out = np.empty((len(ids), self.num_hashes), dtype=np.float32)
        miss_idx = []
        miss_ids = []
        for i, v in enumerate(ids):
            row = self._memo.get(int(v))
            if row is None:
                miss_idx.append(i)
                miss_ids.append(int(v))
            else:
                out[i] = row
        if miss_ids:
            msgs = np.array(miss_ids, dtype=np.int64).astype(np.uint64)
            digests = siphash24_batch(msgs, self.keys)
            rows = (digests % np.uint64(MAX_HASH)).astype(np.float32)
            for j, i in enumerate(miss_idx):
                self._memo[miss_ids[j]] = rows[j]
                out[i] = rows[j]
        return out

    def annotate_batch(self, batch: dict, field: str, prime_pad: int,
                       padded_when_flagged: bool = True) -> dict:
        """Attach `<field>_dhe`: hashes of the effective (padded) ID.

        Reference semantics: DHE/fDHE hash the PADDED id during OOV
        simulation (`feat_dh_embedder.py:190-197` hashes `old_user_ids`),
        while feature lookups use the unpadded id (handled by routing,
        which indexes feature matrices with the raw id column).
        """
        ids = np.asarray(batch[field], dtype=np.int64)
        flags = np.asarray(batch.get(field + "_oov", np.zeros_like(ids)))
        if padded_when_flagged:
            eff = np.where(flags > 0, ids + prime_pad, ids)
        else:
            eff = ids
        if self.on_device:
            # ship id halves; the jitted step hashes them on the TPU
            # (ops/siphash_device.py) — 64× less host→device transfer
            from oovrec_tpu.ops.siphash_device import split_ids

            lo, hi = split_ids(eff)
            batch[field + "_dhe_lo"] = lo
            batch[field + "_dhe_hi"] = hi
        else:
            batch[field + "_dhe"] = self.hash_ids(eff)
        return batch
