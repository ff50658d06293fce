"""Seeding and PRNG plumbing.

The reference seeds python/numpy/torch globally (`recbole/utils/utils.py:190`).
In JAX, device randomness is explicit: we hand out `jax.random.key` splits.
Host-side randomness (negative sampling, OOV batch transforms, shuffles) uses
per-component `numpy.random.Generator` instances so streams are independent
and reproducible regardless of evaluation order.
"""

from __future__ import annotations

import random

import numpy as np


def init_seed(seed: int, reproducibility: bool = True) -> None:
    """Seed the host-global RNGs (python + legacy numpy).

    Components that need their own stream should call `host_rng(seed, tag)`
    instead of relying on the globals.
    """
    random.seed(seed)
    np.random.seed(seed)


def host_rng(seed: int, tag: str = "") -> np.random.Generator:
    """A dedicated, reproducible host RNG stream for component `tag`."""
    ss = np.random.SeedSequence([seed, _stable_hash32(tag)])
    return np.random.Generator(np.random.PCG64(ss))


def _stable_hash32(s: str) -> int:
    """Stable (process-independent) 32-bit hash of a string (FNV-1a)."""
    h = 2166136261
    for ch in s.encode("utf-8"):
        h = ((h ^ ch) * 16777619) & 0xFFFFFFFF
    return h


def jax_key(seed: int):
    import jax

    return jax.random.key(seed)
