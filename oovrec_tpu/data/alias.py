"""O(1) alias-table sampling for the device popularity draw.

The device epoch used to draw popularity negatives via inverse CDF
(searchsorted over cumsum(pop_p)) — a log(n_items)-depth gather chain
PER DRAW inside the resampling while_loop, which made popularity epochs
4.1× slower than uniform at the 10M corpus (EXPERIMENTS §R4). Walker's
alias method makes every draw O(1) with static shapes: two table
gathers + one compare — the TPU-native form. The table is built
host-side once per epoch runner (Vose's algorithm, float64); the draw is
    u ~ U[0, n);  k = floor(u);  frac = u - k
    id = frac < prob[k] ? k : alias[k]
and reproduces the host distribution exactly up to the float32 uniform
(`data/sampler.py:_draw` popularity branch = np.random.choice over
counts**alpha, `ref:sampler.py:99`).

Exactness invariant (tested): a correct table reconstructs p via
    p[i] = (prob[i] + Σ_{j: alias[j]=i} (1 - prob[j])) / n.
"""

from __future__ import annotations

import numpy as np


def build_alias_table(p) -> tuple[np.ndarray, np.ndarray]:
    """Vose's algorithm: probabilities `p` (any nonnegative weights; they
    are normalized) → (prob float32 (n,), alias int32 (n,)). O(n) host
    time — ~1 s at 1M items, built once per DeviceEpoch."""
    p = np.asarray(p, dtype=np.float64)
    n = p.size
    if n == 0:
        raise ValueError("empty probability vector")
    total = p.sum()
    if not (total > 0):
        raise ValueError("probability vector sums to zero")
    scaled = p * (n / total)
    alias = np.arange(n, dtype=np.int32)
    prob = np.ones(n, dtype=np.float64)
    small = [i for i in range(n) if scaled[i] < 1.0]
    large = [i for i in range(n) if scaled[i] >= 1.0]
    while small and large:
        s_i = small.pop()
        l_i = large.pop()
        prob[s_i] = scaled[s_i]
        alias[s_i] = l_i
        scaled[l_i] = (scaled[l_i] + scaled[s_i]) - 1.0
        if scaled[l_i] < 1.0:
            small.append(l_i)
        else:
            large.append(l_i)
    # leftovers sit at 1.0 within float error: prob already 1, alias=self
    return prob.astype(np.float32), alias


def alias_draw(rng, shape, prob, alias):
    """Device-side O(1) categorical draw from a (prob, alias) table.
    jit-safe, static shapes; two gathers + one compare per element."""
    import jax
    import jax.numpy as jnp

    n = prob.shape[0]
    u = jax.random.uniform(rng, shape) * n
    k = jnp.minimum(u.astype(jnp.int32), n - 1)  # floor; clamp the
    # float32 edge where u rounds to exactly n (ADVICE r4 #1 class)
    frac = u - k.astype(u.dtype)
    return jnp.where(frac < prob[k], k, alias[k]).astype(jnp.int32)


def reconstruct_p(prob: np.ndarray, alias: np.ndarray) -> np.ndarray:
    """Fold a (prob, alias) table back into the distribution it encodes —
    the exactness oracle for tests."""
    n = prob.size
    out = prob.astype(np.float64).copy()
    np.add.at(out, alias, 1.0 - prob.astype(np.float64))
    return out / n
