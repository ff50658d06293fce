"""Scatter/gather cost landscape for the sparse-adam design (round 5).

Questions (VERDICT r4 #3): what does an XLA row scatter into a (V, D)
table really cost on this chip as a function of n (rows), V (vocab),
op (add/set) and hints (sorted/unique)? And where is the crossover where
true row-sparse adam beats the dense update sweep?

Methodology: each probe is a lax.scan chain of K ops over a DONATED
table (fresh ids per step ride the scan xs), timed best-of-N with a
full-table checksum consumed after the chain (partially-read probes are
sliced by XLA — EXPERIMENTS §R4.3 postmortem).
"""

from __future__ import annotations

import json
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

K = 20
REPS = 5


def timed(fn, state, *static):
    """fn(*state, *static) -> (checksum, *new_state); donated state is
    threaded back in between reps; the checksum D2H read drains the
    chain inside each timed window."""
    out = fn(*state, *static)
    float(np.asarray(out[0]))
    state = out[1:]
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = fn(*state, *static)
        float(np.asarray(out[0]))
        best = min(best, time.perf_counter() - t0)
        state = out[1:]
    return best / K


def probe_scatter(V, D, n, op="add", sorted_=False, unique=False):
    rng = np.random.default_rng(0)
    table = jnp.zeros((V, D), jnp.float32)
    ids = rng.integers(0, V, (K, n)).astype(np.int32)
    if sorted_:
        ids = np.sort(ids, axis=1)
    if unique:
        # unique-ish: stride the table so ids are distinct per step
        base = (np.arange(n) * (V // n)).astype(np.int32)
        ids = np.stack([(base + i) % V for i in range(K)])
        if sorted_:
            ids = np.sort(ids, axis=1)
    rows = rng.standard_normal((K, n, D)).astype(np.float32)

    @partial(jax.jit, donate_argnums=(0,))
    def run(table, ids, rows):
        def body(t, x):
            i, r = x
            if op == "add":
                t = t.at[i].add(
                    r, indices_are_sorted=sorted_, unique_indices=unique
                )
            else:
                t = t.at[i].set(
                    r, indices_are_sorted=sorted_, unique_indices=unique
                )
            return t, jnp.float32(0)

        t, _ = jax.lax.scan(body, table, (ids, rows))
        return jnp.sum(t), t

    dt = timed(run, (table,), jax.device_put(ids), jax.device_put(rows))
    return {"V": V, "D": D, "n": n, "op": op, "sorted": sorted_,
            "unique": unique, "ms": round(dt * 1e3, 3),
            "ns_per_row": round(dt / n * 1e9, 1)}


def probe_dense_adam(V, D):
    """The dense adam sweep alone (param+mu+nu read+write) at vocab V."""
    rng = np.random.default_rng(1)
    p = jnp.asarray(rng.standard_normal((V, D)).astype(np.float32))
    mu = jnp.zeros((V, D), jnp.bfloat16)
    nu = jnp.zeros((V, D), jnp.float32)
    n = 8192
    ids = jnp.asarray(rng.integers(0, V, (K, n)).astype(np.int32))
    rows = jnp.asarray(rng.standard_normal((K, n, D)).astype(np.float32))

    @partial(jax.jit, donate_argnums=(0, 1, 2))
    def run(p, mu, nu, ids, rows):
        def body(carry, x):
            p, mu, nu = carry
            i, r = x
            g = jnp.zeros_like(p).at[i].add(r)  # dense grad materialize
            mu2 = (0.9 * mu.astype(jnp.float32) + 0.1 * g).astype(jnp.bfloat16)
            nu2 = 0.999 * nu + 0.001 * g * g
            step = mu2.astype(jnp.float32) / (jnp.sqrt(nu2) + 1e-8)
            return (p - 1e-3 * step, mu2, nu2), jnp.float32(0)

        (p, mu, nu), _ = jax.lax.scan(body, (p, mu, nu), (ids, rows))
        return jnp.sum(p), p, mu, nu

    dt = timed(run, (p, mu, nu), ids, rows)
    return {"V": V, "D": D, "kind": "dense_adam+scatter_grad",
            "ms": round(dt * 1e3, 3)}


def probe_sparse_adam(V, D, n):
    """True row-sparse adam: gather moment rows at ids, update, scatter
    back (set) — the O(n) update the sparse path would run per table."""
    rng = np.random.default_rng(2)
    p = jnp.asarray(rng.standard_normal((V, D)).astype(np.float32))
    mu = jnp.zeros((V, D), jnp.bfloat16)
    nu = jnp.zeros((V, D), jnp.float32)
    base = (np.arange(n) * (V // n)).astype(np.int32)
    ids = jnp.asarray(
        np.stack([np.sort((base + 7 * i) % V) for i in range(K)])
    )
    rows = jnp.asarray(rng.standard_normal((K, n, D)).astype(np.float32))

    @partial(jax.jit, donate_argnums=(0, 1, 2))
    def run(p, mu, nu, ids, rows):
        def body(carry, x):
            p, mu, nu = carry
            i, g = x
            m = mu[i].astype(jnp.float32)
            v = nu[i]
            m2 = 0.9 * m + 0.1 * g
            v2 = 0.999 * v + 0.001 * g * g
            rp = p[i] - 1e-3 * m2 / (jnp.sqrt(v2) + 1e-8)
            kw = dict(indices_are_sorted=True, unique_indices=True)
            p = p.at[i].set(rp, **kw)
            mu = mu.at[i].set(m2.astype(jnp.bfloat16), **kw)
            nu = nu.at[i].set(v2, **kw)
            return (p, mu, nu), jnp.float32(0)

        (p, mu, nu), _ = jax.lax.scan(body, (p, mu, nu), (ids, rows))
        return jnp.sum(p), p, mu, nu

    dt = timed(run, (p, mu, nu), ids, rows)
    return {"V": V, "D": D, "n": n, "kind": "sparse_adam_rows",
            "ms": round(dt * 1e3, 3),
            "ns_per_row": round(dt / n / 3 * 1e9, 1)}


def main():
    out = []
    for n in (8192, 24576):
        for V in (300_000, 3_000_000):
            out.append(probe_scatter(V, 64, n, "add"))
            out.append(probe_scatter(V, 64, n, "add", sorted_=True))
            out.append(probe_scatter(V, 64, n, "set", sorted_=True,
                                     unique=True))
            out.append(probe_scatter(V, 64, n, "add", sorted_=True,
                                     unique=True))
            print(json.dumps(out[-4:]), flush=True)
    for V in (300_000, 1_000_000, 3_000_000):
        out.append(probe_dense_adam(V, 64))
        out.append(probe_sparse_adam(V, 64, 8192))
        print(json.dumps(out[-2:]), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
