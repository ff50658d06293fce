"""HBM streaming-rate probes for the BPR-step roofline (round-4 #1).

Isolates the question the trace raised: the dense-adam update fusions
move ~420 MB/step at only ~180 GB/s effective. Is that (a) the chip's
real streaming rate (tunnel-shared v5e), (b) the bf16-mu mixed-layout
penalty, or (c) the scatter? Each probe times a scanned chain of the
isolated op at the bench shapes and prints GB/s.

Usage: python tools/probe_hbm.py
"""

from __future__ import annotations

import json
import time
from functools import partial

import numpy as np

V, D = 300_000, 64   # combined user+item table rows at bench shapes
B = 8192
STEPS = 30


def _time_chain(fn, *args, donate=()):
    import jax

    jit = jax.jit(fn, donate_argnums=donate)
    out = jit(*args)
    jax.tree.flatten(out)[0][0].block_until_ready()
    # fresh args after donation
    out0 = out
    t0 = time.perf_counter()
    out = jit(*out0) if donate else jit(*args)
    float(np.asarray(jax.tree.flatten(out)[0][0]).ravel()[0])
    return time.perf_counter() - t0


def probe_triad():
    """f32 triad y = a*x + y over (V, D): reads 2, writes 1."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    x = jnp.ones((V, D), jnp.float32)
    y = jnp.ones((V, D), jnp.float32)

    @partial(jax.jit, donate_argnums=(0, 1))
    def chain(x, y):
        def body(c, _):
            x, y = c
            return (x, y + 0.5 * x), 0.0

        (x, y), _ = lax.scan(body, (x, y), jnp.arange(STEPS))
        return x, y

    x, y = chain(x, y)
    y.block_until_ready()
    t0 = time.perf_counter()
    x, y = chain(x, y)
    float(y[0, 0])
    dt = time.perf_counter() - t0
    byts = STEPS * (3 * V * D * 4)
    return byts / dt / 1e9


def probe_adam(mu_dtype):
    """Full dense-adam update (optax scale_by_adam) on a (V, D) table
    with a DENSE fake grad — the trace's fusion.107 in isolation."""
    import jax
    import jax.numpy as jnp
    import optax
    from jax import lax

    tx = optax.chain(optax.scale_by_adam(mu_dtype=mu_dtype),
                     optax.scale(-1e-3))
    p = jnp.ones((V, D), jnp.float32)
    s = tx.init(p)
    g = jnp.full((V, D), 1e-4, jnp.float32)

    @partial(jax.jit, donate_argnums=(0, 1))
    def chain(p, s, g):
        def body(c, _):
            p, s = c
            u, s2 = tx.update(g, s, p)
            return (optax.apply_updates(p, u), s2), 0.0

        (p, s), _ = lax.scan(body, (p, s), jnp.arange(STEPS))
        return p, s

    p, s = chain(p, s, g)
    p.block_until_ready()
    t0 = time.perf_counter()
    p, s = chain(p, s, g)
    float(p[0, 0])
    dt = time.perf_counter() - t0
    mu_b = 2 if mu_dtype == "bfloat16" else 4
    byts = STEPS * (
        V * D * (4 * 2 + 4 * 2 + mu_b * 2)   # p, nu r+w; mu r+w
        + V * D * 4                           # grad read
    )
    return byts / dt / 1e9, dt / STEPS * 1e3


def probe_scatter():
    """Dense-grad materialization: scatter-add B rows into zeros (V, D) —
    the backward of the embedding gather (trace fusion.106)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    ids = jnp.asarray(
        np.random.default_rng(0).integers(0, V, (STEPS, B)), jnp.int32
    )
    vals = jnp.ones((STEPS, B, D), jnp.float32)

    @jax.jit
    def chain(ids, vals):
        def body(_, x):
            i, v = x
            g = jnp.zeros((V, D), jnp.float32).at[i].add(v)
            return None, g[0, 0]

        _, out = lax.scan(body, None, (ids, vals))
        return out

    out = chain(ids, vals)
    out.block_until_ready()
    t0 = time.perf_counter()
    out = chain(ids, vals)
    float(out[0])
    dt = time.perf_counter() - t0
    byts = STEPS * (V * D * 4 * 2 + B * D * 4)   # zero-init write + rmw
    return byts / dt / 1e9, dt / STEPS * 1e3


def main():
    out = {
        "triad_gbs": round(probe_triad(), 1),
    }
    for mu in (None, "bfloat16"):
        gbs, ms = probe_adam(mu)
        key = f"adam_mu_{mu or 'f32'}"
        out[key + "_gbs"] = round(gbs, 1)
        out[key + "_ms"] = round(ms, 3)
    gbs, ms = probe_scatter()
    out["scatter_gbs"] = round(gbs, 1)
    out["scatter_ms"] = round(ms, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
