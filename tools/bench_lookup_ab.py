"""A/B the two sharded-embedding lookup strategies on a virtual mesh.

Runs psum vs all-to-all lookups (fwd + grad) on an
`--xla_force_host_platform_device_count=8` CPU mesh at n_model ∈ {2, 4}.
CPU wall-times are a weak proxy for ICI behavior (host "collectives" are
memcpys), so the analytic per-device exchange bytes are printed next to
them — the auto-selection rule in `make_lookup` is based on the traffic
model, sanity-checked by these timings.

  python tools/bench_lookup_ab.py
"""

from __future__ import annotations

import os
import time

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from oovrec_tpu.parallel.mesh import make_mesh
from oovrec_tpu.parallel.sharded_embedding import (
    make_alltoall_lookup,
    make_sharded_lookup,
    place_sharded_table,
)

V, D, B = 262_144, 64, 8192
F = 2.0  # capacity factor


def timeit(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    rng = np.random.default_rng(0)
    table = rng.standard_normal((V, D)).astype(np.float32)
    ids = rng.integers(0, V, B).astype(np.int32)

    for n_model in (2, 4):
        n_data = 8 // n_model
        mesh = make_mesh(n_data, n_model)
        st = place_sharded_table(mesh, table)
        dids = jnp.asarray(ids)
        b = B // n_data  # per-data-shard block
        bytes_psum = 2 * b * D * 4 * (n_model - 1) / n_model
        bytes_a2a = (F * b / n_model + b * (n_model - 1) / n_model) * D * 4

        psum = jax.jit(make_sharded_lookup(mesh))
        a2a_f = make_alltoall_lookup(mesh, capacity_factor=F)
        a2a = jax.jit(lambda t, i: a2a_f(t, i)[0])

        g_psum = jax.jit(jax.grad(lambda t: jnp.sum(psum(t, dids) ** 2)))
        g_a2a = jax.jit(jax.grad(lambda t: jnp.sum(a2a(t, dids) ** 2)))

        print(
            f"mesh data={n_data} model={n_model}  "
            f"fwd psum {timeit(psum, st, dids):.2f} ms "
            f"vs a2a {timeit(a2a, st, dids):.2f} ms | "
            f"grad psum {timeit(g_psum, st):.2f} ms "
            f"vs a2a {timeit(g_a2a, st):.2f} ms | "
            f"analytic bytes/device psum {bytes_psum/1e6:.2f} MB "
            f"vs a2a {bytes_a2a/1e6:.2f} MB"
        )


if __name__ == "__main__":
    main()
