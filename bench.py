"""Benchmark: BPR train-step throughput (examples/s) on the default device.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "examples/s", "vs_baseline": N}

`vs_baseline` is the speedup over a CPU run of the identical step (the
BASELINE.md target is ≥5× CPU). The CPU number is measured in a
subprocess (fresh backend) and cached in bench_baselines.json keyed by the
workload signature, so repeat runs don't pay the CPU cost again.
"""

from __future__ import annotations

import json
from functools import partial
import os
import subprocess
import sys
import time

import numpy as np

# workload: two-tower BPR with OOV bucket routing, production-ish shapes
N_USERS = 200_000
N_ITEMS = 100_000
EMB = 64
BATCH = 8192
N_BUCKETS = 1024
WARMUP = 3
STEPS = 30
SIG = f"bpr-{N_USERS}-{N_ITEMS}-{EMB}-{BATCH}-{N_BUCKETS}-donated-bf16mu"
BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "bench_baselines.json")


def measure(platform: str | None = None, steps: int = STEPS) -> float:
    """Examples/s of the jitted BPR train step on the selected platform."""
    import jax

    if platform:
        jax.config.update("jax_platforms", platform)
    import jax.numpy as jnp

    from oovrec_tpu.inductive.spec import InductiveSpec
    from oovrec_tpu.models import BPR
    from oovrec_tpu.train.optimizers import build_optimizer
    import optax

    spec = InductiveSpec(
        mapper="random", add_oov_buckets=True,
        n_user_buckets=N_BUCKETS, n_item_buckets=N_BUCKETS,
        embedding_size=EMB,
    )
    model = BPR(n_users=N_USERS, n_items=N_ITEMS, embedding_size=EMB, spec=spec)
    rng = np.random.default_rng(0)
    batch = {
        "user_id": rng.integers(0, N_USERS, BATCH).astype(np.int32),
        "item_id": rng.integers(1, N_ITEMS, BATCH).astype(np.int32),
        "neg_item_id": rng.integers(1, N_ITEMS, BATCH).astype(np.int32),
        "weight": np.ones(BATCH, np.float32),
    }
    for f in ("user_id", "item_id", "neg_item_id"):
        batch[f + "_oov"] = (rng.random(BATCH) < 0.1).astype(np.int32)
        batch[f + "_bucket"] = rng.integers(0, N_BUCKETS, BATCH).astype(np.int32)

    variables = model.init(jax.random.key(0), batch, {},
                           method=model.calculate_loss)
    tx = build_optimizer("adam", 1e-3, mu_dtype="bfloat16")
    params = variables["params"]
    opt_state = tx.init(params)

    # donate params/opt_state: the updated tables reuse the input buffers
    # (halves HBM traffic for the two big embedding tables + adam moments)
    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, b):
        def loss_fn(p):
            return model.apply({"params": p}, b, {},
                               method=model.calculate_loss)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return loss, optax.apply_updates(params, updates), opt_state2

    db = jax.device_put(batch)
    for _ in range(WARMUP):
        loss, params, opt_state = step(params, opt_state, db)
    jax.block_until_ready((loss, params, opt_state))
    t0 = time.perf_counter()
    for _ in range(steps):
        loss, params, opt_state = step(params, opt_state, db)
    jax.block_until_ready((loss, params, opt_state))
    dt = time.perf_counter() - t0
    return BATCH * steps / dt


def cpu_baseline() -> float:
    cache = {}
    if os.path.isfile(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            cache = json.load(f)
    if SIG in cache:
        return float(cache[SIG])
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--cpu-probe"],
        capture_output=True, text=True, timeout=1200,
        cwd=os.path.dirname(os.path.abspath(__file__)),
    )
    val = float(out.stdout.strip().splitlines()[-1])
    cache[SIG] = val
    with open(BASELINE_FILE, "w") as f:
        json.dump(cache, f, indent=1)
    return val


def main():
    if "--cpu-probe" in sys.argv:
        print(measure(platform="cpu", steps=10))
        return
    eps = measure()
    try:
        base = cpu_baseline()
        vs = eps / base if base > 0 else float("nan")
    except Exception:
        vs = float("nan")
    print(json.dumps({
        "metric": "bpr_oov_train_throughput",
        "value": round(eps, 1),
        "unit": "examples/s",
        "vs_baseline": round(vs, 2) if vs == vs else None,
    }))


if __name__ == "__main__":
    main()
