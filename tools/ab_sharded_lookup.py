"""A/B the three row-sharded table strategies in REAL training steps.

Strategies (config `sharded_lookup`):
  gspmd    — dense (V, D) tables, P('model', None) annotation, XLA
             inserts the collectives.
  psum     — ShardedEmbed (S, V/S, D) + gather-and-all-reduce exchange.
  alltoall — ShardedEmbed + capacity-bounded id/row all_to_all.

Runs the flagship BPR train step (loss + grads + adam) at a ≥1M-row vocab
over a ('data','model') mesh and times a scanned multi-step dispatch per
strategy. On the virtual CPU mesh the numbers measure program structure
(copies + reduction work), NOT ICI — the traffic model in
parallel/sharded_embedding.py `make_lookup` is the bandwidth argument;
this harness validates compile-ability + relative step cost and records
both in docs/DISTRIBUTED.md.

Usage:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
    python tools/ab_sharded_lookup.py [--vocab=1048576] [--steps=8] \
    [--data=4] [--model=2] [--batch=4096]
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_ab(vocab=1 << 20, steps=8, n_data=4, n_model=2, batch=4096, emb=64):
    import jax
    import jax.numpy as jnp
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from oovrec_tpu.models import get_model_class
    from oovrec_tpu.parallel.mesh import make_mesh, param_sharding
    from oovrec_tpu.parallel.train_step import opt_state_sharding
    from oovrec_tpu.train.optimizers import build_optimizer

    mesh = make_mesh(n_data, n_model)
    rng = np.random.default_rng(0)
    K = steps
    xs = {
        "user_id": rng.integers(0, vocab, (K, batch)).astype(np.int32),
        "item_id": rng.integers(1, vocab, (K, batch)).astype(np.int32),
        "neg_item_id": rng.integers(1, vocab, (K, batch)).astype(np.int32),
        "weight": np.ones((K, batch), np.float32),
    }
    batch0 = {k: v[0] for k, v in xs.items()}
    results = {}
    for kind in ("gspmd", "psum", "alltoall"):
        cls = get_model_class("BPR")
        kwargs = dict(n_users=vocab, n_items=vocab, embedding_size=emb)
        if kind != "gspmd":
            kwargs.update(sharded_mesh=mesh, sharded_lookup=kind,
                          row_shard_threshold=4096)
        model = cls(**kwargs)
        tx = build_optimizer("adam", 1e-3, mu_dtype="bfloat16")
        variables = model.init(jax.random.key(0), batch0, {},
                               method=model.calculate_loss)
        params = variables["params"]
        p_shard = param_sharding(mesh, params)
        params = jax.tree.map(jax.device_put, params, p_shard)
        opt_state = jax.tree.map(
            jax.device_put, tx.init(params),
            opt_state_sharding(mesh, tx.init(params), p_shard),
        )
        bshard = NamedSharding(mesh, P(None, "data"))
        dxs = jax.device_put(xs, bshard)

        @partial(jax.jit, donate_argnums=(0, 1))
        def run_steps(params, opt_state, xs):
            def body(carry, b):
                p, s = carry

                def loss_fn(p):
                    return model.apply({"params": p}, b, {},
                                       method=model.calculate_loss)

                loss, grads = jax.value_and_grad(loss_fn)(p)
                updates, s2 = tx.update(grads, s, p)
                return (optax.apply_updates(p, updates), s2), loss

            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), xs)
            return losses[-1], params, opt_state

        t0 = time.perf_counter()
        loss, params, opt_state = run_steps(params, opt_state, dxs)
        float(loss)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        loss, params, opt_state = run_steps(params, opt_state, dxs)
        float(loss)
        dt = time.perf_counter() - t0
        results[kind] = {
            "step_ms": round(dt / K * 1e3, 2),
            "compile_s": round(compile_s, 1),
            "examples_per_s": round(batch * K / dt, 1),
            "loss": round(float(loss), 4),
        }
        del params, opt_state
    results["config"] = {
        "vocab": vocab, "emb": emb, "batch": batch, "steps": K,
        "mesh": f"{n_data}x{n_model}",
        "platform": jax.devices()[0].platform,
        "note": ("CPU mesh: measures program structure, not ICI — see "
                 "make_lookup's traffic model for the bandwidth argument"),
    }
    return results


if __name__ == "__main__":
    # this jax build ignores the JAX_PLATFORMS env var (tests/conftest.py);
    # the A/B needs a multi-device mesh → virtual CPU devices by default
    import jax

    jax.config.update(
        "jax_platforms", os.environ.get("OOVREC_AB_PLATFORM", "cpu")
    )
    args = dict(a.lstrip("-").split("=", 1) for a in sys.argv[1:] if "=" in a)
    out = run_ab(
        vocab=int(args.get("vocab", 1 << 20)),
        steps=int(args.get("steps", 8)),
        n_data=int(args.get("data", 4)),
        n_model=int(args.get("model", 2)),
        batch=int(args.get("batch", 4096)),
    )
    print(json.dumps(out, indent=1))
