"""Production-shape inductive-eval step timing (VERDICT #5).

Times one batch of the 7-slice inductive evaluator at retrieval-serving
scale — B users against an N≥1M-item corpus, all four slice variants —
for the dense vmapped path (`_make_step`) vs the block-candidate Pallas
path (`_make_fused_step`). Run on the TPU:

  python tools/bench_inductive_eval.py --n_items=1000000 --batch=256
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from oovrec_tpu.config import Config
    from oovrec_tpu.config.configurator import parse_cli_args
    from oovrec_tpu.eval.inductive import InductiveEvaluator
    from oovrec_tpu.models import get_model_class

    a = parse_cli_args(sys.argv[1:])
    N = int(a.get("n_items", 1_000_000))
    B = int(a.get("batch", 256))
    D = int(a.get("dim", 64))
    H = int(a.get("hist", 64))
    P = int(a.get("pos", 16))
    n_users = int(a.get("n_users", 100_000))
    n_old_items = int(N * 0.9)

    cfg = Config(config_dict={
        "model": "BPR", "dataset": "toy",
        "data_path": "tests/assets",
        "load_col": {"inter": ["user_id", "item_id", "rating", "timestamp"]},
        "embedding_size": D, "topk": [3, 5, 10, 20],
        "use_perturbed_hits": True,
    })
    model = get_model_class("BPR")(
        n_users=n_users, n_items=n_users, embedding_size=D,
        uid_field="user_id", iid_field="item_id", neg_prefix="neg_",
    )
    rng = np.random.default_rng(0)
    users = rng.integers(1, n_users, B).astype(np.int32)
    batch = {
        "user_id": jnp.asarray(users),
        "user_id_oov": jnp.zeros(B, jnp.int32),
        "user_id_bucket": jnp.zeros(B, jnp.int32),
        "hist_items": jnp.asarray(
            rng.integers(1, N, (B, H)).astype(np.int32)),
        "hist_len": jnp.full((B,), H, jnp.int32),
        "pos_items": jnp.asarray(
            rng.integers(1, N, (B, P)).astype(np.int32)),
        "pos_len": jnp.full((B,), P, jnp.int32),
        "weight": jnp.ones(B, jnp.float32),
    }
    variables = model.init(
        jax.random.PRNGKey(0), batch["user_id"], batch, {},
        method=model.user_e,
    )
    all_item_e = jnp.asarray(
        rng.standard_normal((N, D)).astype(np.float32))

    ev = InductiveEvaluator(model, cfg, n_users, n_old_items, estate={})

    def run(step, make_args, label):
        # inputs VARY per rep: the tunneled backend short-circuits repeat
        # executions with identical buffers (a 0.2 ms/batch artifact)
        args = make_args(0)
        t0 = time.perf_counter()
        out = step(*args)
        jax.block_until_ready(out)
        compile_s = time.perf_counter() - t0
        times = []
        for r in range(1, 4):
            args = make_args(r)
            t0 = time.perf_counter()
            out = step(*args)
            # D2H checksum: block_until_ready alone under-reports on the
            # tunneled backend; a host read provably waits for the result
            _ = sum(int(np.asarray(v[1]).sum()) for v in out.values())
            times.append(time.perf_counter() - t0)
        per_batch = min(times)
        print(f"{label}: {per_batch*1e3:.1f} ms/batch "
              f"({B/per_batch:,.0f} users/s, compile {compile_s:.1f}s)")
        return out

    def vary(r):
        b = dict(batch)
        b["user_id"] = jnp.asarray(
            rng.integers(1, n_users, B).astype(np.int32))
        return b

    dense = ev._make_step()
    o1 = run(
        dense,
        lambda r: (variables, vary(r), all_item_e, {},
                   *ev._variant_perms_masks(N)),
        f"dense 4-variant (B={B}, N={N})",
    )

    fused = ev._make_fused_step(N)
    o2 = run(
        fused,
        lambda r: (variables, vary(r), all_item_e, {},
                   jnp.asarray(rng.permutation(N).astype(np.int32))),
        f"fused Pallas   (B={B}, N={N})",
    )

    # sanity: per-variant positive counts must agree
    for v in ("overall", "full", "old", "new"):
        np.testing.assert_array_equal(
            np.asarray(o1[v][2]), np.asarray(o2[v][2]), err_msg=v
        )
    print("slice positive-count parity ok")


if __name__ == "__main__":
    main()
