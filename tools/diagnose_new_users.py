"""Diagnose the flat new_users inductive slice (VERDICT weak #5).

Round-1 observation: with the lsh embedder, old_users recall@20 jumps
0 → ~0.75 (item-side OOV embeddings work) while new_users stays ≈ random
(~0.03 on a 1000-item corpus). User and item features are symmetric in
`make_synth_dataset.py`, so a data artifact is not the obvious answer.

Three probes on one trained BPR+lsh checkpoint:

  A. baseline — the normal 7-slice eval.
  B. all-users-routed — rebuild the evaluator with n_old_users=0 so EVERY
     user (old ones included) goes through the lsh embedder. The
     resulting "new_users" slice scores users whose trained-embedding
     quality is known; (B.new_users vs A.overall) isolates the
     user-embedder pathway from the identity of the users.
  C. geometry — cosine between each old user's lsh-routed embedding and
     its trained table row, plus the same for items. If item cosines are
     high and user cosines low, the asymmetry is in the learned
     geometry/buckets, not the eval plumbing.

Run (TPU, ~5 min): python tools/diagnose_new_users.py --seed=2020
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


CFG = {
    "model": "BPR",
    "dataset": "synth-ind",
    "epochs": 15,
    "load_col": {
        "inter": ["user_id", "item_id", "timestamp", "is_new"],
        "user": ["user_id", "age", "group", "user_vector"],
        "item": ["item_id", "price", "category", "item_vector"],
    },
    "inductive_embedder": "lsh",
    "add_oov_buckets": True,
    "n_user_oov_buckets": 200,
    "n_item_oov_buckets": 200,
    "train_oov": True,
    "oov_train_ratio": 0.3,
    "inductive_eval": False,
}


def main():
    from oovrec_tpu.cli.run import apply_paper_protocol
    from oovrec_tpu.cli.quick_start import run
    from oovrec_tpu.cli.inductive_eval import perform_inductive_eval
    from oovrec_tpu.config.configurator import parse_cli_args

    over = parse_cli_args(sys.argv[1:])
    cfg = apply_paper_protocol({**CFG, **over})
    res = run(model=cfg["model"], dataset=cfg["dataset"], config_dict=cfg,
              saved=True)
    ckpt = res["trainer"].saved_model_file

    # Probe A: normal inductive eval
    a = perform_inductive_eval(res["dataset"], ckpt, config=res["config"])

    # Probe B: identical, but every user routes through the embedder
    import oovrec_tpu.cli.inductive_eval as ie
    from oovrec_tpu.eval.inductive import InductiveEvaluator

    orig_cls = ie.InductiveEvaluator

    class AllUsersOOV(InductiveEvaluator):
        def __init__(self, model, config, n_old_users, n_old_items, **kw):
            super().__init__(model, config, 0, n_old_items, **kw)

    ie.InductiveEvaluator = AllUsersOOV
    try:
        b = perform_inductive_eval(res["dataset"], ckpt, config=res["config"])
    finally:
        ie.InductiveEvaluator = orig_cls

    metric = "recall@20"
    out = {
        "A_overall": a["overall"].get(metric),
        "A_old_users": a["old_users"].get(metric),
        "A_new_users": a["new_users"].get(metric),
        "B_all_users_via_embedder": b["new_users"].get(metric),
    }

    # Probe C: embedding geometry on the trained (transductive) model
    import jax.numpy as jnp
    from oovrec_tpu.eval.runner import _device_estate

    model = res["trainer"].model
    variables = res["trainer"].variables
    estate = _device_estate(res["trainer"].estate)
    ds = res["dataset"]

    def routed_vs_table(side, n):
        ids = np.arange(1, n, dtype=np.int64)
        batch = {
            f"{side}_id": jnp.asarray(ids, jnp.int32),
            f"{side}_id_oov": jnp.ones(len(ids), jnp.int32),
            f"{side}_id_bucket": jnp.zeros(len(ids), jnp.int32),
        }
        fn = getattr(model, f"{side}_e")
        routed = np.asarray(
            model.apply(variables, batch[f"{side}_id"], batch, estate,
                        method=fn)
        )
        table = np.asarray(
            variables["params"][f"{side}_embedding"]["embedding"]
        )[1:n]
        num = np.sum(routed * table, axis=1)
        den = (np.linalg.norm(routed, axis=1)
               * np.linalg.norm(table, axis=1) + 1e-9)
        return float(np.mean(num / den))

    out["C_user_cosine_routed_vs_trained"] = routed_vs_table(
        "user", ds.user_num
    )
    out["C_item_cosine_routed_vs_trained"] = routed_vs_table(
        "item", ds.item_num
    )
    print(json.dumps(out, indent=1))
    if over.get("out"):
        with open(over["out"], "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
