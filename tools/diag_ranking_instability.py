"""Diagnose the ranking-track OOV seed instability (VERDICT r4 #1).

widedeep_dhe (and round-5's xdeepfm_lsh) degrade on 2 of 3 seeds — the
degraded runs sit at zero-embedder level on the new-entity slices, i.e.
the OOV tower learned nothing. This probe loads a finished run's
checkpoint and measures, for the trained dhe tower:

  * the saturation of the tower output (fraction of sigmoid outputs
    within eps of {0, 1}) over the inductive corpus's NEW entities,
  * the spread (std) of tower outputs ACROSS entities — a collapsed
    tower maps every entity to the same vector (no ranking signal),
  * the model's score spread over new-user eval rows.

Usage:
  python tools/diag_ranking_instability.py --ckpt=saved/synth-ind/WideDeep-....pkl
"""

from __future__ import annotations

import json
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    args = dict(
        a.split("=", 1) for a in sys.argv[1:] if a.startswith("--") and "=" in a
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    from oovrec_tpu.cli.quick_start import load_data_and_model

    out = load_data_and_model(args["--ckpt"])
    config, model, variables, estate = (
        out["config"], out["model"], out["variables"], out["estate"]
    )
    ds = out["dataset"]
    params = variables["params"]

    report = {"ckpt": args["--ckpt"], "seed": config.get("seed")}
    # tower weights norms (layer health)
    for side in ("user", "item"):
        key = f"{side}_oov_mlp"
        if key in params:
            norms = {
                k: float(np.linalg.norm(np.asarray(v["kernel"])))
                for k, v in params[key].items() if "kernel" in v
            }
            report[key + "_kernel_norms"] = norms

    # tower outputs over a range of (prime-padded) new-entity ids
    from oovrec_tpu.inductive.dhe import DHEHasher

    spec = getattr(model, "spec", None)
    if spec is not None and spec.embedder in ("dhe", "fdhe"):
        hasher = DHEHasher(num_hashes=spec.dhe_num_hashes)
        ids = np.arange(ds.item_num, ds.item_num + 256, dtype=np.int64)
        hcols = hasher.hash_ids(ids + spec.prime_pad)
        report["hash_col_mean"] = float(hcols.mean())
        report["hash_col_std"] = float(hcols.std())

        def tower(side):
            import jax.numpy as jnp

            b = {
                "item_id" if side == "item" else "user_id":
                    ids.astype(np.int32),
            }
            field = "item_id" if side == "item" else "user_id"
            b[field + "_oov"] = np.ones(256, np.int32)
            b[field + "_bucket"] = np.zeros(256, np.int32)
            hasher.annotate_batch(
                b, field, spec.prime_pad, padded_when_flagged=True
            )
            fn = (model.all_item_embeddings if side == "item" else None)
            if side == "item":
                e = model.apply(
                    {"params": params},
                    jnp.asarray(b[field]),
                    item_dhe=jnp.asarray(b[field + "_dhe"]),
                    estate=estate, method=model.all_item_embeddings,
                )
                return np.asarray(e)
            return None

        try:
            e = tower("item")
            if e is not None:
                eps = 1e-4
                report["item_tower_saturation"] = float(
                    ((e < eps) | (e > 1 - eps)).mean()
                )
                report["item_tower_across_entity_std"] = float(
                    e.std(axis=0).mean()
                )
                report["item_tower_mean"] = float(e.mean())
        except Exception as ex:  # noqa: BLE001
            report["tower_probe_error"] = repr(ex)[:200]

    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
