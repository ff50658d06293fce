"""Diagnose the lsh training-quality gap (VERDICT round-2 weak #5).

Round-2 parity: both frameworks train BPR+lsh on synth-ind under the
identical protocol, yet the reference reaches overall inductive
recall@20 ≈ 0.20 while ours reaches ≈ 0.57 (PARITY.md). Cross-evaluation
ruled out the eval machinery; the difference is in TRAINING. This script
instruments both sides for one seed and dumps comparable artifacts:

  * per-epoch OOV-epoch loss (sum over kept batches),
  * final user/item OOV bucket tables + IV tables + LSH planes (npz),
  * per-row bucket-table statistics (norms, variance — is one side's
    table undertrained or collapsed?),
  * the distribution of LSH multihot popcounts during eval (are the
    buckets even being differentiated?).

Usage (from /root/repo):
  python tools/diag_lsh_gap.py --side=ref  --seed=2022 --out=/tmp/diag_ref.npz
  python tools/diag_lsh_gap.py --side=ours --seed=2022 --out=/tmp/diag_ours.npz
  python tools/diag_lsh_gap.py --compare /tmp/diag_ref.npz /tmp/diag_ours.npz
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))


def run_reference(seed: int, out: str, epochs: int = 15,
                  glide: bool = False):
    from run_reference_parity import install_shims, link_ind_files, paper_args

    install_shims()
    link_ind_files("synth-ind")
    import types

    ns = types.SimpleNamespace(
        model="BPR", dataset="synth-ind", seed=seed, epochs=epochs,
        embedding_size=64, train_batch_size=2048, mapper="",
        embedder="lsh", add_oov_buckets=True, train_oov=True,
        oov_train_ratio=0.3, n_buckets=200, stopping_step=10,
        model_eval_type="retrieval",
    )
    args = paper_args(ns)

    if glide:
        # A/B toggle: force zero_grad(set_to_none=False) so torch adam
        # keeps STEPPING params whose grads are zero after their first
        # touch — reproducing optax's every-leaf-every-step momentum
        # glide inside the reference
        import torch as _torch

        _orig_zg = _torch.optim.Optimizer.zero_grad

        def _zg(self, set_to_none=True):
            return _orig_zg(self, set_to_none=False)

        _torch.optim.Optimizer.zero_grad = _zg

    # instrument: record each OOV epoch's summed loss
    import torch
    from recbole.trainer.trainer import InductiveTrainer

    oov_losses = []
    orig = InductiveTrainer._train_oov

    def wrapped(self, *a, **k):
        loss = orig(self, *a, **k)
        oov_losses.append(float(loss) if loss is not None else np.nan)
        return loss

    InductiveTrainer._train_oov = wrapped

    from run_recbole import run_recbole

    sys.modules["run_recbole"].get_flops = lambda *a, **k: 0
    results, config = run_recbole(
        model="BPR", dataset="synth-ind", config_dict=args
    )

    from perform_hashing import perform_inductive_eval

    ind = perform_inductive_eval(
        orig_dataset=results["dataset"],
        checkpoint_path=results["checkpoint_path"],
        mapper_path=results["mapper_path"],
        embedder_path=results["embedder_path"],
        oov_eval_batch_size=config["oov_eval_batch_size"],
    )
    ind = {s: {k: float(v) for k, v in r.items()} for s, r in ind.items()}

    state = torch.load(results["checkpoint_path"],
                       map_location="cpu", weights_only=False)
    sd = state["state_dict"]
    emb_state = torch.load(
        results["embedder_path"], map_location="cpu", weights_only=False
    )
    # embedder pickle layout: dict or the embedder itself — extract planes
    planes = {}
    if hasattr(emb_state, "user_lsh"):
        planes["user_planes"] = (
            emb_state.user_lsh.uniform_planes[0].detach().numpy()
        )
        planes["item_planes"] = (
            emb_state.item_lsh.uniform_planes[0].detach().numpy()
        )
    elif isinstance(emb_state, dict):
        for k, v in emb_state.items():
            if "plane" in k:
                planes[k] = np.asarray(v)
    np.savez(
        out,
        framework="reference",
        seed=seed,
        oov_losses=np.asarray(oov_losses, np.float64),
        user_buckets=sd["user_oov_buckets.weight"].numpy(),
        item_buckets=sd["item_oov_buckets.weight"].numpy(),
        user_table=sd["user_embedding.weight"].numpy(),
        item_table=sd["item_embedding.weight"].numpy(),
        test_result=json.dumps(
            {k: float(v) for k, v in results["test_result"].items()}
        ),
        inductive=json.dumps(ind),
        glide=glide,
        **planes,
    )
    print("saved", out)


def run_ours(seed: int, out: str, epochs: int = 15,
             skip_zero_grads: bool = False):
    import jax

    jax.config.update("jax_platforms", "cpu")
    from oovrec_tpu.cli.inductive_eval import perform_inductive_eval
    from oovrec_tpu.cli.run import apply_paper_protocol, merge_dataset_config
    from oovrec_tpu.cli.quick_start import run
    from oovrec_tpu.config.configurator import parse_cli_args

    args = parse_cli_args([
        "--model=BPR", "--dataset=synth-ind", f"--epochs={epochs}",
        "--load_col={'inter': ['user_id','item_id','timestamp','is_new'], "
        "'user': ['user_id','age','group','user_vector'], "
        "'item': ['item_id','price','category','item_vector']}",
        "--inductive_embedder=lsh", "--add_oov_buckets=True",
        "--n_user_oov_buckets=200", "--n_item_oov_buckets=200",
        "--train_oov=True", "--oov_train_ratio=0.3", f"--seed={seed}",
        f"--optimizer_skip_zero_grads={skip_zero_grads}",
        # per-variant checkpoint dir: concurrent A/B cells must not race
        # on the shared saved/<ds>/<model>.ckpt (evaluate reloads it)
        f"--checkpoint_dir={out}.ckpt_dir",
    ])
    args = apply_paper_protocol(args)
    args = merge_dataset_config(args)
    res = run(
        model=args["model"], dataset=args["dataset"], config_dict=args,
        saved=True,
    )
    trainer = res["trainer"]
    ind = perform_inductive_eval(
        res["dataset"], trainer.saved_model_file, config=res["config"]
    )
    ind = {s: {k: float(v) for k, v in r.items()} for s, r in ind.items()}
    p = trainer.variables["params"]
    oov_losses = [
        v for k, v in sorted(trainer.oov_loss_dict.items())
    ] if hasattr(trainer, "oov_loss_dict") else []
    np.savez(
        out,
        framework="ours",
        seed=seed,
        oov_losses=np.asarray(oov_losses, np.float64),
        user_buckets=np.asarray(p["user_oov_buckets"]["embedding"]),
        item_buckets=np.asarray(p["item_oov_buckets"]["embedding"]),
        user_table=np.asarray(p["user_embedding"]["embedding"]),
        item_table=np.asarray(p["item_embedding"]["embedding"]),
        user_planes=np.asarray(trainer.estate["user_planes"]),
        item_planes=np.asarray(trainer.estate["item_planes"]),
        test_result=json.dumps(
            {k: float(v) for k, v in res["test_result"].items()}
        ),
        inductive=json.dumps(ind),
        skip_zero_grads=skip_zero_grads,
    )
    print("saved", out)


def compare(ref_path: str, ours_path: str):
    r = np.load(ref_path, allow_pickle=True)
    o = np.load(ours_path, allow_pickle=True)

    def stats(name, m):
        norms = np.linalg.norm(m, axis=1)
        print(
            f"  {name:14s} shape={m.shape} |row| mean={norms.mean():.4f} "
            f"sd={norms.std():.4f} min={norms.min():.4f} "
            f"max={norms.max():.4f}  row-var={m.var(axis=0).mean():.6f}"
        )

    for side, d in (("REFERENCE", r), ("OURS", o)):
        print(f"== {side} (seed {d['seed']})")
        print("  test:", json.loads(str(d["test_result"])))
        if "inductive" in d:
            ind = json.loads(str(d["inductive"]))
            for s in ("overall", "old_users", "new_users"):
                if ind.get(s):
                    print(f"  ind[{s}] recall@20 =", ind[s].get("recall@20"))
        ol = d["oov_losses"]
        print(f"  oov losses ({len(ol)}):",
              np.array2string(ol, precision=3, max_line_width=100))
        for k in ("user_buckets", "item_buckets", "user_table",
                  "item_table"):
            stats(k, d[k])
        for k in ("user_planes", "item_planes"):
            if k in d:
                stats(k, d[k])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--side", choices=["ref", "ours"])
    ap.add_argument("--seed", type=int, default=2022)
    ap.add_argument("--epochs", type=int, default=15)
    ap.add_argument("--out")
    ap.add_argument("--compare", nargs=2)
    # A/B toggles for the momentum-glide mechanism (one per side)
    ap.add_argument("--glide", action="store_true",
                    help="ref side: zero_grad(set_to_none=False) → torch "
                         "adam glides like optax")
    ap.add_argument("--skip_zero_grads", action="store_true",
                    help="our side: torch None-grad skipping → no glide")
    ns = ap.parse_args()
    if ns.compare:
        compare(*ns.compare)
    elif ns.side == "ref":
        run_reference(ns.seed, ns.out, ns.epochs, glide=ns.glide)
    else:
        run_ours(ns.seed, ns.out, ns.epochs,
                 skip_zero_grads=ns.skip_zero_grads)


if __name__ == "__main__":
    main()
