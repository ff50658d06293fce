"""Independent-training parity matrix (VERDICT missing #4).

Trains the REFERENCE (torch CPU, via tools/run_reference_parity.py) and
OUR framework (TPU, via oovrec_tpu.cli.run) on the same `synth-ind`
corpus under the paper protocol, for {zero, lsh} × seeds, and writes one
JSON per run into --outdir. `--report` folds the JSONs into a side-by-side
markdown table (mean ± spread across seeds per slice metric).

The old_new/new_old slices are NOT directly comparable across frameworks
(the reference's mask-direction bug is intentionally fixed on our side —
see oovrec_tpu/eval/inductive.py:19-27); the report marks them.

Usage:
  python tools/run_parity_matrix.py --outdir=/tmp/parity            # run all
  python tools/run_parity_matrix.py --outdir=/tmp/parity --report   # table
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

SEEDS = (2020, 2021, 2022)

# embedder flag sets (shared across model rows)
_EMB = {
    "zero": {
        "ours": ["--inductive_embedder=zero"],
        "ref": ["--embedder=zero", "--mapper="],
    },
    "lsh": {
        "ours": [
            "--inductive_embedder=lsh", "--add_oov_buckets=True",
            "--n_user_oov_buckets=200", "--n_item_oov_buckets=200",
            "--train_oov=True", "--oov_train_ratio=0.3",
        ],
        "ref": [
            "--embedder=lsh", "--mapper=", "--add_oov_buckets",
            "--train_oov", "--oov_train_ratio=0.3", "--n_buckets=200",
        ],
    },
    "slsh": {
        "ours": [
            "--inductive_embedder=slsh", "--add_oov_buckets=True",
            "--n_user_oov_buckets=200", "--n_item_oov_buckets=200",
            "--train_oov=True", "--oov_train_ratio=0.3",
        ],
        "ref": [
            "--embedder=slsh", "--mapper=", "--add_oov_buckets",
            "--train_oov", "--oov_train_ratio=0.3", "--n_buckets=200",
        ],
    },
    "dhe": {
        # 32 SipHash digests keep the CPU-side reference tractable
        # (round-2 ranking-track convention)
        "ours": [
            "--inductive_embedder=dhe", "--train_oov=True",
            "--oov_train_ratio=0.3", "--dhe_num_hashes=32",
        ],
        "ref": [
            "--embedder=dhe", "--mapper=", "--train_oov",
            "--oov_train_ratio=0.3", "--dhe_num_hashes=32",
        ],
    },
    "fdhe": {
        "ours": [
            "--inductive_embedder=fdhe", "--train_oov=True",
            "--oov_train_ratio=0.3", "--dhe_num_hashes=32",
        ],
        "ref": [
            "--embedder=fdhe", "--mapper=", "--train_oov",
            "--oov_train_ratio=0.3", "--dhe_num_hashes=32",
        ],
    },
    "dnn": {
        "ours": [
            "--inductive_embedder=dnn", "--train_oov=True",
            "--oov_train_ratio=0.3",
        ],
        "ref": [
            "--embedder=dnn", "--mapper=", "--train_oov",
            "--oov_train_ratio=0.3",
        ],
    },
    # knn / mean: non-trainable embedders — no OOV sub-epochs. The
    # reference's scann dependency is absent in this image; the parity
    # runner stands in an EXACT dot-product searcher (ours is exact by
    # design), so the knn row compares equal exact-neighbor semantics.
    "knn": {
        "ours": ["--inductive_embedder=knn"],
        "ref": ["--embedder=knn", "--mapper="],
    },
    "mean": {
        "ours": ["--inductive_embedder=mean"],
        "ref": ["--embedder=mean", "--mapper="],
    },
}

# matrix rows: (cell name, model, track). Round-4 VERDICT #4: >=4 model
# rows x >=4 embedder configs. Retrieval rows run 15 epochs, ranking 8
# (the round-1 protocol conventions). Cell names zero/lsh are the
# round-2 BPR artifacts (kept for file-level reuse).
CELLS = [
    ("zero", "BPR", "retrieval", "zero"),
    ("lsh", "BPR", "retrieval", "lsh"),
    ("bpr_slsh", "BPR", "retrieval", "slsh"),
    ("bpr_dhe", "BPR", "retrieval", "dhe"),
    ("directau_zero", "DirectAU", "retrieval", "zero"),
    ("directau_lsh", "DirectAU", "retrieval", "lsh"),
    ("dcnv2_zero", "DCNV2", "ranking", "zero"),
    ("dcnv2_lsh", "DCNV2", "ranking", "lsh"),
    ("widedeep_slsh", "WideDeep", "ranking", "slsh"),
    ("widedeep_dhe", "WideDeep", "ranking", "dhe"),
    # round-5 blind-spot cells (VERDICT r4 #6): the xDeepFM paper model
    # had no independent-training row, and fdhe/knn/dnn/mean embedders
    # had only weight-copy identity
    ("xdeepfm_zero", "xDeepFM", "ranking", "zero"),
    ("xdeepfm_lsh", "xDeepFM", "ranking", "lsh"),
    ("bpr_fdhe", "BPR", "retrieval", "fdhe"),
    ("bpr_dnn", "BPR", "retrieval", "dnn"),
    ("bpr_knn", "BPR", "retrieval", "knn"),
    ("bpr_mean", "BPR", "retrieval", "mean"),
]

LOAD_COL = (
    "--load_col={'inter': ['user_id','item_id','timestamp','is_new'], "
    "'user': ['user_id','age','group','user_vector'], "
    "'item': ['item_id','price','category','item_vector']}"
)


def _ours_base(model: str, track: str):
    cmd = [
        sys.executable, "-m", "oovrec_tpu.cli.run",
        f"--model={model}", "--dataset=synth-ind",
        LOAD_COL, "--inductive_eval=True",
        # our side runs CPU: parity jobs must not contend for (or die
        # with) the TPU tunnel, and the ranking-track convention is
        # CPU-vs-CPU (PARITY.md)
        "--jax_platforms=cpu",
    ]
    if track == "ranking":
        cmd += ["--model_eval_type=ranking", "--epochs=8"]
    else:
        cmd += ["--epochs=15"]
    return cmd


def _ref_base(model: str, track: str):
    cmd = [
        sys.executable, "tools/run_reference_parity.py",
        f"--model={model}", "--dataset=synth-ind",
    ]
    if track == "ranking":
        cmd += ["--model_eval_type=ranking", "--epochs=8"]
    else:
        cmd += ["--epochs=15"]
    return cmd


def run_all(outdir: str, only=None, seeds=SEEDS):
    os.makedirs(outdir, exist_ok=True)
    for name, model, track, emb in CELLS:
        if only and name not in only:
            continue
        for seed in seeds:
            for side, base, extra in (
                ("ref", _ref_base(model, track), _EMB[emb]["ref"]),
                ("ours", _ours_base(model, track), _EMB[emb]["ours"]),
            ):
                out = os.path.join(outdir, f"{side}_{name}_{seed}.json")
                if os.path.isfile(out):
                    print(f"skip {out} (exists)")
                    continue
                log = out.replace(".json", ".log")
                cmd = list(base) + list(extra) + [f"--seed={seed}"]
                cmd += (
                    [f"--out={out}"] if side == "ref"
                    else [f"--results_json={out}"]
                )
                print("RUN", name, seed, side, flush=True)
                try:
                    with open(log, "w") as lf:
                        rc = subprocess.run(
                            cmd, stdout=lf, stderr=subprocess.STDOUT,
                            timeout=7200,
                        ).returncode
                except subprocess.TimeoutExpired:
                    rc = -9
                if rc != 0 or not os.path.isfile(out):
                    print(f"FAILED ({rc}): see {log}", flush=True)


SLICES = ("overall", "old_users", "new_users", "old_old", "old_new",
          "new_old", "new_new")
NONCOMPARABLE = {"old_new", "new_old"}


def report(outdir: str, metric: str = None):
    lines = [
        "| config | slice | reference | ours | Δ |",
        "|---|---|---|---|---|",
    ]
    for name, model, track, emb in CELLS:
        m = metric or ("recall@20" if track == "retrieval" else "rmse")
        vals = {"ref": {}, "ours": {}}
        for side in vals:
            for seed in SEEDS:
                p = os.path.join(outdir, f"{side}_{name}_{seed}.json")
                if not os.path.isfile(p):
                    continue
                with open(p) as f:
                    d = json.load(f)
                for s in SLICES:
                    v = d.get("inductive", {}).get(s, {}).get(m)
                    if v is not None:
                        vals[side].setdefault(s, []).append(v)
        for s in SLICES:
            r, o = vals["ref"].get(s, []), vals["ours"].get(s, [])
            if not r and not o:
                continue

            def fmt(xs):
                if not xs:
                    return "—"
                mu = statistics.mean(xs)
                sd = statistics.stdev(xs) if len(xs) > 1 else 0.0
                return f"{mu:.3f} ± {sd:.3f} (n={len(xs)})"

            delta = (
                f"{statistics.mean(o) - statistics.mean(r):+.3f}"
                if r and o else "—"
            )
            mark = " *" if s in NONCOMPARABLE else ""
            lines.append(
                f"| {name} ({m}) | {s}{mark} | {fmt(r)} | {fmt(o)} "
                f"| {delta} |"
            )
    lines.append("")
    lines.append("`*` old_new/new_old use intentionally fixed slice "
                 "semantics on our side (eval/inductive.py:19-27) — "
                 "not comparable with reference numbers.")
    print("\n".join(lines))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--outdir", default="/tmp/parity")
    ap.add_argument("--report", action="store_true")
    ap.add_argument("--metric", default=None)
    ap.add_argument("--only", default=None,
                    help="comma-separated cell names")
    ap.add_argument("--seeds", default=None,
                    help="comma-separated seed list (default 3)")
    ns = ap.parse_args()
    if ns.report:
        report(ns.outdir, ns.metric)
    else:
        run_all(
            ns.outdir,
            only=set(ns.only.split(",")) if ns.only else None,
            seeds=(tuple(int(s) for s in ns.seeds.split(","))
                   if ns.seeds else SEEDS),
        )


if __name__ == "__main__":
    main()
