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

CONFIGS = {
    # EXPERIMENTS.md round-1 configs: zero baseline (no OOV training) and
    # the paper's lsh + buckets + OOV-epoch regime
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
}

OURS_BASE = [
    sys.executable, "-m", "oovrec_tpu.cli.run",
    "--model=BPR", "--dataset=synth-ind", "--epochs=15",
    "--load_col={'inter': ['user_id','item_id','timestamp','is_new'], "
    "'user': ['user_id','age','group','user_vector'], "
    "'item': ['item_id','price','category','item_vector']}",
    "--inductive_eval=True",
]

REF_BASE = [
    sys.executable, "tools/run_reference_parity.py",
    "--model=BPR", "--dataset=synth-ind", "--epochs=15",
]


def run_all(outdir: str):
    os.makedirs(outdir, exist_ok=True)
    for name, cfg in CONFIGS.items():
        for seed in SEEDS:
            for side, base, extra in (
                ("ref", REF_BASE, cfg["ref"]),
                ("ours", OURS_BASE, cfg["ours"]),
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
                print("RUN", " ".join(cmd[2:6]), name, seed, side,
                      flush=True)
                with open(log, "w") as lf:
                    rc = subprocess.run(
                        cmd, stdout=lf, stderr=subprocess.STDOUT,
                        timeout=2400,
                    ).returncode
                if rc != 0 or not os.path.isfile(out):
                    print(f"FAILED ({rc}): see {log}", flush=True)


SLICES = ("overall", "old_users", "new_users", "old_old", "old_new",
          "new_old", "new_new")
NONCOMPARABLE = {"old_new", "new_old"}


def report(outdir: str, metric: str = "recall@20"):
    lines = [
        f"| config | slice | reference ({metric}) | ours ({metric}) | Δ |",
        "|---|---|---|---|---|",
    ]
    for name in CONFIGS:
        vals = {"ref": {}, "ours": {}}
        for side in vals:
            for seed in SEEDS:
                p = os.path.join(outdir, f"{side}_{name}_{seed}.json")
                if not os.path.isfile(p):
                    continue
                with open(p) as f:
                    d = json.load(f)
                for s in SLICES:
                    v = d.get("inductive", {}).get(s, {}).get(metric)
                    if v is not None:
                        vals[side].setdefault(s, []).append(v)
        for s in SLICES:
            r, o = vals["ref"].get(s, []), vals["ours"].get(s, [])
            if not r and not o:
                continue

            def fmt(xs):
                if not xs:
                    return "—"
                m = statistics.mean(xs)
                sd = statistics.stdev(xs) if len(xs) > 1 else 0.0
                return f"{m:.3f} ± {sd:.3f} (n={len(xs)})"

            delta = (
                f"{statistics.mean(o) - statistics.mean(r):+.3f}"
                if r and o else "—"
            )
            mark = " *" if s in NONCOMPARABLE else ""
            lines.append(
                f"| {name} | {s}{mark} | {fmt(r)} | {fmt(o)} | {delta} |"
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
    ap.add_argument("--metric", default="recall@20")
    ns = ap.parse_args()
    if ns.report:
        report(ns.outdir, ns.metric)
    else:
        run_all(ns.outdir)


if __name__ == "__main__":
    main()
