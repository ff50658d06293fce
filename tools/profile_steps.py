"""Per-op time attribution for the flagship bench steps (VERDICT r3 #1).

Captures a jax.profiler device trace of the scanned BPR train step and the
xDeepFM step at the BENCH shapes, parses the perfetto trace.json.gz, and
prints the top time sinks aggregated by HLO op category — the evidence
that names WHERE the 3.54 ms (BPR) / 8.5 ms (xDeepFM bf16) go.

Usage:
    python tools/profile_steps.py [--workload=bpr|xdeepfm|both]
        [--compute_dtype=float32|bfloat16] [--out=/tmp/oovrec_trace]

Output: a JSON line per workload with `total_device_us`, `top_ops`
(name, self_us, pct), and the trace directory for manual inspection.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _parse_trace(trace_dir: str):
    """Aggregate per-HLO device spans from the newest trace under
    `trace_dir`. Only events carrying an `hlo_category` arg are real HLO
    executions; the `while` wrapper span (which CONTAINS the scan body's
    ops) is excluded to avoid double counting. Returns
    (per_op, per_source, per_category, total_us)."""
    paths = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*trace.json.gz"),
                  recursive=True),
        key=os.path.getmtime,
    )
    if not paths:
        raise FileNotFoundError(f"no trace.json.gz under {trace_dir}")
    with gzip.open(paths[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    per_op = {}
    per_source = {}
    per_cat = {}
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        args = e.get("args") or {}
        cat = args.get("hlo_category")
        # the `while` wrapper span CONTAINS the scan body's ops — its
        # hlo_category is 'while' (the name alone can be e.g. 'while.1')
        if cat is None or cat == "while" or e.get("name") == "while":
            continue
        dur = float(e.get("dur", 0.0))
        name = e.get("name", "?")
        rec = per_op.setdefault(
            name, {"us": 0.0, "count": 0, "category": cat,
                   "source": args.get("source", ""),
                   "flops": float(args.get("model_flops", 0) or 0),
                   "bytes": float(args.get("bytes_accessed", 0) or 0),
                   "long_name": (args.get("long_name") or "")[:160]},
        )
        rec["us"] += dur
        rec["count"] += 1
        src = args.get("source", "?")
        per_source[src] = per_source.get(src, 0.0) + dur
        per_cat[cat] = per_cat.get(cat, 0.0) + dur
        total += dur
    return per_op, per_source, per_cat, total


def summarize(trace_dir: str, top: int = 15):
    per_op, per_source, per_cat, total = _parse_trace(trace_dir)
    ops = sorted(per_op.items(), key=lambda kv: -kv[1]["us"])
    return {
        "total_device_us": round(total, 1),
        "by_category": {
            k: {"us": round(v, 1), "pct": round(100 * v / max(total, 1e-9), 1)}
            for k, v in sorted(per_cat.items(), key=lambda kv: -kv[1])
        },
        "by_source": {
            k: {"us": round(v, 1), "pct": round(100 * v / max(total, 1e-9), 1)}
            for k, v in sorted(per_source.items(), key=lambda kv: -kv[1])[:top]
        },
        "top_ops": [
            {"op": op, "us": round(r["us"], 1),
             "pct": round(100 * r["us"] / max(total, 1e-9), 1),
             "count": r["count"], "category": r["category"],
             "source": r["source"], "long_name": r["long_name"]}
            for op, r in ops[:top]
        ],
    }


def profile_bpr(out_dir: str):
    import jax
    import bench

    trace_dir = os.path.join(out_dir, "bpr")
    os.makedirs(trace_dir, exist_ok=True)
    # warm (compile) outside the trace window by running once via measure;
    # then trace a second full dispatch
    bench.measure(steps=10)
    with jax.profiler.trace(trace_dir):
        bench.measure(steps=10)
    res = summarize(trace_dir)
    res["workload"] = "bpr"
    res["trace_dir"] = trace_dir
    return res


def profile_sparse(out_dir: str):
    import jax
    import bench

    trace_dir = os.path.join(out_dir, "bpr-sparse")
    os.makedirs(trace_dir, exist_ok=True)
    bench.measure_sparse(steps=10)
    with jax.profiler.trace(trace_dir):
        bench.measure_sparse(steps=10)
    res = summarize(trace_dir)
    res["workload"] = "bpr-sparse"
    res["trace_dir"] = trace_dir
    return res


def profile_ctr(out_dir: str, compute_dtype: str = "bfloat16"):
    import jax
    import bench

    trace_dir = os.path.join(out_dir, f"xdeepfm-{compute_dtype}")
    os.makedirs(trace_dir, exist_ok=True)
    bench.measure_ctr(steps=10, compute_dtype=compute_dtype)
    with jax.profiler.trace(trace_dir):
        bench.measure_ctr(steps=10, compute_dtype=compute_dtype)
    res = summarize(trace_dir)
    res["workload"] = f"xdeepfm-{compute_dtype}"
    res["trace_dir"] = trace_dir
    return res


def main():
    args = dict(
        a.split("=", 1) for a in sys.argv[1:] if a.startswith("--") and "=" in a
    )
    workload = args.get("--workload", "both")
    out = args.get("--out", "/tmp/oovrec_trace")
    results = []
    if workload in ("bpr", "both"):
        results.append(profile_bpr(out))
    if workload == "sparse":
        results.append(profile_sparse(out))
    if workload in ("xdeepfm", "both"):
        results.append(profile_ctr(
            out, args.get("--compute_dtype", "bfloat16")))
    for r in results:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
