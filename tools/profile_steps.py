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
    """Aggregate device-lane event durations from the newest perfetto
    trace under `trace_dir` → {op_name: total_us}, total_us."""
    paths = sorted(
        glob.glob(os.path.join(trace_dir, "**", "trace.json.gz"),
                  recursive=True),
        key=os.path.getmtime,
    )
    if not paths:
        raise FileNotFoundError(f"no trace.json.gz under {trace_dir}")
    with gzip.open(paths[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # device lanes: pid whose process_name mentions TPU/device XLA Ops
    dev_pids = set()
    tid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            n = e.get("args", {}).get("name", "")
            if "TPU" in n or "/device:" in n or "Device" in n:
                dev_pids.add(e["pid"])
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e["tid"])] = e.get(
                "args", {}).get("name", "")
    per_op = {}
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        lane = tid_names.get((e["pid"], e["tid"]), "")
        # "XLA Ops" lanes carry per-HLO spans; skip step/module summary rows
        if "XLA Ops" not in lane:
            continue
        dur = float(e.get("dur", 0.0))
        name = e.get("name", "?")
        per_op[name] = per_op.get(name, 0.0) + dur
        total += dur
    return per_op, total


_CATEGORY_RULES = (
    ("fusion", "fusion"),
    ("convolution", "conv/matmul"),
    ("dot", "conv/matmul"),
    ("scatter", "scatter"),
    ("gather", "gather"),
    ("dynamic-update-slice", "dus"),
    ("dynamic-slice", "ds"),
    ("all-reduce", "collective"),
    ("copy", "copy/transpose"),
    ("transpose", "copy/transpose"),
    ("reduce", "reduce"),
    ("custom-call", "custom-call"),
)


def _category(op: str) -> str:
    low = op.lower()
    for key, cat in _CATEGORY_RULES:
        if key in low:
            return cat
    return "other"


def summarize(trace_dir: str, top: int = 20):
    per_op, total = _parse_trace(trace_dir)
    ops = sorted(per_op.items(), key=lambda kv: -kv[1])
    cats = {}
    for op, us in per_op.items():
        c = _category(op)
        cats[c] = cats.get(c, 0.0) + us
    return {
        "total_device_us": round(total, 1),
        "by_category": {
            k: {"us": round(v, 1), "pct": round(100 * v / max(total, 1e-9), 1)}
            for k, v in sorted(cats.items(), key=lambda kv: -kv[1])
        },
        "top_ops": [
            {"op": op, "us": round(us, 1),
             "pct": round(100 * us / max(total, 1e-9), 1)}
            for op, us in ops[:top]
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
    if workload in ("xdeepfm", "both"):
        results.append(profile_ctr(
            out, args.get("--compute_dtype", "bfloat16")))
    for r in results:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
