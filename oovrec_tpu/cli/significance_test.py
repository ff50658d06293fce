"""Significance testing across seeds (`RecBole/significance_test.py` analog):
run a model N times with different seeds and compare two runs' metric
samples with a paired t-test (scipy)."""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import numpy as np


def run_seeds(
    config_dict: Dict[str, Any],
    seeds: List[int],
    metric: Optional[str] = None,
) -> List[float]:
    from oovrec_tpu.cli.quick_start import objective_function

    values = []
    for seed in seeds:
        cfg = dict(config_dict, seed=seed)
        res = objective_function(config_dict=cfg, saved=False)
        tr = res["test_result"]
        key = (metric or next(iter(tr))).lower()
        values.append(float(tr[key]))
    return values


def significance_test(
    config_a: Dict[str, Any],
    config_b: Dict[str, Any],
    seeds: Optional[List[int]] = None,
    metric: Optional[str] = None,
) -> Dict[str, Any]:
    from scipy import stats

    seeds = seeds or [2020, 2021, 2022, 2023, 2024]
    a = run_seeds(config_a, seeds, metric)
    b = run_seeds(config_b, seeds, metric)
    t, p = stats.ttest_rel(a, b)
    return {
        "a_values": a,
        "b_values": b,
        "a_mean": float(np.mean(a)),
        "b_mean": float(np.mean(b)),
        "t_statistic": float(t),
        "p_value": float(p),
    }
