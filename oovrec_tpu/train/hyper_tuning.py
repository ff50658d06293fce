"""Hyper-parameter tuning (`recbole/trainer/hyper_tuning.py:96-420` analog).

Supports the reference's .hyper file format — one parameter per line,
`<name> <kind> <spec>` with kinds choice / uniform / loguniform /
quniform — and two algorithms:
  * 'exhaustive': full grid over choice parameters (`hyper_tuning.py:96`)
  * 'random': N samples from the declared distributions

Each trial calls `objective_function(config_dict, config_file_list)` and
trials are compared on `best_valid_score` honoring valid_score_bigger.
"""

from __future__ import annotations

import ast
import itertools
from typing import Any, Callable, Dict, List, Optional

import numpy as np

from oovrec_tpu.utils.seeding import host_rng


class Parameter:
    def __init__(self, name: str, kind: str, spec):
        self.name = name
        self.kind = kind
        self.spec = spec

    @staticmethod
    def parse(line: str) -> "Parameter":
        name, kind, rest = line.strip().split(" ", 2)
        return Parameter(name, kind, ast.literal_eval(rest.strip()))

    def sample(self, rng: np.random.Generator):
        if self.kind == "choice":
            return self.spec[int(rng.integers(0, len(self.spec)))]
        if self.kind == "uniform":
            lo, hi = self.spec
            return float(rng.uniform(lo, hi))
        if self.kind == "loguniform":
            lo, hi = self.spec
            return float(np.exp(rng.uniform(np.log(lo), np.log(hi))))
        if self.kind == "quniform":
            lo, hi, q = self.spec
            return float(np.round(rng.uniform(lo, hi) / q) * q)
        raise ValueError(f"Unknown parameter kind [{self.kind}]")

    def grid(self) -> List[Any]:
        if self.kind != "choice":
            raise ValueError(
                "Exhaustive search only supports 'choice' parameters "
                f"(got {self.kind} for {self.name})"
            )
        return list(self.spec)


class HyperTuning:
    def __init__(
        self,
        objective_function: Callable[..., Dict[str, Any]],
        algo: str = "exhaustive",
        params_file: Optional[str] = None,
        params_dict: Optional[Dict[str, List[Any]]] = None,
        fixed_config_file_list: Optional[List[str]] = None,
        fixed_config_dict: Optional[Dict[str, Any]] = None,
        max_evals: int = 100,
        seed: int = 2020,
    ):
        self.objective_function = objective_function
        self.algo = algo
        self.max_evals = max_evals
        self.fixed_config_file_list = fixed_config_file_list
        self.fixed_config_dict = fixed_config_dict or {}
        self.rng = host_rng(seed, "hyper_tuning")

        self.params: List[Parameter] = []
        if params_file:
            with open(params_file) as f:
                for line in f:
                    if line.strip():
                        self.params.append(Parameter.parse(line))
        if params_dict:
            for k, v in params_dict.items():
                self.params.append(Parameter(k, "choice", list(v)))

        self.best_score = None
        self.best_params: Optional[Dict[str, Any]] = None
        self.best_test_result = None
        self.params_list: List[Dict[str, Any]] = []
        self.score_list: List[float] = []

    def _trials(self):
        if self.algo == "exhaustive":
            grids = [p.grid() for p in self.params]
            for combo in itertools.islice(
                itertools.product(*grids), self.max_evals
            ):
                yield dict(zip([p.name for p in self.params], combo))
        elif self.algo == "random":
            for _ in range(self.max_evals):
                yield {p.name: p.sample(self.rng) for p in self.params}
        else:
            raise NotImplementedError(f"algo [{self.algo}] not supported")

    def run(self) -> None:
        for trial in self._trials():
            cfg = {**self.fixed_config_dict, **trial}
            result = self.objective_function(
                config_dict=cfg, config_file_list=self.fixed_config_file_list
            )
            score = result["best_valid_score"]
            bigger = result.get("valid_score_bigger", True)
            self.params_list.append(trial)
            self.score_list.append(score)
            better = (
                self.best_score is None
                or (bigger and score > self.best_score)
                or (not bigger and score < self.best_score)
            )
            if better:
                self.best_score = score
                self.best_params = trial
                self.best_test_result = result.get("test_result")

    def export_result(self, output_file: str) -> None:
        with open(output_file, "w") as f:
            for p, s in zip(self.params_list, self.score_list):
                f.write(f"{p}  valid_score: {s}\n")
            f.write(f"\nbest params: {self.best_params}\n")
            f.write(f"best score: {self.best_score}\n")
