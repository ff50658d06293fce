"""Layered configuration system.

Equivalent of `recbole/config/configurator.py:37-635`, re-designed without
torch/device coupling. Merge precedence (lowest → highest), mirroring the
reference's 4-source merge (`configurator.py:321-325`) plus the paper
driver's dataset-JSON layer (`src/run_recbole.py:236-241`):

  1. framework defaults          (config/defaults.yaml)
  2. model defaults              (config/model/<Model>.yaml)
  3. dataset defaults            (config/dataset/<dataset>.yaml or .json)
  4. user config files           (config_file_list)
  5. variable config dict        (config_dict)
  6. command line --key=value    (parsed by cli.parse)

Also derives, like the reference:
  * `MODEL_INPUT_TYPE` from the model class (`configurator.py:340-360`)
  * metric-type consistency (ranking vs value metrics cannot mix,
    `configurator.py:362-376`)
  * normalized per-phase eval mode dict (`configurator.py:440-474`)
  * `single_spec` / process info — here derived from `jax.process_count()`
    instead of torch.distributed (`configurator.py:476-516`).
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, List, Optional

import yaml

from oovrec_tpu.utils.enums import EvaluatorType, InputType

_PKG_DIR = os.path.dirname(os.path.abspath(__file__))

# Metrics whose inputs are ranked top-k lists vs pooled scores.
RANKING_METRICS = {
    "recall", "mrr", "ndcg", "hit", "precision", "map", "gauc",
    "itemcoverage", "averagepopularity", "shannonentropy", "giniindex",
    "tailpercentage",
}
VALUE_METRICS = {"auc", "rmse", "mae", "logloss"}

SMALLER_METRICS = {"rmse", "mae", "logloss", "averagepopularity"}


class Config:
    """Dict-like resolved configuration."""

    def __init__(
        self,
        model: Optional[str] = None,
        dataset: Optional[str] = None,
        config_file_list: Optional[List[str]] = None,
        config_dict: Optional[Dict[str, Any]] = None,
    ):
        self.final_config_dict: Dict[str, Any] = {}
        self._load_yaml(os.path.join(_PKG_DIR, "defaults.yaml"))

        # model / dataset may also arrive via files or dict
        pre = dict(config_dict or {})
        model = model or pre.get("model")
        dataset = dataset or pre.get("dataset")

        if model is not None:
            model_yaml = os.path.join(_PKG_DIR, "model", f"{model}.yaml")
            if os.path.isfile(model_yaml):
                self._load_yaml(model_yaml)
        if dataset is not None:
            for cand in (
                os.path.join(_PKG_DIR, "dataset", f"{dataset}.yaml"),
                os.path.join(_PKG_DIR, "dataset", f"{dataset}.json"),
            ):
                if os.path.isfile(cand):
                    self._load_any(cand)

        for f in config_file_list or []:
            self._load_any(f)

        self._deep_update(self.final_config_dict, pre)

        if model is not None:
            self.final_config_dict["model"] = model
        if dataset is not None:
            self.final_config_dict["dataset"] = dataset

        self._derive()

    # -- loading ----------------------------------------------------------

    def _load_yaml(self, path: str) -> None:
        with open(path) as f:
            d = yaml.safe_load(f) or {}
        self._deep_update(self.final_config_dict, d)

    def _load_any(self, path: str) -> None:
        if path.endswith(".json"):
            with open(path) as f:
                d = json.load(f) or {}
            self._deep_update(self.final_config_dict, d)
        else:
            self._load_yaml(path)

    # keys whose dict value REPLACES the default instead of deep-merging:
    # a user-provided eval split {'LS': ...} must not inherit the default
    # {'RS': [...]} sibling (the strategy key is exclusive)
    _REPLACE_KEYS = frozenset({"split"})

    @staticmethod
    def _deep_update(base: Dict[str, Any], upd: Dict[str, Any]) -> None:
        for k, v in upd.items():
            if (
                isinstance(v, dict)
                and isinstance(base.get(k), dict)
                and k not in Config._REPLACE_KEYS
            ):
                Config._deep_update(base[k], v)
            else:
                base[k] = v

    # -- derivations ------------------------------------------------------

    def _derive(self) -> None:
        d = self.final_config_dict

        # input type from the model registry (if resolvable)
        model = d.get("model")
        if model and "MODEL_INPUT_TYPE" not in d:
            try:
                from oovrec_tpu.models import get_model_class

                d["MODEL_INPUT_TYPE"] = get_model_class(model).input_type
            except (ImportError, ValueError):
                d["MODEL_INPUT_TYPE"] = InputType.POINTWISE

        # metric-type consistency (reference `configurator.py:362-376`)
        metrics = d.get("metrics") or []
        if isinstance(metrics, str):
            metrics = [metrics]
            d["metrics"] = metrics
        kinds = set()
        for m in metrics:
            ml = m.lower()
            if ml in RANKING_METRICS:
                kinds.add(EvaluatorType.RANKING)
            elif ml in VALUE_METRICS:
                kinds.add(EvaluatorType.VALUE)
            else:
                raise NotImplementedError(f"There is no metric named '{m}'")
        if len(kinds) > 1:
            raise RuntimeError(
                "Ranking metrics and value metrics can not be used at the same time."
            )
        d["eval_type"] = kinds.pop() if kinds else EvaluatorType.RANKING

        # smaller-is-better for the valid metric
        vm = str(d.get("valid_metric", "MRR@10")).split("@")[0].lower()
        d["valid_metric_bigger"] = vm not in SMALLER_METRICS

        if isinstance(d.get("topk"), int):
            d["topk"] = [d["topk"]]

        # normalize eval_args.mode into a per-phase dict
        # (reference `configurator.py:440-474`)
        ea = d.get("eval_args") or {}
        mode = ea.get("mode", "full")
        if isinstance(mode, str):
            ea["mode"] = {"valid": mode, "test": mode}
        ea.setdefault("split", {"RS": [0.8, 0.1, 0.1]})
        ea.setdefault("order", "RO")
        ea.setdefault("group_by", "user")
        d["eval_args"] = ea

        # process topology from JAX (replaces `_init_device`/NCCL init)
        d.setdefault("single_spec", True)

    # -- mapping interface -------------------------------------------------

    def __getitem__(self, key: str) -> Any:
        return self.final_config_dict.get(key)

    def __setitem__(self, key: str, value: Any) -> None:
        self.final_config_dict[key] = value

    def __contains__(self, key: str) -> bool:
        return key in self.final_config_dict

    def get(self, key: str, default: Any = None) -> Any:
        v = self.final_config_dict.get(key, default)
        return default if v is None else v

    def update(self, d: Dict[str, Any]) -> None:
        self._deep_update(self.final_config_dict, d)

    def keys(self):
        return self.final_config_dict.keys()

    def as_dict(self) -> Dict[str, Any]:
        return dict(self.final_config_dict)

    def __repr__(self) -> str:
        return f"Config({self.final_config_dict.get('model')}, {self.final_config_dict.get('dataset')})"


def parse_cli_args(argv: List[str]) -> Dict[str, Any]:
    """Parse `--key=value` args with type inference.

    Equivalent of the paper driver's custom parser (`src/utils/parse.py:44`):
    ints, floats, booleans and bracketed lists are inferred; everything else
    stays a string.
    """
    out: Dict[str, Any] = {}
    for arg in argv:
        if not arg.startswith("--"):
            continue
        body = arg[2:]
        if "=" in body:
            k, v = body.split("=", 1)
            out[k] = _infer(v)
        else:
            out[body] = True
    return out


def _infer(v: str) -> Any:
    s = v.strip()
    low = s.lower()
    if low in ("true", "yes"):
        return True
    if low in ("false", "no"):
        return False
    if low in ("none", "null", "~"):
        return None
    if re.fullmatch(r"[+-]?\d+", s):
        return int(s)
    try:
        return float(s)
    except ValueError:
        pass
    if (s.startswith("[") and s.endswith("]")) or (
        s.startswith("{") and s.endswith("}")
    ):
        try:
            return yaml.safe_load(s)
        except yaml.YAMLError:
            return s
    return s
