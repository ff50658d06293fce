"""Collector + Evaluator: per-batch accumulation → metric dict.

Equivalent of `recbole/evaluator/collector.py` + `evaluator.py` +
`register.py`. Device batches produce small host arrays
(`pos_idx@maxK ∥ pos_len` rows, or pooled scores/labels); the collector
accumulates them and `Evaluator.evaluate` folds the metric formulas.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Dict, List, Optional

import numpy as np

from oovrec_tpu.eval.metrics import (
    TOPK_METRICS,
    VALUE_METRICS,
    topk_result,
)
from oovrec_tpu.utils.enums import EvaluatorType


class DataStruct:
    """Grow-by-concat tensor store (`collector.py:20-58`)."""

    def __init__(self):
        self._data: Dict[str, List[np.ndarray]] = {}

    def update_tensor(self, name: str, value: np.ndarray) -> None:
        self._data.setdefault(name, []).append(np.asarray(value))

    def get(self, name: str) -> np.ndarray:
        if name not in self._data:
            raise KeyError(f"{name} not in DataStruct")
        chunks = self._data[name]
        return chunks[0] if len(chunks) == 1 else np.concatenate(chunks, axis=0)

    def has(self, name: str) -> bool:
        return name in self._data


class Collector:
    """Accumulates eval resources batch by batch."""

    def __init__(self, config):
        self.config = config
        self.topk = config["topk"]
        self.maxk = max(self.topk)
        self.eval_type = config["eval_type"]
        self.data_struct = DataStruct()

    def collect_topk(
        self, pos_idx: np.ndarray, pos_len: np.ndarray, weight=None
    ) -> None:
        """pos_idx (U, maxk) 0/1 hits at each rank; pos_len (U,)."""
        if weight is not None:
            keep = np.asarray(weight) > 0
            pos_idx = pos_idx[keep]
            pos_len = pos_len[keep]
        result = np.concatenate(
            [pos_idx.astype(np.int64), pos_len.reshape(-1, 1).astype(np.int64)],
            axis=1,
        )
        self.data_struct.update_tensor("rec.topk", result)

    def collect_items(self, topk_items: np.ndarray, weight=None) -> None:
        if weight is not None:
            topk_items = topk_items[np.asarray(weight) > 0]
        self.data_struct.update_tensor("rec.items", topk_items)

    def collect_scores(
        self, scores: np.ndarray, labels: np.ndarray, weight=None
    ) -> None:
        if weight is not None:
            keep = np.asarray(weight) > 0
            scores = scores[keep]
            labels = labels[keep]
        self.data_struct.update_tensor("rec.score", scores)
        self.data_struct.update_tensor("data.label", labels)

    def get_data_struct(self) -> DataStruct:
        return self.data_struct


class Evaluator:
    """Metric names → values from a DataStruct (`evaluator.py:27-41`)."""

    def __init__(self, config):
        self.config = config
        self.metrics = [m.lower() for m in config["metrics"]]
        self.topk = config["topk"]
        self.decimal_place = config["metric_decimal_place"]

    def evaluate(self, struct: DataStruct) -> "OrderedDict[str, float]":
        result: "OrderedDict[str, float]" = OrderedDict()
        for metric in self.metrics:
            if metric in TOPK_METRICS:
                rec = struct.get("rec.topk")
                pos_idx = rec[:, : -1].astype(bool)
                pos_len = rec[:, -1]
                value = TOPK_METRICS[metric](pos_idx, pos_len)
                result.update(
                    topk_result(metric, value, self.topk, self.decimal_place)
                )
            elif metric in VALUE_METRICS:
                preds = struct.get("rec.score")
                trues = struct.get("data.label")
                result[metric] = round(
                    VALUE_METRICS[metric](preds, trues), self.decimal_place
                )
            else:
                raise NotImplementedError(f"metric [{metric}] not implemented")
        return result


def calculate_valid_score(valid_result: Dict[str, float], valid_metric: Optional[str]):
    """`recbole/utils/utils.py` calculate_valid_score analog."""
    if valid_metric:
        key = valid_metric.lower()
        for k, v in valid_result.items():
            if k.lower() == key:
                return v
    return next(iter(valid_result.values()))
