"""Metric-formula unit tests with hand-computed expectations
(reference test style: `tests/metrics/test_topk_metrics.py`)."""

import numpy as np
import pytest

from oovrec_tpu.eval.collector import Collector, DataStruct, Evaluator
from oovrec_tpu.eval.metrics import (
    auc_,
    hit_,
    logloss_,
    mae_,
    mrr_,
    ndcg_,
    precision_,
    recall_,
    rmse_,
)

pos_idx = np.array([[0, 1, 1], [1, 0, 1], [0, 0, 0]], dtype=bool)
pos_len = np.array([1, 3, 4])


def test_hit():
    expect = np.array([[0, 1, 1], [1, 1, 1], [0, 0, 0]])
    np.testing.assert_array_equal(hit_(pos_idx), expect)


def test_mrr():
    expect = np.array([[0, 1 / 2, 1 / 2], [1, 1, 1], [0, 0, 0]])
    np.testing.assert_allclose(mrr_(pos_idx), expect)


def test_recall():
    expect = np.array(
        [[0, 1, 2], [1 / 3, 1 / 3, 2 / 3], [0, 0, 0]], dtype=float
    ) / np.array([[1], [1], [1]])
    expect[0] = [0, 1 / 1, 2 / 1]
    np.testing.assert_allclose(recall_(pos_idx, pos_len), np.array(
        [[0, 1, 2], [1/3, 1/3, 2/3], [0, 0, 0]]
    ))


def test_precision():
    expect = np.array(
        [[0, 1 / 2, 2 / 3], [1, 1 / 2, 2 / 3], [0, 0, 0]]
    )
    np.testing.assert_allclose(precision_(pos_idx), expect)


def test_ndcg():
    log2 = np.log2
    # user 0: pos_len 1 → idcg = 1 at every k; dcg = 1/log2(3), then +1/log2(4)
    d2, d3 = 1 / log2(3), 1 / log2(4)
    i1 = 1.0
    i2 = 1.0 + 1 / log2(3)
    i3 = i2 + 1 / log2(4)
    expect0 = [0, d2 / i1, (d2 + d3) / i1]
    expect1 = [1 / i1, 1 / i2, (1 + d3) / i3]
    got = ndcg_(pos_idx, pos_len)
    np.testing.assert_allclose(got[0], expect0)
    np.testing.assert_allclose(got[1], expect1)
    np.testing.assert_allclose(got[2], [0, 0, 0])


def test_auc_matches_sklearn():
    from sklearn.metrics import roc_auc_score

    rng = np.random.Generator(np.random.PCG64(3))
    for _ in range(5):
        trues = rng.integers(0, 2, 50).astype(float)
        preds = rng.random(50)
        assert auc_(preds, trues) == pytest.approx(
            roc_auc_score(trues, preds), abs=1e-9
        )
    # tied scores path
    preds_t = np.round(preds, 1)
    assert auc_(preds_t, trues) == pytest.approx(
        roc_auc_score(trues, preds_t), abs=1e-9
    )


def test_value_metrics():
    preds = np.array([0.2, 0.8])
    trues = np.array([0.0, 1.0])
    assert mae_(preds, trues) == pytest.approx(0.2)
    assert rmse_(preds, trues) == pytest.approx(0.2)
    assert logloss_(preds, trues) == pytest.approx(
        (-np.log(0.8) - np.log(0.8)) / 2
    )


def test_evaluator_end_to_end():
    cfg = {
        "metrics": ["Recall", "MRR", "Hit"],
        "topk": [2, 3],
        "metric_decimal_place": 4,
        "eval_type": None,
    }
    c = Collector(_DictCfg(cfg))
    c.collect_topk(pos_idx.astype(int), pos_len)
    ev = Evaluator(_DictCfg(cfg))
    out = ev.evaluate(c.get_data_struct())
    assert out["hit@2"] == pytest.approx(round((1 + 1 + 0) / 3, 4))
    assert out["recall@3"] == pytest.approx(round((2 / 1 + 2 / 3 + 0) / 3, 4))


def test_collector_weight_filter():
    cfg = _DictCfg({
        "metrics": ["Hit"], "topk": [2], "metric_decimal_place": 4,
        "eval_type": None,
    })
    c = Collector(cfg)
    c.collect_topk(pos_idx.astype(int), pos_len, weight=np.array([1, 1, 0]))
    out = Evaluator(cfg).evaluate(c.get_data_struct())
    assert out["hit@2"] == pytest.approx(1.0)  # padded user dropped


class _DictCfg(dict):
    def __getitem__(self, k):
        return self.get(k)
