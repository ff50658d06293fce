"""Extended ranking metrics: GAUC + item-list diversity/popularity family."""

import numpy as np
import pytest

from oovrec_tpu.cli.quick_start import objective_function
from oovrec_tpu.eval.metrics import (
    average_popularity_,
    gauc_,
    gini_index_,
    item_coverage_,
    shannon_entropy_,
    tail_percentage_,
)

from tests.test_more_models import _cfg


def test_gauc_formula():
    # one user, 5 items ranked, positives at ranks 1 and 3
    # AUC(u) = pairs won / (pos*neg): pos ranks {1,3} among 5 →
    # pair_num = (5+1)*2 - 2*3/2 - (1+3) = 12 - 3 - 4 = 5; auc = 5/(3*2)
    v = gauc_(
        np.array([4.0]), np.array([5.0]), np.array([2.0])
    )
    assert v == pytest.approx(5 / 6)


def test_item_coverage_and_entropy():
    items = np.array([[1, 2], [2, 3]])
    assert item_coverage_(items, 10) == pytest.approx(3 / 10)
    # counts: 1→1, 2→2, 3→1 over total 4
    p = np.array([1, 2, 1]) / 4
    expect = float(np.sum(-p * np.log(p)) / 3)
    assert shannon_entropy_(items) == pytest.approx(expect)


def test_gini_index():
    items = np.array([[1, 1], [1, 2]])
    # counts sorted [1, 3]; num_items=4; idx=[3,4]
    # gini = ((2*3-4-1)*1 + (2*4-4-1)*3)/4 / 4 = (1 + 9)/16
    assert gini_index_(items, 4) == pytest.approx(10 / 16)


def test_average_popularity_and_tail():
    counts = np.array([0, 10, 2, 0])  # PAD + 3 items
    items = np.array([[1, 2], [2, 2]])
    pop = average_popularity_(items, counts)
    np.testing.assert_allclose(pop, [[10, 6], [2, 2]])
    tail = tail_percentage_(items, counts, tail=0.5)
    # tail=0.5 → lowest-count half of items {3 (cnt 0)} → no tail hits here
    assert tail.shape == (2, 2)


def test_diversity_metrics_end_to_end():
    cfg = _cfg(
        "BPR",
        metrics=["Recall", "ItemCoverage", "ShannonEntropy", "GiniIndex",
                 "AveragePopularity", "TailPercentage", "GAUC"],
        valid_metric="Recall@2",
    )
    res = objective_function(config_dict=cfg, saved=False)
    tr = res["test_result"]
    assert "itemcoverage@5" in tr and 0 < tr["itemcoverage@5"] <= 1
    assert "giniindex@5" in tr
    assert "gauc" in tr and 0 <= tr["gauc"] <= 1
    assert "averagepopularity@2" in tr
