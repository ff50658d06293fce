"""Evaluation-settings matrix (reference
`tests/evaluation_setting/test_evaluation_setting.py` pattern): 1-epoch
end-to-end runs across split/order/mode combinations."""

import pytest

from oovrec_tpu.cli.quick_start import objective_function

from tests.test_more_models import _cfg


SETTINGS = [
    # (split, order, mode)
    ({"RS": [0.8, 0.1, 0.1]}, "RO", "full"),
    ({"RS": [0.8, 0.1, 0.1]}, "TO", "full"),
    ({"LS": "valid_and_test"}, "TO", "full"),
    ({"RS": [0.8, 0.1, 0.1]}, "RO", "uni10"),
    ({"LS": "valid_and_test"}, "TO", "uni10"),
    ({"RS": [0.8, 0.1, 0.1]}, "RO", "pop10"),
]


@pytest.mark.parametrize("split,order,mode", SETTINGS)
def test_eval_setting_matrix(split, order, mode):
    cfg = _cfg("BPR", epochs=1)
    cfg["eval_args"] = {
        "split": split, "order": order, "group_by": "user", "mode": mode,
    }
    res = objective_function(config_dict=cfg, saved=False)
    assert "recall@5" in res["test_result"]


def test_eval_setting_labeled_value():
    cfg = _cfg("FM", epochs=1)
    cfg.update(
        metrics=["AUC", "LogLoss"],
        valid_metric="AUC",
        threshold={"rating": 4},
        numerical_features=[],
    )
    cfg["eval_args"] = {
        "split": {"RS": [0.8, 0.1, 0.1]}, "order": "RO",
        "group_by": None, "mode": "labeled",
    }
    res = objective_function(config_dict=cfg, saved=False)
    assert "auc" in res["test_result"]
