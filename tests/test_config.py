"""Config layer tests (merge precedence, derivations, CLI parsing).

Modeled on the reference's config tests (`tests/config/test_config.py`)
but written against our layered Config.
"""

import pytest

from oovrec_tpu.config import Config, parse_cli_args
from oovrec_tpu.utils.enums import EvaluatorType


def test_defaults_loaded():
    c = Config(model="BPR", dataset="test")
    assert c["epochs"] == 300
    assert c["train_batch_size"] == 2048
    assert c["oov_prime_pad"] == 112062759511
    assert c["oov_hash_function"] == "3round"
    assert c["dhe_num_hashes"] == 128
    assert c["oov_train_ratio"] == 0.2
    assert c["USER_ID_FIELD"] == "user_id"


def test_config_dict_overrides_defaults():
    c = Config(model="BPR", dataset="test", config_dict={"epochs": 7, "topk": 5})
    assert c["epochs"] == 7
    assert c["topk"] == [5]  # int normalized to list


def test_eval_mode_normalized_per_phase():
    c = Config(config_dict={"eval_args": {"mode": "uni250"}})
    assert c["eval_args"]["mode"] == {"valid": "uni250", "test": "uni250"}


def test_metric_type_consistency():
    c = Config(config_dict={"metrics": ["Recall", "NDCG"]})
    assert c["eval_type"] == EvaluatorType.RANKING
    c = Config(config_dict={"metrics": ["AUC"], "valid_metric": "AUC"})
    assert c["eval_type"] == EvaluatorType.VALUE
    with pytest.raises(RuntimeError):
        Config(config_dict={"metrics": ["Recall", "AUC"]})
    with pytest.raises(NotImplementedError):
        Config(config_dict={"metrics": ["NotAMetric"]})


def test_smaller_is_better_valid_metric():
    c = Config(config_dict={"metrics": ["RMSE"], "valid_metric": "RMSE"})
    assert c["valid_metric_bigger"] is False


def test_cli_parsing_types():
    d = parse_cli_args(
        [
            "--epochs=5",
            "--learning_rate=1e-3",
            "--use_thing=True",
            "--name=yelp",
            "--topk=[3,5,10]",
            "--flag",
        ]
    )
    assert d == {
        "epochs": 5,
        "learning_rate": 0.001,
        "use_thing": True,
        "name": "yelp",
        "topk": [3, 5, 10],
        "flag": True,
    }


def test_deep_update_of_nested_dicts():
    c = Config(config_dict={"eval_args": {"split": {"RS": [0.88, 0.02, 0.1]}}})
    assert c["eval_args"]["split"] == {"RS": [0.88, 0.02, 0.1]}
    assert c["eval_args"]["order"] == "RO"  # untouched default


def test_dataset_url_registry():
    """The bundled URL tables resolve; ensure_dataset finds local dirs
    and raises a clear, layout-documenting error otherwise."""
    import pytest as _pytest

    from oovrec_tpu.utils.url import dataset_url_registry, ensure_dataset

    reg = dataset_url_registry()
    assert len(reg) > 100 and reg["ml-1m"].startswith("https://")
    assert "ProcessedDatasets" in reg["ml-1m"]  # plain table, not KG
    import os

    assets = os.path.join(os.path.dirname(__file__), "assets")
    assert ensure_dataset("toy", assets).endswith("toy")
    with _pytest.raises(FileNotFoundError):
        ensure_dataset("definitely-not-a-dataset", "/tmp/nowhere/")
