"""General-recommender extras + hyper-tuning + labeled eval."""

import numpy as np
import pytest

from oovrec_tpu.cli.quick_start import objective_function
from oovrec_tpu.train.hyper_tuning import HyperTuning, Parameter

from tests.test_dataset import ASSETS


def _cfg(model, **over):
    d = {
        "model": model,
        "dataset": "toy",
        "data_path": ASSETS,
        "load_col": {"inter": ["user_id", "item_id", "rating", "timestamp"]},
        "epochs": 2,
        "train_batch_size": 16,
        "eval_batch_size": 64,
        "embedding_size": 8,
        "topk": [2, 5],
        "valid_metric": "MRR@2",
        "eval_args": {
            "split": {"RS": [0.8, 0.1, 0.1]},
            "order": "TO",
            "group_by": "user",
            "mode": "full",
        },
        "checkpoint_dir": "/tmp/oovrec_more_ckpt",
    }
    d.update(over)
    return d


@pytest.mark.parametrize(
    "model", ["Pop", "Random", "ItemKNN", "NeuMF", "LightGCN"]
)
def test_general_models_end_to_end(model):
    over = {"mlp_hidden_size": [16, 8]} if model == "NeuMF" else {}
    res = objective_function(config_dict=_cfg(model, **over), saved=False)
    assert "recall@5" in res["test_result"]


def test_pop_ranks_by_popularity():
    res = objective_function(config_dict=_cfg("Pop", epochs=1), saved=False)
    # most popular item in toy is i3 (5 interactions); Pop should surface it
    assert res["test_result"]["hit@5"] > 0.0


def test_hyper_tuning_exhaustive():
    trials = []

    def fake_objective(config_dict=None, config_file_list=None):
        trials.append(dict(config_dict))
        lr = config_dict["learning_rate"]
        emb = config_dict["embedding_size"]
        return {
            "best_valid_score": -(lr - 0.01) ** 2 - (emb - 16) ** 2 / 1e4,
            "valid_score_bigger": True,
            "test_result": {"mrr@2": 0.5},
        }

    ht = HyperTuning(
        fake_objective,
        algo="exhaustive",
        params_dict={
            "learning_rate": [0.1, 0.01, 0.001],
            "embedding_size": [8, 16],
        },
        fixed_config_dict={"model": "BPR"},
    )
    ht.run()
    assert len(trials) == 6
    assert ht.best_params == {"learning_rate": 0.01, "embedding_size": 16}


def test_hyper_tuning_random_and_parse(tmp_path):
    pf = tmp_path / "p.hyper"
    pf.write_text(
        "learning_rate loguniform (1e-4, 1e-1)\n"
        "embedding_size choice [8, 16, 32]\n"
    )

    def fake_objective(config_dict=None, config_file_list=None):
        return {
            "best_valid_score": config_dict["learning_rate"],
            "valid_score_bigger": True,
        }

    ht = HyperTuning(
        fake_objective, algo="random", params_file=str(pf), max_evals=5
    )
    ht.run()
    assert len(ht.score_list) == 5
    for p in ht.params_list:
        assert 1e-4 <= p["learning_rate"] <= 1e-1
        assert p["embedding_size"] in (8, 16, 32)


def test_hyper_tuning_bayes_beats_random():
    """TPE-style 'bayes' (the reference's hyperopt default,
    `recbole/trainer/hyper_tuning.py:157,408`) must localize the optimum
    of a seeded synthetic objective in measurably fewer trials than
    random search over the same space."""
    import numpy as np

    def objective(config_dict=None, config_file_list=None):
        lr = config_dict["learning_rate"]
        drop = config_dict["dropout_prob"]
        emb = config_dict["embedding_size"]
        score = (
            -((np.log10(lr) + 2.0) ** 2)        # optimum lr = 1e-2
            - 4.0 * (drop - 0.3) ** 2            # optimum drop = 0.3
            - (0.5 if emb != 16 else 0.0)        # optimum emb = 16
        )
        return {"best_valid_score": float(score), "valid_score_bigger": True}

    space = dict(
        params_dict=None,
        fixed_config_dict={"model": "BPR"},
        max_evals=40,
    )

    def make(algo, seed):
        ht = HyperTuning(objective, algo=algo, seed=seed, **space)
        for name, kind, spec in (
            ("learning_rate", "loguniform", (1e-5, 1e-1)),
            ("dropout_prob", "uniform", (0.0, 1.0)),
            ("embedding_size", "choice", [8, 16, 32, 64]),
        ):
            ht.params.append(Parameter(name, kind, spec))
        ht.run()
        return ht

    def trials_to(ht, threshold):
        best = -np.inf
        for i, s in enumerate(ht.score_list):
            best = max(best, s)
            if best >= threshold:
                return i + 1
        return len(ht.score_list) + 1

    # average over seeds so the comparison tests the algorithm, not one draw
    seeds = (2020, 7, 99)
    bayes_hits = [trials_to(make("bayes", s), -0.15) for s in seeds]
    rand_hits = [trials_to(make("random", s), -0.15) for s in seeds]
    bayes_best = [make("bayes", s).best_score for s in seeds]
    rand_best = [make("random", s).best_score for s in seeds]
    assert np.mean(bayes_hits) < np.mean(rand_hits)
    assert np.mean(bayes_best) >= np.mean(rand_best)


def test_labeled_eval_mode():
    cfg = _cfg(
        "NeuMF",
        mlp_hidden_size=[8],
        threshold={"rating": 4},
        metrics=["AUC", "LogLoss"],
        valid_metric="AUC",
        eval_args={
            "split": {"RS": [0.8, 0.1, 0.1]},
            "order": "TO",
            "group_by": None,
            "mode": "labeled",
        },
    )
    res = objective_function(config_dict=cfg, saved=False)
    assert "auc" in res["test_result"]
    assert "logloss" in res["test_result"]
