"""Paper-protocol end-to-end: the CLI driver flow with uni250-style
sampled eval and the sampled-negative inductive path."""

import numpy as np
import pytest

from oovrec_tpu.cli.run import apply_paper_protocol, main
from oovrec_tpu.cli.inductive_eval import perform_inductive_eval
from oovrec_tpu.cli.quick_start import run

from tests.test_dataset import ASSETS
from tests.test_inductive import _ind_cfg


def test_apply_paper_protocol_retrieval():
    args = apply_paper_protocol({"model_eval_type": "retrieval"})
    assert args["valid_metric"] == "MRR@20"
    assert args["eval_args"]["mode"] == "uni250"
    assert args["eval_args"]["split"] == {"RS": [0.88, 0.02, 0.1]}
    assert args["topk"] == [10, 20]


def test_apply_paper_protocol_ranking():
    args = apply_paper_protocol({"model_eval_type": "ranking"})
    assert args["metrics"] == ["AUC", "RMSE"]
    assert args["valid_metric"] == "RMSE"


def test_sampled_inductive_eval(tmp_path):
    """mode uniN → NegSampleEvalBatcher on the _ind corpus → 7 slices via
    scattered score matrices (the actual paper protocol)."""
    cfg = _ind_cfg(
        checkpoint_dir=str(tmp_path),
        eval_args={
            "split": {"RS": [0.8, 0.1, 0.1]},
            "order": "TO",
            "group_by": None,
            "mode": "uni3",
        },
        topk=[2, 3],
        valid_metric="MRR@2",
    )
    res = run(config_dict=cfg, saved=True)
    results = perform_inductive_eval(
        res["dataset"], res["trainer"].saved_model_file, config=res["config"]
    )
    # inductive protocol forces topk [3,5,10,20]
    assert "recall@3" in results["overall"]
    assert set(results) == {
        "overall", "old_users", "new_users",
        "old_old", "old_new", "new_old", "new_new",
    }
    # new-user rows exist in the fixture's test_filt file
    assert len(results["new_users"]) > 0


def test_cli_driver_main(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    argv = [
        "--model=BPR",
        "--dataset=toy-ind",
        f"--data_path={ASSETS}",
        "--epochs=1",
        "--train_batch_size=16",
        "--embedding_size=8",
        "--inductive_mapper=random",
        "--add_oov_buckets",
        "--n_user_oov_buckets=8",
        "--n_item_oov_buckets=8",
        "--train_oov=True",
        "--inductive_eval=True",
        f"--checkpoint_dir={tmp_path}/saved",
        "--load_col={'inter': ['user_id','item_id','rating','timestamp','is_new'],"
        " 'user': ['user_id','age','gender'],"
        " 'item': ['item_id','price','category']}",
    ]
    res = main(argv)
    assert "inductive_results" in res
    assert "recall@3" in res["inductive_results"]["overall"]
