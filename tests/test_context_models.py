"""CTR stack tests: field packing, first-order linear, WideDeep/DCNv2/
xDeepFM end-to-end with the ranking (AUC/RMSE, uni-neg) protocol."""

import numpy as np
import pytest

from oovrec_tpu.cli.quick_start import objective_function, run
from oovrec_tpu.config import Config
from oovrec_tpu.data.dataset import Dataset
from oovrec_tpu.models.context import field_spec_from_dataset

from tests.test_dataset import ASSETS, toyind_config


def _ranking_cfg(model="WideDeep", **over):
    d = {
        "model": model,
        "dataset": "toy-ind",
        "data_path": ASSETS,
        "load_col": {
            "inter": ["user_id", "item_id", "rating", "timestamp", "is_new"],
            "user": ["user_id", "age", "gender"],
            "item": ["item_id", "price", "category"],
        },
        "numerical_features": ["age", "price"],
        "threshold": {"rating": 4},
        "epochs": 2,
        "train_batch_size": 16,
        "eval_batch_size": 200,
        "embedding_size": 8,
        "mlp_hidden_size": [16, 8],
        "metrics": ["AUC", "RMSE"],
        "valid_metric": "RMSE",
        "model_eval_type": "ranking",
        "eval_args": {
            "split": {"RS": [0.8, 0.1, 0.1]},
            "order": "TO",
            "group_by": None,
            "mode": "uni3",
        },
        "checkpoint_dir": "/tmp/oovrec_ctr_ckpt",
    }
    d.update(over)
    return d


def test_field_spec_from_dataset():
    c = Config(config_dict=_ranking_cfg())
    ds = Dataset(c)
    fs = field_spec_from_dataset(ds, c)
    assert fs.token_names[0] == "user_id"
    assert fs.token_names[1] == "item_id"
    assert "gender" in fs.token_names and "category" in fs.token_names
    assert "is_new" in fs.token_names  # token field from inter
    assert set(fs.float_names) == {"age", "price"}
    assert fs.token_dims[0] == ds.user_num
    assert fs.token_dims[1] == ds.item_num
    # non-discretized numerical features default to bucketnum 2
    assert fs.float_dims == (2, 2)


@pytest.mark.parametrize("model", ["WideDeep", "DCNV2", "xDeepFM", "LR", "FM", "DeepFM"])
def test_ctr_models_end_to_end(model):
    over = {}
    if model == "DCNV2":
        over = {"cross_layer_num": 2, "reg_weight": 0.01}
    res = objective_function(config_dict=_ranking_cfg(model, **over), saved=False)
    tr = res["test_result"]
    assert "auc" in tr and "rmse" in tr
    assert 0.0 <= tr["auc"] <= 1.0 or np.isnan(tr["auc"])


def test_dcnv2_mixed_cross():
    res = objective_function(
        config_dict=_ranking_cfg(
            "DCNV2", mixed=True, expert_num=2, low_rank=4, cross_layer_num=2,
            reg_weight=0.01,
        ),
        saved=False,
    )
    assert "auc" in res["test_result"]


@pytest.mark.parametrize("model", ["WideDeep", "DCNV2", "xDeepFM"])
def test_ctr_inductive_eval_seven_slices(tmp_path, model):
    """Ranking-track inductive eval end-to-end: checkpoint → _ind corpus
    rebuild → 7-slice VALUE metrics (`perform_hashing.py:85-170` on the
    paper's ranking models). Regression: the model re-init template must
    carry every feature column, not just the id triple."""
    from oovrec_tpu.cli.inductive_eval import perform_inductive_eval

    over = {}
    if model == "DCNV2":
        over = {"cross_layer_num": 2, "reg_weight": 0.01}
    elif model == "xDeepFM":
        over = {"cin_layer_size": [8, 8], "direct": False, "reg_weight": 0.0}
    cfg = _ranking_cfg(
        model,
        checkpoint_dir=str(tmp_path),
        **over,
        inductive_embedder="lsh",
        add_oov_buckets=True,
        n_user_oov_buckets=8,
        n_item_oov_buckets=8,
        train_oov=True,
        oov_train_ratio=0.8,
    )
    res = run(config_dict=cfg, saved=True)
    results = perform_inductive_eval(
        res["dataset"], res["trainer"].saved_model_file, config=res["config"]
    )
    assert set(results) == {
        "overall", "old_users", "new_users",
        "old_old", "old_new", "new_old", "new_new",
    }
    assert "auc" in results["overall"]
    for r in results.values():
        for k, v in r.items():
            if k == "auc" and not np.isnan(v):
                assert 0.0 <= v <= 1.0


def test_ctr_inductive_oov_training(tmp_path):
    cfg = _ranking_cfg(
        "WideDeep",
        checkpoint_dir=str(tmp_path),
        inductive_mapper="random",
        add_oov_buckets=True,
        n_user_oov_buckets=8,
        n_item_oov_buckets=8,
        train_oov=True,
        oov_train_ratio=0.8,
    )
    res = run(config_dict=cfg, saved=True)
    params = res["trainer"].variables["params"]
    # both the tower-dim and the first-order dim-1 OOV buckets exist
    assert "user_oov_buckets" in params["fields"]
    assert "user_oov_buckets" in params["first_order_linear"]["fo"]
    assert params["first_order_linear"]["fo"]["user_oov_buckets"]["embedding"].shape == (8, 1)


@pytest.mark.parametrize("model,over", [
    ("xDeepFM", {"cin_layer_size": [8, 8]}),
    ("DCNV2", {"cross_layer_num": 2}),
    ("DCNV2", {"cross_layer_num": 2, "mixed": True,
               "expert_num": 2, "low_rank": 4}),
])
def test_compute_dtype_policy_close_to_fp32(model, over, tmp_path):
    """`compute_dtype: bfloat16` routes the CIN / cross networks through
    bf16 (fp32 accumulate); predictions must stay close to the fp32
    reference-parity path, and the default policy must stay fp32."""
    import jax

    from oovrec_tpu.cli.quick_start import build_model_and_state
    from oovrec_tpu.data.utils import create_dataset, data_preparation
    from oovrec_tpu.utils.precision import compute_dtype, set_policy

    cfg = Config(config_dict=_ranking_cfg(
        model, checkpoint_dir=str(tmp_path), **over))
    ds = create_dataset(cfg)
    train_loader, _, _ = data_preparation(cfg, ds)
    batch = next(iter(train_loader))

    def predict(policy):
        set_policy(policy)
        try:
            m, variables, estate = build_model_and_state(
                cfg, ds, template_batch=batch)
            return np.asarray(m.apply(
                variables, batch, estate, method=m.predict))
        finally:
            set_policy("float32")

    p32 = predict("float32")
    pbf = predict("bfloat16")
    assert compute_dtype() == jax.numpy.float32  # policy restored
    np.testing.assert_allclose(pbf, p32, atol=3e-2)
    assert not np.allclose(pbf, p32, atol=1e-9) or p32.std() == 0
