"""Model-zoo smoke matrix (the reference's test_model_auto.py pattern):
every registered model trains 1-2 epochs and produces metrics."""

import pytest

from oovrec_tpu.cli.quick_start import objective_function

from tests.test_more_models import _cfg as gen_cfg
from tests.test_sequential import _cfg as seq_cfg
from tests.test_context_models import _ranking_cfg
from tests.test_knowledge import _cfg as kg_cfg

GENERAL = ["BPR", "DirectAU", "Pop", "Random", "ItemKNN", "NeuMF",
           "LightGCN", "EASE", "MultiVAE", "MultiDAE", "CDAE", "DMF",
           "SimpleX", "NGCF", "SGL", "FISM", "NAIS", "ENMF", "LINE",
           "ConvNCF", "SLIMElastic", "RecVAE", "ADMMSLIM", "SpectralCF",
           "GCMC", "NCEPLRec", "NNCF", "DGCF", "NCL", "MacridVAE", "RaCT"]
CONTEXT = ["LR", "FM", "DeepFM", "WideDeep", "DCNV2", "xDeepFM",
           "DCN", "AutoInt", "FNN", "PNN", "AFM", "FwFM", "FFM",
           "DSSM", "FiGNN", "EulerNet", "NFM", "KD_DAGFM"]
SEQUENTIAL = ["GRU4Rec", "SASRec", "BERT4Rec", "NARM", "STAMP", "FPMC", "Caser",
              "NextItNet", "DIN", "DIEN", "HGN", "FOSSIL", "TransRec",
              "SHAN", "NPE", "HRM", "CORE", "SRGNN", "GCSAN", "LightSANs",
              "SINE", "GRU4RecF", "SASRecF", "FDSA", "RepeatNet",
              "GRU4RecKG", "KSR", "S3Rec"]
KNOWLEDGE = ["CKE", "CFKG", "KGAT", "KGCN", "MKR", "KTUP", "KGNNLS",
             "RippleNet", "KGIN", "MCCLK"]


@pytest.mark.parametrize("model", GENERAL)
def test_general(model):
    over = {}
    if model == "NeuMF":
        over = {"mlp_hidden_size": [16, 8]}
    if model in ("MultiVAE", "MultiDAE"):
        over = {"encoder_hidden": [16], "latent_dim": 8}
    if model == "DMF":
        over = {"user_hidden": [16], "item_hidden": [16]}
    if model == "NGCF":
        over = {"hidden_size_list": [8, 8]}
    if model == "SGL":
        over = {"n_layers": 1}
    if model == "NAIS":
        over = {"weight_size": 8}
    if model == "ConvNCF":
        over = {"embedding_size": 8, "cnn_channels": [8, 8]}
    if model == "RecVAE":
        over = {"hidden_dim": 16, "latent_dim": 8}
    if model == "ADMMSLIM":
        over = {"admm_iter": 5}
    if model == "SpectralCF":
        over = {"n_layers": 2}
    if model == "GCMC":
        over = {"gcn_output_dim": 8}
    if model == "NCEPLRec":
        over = {"rank": 4}
    if model == "NNCF":
        over = {"neigh_num": 4, "mlp_hidden_size": [16]}
    if model == "DGCF":
        over = {"n_factors": 2}
    if model == "NCL":
        over = {"num_clusters": 4}
    if model == "MacridVAE":
        over = {"kfac": 2, "latent_dim": 8, "encoder_hidden": [16]}
    if model == "RaCT":
        over = {"latent_dim": 8, "encoder_hidden": [16],
                "critic_layers": [8], "metrics_k": 5}
    res = objective_function(config_dict=gen_cfg(model, epochs=1, **over),
                             saved=False)
    assert "recall@5" in res["test_result"]


@pytest.mark.parametrize("model", CONTEXT)
def test_context(model):
    over = {"cross_layer_num": 2, "n_layers": 1, "attention_size": 8,
            "reg_weight": 0.01}
    if model == "FFM":
        over["embedding_size"] = 4
    if model == "DSSM":
        over["mlp_hidden_size"] = [16, 8]
    if model == "FiGNN":
        over["attention_size"] = 8
    if model == "NFM":
        over["mlp_hidden_size"] = [16, 8]
    if model == "KD_DAGFM":
        over.update(depth=2, phase="distillation")
    res = objective_function(
        config_dict=_strip(_ranking_cfg(model, epochs=1, **over)),
        saved=False,
    )
    assert "auc" in res["test_result"]


def _strip(cfg):
    return cfg


@pytest.mark.parametrize("model", SEQUENTIAL)
def test_sequential(model):
    cfg = seq_cfg(model, epochs=1)
    if model in ("FPMC", "DIN", "DIEN", "TransRec"):
        cfg["train_neg_sample_args"] = {
            "distribution": "uniform", "sample_num": 1,
        }
    if model in ("DIN", "DIEN"):
        cfg.update(mlp_hidden_size=[16], att_hidden=[8])
    if model == "Caser":
        cfg.update(n_h=4, n_v=2)
    if model == "LightSANs":
        cfg.update(k_interests=3)
    if model == "SINE":
        cfg.update(prototype_size=4)
    if model in ("GRU4RecF", "SASRecF", "FDSA", "S3Rec"):
        cfg["load_col"] = {
            "inter": ["user_id", "item_id", "rating", "timestamp"],
            "item": ["item_id", "category", "tags"],
        }
        cfg["selected_features"] = ["category", "tags"]
    if model in ("GRU4RecKG", "KSR"):
        cfg["additional_feat_suffix"] = ["ent"]
        cfg["preload_weight"] = {"ent_id": "ent_vec"}
    if model == "KSR":
        cfg["n_relations"] = 3
    if model == "S3Rec":
        cfg.update(train_stage="pretrain", inner_size=16)
    res = objective_function(config_dict=cfg, saved=False)
    assert "recall@5" in res["test_result"]


@pytest.mark.parametrize("model", KNOWLEDGE)
def test_knowledge(model):
    over = {"layers": [8]} if model == "KGAT" else {}
    if model == "RippleNet":
        over = {"n_memory": 4}
    if model == "KGIN":
        over = {"n_factors": 2, "context_hops": 1}
    if model == "MCCLK":
        over = {"knn_k": 3, "lightgcn_layer": 1}
    res = objective_function(config_dict=kg_cfg(model, epochs=1, **over),
                             saved=False)
    assert "recall@5" in res["test_result"]
