"""Import reference (torch) checkpoints into oovrec_tpu params.

A user of the reference framework can load a trained `.pth` state_dict
(`Trainer._save_checkpoint`, reference `trainer.py:294-317`) and continue
in this framework — the weight layouts are mapped module-by-module, and
equality of outputs under these maps is proven by
tests/test_reference_parity.py (BPR, DirectAU, WideDeep, DCNv2 incl.
DCN-mix, xDeepFM, GRU4Rec, LightGCN).

Conventions:
  * torch ``nn.Embedding.weight``      → flax ``{"embedding": W}``
  * torch ``nn.Linear.weight``/bias    → flax ``{"kernel": W.T, "bias": b}``
  * torch GRU gates (r,z,n packed)     → flax GRUCell ir/iz/in/hr/hz/hn
    (r/z input biases absorb the hidden biases; n-gate biases separate)
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _emb(sd, key):
    return {"embedding": np.asarray(sd[key])}


def _lin(sd, key, bias=True):
    out = {"kernel": np.asarray(sd[f"{key}.weight"]).T}
    if bias and f"{key}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{key}.bias"])
    return out


def _gru_cell(sd, prefix, layer=0):
    W_ih = np.asarray(sd[f"{prefix}.weight_ih_l{layer}"])
    W_hh = np.asarray(sd[f"{prefix}.weight_hh_l{layer}"])
    H = W_hh.shape[1]
    r_i, z_i, n_i = np.split(W_ih, 3, 0)
    r_h, z_h, n_h = np.split(W_hh, 3, 0)
    if f"{prefix}.bias_ih_l{layer}" in sd:
        b_ih = np.asarray(sd[f"{prefix}.bias_ih_l{layer}"])
        b_hh = np.asarray(sd[f"{prefix}.bias_hh_l{layer}"])
        br_i, bz_i, bn_i = np.split(b_ih, 3)
        br_h, bz_h, bn_h = np.split(b_hh, 3)
    else:
        z = np.zeros(H, np.float32)
        br_i = bz_i = bn_i = br_h = bz_h = bn_h = z
    return {
        "ir": {"kernel": r_i.T, "bias": br_i + br_h},
        "iz": {"kernel": z_i.T, "bias": bz_i + bz_h},
        "in": {"kernel": n_i.T, "bias": bn_i},
        "hr": {"kernel": r_h.T},
        "hz": {"kernel": z_h.T},
        "hn": {"kernel": n_h.T, "bias": bn_h},
    }


def _context_tables(sd, with_fo=True):
    p: Dict[str, Any] = {"fields": {
        "token_embedding_table": _emb(sd, "token_embedding_table.embedding.weight"),
    }}
    if "float_embedding_table.embedding.weight" in sd:
        p["fields"]["float_embedding_table"] = _emb(
            sd, "float_embedding_table.embedding.weight")
    for side in ("user", "item"):
        k = f"{side}_oov_buckets.weight"
        if k in sd:
            p["fields"][f"{side}_oov_buckets"] = {"embedding": np.asarray(sd[k])}
    if with_fo and "first_order_linear.bias" in sd:
        fo: Dict[str, Any] = {
            "bias": np.asarray(sd["first_order_linear.bias"]),
            "fo": {"token_embedding_table": _emb(
                sd, "first_order_linear.token_embedding_table.embedding.weight")},
        }
        if "first_order_linear.float_embedding_table.embedding.weight" in sd:
            fo["fo"]["float_embedding_table"] = _emb(
                sd, "first_order_linear.float_embedding_table.embedding.weight")
        for side in ("user", "item"):
            k = f"first_order_linear.{side}_oov_buckets.weight"
            if k in sd:
                fo["fo"][f"{side}_oov_buckets"] = {
                    "embedding": np.asarray(sd[k])}
        p["first_order_linear"] = fo
    return p


def import_state_dict(model_name: str, sd: Dict[str, Any]) -> Dict[str, Any]:
    """torch state_dict (numpy-able values) → our params tree."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    name = model_name.lower()
    if name in ("bpr", "directau"):
        p = {
            "user_embedding": _emb(sd, "user_embedding.weight"),
            "item_embedding": _emb(sd, "item_embedding.weight"),
        }
        for side in ("user", "item"):
            k = f"{side}_oov_buckets.weight"
            if k in sd:
                p[f"{side}_oov_buckets"] = {"embedding": np.asarray(sd[k])}
        return p
    if name == "lightgcn":
        return {
            "user_embedding": _emb(sd, "user_embedding.weight"),
            "item_embedding": _emb(sd, "item_embedding.weight"),
        }
    if name == "gru4rec":
        p = {
            "item_embedding": _emb(sd, "item_embedding.weight"),
            "dense": _lin(sd, "dense"),
            "gru_0": _gru_cell(sd, "gru_layers"),
        }
        return p
    if name == "widedeep":
        p = _context_tables(sd)
        n = len([k for k in sd if k.startswith("mlp_layers.mlp_layers")
                 and k.endswith(".weight")])
        p["mlp_layers"] = _mlp_direct(sd, "mlp_layers", n)
        p["deep_predict_layer"] = _lin(sd, "deep_predict_layer")
        return p
    if name == "dcnv2":
        p = _context_tables(sd, with_fo=False)
        L = len([k for k in sd if k.startswith("cross_layer_w.")]) or len(
            [k for k in sd if k.startswith("cross_layer_u.")])
        if any(k.startswith("cross_layer_w.") for k in sd):
            p["cross_layer_w"] = np.stack(
                [sd[f"cross_layer_w.{i}"] for i in range(L)])
        else:
            p["cross_layer_u"] = np.stack(
                [sd[f"cross_layer_u.{i}"] for i in range(L)])
            p["cross_layer_v"] = np.stack(
                [sd[f"cross_layer_v.{i}"] for i in range(L)])
            p["cross_layer_c"] = np.stack(
                [sd[f"cross_layer_c.{i}"] for i in range(L)])
            e = 0
            while f"gating.{e}.weight" in sd:
                p[f"gating_{e}"] = _lin(sd, f"gating.{e}")
                e += 1
        p["cross_bias"] = np.stack(
            [np.asarray(sd[f"bias.{i}"]).reshape(-1) for i in range(L)])
        n = len([k for k in sd if k.startswith("mlp_layers.mlp_layers")
                 and k.endswith(".weight")])
        p["mlp_layers"] = _mlp_direct(sd, "mlp_layers", n)
        p["predict_layer"] = _lin(sd, "predict_layer")
        return p
    if name == "xdeepfm":
        p = _context_tables(sd)
        i = 0
        while f"conv1d_list.{i}.weight" in sd:
            w = np.asarray(sd[f"conv1d_list.{i}.weight"])  # (out, in, 1)
            p[f"conv1d_{i}"] = {
                "kernel": w[:, :, 0].T,
                "bias": np.asarray(sd[f"conv1d_list.{i}.bias"]),
            }
            i += 1
        p["cin_linear"] = _lin(sd, "cin_linear")
        n = len([k for k in sd if k.startswith("mlp_layers.mlp_layers")
                 and k.endswith(".weight")])
        p["mlp_layers"] = _mlp_direct(sd, "mlp_layers", n)
        return p
    raise NotImplementedError(
        f"No torch-import map for model [{model_name}] yet; supported: "
        "BPR, DirectAU, LightGCN, GRU4Rec, WideDeep, DCNV2, xDeepFM"
    )


def _mlp_direct(sd, prefix, n_dense):
    out = {}
    dense_i = 0
    i = 0
    while dense_i < n_dense and i < 10 * n_dense + 10:
        k = f"{prefix}.mlp_layers.{i}.weight"
        if k in sd:
            out[f"Dense_{dense_i}"] = {
                "kernel": np.asarray(sd[k]).T,
                "bias": np.asarray(sd[f"{prefix}.mlp_layers.{i}.bias"]),
            }
            dense_i += 1
        i += 1
    return out


def import_reference_checkpoint(model_name: str, path: str) -> Dict[str, Any]:
    """Load a reference ``.pth`` checkpoint file and convert its
    state_dict (requires torch to unpickle)."""
    import torch

    try:
        # safe path first: tensors-only unpickling, no code execution
        ckpt = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        # legacy reference checkpoints pickle whole Config objects; this
        # fallback executes pickled code, so it is only appropriate for
        # checkpoints the user trained themselves / trusts
        ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt["state_dict"] if "state_dict" in ckpt else ckpt
    return import_state_dict(
        model_name, {k: v.numpy() for k, v in sd.items()}
    )
