"""Cross-evaluation: OUR 7-slice inductive eval on REFERENCE-trained weights.

Discriminates training-quality from eval-machinery differences behind the
lsh parity gap (reference inductive overall ≈0.22 vs ours ≈0.56):

  * if our eval of the reference checkpoint lands near OUR number, the
    reference's inductive EVAL is losing quality;
  * if it lands near the REFERENCE number, their training produced weaker
    buckets/planes and our training regime is the difference.

Uses the newest `saved/synth-ind/BPR-*.pth` produced by
tools/run_parity_matrix.py's lsh runs (planes + buckets + tables all ride
the reference state_dict).

  python tools/cross_eval_ref_ckpt.py --seed=2020
"""

from __future__ import annotations

import glob
import json
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
))


def main():
    from run_reference_parity import install_shims

    install_shims()  # lets torch.load unpickle the reference Config
    import torch
    from flax import serialization

    from oovrec_tpu.cli.run import apply_paper_protocol
    from oovrec_tpu.cli.inductive_eval import perform_inductive_eval
    from oovrec_tpu.cli.quick_start import build_model_and_state
    from oovrec_tpu.config import Config
    from oovrec_tpu.config.configurator import parse_cli_args
    from oovrec_tpu.data.utils import create_dataset, data_preparation
    from oovrec_tpu.train.trainer import Trainer
    from oovrec_tpu.utils.torch_import import import_reference_checkpoint

    over = parse_cli_args(sys.argv[1:])
    ckpt_path = over.get("ckpt")
    if not ckpt_path:
        paths = sorted(glob.glob("saved/synth-ind/BPR-*.pth"),
                       key=os.path.getmtime)
        assert paths, "no reference checkpoints under saved/synth-ind/"
        ckpt_path = paths[-1]
    print("reference checkpoint:", ckpt_path)

    cfg_dict = apply_paper_protocol({
        "model": "BPR",
        "dataset": "synth-ind",
        "epochs": 15,
        "seed": int(over.get("seed", 2020)),
        "load_col": {
            "inter": ["user_id", "item_id", "timestamp", "is_new"],
            "user": ["user_id", "age", "group", "user_vector"],
            "item": ["item_id", "price", "category", "item_vector"],
        },
        "inductive_embedder": "lsh",
        "add_oov_buckets": True,
        "n_user_oov_buckets": 200,
        "n_item_oov_buckets": 200,
        "train_oov": True,
        "oov_train_ratio": 0.3,
    })
    cfg = Config(config_dict=cfg_dict)
    ds = create_dataset(cfg)
    _, _, test_loader = data_preparation(cfg, ds)

    model, variables, estate = build_model_and_state(cfg, ds)
    imported = import_reference_checkpoint("BPR", ckpt_path)
    params = dict(variables["params"])
    params.update({k: v for k, v in imported.items()})
    variables = dict(variables, params=params)

    sd = torch.load(ckpt_path, map_location="cpu",
                    weights_only=False)["state_dict"]
    estate = dict(estate)
    estate["user_planes"] = np.asarray(
        sd["inductive_embedder.user_lsh.uniform_planes.0"], np.float32
    )
    estate["item_planes"] = np.asarray(
        sd["inductive_embedder.item_lsh.uniform_planes.0"], np.float32
    )

    trainer = Trainer(cfg, model, variables, estate)
    trans = trainer.evaluate(test_loader)
    print("our transductive eval of ref weights:",
          {k: round(float(v), 4) for k, v in trans.items()
           if "20" in k and ("recall" in k or "mrr" in k)})

    ckpt = {
        "config": cfg.as_dict(),
        "params": serialization.to_bytes(variables["params"]),
        "estate": estate,
    }
    tmp = "/tmp/cross_ref_ckpt.pkl"
    with open(tmp, "wb") as f:
        pickle.dump(ckpt, f)
    res = perform_inductive_eval(ds, tmp, config=cfg)
    out = {
        s: {k: round(float(v), 4) for k, v in r.items() if "@20" in k}
        for s, r in res.items()
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
