"""Paper CLI driver — `python -m oovrec_tpu.cli.run --model=BPR --dataset=...`.

Equivalent of `src/run_recbole.py:39-266`:
  * `--key=value` args with type inference,
  * the paper's forced eval protocol per `model_eval_type`
    (`src/run_recbole.py:203-229`): retrieval → Recall/MRR/NDCG/Hit/
    Precision + valid MRR@20; ranking → AUC/RMSE + valid RMSE; both with
    split RS [0.88, 0.02, 0.1], order TO, mode uni250, topk [10,20],
    eval_batch 1e5, uniform 1-neg sampling,
  * per-dataset JSON config merge (`dataset_configs/<ds>.json`),
  * train → checkpoint (model + mapper/embedder state) → weight backup →
    test eval → optional inductive eval.

The GCS→NFS→local backup cascade (`src/run_recbole.py:117-166`) becomes a
local/NFS copy (no cloud egress in this environment); wandb mirroring is
gated on availability.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
from typing import Any, Dict

from oovrec_tpu.config import parse_cli_args


def apply_paper_protocol(args: Dict[str, Any]) -> Dict[str, Any]:
    """The eval-protocol overrides of `src/run_recbole.py:203-229`."""
    met = args.get("model_eval_type", "retrieval")
    if met == "retrieval":
        args["valid_metric"] = "MRR@20"
        args["metrics"] = ["Recall", "MRR", "NDCG", "Hit", "Precision"]
    elif met == "ranking":
        args["valid_metric"] = "RMSE"
        args["metrics"] = ["AUC", "RMSE"]
    else:
        raise NotImplementedError(f"Unknown model type: {met}")
    args["eval_args"] = {
        "split": {"RS": [0.88, 0.02, 0.1]},
        "group_by": None,
        "order": "TO",
        "mode": "uni250",
    }
    args["eval_batch_size"] = int(1e5)
    args["topk"] = [10, 20]
    neg = {
        "distribution": "uniform", "sample_num": 1, "alpha": 1.0,
        "dynamic": False, "candidate_num": 0,
    }
    args["train_neg_sample_args"] = dict(neg)
    args["oov_neg_sample_args"] = dict(neg)
    args["test_neg_sample_args"] = dict(neg)
    args["threshold"] = args.get("threshold")
    args["reproducibility"] = True
    return args


def merge_dataset_config(args: Dict[str, Any],
                         config_dir: str = "./dataset_configs") -> Dict[str, Any]:
    """`dataset_configs/<ds>.json` merge (`src/run_recbole.py:236-241`) —
    CLI args keep precedence."""
    path = os.path.join(config_dir, f"{args.get('dataset')}.json")
    if os.path.exists(path):
        print("Dataset config file found:", path)
        with open(path, "rb") as f:
            base = json.load(f)
        return {**base, **args}
    print("Dataset config file not found, using defaults...")
    return args


def _gcs_upload(bucket_name: str, dataset: str, paths) -> None:
    """GCS leg of the cascade (`src/run_recbole.py:120-133`): upload each
    weight file to `recsys-weights/<dataset>/<basename>` with an
    if-generation-match=0 precondition (never overwrite). Zero-egress
    builds fail fast here (no google-cloud-storage wheel / no network) and
    the cascade falls through to NFS — same behavior as the reference when
    GCS is unreachable."""
    from google.cloud import storage  # noqa: PLC0415 — optional dep

    bucket = storage.Client().bucket(bucket_name)
    for p in paths:
        if p and os.path.isfile(p):
            blob = bucket.blob(
                os.path.join("recsys-weights", dataset, os.path.basename(p))
            )
            blob.upload_from_filename(p, if_generation_match=0)


def backup_weights(paths, config=None, nfs_path=None, logger=None,
                   wandb_logger=None) -> list:
    """Weight backup cascade (`src/run_recbole.py:117-166`): GCS (when
    `gcs_bucket_name` is configured) → NFS (`nfs_backup_path`) → local
    `saved/<dataset>/` only if neither succeeded; a wandb alert fires when
    every leg fails. Returns the list of media that succeeded."""
    config = config or {}
    warn = logger.warning if logger else print
    media: list = []
    paths = [p for p in paths if p and os.path.isfile(p)]

    if config.get("gcs_bucket_name"):
        try:
            _gcs_upload(config["gcs_bucket_name"],
                        str(config.get("dataset", "")), paths)
            media.append("gcs")
        except Exception as e:  # noqa: BLE001 — any leg failure falls through
            warn(f"Failed to upload to GCS: {e}")

    if nfs_path is None:
        nfs_path = config.get("nfs_backup_path")
    if nfs_path:
        try:
            os.makedirs(nfs_path, exist_ok=True)
            for p in paths:
                shutil.copy2(p, nfs_path)
            media.append("nfs")
        except OSError as e:
            warn(f"Failed to write to NFS: {e}")

    if not media:
        try:
            backup_dir = os.path.join("saved", str(config.get("dataset", "")))
            os.makedirs(backup_dir, exist_ok=True)
            for p in paths:
                if os.path.abspath(os.path.dirname(p)) != os.path.abspath(
                    backup_dir
                ):
                    shutil.copy2(p, backup_dir)
            media.append("local")
        except OSError as e:
            warn(f"Failed to write to local: {e}")

    if wandb_logger is not None:
        for m in media:
            wandb_logger.log_raw({"file_backup_medium": m}, commit=False)
        if not media:
            wandb_logger.alert(
                title="Backup Failure",
                text="Failed to backup to any medium!",
            )
    if not media:
        warn("Failed to backup to any medium!")
    return media


def main(argv=None) -> Dict[str, Any]:
    from oovrec_tpu.cli.quick_start import run
    from oovrec_tpu.cli.inductive_eval import perform_inductive_eval

    args = parse_cli_args(argv if argv is not None else sys.argv[1:])
    if args.get("eval_only"):
        return eval_only(args)
    if "model" not in args or "dataset" not in args:
        raise SystemExit("usage: run.py --model=<M> --dataset=<D> [--k=v ...]")

    args = apply_paper_protocol(args)
    args = merge_dataset_config(args)

    res = run(
        model=args["model"], dataset=args["dataset"], config_dict=args,
        saved=True,
    )
    trainer = res["trainer"]
    backup_weights(
        [trainer.saved_model_file],
        config=res["config"],
        nfs_path=res["config"]["nfs_backup_path"],
        logger=trainer.logger,
        wandb_logger=trainer.wandblogger,
    )

    if args.get("inductive_eval"):
        print("Performing inductive evaluation...")
        ind_results = perform_inductive_eval(
            res["dataset"], trainer.saved_model_file, config=res["config"]
        )
        res["inductive_results"] = ind_results

    if args.get("results_json"):
        payload = {
            "model": args["model"],
            "dataset": args["dataset"],
            "seed": res["config"]["seed"],
            "test_result": {
                k: float(v) for k, v in (res.get("test_result") or {}).items()
            },
            "inductive": {
                s: {k: float(v) for k, v in r.items()}
                for s, r in (res.get("inductive_results") or {}).items()
            },
        }
        with open(args["results_json"], "w") as f:
            json.dump(payload, f, indent=1)
    return res


def eval_only(args: Dict[str, Any]) -> Dict[str, Any]:
    """`--eval_only=<checkpoint.pth>`: restore a saved run in one call
    (quick_start.load_data_and_model) and reproduce its test evaluation
    — optionally the 7-slice inductive eval too — without training.
    Remaining `--k=v` args override the checkpoint's stored config."""
    from oovrec_tpu.cli.inductive_eval import perform_inductive_eval
    from oovrec_tpu.cli.quick_start import load_data_and_model

    path = args.pop("eval_only")
    inductive = args.pop("inductive_eval", False)
    results_json = args.pop("results_json", None)
    for k in ("model", "dataset"):  # identity comes from the checkpoint
        args.pop(k, None)
    loaded = load_data_and_model(path, config_overrides=args or None)
    trainer = loaded.trainer
    test_result = trainer.evaluate(loaded.test_loader, load_best_model=False)
    trainer.logger.info(f"test result: {test_result}")
    res: Dict[str, Any] = {
        "test_result": test_result,
        "config": loaded.config,
        "dataset": loaded.dataset,
        "trainer": trainer,
    }
    if inductive:
        print("Performing inductive evaluation...")
        res["inductive_results"] = perform_inductive_eval(
            loaded.dataset, path, config=loaded.config
        )
    if results_json:
        payload = {
            "model": loaded.config["model"],
            "dataset": loaded.config["dataset"],
            "seed": loaded.config["seed"],
            "test_result": {k: float(v) for k, v in test_result.items()},
            "inductive": {
                s: {k: float(v) for k, v in r.items()}
                for s, r in (res.get("inductive_results") or {}).items()
            },
        }
        with open(results_json, "w") as f:
            json.dump(payload, f, indent=1)
    return res


if __name__ == "__main__":
    main()
