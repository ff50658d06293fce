"""Worker process for the LIVE multi-process tests (test_multiprocess.py).

Each worker is a real OS process with its own JAX runtime: 4 virtual CPU
devices, wired into one 8-device distributed system via
`jax.distributed.initialize` — the CPU-faithful model of a 2-host TPU pod
slice. Scenarios exercise the production code paths the reference runs
under torch DDP (`recbole/data/dataloader/abstract_dataloader.py:59-66`
DistributedSampler, `trainer.py:644-666` metric map-reduce,
`trainer.py:301` rank-0 checkpointing).

Usage: python tests/mp_worker.py <pid> <nprocs> <port> <scenario> <outdir>
"""

import json
import os
import sys

if __name__ == "__main__":
    # only as a SCRIPT: the parent test imports base_cfg from this module
    # and must keep its own 8-device XLA_FLAGS
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# script-by-path puts tests/ on sys.path, not the repo root — add it
# (never REPLACE PYTHONPATH in this environment: the axon sitecustomize
# rides on it)
sys.path.insert(0, REPO)
ASSETS = os.path.join(REPO, "tests", "assets")


def base_cfg(outdir: str, pid: int) -> dict:
    return {
        "model": "BPR",
        "dataset": "toy",
        "data_path": ASSETS,
        "load_col": {"inter": ["user_id", "item_id", "rating", "timestamp"]},
        "epochs": 3,
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
        "seed": 2020,
        # rank-0-only write is asserted via per-process dirs: only
        # process 0's directory may contain the checkpoint afterwards
        "checkpoint_dir": os.path.join(outdir, f"ckpt_{pid}"),
    }


def scenario_loader(outdir: str, pid: int) -> dict:
    """Per-process data sharding: dump the REAL rows this process's
    production train loader emits (triples identify interactions)."""
    from oovrec_tpu.config import Config
    from oovrec_tpu.data.utils import create_dataset, data_preparation

    config = Config(config_dict=base_cfg(outdir, pid))
    ds = create_dataset(config)
    train_loader, _, _ = data_preparation(config, ds)
    rows = []
    for batch in train_loader:
        keep = batch["weight"] > 0
        for u, i, t in zip(
            batch["user_id"][keep],
            batch["item_id"][keep],
            batch["timestamp"][keep],
        ):
            rows.append([int(u), int(i), float(t)])
    return {
        "rows": rows,
        "process_index": train_loader.process_index,
        "process_count": train_loader.process_count,
        "n_batches": len(train_loader),
        "local_step": train_loader.local_step,
    }


def scenario_train(outdir: str, pid: int) -> dict:
    """Production run with mesh {'data': 8} spanning both processes and
    device epochs on: losses/metrics must match the single-process
    8-device run of the identical config; only rank 0 writes."""
    from oovrec_tpu.cli.quick_start import run

    cfg = base_cfg(outdir, pid)
    cfg.update({"mesh": {"data": 8}, "device_epoch": True})
    res = run(config_dict=cfg, saved=True)
    trainer = res["trainer"]
    return {
        "losses": {
            str(k): float(v) for k, v in trainer.train_loss_dict.items()
        },
        "test_result": {
            k: float(v) for k, v in (res["test_result"] or {}).items()
        },
        "best_valid": {
            k: float(v) for k, v in (res["best_valid_result"] or {}).items()
        },
        "ckpt_exists": os.path.isfile(trainer.saved_model_file),
        "ckpt_path": trainer.saved_model_file,
    }


def scenario_eval(outdir: str, pid: int, mode: str = "full") -> dict:
    """Sharded evaluation of a FIXED checkpoint (written beforehand by
    the parent's single-process run): per-process user shards +
    map_reduce_metrics must reproduce the single-process metrics.
    `mode='uni3'` exercises the sharded NegSampleEvalBatcher (the paper
    protocol's uni250 path) instead of full-sort."""
    from oovrec_tpu.cli.quick_start import load_data_and_model

    ckpt = os.path.join(outdir, "shared.ckpt")
    over = {
        "mesh": {"data": 8},
        "checkpoint_dir": os.path.join(outdir, f"ckpt_{pid}"),
    }
    if mode != "full":
        over["eval_args"] = {
            "split": {"RS": [0.8, 0.1, 0.1]}, "order": "TO",
            "group_by": "user", "mode": mode,
        }
    loaded = load_data_and_model(ckpt, config_overrides=over)
    result = loaded.trainer.evaluate(
        loaded.test_loader, load_best_model=False
    )
    return {
        "test_result": {k: float(v) for k, v in result.items()},
        "eval_users_local": len(loaded.test_loader.uid_list),
    }


def scenario_train_model_axis(outdir: str, pid: int) -> dict:
    """Model-axis sharding ACROSS processes (round-4 VERDICT #6): mesh
    {'data': 2, 'model': 4} over 2 processes × 4 devices with row-sharded
    OOV bucket tables (> row_shard_threshold). Every model-axis shard of
    a table is replicated over the process-spanning 'data' axis, so table
    state + gradient psums cross the host boundary each step — the
    multi-host large-vocabulary topology. Trains + evaluates + round-trips
    a SHARED checkpoint (rank 0 writes, both ranks resume)."""
    from oovrec_tpu.cli.quick_start import run

    cfg = base_cfg(outdir, pid)
    cfg.update({
        "dataset": "toy-ind",
        "load_col": {
            "inter": ["user_id", "item_id", "rating", "timestamp",
                      "is_new"],
            "user": ["user_id", "age", "gender"],
            "item": ["item_id", "price", "category"],
        },
        "inductive_mapper": "random",
        "add_oov_buckets": True,
        "n_user_oov_buckets": 8,
        "n_item_oov_buckets": 8,
        "train_oov": True,
        "oov_only_epoch": True,
        "oov_train_ratio": 0.8,
        "mesh": {"data": 2, "model": 4},
        "row_shard_threshold": 4,   # 8-row bucket tables row-shard
        "device_epoch": True,
        # shared dir: rank 0 writes, BOTH ranks resume the same file
        "checkpoint_dir": os.path.join(outdir, "ckpt_shared"),
    })
    res = run(config_dict=cfg, saved=True)
    trainer = res["trainer"]
    tbl = trainer.variables["params"]["item_oov_buckets"]["embedding"]
    shard_procs = {d.process_index for d in tbl.sharding.device_set}
    # checkpoint round-trip on BOTH ranks (mesh re-commit is collective)
    state = trainer.resume_checkpoint(trainer.saved_model_file)
    return {
        "losses": {
            str(k): float(v) for k, v in trainer.train_loss_dict.items()
        },
        "test_result": {
            k: float(v) for k, v in (res["test_result"] or {}).items()
        },
        "table_sharded": not tbl.sharding.is_fully_replicated,
        "table_span_processes": sorted(shard_procs),
        "mesh_shape": dict(trainer.mesh.shape),
        "resumed_model": state["config"]["model"],
        "ckpt_exists": os.path.isfile(trainer.saved_model_file),
    }


def main() -> None:
    pid, nprocs, port, scenario, outdir = (
        int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]),
        sys.argv[4], sys.argv[5],
    )
    if os.environ.get("OOVREC_MP_DEBUG"):
        import faulthandler

        faulthandler.dump_traceback_later(
            int(os.environ["OOVREC_MP_DEBUG"]), exit=True
        )
    import jax

    jax.config.update("jax_platforms", "cpu")
    from oovrec_tpu.parallel.distributed import initialize_distributed

    info = initialize_distributed(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nprocs,
        process_id=pid,
    )
    assert info["process_count"] == nprocs, info
    assert info["global_device_count"] == 4 * nprocs, info

    out = {"info": info}
    if scenario == "eval_uni":
        out.update(scenario_eval(outdir, pid, mode="uni3"))
    else:
        out.update(
            {"loader": scenario_loader,
             "train": scenario_train,
             "train_model": scenario_train_model_axis,
             "eval": scenario_eval}[scenario](outdir, pid)
        )
    with open(os.path.join(outdir, f"worker_{scenario}_{pid}.json"), "w") as f:
        json.dump(out, f)


if __name__ == "__main__":
    main()
