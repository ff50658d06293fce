"""Hyper-tuning CLI (`RecBole/run_hyper.py` analog).

    python -m oovrec_tpu.cli.run_hyper --model=BPR --dataset=ml-1m \
        --params_file=bpr.hyper --algo=bayes --max_evals=50

algo: exhaustive | random | bayes (TPE-style sequential search, the
reference's hyperopt default — `recbole/trainer/hyper_tuning.py:157,408`).

`--tool=ray` delegates trial scheduling to ray.tune with the reference's
ASHA scheduler (`RecBole/run_hyper.py:45-107`). The build image ships no
ray wheel and no egress — the path fast-fails with a clear message there
(same contract as the GCS backup leg) and runs for real where ray is
installed.
"""

from __future__ import annotations

import sys

from oovrec_tpu.config import parse_cli_args
from oovrec_tpu.train.hyper_tuning import HyperTuning


def ray_tune(args, params_file, max_evals, metric="recall@10"):
    """ray.tune delegation (`RecBole/run_hyper.py:45-107` semantics):
    param-file lines become tune search-space entries, trials run the
    same objective under an ASHA scheduler."""
    try:
        import ray  # noqa: PLC0415 — optional dep
        from ray import tune
        from ray.tune.schedulers import ASHAScheduler
    except ImportError as e:
        raise SystemExit(
            "--tool=ray requires the ray wheel (not shipped in this "
            "zero-egress build image): pip install 'ray[tune]'. The "
            "built-in exhaustive/random/bayes algos cover the same "
            f"search capability without it. ({e})"
        )
    import math

    from oovrec_tpu.cli.quick_start import objective_function
    from oovrec_tpu.train.hyper_tuning import Parameter

    ray.init(ignore_reinit_error=True)
    space = {}
    with open(params_file) as f:
        for line in f:
            if not line.strip():
                continue
            p = Parameter.parse(line)
            if p.kind == "choice":
                space[p.name] = tune.choice(list(p.spec))
            elif p.kind == "uniform":
                space[p.name] = tune.uniform(*p.spec)
            elif p.kind == "quniform":
                space[p.name] = tune.quniform(*p.spec)
            elif p.kind == "loguniform":
                lo, hi = p.spec
                space[p.name] = tune.loguniform(
                    math.exp(lo), math.exp(hi)
                )

    def trainable(config):
        res = objective_function(config_dict={**args, **config},
                                 saved=False)
        tune.report(
            {**res["best_valid_result"],
             "best_valid_score": res["best_valid_score"]}
        )

    scheduler = ASHAScheduler(
        metric=metric, mode="max", max_t=10, grace_period=1,
        reduction_factor=2,
    )
    return tune.run(
        trainable, config=space, num_samples=max_evals,
        scheduler=scheduler, local_dir="./ray_log",
    )


def main(argv=None):
    from oovrec_tpu.cli.quick_start import objective_function

    args = parse_cli_args(argv if argv is not None else sys.argv[1:])
    params_file = args.pop("params_file", None)
    algo = args.pop("algo", "exhaustive")
    max_evals = int(args.pop("max_evals", 100))
    output_file = args.pop("output_file", "hyper_result.txt")
    tool = args.pop("tool", "builtin")
    if str(tool).lower() == "ray":
        return ray_tune(args, params_file, max_evals)

    tpe_kwargs = {
        k: t(args.pop(k))
        for k, t in (("n_startup", int), ("gamma", float),
                     ("n_candidates", int))
        if k in args
    }
    ht = HyperTuning(
        objective_function,
        algo=algo,
        params_file=params_file,
        fixed_config_dict=args,
        max_evals=max_evals,
        seed=int(args.get("seed", 2020)),
        **tpe_kwargs,
    )
    ht.run()
    ht.export_result(output_file)
    print("best params:", ht.best_params)
    print("best valid score:", ht.best_score)
    print("test result of best run:", ht.best_test_result)
    return ht


if __name__ == "__main__":
    main()
