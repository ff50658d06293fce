"""Hyper-tuning CLI (`RecBole/run_hyper.py` analog).

    python -m oovrec_tpu.cli.run_hyper --model=BPR --dataset=ml-1m \
        --params_file=bpr.hyper --algo=bayes --max_evals=50

algo: exhaustive | random | bayes (TPE-style sequential search, the
reference's hyperopt default — `recbole/trainer/hyper_tuning.py:157,408`).
"""

from __future__ import annotations

import sys

from oovrec_tpu.config import parse_cli_args
from oovrec_tpu.train.hyper_tuning import HyperTuning


def main(argv=None):
    from oovrec_tpu.cli.quick_start import objective_function

    args = parse_cli_args(argv if argv is not None else sys.argv[1:])
    params_file = args.pop("params_file", None)
    algo = args.pop("algo", "exhaustive")
    max_evals = int(args.pop("max_evals", 100))
    output_file = args.pop("output_file", "hyper_result.txt")

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
