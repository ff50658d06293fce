from oovrec_tpu.eval.collector import Collector, Evaluator, calculate_valid_score
from oovrec_tpu.eval.runner import EvalRunner
from oovrec_tpu.eval.inductive import InductiveEvaluator

__all__ = [
    "Collector", "Evaluator", "EvalRunner", "InductiveEvaluator",
    "calculate_valid_score",
]
