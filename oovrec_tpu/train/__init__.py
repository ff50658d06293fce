from oovrec_tpu.train.trainer import Trainer
from oovrec_tpu.train.hyper_tuning import HyperTuning
from oovrec_tpu.train.early_stopping import early_stopping
from oovrec_tpu.train.optimizers import build_optimizer

__all__ = ["Trainer", "HyperTuning", "early_stopping", "build_optimizer"]
