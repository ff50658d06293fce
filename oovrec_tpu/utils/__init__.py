from oovrec_tpu.utils.enums import (
    EvaluatorType,
    FeatureSource,
    FeatureType,
    InputType,
    ModelType,
)
from oovrec_tpu.utils.seeding import init_seed
from oovrec_tpu.utils.logging import init_logger, set_color

__all__ = [
    "EvaluatorType",
    "FeatureSource",
    "FeatureType",
    "InputType",
    "ModelType",
    "init_seed",
    "init_logger",
    "set_color",
]
