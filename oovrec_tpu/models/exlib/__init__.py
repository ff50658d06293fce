from oovrec_tpu.models.exlib.decision_tree import LightGBMModel, XGBoostModel

__all__ = ["XGBoostModel", "LightGBMModel"]
