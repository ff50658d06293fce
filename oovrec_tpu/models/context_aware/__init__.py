from oovrec_tpu.models.context_aware.widedeep import WideDeep
from oovrec_tpu.models.context_aware.dcnv2 import DCNV2
from oovrec_tpu.models.context_aware.xdeepfm import xDeepFM
from oovrec_tpu.models.context_aware.basic import LR, FM, DeepFM
from oovrec_tpu.models.context_aware.more import AFM, AutoInt, DCN, FNN, FwFM, PNN
from oovrec_tpu.models.context_aware.ffm import FFM
from oovrec_tpu.models.context_aware.more2 import DSSM, EulerNet, FiGNN

from oovrec_tpu.models.context_aware.more3 import KD_DAGFM, NFM

__all__ = [
    "WideDeep", "DCNV2", "xDeepFM", "LR", "FM", "DeepFM",
    "DCN", "AutoInt", "FNN", "PNN", "AFM", "FwFM", "FFM",
    "DSSM", "FiGNN", "EulerNet", "NFM", "KD_DAGFM",
]
