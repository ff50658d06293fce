"""Model registry (`recbole/utils/utils.py:55` get_model analog)."""

from oovrec_tpu.models.base import MODEL_REGISTRY, EmbedderMLP, GeneralRecommender
from oovrec_tpu.models.bpr import BPR
from oovrec_tpu.models.directau import DirectAU


def get_model_class(name: str):
    # imported lazily to avoid cycles for heavier model families
    if name not in MODEL_REGISTRY:
        try:
            if name in ("WideDeep", "DCNV2", "xDeepFM", "LR", "FM", "DeepFM",
                        "DCN", "AutoInt", "FNN", "PNN", "AFM", "FwFM", "FFM",
                        "DSSM", "FiGNN", "EulerNet", "NFM", "KD_DAGFM"):
                import oovrec_tpu.models.context_aware  # noqa: F401
            elif name in ("Pop", "ItemKNN", "Random", "NeuMF", "LightGCN",
                          "EASE", "MultiVAE", "MultiDAE", "CDAE", "DMF",
                          "SimpleX", "NGCF", "SGL", "FISM", "NAIS", "ENMF",
                          "LINE", "ConvNCF", "SLIMElastic", "RecVAE", "ADMMSLIM",
                          "SpectralCF", "GCMC", "NCEPLRec", "NNCF", "DGCF",
                          "NCL", "MacridVAE", "RaCT"):
                import oovrec_tpu.models.general  # noqa: F401
            elif name in ("GRU4Rec", "SASRec", "NARM", "STAMP", "FPMC",
                          "BERT4Rec", "Caser", "NextItNet", "DIN", "DIEN",
                          "HGN", "FOSSIL", "TransRec", "SHAN", "NPE", "HRM",
                          "CORE", "SRGNN", "GCSAN", "LightSANs", "SINE",
                          "GRU4RecF", "SASRecF", "FDSA",
                          "RepeatNet", "GRU4RecKG", "KSR", "S3Rec"):
                import oovrec_tpu.models.sequential  # noqa: F401
            elif name in ("CKE", "CFKG", "KGAT", "KGCN", "MKR", "KTUP",
                          "KGNNLS", "RippleNet", "KGIN", "MCCLK"):
                import oovrec_tpu.models.knowledge  # noqa: F401
        except ImportError:
            pass
    if name not in MODEL_REGISTRY:
        raise ValueError(f"Model [{name}] is not implemented")
    return MODEL_REGISTRY[name]


__all__ = [
    "BPR",
    "DirectAU",
    "EmbedderMLP",
    "GeneralRecommender",
    "MODEL_REGISTRY",
    "get_model_class",
]
