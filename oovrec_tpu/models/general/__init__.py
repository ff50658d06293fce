from oovrec_tpu.models.general.pop import Pop, Random
from oovrec_tpu.models.general.itemknn import ItemKNN
from oovrec_tpu.models.general.neumf import NeuMF
from oovrec_tpu.models.general.lightgcn import LightGCN
from oovrec_tpu.models.general.more import EASE, MultiVAE
from oovrec_tpu.models.general.more2 import CDAE, DMF, MultiDAE, NGCF, SGL, SimpleX
from oovrec_tpu.models.general.more3 import (
    ConvNCF, ENMF, FISM, LINE, NAIS, SLIMElastic,
)
from oovrec_tpu.models.general.more4 import (
    ADMMSLIM, GCMC, RecVAE, SpectralCF,
)
from oovrec_tpu.models.general.more5 import (
    DGCF, MacridVAE, NCEPLRec, NCL, NNCF,
)

from oovrec_tpu.models.general.ract import RaCT

__all__ = [
    "Pop", "Random", "ItemKNN", "NeuMF", "LightGCN", "EASE", "MultiVAE",
    "MultiDAE", "CDAE", "DMF", "SimpleX", "NGCF", "SGL",
    "FISM", "NAIS", "ENMF", "LINE", "ConvNCF", "SLIMElastic",
    "RecVAE", "ADMMSLIM", "SpectralCF", "GCMC",
    "NCEPLRec", "NNCF", "DGCF", "NCL", "MacridVAE", "RaCT",
]
