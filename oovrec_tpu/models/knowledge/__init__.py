from oovrec_tpu.models.knowledge.cke import CKE
from oovrec_tpu.models.knowledge.cfkg import CFKG
from oovrec_tpu.models.knowledge.kgat import KGAT
from oovrec_tpu.models.knowledge.more import KGCN, MKR
from oovrec_tpu.models.knowledge.more2 import KGNNLS, KTUP, RippleNet
from oovrec_tpu.models.knowledge.more3 import KGIN, MCCLK

__all__ = ["CKE", "CFKG", "KGAT", "KGCN", "MKR", "KTUP", "KGNNLS", "RippleNet", "KGIN", "MCCLK"]
