from oovrec_tpu.models.knowledge.cke import CKE
from oovrec_tpu.models.knowledge.cfkg import CFKG

__all__ = ["CKE", "CFKG"]
