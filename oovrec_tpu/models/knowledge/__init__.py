from oovrec_tpu.models.knowledge.cke import CKE
from oovrec_tpu.models.knowledge.cfkg import CFKG
from oovrec_tpu.models.knowledge.kgat import KGAT

__all__ = ["CKE", "CFKG", "KGAT"]
