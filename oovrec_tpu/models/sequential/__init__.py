from oovrec_tpu.models.sequential.gru4rec import GRU4Rec
from oovrec_tpu.models.sequential.sasrec import SASRec

__all__ = ["GRU4Rec", "SASRec"]
