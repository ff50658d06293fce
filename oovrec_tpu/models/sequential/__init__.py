from oovrec_tpu.models.sequential.gru4rec import GRU4Rec
from oovrec_tpu.models.sequential.sasrec import SASRec
from oovrec_tpu.models.sequential.more import FPMC, NARM, STAMP
from oovrec_tpu.models.sequential.bert4rec import BERT4Rec

__all__ = ["GRU4Rec", "SASRec", "NARM", "STAMP", "FPMC", "BERT4Rec"]
