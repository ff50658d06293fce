from oovrec_tpu.models.sequential.gru4rec import GRU4Rec
from oovrec_tpu.models.sequential.sasrec import SASRec
from oovrec_tpu.models.sequential.more import FPMC, NARM, STAMP
from oovrec_tpu.models.sequential.bert4rec import BERT4Rec
from oovrec_tpu.models.sequential.convs import Caser, NextItNet
from oovrec_tpu.models.sequential.din import DIEN, DIN
from oovrec_tpu.models.sequential.more2 import FOSSIL, HGN, TransRec
from oovrec_tpu.models.sequential.more3 import CORE, HRM, NPE, SHAN
from oovrec_tpu.models.sequential.more4 import GCSAN, SINE, SRGNN, LightSANs
from oovrec_tpu.models.sequential.featseq import FDSA, GRU4RecF, SASRecF
from oovrec_tpu.models.sequential.more5 import KSR, GRU4RecKG, RepeatNet
from oovrec_tpu.models.sequential.s3rec import S3Rec

__all__ = ["GRU4Rec", "SASRec", "NARM", "STAMP", "FPMC", "BERT4Rec",
           "Caser", "NextItNet", "DIN", "DIEN", "HGN", "FOSSIL", "TransRec", "SHAN", "NPE", "HRM", "CORE",
           "SRGNN", "GCSAN", "LightSANs", "SINE", "GRU4RecF", "SASRecF", "FDSA", "RepeatNet", "GRU4RecKG", "KSR", "S3Rec"]
