from oovrec_tpu.inductive.spec import InductiveSpec
from oovrec_tpu.inductive.mapper import RandomOOVMapper
from oovrec_tpu.inductive.transform import OOVSimulator
from oovrec_tpu.inductive.factory import build_embedder_state
from oovrec_tpu.inductive.hashes import hash_ids

__all__ = [
    "InductiveSpec", "RandomOOVMapper", "OOVSimulator",
    "build_embedder_state", "hash_ids",
]
