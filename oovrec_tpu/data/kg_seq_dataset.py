"""Sequential + knowledge combined dataset (reference
`recbole/data/dataset/kg_seq_dataset.py`): the cooperative MRO gives
sequential augmentation/splitting over a corpus whose entity space is
item-aligned from the `.kg`/`.link` side files."""

from __future__ import annotations

from oovrec_tpu.data.kg_dataset import KnowledgeBasedDataset
from oovrec_tpu.data.sequential import SequentialDataset


class KGSeqDataset(SequentialDataset, KnowledgeBasedDataset):
    """MRO: SequentialDataset → KnowledgeBasedDataset → Dataset. The KG
    loader hooks (`_load_data`, `_remap_id_all`) run inside the base
    pipeline; `build()` is the sequential leave-one-out."""
