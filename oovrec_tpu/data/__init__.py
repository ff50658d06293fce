from oovrec_tpu.data.dataset import Dataset, DatasetSplit
from oovrec_tpu.data.inductive_dataset import InductiveDataset
from oovrec_tpu.data.utils import create_dataset, data_preparation

__all__ = [
    "Dataset", "DatasetSplit", "InductiveDataset",
    "create_dataset", "data_preparation",
]
