from .transforms import data_transform, inverse_data_transform, logit_transform
from .datasets import get_dataset, SyntheticDataset, Cifar10Dataset, ImageFolderDataset
from .loader import iterate_batches

__all__ = [
    "data_transform",
    "inverse_data_transform",
    "logit_transform",
    "get_dataset",
    "SyntheticDataset",
    "Cifar10Dataset",
    "ImageFolderDataset",
    "iterate_batches",
]
