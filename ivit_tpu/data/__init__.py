from .datasets import ImageFolder, Cifar100, SyntheticDataset, build_dataset
from .loader import DataLoader, RepeatAugSampler, build_dataloaders
from .transforms import train_transform, eval_transform

__all__ = [
    "ImageFolder",
    "Cifar100",
    "SyntheticDataset",
    "build_dataset",
    "DataLoader",
    "RepeatAugSampler",
    "build_dataloaders",
    "train_transform",
    "eval_transform",
]
