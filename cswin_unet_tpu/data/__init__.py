from .datasets import SynapseDataset
from .transforms import RandomGenerator, random_rot_flip, random_rotate
from .loader import DataLoader, device_prefetch
from .synthetic import make_synthetic_dataset

__all__ = [
    "SynapseDataset",
    "RandomGenerator",
    "random_rot_flip",
    "random_rotate",
    "DataLoader",
    "device_prefetch",
    "make_synthetic_dataset",
]
