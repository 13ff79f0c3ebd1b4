"""Data layer: NIfTI I/O, datasets, host transforms, device augmentation,
batching/prefetch."""
from .nifti import NiftiImage, read_nifti, write_nifti
from .datasets import (SegDataSetBrains, SegDataSetMindBoggle,
                       SegDataSetOAIZIB, SegDataSetOASIS, RegDataSetBrains,
                       RegDataSetMindBoggle, RegDataSetOAIZIB,
                       RegDataSetOASIS, get_reg_dataset, get_seg_dataset)
from .loader import DataLoader, endless
from .transforms import (BalancedRandomCrop, BilateralFilter, Compose,
                         CropVolume, IdentityTransform, LeftToRight,
                         Normalization, PadVolume, Partition, RandomCrop,
                         Resample, SegmentationLabelFilter, VolumeToArray)
from . import augment

__all__ = [
    "NiftiImage", "read_nifti", "write_nifti",
    "SegDataSetBrains", "SegDataSetMindBoggle", "SegDataSetOAIZIB",
    "SegDataSetOASIS", "RegDataSetBrains", "RegDataSetMindBoggle",
    "RegDataSetOAIZIB", "RegDataSetOASIS", "get_reg_dataset",
    "get_seg_dataset", "DataLoader", "endless",
    "BalancedRandomCrop", "BilateralFilter", "Compose", "CropVolume",
    "IdentityTransform", "LeftToRight", "Normalization", "PadVolume",
    "Partition", "RandomCrop", "Resample", "SegmentationLabelFilter",
    "VolumeToArray", "augment",
]
