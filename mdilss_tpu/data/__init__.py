from .class_weights import CLASS_WEIGHTS, compute_class_weights
from .colorize import colorize, colormap, colormap_cityscapes
from .loader import Loader, SyntheticSource
from .sources import (
    DATASET_NUM_CLASSES,
    bdd100k_index,
    cityscapes_index,
    idd_index,
    make_source,
)
from .transforms import augment_batch, decode_pair, prepare_batch

__all__ = [
    "CLASS_WEIGHTS",
    "compute_class_weights",
    "colorize",
    "colormap",
    "colormap_cityscapes",
    "Loader",
    "SyntheticSource",
    "DATASET_NUM_CLASSES",
    "bdd100k_index",
    "cityscapes_index",
    "idd_index",
    "make_source",
    "augment_batch",
    "decode_pair",
    "prepare_batch",
]
