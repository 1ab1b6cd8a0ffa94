from .coco import CocoDataset
from .pipeline import make_sup_batch, make_unsup_batch

__all__ = ["CocoDataset", "make_sup_batch", "make_unsup_batch"]
