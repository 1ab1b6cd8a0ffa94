from .coco import CocoDataset
from .pipeline import (WeakAugment, StrongAugment, make_sup_batch,
                       make_unsup_batch)

__all__ = ["CocoDataset", "WeakAugment", "StrongAugment", "make_sup_batch",
           "make_unsup_batch"]
