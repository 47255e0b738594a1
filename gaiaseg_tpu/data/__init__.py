from .datasets import (ADE20KDataset, CityscapesDataset, CustomDataset,
                       SyntheticDataset, build_dataset,
                       CITYSCAPES_CLASSES, CITYSCAPES_PALETTE)
from .loader import BatchLoader
from .metrics import SegEvaluator, confusion_matrix, iou_from_confusion
from .packed import PackedDataset, pack_dataset
from .transforms import (augment_batch, fused_resize_crop, normalize,
                         photometric_distortion, prepare_eval_batch,
                         random_flip, random_scale_crop)

__all__ = [
    "CustomDataset", "CityscapesDataset", "ADE20KDataset",
    "SyntheticDataset", "build_dataset", "BatchLoader", "PackedDataset",
    "pack_dataset", "SegEvaluator",
    "confusion_matrix", "iou_from_confusion", "augment_batch",
    "fused_resize_crop", "random_scale_crop", "random_flip",
    "photometric_distortion", "normalize", "prepare_eval_batch",
    "CITYSCAPES_CLASSES", "CITYSCAPES_PALETTE",
]
