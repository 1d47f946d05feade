"""Host data layer: COCO annotation index, instance/image DB builders,
threaded host loaders, and the native C++ loader bindings.

The device side of the pipeline (augmentation, target generation) lives in
ops/ and runs inside the jitted train step; this package only produces
uint8 pixel batches plus joint metadata (SURVEY.md sections 2.2, 3.5)."""

from . import native_loader
from .classifier_dataset import ImageFolderDataModule
from .coco import COCO_KPT_SIGMAS, CocoAnnotations
from .pipeline import HostLoader, collate, pad_batch
from .pis_dataset import SBPPISDataModule
from .sbp_dataset import SBPCOCODataModule, load_sbp_instance_db
from .spm_dataset import SPMCOCODataModule, load_spm_image_db

__all__ = [
    "COCO_KPT_SIGMAS",
    "CocoAnnotations",
    "HostLoader",
    "ImageFolderDataModule",
    "SBPCOCODataModule",
    "SBPPISDataModule",
    "SPMCOCODataModule",
    "collate",
    "load_sbp_instance_db",
    "load_spm_image_db",
    "native_loader",
    "pad_batch",
]
