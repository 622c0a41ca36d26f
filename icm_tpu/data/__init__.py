from .image_folder import ImageFolder, ImageFolderCzigzag, batch_iterator
from .transforms import (
    random_crop,
    center_crop,
    random_hflip,
    resize_min_max_side,
)
from .coco import CocoDetectionDataset, coco_collate
from .csv_dataset import CSVDataset
from .openimages import OpenImagesDataset
from .segmentation import COCOSegmentation

__all__ = [
    "ImageFolder",
    "ImageFolderCzigzag",
    "batch_iterator",
    "random_crop",
    "center_crop",
    "random_hflip",
    "resize_min_max_side",
    "CocoDetectionDataset",
    "CSVDataset",
    "OpenImagesDataset",
    "coco_collate",
    "COCOSegmentation",
]
