from .transforms import load_frame, cast_num_frames, resize_center_crop
from .datasets import SthV2Dataset, BridgeDataset, EpicKitchensDataset, build_dataset
from .loader import DataLoader

__all__ = [
    "load_frame",
    "cast_num_frames",
    "resize_center_crop",
    "SthV2Dataset",
    "BridgeDataset",
    "EpicKitchensDataset",
    "build_dataset",
    "DataLoader",
]
