from ccnet_tpu.data.preprocess import (
    CITYSCAPES_MEAN_BGR,
    device_augment_batch,
    finish_u8_crops,
    host_augment,
    host_augment_u8,
)
from ccnet_tpu.data.cityscapes import (
    CITYSCAPES_ID_TO_TRAINID,
    CityscapesDataset,
    trainid_lut,
    trainid_to_labelid,
)
from ccnet_tpu.data.lists import generate_cityscapes_lists, generate_voc_lists
from ccnet_tpu.data.voc import VOCDataset
from ccnet_tpu.data.loader import (
    AugmentingDataset,
    CachedDataset,
    DataLoader,
    SyntheticDataset,
    U8CropDataset,
    device_prefetch,
)
from ccnet_tpu.data.palette import cityscapes_palette, save_indexed_png

__all__ = [
    "CITYSCAPES_MEAN_BGR",
    "device_augment_batch",
    "host_augment",
    "CITYSCAPES_ID_TO_TRAINID",
    "generate_cityscapes_lists",
    "generate_voc_lists",
    "CityscapesDataset",
    "trainid_lut",
    "trainid_to_labelid",
    "VOCDataset",
    "AugmentingDataset",
    "CachedDataset",
    "DataLoader",
    "SyntheticDataset",
    "U8CropDataset",
    "device_prefetch",
    "finish_u8_crops",
    "host_augment_u8",
    "cityscapes_palette",
    "save_indexed_png",
]
