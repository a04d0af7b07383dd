from .recordio import (
    IRHeader,
    IndexedRecordIOReader,
    IndexedRecordIOWriter,
    RecBuilder,
    pack,
    parse_face_index,
    read_property,
    unpack,
)
from .dataset import (
    AttributeFaceDataset,
    ContrastivePairSampler,
    FaceFolderDataset,
    FaceRecordDataset,
    decode_jpeg,
)
from .degrade import (
    affine_transform,
    random_affine_params,
    random_down_upsample,
    random_jpeg_compression,
)
from .augment import (
    GaussianBlur,
    LAFSMultiCrop,
    Solarization,
    SupervisedAugment,
    color_jitter,
    random_erasing,
    random_resized_crop,
    to_normalized_array,
)
from .rand_augment import RandAugment, rand_augment_transform
from .pipeline import DataPipeline, EpochSampler

__all__ = [
    "IRHeader",
    "IndexedRecordIOReader",
    "IndexedRecordIOWriter",
    "RecBuilder",
    "pack",
    "parse_face_index",
    "read_property",
    "unpack",
    "AttributeFaceDataset",
    "ContrastivePairSampler",
    "FaceFolderDataset",
    "FaceRecordDataset",
    "decode_jpeg",
    "affine_transform",
    "random_affine_params",
    "random_down_upsample",
    "random_jpeg_compression",
    "GaussianBlur",
    "LAFSMultiCrop",
    "Solarization",
    "SupervisedAugment",
    "color_jitter",
    "random_erasing",
    "random_resized_crop",
    "to_normalized_array",
    "RandAugment",
    "rand_augment_transform",
    "DataPipeline",
    "EpochSampler",
]
