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
from .dataset import ContrastivePairSampler, FaceRecordDataset, decode_jpeg
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
    "ContrastivePairSampler",
    "FaceRecordDataset",
    "decode_jpeg",
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
