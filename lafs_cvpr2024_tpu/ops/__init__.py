from .fused_mlp import fused_mlp
from .patch_gather import patch_gather, patch_gather_mosaic, patch_gather_jit
from .patchify import patchify, unfold_overlap, standard_grid_landmarks
from .schedules import (
    cosine_scheduler,
    teacher_temp_schedule,
    warmup_cosine_lr,
    dino_lr_scaling,
    supervised_lr_scaling,
)
from .mixup import MixupConfig, mixup_cutmix, one_hot_smooth
from .augment_device import (
    color_jitter_batch,
    gaussian_blur_batch,
    lafs_multicrop_device,
    random_flip_batch,
    random_grayscale_batch,
    random_resized_crop_batch,
    solarize_batch,
)

__all__ = [
    "fused_mlp",
    "patch_gather",
    "patch_gather_mosaic",
    "patch_gather_jit",
    "patchify",
    "unfold_overlap",
    "standard_grid_landmarks",
    "cosine_scheduler",
    "teacher_temp_schedule",
    "warmup_cosine_lr",
    "dino_lr_scaling",
    "supervised_lr_scaling",
    "MixupConfig",
    "mixup_cutmix",
    "one_hot_smooth",
    "color_jitter_batch",
    "gaussian_blur_batch",
    "lafs_multicrop_device",
    "random_flip_batch",
    "random_grayscale_batch",
    "random_resized_crop_batch",
    "solarize_batch",
]
