"""Host-side PIL augmentations (no torchvision dependency).

Covers the reference's torchvision transform stack: RandomResizedCrop,
flip, ColorJitter, grayscale, GaussianBlur/Solarization PIL ops
(``utils.py:36-68``), RandomErasing, and the LAFS paired multi-crop
transform (``lafs_train.py:790-886``) that emits each crop as a
(clean, augmented) PAIR sharing the same geometric crop — the
landmark-consistent augmentation at the heart of LAFS.
"""

from __future__ import annotations

import math
import random
from dataclasses import dataclass, field
from typing import List, Tuple

import numpy as np
from PIL import Image, ImageFilter, ImageOps


def random_resized_crop(
    img: Image.Image,
    size: int,
    scale: Tuple[float, float] = (0.08, 1.0),
    ratio: Tuple[float, float] = (3 / 4, 4 / 3),
) -> Image.Image:
    """torchvision RandomResizedCrop semantics, bicubic resize."""
    w, h = img.size
    area = w * h
    for _ in range(10):
        target_area = area * random.uniform(*scale)
        log_ratio = (math.log(ratio[0]), math.log(ratio[1]))
        aspect = math.exp(random.uniform(*log_ratio))
        cw = int(round(math.sqrt(target_area * aspect)))
        ch = int(round(math.sqrt(target_area / aspect)))
        if 0 < cw <= w and 0 < ch <= h:
            x = random.randint(0, w - cw)
            y = random.randint(0, h - ch)
            return img.resize((size, size), Image.BICUBIC,
                              box=(x, y, x + cw, y + ch))
    # fallback: center crop
    in_ratio = w / h
    if in_ratio < ratio[0]:
        cw, ch = w, int(round(w / ratio[0]))
    elif in_ratio > ratio[1]:
        cw, ch = int(round(h * ratio[1])), h
    else:
        cw, ch = w, h
    x, y = (w - cw) // 2, (h - ch) // 2
    return img.resize((size, size), Image.BICUBIC, box=(x, y, x + cw, y + ch))


def color_jitter(
    img: Image.Image,
    brightness: float = 0.4,
    contrast: float = 0.4,
    saturation: float = 0.2,
    hue: float = 0.1,
) -> Image.Image:
    """torchvision ColorJitter: each factor uniform in [1-v, 1+v], random
    op order; hue shift in [-h, h] via HSV rotation."""
    from PIL import ImageEnhance

    ops = []
    if brightness > 0:
        f = random.uniform(max(0, 1 - brightness), 1 + brightness)
        ops.append(lambda im: ImageEnhance.Brightness(im).enhance(f))
    if contrast > 0:
        f2 = random.uniform(max(0, 1 - contrast), 1 + contrast)
        ops.append(lambda im: ImageEnhance.Contrast(im).enhance(f2))
    if saturation > 0:
        f3 = random.uniform(max(0, 1 - saturation), 1 + saturation)
        ops.append(lambda im: ImageEnhance.Color(im).enhance(f3))
    if hue > 0:
        shift = random.uniform(-hue, hue)

        def hue_op(im, shift=shift):
            hsv = np.array(im.convert("HSV"), dtype=np.int16)
            hsv[..., 0] = (hsv[..., 0] + int(shift * 255)) % 256
            return Image.fromarray(hsv.astype(np.uint8), "HSV").convert("RGB")

        ops.append(hue_op)
    random.shuffle(ops)
    for op in ops:
        img = op(img)
    return img


class GaussianBlur:
    """PIL gaussian blur with random radius (reference ``utils.py:36-53``)."""

    def __init__(self, p: float = 0.5, radius_min: float = 0.1, radius_max: float = 2.0):
        self.p, self.radius_min, self.radius_max = p, radius_min, radius_max

    def __call__(self, img: Image.Image) -> Image.Image:
        if random.random() > self.p:
            return img
        return img.filter(
            ImageFilter.GaussianBlur(random.uniform(self.radius_min, self.radius_max))
        )


class Solarization:
    """Reference ``utils.py:56-68``."""

    def __init__(self, p: float = 0.2):
        self.p = p

    def __call__(self, img: Image.Image) -> Image.Image:
        return ImageOps.solarize(img) if random.random() < self.p else img


def random_grayscale(img: Image.Image, p: float = 0.2) -> Image.Image:
    if random.random() < p:
        return img.convert("L").convert("RGB")
    return img


def random_horizontal_flip(img: Image.Image, p: float = 0.5) -> Image.Image:
    return img.transpose(Image.FLIP_LEFT_RIGHT) if random.random() < p else img


def random_erasing(
    arr: np.ndarray,
    p: float = 0.5,
    scale: Tuple[float, float] = (0.02, 0.1),
    ratio: Tuple[float, float] = (0.3, 3.3),
) -> np.ndarray:
    """torchvision RandomErasing (value=0) on an HWC array
    (``image_iter.py:218``)."""
    if random.random() > p:
        return arr
    h, w = arr.shape[:2]
    area = h * w
    for _ in range(10):
        target = area * random.uniform(*scale)
        aspect = math.exp(random.uniform(math.log(ratio[0]), math.log(ratio[1])))
        eh = int(round(math.sqrt(target * aspect)))
        ew = int(round(math.sqrt(target / aspect)))
        if eh < h and ew < w:
            y = random.randint(0, h - eh)
            x = random.randint(0, w - ew)
            arr = arr.copy()
            arr[y : y + eh, x : x + ew] = 0
            return arr
    return arr


def to_normalized_array(img: Image.Image, mean=0.5, std=0.5) -> np.ndarray:
    """ToTensor + Normalize((.5,.5,.5),(.5,.5,.5)) → float32 HWC in [-1,1]
    (the SSL convention, ``lafs_train.py:800-804``)."""
    arr = np.asarray(img, dtype=np.float32) / 255.0
    return (arr - mean) / std


def _jitter_gray(img: Image.Image) -> Image.Image:
    """flip_and_color_jitter minus the flip (``lafs_train.py:792-798``):
    ColorJitter(.4,.4,.2,.1) w.p. 0.8 + grayscale w.p. 0.2."""
    if random.random() < 0.8:
        img = color_jitter(img, 0.4, 0.4, 0.2, 0.1)
    return random_grayscale(img, 0.2)


@dataclass
class LAFSMultiCrop:
    """The LAFS paired multi-crop augmentation (``lafs_train.py:790-886``).

    Per sample emits ``4 + 2*local_crops_number`` float32 HWC arrays:
      [glo1_clean, glo1_aug, glo2_clean, glo2_aug,
       loc1_clean, loc1_aug, ..., locN_clean, locN_aug]
    Each (clean, aug) pair shares one geometric RandomResizedCrop+flip; the
    clean copy is normalize-only (feeds the landmark CNN), the aug copy gets
    photometric noise (jitter/blur[/solarize]) and is what gets patch-cropped.
    NOTE the reference uses global scale and 112px for LOCAL crops too
    (``lafs_train.py:852-858``).
    """

    global_crops_scale: Tuple[float, float] = (0.4, 1.0)
    local_crops_scale: Tuple[float, float] = (0.05, 0.4)  # kept for config parity
    local_crops_number: int = 8
    size: int = 112

    def __call__(self, img: Image.Image) -> List[np.ndarray]:
        crops: List[np.ndarray] = []

        def emit(geo: Image.Image, blur_p: float, solarize_p: float):
            crops.append(to_normalized_array(geo))
            aug = _jitter_gray(geo)
            aug = GaussianBlur(blur_p)(aug)
            if solarize_p > 0:
                aug = Solarization(solarize_p)(aug)
            crops.append(to_normalized_array(aug))

        geo1 = random_horizontal_flip(
            random_resized_crop(img, self.size, self.global_crops_scale)
        )
        emit(geo1, blur_p=1.0, solarize_p=0.0)
        geo2 = random_horizontal_flip(
            random_resized_crop(img, self.size, self.global_crops_scale)
        )
        emit(geo2, blur_p=0.1, solarize_p=0.2)
        for _ in range(self.local_crops_number):
            geo = random_horizontal_flip(
                random_resized_crop(img, self.size, self.global_crops_scale)
            )
            emit(geo, blur_p=0.5, solarize_p=0.0)
        return crops


#: ImageNet statistics used by the reference's VANILLA DINO transform only
#: (``lafs_train.py:754-756``); the LAFS transform normalizes to [-1, 1].
#: Must match ops.augment_device.IMAGENET_MEAN/STD (the eval-side twin —
#: this module stays jax-free for data-worker processes; pinned by test).
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


@dataclass
class DataAugmentationDINO:
    """Vanilla (pixel-patch) DINO multi-crop (``lafs_train.py:743-788``):
    2 global ``size``-px crops + N local ``local_size``-px crops, UNPAIRED
    (no clean/aug split — nothing consumes clean views without the landmark
    CNN). ImageNet normalization, per the reference. Used by the
    ``--arch vit_*`` / overlap / mobile_dino SSL paths; the landmark-token
    path uses :class:`LAFSMultiCrop`.

    Per sample emits ``2 + local_crops_number`` float32 HWC arrays:
    ``[global1, global2, local1, ..., localN]``.
    """

    global_crops_scale: Tuple[float, float] = (0.4, 1.0)
    local_crops_scale: Tuple[float, float] = (0.05, 0.4)
    local_crops_number: int = 8
    size: int = 112
    local_size: int = 48

    def _emit(self, img: Image.Image, size: int, scale, blur_p: float,
              solarize_p: float) -> np.ndarray:
        # reference order: RandomResizedCrop → flip → jitter/gray → blur
        # [→ solarize] → normalize (lafs_train.py:743-780)
        geo = random_horizontal_flip(random_resized_crop(img, size, scale))
        aug = _jitter_gray(geo)
        aug = GaussianBlur(blur_p)(aug)
        if solarize_p > 0:
            aug = Solarization(solarize_p)(aug)
        return to_normalized_array(aug, IMAGENET_MEAN, IMAGENET_STD)

    def __call__(self, img: Image.Image) -> List[np.ndarray]:
        crops = [
            self._emit(img, self.size, self.global_crops_scale, 1.0, 0.0),
            self._emit(img, self.size, self.global_crops_scale, 0.1, 0.2),
        ]
        for _ in range(self.local_crops_number):
            crops.append(
                self._emit(img, self.local_size, self.local_crops_scale, 0.5, 0.0)
            )
        return crops


@dataclass
class SupervisedAugment:
    """Supervised train-time augmentation (``image_iter.py:187-362``):
    optional mirror + face RandAugment + RandomResizedCrop(0.9-1.0) +
    ColorJitter + RandomErasing. Input/output: uint8 HWC RGB.

    The ``FaceDataset_adaaug`` variant (``image_iter.py:366-401``; its
    ada_aug Augmenter import is commented out in the reference, so the only
    LIVE difference is ColorJitter(0.5, 0.5, 0.5, hue=0) with no crop/
    erasing) is the :meth:`adaaug` preset.
    """

    rand_mirror: bool = True
    rand_au: bool = True
    random_resizecrop: bool = True
    config_str: str = "rand-m1-mstd0.5-inc1"
    size: int = 112
    jitter: tuple = (0.1, 0.1, 0.1, 0.1)  # brightness/contrast/saturation/hue
    erasing: bool = True
    _ra: object = field(default=None, repr=False)

    crop_and_erase: bool = True  # adaaug's trans is jitter-only

    # syn-aug degradation stage (``FaceDataset_syn_aug``'s live trans,
    # ``image_iter.py:584-604``): random JPEG re-compression, gaussian
    # blur, down→up-sampling, grayscale — each with its own probability,
    # applied between the crop and the color jitter.
    degrade: bool = False
    jpeg_p: float = 0.05
    blur_p: float = 0.05
    downup_p: float = 0.01
    gray_p: float = 0.01

    @classmethod
    def adaaug(cls, size: int = 112, **kw) -> "SupervisedAugment":
        """``FaceDataset_adaaug``'s live pipeline (``image_iter.py:389-399``)."""
        return cls(
            size=size, jitter=(0.5, 0.5, 0.5, 0.0), crop_and_erase=False, **kw
        )

    @classmethod
    def syn(cls, size: int = 112, **kw) -> "SupervisedAugment":
        """``FaceDataset_syn_aug``'s live pipeline (``image_iter.py:584-604``):
        RandomResizedCrop(0.9-1.0) + flip + JPEG-compress(p=.05) +
        GaussianBlur(p=.05) + down-up-sample(p=.01) +
        ColorJitter(.15,.3,.1,.1) + grayscale(p=.01); no RandAugment or
        erasing by default (``image_iter.py:554`` defaults)."""
        kw.setdefault("rand_au", False)
        kw.setdefault("erasing", False)
        return cls(
            size=size, jitter=(0.15, 0.3, 0.1, 0.1), degrade=True, **kw
        )

    def __post_init__(self):
        if self.rand_au:
            from .rand_augment import rand_augment_transform

            self._ra = rand_augment_transform(
                self.config_str, {"translate_const": 117}
            )

    def __call__(self, arr: np.ndarray) -> np.ndarray:
        img = Image.fromarray(arr)
        if self.rand_mirror and random.randint(0, 1) == 1:
            img = img.transpose(Image.FLIP_LEFT_RIGHT)
        if self.rand_au:
            img = self._ra(img)
        if self.random_resizecrop:
            # the reference gates the whole trans Compose on this flag;
            # its CONTENT varies by dataset class (crop+jitter+erase vs
            # adaaug's jitter-only)
            if self.crop_and_erase:
                img = random_resized_crop(img, self.size, scale=(0.9, 1.0))
            if self.degrade:
                # syn-aug degradations, reference order + probabilities
                # (image_iter.py:593-601)
                from .degrade import random_down_upsample, random_jpeg_compression

                arr2 = np.asarray(img)
                if random.random() < self.jpeg_p:
                    arr2 = random_jpeg_compression(arr2)
                img = Image.fromarray(arr2)
                img = GaussianBlur(p=self.blur_p)(img)
                img = Image.fromarray(
                    random_down_upsample(np.asarray(img), p=self.downup_p)
                )
            if any(self.jitter):
                img = color_jitter(img, *self.jitter)
            if self.degrade:
                img = random_grayscale(img, p=self.gray_p)
            out = np.asarray(img)
            if self.crop_and_erase and self.erasing:
                out = random_erasing(out, p=0.5, scale=(0.02, 0.1))
            return out
        return np.asarray(img)
