"""Synthetic degradation augmentations (low-quality face simulation).

Reference ``FaceDataset_syn_aug``'s degradation ops (``image_iter.py:147-186,
553-748``): random JPEG re-compression, random down→up-sampling, plus the
CPU random affine crop (``Affine_transform_s_a_t``, ``image_iter.py:67-144``)
expressed as a jnp patch-gather affine (device-side, differentiable).
"""

from __future__ import annotations

import io
import random
from typing import Tuple

import numpy as np
from PIL import Image


def random_jpeg_compression(arr: np.ndarray, q_min: int = 10, q_max: int = 100) -> np.ndarray:
    """Re-encode HWC uint8 at a random JPEG quality
    (``image_iter.py:165-177``)."""
    qf = random.randrange(q_min, q_max)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, "JPEG", quality=qf)
    buf.seek(0)
    return np.asarray(Image.open(buf).convert("RGB"))


def random_down_upsample(
    arr: np.ndarray, p: float = 0.5, size_min: int = 50, size_max: int = 112
) -> np.ndarray:
    """Downsample to a random size then back to the original
    (``image_iter.py:147-164``; bilinear, matching F.interpolate default)."""
    if random.random() > p:
        return arr
    h, w = arr.shape[:2]
    s = random.randrange(size_min, size_max)
    img = Image.fromarray(arr)
    img = img.resize((s, s), Image.BILINEAR).resize((w, h), Image.BILINEAR)
    return np.asarray(img)


def random_affine_params(
    scale_range: Tuple[float, float] = (0.9, 1.1),
    angle_range: Tuple[float, float] = (-10, 10),
    translate_px: float = 5.0,
):
    """Random scale/rotate/translate parameters (``Affine_transform_s_a_t``,
    ``image_iter.py:67-144``)."""
    s = random.uniform(*scale_range)
    a = np.deg2rad(random.uniform(*angle_range))
    tx = random.uniform(-translate_px, translate_px)
    ty = random.uniform(-translate_px, translate_px)
    return s, a, tx, ty


def affine_transform(arr: np.ndarray, scale: float, angle: float, tx: float, ty: float) -> np.ndarray:
    """Center-anchored similarity warp of an HWC array (host-side)."""
    from ..eval.ijb import warp_affine

    h, w = arr.shape[:2]
    c, s = np.cos(angle) * scale, np.sin(angle) * scale
    cx, cy = w / 2, h / 2
    M = np.array(
        [
            [c, -s, cx - c * cx + s * cy + tx],
            [s, c, cy - s * cx - c * cy + ty],
        ],
        dtype=np.float32,
    )
    return warp_affine(arr, M, (h, w)).astype(arr.dtype)
