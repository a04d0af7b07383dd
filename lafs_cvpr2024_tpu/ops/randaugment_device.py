"""Face RandAugment ON DEVICE — batched jnp ops fused into the train step.

TPU-native replacement for the host-side PIL RandAugment
(``data/rand_augment.py`` ↔ reference ``rand_aa_face.py``): the supervised
input pipeline becomes host-immune like the SSL fused-aug path (the 1-core
dry-run measured host PIL at ~5.8 ms/img — a multi-hundred-img step starves
the chip on thin hosts).

Semantics mirror the PIL ops (golden-tested, small interpolation/rounding
tolerances):
- geometric (Rotate/ShearX/ShearY/TranslateX/TranslateYRel): ONE shared
  bilinear affine warp with gray fill (PIL fillcolor=(128,128,128); the host
  op randomizes BILINEAR/BICUBIC per call — device uses bilinear, an equally
  arbitrary member of the same distribution).
- photometric: AutoContrast, Equalize (exact PIL integer LUT), Invert,
  Posterize, Color/Contrast/Brightness/Sharpness enhance blends.
- driver: per-IMAGE op choice (num_layers draws with replacement from the
  13-op face pool), apply-prob 0.5, magnitude ~ N(m, mstd) clipped to
  [0, 10] — timm RandAugment semantics (``rand_aa_face.py:628-672``).

All ops take/return float32 NHWC in [0, 1].
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

_FILL = 128.0 / 255.0
_MAX_LEVEL = 10.0


# ---------------------------------------------------------------------------
# shared affine warp
# ---------------------------------------------------------------------------

def affine_warp_batch(x: jnp.ndarray, coeffs: jnp.ndarray, fill: float = _FILL):
    """PIL-convention batched affine: output (xo, yo) samples input at
    ``(a·xo + b·yo + c, d·xo + e·yo + f)`` (pixel-center convention),
    bilinear with constant fill outside. coeffs: (B, 6) = (a, b, c, d, e, f).
    """
    b, h, w, c = x.shape
    yo, xo = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32),
        indexing="ij",
    )
    xo = xo + 0.5
    yo = yo + 0.5
    ca, cb, cc, cd, ce, cf = [coeffs[:, i].reshape(-1, 1, 1) for i in range(6)]
    xin = ca * xo + cb * yo + cc - 0.5
    yin = cd * xo + ce * yo + cf - 0.5
    x0 = jnp.floor(xin)
    y0 = jnp.floor(yin)
    tx = xin - x0
    ty = yin - y0
    bidx = jnp.arange(b)[:, None, None]
    out = jnp.zeros_like(x)
    # PIL edge semantics: out-of-range TAPS are clamped (edge replicate);
    # the fill color applies only where the sample point is fully outside
    # (both taps out on some axis)
    for dy in (0, 1):
        for dx in (0, 1):
            xi_c = jnp.clip(x0 + dx, 0, w - 1).astype(jnp.int32)
            yi_c = jnp.clip(y0 + dy, 0, h - 1).astype(jnp.int32)
            wgt = (tx if dx else 1.0 - tx) * (ty if dy else 1.0 - ty)
            out = out + wgt[..., None] * x[bidx, yi_c, xi_c]
    # PIL's bounds check uses the UNSHIFTED point: 0 <= xin+0.5 < size
    inside = (
        (xin >= -0.5) & (xin < w - 0.5) & (yin >= -0.5) & (yin < h - 0.5)
    )
    return jnp.where(inside[..., None], out, fill)


def rotate_coeffs(deg: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """PIL Image.rotate(angle) matrix: CCW rotation about the image center."""
    ang = -jnp.deg2rad(deg)
    cos, sin = jnp.cos(ang), jnp.sin(ang)
    cx, cy = w / 2.0, h / 2.0
    a, bb, d, e = cos, sin, -sin, cos
    cc = cx - (a * cx + bb * cy)
    ff = cy - (d * cx + e * cy)
    return jnp.stack([a, bb, cc, d, e, ff], axis=-1)


def shear_x_coeffs(f: jnp.ndarray) -> jnp.ndarray:
    one, zero = jnp.ones_like(f), jnp.zeros_like(f)
    return jnp.stack([one, f, zero, zero, one, zero], axis=-1)


def shear_y_coeffs(f: jnp.ndarray) -> jnp.ndarray:
    one, zero = jnp.ones_like(f), jnp.zeros_like(f)
    return jnp.stack([one, zero, zero, f, one, zero], axis=-1)


def translate_x_coeffs(px: jnp.ndarray) -> jnp.ndarray:
    one, zero = jnp.ones_like(px), jnp.zeros_like(px)
    return jnp.stack([one, zero, px, zero, one, zero], axis=-1)


def translate_y_coeffs(px: jnp.ndarray) -> jnp.ndarray:
    one, zero = jnp.ones_like(px), jnp.zeros_like(px)
    return jnp.stack([one, zero, zero, zero, one, px], axis=-1)


# ---------------------------------------------------------------------------
# photometric ops (x float in [0, 1]; factor is per-image (B,))
# ---------------------------------------------------------------------------

# numpy (not jnp): module import may happen inside an active jit trace (the
# trainers import lazily) and a staged module-level constant would leak
_LUMA = np.array([299.0, 587.0, 114.0], np.float32) / 1000.0  # PIL convert('L')


def _gray(x):
    return jnp.round(x @ _LUMA * 255.0) / 255.0  # PIL rounds L to uint8


def _blend(degenerate, x, factor):
    f = factor.reshape(-1, 1, 1, 1)
    return jnp.clip(degenerate + f * (x - degenerate), 0.0, 1.0)


def invert_op(x, _):
    return 1.0 - x


def brightness_op(x, factor):
    return _blend(jnp.zeros_like(x), x, factor)


def color_op(x, factor):
    return _blend(_gray(x)[..., None], x, factor)


def contrast_op(x, factor):
    # PIL: degenerate = solid image of int(mean(L) + 0.5)
    mean = jnp.floor(jnp.mean(_gray(x) * 255.0, axis=(1, 2)) + 0.5)
    mean = (mean / 255.0).reshape(-1, 1, 1, 1)
    return _blend(jnp.broadcast_to(mean, x.shape), x, factor)


def sharpness_op(x, factor):
    # PIL SMOOTH kernel, original pixels kept on the 1px border
    k = jnp.array([[1.0, 1.0, 1.0], [1.0, 5.0, 1.0], [1.0, 1.0, 1.0]]) / 13.0
    b, h, w, c = x.shape
    xt = x.transpose(0, 3, 1, 2).reshape(b * c, 1, h, w)
    sm = jax.lax.conv_general_dilated(
        xt, k[None, None], (1, 1), "SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    sm = sm.reshape(b, c, h, w).transpose(0, 2, 3, 1)
    border = jnp.zeros((h, w), bool).at[0, :].set(True).at[-1, :].set(True)
    border = border.at[:, 0].set(True).at[:, -1].set(True)
    degenerate = jnp.where(border[None, :, :, None], x, sm)
    return _blend(degenerate, x, factor)


def autocontrast_op(x, _):
    lo = x.min(axis=(1, 2), keepdims=True)
    hi = x.max(axis=(1, 2), keepdims=True)
    scale = jnp.where(hi > lo, 1.0 / (hi - lo), 1.0)
    off = jnp.where(hi > lo, lo, 0.0)
    return jnp.clip((x - off) * scale, 0.0, 1.0)


def posterize_op(x, bits):
    """bits: (B,) int in [0, 8]; keep the top ``bits`` bits (PIL posterize;
    bits >= 8 is identity — ``rand_augment.py:74-75``)."""
    v = jnp.round(x * 255.0).astype(jnp.int32)
    shift = jnp.clip(8 - bits.astype(jnp.int32), 0, 8).reshape(-1, 1, 1, 1)
    v = (v >> shift) << shift
    return v.astype(jnp.float32) / 255.0


def equalize_op(x, _):
    """Exact PIL ImageOps.equalize: per-channel integer LUT
    ``lut[i] = (step//2 + cumsum_{j<i} h[j]) // step`` with
    ``step = (n_pixels − h[last_occupied]) // 255``; identity when step==0
    or the channel has ≤1 occupied bin."""
    b, h, w, c = x.shape
    v = jnp.round(x * 255.0).astype(jnp.int32)
    flat = v.transpose(0, 3, 1, 2).reshape(b * c, h * w)

    def one_channel(px):
        hist = jnp.bincount(px, length=256)
        maxv = jnp.max(px)
        occupied = jnp.sum(hist > 0)
        step = (h * w - hist[maxv]) // 255
        cum = jnp.concatenate([jnp.zeros(1, hist.dtype), jnp.cumsum(hist)[:-1]])
        lut = jnp.clip((step // 2 + cum) // jnp.maximum(step, 1), 0, 255)
        identity = (occupied <= 1) | (step == 0)
        out = jnp.where(identity, px, lut[px])
        return out

    out = jax.vmap(one_channel)(flat)
    return (
        out.reshape(b, c, h, w).transpose(0, 2, 3, 1).astype(jnp.float32) / 255.0
    )


# ---------------------------------------------------------------------------
# RandAugment driver
# ---------------------------------------------------------------------------

# pool order mirrors FACE_RAND(_INCREASING)_TRANSFORMS (rand_augment.py):
# photometric 0-7, geometric 8-12 (one shared warp)
_PHOTOMETRIC = (
    autocontrast_op, equalize_op, invert_op, posterize_op,
    color_op, contrast_op, brightness_op, sharpness_op,
)
_N_OPS = 13
_GEO_BASE = 8  # ops >= this index are geometric


@dataclass(frozen=True)
class RandAugmentDeviceConfig:
    magnitude: float = 10.0
    magnitude_std: float = 0.0
    num_layers: int = 2
    increasing: bool = True
    prob: float = 0.5

    @classmethod
    def from_config_str(cls, config_str: str) -> "RandAugmentDeviceConfig":
        """Parse ``rand-m{N}[-n{L}][-mstd{S}][-inc1]`` (same grammar as the
        host ``rand_augment_transform``)."""
        magnitude, num_layers, mstd, inc = _MAX_LEVEL, 2, 0.0, False
        parts = config_str.split("-")
        assert parts[0] == "rand", config_str
        for cstr in parts[1:]:
            cs = re.split(r"(\d.*)", cstr)
            if len(cs) < 2:
                continue
            key, val = cs[:2]
            if key == "mstd":
                mstd = float(val)
            elif key == "inc":
                inc = bool(int(val))
            elif key == "m":
                magnitude = float(val)
            elif key == "n":
                num_layers = int(val)
        return cls(magnitude=magnitude, magnitude_std=mstd,
                   num_layers=num_layers, increasing=inc)


def _one_layer(key, x, cfg: RandAugmentDeviceConfig):
    b, h, w, _ = x.shape
    k_op, k_apply, k_mag, k_neg = jax.random.split(key, 4)
    op_idx = jax.random.randint(k_op, (b,), 0, _N_OPS)
    apply = jax.random.uniform(k_apply, (b,)) < cfg.prob
    mag = jnp.full((b,), cfg.magnitude)
    if cfg.magnitude_std > 0:
        mag = mag + cfg.magnitude_std * jax.random.normal(k_mag, (b,))
    mag = jnp.clip(mag, 0.0, _MAX_LEVEL)
    neg = jnp.where(jax.random.uniform(k_neg, (b,)) > 0.5, -1.0, 1.0)

    lvl = mag / _MAX_LEVEL
    if cfg.increasing:
        enhance = 1.0 + neg * lvl * 0.9
        bits = 4 - (lvl * 4.0).astype(jnp.int32)
    else:
        enhance = lvl * 1.8 + 0.1
        bits = (lvl * 4.0).astype(jnp.int32)

    # photometric branch outputs (each (B,H,W,C))
    factors = (None, None, None, bits, enhance, enhance, enhance, enhance)
    branches = [fn(x, fac) for fn, fac in zip(_PHOTOMETRIC, factors)]

    # geometric: select one affine per image, warp ONCE
    deg = neg * lvl * 30.0
    shear = neg * lvl * 0.3
    t_px = neg * lvl * 0.45
    geo = jnp.stack([
        rotate_coeffs(deg, h, w),
        shear_x_coeffs(shear),
        shear_y_coeffs(shear),
        translate_x_coeffs(t_px * w),
        translate_y_coeffs(t_px * h),
    ])  # (5, B, 6)
    geo_idx = jnp.clip(op_idx - _GEO_BASE, 0, 4)
    coeffs = jnp.take_along_axis(geo, geo_idx[None, :, None], axis=0)[0]
    branches.append(affine_warp_batch(x, coeffs))

    stack = jnp.stack(branches)  # (9, B, H, W, C)
    sel_idx = jnp.minimum(op_idx, _GEO_BASE)  # geometric ops share slot 8
    sel = stack[sel_idx, jnp.arange(b)]
    return jnp.where(apply[:, None, None, None], sel, x)


def rand_augment_batch(key, x: jnp.ndarray, cfg: RandAugmentDeviceConfig):
    """Apply ``cfg.num_layers`` per-image random ops (timm RandAugment).
    x: (B, H, W, C) float in [0, 1]."""
    for i in range(cfg.num_layers):
        x = _one_layer(jax.random.fold_in(key, i), x, cfg)
    return x


# ---------------------------------------------------------------------------
# full supervised pipeline on device
# ---------------------------------------------------------------------------

def random_erasing_batch(key, x, p=0.5, scale=(0.02, 0.1), ratio=(0.3, 3.3)):
    """torchvision RandomErasing (value=0), one box attempt per image (boxes
    at these scales always fit)."""
    b, h, w, _ = x.shape
    k_p, k_a, k_r, k_y, k_x = jax.random.split(key, 5)
    apply = jax.random.uniform(k_p, (b,)) < p
    area = h * w * jax.random.uniform(k_a, (b,), minval=scale[0], maxval=scale[1])
    aspect = jnp.exp(
        jax.random.uniform(k_r, (b,), minval=jnp.log(ratio[0]),
                           maxval=jnp.log(ratio[1]))
    )
    eh = jnp.clip(jnp.round(jnp.sqrt(area * aspect)), 1, h - 1)
    ew = jnp.clip(jnp.round(jnp.sqrt(area / aspect)), 1, w - 1)
    y0 = jnp.floor(jax.random.uniform(k_y, (b,)) * (h - eh))
    x0 = jnp.floor(jax.random.uniform(k_x, (b,)) * (w - ew))
    rows = jnp.arange(h)[None, :, None]
    cols = jnp.arange(w)[None, None, :]
    e = lambda a: a.reshape(-1, 1, 1)
    in_box = (
        (rows >= e(y0)) & (rows < e(y0 + eh))
        & (cols >= e(x0)) & (cols < e(x0 + ew))
        & apply[:, None, None]
    )
    return jnp.where(in_box[..., None], 0.0, x)


def supervised_augment_device(
    key,
    images_uint8: jnp.ndarray,
    out_size: int = 112,
    ra: RandAugmentDeviceConfig = RandAugmentDeviceConfig(
        magnitude=1.0, magnitude_std=0.5, increasing=True
    ),
    mirror: bool = True,
    crop_scale: Tuple[float, float] = (0.9, 1.0),
    jitter: Tuple[float, float, float, float] = (0.1, 0.1, 0.1, 0.1),
    erasing: bool = True,
    rand_au: bool = True,
    resize_crop: bool = True,
):
    """The full SupervisedAugment pipeline on device: mirror → RandAugment →
    RandomResizedCrop(0.9-1.0) → ColorJitter(0.1) → RandomErasing →
    x·2 − 1 (train normalization). Input (B, H, W, 3) uint8 RGB; output
    (B, S, S, 3) float32 in [−1, 1].

    ``rand_au=False, resize_crop=False`` is the reference README's
    "flip augmentation only" recipe (README.md:83-84: disable
    random_resizecrop and rand_au in FaceDataset) — crop/jitter/erasing
    are gated by ``resize_crop`` exactly like the host transform gates
    its Compose on ``random_resizecrop`` (image_iter.py:210-220)."""
    from .augment_device import (
        color_jitter_batch,
        random_flip_batch,
        random_resized_crop_batch,
    )

    if not resize_crop and images_uint8.shape[1] != out_size:
        raise ValueError(
            "resize_crop=False keeps the native frame size "
            f"{images_uint8.shape[1]}² but the model expects {out_size}² — "
            "pre-size the frames or enable resize_crop"
        )
    k_f, k_ra, k_rc, k_cj, k_er = jax.random.split(key, 5)
    x = images_uint8.astype(jnp.float32) / 255.0
    if mirror:
        x = random_flip_batch(k_f, x, p=0.5)
    if rand_au:
        x = rand_augment_batch(k_ra, x, ra)
    if resize_crop:
        x = jnp.clip(
            random_resized_crop_batch(k_rc, x, out_size, crop_scale), 0.0, 1.0
        )
        if any(jitter):
            x = color_jitter_batch(k_cj, x, *jitter)
        if erasing:
            x = random_erasing_batch(k_er, x)
    return x * 2.0 - 1.0
