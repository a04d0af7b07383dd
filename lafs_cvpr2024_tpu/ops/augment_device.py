"""Device-side LAFS multi-crop augmentation — the whole 20-crop transform as
ONE jitted op on the raw uint8 batch.

The reference feeds each GPU from 6 CPU worker processes running PIL
transforms (``lafs_train.py:186-193`` + ``DataAugmentation_LAFS``,
``:790-886``). A TPU chip consuming 230+ imgs/s of 20-crop samples would
need dozens of host cores; instead the host ships ONE uint8 image per sample
and the augmentation pipeline — random resized crop (bicubic, as two
interpolation-matrix matmuls on the MXU), flip, color jitter, grayscale,
gaussian blur (two banded-matrix matmuls), solarize, normalize — runs fused
on device.

Faithful to ``DataAugmentation_LAFS`` with documented deviations:
- crop sampling is single-try with clamping (torchvision retries 10×; the
  acceptance region at scale (0.4, 1) makes the distributions near-identical)
- color-jitter sub-ops apply in fixed order (torchvision shuffles; the ops
  nearly commute)
- hue shift uses the exact HSV rotation, matching PIL within quantization.

Each (clean, aug) pair shares its geometric crop+flip — the
landmark-consistency property that defines LAFS.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# geometric: random resized crop via interpolation-matrix matmuls
# ---------------------------------------------------------------------------

#: ImageNet statistics — the reference's VANILLA DINO transform only
#: (``lafs_train.py:751-753``): checkpoints trained via ``--arch vit_*``
#: expect this convention at eval time, NOT half/unit.
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)

#: valid ``scale_uint8`` conventions, in CLI-flag order
INPUT_SCALES = ("half", "unit", "imagenet")


def scale_uint8(x, mode: str = "unit"):
    """Device-side uint8 image → float in the model's input convention.

    THE one definition of the load-bearing train/eval scaling convention
    (a mismatch silently degrades accuracy): ``"unit"`` → [-1, 1]
    (x/255·2−1, the training convention, ``lafs_train.py`` ToTensor+
    Normalize(0.5, 0.5)); ``"half"`` → [-0.5, 0.5] (x/255−0.5, the
    reference eval convention, ``IJB_evaluation.py:444``); ``"imagenet"``
    → per-channel (x/255−mean)/std (channel-LAST), the vanilla-DINO
    convention (``lafs_train.py:751-753``) for ``--arch vit_*``
    checkpoints. Accepts uint8 or float storage, numpy or jax
    (operator-only arithmetic keeps the input's host/device placement);
    always computes in fp32.
    """
    x = x.astype(jnp.float32)  # np.float32 is the same dtype object
    if mode == "unit":
        return x / 255.0 * 2.0 - 1.0
    if mode == "half":
        return x / 255.0 - 0.5
    if mode == "imagenet":
        import numpy as np

        mean = np.asarray(IMAGENET_MEAN, np.float32)
        std = np.asarray(IMAGENET_STD, np.float32)
        return (x / 255.0 - mean) / std
    raise ValueError(
        f"scale_uint8: unknown mode {mode!r} ({'|'.join(INPUT_SCALES)})"
    )


def unscale_to_uint8(x, mode: str = "unit"):
    """Invert :func:`scale_uint8` back to uint8 — for visualizing tensors
    that already live in a model's input convention."""
    import numpy as np

    x = np.asarray(x, np.float32)
    if mode == "unit":
        x = (x + 1.0) * 127.5
    elif mode == "half":
        x = (x + 0.5) * 255.0
    elif mode == "imagenet":
        mean = np.asarray(IMAGENET_MEAN, np.float32)
        std = np.asarray(IMAGENET_STD, np.float32)
        x = (x * std + mean) * 255.0
    else:
        raise ValueError(
            f"unscale_to_uint8: unknown mode {mode!r} "
            f"({'|'.join(INPUT_SCALES)})"
        )
    return np.clip(np.round(x), 0, 255).astype(np.uint8)


def _cubic_weights(t: jnp.ndarray) -> jnp.ndarray:
    """Catmull-Rom/Keys cubic (a=-0.5, PIL/torch BICUBIC): weights for taps
    at offsets (-1, 0, 1, 2) given fractional position t (...,)."""
    a = -0.5
    t1 = t + 1.0
    t2 = 1.0 - t
    t3 = 2.0 - t
    w0 = a * t1 ** 3 - 5 * a * t1 ** 2 + 8 * a * t1 - 4 * a
    w1 = (a + 2) * t ** 3 - (a + 3) * t ** 2 + 1
    w2 = (a + 2) * t2 ** 3 - (a + 3) * t2 ** 2 + 1
    w3 = a * t3 ** 3 - 5 * a * t3 ** 2 + 8 * a * t3 - 4 * a
    return jnp.stack([w0, w1, w2, w3], axis=-1)


def _resize_matrix(starts, sizes, in_size: int, out_size: int):
    """Per-image bicubic resampling matrix (B, out_size, in_size):
    out[o] = Σ_i M[o, i]·in[i] for the crop [start, start+size) → out_size.
    Edge taps clamp (PIL replicates edges inside the crop box)."""
    o = jnp.arange(out_size, dtype=jnp.float32)
    # source coordinate of output pixel center (align like PIL resize)
    src = starts[:, None] + (o[None, :] + 0.5) * (sizes[:, None] / out_size) - 0.5
    i0 = jnp.floor(src)
    t = src - i0
    w = _cubic_weights(t)                                # (B, out, 4)
    grid = jnp.arange(in_size, dtype=jnp.int32)
    m = jnp.zeros((starts.shape[0], out_size, in_size), jnp.float32)
    for k in range(4):
        idx = jnp.clip(i0 + (k - 1), 0, in_size - 1).astype(jnp.int32)
        hit = (grid[None, None, :] == idx[..., None]).astype(jnp.float32)
        m = m + hit * w[..., k : k + 1]
    return m


def random_resized_crop_batch(
    key,
    images: jnp.ndarray,
    out_size: int,
    scale: Tuple[float, float] = (0.4, 1.0),
    ratio: Tuple[float, float] = (3 / 4, 4 / 3),
):
    """Batched bicubic RandomResizedCrop: (B, H, W, C) float → (B, S, S, C).

    Returns (crops, flip_mask is NOT applied here — see lafs_multicrop)."""
    b, h, w, c = images.shape
    k1, k2, k3, k4 = jax.random.split(key, 4)
    area = h * w * jax.random.uniform(k1, (b,), minval=scale[0], maxval=scale[1])
    log_r = jax.random.uniform(
        k2, (b,), minval=jnp.log(ratio[0]), maxval=jnp.log(ratio[1])
    )
    aspect = jnp.exp(log_r)
    cw = jnp.clip(jnp.round(jnp.sqrt(area * aspect)), 1, w)
    ch = jnp.clip(jnp.round(jnp.sqrt(area / aspect)), 1, h)
    x0 = jax.random.uniform(k3, (b,)) * (w - cw)
    y0 = jax.random.uniform(k4, (b,)) * (h - ch)
    my = _resize_matrix(y0, ch, h, out_size)             # (B, S, H)
    mx = _resize_matrix(x0, cw, w, out_size)             # (B, S, W)
    # HIGHEST precision measured FASTER than default here (75 vs 107 ms for
    # the full 20-crop at B=32) — default fp32 lowers to a slower path
    hi = jax.lax.Precision.HIGHEST
    tmp = jnp.einsum("boh,bhwc->bowc", my, images, precision=hi)
    return jnp.einsum("bpw,bowc->bopc", mx, tmp, precision=hi)


# ---------------------------------------------------------------------------
# photometric ops (inputs in [0, 1])
# ---------------------------------------------------------------------------

_LUMA = jnp.array([0.299, 0.587, 0.114])


def _grayscale(x):
    g = jnp.einsum("...c,c->...", x, _LUMA.astype(x.dtype))
    return g[..., None] * jnp.ones_like(x)


def _rgb_to_hsv(x):
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    mx = jnp.max(x, axis=-1)
    mn = jnp.min(x, axis=-1)
    d = mx - mn
    safe_d = jnp.where(d > 0, d, 1.0)
    h = jnp.where(
        mx == r, (g - b) / safe_d % 6.0,
        jnp.where(mx == g, (b - r) / safe_d + 2.0, (r - g) / safe_d + 4.0),
    ) / 6.0
    h = jnp.where(d > 0, h, 0.0)
    s = jnp.where(mx > 0, d / jnp.where(mx > 0, mx, 1.0), 0.0)
    return h, s, mx


def _hsv_to_rgb(h, s, v):
    h6 = h * 6.0
    i = jnp.floor(h6)
    f = h6 - i
    p = v * (1 - s)
    q = v * (1 - s * f)
    t = v * (1 - s * (1 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def color_jitter_batch(key, x, brightness=0.4, contrast=0.4, saturation=0.2, hue=0.1):
    """torchvision ColorJitter semantics, per-image factors, fixed order."""
    b = x.shape[0]
    kb, kc, ks, kh = jax.random.split(key, 4)
    shape = (b, 1, 1, 1)
    fb = jax.random.uniform(kb, shape, minval=1 - brightness, maxval=1 + brightness)
    fc = jax.random.uniform(kc, shape, minval=1 - contrast, maxval=1 + contrast)
    fs = jax.random.uniform(ks, shape, minval=1 - saturation, maxval=1 + saturation)
    fh = jax.random.uniform(kh, (b, 1, 1), minval=-hue, maxval=hue)

    x = jnp.clip(x * fb, 0, 1)
    gray_mean = jnp.mean(_grayscale(x)[..., :1], axis=(1, 2, 3), keepdims=True)
    x = jnp.clip((x - gray_mean) * fc + gray_mean, 0, 1)
    x = jnp.clip(_grayscale(x) + (x - _grayscale(x)) * fs, 0, 1)
    h, s, v = _rgb_to_hsv(x)
    x = _hsv_to_rgb((h + fh) % 1.0, s, v)
    return jnp.clip(x, 0, 1)


def random_grayscale_batch(key, x, p=0.2):
    mask = jax.random.bernoulli(key, p, (x.shape[0], 1, 1, 1))
    return jnp.where(mask, _grayscale(x), x)


def gaussian_blur_batch(key, x, p, radius_min=0.1, radius_max=2.0, taps=9):
    """PIL GaussianBlur with per-image random sigma, as two banded-matrix
    matmuls (separable). Applied with probability p per image."""
    b, h, w, c = x.shape
    k1, k2 = jax.random.split(key)
    sigma = jax.random.uniform(k1, (b,), minval=radius_min, maxval=radius_max)
    apply = jax.random.bernoulli(k2, p, (b, 1, 1, 1))
    r = taps // 2
    offs = jnp.arange(-r, r + 1, dtype=jnp.float32)
    wts = jnp.exp(-0.5 * (offs[None, :] / sigma[:, None]) ** 2)
    wts = wts / wts.sum(axis=1, keepdims=True)           # (B, taps)

    def banded(size):
        i = jnp.arange(size)
        d = i[None, :, None] - i[None, None, :]          # (1, size, size)
        m = jnp.zeros((b, size, size), jnp.float32)
        for k in range(taps):
            m = m + (d == (k - r)) * wts[:, k, None, None]
        # renormalize at the borders (PIL clips & renormalizes the kernel)
        return m / jnp.maximum(m.sum(axis=2, keepdims=True), 1e-8)

    my, mx = banded(h), banded(w)
    hi = jax.lax.Precision.HIGHEST
    blurred = jnp.einsum("bij,bjwc->biwc", my, x, precision=hi)
    blurred = jnp.einsum("bkw,biwc->bikc", mx, blurred, precision=hi)
    return jnp.where(apply, blurred, x)


def solarize_batch(key, x, p=0.2, threshold=128 / 255):
    mask = jax.random.bernoulli(key, p, (x.shape[0], 1, 1, 1))
    return jnp.where(mask & (x >= threshold), 1.0 - x, x)


def random_flip_batch(key, x, p=0.5):
    mask = jax.random.bernoulli(key, p, (x.shape[0], 1, 1, 1))
    return jnp.where(mask, x[:, :, ::-1, :], x)


# ---------------------------------------------------------------------------
# the full LAFS multi-crop
# ---------------------------------------------------------------------------

def _jitter_gray(key, x):
    """flip_and_color_jitter minus the flip (``lafs_train.py:792-798``)."""
    k1, k2, k3 = jax.random.split(key, 3)
    apply = jax.random.bernoulli(k1, 0.8, (x.shape[0], 1, 1, 1))
    jittered = color_jitter_batch(k2, x)
    x = jnp.where(apply, jittered, x)
    return random_grayscale_batch(k3, x, 0.2)


def _emit_pair(key, geo, blur_p, solarize_p):
    """One (clean, aug) pair from a shared geometric crop (in [0,1])."""
    k1, k2, k3 = jax.random.split(key, 3)
    clean = geo * 2.0 - 1.0
    aug = _jitter_gray(k1, geo)
    aug = gaussian_blur_batch(k2, aug, blur_p)
    if solarize_p > 0:
        aug = solarize_batch(k3, aug, solarize_p)
    return clean, aug * 2.0 - 1.0


@functools.partial(
    jax.jit, static_argnames=("local_crops_number", "out_size", "local_size")
)
def vanilla_multicrop_device(
    key,
    images_uint8: jnp.ndarray,
    local_crops_number: int = 8,
    out_size: int = 112,
    local_size: int = 48,
    global_crops_scale: Tuple[float, float] = (0.4, 1.0),
    local_crops_scale: Tuple[float, float] = (0.05, 0.4),
):
    """Device-side vanilla DINO multi-crop (``lafs_train.py:743-788``,
    the twin of ``data.augment.DataAugmentationDINO``): (B, H, W, 3) uint8
    → ``(globals, locals)`` in the layout the vanilla SSL step consumes —
    (2, B, S, S, 3) and (L, B, s, s, 3) float32, ImageNet-normalized.

    UNPAIRED crops (no clean/aug split — nothing consumes clean views
    without the landmark CNN); reference order per crop: RandomResizedCrop
    → flip → jitter/gray → blur [→ solarize] → normalize. Blur/solarize
    probabilities per crop slot: global1 (1.0, 0), global2 (0.1, 0.2),
    locals (0.5, 0).
    """
    x = images_uint8.astype(jnp.float32) / 255.0
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)
    n_crops = 2 + local_crops_number
    keys = jax.random.split(key, n_crops)

    def emit(k, size, scale, blur_p, solarize_p):
        kg, kf, kj, kb, ks = jax.random.split(k, 5)
        geo = random_resized_crop_batch(kg, x, size, scale)
        geo = jnp.clip(geo, 0.0, 1.0)  # PIL clamps to uint8 after bicubic
        geo = random_flip_batch(kf, geo)
        aug = _jitter_gray(kj, geo)
        aug = gaussian_blur_batch(kb, aug, blur_p)
        if solarize_p > 0:
            aug = solarize_batch(ks, aug, solarize_p)
        return (aug - mean) / std

    g = jnp.stack([
        emit(keys[0], out_size, global_crops_scale, 1.0, 0.0),
        emit(keys[1], out_size, global_crops_scale, 0.1, 0.2),
    ])
    loc = jnp.stack([
        emit(keys[2 + i], local_size, local_crops_scale, 0.5, 0.0)
        for i in range(local_crops_number)
    ])
    return g, loc


@functools.partial(
    jax.jit, static_argnames=("local_crops_number", "out_size")
)
def lafs_multicrop_device(
    key,
    images_uint8: jnp.ndarray,
    local_crops_number: int = 8,
    out_size: int = 112,
    global_crops_scale: Tuple[float, float] = (0.4, 1.0),
):
    """(B, H, W, 3) uint8 → (glob_clean, glob_aug, loc_clean, loc_aug) in the
    stacked layout ``make_ssl_train_step`` consumes: (2, B, S, S, 3) and
    (L, B, S, S, 3) float32 in [-1, 1].

    NOTE the reference uses the GLOBAL scale and full resolution for local
    crops too (``lafs_train.py:852-858``) — mirrored here.
    """
    x = images_uint8.astype(jnp.float32) / 255.0
    n_pairs = 2 + local_crops_number
    keys = jax.random.split(key, n_pairs)
    cleans, augs = [], []
    for i in range(n_pairs):
        kg, kf, kp = jax.random.split(keys[i], 3)
        geo = random_resized_crop_batch(kg, x, out_size, global_crops_scale)
        geo = jnp.clip(geo, 0.0, 1.0)  # PIL clamps to uint8 after bicubic
        geo = random_flip_batch(kf, geo)
        blur_p, solarize_p = (1.0, 0.0) if i == 0 else (
            (0.1, 0.2) if i == 1 else (0.5, 0.0)
        )
        clean, aug = _emit_pair(kp, geo, blur_p, solarize_p)
        cleans.append(clean)
        augs.append(aug)
    glob_clean = jnp.stack(cleans[:2])
    glob_aug = jnp.stack(augs[:2])
    loc_clean = jnp.stack(cleans[2:])
    loc_aug = jnp.stack(augs[2:])
    return glob_clean, glob_aug, loc_clean, loc_aug
