"""Golden tests: device RandAugment ops vs their PIL counterparts.

Photometric ops match to uint8 rounding (atol 2/255); geometric warps match
PIL bilinear to interpolation tolerance (mean err, interior max err).
"""

import numpy as np
import pytest
from PIL import Image, ImageEnhance, ImageOps

import jax
import jax.numpy as jnp

from lafs_cvpr2024_tpu.ops.randaugment_device import (
    RandAugmentDeviceConfig,
    affine_warp_batch,
    autocontrast_op,
    brightness_op,
    color_op,
    contrast_op,
    equalize_op,
    invert_op,
    posterize_op,
    rand_augment_batch,
    random_erasing_batch,
    rotate_coeffs,
    shear_x_coeffs,
    sharpness_op,
    supervised_augment_device,
    translate_x_coeffs,
)

FILL = (128, 128, 128)


@pytest.fixture(scope="module")
def imgs():
    rng = np.random.default_rng(0)
    # smooth-ish images: random low-res upsampled (more realistic gradients
    # than white noise for interpolation comparisons)
    small = rng.integers(0, 255, (4, 14, 14, 3)).astype(np.uint8)
    ups = np.stack([
        np.asarray(Image.fromarray(s).resize((64, 64), Image.BILINEAR))
        for s in small
    ])
    return ups


def _dev(x_uint8):
    return jnp.asarray(x_uint8.astype(np.float32) / 255.0)


def _np(x):
    return np.asarray(x) * 255.0


def _pil_batch(x_uint8, fn):
    return np.stack([np.asarray(fn(Image.fromarray(im))) for im in x_uint8])


@pytest.mark.parametrize(
    "dev_fn,pil_fn,factor",
    [
        (invert_op, lambda im: ImageOps.invert(im), None),
        (autocontrast_op, lambda im: ImageOps.autocontrast(im), None),
        (equalize_op, lambda im: ImageOps.equalize(im), None),
        (brightness_op, lambda im: ImageEnhance.Brightness(im).enhance(1.4), 1.4),
        (brightness_op, lambda im: ImageEnhance.Brightness(im).enhance(0.3), 0.3),
        (color_op, lambda im: ImageEnhance.Color(im).enhance(1.6), 1.6),
        (contrast_op, lambda im: ImageEnhance.Contrast(im).enhance(0.4), 0.4),
        (sharpness_op, lambda im: ImageEnhance.Sharpness(im).enhance(1.9), 1.9),
        (sharpness_op, lambda im: ImageEnhance.Sharpness(im).enhance(0.1), 0.1),
    ],
)
def test_photometric_golden(imgs, dev_fn, pil_fn, factor):
    ref = _pil_batch(imgs, pil_fn).astype(np.float32)
    fac = None if factor is None else jnp.full((len(imgs),), factor)
    out = _np(dev_fn(_dev(imgs), fac))
    assert np.abs(out - ref).max() <= 2.0 + 1e-4, (
        f"max err {np.abs(out - ref).max()}"
    )


def test_posterize_golden(imgs):
    for bits in (1, 3, 4, 8):
        ref = _pil_batch(
            imgs,
            lambda im: im if bits >= 8 else ImageOps.posterize(im, bits),
        ).astype(np.float32)
        out = _np(posterize_op(_dev(imgs), jnp.full((len(imgs),), bits)))
        np.testing.assert_allclose(out, ref, atol=0.51)


def _geo_err(out, ref):
    err = np.abs(out - ref)
    return err.mean(), err[:, 4:-4, 4:-4].max()


def test_rotate_golden(imgs):
    deg = 17.0
    ref = _pil_batch(
        imgs, lambda im: im.rotate(deg, resample=Image.BILINEAR, fillcolor=FILL)
    ).astype(np.float32)
    h, w = imgs.shape[1:3]
    coeffs = rotate_coeffs(jnp.full((len(imgs),), deg), h, w)
    out = _np(affine_warp_batch(_dev(imgs), coeffs))
    mean_err, interior_max = _geo_err(out, ref)
    assert mean_err < 1.0 and interior_max < 6.0, (mean_err, interior_max)


def test_shear_translate_golden(imgs):
    f = 0.22
    ref = _pil_batch(
        imgs,
        lambda im: im.transform(
            im.size, Image.AFFINE, (1, f, 0, 0, 1, 0),
            resample=Image.BILINEAR, fillcolor=FILL,
        ),
    ).astype(np.float32)
    out = _np(affine_warp_batch(_dev(imgs), shear_x_coeffs(jnp.full((4,), f))))
    mean_err, interior_max = _geo_err(out, ref)
    assert mean_err < 1.0 and interior_max < 6.0, (mean_err, interior_max)

    px = 9.3
    ref = _pil_batch(
        imgs,
        lambda im: im.transform(
            im.size, Image.AFFINE, (1, 0, px, 0, 1, 0),
            resample=Image.BILINEAR, fillcolor=FILL,
        ),
    ).astype(np.float32)
    out = _np(affine_warp_batch(_dev(imgs), translate_x_coeffs(jnp.full((4,), px))))
    mean_err, interior_max = _geo_err(out, ref)
    assert mean_err < 1.0 and interior_max < 6.0, (mean_err, interior_max)


def test_config_str_parse():
    cfg = RandAugmentDeviceConfig.from_config_str("rand-m1-mstd0.5-inc1")
    assert cfg.magnitude == 1.0 and cfg.magnitude_std == 0.5
    assert cfg.increasing and cfg.num_layers == 2
    cfg = RandAugmentDeviceConfig.from_config_str("rand-m9-n3")
    assert cfg.magnitude == 9.0 and cfg.num_layers == 3 and not cfg.increasing


def test_rand_augment_batch_driver(imgs):
    cfg = RandAugmentDeviceConfig(magnitude=8.0, magnitude_std=0.5, prob=1.0)
    out = jax.jit(lambda k, x: rand_augment_batch(k, x, cfg))(
        jax.random.PRNGKey(0), _dev(imgs)
    )
    out = np.asarray(out)
    assert out.shape == imgs.shape
    assert out.min() >= 0.0 and out.max() <= 1.0
    # per-image independence: identical inputs must get different ops
    same = np.repeat(imgs[:1], 4, axis=0)
    out2 = np.asarray(
        jax.jit(lambda k, x: rand_augment_batch(k, x, cfg))(
            jax.random.PRNGKey(1), _dev(same)
        )
    )
    assert len({o.tobytes() for o in out2}) > 1, "ops not per-image"


def test_random_erasing_batch(imgs):
    out = np.asarray(
        random_erasing_batch(jax.random.PRNGKey(0), _dev(imgs), p=1.0)
    )
    for i in range(len(imgs)):
        zeros = (out[i] == 0).all(-1)
        frac = zeros.mean()
        assert 0.015 <= frac <= 0.12, frac  # box area in the scale range


def test_supervised_augment_device_pipeline(imgs):
    out = jax.jit(
        lambda k, x: supervised_augment_device(k, x, out_size=48)
    )(jax.random.PRNGKey(0), jnp.asarray(imgs))
    out = np.asarray(out)
    assert out.shape == (4, 48, 48, 3)
    assert out.min() >= -1.0 - 1e-5 and out.max() <= 1.0 + 1e-5


def test_supervised_augment_device_flip_only(imgs):
    """rand_au=False, resize_crop=False (the reference README's flip-only
    recipe, README.md:83-84): every output is EXACTLY the normalized input
    or its mirror — no other op may touch the pixels; both outcomes occur
    over a batch; the native-size guard refuses a size mismatch."""
    import pytest

    out = np.asarray(jax.jit(
        lambda k, x: supervised_augment_device(
            k, x, out_size=64, rand_au=False, resize_crop=False
        )
    )(jax.random.PRNGKey(5), jnp.asarray(imgs)))
    ref = imgs.astype(np.float32) / 255.0 * 2.0 - 1.0
    flips = []
    for i in range(len(imgs)):
        same = np.allclose(out[i], ref[i], atol=1e-6)
        mirrored = np.allclose(out[i], ref[i][:, ::-1], atol=1e-6)
        assert same or mirrored, f"image {i} is neither identity nor mirror"
        flips.append(mirrored and not same)
    assert any(flips) and not all(flips), (
        "expected a mix of flipped/unflipped over the batch; re-seed"
    )
    with pytest.raises(ValueError, match="native frame size"):
        supervised_augment_device(
            jax.random.PRNGKey(0), jnp.asarray(imgs), out_size=48,
            rand_au=False, resize_crop=False,
        )
