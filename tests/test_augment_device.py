"""Device-side augmentation: statistical/semantic checks vs host references."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from lafs_cvpr2024_tpu.ops.augment_device import (
    color_jitter_batch,
    gaussian_blur_batch,
    lafs_multicrop_device,
    random_flip_batch,
    random_resized_crop_batch,
    solarize_batch,
)


def test_resize_matches_pil_bicubic_upscale():
    """Full-frame 'crop' upscaled == PIL bicubic resize (PIL antialiases only
    on DOWNSCALE; LAFS crops are always upscaled to 112, the 4-tap regime)."""
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (32, 32, 3), np.uint8)
    pil = np.asarray(
        Image.fromarray(img).resize((64, 64), Image.BICUBIC)
    ).astype(np.float32)

    x = jnp.asarray(img[None].astype(np.float32))
    from lafs_cvpr2024_tpu.ops.augment_device import _resize_matrix

    my = _resize_matrix(jnp.zeros(1), jnp.full(1, 32.0), 32, 64)
    mx = _resize_matrix(jnp.zeros(1), jnp.full(1, 32.0), 32, 64)
    hi = jax.lax.Precision.HIGHEST
    out = jnp.einsum("boh,bhwc->bowc", my, x, precision=hi)
    out = jnp.einsum("bpw,bowc->bopc", mx, out, precision=hi)
    got = np.clip(np.asarray(out[0]), 0, 255)
    # PIL rounds to uint8; interior pixels should agree to ~1 LSB
    diff = np.abs(got[4:-4, 4:-4] - pil[4:-4, 4:-4])
    assert np.median(diff) < 1.0
    assert np.mean(diff) < 2.0


def test_random_resized_crop_shapes_and_range():
    x = jnp.asarray(
        np.random.default_rng(1).uniform(0, 1, (4, 112, 112, 3)).astype(np.float32)
    )
    out = random_resized_crop_batch(jax.random.PRNGKey(0), x, 112)
    assert out.shape == (4, 112, 112, 3)
    assert np.asarray(out).min() > -0.3 and np.asarray(out).max() < 1.3


def test_flip_semantics():
    x = jnp.arange(8.0).reshape(1, 1, 8, 1) * jnp.ones((2, 4, 8, 1))
    flipped = random_flip_batch(jax.random.PRNGKey(4), x, p=1.0)
    np.testing.assert_allclose(np.asarray(flipped), np.asarray(x[:, :, ::-1]))
    same = random_flip_batch(jax.random.PRNGKey(4), x, p=0.0)
    np.testing.assert_allclose(np.asarray(same), np.asarray(x))


def test_solarize():
    x = jnp.asarray([[[[0.2, 0.8, 0.5]]]])
    out = solarize_batch(jax.random.PRNGKey(0), x, p=1.0)
    np.testing.assert_allclose(
        np.asarray(out)[0, 0, 0], [0.2, 1 - 0.8, 0.5], atol=1e-6
    )


def test_blur_preserves_mean_and_smooths():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32))
    out = gaussian_blur_batch(jax.random.PRNGKey(1), x, p=1.0,
                              radius_min=1.9, radius_max=2.0)
    a, b = np.asarray(x), np.asarray(out)
    np.testing.assert_allclose(a.mean(), b.mean(), atol=0.01)
    assert b.std() < a.std()  # smoothing reduces variance


def test_color_jitter_stays_in_range_and_varies():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(0.2, 0.8, (4, 16, 16, 3)).astype(np.float32))
    out = color_jitter_batch(jax.random.PRNGKey(2), x)
    o = np.asarray(out)
    assert o.min() >= -1e-5 and o.max() <= 1 + 1e-5
    assert not np.allclose(o, np.asarray(x))


def test_hsv_roundtrip():
    from lafs_cvpr2024_tpu.ops.augment_device import _hsv_to_rgb, _rgb_to_hsv

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.uniform(0, 1, (100, 3)).astype(np.float32))
    h, s, v = _rgb_to_hsv(x)
    back = _hsv_to_rgb(h, s, v)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-5)


def test_lafs_multicrop_device_layout():
    # structured images (smooth gradients): blur keeps clean/aug correlated
    yy, xx = np.mgrid[0:112, 0:112]
    base = np.stack([yy, xx, (yy + xx) / 2], axis=-1).astype(np.float32)
    imgs = jnp.asarray(
        np.stack([(base * (i + 1) / 4) % 256 for i in range(4)]).astype(np.uint8)
    )
    gc, ga, lc, la = lafs_multicrop_device(
        jax.random.PRNGKey(7), imgs, local_crops_number=2
    )
    assert gc.shape == (2, 4, 112, 112, 3) and ga.shape == gc.shape
    assert lc.shape == (2, 4, 112, 112, 3) and la.shape == lc.shape
    for t in (gc, ga, lc, la):
        arr = np.asarray(t)
        assert arr.min() >= -1.001 and arr.max() <= 1.001
    # clean and aug share geometry: highly correlated
    c = np.asarray(gc[0]).ravel()
    a = np.asarray(ga[0]).ravel()
    assert np.corrcoef(c, a)[0, 1] > 0.5


def test_scale_uint8_conventions_and_polymorphism():
    """THE uint8→float convention helper: exact endpoints for both modes,
    numpy-in→numpy-out (host eval path keeps its placement), jax-in→jax-out,
    loud on unknown mode."""
    import numpy as np

    from lafs_cvpr2024_tpu.ops.augment_device import scale_uint8

    u8 = np.asarray([0, 128, 255], np.uint8)
    out = scale_uint8(u8, "unit")
    assert isinstance(out, np.ndarray) and out.dtype == np.float32
    np.testing.assert_allclose(out, [-1.0, 128 / 255 * 2 - 1, 1.0], atol=1e-6)
    out = scale_uint8(u8, "half")
    np.testing.assert_allclose(out, [-0.5, 128 / 255 - 0.5, 0.5], atol=1e-6)
    j = scale_uint8(jnp.asarray(u8), "unit")
    assert isinstance(j, jax.Array)
    np.testing.assert_allclose(np.asarray(j), np.asarray(out) * 2, atol=1e-6)
    with pytest.raises(ValueError, match="unknown mode"):
        scale_uint8(u8, "raw")

def test_scale_uint8_imagenet_and_unscale_roundtrip():
    """The 'imagenet' convention (vanilla-DINO --arch vit_* checkpoints,
    lafs_train.py:751-753): per-channel (x/255-mean)/std, channel-LAST; its
    constants are pinned to the host-side transform's (data/augment.py keeps
    a jax-free twin for worker processes); unscale_to_uint8 inverts every
    convention bit-exactly on uint8 inputs."""
    import numpy as np

    from lafs_cvpr2024_tpu.data.augment import (
        IMAGENET_MEAN as HOST_MEAN,
        IMAGENET_STD as HOST_STD,
    )
    from lafs_cvpr2024_tpu.ops.augment_device import (
        IMAGENET_MEAN,
        IMAGENET_STD,
        INPUT_SCALES,
        scale_uint8,
        unscale_to_uint8,
    )

    np.testing.assert_array_equal(
        HOST_MEAN, np.asarray(IMAGENET_MEAN, np.float32)
    )
    np.testing.assert_array_equal(
        HOST_STD, np.asarray(IMAGENET_STD, np.float32)
    )
    assert INPUT_SCALES == ("half", "unit", "imagenet")

    u8 = np.arange(2 * 3 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3, 3) * 4
    out = scale_uint8(u8, "imagenet")
    assert out.dtype == np.float32 and out.shape == u8.shape
    want = (u8.astype(np.float32) / 255.0
            - np.asarray(IMAGENET_MEAN, np.float32)) / np.asarray(
        IMAGENET_STD, np.float32)
    np.testing.assert_allclose(out, want, atol=1e-6)

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (4, 5, 3), np.uint8)
    for mode in INPUT_SCALES:
        back = unscale_to_uint8(scale_uint8(img, mode), mode)
        np.testing.assert_array_equal(back, img), mode
    with pytest.raises(ValueError, match="unknown mode"):
        unscale_to_uint8(img.astype(np.float32), "raw")

def test_vanilla_multicrop_device_layout():
    """Device-side DataAugmentationDINO twin: (B,H,W,3) uint8 →
    (2,B,S,S,3) globals + (L,B,s,s,3) locals, ImageNet-normalized, crops
    decorrelated across slots."""
    from lafs_cvpr2024_tpu.ops.augment_device import (
        IMAGENET_MEAN,
        IMAGENET_STD,
        vanilla_multicrop_device,
    )

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 256, (3, 64, 64, 3), np.uint8))
    g, loc = vanilla_multicrop_device(
        jax.random.PRNGKey(0), imgs, local_crops_number=4,
        out_size=32, local_size=16,
    )
    assert g.shape == (2, 3, 32, 32, 3) and loc.shape == (4, 3, 16, 16, 3)
    # inverse-normalized values land back in [0, 1]
    mean = np.asarray(IMAGENET_MEAN, np.float32)
    std = np.asarray(IMAGENET_STD, np.float32)
    for t in (np.asarray(g), np.asarray(loc)):
        raw = t * std + mean
        assert raw.min() >= -1e-3 and raw.max() <= 1 + 1e-3
    # the two global crops are different random draws
    assert not np.allclose(np.asarray(g[0]), np.asarray(g[1]))
    assert not np.allclose(np.asarray(loc[0]), np.asarray(loc[1]))
