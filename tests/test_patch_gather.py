"""Golden tests: patch_gather must match torch grid_sample semantics exactly.

The oracle re-enacts the reference pipeline (ViT_face.py:1615-1656 mosaic +
ViT_face.py:760 rearrange) with torch.nn.functional.grid_sample — torch (CPU)
is used here only as a test oracle, never in the framework.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from lafs_cvpr2024_tpu.ops import (
    patch_gather,
    patch_gather_mosaic,
    patchify,
    standard_grid_landmarks,
)


def torch_oracle_tokens(imgs_nchw, landmarks, p):
    """Reference semantics: per-landmark grid_sample → mosaic → rearrange."""
    B, C, H, W = imgs_nchw.shape
    n = landmarks.shape[1]
    offs = torch.arange(-p // 2, p // 2).float()
    gx, gy = torch.meshgrid(offs, offs, indexing="ij")
    # sampling_grid[i, j] = (offs[i], offs[j]) after the reference's stack +
    # double transpose (ViT_face.py:1637-1640)
    grid = torch.stack([gx, gy], dim=-1)
    patches = []
    for i in range(n):
        land = landmarks[:, i, :]  # (B, 2), [x, y]
        g = (grid[None] + land[:, None, None, :]) / (H * 0.5) - 1
        patches.append(F.grid_sample(imgs_nchw, g, align_corners=False))
    x = torch.stack(patches, dim=2)  # (B, C, n, p, p)
    r = int(np.sqrt(n))
    x = x.reshape(B, C, r, r, p, p).permute(0, 1, 2, 4, 3, 5).reshape(B, C, r * p, r * p)
    # ViT_face.py:760 rearrange 'b c (h p1) (w p2) -> b (h w) (p1 p2 c)'
    x = x.reshape(B, C, r, p, r, p).permute(0, 2, 4, 3, 5, 1).reshape(B, r * r, p * p * C)
    return x


@pytest.mark.parametrize("impl", ["gather", "mxu"])
def test_patch_gather_matches_grid_sample(impl):
    rng = np.random.default_rng(0)
    B, H, W, C, n, p = 2, 112, 112, 3, 16, 8
    imgs = rng.standard_normal((B, H, W, C)).astype(np.float32)
    # fractional landmarks incl. near-border and out-of-bounds cases
    lands = rng.uniform(-6, 117, size=(B, n, 2)).astype(np.float32)

    ours = np.asarray(patch_gather(jnp.asarray(imgs), jnp.asarray(lands), p, impl=impl))
    oracle = torch_oracle_tokens(
        torch.from_numpy(imgs).permute(0, 3, 1, 2), torch.from_numpy(lands), p
    ).numpy()
    np.testing.assert_allclose(ours, oracle, atol=2e-5, rtol=1e-5)


def test_impls_agree():
    rng = np.random.default_rng(1)
    imgs = jnp.asarray(rng.standard_normal((2, 40, 40, 3)).astype(np.float32))
    lands = jnp.asarray(rng.uniform(0, 39, size=(2, 9, 2)).astype(np.float32))
    a = patch_gather(imgs, lands, 8, impl="gather")
    b = patch_gather(imgs, lands, 8, impl="mxu")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-5)


def test_mosaic_layout_matches_reference():
    rng = np.random.default_rng(2)
    B, H, p = 1, 112, 8
    imgs = rng.standard_normal((B, H, H, 3)).astype(np.float32)
    lands = rng.uniform(10, 100, size=(B, 196, 2)).astype(np.float32)
    mosaic = np.asarray(
        patch_gather_mosaic(jnp.asarray(imgs), jnp.asarray(lands), p)
    )
    # tokens from the mosaic (reference path) == direct tokens
    toks_from_mosaic = np.asarray(patchify(jnp.asarray(mosaic), p))
    toks = np.asarray(patch_gather(jnp.asarray(imgs), jnp.asarray(lands), p))
    np.testing.assert_allclose(toks_from_mosaic, toks, atol=1e-6)


def test_integer_landmarks_sample_shifted_pixels():
    # with landmark at integer (x, y), sample pixel = x + i - p/2 - 0.5 →
    # exact average of two neighbours; check center tap against manual value
    img = np.zeros((1, 16, 16, 1), np.float32)
    img[0, 5, 7, 0] = 1.0  # y=5, x=7
    lands = np.array([[[7.0, 5.0]]], np.float32)
    out = np.asarray(patch_gather(jnp.asarray(img), jnp.asarray(lands), 4)).reshape(4, 4)
    # sample grid x = 7 + i - 2.5 for i in 0..3 → 4.5,5.5,6.5,7.5 ; y same with 5
    # pixel (7,5) contributes 0.25 at 4 taps: (i,j) where x∈{6.5,7.5}, y∈{4.5? no:2.5..5.5}
    expected = np.zeros((4, 4), np.float32)
    for i, x in enumerate([4.5, 5.5, 6.5, 7.5]):
        for j, y in enumerate([2.5, 3.5, 4.5, 5.5]):
            wx = max(0.0, 1 - abs(x - 7))
            wy = max(0.0, 1 - abs(y - 5))
            expected[i, j] = wx * wy
    np.testing.assert_allclose(out, expected, atol=1e-6)


def test_gradients_flow_to_landmarks():
    import jax

    imgs = jnp.ones((1, 20, 20, 3)) * jnp.arange(20).reshape(1, 1, 20, 1)
    lands = jnp.array([[[9.3, 9.7]]])

    def f(l):
        return patch_gather(imgs, l, 4, impl="mxu").sum()

    g = jax.grad(f)(lands)
    assert np.isfinite(np.asarray(g)).all()
    # image ramps along x → d/dx of summed samples ≈ 4*4*3 = 48
    np.testing.assert_allclose(np.asarray(g)[0, 0, 0], 48.0, rtol=1e-3)


def test_standard_grid():
    g = standard_grid_landmarks(196)
    assert g.shape == (196, 2)
    assert g[0].tolist() == [4.0, 4.0]
    assert g[1].tolist() == [4.0, 12.0]   # k=1 → i=0, j=1 → x=4, y=12
    assert g[14].tolist() == [12.0, 4.0]
    assert g.max() == 108.0
