"""Image→token patchify ops (static-shape, XLA-fusable).

Covers the reference's non-landmark tokenizations: the ``rearrange`` patchify
(``ViT_face.py:760``), the overlapping ``nn.Unfold`` soft-split
(``ViT_face.py:1423,1465``), and the fixed standard grid of landmark
coordinates (``ViT_face.py:717-723``).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def patchify(images: jnp.ndarray, patch_size: int) -> jnp.ndarray:
    """(B, H, W, C) → (B, H/P*W/P, P*P*C) tokens.

    Feature order matches torch ``rearrange('b c (h p1) (w p2) -> b (h w)
    (p1 p2 c)')`` on NCHW inputs: flattened as (row-offset, col-offset,
    channel) with tokens row-major over the patch grid.
    """
    b, h, w, c = images.shape
    p = patch_size
    x = images.reshape(b, h // p, p, w // p, p, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # (b, gh, gw, p1, p2, c)
    return x.reshape(b, (h // p) * (w // p), p * p * c)


def unfold_overlap(
    images: jnp.ndarray, kernel: int, stride: int, pad: int
) -> jnp.ndarray:
    """Overlapping soft-split, equivalent to ``nn.Unfold(kernel, stride, pad)``
    followed by ``.transpose(1, 2)`` (reference ``ViT_face.py:1465``).

    Returns (B, L, kernel*kernel*C) with features flattened in torch's
    (c, ki, kj) order so checkpoints interop with the reference's
    ``patch_to_embedding`` weight layout.
    """
    b, h, w, c = images.shape
    x = jnp.pad(images, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    hh, ww = h + 2 * pad, w + 2 * pad
    n_h = (hh - kernel) // stride + 1
    n_w = (ww - kernel) // stride + 1
    # gather strided windows: (B, n_h, n_w, kernel, kernel, C)
    rows = (jnp.arange(n_h) * stride)[:, None] + jnp.arange(kernel)[None, :]
    cols = (jnp.arange(n_w) * stride)[:, None] + jnp.arange(kernel)[None, :]
    x = x[:, rows]                      # (B, n_h, kernel, W', C)
    x = x[:, :, :, cols]                # (B, n_h, kernel, n_w, kernel, C)
    x = x.transpose(0, 1, 3, 5, 2, 4)   # (B, n_h, n_w, C, ki, kj) — torch order
    return x.reshape(b, n_h * n_w, c * kernel * kernel)


def standard_grid_landmarks(num_landmarks: int, patch_size: int = 8) -> np.ndarray:
    """Fixed landmark grid of the ``use_standcoord`` path: per axis
    ``arange(R)*8+4`` with landmark k=(i*R+j) at (x=grid[i], y=grid[j])
    (reference ``ViT_face.py:717-723``). Returns (N, 2) float32."""
    r = int(round(num_landmarks ** 0.5))
    assert r * r == num_landmarks
    axis = np.arange(r, dtype=np.float32) * 8 + 4
    gx, gy = np.meshgrid(axis, axis, indexing="ij")
    return np.stack([gx, gy], axis=-1).reshape(-1, 2)
