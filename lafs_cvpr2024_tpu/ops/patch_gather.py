"""Differentiable landmark patch extraction — the structural kernel of LAFS.

Reference semantics (``/root/reference/face_pre_pro/ViT_face.py:1615-1656``,
``extract_patches_pytorch_gridsample``): for every landmark ``(lx, ly)`` an
``P x P`` patch is bilinearly sampled from the image with
``F.grid_sample(align_corners=False, padding_mode='zeros')`` on the grid

    x(i) = lx + i - P/2 - 0.5      (i = 0..P-1, indexes image *width*)
    y(j) = ly + j - P/2 - 0.5      (j = 0..P-1, indexes image *height*)

i.e. landmark coordinate 0 is the **x** (width/column) coordinate. The
reference then tiles patches into a pseudo-image and re-flattens, so the final
token layout is: token ``n`` = landmark ``n`` (row-major over the landmark
list) with features flattened in ``(i, j, c)`` order — patch axis 0 is the
*x offset*, a transposition quirk we preserve bit-for-bit for checkpoint
interop (validated by a golden test against ``torch.nn.functional.grid_sample``).

Unlike the reference (a 196-iteration Python loop of ``grid_sample`` calls),
this is ONE batched op. Two equivalent implementations:

- ``impl='gather'``: 4-corner advanced-indexing gather (XLA gather HLO).
- ``impl='mxu'``: bilinear sampling expressed as two small matmuls with
  interpolation matrices built from one-hot rows — runs on the MXU systolic
  array instead of scatter/gather hardware, which is the fast path on TPU.

Both are differentiable w.r.t. images AND landmarks (the reference
backpropagates into the landmark regressor through grid_sample).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _corner_weights(coord: jnp.ndarray):
    """floor corner, frac weight for one axis of bilinear sampling."""
    c0 = jnp.floor(coord)
    w1 = coord - c0
    return c0.astype(jnp.int32), w1


def patch_gather(
    images: jnp.ndarray,
    landmarks: jnp.ndarray,
    patch_size: int = 8,
    impl: str = "mxu",
) -> jnp.ndarray:
    """Extract bilinear patches at landmarks.

    Args:
      images: ``(B, H, W, C)`` float array (NHWC — TPU-native layout).
      landmarks: ``(B, N, 2)`` pixel coordinates, ``[..., 0]=x`` (width),
        ``[..., 1]=y`` (height). May be fractional; out-of-bounds samples
        read as zero (grid_sample ``padding_mode='zeros'``).
      patch_size: P, patch side length.
      impl: 'gather' or 'mxu'.

    Returns:
      ``(B, N, P*P*C)`` tokens; features flattened in ``(x_off, y_off, c)``
      order, matching the reference mosaic+rearrange round trip
      (``ViT_face.py:1649-1654`` + ``:760``).
    """
    if impl == "pallas":
        from .patch_gather_pallas import patch_gather_pallas_diff

        return patch_gather_pallas_diff(images, landmarks, patch_size)
    if impl == "gather":
        patches = _patch_gather_indexed(images, landmarks, patch_size)
    elif impl == "mxu":
        patches = _patch_gather_mxu(images, landmarks, patch_size)
    else:
        raise ValueError(f"unknown impl {impl!r}")
    b, n, p, _, c = patches.shape
    return patches.reshape(b, n, p * p * c)


def patch_gather_mosaic(
    images: jnp.ndarray,
    landmarks: jnp.ndarray,
    patch_size: int = 8,
    impl: str = "mxu",
    transpose: bool = False,
) -> jnp.ndarray:
    """Patch extraction returning the tiled pseudo-image of the reference.

    Output ``(B, R*P, R*P, C)`` with ``R = sqrt(N)``; mosaic[b, r*P+i, s*P+j]
    = patch of landmark ``r*R+s`` at offset ``(i=x_off, j=y_off)`` — exactly
    the reference layout (``ViT_face.py:1649-1654``). ``transpose=True``
    applies the extra ``permute(0,1,3,2)`` of the ``use_standcoord`` path
    (``ViT_face.py:748``).
    """
    if impl == "gather":
        patches = _patch_gather_indexed(images, landmarks, patch_size)
    else:
        patches = _patch_gather_mxu(images, landmarks, patch_size)
    b, n, p, _, c = patches.shape
    r = int(round(n ** 0.5))
    assert r * r == n, "mosaic output needs a square landmark count"
    mosaic = patches.reshape(b, r, r, p, p, c)            # (b, r, s, i, j, c)
    mosaic = mosaic.transpose(0, 1, 3, 2, 4, 5)           # (b, r, i, s, j, c)
    mosaic = mosaic.reshape(b, r * p, r * p, c)
    if transpose:
        mosaic = mosaic.transpose(0, 2, 1, 3)
    return mosaic


def _sample_coords(landmarks: jnp.ndarray, patch_size: int):
    """Per-landmark sample coordinates along each axis: (B, N, P) x and y."""
    offs = jnp.arange(patch_size, dtype=landmarks.dtype) - patch_size / 2
    # grid_sample(align_corners=False) unnormalization leaves a -0.5 shift:
    # pixel = landmark + offset - 0.5 (see module docstring derivation).
    x = landmarks[..., 0:1] + offs[None, None, :] - 0.5
    y = landmarks[..., 1:2] + offs[None, None, :] - 0.5
    return x, y


def _patch_gather_indexed(images, landmarks, patch_size):
    """4-corner gather implementation. Returns (B, N, P, P, C)."""
    B, H, W, C = images.shape
    landmarks = landmarks.astype(jnp.float32)
    x, y = _sample_coords(landmarks, patch_size)          # (B, N, P) each
    x0, wx = _corner_weights(x)
    y0, wy = _corner_weights(y)

    def gather_axis(ix, iy):
        # ix: (B,N,P) int x-coords; iy: (B,N,P) int y-coords.
        inb = (
            (ix[:, :, :, None] >= 0) & (ix[:, :, :, None] < W)
            & (iy[:, :, None, :] >= 0) & (iy[:, :, None, :] < H)
        )  # (B, N, P, P)
        ixc = jnp.clip(ix, 0, W - 1)
        iyc = jnp.clip(iy, 0, H - 1)
        bidx = jnp.arange(B)[:, None, None, None]
        vals = images[bidx, iyc[:, :, None, :], ixc[:, :, :, None]]  # (B,N,P,P,C)
        return jnp.where(inb[..., None], vals, 0.0)

    v00 = gather_axis(x0, y0)
    v01 = gather_axis(x0, y0 + 1)
    v10 = gather_axis(x0 + 1, y0)
    v11 = gather_axis(x0 + 1, y0 + 1)
    wxe = wx[:, :, :, None, None]   # broadcast over j (y) axis and channels
    wye = wy[:, :, None, :, None]
    out = (
        v00 * (1 - wxe) * (1 - wye)
        + v01 * (1 - wxe) * wye
        + v10 * wxe * (1 - wye)
        + v11 * wxe * wye
    )
    return out.astype(images.dtype)


def _interp_matrix(coords: jnp.ndarray, size: int) -> jnp.ndarray:
    """Bilinear interpolation matrix along one axis.

    coords: (B, N, P) fractional pixel coords. Returns (B, N, P, size) M with
    M @ signal == bilinearly sampled values (zero outside [0, size-1] support,
    partial weights at the border exactly as grid_sample zero-padding).
    """
    c0, w1 = _corner_weights(coords)
    grid = jnp.arange(size, dtype=jnp.int32)
    hit0 = (grid[None, None, None, :] == c0[..., None]).astype(coords.dtype)
    hit1 = (grid[None, None, None, :] == (c0 + 1)[..., None]).astype(coords.dtype)
    return hit0 * (1 - w1)[..., None] + hit1 * w1[..., None]


def _patch_gather_mxu(images, landmarks, patch_size):
    """Bilinear sampling as two matmuls (MXU path). Returns (B, N, P, P, C)."""
    B, H, W, C = images.shape
    landmarks = landmarks.astype(jnp.float32)
    x, y = _sample_coords(landmarks, patch_size)
    mx = _interp_matrix(x, W)                              # (B, N, P, W)
    my = _interp_matrix(y, H)                              # (B, N, P, H)
    # out[b,n,i,j,c] = sum_{h,w} mx[b,n,i,w] my[b,n,j,h] img[b,h,w,c]
    # HIGHEST precision: interpolation weights need full fp32 mantissa to
    # match grid_sample bit-for-bit (default matmul precision is bf16-ish).
    hi = jax.lax.Precision.HIGHEST
    tmp = jnp.einsum("bniw,bhwc->bnihc", mx, images.astype(jnp.float32), precision=hi)
    out = jnp.einsum("bnjh,bnihc->bnijc", my, tmp, precision=hi)
    return out.astype(images.dtype)


@functools.partial(jax.jit, static_argnames=("patch_size", "impl"))
def patch_gather_jit(images, landmarks, patch_size=8, impl="mxu"):
    return patch_gather(images, landmarks, patch_size=patch_size, impl=impl)
