"""Pallas TPU kernel: fused landmark patch gather.

A hand-scheduled alternative to the XLA ``gather``/``mxu`` implementations in
``patch_gather.py``. The XLA paths are bottlenecked by either elementwise
gather (slow on TPU) or a (B, N, P, H, C) interpolation intermediate that
blows HBM bandwidth; this kernel stages each (padded) image into VMEM once
and extracts all N patches with dynamic-sublane slices + dynamic lane
rotates — the two dynamic-addressing primitives Mosaic lowers natively.

Layout tricks:
- the image is padded by P per side, so the padded width of a 112-input is
  exactly 128 — one full lane tile; channels become separate sublane planes
  (``(B, C, Hp, Wp)``).
- per landmark: slice P+1 rows at y0 (dynamic sublane start), rotate the
  (P+1, 128) window left by x0 (``pltpu.roll`` with dynamic shift), take the
  first P+1 columns statically, then two VPU lerps.
- output is written per-landmark as (C, P_y, P_x) planes; the cheap
  transpose to the reference token layout (x_off, y_off, c) happens outside
  the kernel where XLA fuses it.

Semantics match ``patch_gather`` (grid_sample align_corners=False, zero
padding); see that module's docstring for the coordinate derivation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x0_ref, y0_ref, wx_ref, wy_ref, img_ref, out_ref, *, n_land, p, channels):
    b = pl.program_id(0)  # scalar-prefetch refs hold the FULL (B, N) arrays

    def body(n, _):
        x0 = x0_ref[b, n]
        y0 = y0_ref[b, n]
        wx = wx_ref[b, n]
        wy = wy_ref[b, n]
        # Mosaic requires DYNAMIC sublane starts to be provably 8-aligned:
        # slice a 16-row window at the aligned base (y0//8*8 — the compiler
        # can prove the multiple) and roll the sub-tile remainder into place.
        y0a = (y0 // 8) * 8
        ry = y0 - y0a
        # per channel plane: aligned sublane slice + sublane/lane rotates.
        # (A (y,c)-interleaved single-slice variant was measured SLOWER —
        # 20.4 ms vs 14.3 ms at B=64 — unaligned 3C-row windows cost more
        # than 3 aligned small ones.)
        for c in range(channels):  # static unroll
            win = img_ref[0, c, pl.ds(y0a, 16), :]            # (16, 128)
            win = pltpu.roll(win, -ry, axis=0)                # rows y0.. → 0..
            win = pltpu.roll(win, -x0, axis=1)                # columns x0.. → 0..
            cols = win[0 : p + 1, 0 : p + 1]                  # (P+1, P+1)
            by = cols[0:p, :] * (1.0 - wy) + cols[1 : p + 1, :] * wy
            patch = by[:, 0:p] * (1.0 - wx) + by[:, 1 : p + 1] * wx  # (P,P) [y,x]
            out_ref[0, n, c] = patch
        return 0

    jax.lax.fori_loop(0, n_land, body, 0)


def patch_gather_pallas(
    images: jnp.ndarray,
    landmarks: jnp.ndarray,
    patch_size: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """(B, H, W, C) images + (B, N, 2) landmarks → (B, N, P*P*C) tokens.

    Same output as ``patch_gather(...)``.
    """
    B, H, W, C = images.shape
    N = landmarks.shape[1]
    p = patch_size
    # landmarks beyond ±(p+1) of the frame sample only zeros; clamping the
    # LANDMARKS there (instead of clamping window corners, which would SHIFT
    # samples) keeps zero-padding semantics exact. pad = 2p+2 guarantees
    # every clamped window stays inside the padded frame.
    pad = 2 * p + 2
    # channel-major padded planes: (B, C, Hp, Wp); Mosaic's dynamic rotate /
    # aligned-slice lowering needs lane counts that are 128-multiples and
    # sublane counts that are 8-multiples, so round the plane up
    Hp = -(-(H + 2 * pad) // 8) * 8
    Wp = -(-(W + 2 * pad) // 128) * 128
    padded = jnp.pad(
        images.astype(jnp.float32).transpose(0, 3, 1, 2),
        ((0, 0), (0, 0), (pad, Hp - H - pad), (pad, Wp - W - pad)),
    )

    lm = landmarks.astype(jnp.float32)
    lx = jnp.clip(lm[..., 0], -(p + 1.0), W + p + 1.0)
    ly = jnp.clip(lm[..., 1], -(p + 1.0), H + p + 1.0)
    x_origin = lx - p / 2 - 0.5 + pad
    y_origin = ly - p / 2 - 0.5 + pad
    x0 = jnp.floor(x_origin)
    y0 = jnp.floor(y_origin)
    wx = (x_origin - x0).astype(jnp.float32)
    wy = (y_origin - y0).astype(jnp.float32)
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, C, Hp, Wp), lambda b, *_: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, N, C, p, p), lambda b, *_: (b, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_kernel, n_land=N, p=p, channels=C),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, N, C, p, p), jnp.float32),
        interpret=interpret,
    )(x0, y0, wx, wy, padded)
    # (B, N, C, Py, Px) → token features flattened (x_off, y_off, c)
    tokens = out.transpose(0, 1, 4, 3, 2).reshape(B, N, p * p * C)
    return tokens.astype(images.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def patch_gather_pallas_diff(images, landmarks, patch_size: int = 8):
    """Differentiable wrapper: Pallas forward, XLA-derived backward.

    The kernel itself has no VJP; the backward pass reuses the (identical-
    output) ``mxu`` formulation's autodiff — the reference backpropagates
    through grid_sample into the landmark regressor, so the supervised
    ``with_land`` path needs gradients w.r.t. BOTH inputs."""
    return patch_gather_pallas(images, landmarks, patch_size)


def _pgp_fwd(images, landmarks, patch_size):
    return patch_gather_pallas(images, landmarks, patch_size), (images, landmarks)


def _pgp_bwd(patch_size, res, g):
    from .patch_gather import patch_gather

    images, landmarks = res
    _, vjp = jax.vjp(
        lambda i, l: patch_gather(i, l, patch_size, impl="mxu"), images, landmarks
    )
    return vjp(g)


patch_gather_pallas_diff.defvjp(_pgp_fwd, _pgp_bwd)
