"""LayerNorm + Linear fused into ONE Pallas TPU kernel (custom VJP).

Why: the pre-attention LayerNorm (reference PreNorm, ``ViT_face.py:109-126``)
feeds the QKV projection — a (tokens, 768) @ (768, 2112) GEMM. Lowered
through XLA the normalized activations materialize in HBM as the GEMM
operand (~34 MB bf16/layer at the flagship 22k-token student batch) and the
backward mirrors the traffic for the dxn round-trip. This is the exact
pattern the LN-fused MLP kernel (`ops/fused_mlp.py::fused_ln_mlp`) measured
as a win for norm2 (128.96 → 126.66 ms SSL step); here it is applied to
norm1 + `to_qkv` (``attn_impl='lnqkv'`` — scores stay on the measured-optimal
batched-einsum path).

The output width (heads·dim_head·3 = 2112 at the flagship geometry) is not a
lane multiple; the kernel pads the weight to the next 128 multiple with zero
columns and slices the pad off outside (the slice fuses with the downstream
head split). Pad-column gradients are exactly zero (dy pad cols are zero),
so the unpadded dW is recovered by a slice.

Backward: one kernel recomputes the LN statistics from x, emits xn for the
XLA-side dW contraction, runs the dy @ Wᵀ matmul in-kernel, and applies the
LayerNorm backward in-core (dgamma/dbeta accumulate in a VMEM-resident
(8, d) block across the sequential token grid, like the LN-fused MLP).

No dropout and no bias: the only consumer is the reference's bias-free
``to_qkv`` projection (``ViT_face.py:153``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_mlp import (
    _align_vma,
    _ln_rows,
    _pad_tokens,
    _use_interpret,
    _vma,
)


def _tile(dtype) -> int:
    """Unlike the fused MLP this kernel holds no 2048-wide hidden buffer,
    so a 256-token tile fits VMEM — fewer grid steps, bigger MXU tiles."""
    return 256 if jnp.dtype(dtype).itemsize <= 2 else 64


def _fwd_kernel(x_ref, g_ref, bt_ref, w_ref, y_ref, *, eps: float):
    xhat, _ = _ln_rows(x_ref[:].astype(jnp.float32), eps)
    xn = xhat * g_ref[:].astype(jnp.float32) + bt_ref[:].astype(jnp.float32)
    y = jnp.dot(xn.astype(x_ref.dtype), w_ref[:],
                preferred_element_type=jnp.float32)
    y_ref[:] = y.astype(y_ref.dtype)


def _bwd_kernel(x_ref, dy_ref, g_ref, bt_ref, w_ref,
                xn_ref, dx_ref, dg_ref, db_ref, *, eps: float):
    i = pl.program_id(0)
    f32 = jnp.float32
    xhat, rstd = _ln_rows(x_ref[:].astype(f32), eps)
    g = g_ref[:].astype(f32)
    xn = xhat * g + bt_ref[:].astype(f32)
    xn_ref[:] = xn.astype(xn_ref.dtype)

    # dxn = dy @ Wᵀ : (T, Op) x (D, Op) contracting Op — bf16 operands,
    # fp32 accumulation (zero pad cols of dy/W contribute nothing)
    dxn = jax.lax.dot_general(
        dy_ref[:], w_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32,
    )

    # dgamma/dbeta accumulate into ONE (8, d) block with a constant output
    # index map — persists in VMEM across the sequential grid (pad rows:
    # dy=0 ⇒ dxn=0 ⇒ partials 0 and dx=0)
    @pl.when(i == 0)
    def _init():
        dg_ref[:] = jnp.zeros_like(dg_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    dg_ref[0:1, :] += jnp.sum(dxn * xhat, axis=0, keepdims=True)
    db_ref[0:1, :] += jnp.sum(dxn, axis=0, keepdims=True)
    dxhat = dxn * g
    m_1 = jnp.mean(dxhat, axis=1, keepdims=True)
    m_2 = jnp.mean(dxhat * xhat, axis=1, keepdims=True)
    dx_ref[:] = (rstd * (dxhat - m_1 - xhat * m_2)).astype(dx_ref.dtype)


def _pad_cols(w, op):
    o = w.shape[1]
    return w if o == op else jnp.pad(w, ((0, 0), (0, op - o)))


def _fwd_call(x, g, bt, w, eps: float, interpret: bool):
    t, d = x.shape
    o = w.shape[1]
    op = pl.cdiv(o, 128) * 128
    tile = _tile(x.dtype)
    tp = pl.cdiv(t, tile) * tile
    xp = _pad_tokens(x, tp)
    wp = _pad_cols(w, op)
    vma = _vma(x, g, bt, w)
    xp, g, bt, wp = _align_vma(vma, xp, g, bt, wp)
    y = pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps),
        grid=(tp // tile,),
        in_specs=[
            pl.BlockSpec((tile, d), lambda i: (i, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
            pl.BlockSpec((d, op), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tile, op), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((tp, op), x.dtype, vma=vma),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(xp, g.reshape(1, d), bt.reshape(1, d), wp)
    return y[:t, :o]


def _bwd_call(x, dy, g, bt, w, eps: float, interpret: bool):
    t, d = x.shape
    o = w.shape[1]
    op = pl.cdiv(o, 128) * 128
    tile = _tile(x.dtype)
    tp = pl.cdiv(t, tile) * tile
    xp = _pad_tokens(x, tp)
    dyp = _pad_tokens(jnp.pad(dy, ((0, 0), (0, op - o))) if op != o else dy,
                      tp)
    wp = _pad_cols(w, op)
    vma = _vma(x, dy, g, bt, w)
    xp, dyp, g, bt, wp = _align_vma(vma, xp, dyp, g, bt, wp)
    xn, dx, dgp, dbp = pl.pallas_call(
        functools.partial(_bwd_kernel, eps=eps),
        grid=(tp // tile,),
        in_specs=[
            pl.BlockSpec((tile, d), lambda i: (i, 0)),
            pl.BlockSpec((tile, op), lambda i: (i, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
            pl.BlockSpec((d, op), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((tile, d), lambda i: (i, 0)),
            pl.BlockSpec((tile, d), lambda i: (i, 0)),
            pl.BlockSpec((8, d), lambda i: (0, 0)),
            pl.BlockSpec((8, d), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((tp, d), x.dtype, vma=vma),
            jax.ShapeDtypeStruct((tp, d), x.dtype, vma=vma),
            jax.ShapeDtypeStruct((8, d), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((8, d), jnp.float32, vma=vma),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(xp, dyp, g.reshape(1, d), bt.reshape(1, d), wp)
    return xn, dx[:t], dgp, dbp, dyp


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _fused_ln_linear2d(x, g, bt, w, eps: float, interpret: bool):
    return _fwd_call(x, g, bt, w, eps, interpret)


def _fused_ln_linear2d_fwd(x, g, bt, w, eps: float, interpret: bool):
    y = _fwd_call(x, g, bt, w, eps, interpret)
    return y, (x, g, bt, w)


def _fused_ln_linear2d_bwd(eps: float, interpret: bool, res, dy):
    x, g, bt, w = res
    o = w.shape[1]
    xn, dx, dgp, dbp, dyp = _bwd_call(x, dy, g, bt, w, eps, interpret)
    # dW contracts xn over ALL rows incl. token pads: pad-row dy is zero,
    # so the nonzero pad-row xn (= beta) is harmless; pad cols slice off
    dw = jax.lax.dot_general(
        xn, dyp, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )[:, :o].astype(w.dtype)
    dg = jnp.sum(dgp, axis=0).astype(g.dtype)
    dbt = jnp.sum(dbp, axis=0).astype(bt.dtype)
    return dx, dg, dbt, dw


_fused_ln_linear2d.defvjp(_fused_ln_linear2d_fwd, _fused_ln_linear2d_bwd)


def fused_ln_linear(x, g, bt, w, *, eps: float = 1e-5,
                    interpret: bool | None = None):
    """y = LayerNorm(x; g, bt) @ w — LN fused into the GEMM's Pallas kernel
    (torch LN semantics, eps 1e-5 matching the reference PreNorm,
    ``ViT_face.py:109-126``). x: (..., D) with D % 128 == 0; w: (D, O) with
    any O (lane-padded internally). No bias (the reference ``to_qkv`` is
    bias-free)."""
    if interpret is None:
        interpret = _use_interpret()
    d = x.shape[-1]
    if d % 128 != 0:
        raise ValueError(f"fused_ln_linear: dim {d} must be a 128 multiple")
    lead = x.shape[:-1]
    x2 = x.reshape(-1, d)
    y = _fused_ln_linear2d(x2, g, bt, w, float(eps), interpret)
    return y.reshape(*lead, w.shape[1])
