"""Fused short-sequence attention Pallas TPU kernel.

Why: the reference attention (``face_pre_pro/ViT_face.py:144-182``) at the
flagship geometry (S=197 tokens, d_head=64) lowered through XLA materializes
the (B, H, S, S) score tensor in HBM three times per layer (QKᵀ write,
softmax read+write, AV read) — ~220 MB/layer at the 22k-token SSL student
batch, and the softmax runs in bf16. Generic flash attention
(``jax.experimental.pallas.ops.tpu.flash_attention``) is built for LONG
sequences (128-token K/V blocks, online softmax, carried max/denominator
state) and measured 2.4× slower here.

This kernel exploits that the WHOLE sequence fits VMEM at S≤512: grid over
(batch·heads); per instance the full Q/K/V (S, d) tiles load once, scores
form, mask, softmax (fp32), and the AV contraction all happen on-core — the
score tensor never touches HBM, and softmax math is fp32 for free.

Backward (custom VJP, flash-style): recompute A from Q/K (saved inputs, no
residuals beyond them), then
  dV = Aᵀ dO ;  dA = dO Vᵀ ;  dS = A ∘ (dA − rowsum(dA ∘ A))
  dQ = s·(dS K) ;  dK = s·(dSᵀ Q)
all in one kernel per (b, h) — backward score traffic also stays on-core.

Padding: S pads to a 128 multiple with ZERO rows; padded keys are masked to
−1e30 before softmax (A columns exactly 0), padded query rows softmax over
real keys of a zero logit row (finite, sliced off), and zero dO pad rows
make every padded-row gradient contribution vanish — no NaN can leak into
dK/dV (0·NaN hazards are avoided by construction, not by post-masking).

No dropout inside (the reference applies dropout after ``to_out``), so the
kernel is deterministic — the VJP needs no PRNG replay.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_mlp import _align_vma, _use_interpret, _vma

_NEG = -1e30


def _softmax_fp32(q, k, scale: float, n_real: int):
    """(Sp, d) bf16/f32 → (Sp, Sp) fp32 attention probs, padded keys masked."""
    logits = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    sp = logits.shape[-1]
    if n_real != sp:
        key_pad = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1) >= n_real
        logits = jnp.where(key_pad, _NEG, logits)
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _bsoftmax(q3, k3, scale: float, n_real: int):
    """(H, Sp, d) × (H, Sp, d) → (H, Sp, Sp) fp32 probs (batched over H)."""
    logits = jax.lax.dot_general(
        q3, k3, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale
    sp = logits.shape[-1]
    if n_real != sp:
        key_pad = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 2) >= n_real
        logits = jnp.where(key_pad, _NEG, logits)
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, n_real: int,
                heads: int):
    # one grid instance per batch element; heads ride a BATCHED dot_general
    # (Mosaic schedules the head-batch natively — measured faster than both
    # a per-(b,h) grid and an unrolled per-head loop)
    a = _bsoftmax(q_ref[0], k_ref[0], scale, n_real)
    o = jax.lax.dot_general(
        a.astype(v_ref.dtype), v_ref[0],
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = o.astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
                *, scale: float, n_real: int, heads: int):
    q, k, v, do = q_ref[0], k_ref[0], v_ref[0], do_ref[0]
    a = _bsoftmax(q, k, scale, n_real)  # recompute — scores never stored
    ab = a.astype(v.dtype)
    # dV = Aᵀ dO : contract queries (batched over H)
    dv = jax.lax.dot_general(
        ab, do, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    # dA = dO Vᵀ : contract d
    da = jax.lax.dot_general(
        do, v, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    ds = a * (da - jnp.sum(da * a, axis=-1, keepdims=True))
    dsb = ds.astype(q.dtype)
    dq = jax.lax.dot_general(
        dsb, k, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale
    dk = jax.lax.dot_general(
        dsb, q, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale
    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _pad_seq(t, sp):
    s = t.shape[2]
    return t if s == sp else jnp.pad(t, ((0, 0), (0, 0), (0, sp - s), (0, 0)))


def _specs(h, sp, d):
    return pl.BlockSpec((1, h, sp, d), lambda i: (i, 0, 0, 0))


def _fwd_call(q, k, v, scale: float, n_real: int, interpret: bool):
    b, h, sp, d = q.shape
    vma = _vma(q, k, v)
    q, k, v = _align_vma(vma, q, k, v)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, n_real=n_real, heads=h),
        grid=(b,),
        in_specs=[_specs(h, sp, d)] * 3,
        out_specs=_specs(h, sp, d),
        out_shape=jax.ShapeDtypeStruct((b, h, sp, d), q.dtype, vma=vma),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(q, k, v)


def _bwd_call(q, k, v, do, scale: float, n_real: int, interpret: bool):
    b, h, sp, d = q.shape
    vma = _vma(q, k, v, do)
    q, k, v, do = _align_vma(vma, q, k, v, do)
    shp = jax.ShapeDtypeStruct((b, h, sp, d), q.dtype, vma=vma)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, n_real=n_real, heads=h),
        grid=(b,),
        in_specs=[_specs(h, sp, d)] * 4,
        out_specs=[_specs(h, sp, d)] * 3,
        out_shape=[shp, shp, shp],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(q, k, v, do)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _attn3(q, k, v, scale: float, n_real: int, interpret: bool):
    return _fwd_call(q, k, v, scale, n_real, interpret)


def _attn3_fwd(q, k, v, scale, n_real, interpret):
    return _fwd_call(q, k, v, scale, n_real, interpret), (q, k, v)


def _attn3_bwd(scale, n_real, interpret, res, do):
    q, k, v = res
    dq, dk, dv = _bwd_call(q, k, v, do, scale, n_real, interpret)
    return dq, dk, dv


_attn3.defvjp(_attn3_fwd, _attn3_bwd)


def fused_attention(q, k, v, scale: float, interpret: bool | None = None):
    """softmax(s·QKᵀ)V with fp32 on-core softmax; scores never touch HBM.

    q/k/v: (B, H, S, D). Whole-sequence kernel, one grid instance per batch
    element (heads unrolled in-kernel) — requires H·S ≤ ~2048 tokens of
    VMEM state and D a lane multiple (64 ok: the MXU contraction pads,
    same as XLA).
    """
    if interpret is None:
        interpret = _use_interpret()
    b, h, s, d = q.shape
    sp = max(-(-s // 128) * 128, 128)
    out = _attn3(_pad_seq(q, sp), _pad_seq(k, sp), _pad_seq(v, sp),
                 float(scale), s, interpret)
    return out[:, :, :s]
