"""Fused transformer-MLP Pallas TPU kernel (fc1 + GELU + dropout + fc2 +
dropout in ONE kernel).

Why: the reference MLP (``face_pre_pro/ViT_face.py:128-142`` — Linear, GELU,
Dropout, Linear, Dropout) lowered through XLA round-trips the 2048-wide
hidden activation and two dropout-bit tensors through HBM every layer
(~180 MB/layer at the flagship 22k-token student batch). This kernel keeps
the hidden activation in VMEM and draws dropout bits with the on-core PRNG
(`pltpu.prng_random_bits`) so no mask ever touches HBM. Measured on the
v5e-lite chip (``benchmarks/bench_mlp_fusion.py``, 22016 tokens, 768→2048):
1.45 ms vs 1.79 ms XLA with dropout per layer forward (96 vs 77 TF/s).

Backward (custom VJP): one Pallas "prep" kernel regenerates the masks from
the same per-tile seeds, recomputes GELU from the saved pre-activation, and
computes the dy @ W2ᵀ matmul in-kernel; the weight-gradient contractions
(dW1, dW2, dx) stay in XLA where they fuse with the surrounding graph.

GELU is the exact (erf) flavor, matching the reference's ``nn.GELU()``;
Mosaic lacks erf, so we use the Abramowitz–Stegun 7.1.26 rational
approximation (|err| ≤ 1.5e-7 — below bf16 resolution).

Dropout semantics: keep-prob threshold on uint32 bits (quantization 2⁻³²).
The bit stream is the on-core PRNG (or a counter-hash in interpret mode for
CPU tests), NOT jax.random — dropout RNG provenance is an implementation
detail; determinism per (seed, tile) is what fwd/bwd correctness needs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128       # token-tile; fwd AND bwd must tile identically (mask
                 # seeds are per-tile); 256 puts the bwd kernel over VMEM
TILE_WIDE = 64   # fp32 inputs: weights occupy 2x VMEM, shrink the tile


def _phi(u):
    """Standard normal CDF via the A&S 7.1.26 erf approximation."""
    z = u * (2.0 ** -0.5)
    s = jnp.sign(z)
    a = jnp.abs(z)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
           + t * (-1.453152027 + t * 1.061405429))))
    erf = s * (1.0 - poly * jnp.exp(-a * a))
    return 0.5 * (1.0 + erf)


def _gelu(u):
    return u * _phi(u)


def _gelu_grad(u):
    # d/du [u Φ(u)] = Φ(u) + u φ(u)
    pdf = jnp.exp(-0.5 * u * u) * (1.0 / np.sqrt(2.0 * np.pi))
    return _phi(u) + u * pdf


def _bits(shape, seed, tile_idx, draw_idx: int, interpret: bool):
    """uint32 random bits, a pure function of (seed, tile, draw, element).

    Compiled: re-seed the on-core PRNG with the (seed, tile, draw) triple
    immediately before each draw — draw-order independent, so the backward
    kernel regenerates the forward's masks exactly no matter how Mosaic
    schedules the (independent) draws. Interpret (CPU tests): a counter-hash
    with the same key structure."""
    if not interpret:
        # Mosaic caps prng_seed at 2 values — pack (tile, draw) into one
        pltpu.prng_seed(seed, tile_idx * 2 + np.int32(draw_idx))
        return pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    r = jax.lax.broadcasted_iota(jnp.uint32, shape, 0) * np.uint32(2654435761)
    c = jax.lax.broadcasted_iota(jnp.uint32, shape, 1) * np.uint32(0x9E3779B9)
    v = r ^ c ^ (seed.astype(jnp.uint32)
                 + tile_idx.astype(jnp.uint32) * np.uint32(0xB5297A4D)
                 + np.uint32(draw_idx) * np.uint32(0x85EBCA6B))
    v = (v ^ (v >> 16)) * np.uint32(0x7FEB352D)
    v = (v ^ (v >> 15)) * np.uint32(0x846CA68B)
    return v ^ (v >> 16)


def _thresh(rate: float) -> np.uint32:
    # clamp BELOW 2**32: for rate < ~1.2e-10 the rounded keep-threshold hits
    # 2**32 exactly and the uint32 mask would wrap it to 0 (= drop ALL);
    # mirror FastDropout's uint16 min(..., 65535) guard
    return np.uint32(min(int(round((1.0 - rate) * 2.0 ** 32)), 2 ** 32 - 1))


def _fwd_kernel(seed_ref, x_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                y_ref, u_ref, *, rate: float, interpret: bool):
    i = pl.program_id(0)
    seed = seed_ref[0]
    u = jnp.dot(x_ref[:], w1_ref[:], preferred_element_type=jnp.float32)
    u = u + b1_ref[:].astype(jnp.float32)
    if u_ref is not None:
        u_ref[:] = u.astype(u_ref.dtype)
    h = _gelu(u)
    if rate > 0.0:
        keep = 1.0 - rate
        m1 = _bits(h.shape, seed, i, 0, interpret) < _thresh(rate)
        h = jnp.where(m1, h * (1.0 / keep), 0.0)
    h = h.astype(x_ref.dtype)
    o = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)
    o = o + b2_ref[:].astype(jnp.float32)
    if rate > 0.0:
        keep = 1.0 - rate
        m2 = _bits(o.shape, seed, i, 1, interpret) < _thresh(rate)
        o = jnp.where(m2, o * (1.0 / keep), 0.0)
    y_ref[:] = o.astype(y_ref.dtype)


def _bwd_kernel(seed_ref, u_ref, dy_ref, w2_ref,
                do_ref, hd_ref, du_ref, *, rate: float, interpret: bool):
    """Per token-tile: regenerate both masks, recompute GELU from the saved
    pre-activation, apply the dropout backwards, and run the dy@W2ᵀ matmul.
    Outputs feed the XLA-side dW1/dW2/dx contractions."""
    i = pl.program_id(0)
    seed = seed_ref[0]
    u = u_ref[:].astype(jnp.float32)
    dy = dy_ref[:].astype(jnp.float32)
    h = _gelu(u)
    if rate > 0.0:
        keep = 1.0 - rate
        # same (seed, tile, draw) keys as the forward kernel
        m1 = _bits(u.shape, seed, i, 0, interpret) < _thresh(rate)
        m2 = _bits(dy.shape, seed, i, 1, interpret) < _thresh(rate)
        do = jnp.where(m2, dy * (1.0 / keep), 0.0)
        hd = jnp.where(m1, h * (1.0 / keep), 0.0)
    else:
        do = dy
        hd = h
    do = do.astype(do_ref.dtype)
    do_ref[:] = do
    hd_ref[:] = hd.astype(hd_ref.dtype)
    # dhd = do @ W2ᵀ : (T, D) x (H, D) contracting D
    dhd = jax.lax.dot_general(
        do, w2_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if rate > 0.0:
        keep = 1.0 - rate
        dhd = jnp.where(m1, dhd * (1.0 / keep), 0.0)
    du_ref[:] = (dhd * _gelu_grad(u)).astype(du_ref.dtype)


def _pad_tokens(a, tp):
    t = a.shape[0]
    return a if t == tp else jnp.pad(a, ((0, tp - t), (0, 0)))


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _tile(dtype) -> int:
    return TILE if jnp.dtype(dtype).itemsize <= 2 else TILE_WIDE


def _vma(*arrays):
    """Union of the operands' varying-mesh-axes: under shard_map with
    check_vma=True, pallas out_shapes must declare how outputs vary."""
    out = frozenset()
    for a in arrays:
        out |= getattr(jax.typeof(a), "vma", frozenset())
    return out


def _align_vma(vma, *arrays):
    """pvary every operand up to the union vma — in-kernel dot_general
    requires matching varying-axes on its operands under shard_map."""
    out = []
    for a in arrays:
        missing = tuple(vma - getattr(jax.typeof(a), "vma", frozenset()))
        out.append(jax.lax.pvary(a, missing) if missing else a)
    return out


def _fwd_call(x, w1, b1, w2, b2, seed, rate: float, save_u: bool,
              interpret: bool):
    t, d = x.shape
    h = w1.shape[1]
    tile = _tile(x.dtype)
    tp = pl.cdiv(t, tile) * tile
    xp = _pad_tokens(x, tp)
    grid = (tp // tile,)
    vma = _vma(x, w1, b1, w2, b2, seed)
    xp, w1, b1, w2, b2, seed = _align_vma(vma, xp, w1, b1, w2, b2, seed)
    out_shape = [jax.ShapeDtypeStruct((tp, d), x.dtype, vma=vma)]
    out_specs = [pl.BlockSpec((tile, d), lambda i, s: (i, 0))]
    if save_u:
        out_shape.append(jax.ShapeDtypeStruct((tp, h), x.dtype, vma=vma))
        out_specs.append(pl.BlockSpec((tile, h), lambda i, s: (i, 0)))
        kernel = functools.partial(_fwd_kernel, rate=rate, interpret=interpret)
    else:
        def kernel(seed_ref, x_ref, w1_ref, b1_ref, w2_ref, b2_ref, y_ref):
            _fwd_kernel(seed_ref, x_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                        y_ref, None, rate=rate, interpret=interpret)
    outs = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((tile, d), lambda i, s: (i, 0)),
                pl.BlockSpec((d, h), lambda i, s: (0, 0)),
                pl.BlockSpec((1, h), lambda i, s: (0, 0)),
                pl.BlockSpec((h, d), lambda i, s: (0, 0)),
                pl.BlockSpec((1, d), lambda i, s: (0, 0)),
            ],
            out_specs=out_specs,
        ),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(seed, xp, w1, b1.reshape(1, h), w2, b2.reshape(1, d))
    y = outs[0][:t]
    return (y, outs[1]) if save_u else (y, None)


def _bwd_call(u_pad, dy, w2, seed, rate: float, interpret: bool):
    t, d = dy.shape
    h = w2.shape[0]
    tile = _tile(dy.dtype)  # same dtype as the fwd ⇒ same tiling ⇒ the
                            # per-tile seeds regenerate the same masks
    vma = _vma(u_pad, dy, w2, seed)
    u_pad, dy, w2, seed = _align_vma(vma, u_pad, dy, w2, seed)
    tp = u_pad.shape[0]
    dyp = _pad_tokens(dy, tp)
    grid = (tp // tile,)
    do, hd, du = pl.pallas_call(
        functools.partial(_bwd_kernel, rate=rate, interpret=interpret),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((tile, h), lambda i, s: (i, 0)),
                pl.BlockSpec((tile, d), lambda i, s: (i, 0)),
                pl.BlockSpec((h, d), lambda i, s: (0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((tile, d), lambda i, s: (i, 0)),
                pl.BlockSpec((tile, h), lambda i, s: (i, 0)),
                pl.BlockSpec((tile, h), lambda i, s: (i, 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((tp, d), dy.dtype, vma=vma),
            jax.ShapeDtypeStruct((tp, h), dy.dtype, vma=vma),
            jax.ShapeDtypeStruct((tp, h), dy.dtype, vma=vma),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(seed, u_pad, dyp, w2)
    return do[:t], hd, du  # hd/du stay padded (pad rows are exactly zero
                           # where it matters: du pad rows = 0 since dy pad
                           # rows = 0 ⇒ do = 0 ⇒ dhd = 0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _fused_mlp2d(x, w1, b1, w2, b2, seed, rate: float, interpret: bool):
    y, _ = _fwd_call(x, w1, b1, w2, b2, seed, rate, save_u=False,
                     interpret=interpret)
    return y


def _fused_mlp2d_fwd(x, w1, b1, w2, b2, seed, rate: float, interpret: bool):
    y, u = _fwd_call(x, w1, b1, w2, b2, seed, rate, save_u=True,
                     interpret=interpret)
    return y, (x, u, w1, w2, seed)


def _fused_mlp2d_bwd(rate: float, interpret: bool, res, dy):
    x, u_pad, w1, w2, seed = res
    t = x.shape[0]
    do, hd, du = _bwd_call(u_pad, dy, w2, seed, rate, interpret)
    du_t = du[:t]
    f32 = jnp.float32
    # weight grads contract over tokens; XLA fuses these with the psum
    dw2 = jax.lax.dot_general(
        hd, _pad_tokens(do, hd.shape[0]),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=f32,
    ).astype(w2.dtype)
    dw1 = jax.lax.dot_general(
        x, du_t, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=f32,
    ).astype(w1.dtype)
    dx = jax.lax.dot_general(
        du_t, w1, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32,
    ).astype(x.dtype)
    db1 = jnp.sum(du_t.astype(f32), axis=0).astype(x.dtype)
    db2 = jnp.sum(do.astype(f32), axis=0).astype(x.dtype)
    dseed = np.zeros((1,), dtype=jax.dtypes.float0)
    return dx, dw1, db1, dw2, db2, dseed


_fused_mlp2d.defvjp(_fused_mlp2d_fwd, _fused_mlp2d_bwd)


def fused_mlp(x, w1, b1, w2, b2, *, rate: float = 0.0, rng=None,
              deterministic: bool = True, interpret: bool | None = None):
    """y = drop(gelu(x @ w1 + b1) @ w2 + b2) with both dropouts fused.

    x: (..., D); w1: (D, H); w2: (H, D). Requires D, H multiples of 128
    (flagship: 768/2048) — callers fall back to the dense path otherwise.
    """
    if interpret is None:
        interpret = _use_interpret()
    rate = 0.0 if deterministic else float(rate)
    if rate > 0.0:
        if rng is None:
            raise ValueError("fused_mlp: dropout active but no rng given")
        seed = jax.random.randint(
            rng, (1,), 0, np.int32(2**31 - 1), dtype=jnp.int32
        )
    else:
        seed = jnp.zeros((1,), jnp.int32)
    lead = x.shape[:-1]
    d = x.shape[-1]
    x2 = x.reshape(-1, d)
    y = _fused_mlp2d(x2, w1, b1, w2, b2, seed, rate, interpret)
    return y.reshape(*lead, d)


# ---------------------------------------------------------------------------
# LayerNorm-fused variant (mlp_impl='fused_ln'): the pre-MLP LayerNorm runs
# INSIDE the kernel.
#
# Why: a pallas call is opaque to XLA, so with the plain fused kernel the
# norm2 LayerNorm output (tokens, dim — ~34 MB bf16 at the flagship 22k-token
# batch) must materialize in HBM every layer just to feed the kernel, and the
# backward pays the mirrored traffic for the dxn round-trip. Folding LN into
# the kernel removes the xn write+read in the forward and computes the LN
# backward in-core (the bwd kernel already holds dxn = du @ W1ᵀ in VMEM):
# ~100 MB/layer of HBM traffic saved at the flagship shape.
#
# Layout contract: the LN scale/bias live under the same 'norm2' scope with
# nn.LayerNorm's param names (scale/bias), so checkpoints are byte-compatible
# with the dense and 'fused' paths (models/layers.py::_LNParams).
# ---------------------------------------------------------------------------


def _ln_rows(xf, eps: float):
    """Row LayerNorm in fp32: returns (xhat, rstd) with
    xhat = (x - mean) * rsqrt(var + eps) — rstd so backward kernels reuse
    the statistics instead of recomputing them."""
    mu = jnp.mean(xf, axis=1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    return xc * rstd, rstd


def _ln_fwd_kernel(seed_ref, x_ref, g_ref, bt_ref, w1_ref, b1_ref,
                   w2_ref, b2_ref, y_ref, u_ref,
                   *, rate: float, eps: float, interpret: bool):
    i = pl.program_id(0)
    seed = seed_ref[0]
    xhat, _ = _ln_rows(x_ref[:].astype(jnp.float32), eps)
    xn = xhat * g_ref[:].astype(jnp.float32) + bt_ref[:].astype(jnp.float32)
    xn = xn.astype(x_ref.dtype)
    u = jnp.dot(xn, w1_ref[:], preferred_element_type=jnp.float32)
    u = u + b1_ref[:].astype(jnp.float32)
    if u_ref is not None:
        u_ref[:] = u.astype(u_ref.dtype)
    h = _gelu(u)
    if rate > 0.0:
        keep = 1.0 - rate
        m1 = _bits(h.shape, seed, i, 0, interpret) < _thresh(rate)
        h = jnp.where(m1, h * (1.0 / keep), 0.0)
    h = h.astype(x_ref.dtype)
    o = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)
    o = o + b2_ref[:].astype(jnp.float32)
    if rate > 0.0:
        keep = 1.0 - rate
        m2 = _bits(o.shape, seed, i, 1, interpret) < _thresh(rate)
        o = jnp.where(m2, o * (1.0 / keep), 0.0)
    y_ref[:] = o.astype(y_ref.dtype)


def _ln_bwd_kernel(seed_ref, x_ref, u_ref, dy_ref, g_ref, bt_ref,
                   w1_ref, w2_ref,
                   do_ref, hd_ref, du_ref, xn_ref, dx_ref, dg_ref, db_ref,
                   *, rate: float, eps: float, interpret: bool):
    """Per token-tile backward: regenerate masks, recompute GELU and the LN
    statistics, run BOTH in-kernel matmuls (dy@W2ᵀ and du@W1ᵀ), and apply
    the LayerNorm backward in-core. Emits xn (for the XLA-side dW1
    contraction), per-tile dgamma/dbeta partial sums, and dx directly."""
    i = pl.program_id(0)
    seed = seed_ref[0]
    f32 = jnp.float32
    xhat, rstd = _ln_rows(x_ref[:].astype(f32), eps)
    g = g_ref[:].astype(f32)
    xn = xhat * g + bt_ref[:].astype(f32)
    xn_ref[:] = xn.astype(xn_ref.dtype)

    u = u_ref[:].astype(f32)
    dy = dy_ref[:].astype(f32)
    h = _gelu(u)
    if rate > 0.0:
        keep = 1.0 - rate
        m1 = _bits(u.shape, seed, i, 0, interpret) < _thresh(rate)
        m2 = _bits(dy.shape, seed, i, 1, interpret) < _thresh(rate)
        do = jnp.where(m2, dy * (1.0 / keep), 0.0)
        hd = jnp.where(m1, h * (1.0 / keep), 0.0)
    else:
        do = dy
        hd = h
    do = do.astype(do_ref.dtype)
    do_ref[:] = do
    hd_ref[:] = hd.astype(hd_ref.dtype)
    dhd = jax.lax.dot_general(
        do, w2_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32,
    )
    if rate > 0.0:
        keep = 1.0 - rate
        dhd = jnp.where(m1, dhd * (1.0 / keep), 0.0)
    du = dhd * _gelu_grad(u)
    du_ref[:] = du.astype(du_ref.dtype)

    # dxn = du @ W1ᵀ : (T, H) x (D, H) contracting H — bf16 operands like
    # the XLA GEMM this replaces, fp32 accumulation
    dxn = jax.lax.dot_general(
        du.astype(x_ref.dtype), w1_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32,
    )
    # LN backward (pad rows: dy=0 ⇒ du=0 ⇒ dxn=0 ⇒ dx=0, partials 0).
    # dgamma/dbeta accumulate into ONE (8, d) block with a constant output
    # index map — the block persists in VMEM across the sequential grid
    # (TPU blocks must be ≥(8, 128); a (1, d) per-tile partial is unlowered)
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


def _ln_fwd_call(x, g, bt, w1, b1, w2, b2, seed, rate: float, eps: float,
                 save_u: bool, interpret: bool):
    t, d = x.shape
    h = w1.shape[1]
    tile = _tile(x.dtype)
    tp = pl.cdiv(t, tile) * tile
    xp = _pad_tokens(x, tp)
    grid = (tp // tile,)
    vma = _vma(x, g, bt, w1, b1, w2, b2, seed)
    xp, g, bt, w1, b1, w2, b2, seed = _align_vma(
        vma, xp, g, bt, w1, b1, w2, b2, seed
    )
    out_shape = [jax.ShapeDtypeStruct((tp, d), x.dtype, vma=vma)]
    out_specs = [pl.BlockSpec((tile, d), lambda i, s: (i, 0))]
    if save_u:
        out_shape.append(jax.ShapeDtypeStruct((tp, h), x.dtype, vma=vma))
        out_specs.append(pl.BlockSpec((tile, h), lambda i, s: (i, 0)))
        kernel = functools.partial(
            _ln_fwd_kernel, rate=rate, eps=eps, interpret=interpret
        )
    else:
        def kernel(seed_ref, x_ref, g_ref, bt_ref, w1_ref, b1_ref, w2_ref,
                   b2_ref, y_ref):
            _ln_fwd_kernel(seed_ref, x_ref, g_ref, bt_ref, w1_ref, b1_ref,
                           w2_ref, b2_ref, y_ref, None,
                           rate=rate, eps=eps, interpret=interpret)
    outs = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((tile, d), lambda i, s: (i, 0)),
                pl.BlockSpec((1, d), lambda i, s: (0, 0)),
                pl.BlockSpec((1, d), lambda i, s: (0, 0)),
                pl.BlockSpec((d, h), lambda i, s: (0, 0)),
                pl.BlockSpec((1, h), lambda i, s: (0, 0)),
                pl.BlockSpec((h, d), lambda i, s: (0, 0)),
                pl.BlockSpec((1, d), lambda i, s: (0, 0)),
            ],
            out_specs=out_specs,
        ),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(seed, xp, g.reshape(1, d), bt.reshape(1, d),
      w1, b1.reshape(1, h), w2, b2.reshape(1, d))
    y = outs[0][:t]
    return (y, outs[1]) if save_u else (y, None)


def _ln_bwd_call(x, u_pad, dy, g, bt, w1, w2, seed, rate: float, eps: float,
                 interpret: bool):
    t, d = dy.shape
    h = w2.shape[0]
    tile = _tile(dy.dtype)
    vma = _vma(x, u_pad, dy, g, bt, w1, w2, seed)
    x, u_pad, dy, g, bt, w1, w2, seed = _align_vma(
        vma, x, u_pad, dy, g, bt, w1, w2, seed
    )
    tp = u_pad.shape[0]
    xp = _pad_tokens(x, tp)
    dyp = _pad_tokens(dy, tp)
    n_tiles = tp // tile
    grid = (n_tiles,)
    do, hd, du, xn, dx, dgp, dbp = pl.pallas_call(
        functools.partial(
            _ln_bwd_kernel, rate=rate, eps=eps, interpret=interpret
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((tile, d), lambda i, s: (i, 0)),
                pl.BlockSpec((tile, h), lambda i, s: (i, 0)),
                pl.BlockSpec((tile, d), lambda i, s: (i, 0)),
                pl.BlockSpec((1, d), lambda i, s: (0, 0)),
                pl.BlockSpec((1, d), lambda i, s: (0, 0)),
                pl.BlockSpec((d, h), lambda i, s: (0, 0)),
                pl.BlockSpec((h, d), lambda i, s: (0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((tile, d), lambda i, s: (i, 0)),
                pl.BlockSpec((tile, h), lambda i, s: (i, 0)),
                pl.BlockSpec((tile, h), lambda i, s: (i, 0)),
                pl.BlockSpec((tile, d), lambda i, s: (i, 0)),
                pl.BlockSpec((tile, d), lambda i, s: (i, 0)),
                pl.BlockSpec((8, d), lambda i, s: (0, 0)),
                pl.BlockSpec((8, d), lambda i, s: (0, 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((tp, d), dy.dtype, vma=vma),
            jax.ShapeDtypeStruct((tp, h), dy.dtype, vma=vma),
            jax.ShapeDtypeStruct((tp, h), dy.dtype, vma=vma),
            jax.ShapeDtypeStruct((tp, d), dy.dtype, vma=vma),
            jax.ShapeDtypeStruct((tp, d), dy.dtype, vma=vma),
            jax.ShapeDtypeStruct((8, d), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((8, d), jnp.float32, vma=vma),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(seed, xp, u_pad, dyp, g.reshape(1, d), bt.reshape(1, d), w1, w2)
    return do[:t], hd, du, xn, dx[:t], dgp, dbp


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def _fused_ln_mlp2d(x, g, bt, w1, b1, w2, b2, seed,
                    rate: float, eps: float, interpret: bool):
    y, _ = _ln_fwd_call(x, g, bt, w1, b1, w2, b2, seed, rate, eps,
                        save_u=False, interpret=interpret)
    return y


def _fused_ln_mlp2d_fwd(x, g, bt, w1, b1, w2, b2, seed,
                        rate: float, eps: float, interpret: bool):
    y, u = _ln_fwd_call(x, g, bt, w1, b1, w2, b2, seed, rate, eps,
                        save_u=True, interpret=interpret)
    return y, (x, u, g, bt, w1, w2, seed)


def _fused_ln_mlp2d_bwd(rate: float, eps: float, interpret: bool, res, dy):
    x, u_pad, g, bt, w1, w2, seed = res
    t = x.shape[0]
    do, hd, du, xn, dx, dgp, dbp = _ln_bwd_call(
        x, u_pad, dy, g, bt, w1, w2, seed, rate, eps, interpret
    )
    du_t = du[:t]
    f32 = jnp.float32
    dw2 = jax.lax.dot_general(
        hd, _pad_tokens(do, hd.shape[0]),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=f32,
    ).astype(w2.dtype)
    # dW1 contracts xn over ALL rows incl. pads: pad-row du is exactly 0
    # (dy pad rows are 0), so the nonzero pad-row xn (= beta) is harmless
    dw1 = jax.lax.dot_general(
        xn, du, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=f32,
    ).astype(w1.dtype)
    db1 = jnp.sum(du_t.astype(f32), axis=0).astype(x.dtype)
    db2 = jnp.sum(do.astype(f32), axis=0).astype(x.dtype)
    dg = jnp.sum(dgp, axis=0).astype(g.dtype)
    dbt = jnp.sum(dbp, axis=0).astype(bt.dtype)
    dseed = np.zeros((1,), dtype=jax.dtypes.float0)
    return dx, dg, dbt, dw1, db1, dw2, db2, dseed


_fused_ln_mlp2d.defvjp(_fused_ln_mlp2d_fwd, _fused_ln_mlp2d_bwd)


def fused_ln_mlp(x, g, bt, w1, b1, w2, b2, *, eps: float = 1e-5,
                 rate: float = 0.0, rng=None, deterministic: bool = True,
                 interpret: bool | None = None):
    """y = drop(gelu(LN(x; g, bt) @ w1 + b1) @ w2 + b2) — the pre-MLP
    LayerNorm fused into the same pallas kernel as the MLP (torch LN
    semantics, eps 1e-5 to match the reference ``ViT_face.py:128-142``
    PreNorm block). Same 128-multiple dim requirements as :func:`fused_mlp`.
    """
    if interpret is None:
        interpret = _use_interpret()
    rate = 0.0 if deterministic else float(rate)
    if rate > 0.0:
        if rng is None:
            raise ValueError("fused_ln_mlp: dropout active but no rng given")
        seed = jax.random.randint(
            rng, (1,), 0, np.int32(2**31 - 1), dtype=jnp.int32
        )
    else:
        seed = jnp.zeros((1,), jnp.int32)
    lead = x.shape[:-1]
    d = x.shape[-1]
    x2 = x.reshape(-1, d)
    y = _fused_ln_mlp2d(x2, g, bt, w1, b1, w2, b2, seed, rate, float(eps),
                        interpret)
    return y.reshape(*lead, d)
