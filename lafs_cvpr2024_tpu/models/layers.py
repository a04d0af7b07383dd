"""Transformer core layers (flax.linen).

Faithful to the reference transformer (``face_pre_pro/ViT_face.py:100-213``)
including its quirks, which matter for checkpoint interop:

- attention scale is ``dim ** -0.5`` (the MODEL dim, not head dim —
  ``ViT_face.py:145``),
- ``inner_dim = heads * dim_head`` may differ from ``dim`` (768-d model with
  11 heads × 64 = 704 inner),
- pre-norm residual blocks with DropPath on the residual branch
  (``Residual_droppath``, ``ViT_face.py:106-112``).

All math is jnp; XLA fuses LN/GELU/softmax into the matmuls.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def drop_path(x: jnp.ndarray, rate: float, deterministic: bool, rng) -> jnp.ndarray:
    """Stochastic depth per sample (timm DropPath semantics: keep-prob scaling)."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape)
    return jnp.where(mask, x / keep, 0.0)


class FastDropout(nn.Module):
    """Dropout via uint16 threshold masks.

    Same Bernoulli semantics as ``nn.Dropout`` but draws 16 random bits per
    element instead of a float32 uniform — half the PRNG traffic on the
    biggest tensors in the step (the (tokens, mlp_dim) activations). The
    keep probability is quantized to 1/65536 (max deviation 7.6e-6 from the
    configured rate — immaterial). Mask generation measured ~10% of the SSL
    train step with the stock dropout under the rbg PRNG.
    """

    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if deterministic or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        thresh = jnp.uint16(min(int(round(keep * 65536.0)), 65535))
        bits = jax.random.bits(self.make_rng("dropout"), x.shape, jnp.uint16)
        return jnp.where(bits < thresh, x / keep, jnp.zeros_like(x))


class _LinearParams(nn.Module):
    """Parameter holder matching ``nn.Dense``'s tree (kernel/bias) so the
    fused-MLP path loads the same checkpoints as the dense path."""

    in_dim: int
    features: int

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.in_dim, self.features),
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return k, b


class SyncableBN(nn.Module):
    """BatchNorm with optional cross-device stat sync (SyncBatchNorm when
    ``axis_name`` names a mesh axis; plain BN otherwise). Torch-default
    momentum/eps; eval always uses running stats with NO collective (the
    eval graph must not require a mesh). Shared by the MobileNetV3 and
    iResNet backbones — one definition, one sync-gating behavior."""

    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool):
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            axis_name=self.axis_name if train else None,
            name="bn",
        )(x)


class _KernelParams(nn.Module):
    """Parameter holder matching a bias-free ``nn.Dense``'s tree (kernel
    only) so the LN-fused QKV path (``attn_impl='lnqkv'``) loads the same
    checkpoints as the dense path."""

    in_dim: int
    features: int

    @nn.compact
    def __call__(self):
        return self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.in_dim, self.features),
        )


class _LNParams(nn.Module):
    """Parameter holder matching ``nn.LayerNorm``'s tree (scale/bias) so the
    LN-fused MLP path (``mlp_impl='fused_ln'``) loads the same checkpoints
    as the dense/'fused' paths."""

    dim: int

    @nn.compact
    def __call__(self):
        g = self.param("scale", nn.initializers.ones, (self.dim,))
        b = self.param("bias", nn.initializers.zeros, (self.dim,))
        return g, b


class FeedForward(nn.Module):
    """Reference MLP (``ViT_face.py:128-142``): Linear, GELU(exact), Dropout,
    Linear, Dropout. ``mlp_impl='fused'`` runs the whole block as ONE Pallas
    kernel (hidden activation + dropout masks never touch HBM — see
    ``ops/fused_mlp.py``); param tree is identical to the dense path.
    When the caller passes ``ln=(scale, bias)`` the preceding LayerNorm is
    fused into the same kernel (``mlp_impl='fused_ln'``)."""

    dim: int
    hidden_dim: int
    dropout: float = 0.0
    mlp_impl: str = "dense"  # 'dense' | 'fused' | 'fused_ln' (pallas, %128)

    @nn.compact
    def __call__(self, x, deterministic: bool = True, ln=None):
        dims_ok = self.dim % 128 == 0 and self.hidden_dim % 128 == 0
        if ln is not None and not dims_ok:
            raise ValueError(
                "FeedForward(ln=...) requires dim/hidden_dim % 128 == 0 — "
                "the caller must apply the LayerNorm itself otherwise"
            )
        if ln is not None and dims_ok:
            from ..ops.fused_mlp import fused_ln_mlp

            g, bt = ln
            w1, b1 = _LinearParams(self.dim, self.hidden_dim, name="fc1")()
            w2, b2 = _LinearParams(self.hidden_dim, self.dim, name="fc2")()
            rng = None
            if not deterministic and self.dropout > 0.0:
                rng = self.make_rng("dropout")
            return fused_ln_mlp(
                x, g.astype(x.dtype), bt.astype(x.dtype),
                w1.astype(x.dtype), b1.astype(x.dtype),
                w2.astype(x.dtype), b2.astype(x.dtype),
                rate=self.dropout, rng=rng, deterministic=deterministic,
            )
        # 'fused_ln' with no ln supplied degrades to the plain fused kernel
        # (the caller applied the LayerNorm itself)
        if self.mlp_impl in ("fused", "fused_ln") and dims_ok:
            from ..ops.fused_mlp import fused_mlp

            w1, b1 = _LinearParams(self.dim, self.hidden_dim, name="fc1")()
            w2, b2 = _LinearParams(self.hidden_dim, self.dim, name="fc2")()
            rng = None
            if not deterministic and self.dropout > 0.0:
                rng = self.make_rng("dropout")
            return fused_mlp(
                x, w1.astype(x.dtype), b1.astype(x.dtype),
                w2.astype(x.dtype), b2.astype(x.dtype),
                rate=self.dropout, rng=rng, deterministic=deterministic,
            )
        x = nn.Dense(self.hidden_dim, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = FastDropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(self.dim, name="fc2")(x)
        x = FastDropout(self.dropout)(x, deterministic=deterministic)
        return x


class Attention(nn.Module):
    dim: int
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0
    attn_impl: str = "einsum"  # 'einsum' | 'lnqkv' (einsum scores, LN-fused
                               # QKV pallas) | 'fused' (short-seq pallas) |
                               # 'flash'

    @nn.compact
    def __call__(self, x, deterministic: bool = True, ln=None):
        inner = self.heads * self.dim_head
        b, n, _ = x.shape
        if ln is not None:
            # attn_impl='lnqkv': the caller passes the norm1 params UNAPPLIED
            # and x un-normalized — LN runs inside the QKV projection kernel
            # (the normalized activations never round-trip HBM). Param tree
            # identical to the dense path (ops/fused_ln_linear.py).
            from ..ops.fused_ln_linear import fused_ln_linear

            g, bt = ln
            w = _KernelParams(self.dim, inner * 3, name="to_qkv")()
            qkv = fused_ln_linear(
                x, g.astype(x.dtype), bt.astype(x.dtype), w.astype(x.dtype)
            )
        else:
            qkv = nn.Dense(inner * 3, use_bias=False, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads_first(t):
            return t.reshape(b, n, self.heads, self.dim_head).transpose(0, 2, 1, 3)

        q, k, v = heads_first(q), heads_first(k), heads_first(v)
        scale = self.dim ** -0.5  # reference quirk: model-dim scaling
        if self.attn_impl == "fused" and 128 <= n <= 512:
            # short locals (37 tokens) stay on the einsum path: their score
            # tensors are small and the kernel's 128-pad would waste 3.5x
            # whole-sequence pallas kernel: scores stay in VMEM, softmax in
            # fp32 (ops/fused_attention.py); short sequences only
            from ..ops.fused_attention import fused_attention

            out = fused_attention(q, k, v, scale)
        elif self.attn_impl == "flash":
            out = _flash_attention(q, k, v, scale)
        elif self.attn_impl == "packed_av":
            out = _packed_av_attention(q, k, v, scale)
        elif self.attn_impl == "packed_qk":
            out = _packed_qk_attention(q, k, v, scale)
        else:
            # NOTE: jax.nn.dot_product_attention wins isolated microbenchmarks
            # (~2x) but makes the FULL SSL step 10% slower — the explicit
            # einsums fuse better with the surrounding graph. End-to-end wins.
            logits = jnp.einsum("bhid,bhjd->bhij", q, k) * scale
            attn = jax.nn.softmax(logits, axis=-1)
            # visualization hook (reference stores ``attention_score`` on
            # every Attention module, ViT_face.py:177): recorded ONLY when
            # the caller makes "intermediates" mutable —
            # ``apply(..., mutable=["intermediates"])`` — a no-op (and no
            # extra compute: the probs already exist on this path) for
            # every training/eval graph. The fused/flash impls never
            # materialize the probs, so capture requires the default
            # 'einsum' path.
            self.sow("intermediates", "attn_probs", attn)
            out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)
        out = nn.Dense(self.dim, name="to_out")(out)
        out = FastDropout(self.dropout)(out, deterministic=deterministic)
        return out


def _flash_attention(q, k, v, scale: float):
    """Fused pallas flash attention (fwd + custom-vjp bwd kernels): never
    materializes the (B, H, N, N) logits in HBM. Sequences are padded to the
    kernel's 128-multiple block size with segment-id masking, so padded keys
    can't attend to / be attended by real tokens; padded query rows are
    sliced off."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        SegmentIds,
        flash_attention,
    )

    b, h, n, d = q.shape
    npad = -(-n // 128) * 128
    pad = npad - n
    if pad:
        padded = lambda t: jnp.pad(t, ((0, 0), (0, 0), (0, pad), (0, 0)))
        q, k, v = padded(q), padded(k), padded(v)
        seg = jnp.broadcast_to(
            (jnp.arange(npad) >= n).astype(jnp.int32)[None], (b, npad)
        )
        sids = SegmentIds(q=seg, kv=seg)
    else:
        sids = None
    out = flash_attention(q, k, v, segment_ids=sids, sm_scale=scale)
    return out[:, :, :n, :] if pad else out


def _pad_heads_even(q, k, v):
    """Zero-pad the head axis to an even count (the packed variants pair
    heads). A zero q/k head softmaxes to uniform attention over zero v —
    its output is zero and gets sliced off; the reference's 11-head
    geometry pays ~9% extra attention FLOPs for the padding, which is part
    of the measured verdict on these packings."""
    h = q.shape[1]
    if h % 2:
        pad = ((0, 0), (0, 1), (0, 0), (0, 0))
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
    return q, k, v, h


def _packed_av_attention(q, k, v, scale: float):
    """d_head-geometry EXPERIMENT (docs/PERF.md §round-3): AV contraction
    with head PAIRS packed into the 128-lane output dim.

    Plain AV is ``(n, n) @ (n, 64)`` per head — the output minor dim (64)
    fills half a 128-lane MXU tile. Here pairs (2g, 2g+1) compute
    ``[A_2g | A_2g+1] (n, 2n) @ blockdiag(V_2g, V_2g+1) (2n, 128)``
    = ``[A_2g·V_2g | A_2g+1·V_2g+1] (n, 128)`` — all 128 output lanes
    live, at 2x the nominal MACs (which equals the lane-padded MAC count
    of the unpacked form, so the packing can only win if XLA's d=64
    handling is worse than simple lane padding). QK^T + softmax stay in
    the standard batched form.
    """
    b, _, n, d = q.shape
    q, k, v, h0 = _pad_heads_even(q, k, v)
    h = q.shape[1]
    h2 = h // 2
    logits = jnp.einsum("bhid,bhjd->bhij", q, k) * scale
    attn = jax.nn.softmax(logits, axis=-1)
    # A2[b, g, i, :] = [attn[2g, i, :], attn[2g+1, i, :]]  -> (b, h2, n, 2n)
    a2 = (
        attn.reshape(b, h2, 2, n, n)
        .transpose(0, 1, 3, 2, 4)
        .reshape(b, h2, n, 2 * n)
    )
    vp = v.reshape(b, h2, 2, n, d)
    z = jnp.zeros_like(vp[:, :, 0])
    v2 = jnp.concatenate(
        [
            jnp.concatenate([vp[:, :, 0], z], axis=-1),
            jnp.concatenate([z, vp[:, :, 1]], axis=-1),
        ],
        axis=2,
    )  # (b, h2, 2n, 2d) block-diagonal
    out2 = jnp.einsum("bhij,bhjd->bhid", a2, v2)  # (b, h2, n, 2d)
    out = (
        out2.reshape(b, h2, n, 2, d).transpose(0, 1, 3, 2, 4).reshape(b, h, n, d)
    )
    return out[:, :h0]


def _packed_qk_attention(q, k, v, scale: float):
    """d_head-geometry EXPERIMENT (docs/PERF.md §round-3): QK^T with head
    pairs packed into a 128-wide contraction.

    Plain QK^T contracts over d=64 — half the MXU's 128-deep systolic
    contraction. Packing ``blockdiag(Q_2g, Q_2g+1) (2n, 128) @
    blockdiag(K_2g, K_2g+1)^T (128, 2n)`` fills the contraction but
    computes a (2n, 2n) score matrix whose off-diagonal blocks are
    discarded — 2x the lane-padded MACs of the unpacked form, so this is
    expected NEGATIVE a priori; it exists to put a measured number on the
    'pack 2 heads into the 128-lane contraction' idea. AV stays standard.
    """
    b, _, n, d = q.shape
    q, k, v, h0 = _pad_heads_even(q, k, v)
    h = q.shape[1]
    h2 = h // 2

    def blockdiag(t):
        tp = t.reshape(b, h2, 2, n, d)
        z = jnp.zeros_like(tp[:, :, 0])
        return jnp.concatenate(
            [
                jnp.concatenate([tp[:, :, 0], z], axis=-1),
                jnp.concatenate([z, tp[:, :, 1]], axis=-1),
            ],
            axis=2,
        )  # (b, h2, 2n, 2d)

    s2 = jnp.einsum("bhid,bhjd->bhij", blockdiag(q), blockdiag(k)) * scale
    s2 = s2.reshape(b, h2, 2, n, 2, n)
    logits = jnp.concatenate(
        [s2[:, :, 0, :, 0][:, :, None], s2[:, :, 1, :, 1][:, :, None]], axis=2
    ).reshape(b, h, n, n)
    attn = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhij,bhjd->bhid", attn, v)
    return out[:, :h0]


class TransformerBlock(nn.Module):
    dim: int
    heads: int
    dim_head: int
    mlp_dim: int
    dropout: float = 0.0
    drop_path_rate: float = 0.1
    attn_impl: str = "einsum"
    mlp_impl: str = "dense"

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.attn_impl == "lnqkv" and self.dim % 128 == 0:
            # norm1 params under the same scope/names as nn.LayerNorm,
            # applied INSIDE the QKV projection kernel
            ln1 = _LNParams(self.dim, name="norm1")()
            h = Attention(
                self.dim, self.heads, self.dim_head, self.dropout,
                self.attn_impl, name="attn"
            )(x, deterministic, ln=ln1)
        else:
            h = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)  # torch LN eps
            h = Attention(
                self.dim, self.heads, self.dim_head, self.dropout,
                self.attn_impl, name="attn"
            )(h, deterministic)
        if not deterministic and self.drop_path_rate > 0:
            h = drop_path(h, self.drop_path_rate, deterministic, self.make_rng("dropout"))
        x = x + h
        if (
            self.mlp_impl == "fused_ln"
            and self.dim % 128 == 0
            and self.mlp_dim % 128 == 0
        ):
            # LN params held under the same 'norm2' scope/names as
            # nn.LayerNorm, applied INSIDE the pallas MLP kernel — the
            # normalized activations never round-trip HBM.
            ln = _LNParams(self.dim, name="norm2")()
            h = FeedForward(
                self.dim, self.mlp_dim, self.dropout, self.mlp_impl,
                name="mlp",
            )(x, deterministic, ln=ln)
        else:
            h = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
            h = FeedForward(
                self.dim, self.mlp_dim, self.dropout, self.mlp_impl,
                name="mlp",
            )(h, deterministic)
        if not deterministic and self.drop_path_rate > 0:
            h = drop_path(h, self.drop_path_rate, deterministic, self.make_rng("dropout"))
        return x + h


class Transformer(nn.Module):
    """Depth-stacked pre-norm transformer (reference ``Transformer``,
    ``ViT_face.py:184-213``; uniform DropPath 0.1 per residual branch)."""

    dim: int
    depth: int
    heads: int
    dim_head: int
    mlp_dim: int
    dropout: float = 0.0
    drop_path_rate: float = 0.1
    attn_impl: str = "einsum"
    mlp_impl: str = "dense"
    remat_policy: str = "none"  # 'none' | 'dots' | 'all' — trade backward
                                # HBM traffic for recompute FLOPs

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        block_cls = TransformerBlock
        if self.remat_policy != "none":
            policy = (
                None if self.remat_policy == "all"
                else jax.checkpoint_policies.dots_with_no_batch_dims_saveable
            )
            block_cls = nn.remat(
                TransformerBlock, policy=policy, static_argnums=(2,)
            )
        for i in range(self.depth):
            x = block_cls(
                self.dim,
                self.heads,
                self.dim_head,
                self.mlp_dim,
                self.dropout,
                self.drop_path_rate,
                self.attn_impl,
                self.mlp_impl,
                name=f"layers_{i}",
            )(x, deterministic)
        return x
