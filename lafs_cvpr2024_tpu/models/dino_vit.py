"""DINO VisionTransformer (vit_tiny / vit_small / vit_base).

The reference's ``--arch vit_*`` path (``vision_transformer.py:27-262``):
standard pre-norm ViT with qkv bias, per-head scaling, linearly-increasing
DropPath, bicubic positional-embedding interpolation for variable input
resolutions (``vision_transformer.py:174-194``), plus introspection hooks
(``get_last_selfattention`` / ``get_intermediate_layers``).
"""

from __future__ import annotations

import math
from typing import List

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import drop_path


class DinoAttention(nn.Module):
    dim: int
    num_heads: int = 8
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        b, n, c = x.shape
        head_dim = self.dim // self.num_heads
        qkv = nn.Dense(self.dim * 3, use_bias=self.qkv_bias, name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, self.num_heads, head_dim).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = jnp.einsum("bhid,bhjd->bhij", q, k) * head_dim ** -0.5
        attn = jax.nn.softmax(attn, axis=-1)
        # visualization capture (the reference stores attention_score per
        # layer, ViT_face.py:177); no-op unless "intermediates" is mutable
        self.sow("intermediates", "attn_probs", attn)
        attn = nn.Dropout(self.attn_drop)(attn, deterministic=deterministic)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
        out = nn.Dense(self.dim, name="proj")(out)
        out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
        return out, attn


class DinoBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path_rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True, return_attention: bool = False):
        y, attn = DinoAttention(
            self.dim, self.num_heads, attn_drop=self.attn_drop,
            proj_drop=self.drop, name="attn",
        )(nn.LayerNorm(epsilon=1e-6, name="norm1")(x), deterministic)
        if return_attention:
            return attn
        if not deterministic and self.drop_path_rate > 0:
            y = drop_path(y, self.drop_path_rate, deterministic, self.make_rng("dropout"))
        x = x + y
        h = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        h = nn.Dense(int(self.dim * self.mlp_ratio), name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dropout(self.drop)(h, deterministic=deterministic)
        h = nn.Dense(self.dim, name="fc2")(h)
        h = nn.Dropout(self.drop)(h, deterministic=deterministic)
        if not deterministic and self.drop_path_rate > 0:
            h = drop_path(h, self.drop_path_rate, deterministic, self.make_rng("dropout"))
        return x + h


def interpolate_pos_encoding(pos_embed: jnp.ndarray, npatch: int, w: int, h: int,
                             patch_size: int) -> jnp.ndarray:
    """Bicubic pos-embed interpolation (``vision_transformer.py:174-194``)."""
    n = pos_embed.shape[1] - 1
    if npatch == n and w == h:
        return pos_embed
    class_pos = pos_embed[:, :1]
    patch_pos = pos_embed[:, 1:]
    dim = pos_embed.shape[-1]
    w0, h0 = w // patch_size, h // patch_size
    s = int(math.sqrt(n))
    grid = patch_pos.reshape(1, s, s, dim)
    grid = jax.image.resize(grid, (1, w0, h0, dim), method="bicubic")
    return jnp.concatenate([class_pos, grid.reshape(1, w0 * h0, dim)], axis=1)


class VisionTransformer(nn.Module):
    img_size: int = 224
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    num_classes: int = 0

    def setup(self):
        self.cls_token = self.param(
            "cls_token", nn.initializers.truncated_normal(0.02), (1, 1, self.embed_dim)
        )
        self.pos_embed = self.param(
            "pos_embed",
            nn.initializers.truncated_normal(0.02),
            (1, (self.img_size // self.patch_size) ** 2 + 1, self.embed_dim),
        )
        self.patch_proj = nn.Conv(
            self.embed_dim,
            (self.patch_size, self.patch_size),
            strides=self.patch_size,
            name="patch_embed",
        )
        import numpy as _np

        dpr = [float(x) for x in _np.linspace(0, self.drop_path_rate, self.depth)]
        self.blocks = [
            DinoBlock(
                self.embed_dim, self.num_heads, self.mlp_ratio,
                self.drop_rate, self.attn_drop_rate, dpr[i], name=f"block_{i}",
            )
            for i in range(self.depth)
        ]
        self.norm = nn.LayerNorm(epsilon=1e-6, name="norm")
        self.pos_drop = nn.Dropout(self.drop_rate)
        if self.num_classes > 0:
            self.head = nn.Dense(self.num_classes, name="head")

    def prepare_tokens(self, x, deterministic=True):
        b, w, h, _ = x.shape
        tok = self.patch_proj(x).reshape(b, -1, self.embed_dim)
        cls = jnp.broadcast_to(self.cls_token, (b, 1, self.embed_dim))
        tok = jnp.concatenate([cls, tok], axis=1)
        pos = interpolate_pos_encoding(
            self.pos_embed, tok.shape[1] - 1, w, h, self.patch_size
        )
        tok = tok + pos
        return self.pos_drop(tok, deterministic=deterministic)

    def __call__(self, x, train: bool = False):
        tok = self.prepare_tokens(x, deterministic=not train)
        for blk in self.blocks:
            tok = blk(tok, deterministic=not train)
        tok = self.norm(tok)
        out = tok[:, 0]
        if self.num_classes > 0:
            return self.head(out)
        return out

    def get_last_selfattention(self, x):
        tok = self.prepare_tokens(x)
        for blk in self.blocks[:-1]:
            tok = blk(tok)
        return self.blocks[-1](tok, return_attention=True)

    def get_intermediate_layers(self, x, n: int = 1) -> List[jnp.ndarray]:
        tok = self.prepare_tokens(x)
        out = []
        for i, blk in enumerate(self.blocks):
            tok = blk(tok)
            if len(self.blocks) - i <= n:
                out.append(self.norm(tok))
        return out


def vit_tiny(patch_size=16, **kw):
    return VisionTransformer(patch_size=patch_size, embed_dim=192, depth=12, num_heads=3, **kw)


def vit_small(patch_size=16, **kw):
    return VisionTransformer(patch_size=patch_size, embed_dim=384, depth=12, num_heads=6, **kw)


def vit_base(patch_size=16, **kw):
    return VisionTransformer(patch_size=patch_size, embed_dim=768, depth=12, num_heads=12, **kw)
