"""Margin heads and the DINO projection head.

- CosFace (reference ``face_pre_pro/ViT_face.py:26-96``): ``s·(cosθ − m·y)``
  with s=64, m=0.4, accepting hard int labels or soft (mixup) one-hot rows.
  The class-sharded (tensor-parallel) variant lives in
  ``parallel/sharded_cosface.py``.
- ArcFace / SFace: referenced by the reference's loss registry
  (``ViT_face.py:654-657``) but never defined there; implemented here for
  completeness with standard insightface semantics.
- DINOHead (reference ``vision_transformer.py:265-301``): 3-layer MLP →
  L2-normalize → weight-normed linear to ``out_dim``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def _l2norm(x, axis=-1, eps=1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)


def cosface_logits(embeddings, weight, labels, s=64.0, m=0.4, num_classes=None):
    """Pure CosFace margin math: weight (C, D) rows are class centers.

    ``labels`` is (B,) int or (B, C) soft one-hot (mixup path,
    ``ViT_face.py:69-73`` — the margin is scaled by the soft label value).
    """
    cosine = _l2norm(embeddings) @ _l2norm(weight).T
    if labels.ndim > 1:
        one_hot = labels.astype(cosine.dtype)
    else:
        one_hot = jax.nn.one_hot(labels, num_classes or weight.shape[0], dtype=cosine.dtype)
    return s * (cosine - m * one_hot)


class CosFace(nn.Module):
    in_features: int
    out_features: int
    s: float = 64.0
    m: float = 0.4

    @nn.compact
    def __call__(self, embeddings, labels):
        w = self.param(
            "weight",
            nn.initializers.xavier_uniform(),
            (self.out_features, self.in_features),
        )
        return cosface_logits(embeddings, w, labels, self.s, self.m, self.out_features)


class ArcFace(nn.Module):
    """Additive angular margin: ``s·cos(θ_y + m)`` (insightface semantics)."""

    in_features: int
    out_features: int
    s: float = 64.0
    m: float = 0.5

    @nn.compact
    def __call__(self, embeddings, labels):
        w = self.param(
            "weight",
            nn.initializers.xavier_uniform(),
            (self.out_features, self.in_features),
        )
        cosine = _l2norm(embeddings) @ _l2norm(w).T
        cosine = jnp.clip(cosine, -1.0 + 1e-7, 1.0 - 1e-7)
        theta = jnp.arccos(cosine)
        phi = jnp.cos(theta + self.m)
        # standard insightface hard-sample guard (easy_margin=False): past
        # θ > π − m, cos(θ+m) turns INCREASING in θ — the penalty would
        # reward worse embeddings; use the monotone linear tail cos−m·sin(m)
        phi = jnp.where(
            cosine > float(np.cos(np.pi - self.m)),
            phi,
            cosine - self.m * float(np.sin(self.m)),
        )
        if labels.ndim > 1:
            one_hot = labels.astype(cosine.dtype)
        else:
            one_hot = jax.nn.one_hot(labels, self.out_features, dtype=cosine.dtype)
        return self.s * (one_hot * phi + (1.0 - one_hot) * cosine)


class SFace(nn.Module):
    """Sigmoid-constrained hypersphere loss logits (SFace, arXiv 2205.12010)."""

    in_features: int
    out_features: int
    s: float = 64.0
    k: float = 80.0
    a: float = 0.80
    b: float = 1.23

    @nn.compact
    def __call__(self, embeddings, labels):
        w = self.param(
            "weight",
            nn.initializers.xavier_uniform(),
            (self.out_features, self.in_features),
        )
        cosine = _l2norm(embeddings) @ _l2norm(w).T
        return self.s * cosine  # re-weighting applied in the SFace loss fn


class SoftmaxHead(nn.Module):
    """Plain linear classifier (the reference's 'Softmax' loss_type)."""

    in_features: int
    out_features: int

    @nn.compact
    def __call__(self, embeddings, labels=None):
        return nn.Dense(self.out_features, name="fc")(embeddings)


class DINOHead(nn.Module):
    """DINO projection head with weight-normalized last layer.

    ``norm_last_layer`` freezes the weight-norm gain at 1 (reference
    ``vision_transformer.py:284-287``) — enforced by the optimizer mask in
    ``train/optim.py`` (param tree keeps ``last_layer_g`` either way so
    checkpoints interop).
    """

    in_dim: int
    out_dim: int
    hidden_dim: int = 2048
    bottleneck_dim: int = 256
    nlayers: int = 3
    use_bn: bool = False
    # SyncBN axis: the reference converts EVERY BN (head included) to
    # SyncBatchNorm when training distributed (lafs_train.py:362-365), so
    # the head's stats must ride the same mesh axis as the backbone's
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        trunc = nn.initializers.truncated_normal(stddev=0.02)

        def _bn(h, name):
            return nn.BatchNorm(
                use_running_average=deterministic,
                axis_name=None if deterministic else self.axis_name,
                name=name,
            )(h)

        if self.nlayers == 1:
            x = nn.Dense(self.bottleneck_dim, kernel_init=trunc, name="mlp_0")(x)
        else:
            x = nn.Dense(self.hidden_dim, kernel_init=trunc, name="mlp_0")(x)
            if self.use_bn:
                x = _bn(x, "bn_0")
            x = nn.gelu(x, approximate=False)
            for i in range(self.nlayers - 2):
                x = nn.Dense(self.hidden_dim, kernel_init=trunc, name=f"mlp_{i+1}")(x)
                if self.use_bn:
                    x = _bn(x, f"bn_{i+1}")
                x = nn.gelu(x, approximate=False)
            x = nn.Dense(self.bottleneck_dim, kernel_init=trunc, name=f"mlp_{self.nlayers-1}")(x)
        x = _l2norm(x)
        # weight-norm last layer: w = g * v / ||v||  (torch weight_norm dim=0)
        v = self.param(
            "last_layer_v", trunc, (self.out_dim, self.bottleneck_dim)
        )
        g = self.param("last_layer_g", nn.initializers.ones, (self.out_dim, 1))
        w = g * _l2norm(v, axis=1)
        return x @ w.T
