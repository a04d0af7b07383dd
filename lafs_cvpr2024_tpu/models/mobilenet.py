"""MobileNetV3 landmark backbone (flax.linen, NHWC).

TPU-native re-design of the reference stem (``face_pre_pro/mobilenet.py``):
same topology — conv_bn(3→16, s2, hswish) + 15 (large) / 11 (small)
MobileBottleneck blocks — so published checkpoints map 1:1, but NHWC layout
and an optional ``axis_name`` on BatchNorm for cross-device stat sync
(SyncBatchNorm equivalent, reference ``lafs_train.py:362-364``).

The ``_backbone`` variant (reference ``mobilenet.py:224-313``) stops at the
160-channel feature map (112×112 input → 4×4×160); the classifier variant
adds the 1×1 convs + pooled classifier head.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

# (kernel, exp, out, se, activation, stride) — Table 1/2 of the paper,
# identical to reference mobilenet.py:125-158.
LARGE_SETTING = [
    (3, 16, 16, False, "RE", 1),
    (3, 64, 24, False, "RE", 2),
    (3, 72, 24, False, "RE", 1),
    (5, 72, 40, True, "RE", 2),
    (5, 120, 40, True, "RE", 1),
    (5, 120, 40, True, "RE", 1),
    (3, 240, 80, False, "HS", 2),
    (3, 200, 80, False, "HS", 1),
    (3, 184, 80, False, "HS", 1),
    (3, 184, 80, False, "HS", 1),
    (3, 480, 112, True, "HS", 1),
    (3, 672, 112, True, "HS", 1),
    (5, 672, 160, True, "HS", 2),
    (5, 960, 160, True, "HS", 1),
    (5, 960, 160, True, "HS", 1),
]
SMALL_SETTING = [
    (3, 16, 16, True, "RE", 2),
    (3, 72, 24, False, "RE", 2),
    (3, 88, 24, False, "RE", 1),
    (5, 96, 40, True, "HS", 2),
    (5, 240, 40, True, "HS", 1),
    (5, 240, 40, True, "HS", 1),
    (5, 120, 48, True, "HS", 1),
    (5, 144, 48, True, "HS", 1),
    (5, 288, 96, True, "HS", 2),
    (5, 576, 96, True, "HS", 1),
    (5, 576, 96, True, "HS", 1),
]


def hswish(x):
    return x * jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


def hsigmoid(x):
    return jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


from .layers import SyncableBN as _BN


class ConvBN(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    act: str = "RE"
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = (self.kernel - 1) // 2
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=self.stride,
            padding=pad,
            use_bias=False,
            name="conv",
        )(x)
        x = _BN(self.axis_name, name="norm")(x, train)
        return hswish(x) if self.act == "HS" else nn.relu(x)


class SEModule(nn.Module):
    channels: int
    reduction: int = 4

    @nn.compact
    def __call__(self, x):
        y = jnp.mean(x, axis=(1, 2))
        y = nn.Dense(self.channels // self.reduction, use_bias=False, name="fc1")(y)
        y = nn.relu(y)
        y = nn.Dense(self.channels, use_bias=False, name="fc2")(y)
        y = hsigmoid(y)
        return x * y[:, None, None, :]


class MobileBottleneck(nn.Module):
    out_ch: int
    kernel: int
    stride: int
    exp_ch: int
    se: bool
    act: str
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        inp = x.shape[-1]
        res = self.stride == 1 and inp == self.out_ch
        nlin = hswish if self.act == "HS" else nn.relu
        pad = (self.kernel - 1) // 2

        h = nn.Conv(self.exp_ch, (1, 1), use_bias=False, name="pw")(x)
        h = _BN(self.axis_name, name="pw_norm")(h, train)
        h = nlin(h)
        h = nn.Conv(
            self.exp_ch,
            (self.kernel, self.kernel),
            strides=self.stride,
            padding=pad,
            feature_group_count=self.exp_ch,
            use_bias=False,
            name="dw",
        )(h)
        h = _BN(self.axis_name, name="dw_norm")(h, train)
        if self.se:
            h = SEModule(self.exp_ch, name="se")(h)
        h = nlin(h)
        h = nn.Conv(self.out_ch, (1, 1), use_bias=False, name="pw_linear")(h)
        h = _BN(self.axis_name, name="pw_linear_norm")(h, train)
        return x + h if res else h


class MobileNetV3Backbone(nn.Module):
    """Headless MobileNetV3 returning the final feature map (NHWC).

    mode='large' → 160 channels (the Part-fViT landmark stem)."""

    mode: str = "large"
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        setting = LARGE_SETTING if self.mode == "large" else SMALL_SETTING
        x = ConvBN(16, 3, 2, "HS", self.axis_name, name="stem")(x, train)
        for i, (k, exp, c, se, nl, s) in enumerate(setting):
            x = MobileBottleneck(
                c, k, s, exp, se, nl, self.axis_name, name=f"block_{i}"
            )(x, train)
        return x


class MobileNetV3(nn.Module):
    """Full classifier variant (reference ``mobilenet.py:118-207``)."""

    num_classes: int = 1000
    mode: str = "large"
    dropout: float = 0.8
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = MobileNetV3Backbone(self.mode, self.axis_name, name="backbone")(x, train)
        last_conv = 960 if self.mode == "large" else 576
        x = ConvBN(last_conv, 1, 1, "HS", self.axis_name, name="last_conv")(x, train)
        x = jnp.mean(x, axis=(1, 2), keepdims=True)
        x = nn.Conv(1280, (1, 1), name="pre_classifier")(x)
        x = hswish(x)
        x = x.reshape(x.shape[0], -1)
        x = nn.Dropout(self.dropout)(x, deterministic=not train)
        return nn.Dense(self.num_classes, name="classifier")(x)


class MobileDINO(nn.Module):
    """MobileNetV3 DINO student/teacher: stem → mean-pool → Dropout(0.5) →
    Dense(embd_dim) (reference ``mobile_dino``, ``ViT_face.py:1203-1217``) —
    the lightweight backbone used to pretrain the landmark CNN with DINO
    before it becomes the frozen Part-fViT landmark provider."""

    embd_dim: int = 128
    mode: str = "large"
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        feat = MobileNetV3Backbone(self.mode, self.axis_name, name="stn")(x, train)
        pooled = jnp.mean(feat, axis=(1, 2))
        h = nn.Dropout(0.5)(pooled, deterministic=not train)
        return nn.Dense(self.embd_dim, name="output_layer")(h)
