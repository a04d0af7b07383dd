"""iResNet family (insightface-style ResNet) — the reference's alternative
backbone (``face_pre_pro/iresnet.py``; selectable but off in shipped configs).

Topology (``iresnet.py:30-229``): 3×3 stem stride 1 + PReLU; BN-FIRST basic
blocks (bn→conv→bn→prelu→conv→bn + downsample); stages [64,128,256,512] all
stride 2 (112² → 7²); head = BN2d → flatten → dropout → Linear(512·49, D) →
BN1d with frozen scale (``iresnet.py:171-173``). ``with_loss=True`` embeds a
CosFace head (``IResNet_withloss``, ``iresnet.py:231+``).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .heads import CosFace


class PReLU(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        a = self.param("alpha", nn.initializers.constant(0.25), (self.features,))
        return jnp.where(x >= 0, x, a * x)


from .layers import SyncableBN as _BN


class IBasicBlock(nn.Module):
    planes: int
    stride: int = 1
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = _BN(self.axis_name, name="bn1")(x, train)
        out = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False, name="conv1")(out)
        out = _BN(self.axis_name, name="bn2")(out, train)
        out = PReLU(self.planes, name="prelu")(out)
        out = nn.Conv(
            self.planes, (3, 3), strides=self.stride, padding=1, use_bias=False,
            name="conv2",
        )(out)
        out = _BN(self.axis_name, name="bn3")(out, train)
        if self.stride != 1 or x.shape[-1] != self.planes:
            identity = nn.Conv(
                self.planes, (1, 1), strides=self.stride, use_bias=False,
                name="downsample_conv",
            )(x)
            identity = _BN(self.axis_name, name="downsample_bn")(identity, train)
        return out + identity


class IResNet(nn.Module):
    """``avg_pool=False``: the canonical insightface head (flatten →
    Linear(512·49, D) → frozen-scale BN — ``iresnet.py:169-173``), the
    layout of published insightface checkpoints. ``avg_pool=True``: the
    reference's shipped factory variant (``IResNet_withloss_avg``,
    ``iresnet.py:425-447``): bn2 → global average pool → dropout →
    features BN, no fc (embedding width = 512)."""

    layers: Sequence[int]
    num_features: int = 512
    dropout: float = 0.0
    with_loss: bool = False
    num_classes: int = 0
    avg_pool: bool = False
    # features BN scale: the canonical fc head freezes it at 1
    # (``iresnet.py:171-173`` sets requires_grad=False), but in
    # ``IResNet_withloss_avg`` the freeze line is commented out
    # (``iresnet.py:385-386``) so the scale trains.  None = follow the
    # reference per-variant (trainable iff avg_pool).
    features_scale: Optional[bool] = None
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, labels=None, train: bool = False):
        x = nn.Conv(64, (3, 3), padding=1, use_bias=False, name="conv1")(x)
        x = _BN(self.axis_name, name="bn1")(x, train)
        x = PReLU(64, name="prelu")(x)
        for stage, (planes, blocks) in enumerate(zip((64, 128, 256, 512), self.layers)):
            for b in range(blocks):
                x = IBasicBlock(
                    planes, stride=2 if b == 0 else 1, axis_name=self.axis_name,
                    name=f"layer{stage + 1}_{b}",
                )(x, train)
        x = _BN(self.axis_name, name="bn2")(x, train)
        if self.avg_pool:
            x = x.mean(axis=(1, 2))  # global average pool (iresnet.py:437)
            x = nn.Dropout(self.dropout)(x, deterministic=not train)
        else:
            x = x.reshape(x.shape[0], -1)
            x = nn.Dropout(self.dropout)(x, deterministic=not train)
            x = nn.Dense(self.num_features, name="fc")(x)
        use_scale = (
            self.avg_pool if self.features_scale is None else self.features_scale
        )
        # features BN syncs like every other BN in the model (the block BNs
        # ride SyncableBN) — an unsynced head over per-device batch stats
        # silently diverges from the global-batch forward under a data mesh
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            use_scale=use_scale, name="features",
            axis_name=self.axis_name if train else None,
        )(x)
        if self.with_loss and labels is not None:
            emb_dim = x.shape[-1]
            logits = CosFace(emb_dim, self.num_classes, name="loss")(x, labels)
            return logits, x
        return x


def iresnet18(**kw):
    return IResNet(layers=(2, 2, 2, 2), **kw)


def iresnet34(**kw):
    return IResNet(layers=(3, 4, 6, 3), **kw)


def iresnet50(**kw):
    return IResNet(layers=(3, 4, 14, 3), **kw)


def iresnet100(**kw):
    return IResNet(layers=(3, 13, 30, 3), **kw)


def iresnet200(**kw):
    return IResNet(layers=(6, 26, 60, 6), **kw)
