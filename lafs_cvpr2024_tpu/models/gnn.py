"""Residual gated graph convolution over a fully-connected token graph.

Reference ``GNN`` + ``create_e_matrix`` (``face_pre_pro/ViT_face.py:218-334``,
after arXiv 1711.07553 / 2003.00982) — unused in the reference's main path
but part of its model inventory. Faithful semantics, vectorized: the
reference materializes dense (N², N) start/end incidence matrices and runs
``einsum('ev,bvc->bec')`` contractions; on a fully-connected graph those
contractions are pure broadcasts (edge e = i·N+j has target i, source j),
so the edge tensor lives as (B, N, N, C) and no O(N³) matmul is needed —
identical math.

Reference layer (ViT_face.py:291-315; its "GNN Layer 2" is commented out):

    edge += relu(bne1(A1x[tgt] + B1x[src] + E1(edge)))      # edge update
    gate  = softmax_src(sigmoid(edge))                      # per-target
    x     = relu(x + bnv1(U1x + Σ_src(gate ⊙ V1x[src]) / N))

Torch BatchNorm1d quirks preserved: ``bne1 = BatchNorm1d(N²)`` computes
per-EDGE statistics (over batch and channel dims) and ``bnv1 =
BatchNorm1d(N)`` per-NODE statistics — the feature axis is the edge/node
axis, not channels. Weight init: N(0, √(2/C)) on the five bias-free
linears, BN scale 1 / bias 0 (``bn_init``).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def _linear(c, name):
    return nn.Dense(
        c, use_bias=False, name=name,
        kernel_init=nn.initializers.normal(stddev=float(np.sqrt(2.0 / c))),
    )


class GatedGraphConv(nn.Module):
    """One reference-exact gated GNN layer: ``(x, edge) -> (x, edge)``.

    x: (B, N, C) node features; edge: (B, N, N, C) with ``edge[:, i, j]``
    the (target=i, source=j) edge state (reference edge index e = i·N+j).
    """

    channels: int
    # SyncBN mesh axis (reference converts every BN to SyncBatchNorm when
    # training distributed, lafs_train.py:362-365); None = per-device stats
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, edge, train: bool = False):
        b, n, c = x.shape
        res = x
        # edge update: end@A1x (target features) + start@B1x (source) + E1
        a1x = _linear(self.channels, "A1")(x)
        b1x = _linear(self.channels, "B1")(x)
        e1e = _linear(self.channels, "E1")(edge)
        upd = a1x[:, :, None, :] + b1x[:, None, :, :] + e1e
        # bne1 = torch BatchNorm1d(N*N) on (B, N², C): per-edge stats over
        # (batch, channel) — flax feature axis = the flattened edge axis
        upd = upd.reshape(b, n * n, c)
        upd = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            axis=1, name="bne1",
            axis_name=self.axis_name if train else None,
        )(upd).reshape(b, n, n, c)
        edge = edge + nn.relu(upd)

        # gates: sigmoid then softmax over the SOURCE axis per target
        gate = nn.softmax(nn.sigmoid(edge), axis=2)

        # node update: U1x + Σ_src(gate ⊙ V1x[src]) / N (end.T contraction)
        u1x = _linear(self.channels, "U1")(x)
        v1x = _linear(self.channels, "V1")(x)
        agg = jnp.sum(gate * v1x[:, None, :, :], axis=2) / n
        h = u1x + agg
        # bnv1 = torch BatchNorm1d(N) on (B, N, C): per-node stats
        h = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            axis=1, name="bnv1",
            axis_name=self.axis_name if train else None,
        )(h)
        x = nn.relu(res + h)
        return x, edge


class GNN(nn.Module):
    """Reference ``GNN`` module: a single live layer (its second layer is
    commented out in the source); ``depth`` stacks more for experimentation.
    ``edge=None`` starts from a zero edge state."""

    channels: int
    depth: int = 1
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, edge=None, train: bool = False):
        b, n, _ = x.shape
        if edge is None:
            edge = jnp.zeros((b, n, n, self.channels), x.dtype)
        for i in range(self.depth):
            x, edge = GatedGraphConv(
                self.channels, axis_name=self.axis_name, name=f"layer_{i}"
            )(x, edge, train)
        return x, edge
