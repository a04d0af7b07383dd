"""Residual gated graph convolution over tokens.

Reference ``GNN`` + ``create_e_matrix`` (``face_pre_pro/ViT_face.py:218-334``)
— unused in the reference's main path but part of its model inventory. Fully
vectorized: the reference materializes dense N²×N start/end incidence
matrices; here the fully-connected token graph uses broadcast sums instead
(identical math, O(N²·C) memory instead of O(N³)).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


class GatedGraphConv(nn.Module):
    """One gated GNN layer over a fully-connected token graph.

    node update: x' = x + act(BN(Ux + mean_j(gate_ij ⊙ Vx_j)))
    edge gate:   gate_ij = sigmoid(BN(Ae_i + Be_j)) with e = node features.
    """

    channels: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, n, c = x.shape
        u = nn.Dense(self.channels, name="U")(x)
        v = nn.Dense(self.channels, name="V")(x)
        a = nn.Dense(self.channels, name="A")(x)
        bb = nn.Dense(self.channels, name="B")(x)
        # dense gates over all (i, j) pairs
        gate = nn.sigmoid(a[:, :, None, :] + bb[:, None, :, :])  # (B, N, N, C)
        agg = jnp.mean(gate * v[:, None, :, :], axis=2)          # (B, N, C)
        h = u + agg
        h = nn.BatchNorm(use_running_average=not train, name="bn")(h)
        return x + nn.relu(h)


class GNN(nn.Module):
    """Stack of gated graph convs (reference default depth 2)."""

    channels: int
    depth: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.depth):
            x = GatedGraphConv(self.channels, name=f"layer_{i}")(x, train)
        return x
