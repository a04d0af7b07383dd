"""Visualization suite: landmark/patch overlays, attention rollout, ROC plots.

Reference: ``util/utils.py:117-129`` (ROC plot buffer), ``:730-988``
(attention-rollout maps), ``:1141-1251`` (``save_patch``/``plot_landmark``
landmark overlays saved during eval). matplotlib is imported lazily so the
training path never pays for it.
"""

from __future__ import annotations

import io
import os
from typing import Optional, Sequence

import numpy as np


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def gen_roc_plot(fpr: np.ndarray, tpr: np.ndarray) -> bytes:
    """ROC curve → PNG bytes (reference ``gen_plot``, ``util/utils.py:117-129``)."""
    plt = _plt()
    fig = plt.figure()
    plt.xlabel("FPR", fontsize=14)
    plt.ylabel("TPR", fontsize=14)
    plt.title("ROC Curve", fontsize=14)
    plt.plot(fpr, tpr, linewidth=2)
    buf = io.BytesIO()
    plt.savefig(buf, format="png")
    plt.close(fig)
    return buf.getvalue()


def plot_landmarks(
    image: np.ndarray,
    landmarks: np.ndarray,
    save_path: Optional[str] = None,
    denorm: bool = True,
) -> Optional[bytes]:
    """Overlay predicted landmarks on a face (``plot_landmark``,
    ``util/utils.py:1195-1251``). image: HWC float in [-1,1] (denorm=True)
    or uint8; landmarks: (N, 2) pixel coords with [...,0]=x."""
    plt = _plt()
    img = image
    if denorm:
        img = ((image * 0.5 + 0.5) * 255).clip(0, 255).astype(np.uint8)
    fig = plt.figure(figsize=(4, 4))
    plt.imshow(img)
    plt.scatter(landmarks[:, 0], landmarks[:, 1], s=6, c="lime", marker="+")
    plt.axis("off")
    if save_path:
        os.makedirs(os.path.dirname(os.path.abspath(save_path)), exist_ok=True)
        plt.savefig(save_path, bbox_inches="tight")
        plt.close(fig)
        return None
    buf = io.BytesIO()
    plt.savefig(buf, format="png", bbox_inches="tight")
    plt.close(fig)
    return buf.getvalue()


def save_patch_grid(
    patches: np.ndarray,
    save_path: str,
    denorm: bool = True,
) -> None:
    """Save the landmark patch mosaic (``save_patch``,
    ``util/utils.py:1141-1192``). patches: (N, P, P, C)."""
    plt = _plt()
    n = patches.shape[0]
    r = int(np.ceil(np.sqrt(n)))
    fig, axes = plt.subplots(r, r, figsize=(r, r))
    axes = np.atleast_1d(np.asarray(axes)).ravel()  # r=1: bare Axes
    for i in range(r * r):
        ax = axes[i]
        ax.axis("off")
        if i < n:
            p = patches[i]
            if denorm:
                p = ((p * 0.5 + 0.5) * 255).clip(0, 255).astype(np.uint8)
            ax.imshow(p)
    os.makedirs(os.path.dirname(os.path.abspath(save_path)), exist_ok=True)
    plt.savefig(save_path, bbox_inches="tight")
    plt.close(fig)


def attention_rollout(
    attentions: Sequence[np.ndarray],
    head_fusion: str = "mean",
    discard_ratio: float = 0.0,
) -> np.ndarray:
    """Attention rollout over layers (reference attention-map variants,
    ``util/utils.py:730-988``).

    attentions: list of (B, heads, N, N) per layer. Returns (B, N-1) CLS→token
    attribution.
    """
    result = None
    for attn in attentions:
        if head_fusion == "mean":
            fused = attn.mean(axis=1)
        elif head_fusion == "max":
            fused = attn.max(axis=1)
        else:
            fused = attn.min(axis=1)
        if discard_ratio > 0:
            flat = fused.reshape(fused.shape[0], -1)
            k = int(flat.shape[1] * discard_ratio)
            if k:
                thresh = np.partition(flat, k, axis=1)[:, k : k + 1]
                fused = np.where(
                    fused.reshape(flat.shape) < thresh, 0.0, flat
                ).reshape(fused.shape)
        n = fused.shape[-1]
        a = fused + np.eye(n)[None]
        a = a / a.sum(axis=-1, keepdims=True)
        result = a if result is None else a @ result
    if result is None:
        raise ValueError("attention_rollout: empty attentions sequence "
                         "(did the layer-capture hook record anything?)")
    return result[:, 0, 1:]


def attention_heatmap(
    image: np.ndarray,
    rollout: np.ndarray,
    save_path: Optional[str] = None,
    denorm: bool = True,
) -> Optional[bytes]:
    """Overlay a CLS-attention rollout heatmap on the face image.

    rollout: (N,) per-token attribution; reshaped to the sqrt grid."""
    plt = _plt()
    img = image
    if denorm:
        img = ((image * 0.5 + 0.5) * 255).clip(0, 255).astype(np.uint8)
    r = int(np.sqrt(rollout.shape[0]))
    heat = rollout[: r * r].reshape(r, r)
    fig = plt.figure(figsize=(4, 4))
    plt.imshow(img)
    plt.imshow(
        np.kron(heat, np.ones((img.shape[0] // r, img.shape[1] // r))),
        alpha=0.5, cmap="jet",
    )
    plt.axis("off")
    if save_path:
        os.makedirs(os.path.dirname(os.path.abspath(save_path)), exist_ok=True)
        plt.savefig(save_path, bbox_inches="tight")
        plt.close(fig)
        return None
    buf = io.BytesIO()
    plt.savefig(buf, format="png", bbox_inches="tight")
    plt.close(fig)
    return buf.getvalue()


def per_head_cls_attention(attn_layer: np.ndarray, out_size: int = 112) -> np.ndarray:
    """Per-head CLS→token maps for ONE layer, nearest-upsampled to the image
    (the DINO-style view, ``visualize_attentionmap_DINO``,
    ``util/utils.py:808-858``).

    attn_layer: (heads, N, N) or (1, heads, N, N). Returns
    (heads, out_size, out_size)."""
    a = attn_layer[0] if attn_layer.ndim == 4 else attn_layer
    nh = a.shape[0]
    cls_attn = a[:, 0, 1:]
    r = int(np.sqrt(cls_attn.shape[-1]))
    maps = cls_attn[:, : r * r].reshape(nh, r, r)
    scale = out_size // r
    return np.kron(maps, np.ones((1, scale, scale)))


def save_head_grid(
    maps: np.ndarray,
    save_path: str,
    image: Optional[np.ndarray] = None,
) -> None:
    """Save a grid of per-head attention maps (one subplot per head),
    optionally overlaid on the face image — the multi-panel per-head view of
    ``visualize_attentionmap_DINO`` (``util/utils.py:808-858``).

    maps: (heads, H, W) e.g. from :func:`per_head_cls_attention`;
    image: optional uint8 (H, W, C) underlay."""
    plt = _plt()
    n = maps.shape[0]
    cols = int(np.ceil(np.sqrt(n)))
    rows = int(np.ceil(n / cols))
    fig, axes = plt.subplots(rows, cols, figsize=(2 * cols, 2 * rows))
    axes = np.atleast_1d(np.asarray(axes)).ravel()
    for i in range(rows * cols):
        ax = axes[i]
        ax.axis("off")
        if i < n:
            if image is not None:
                ax.imshow(image)
                ax.imshow(maps[i], alpha=0.5, cmap="jet")
            else:
                ax.imshow(maps[i], cmap="jet")
            ax.set_title(f"head {i}", fontsize=8)
    os.makedirs(os.path.dirname(os.path.abspath(save_path)), exist_ok=True)
    plt.savefig(save_path, bbox_inches="tight")
    plt.close(fig)


def attention_heatmap_landmark(
    image: np.ndarray,
    token_attn: np.ndarray,
    landmarks: np.ndarray,
    patch_size: int = 8,
    save_path: Optional[str] = None,
    denorm: bool = True,
) -> Optional[bytes]:
    """Landmark-splatted attention map (``visualize_attentionmap_DINO_landmark``
    / ``_new_landmark``, ``util/utils.py:860-988``): each token's attention
    block is accumulated AT ITS PREDICTED LANDMARK position (clamped to the
    image) instead of the regular grid — showing where the model actually
    looked on the irregular Part-fViT patch layout.

    image: (H, W, C); token_attn: (N,) CLS→token attribution (e.g. one
    rollout row or a fused per-head slice); landmarks: (N, 2) pixel coords
    with [..., 0] = x.
    """
    plt = _plt()
    img = image
    if denorm:
        img = ((image * 0.5 + 0.5) * 255).clip(0, 255).astype(np.uint8)
    h, w = img.shape[0], img.shape[1]
    half = patch_size // 2
    heat = np.zeros((h, w), np.float32)
    n = min(token_attn.shape[0], landmarks.shape[0])
    for i in range(n):
        # clamp the block fully inside the image (utils.py:908-916)
        cx, cy = np.rint(landmarks[i]).astype(int)
        cx = min(max(cx, half), w - half)
        cy = min(max(cy, half), h - half)
        heat[cy - half : cy + half, cx - half : cx + half] += token_attn[i]
    fig = plt.figure(figsize=(4, 4))
    plt.imshow(img)
    plt.imshow(heat, alpha=0.5, interpolation="nearest", cmap="jet")
    plt.axis("off")
    if save_path:
        os.makedirs(os.path.dirname(os.path.abspath(save_path)), exist_ok=True)
        plt.savefig(save_path, bbox_inches="tight")
        plt.close(fig)
        return None
    buf = io.BytesIO()
    plt.savefig(buf, format="png", bbox_inches="tight")
    plt.close(fig)
    return buf.getvalue()
