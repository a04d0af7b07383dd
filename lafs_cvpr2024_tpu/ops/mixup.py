"""Device-side Mixup/CutMix as a pure jitted op.

TPU-native replacement for the reference's host-side timm fork
(``util/mixup_my.py:84-211``): it is pure tensor math, so it runs fused
inside the train step instead of on CPU. Batch mode (the shipped config:
``mixup_alpha=0.2, cutmix_alpha=0, prob=0.1, switch_prob=0.5, mode='batch',
label_smoothing=0`` — ``train_largescale.py:383-395,528-531``) with soft
one-hot targets (``mixup_target``, ``util/mixup_my.py:95-102``).

All branches are compiled once; random draws use JAX PRNG keys.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class MixupConfig:
    mixup_alpha: float = 0.2
    cutmix_alpha: float = 0.0
    prob: float = 0.1
    switch_prob: float = 0.5
    label_smoothing: float = 0.0
    num_classes: int = 1000
    mode: str = "batch"  # 'batch' | 'elem' (per-sample lam, vectorized)

    @property
    def enabled(self) -> bool:
        return self.mixup_alpha > 0 or self.cutmix_alpha > 0


def _beta_vec(key, alpha: float, n: int):
    a = jnp.float32(alpha)
    g1 = jax.random.gamma(key, a, (n,))
    g2 = jax.random.gamma(jax.random.fold_in(key, 1), a, (n,))
    return g1 / (g1 + g2)


def _mixup_elem(key, images, y1, cfg: "MixupConfig"):
    """Per-element mixup (timm ``_mix_elem``, ``util/mixup_my.py:152-167``:
    element i mixes with element n-1-i). CutMix-elem is intentionally folded
    into mixup here — per-sample boxes via masks cost a full-image mask per
    element; batch mode covers the shipped configs."""
    n = images.shape[0]
    k_prob, k_lam = jax.random.split(key)
    lam = _beta_vec(k_lam, cfg.mixup_alpha, n)
    apply = jax.random.uniform(k_prob, (n,)) < cfg.prob
    lam = jnp.where(apply, lam, 1.0)
    lam_img = lam.reshape((n,) + (1,) * (images.ndim - 1))
    mixed = images * lam_img + jnp.flip(images, axis=0) * (1 - lam_img)
    target = y1 * lam[:, None] + jnp.flip(y1, axis=0) * (1 - lam[:, None])
    return mixed, target


def _beta(key, alpha: float):
    a = jnp.float32(alpha)
    g1 = jax.random.gamma(key, a)
    g2 = jax.random.gamma(jax.random.fold_in(key, 1), a)
    return g1 / (g1 + g2)


def one_hot_smooth(labels, num_classes: int, smoothing: float = 0.0):
    off = smoothing / num_classes
    on = 1.0 - smoothing + off
    return jax.nn.one_hot(labels, num_classes) * (on - off) + off


def mixup_cutmix(key, images, labels, cfg: MixupConfig):
    """Batch-mode mixup/cutmix.

    Args:
      key: PRNG key.
      images: (B, H, W, C) float.
      labels: (B,) int class ids.
      cfg: MixupConfig.

    Returns:
      (mixed_images, soft_targets (B, num_classes)).
    """
    y1 = one_hot_smooth(labels, cfg.num_classes, cfg.label_smoothing)
    if not cfg.enabled:
        return images, y1
    if cfg.mode == "elem":
        return _mixup_elem(key, images, y1, cfg)

    k_prob, k_switch, k_lam, k_box = jax.random.split(key, 4)
    apply = jax.random.uniform(k_prob) < cfg.prob
    both = cfg.mixup_alpha > 0 and cfg.cutmix_alpha > 0
    if both:
        use_cutmix = jax.random.uniform(k_switch) < cfg.switch_prob
        lam_mix = jnp.where(
            use_cutmix, _beta(k_lam, cfg.cutmix_alpha), _beta(k_lam, cfg.mixup_alpha)
        )
    elif cfg.cutmix_alpha > 0:
        use_cutmix = jnp.bool_(True)
        lam_mix = _beta(k_lam, cfg.cutmix_alpha)
    else:
        use_cutmix = jnp.bool_(False)
        lam_mix = _beta(k_lam, cfg.mixup_alpha)
    lam = jnp.where(apply, lam_mix, 1.0)

    flipped = jnp.flip(images, axis=0)
    mixed_mix = images * lam + flipped * (1.0 - lam)

    # CutMix box (timm rand_bbox with correct_lam, util/mixup_my.py:26-81).
    h, w = images.shape[1], images.shape[2]
    ratio = jnp.sqrt(1.0 - lam)
    cut_h = (h * ratio).astype(jnp.int32)
    cut_w = (w * ratio).astype(jnp.int32)
    cy = jax.random.randint(k_box, (), 0, h)
    cx = jax.random.randint(jax.random.fold_in(k_box, 1), (), 0, w)
    yl = jnp.clip(cy - cut_h // 2, 0, h)
    yh = jnp.clip(cy + cut_h // 2, 0, h)
    xl = jnp.clip(cx - cut_w // 2, 0, w)
    xh = jnp.clip(cx + cut_w // 2, 0, w)
    rows = jnp.arange(h)[None, :, None, None]
    cols = jnp.arange(w)[None, None, :, None]
    in_box = (rows >= yl) & (rows < yh) & (cols >= xl) & (cols < xh)
    mixed_cut = jnp.where(in_box, flipped, images)
    lam_cut = 1.0 - ((yh - yl) * (xh - xl)).astype(images.dtype) / (h * w)

    use_cut = apply & use_cutmix
    mixed = jnp.where(use_cut, mixed_cut, mixed_mix)
    lam_eff = jnp.where(use_cut, lam_cut, lam)

    y2 = jnp.flip(y1, axis=0)
    target = y1 * lam_eff + y2 * (1.0 - lam_eff)
    return mixed, target
