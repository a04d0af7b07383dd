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
from typing import Any

import jax
import jax.numpy as jnp


def _check_minmax(minmax):
    mn, mx = minmax
    if not (0.0 < mn < mx <= 1.0):
        raise ValueError(f"cutmix_minmax must satisfy 0 < min < max <= 1, "
                         f"got {tuple(minmax)}")
    return float(mn), float(mx)


def _minmax_box(k_box, h, w, minmax, m=None):
    """timm ``rand_bbox_minmax`` (``util/mixup_my.py:50-68``): cut dims drawn
    uniformly in ``[min·dim, max·dim)`` per axis, top-left corner uniform in
    ``[0, dim − cut)``; lam is NOT consulted (always corrected from area)."""
    mn, mx = _check_minmax(minmax)
    shape = () if m is None else (m,)
    kh, kw, ky, kx = (jax.random.fold_in(k_box, i) for i in range(4))

    def cut(k, dim):
        lo = int(dim * mn)
        hi = max(int(dim * mx), lo + 1)
        return jax.random.randint(k, shape, lo, hi)

    cut_h, cut_w = cut(kh, h), cut(kw, w)
    yl = (jax.random.uniform(ky, shape) * (h - cut_h)).astype(jnp.int32)
    xl = (jax.random.uniform(kx, shape) * (w - cut_w)).astype(jnp.int32)
    return yl, yl + cut_h, xl, xl + cut_w


@dataclass(frozen=True)
class MixupConfig:
    mixup_alpha: float = 0.2
    cutmix_alpha: float = 0.0
    cutmix_minmax: Any = None  # (min, max) box-ratio pair — overrides the
                               # beta-lam box with timm's rand_bbox_minmax
                               # (util/mixup_my.py:50-68,74-75); enables
                               # cutmix even at cutmix_alpha=0, lam always
                               # comes from the corrected box area
    prob: float = 0.1
    switch_prob: float = 0.5
    label_smoothing: float = 0.0
    num_classes: int = 1000
    mode: str = "batch"  # 'batch' | 'elem' | 'pair' (vectorized per-sample)

    @property
    def enabled(self) -> bool:
        return (self.mixup_alpha > 0 or self.cutmix_alpha > 0
                or self.cutmix_minmax is not None)


def _beta_vec(key, alpha: float, n: int):
    a = jnp.float32(alpha)
    g1 = jax.random.gamma(key, a, (n,))
    g2 = jax.random.gamma(jax.random.fold_in(key, 1), a, (n,))
    return g1 / (g1 + g2)


def _mixup_elem_or_pair(key, images, cfg: "MixupConfig", pair: bool):
    """Vectorized per-element mixup/cutmix (timm ``_mix_elem`` /
    ``_mix_pair``, ``util/mixup_my.py:114-132,152-187``): element i mixes
    with element n−1−i; 'pair' draws ONE (lam, box) per (i, n−1−i) pair so
    both elements mix symmetrically. Per-element CutMix uses per-sample
    boxes (a (B,H,W,1) mask — cheap next to the conv/matmul work).
    Returns ``(mixed_images, lam_eff (B,))``."""
    n = images.shape[0]
    if pair:
        assert n % 2 == 0, "pair mode needs an even batch (mixup_my.py:203)"
    m = n // 2 if pair else n
    k_prob, k_switch, k_lam, k_box = jax.random.split(key, 4)
    apply = jax.random.uniform(k_prob, (m,)) < cfg.prob
    cut_on = cfg.cutmix_alpha > 0 or cfg.cutmix_minmax is not None
    c_alpha = cfg.cutmix_alpha if cfg.cutmix_alpha > 0 else 1.0
    if cfg.mixup_alpha > 0 and cut_on:
        use_cutmix = jax.random.uniform(k_switch, (m,)) < cfg.switch_prob
        lam_mix = jnp.where(
            use_cutmix,
            _beta_vec(k_lam, c_alpha, m),
            _beta_vec(jax.random.fold_in(k_lam, 2), cfg.mixup_alpha, m),
        )
    elif cut_on:
        use_cutmix = jnp.ones((m,), bool)
        lam_mix = _beta_vec(k_lam, c_alpha, m)
    else:
        use_cutmix = jnp.zeros((m,), bool)
        lam_mix = _beta_vec(k_lam, cfg.mixup_alpha, m)
    lam = jnp.where(apply, lam_mix, 1.0)

    # per-element CutMix boxes (timm rand_bbox + correct_lam; minmax spec
    # routes to rand_bbox_minmax, util/mixup_my.py:50-68)
    h, w = images.shape[1], images.shape[2]
    if cfg.cutmix_minmax is not None:
        yl, yh, xl, xh = _minmax_box(k_box, h, w, cfg.cutmix_minmax, m=m)
    else:
        ratio = jnp.sqrt(1.0 - lam)
        cut_h = (h * ratio).astype(jnp.int32)
        cut_w = (w * ratio).astype(jnp.int32)
        cy = jax.random.randint(k_box, (m,), 0, h)
        cx = jax.random.randint(jax.random.fold_in(k_box, 1), (m,), 0, w)
        yl = jnp.clip(cy - cut_h // 2, 0, h)
        yh = jnp.clip(cy + cut_h // 2, 0, h)
        xl = jnp.clip(cx - cut_w // 2, 0, w)
        xh = jnp.clip(cx + cut_w // 2, 0, w)
    lam_cut = 1.0 - ((yh - yl) * (xh - xl)).astype(jnp.float32) / (h * w)
    use_cut = apply & use_cutmix
    lam_eff = jnp.where(use_cut, lam_cut, lam)

    if pair:
        # mirror the per-pair draws onto the second half (i and j share them)
        mirror = lambda a: jnp.concatenate([a, jnp.flip(a, axis=0)])
        yl, yh, xl, xh = mirror(yl), mirror(yh), mirror(xl), mirror(xh)
        lam_eff, use_cut, lam = mirror(lam_eff), mirror(use_cut), mirror(lam)

    rows = jnp.arange(h)[None, :, None, None]
    cols = jnp.arange(w)[None, None, :, None]
    e = lambda a: a.reshape((n, 1, 1, 1))
    in_box = (rows >= e(yl)) & (rows < e(yh)) & (cols >= e(xl)) & (cols < e(xh))

    flipped = jnp.flip(images, axis=0)
    lam_img = lam.reshape((n,) + (1,) * (images.ndim - 1))
    mixed_mix = images * lam_img + flipped * (1 - lam_img)
    mixed_cut = jnp.where(in_box, flipped, images)
    mixed = jnp.where(e(use_cut), mixed_cut, mixed_mix)
    return mixed, lam_eff


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
    mixed, lam_eff = mixup_cutmix_factors(key, images, labels, cfg)
    target = y1 * lam_eff[:, None] + jnp.flip(y1, axis=0) * (
        1.0 - lam_eff[:, None]
    )
    return mixed, target


def mixup_cutmix_factors(key, images, labels, cfg: MixupConfig):
    """Mixup/cutmix in FACTORED form: ``(mixed_images, lam_eff (B,))``.

    The soft target is always ``onehot(labels)·lam_eff +
    onehot(flip(labels))·(1−lam_eff)`` (the mixing partner is element
    n−1−i in every mode); callers that operate on a SAMPLED class subset
    (PartialFC, ``parallel/partial_fc.py``) build their target columns
    from these factors by label comparison instead of materializing the
    dense (B, num_classes) row. Identical image mixing (same key → same
    pixels) as :func:`mixup_cutmix`.
    """
    if not cfg.enabled:
        return images, jnp.ones((images.shape[0],), jnp.float32)
    if cfg.mode in ("elem", "pair"):
        return _mixup_elem_or_pair(key, images, cfg, pair=cfg.mode == "pair")
    if cfg.mode != "batch":
        raise ValueError(
            f"unsupported mixup mode {cfg.mode!r}: expected 'batch', 'elem' "
            "or 'pair' (util/mixup_my.py:202-209)"
        )

    k_prob, k_switch, k_lam, k_box = jax.random.split(key, 4)
    apply = jax.random.uniform(k_prob) < cfg.prob
    # cutmix is active at cutmix_alpha>0 OR with a minmax box spec (timm
    # Mixup.__init__ forces alpha 1.0 under minmax; the beta draw is
    # discarded — lam always comes from the corrected box area)
    cut_on = cfg.cutmix_alpha > 0 or cfg.cutmix_minmax is not None
    c_alpha = cfg.cutmix_alpha if cfg.cutmix_alpha > 0 else 1.0
    if cfg.mixup_alpha > 0 and cut_on:
        use_cutmix = jax.random.uniform(k_switch) < cfg.switch_prob
        lam_mix = jnp.where(
            use_cutmix, _beta(k_lam, c_alpha), _beta(k_lam, cfg.mixup_alpha)
        )
    elif cut_on:
        use_cutmix = jnp.bool_(True)
        lam_mix = _beta(k_lam, c_alpha)
    else:
        use_cutmix = jnp.bool_(False)
        lam_mix = _beta(k_lam, cfg.mixup_alpha)
    lam = jnp.where(apply, lam_mix, 1.0)

    flipped = jnp.flip(images, axis=0)
    mixed_mix = images * lam + flipped * (1.0 - lam)

    # CutMix box (timm rand_bbox with correct_lam, util/mixup_my.py:26-81;
    # minmax spec routes to rand_bbox_minmax, :50-68)
    h, w = images.shape[1], images.shape[2]
    if cfg.cutmix_minmax is not None:
        yl, yh, xl, xh = _minmax_box(k_box, h, w, cfg.cutmix_minmax)
    else:
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
    return mixed, jnp.broadcast_to(
        lam_eff.astype(jnp.float32), (images.shape[0],)
    )


class FastCollateMixup:
    """Host-side collate-time mixup/cutmix on uint8 batches
    (timm ``FastCollateMixup``, ``util/mixup_my.py:214-307``): mixing happens
    while collating so the device receives the final batch. Plug in as a
    ``DataPipeline`` postprocess: ``lambda imgs, labels: collate(imgs, labels)``.

    The device-side :func:`mixup_cutmix` (fused into the train step) is the
    recommended path on TPU; this exists for host-pipeline parity and for
    feeding externally-preprocessed batches.
    """

    def __init__(self, cfg: MixupConfig, seed: int = 0):
        import numpy as np

        if cfg.mode not in ("batch", "elem", "pair"):
            raise ValueError(f"unsupported mixup mode {cfg.mode!r}")
        self.cfg = cfg
        self._rng = np.random.default_rng(seed)

    def _params(self, m):
        import numpy as np

        cfg = self.cfg
        lam = np.ones(m, np.float32)
        use_cutmix = np.zeros(m, bool)
        cut_on = cfg.cutmix_alpha > 0 or cfg.cutmix_minmax is not None
        c_alpha = cfg.cutmix_alpha if cfg.cutmix_alpha > 0 else 1.0
        if cfg.mixup_alpha > 0 and cut_on:
            use_cutmix = self._rng.random(m) < cfg.switch_prob
            lam_mix = np.where(
                use_cutmix,
                self._rng.beta(c_alpha, c_alpha, m),
                self._rng.beta(cfg.mixup_alpha, cfg.mixup_alpha, m),
            )
        elif cut_on:
            use_cutmix[:] = True
            lam_mix = self._rng.beta(c_alpha, c_alpha, m)
        else:
            lam_mix = self._rng.beta(cfg.mixup_alpha, cfg.mixup_alpha, m)
        apply = self._rng.random(m) < cfg.prob
        lam = np.where(apply, lam_mix.astype(np.float32), lam)
        return lam, use_cutmix & apply

    def _bbox(self, h, w, lam):
        import numpy as np

        if self.cfg.cutmix_minmax is not None:
            # timm rand_bbox_minmax (util/mixup_my.py:50-68): lam ignored
            mn, mx = _check_minmax(self.cfg.cutmix_minmax)
            ch = int(self._rng.integers(int(h * mn), max(int(h * mx), int(h * mn) + 1)))
            cw = int(self._rng.integers(int(w * mn), max(int(w * mx), int(w * mn) + 1)))
            yl = int(self._rng.integers(0, max(h - ch, 1)))
            xl = int(self._rng.integers(0, max(w - cw, 1)))
            lam_c = 1.0 - ch * cw / float(h * w)
            return (yl, yl + ch, xl, xl + cw), np.float32(lam_c)
        ratio = np.sqrt(1.0 - lam)
        ch, cw = int(h * ratio), int(w * ratio)
        cy, cx = self._rng.integers(0, h), self._rng.integers(0, w)
        yl, yh = np.clip(cy - ch // 2, 0, h), np.clip(cy + ch // 2, 0, h)
        xl, xh = np.clip(cx - cw // 2, 0, w), np.clip(cx + cw // 2, 0, w)
        lam_c = 1.0 - (yh - yl) * (xh - xl) / float(h * w)
        return (yl, yh, xl, xh), np.float32(lam_c)

    def __call__(self, images, labels):
        """images: (B,H,W,C) uint8; labels: (B,) ints.
        Returns (mixed uint8, (B, num_classes) float32 soft targets)."""
        import numpy as np

        cfg = self.cfg
        n, h, w = images.shape[0], images.shape[1], images.shape[2]
        assert n % 2 == 0, "batch size should be even"
        out = images.astype(np.float32).copy()
        if cfg.mode == "batch":
            lam1, use_cut = self._params(1)
            lam = lam1[0]
            if use_cut[0]:
                (yl, yh, xl, xh), lam = self._bbox(h, w, lam)
                out[:, yl:yh, xl:xh] = out[::-1][:, yl:yh, xl:xh]
            elif lam != 1.0:
                out = out * lam + out[::-1] * (1 - lam)
            lam_eff = np.full(n, lam, np.float32)
        else:
            pair = cfg.mode == "pair"
            m = n // 2 if pair else n
            lam_b, use_cut = self._params(m)
            orig = out.copy()
            lam_eff = np.ones(n, np.float32)
            for i in range(m):
                j = n - 1 - i
                lam = lam_b[i]
                if lam == 1.0 and not use_cut[i]:
                    continue
                if use_cut[i]:
                    (yl, yh, xl, xh), lam = self._bbox(h, w, lam)
                    out[i, yl:yh, xl:xh] = orig[j, yl:yh, xl:xh]
                    if pair:
                        out[j, yl:yh, xl:xh] = orig[i, yl:yh, xl:xh]
                else:
                    out[i] = orig[i] * lam + orig[j] * (1 - lam)
                    if pair:
                        out[j] = orig[j] * lam + orig[i] * (1 - lam)
                lam_eff[i] = lam
                if pair:
                    lam_eff[j] = lam
        # pure numpy: this is the HOST collate hot path — a jnp round-trip
        # here would add a device transfer + dispatch per batch, contending
        # with the train step
        lab = np.asarray(labels, np.int64)
        off = cfg.label_smoothing / cfg.num_classes
        on = 1.0 - cfg.label_smoothing + off
        y = np.full((len(lab), cfg.num_classes), off, np.float32)
        y[np.arange(len(lab)), lab] = on
        target = y * lam_eff[:, None] + y[::-1] * (1 - lam_eff[:, None])
        return np.rint(out).astype(images.dtype), target.astype(np.float32)
