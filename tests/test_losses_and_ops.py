"""Tests: DINO loss vs a torch-semantics numpy oracle, schedules, mixup."""

import numpy as np
import jax
import jax.numpy as jnp

from lafs_cvpr2024_tpu.ops import (
    MixupConfig,
    cosine_scheduler,
    mixup_cutmix,
    teacher_temp_schedule,
    warmup_cosine_lr,
)
from lafs_cvpr2024_tpu.train.losses import dino_loss, softmax_cross_entropy


def _np_softmax(x, axis=-1):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def _np_log_softmax(x, axis=-1):
    return x - x.max(axis=axis, keepdims=True) - np.log(
        np.exp(x - x.max(axis=axis, keepdims=True)).sum(axis=axis, keepdims=True)
    )


def oracle_dino(student, teacher, center, temp, ncrops, student_temp=0.1):
    """Numpy re-enactment of DINOLoss.forward (lafs_train.py:643-667)."""
    s = (student / student_temp).reshape(ncrops, -1, student.shape[-1])
    t = _np_softmax((teacher - center) / temp).reshape(2, -1, teacher.shape[-1])
    total, n = 0.0, 0
    for iq in range(2):
        for v in range(ncrops):
            if v == iq:
                continue
            total += np.mean(np.sum(-t[iq] * _np_log_softmax(s[v]), -1))
            n += 1
    return total / n


def test_dino_loss_matches_oracle():
    rng = np.random.default_rng(0)
    B, K, ncrops = 4, 32, 10
    student = rng.standard_normal((ncrops * B, K)).astype(np.float32)
    teacher = rng.standard_normal((2 * B, K)).astype(np.float32)
    center = rng.standard_normal((1, K)).astype(np.float32) * 0.1
    loss, new_center = dino_loss(
        jnp.asarray(student), jnp.asarray(teacher), jnp.asarray(center),
        jnp.float32(0.05), ncrops,
    )
    expected = oracle_dino(student, teacher, center, 0.05, ncrops)
    np.testing.assert_allclose(float(loss), expected, rtol=1e-5)
    # center EMA: 0.9*c + 0.1*mean(teacher)
    exp_center = center * 0.9 + teacher.mean(0, keepdims=True) * 0.1
    np.testing.assert_allclose(np.asarray(new_center), exp_center, rtol=1e-5, atol=1e-6)


def test_dino_center_psum_matches_global_mean():
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map

    devs = np.array(jax.devices()[:4])
    mesh = Mesh(devs, ("data",))
    rng = np.random.default_rng(1)
    teacher = rng.standard_normal((8, 16)).astype(np.float32)
    student = rng.standard_normal((8 * 3, 16)).astype(np.float32)
    center = np.zeros((1, 16), np.float32)

    def shard_fn(s, t, c):
        return dino_loss(s, t, c, jnp.float32(0.04), 3, axis_name="data")[1]

    f = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P("data"), P("data"), P()), out_specs=P(),
    )
    got = np.asarray(f(jnp.asarray(student), jnp.asarray(teacher), jnp.asarray(center)))
    want = center * 0.9 + teacher.mean(0, keepdims=True) * 0.1
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_cosine_scheduler_reference_shape():
    s = cosine_scheduler(0.5, 1e-6, epochs=4, niter_per_ep=10, warmup_epochs=1)
    assert len(s) == 40
    assert s[0] == 0.0
    np.testing.assert_allclose(s[10], 0.5, rtol=1e-6)  # peak right after warmup
    assert s[-1] < 0.01


def test_teacher_temp_schedule():
    t = teacher_temp_schedule(0.07, 0.04, 3, 5)
    np.testing.assert_allclose(t, [0.07, 0.055, 0.04, 0.04, 0.04], rtol=1e-6)


def test_warmup_cosine_lr():
    s = warmup_cosine_lr(1.0, total_steps=100, warmup_steps=10, eta_min=0.0)
    assert s[0] < s[9] <= 1.0
    np.testing.assert_allclose(s[10], 1.0, rtol=1e-6)
    assert s[-1] < 0.01


def test_mixup_batch_mode():
    cfg = MixupConfig(mixup_alpha=0.2, prob=1.0, num_classes=10)
    imgs = jnp.arange(4 * 8 * 8 * 3, dtype=jnp.float32).reshape(4, 8, 8, 3)
    labels = jnp.array([0, 1, 2, 3])
    mixed, targets = mixup_cutmix(jax.random.PRNGKey(0), imgs, labels, cfg)
    assert mixed.shape == imgs.shape and targets.shape == (4, 10)
    np.testing.assert_allclose(np.asarray(targets).sum(-1), 1.0, rtol=1e-5)
    # lam mixing: x' = lam*x + (1-lam)*flip(x); row sums preserved
    np.testing.assert_allclose(
        np.asarray(mixed).sum(), np.asarray(imgs).sum(), rtol=1e-5
    )


def test_mixup_disabled_prob_zero():
    cfg = MixupConfig(mixup_alpha=0.2, prob=0.0, num_classes=10)
    imgs = jnp.ones((2, 4, 4, 3))
    labels = jnp.array([1, 2])
    mixed, targets = mixup_cutmix(jax.random.PRNGKey(1), imgs, labels, cfg)
    np.testing.assert_allclose(np.asarray(mixed), np.asarray(imgs))
    assert np.asarray(targets)[0, 1] == 1.0


def test_cutmix_box():
    cfg = MixupConfig(mixup_alpha=0.0, cutmix_alpha=1.0, prob=1.0, num_classes=4)
    imgs = jnp.stack([jnp.zeros((16, 16, 1)), jnp.ones((16, 16, 1))])
    labels = jnp.array([0, 1])
    mixed, targets = mixup_cutmix(jax.random.PRNGKey(2), imgs, labels, cfg)
    frac_replaced = float(np.asarray(mixed)[0].mean())  # ones pasted into zeros
    lam = float(np.asarray(targets)[0, 0])
    np.testing.assert_allclose(1.0 - lam, frac_replaced, atol=1e-5)


def test_soft_target_ce():
    logits = jnp.array([[10.0, 0.0], [0.0, 10.0]])
    targets = jnp.array([[1.0, 0.0], [1.0, 0.0]])
    l = float(softmax_cross_entropy(logits, targets))
    assert l > 4.0  # second row is badly wrong


def test_mixup_elem_mode():
    cfg = MixupConfig(mixup_alpha=0.5, prob=1.0, num_classes=4, mode="elem")
    imgs = jnp.stack([jnp.full((4, 4, 3), float(i)) for i in range(4)])
    labels = jnp.arange(4)
    mixed, targets = mixup_cutmix(jax.random.PRNGKey(3), imgs, labels, cfg)
    assert mixed.shape == imgs.shape and targets.shape == (4, 4)
    np.testing.assert_allclose(np.asarray(targets).sum(-1), 1.0, rtol=1e-5)
    # element i mixed with element 3-i: pixel values between the two
    m = np.asarray(mixed)
    for i in range(4):
        lo, hi = sorted([i, 3 - i])
        assert lo - 1e-5 <= m[i].mean() <= hi + 1e-5


def test_mixup_pair_mode_symmetric():
    """'pair' (mixup_my.py:169-187): i and n-1-i share one lam and mix with
    each other symmetrically, so every pair's pixel/target sums are
    conserved."""
    cfg = MixupConfig(mixup_alpha=0.8, prob=1.0, num_classes=6, mode="pair")
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(-1, 1, (6, 8, 8, 3)).astype(np.float32))
    labels = jnp.arange(6) % 6
    mixed, targets = mixup_cutmix(jax.random.PRNGKey(3), imgs, labels, cfg)
    mixed, targets = np.asarray(mixed), np.asarray(targets)
    for i in range(3):
        j = 5 - i
        np.testing.assert_allclose(
            mixed[i] + mixed[j], np.asarray(imgs[i] + imgs[j]), atol=1e-5
        )
        np.testing.assert_allclose(
            targets[i] + targets[j],
            np.asarray(
                jax.nn.one_hot(labels[i], 6) + jax.nn.one_hot(labels[j], 6)
            ),
            atol=1e-5,
        )
    assert not np.allclose(mixed, np.asarray(imgs))  # something actually mixed


def test_mixup_elem_cutmix_boxes():
    """Per-element CutMix: each output is a patchwork of {self, partner}
    pixels, and the soft-target weight equals the kept-pixel fraction
    (correct_lam)."""
    cfg = MixupConfig(
        mixup_alpha=0.0, cutmix_alpha=1.0, prob=1.0, num_classes=8, mode="elem"
    )
    rng = np.random.default_rng(1)
    imgs = jnp.asarray(rng.uniform(0, 1, (4, 16, 16, 3)).astype(np.float32))
    labels = jnp.arange(4)
    mixed, targets = mixup_cutmix(jax.random.PRNGKey(5), imgs, labels, cfg)
    mixed, targets = np.asarray(mixed), np.asarray(targets)
    imgs = np.asarray(imgs)
    for i in range(4):
        j = 3 - i
        from_self = np.isclose(mixed[i], imgs[i]).all(-1)
        from_partner = np.isclose(mixed[i], imgs[j]).all(-1)
        assert (from_self | from_partner).all(), "pixels must be a patchwork"
        frac_partner = from_partner.mean()
        # target weight on the partner class == box fraction
        np.testing.assert_allclose(targets[i][j], frac_partner, atol=0.02)


def test_cutmix_minmax_boxes():
    """cutmix_minmax (timm rand_bbox_minmax, util/mixup_my.py:50-68):
    enables cutmix even at cutmix_alpha=0; every box dimension lands in
    [min·dim, max·dim); the soft-target weight equals the corrected box
    area. Checked per-element across a batch, plus the batch-mode and
    host-collate variants, and the bad-spec refusal."""
    import pytest

    h = w = 32
    cfg = MixupConfig(
        mixup_alpha=0.0, cutmix_alpha=0.0, cutmix_minmax=(0.25, 0.5),
        prob=1.0, num_classes=8, mode="elem",
    )
    assert cfg.enabled
    rng = np.random.default_rng(7)
    imgs = jnp.asarray(rng.uniform(0, 1, (6, h, w, 3)).astype(np.float32))
    labels = jnp.arange(6)
    mixed, targets = mixup_cutmix(jax.random.PRNGKey(9), imgs, labels, cfg)
    mixed, targets = np.asarray(mixed), np.asarray(targets)
    imgs_np = np.asarray(imgs)
    for i in range(6):
        j = 5 - i
        from_partner = np.isclose(mixed[i], imgs_np[j]).all(-1)
        ys, xs = np.nonzero(from_partner)
        bh, bw = ys.max() - ys.min() + 1, xs.max() - xs.min() + 1
        assert int(h * 0.25) <= bh < max(int(h * 0.5), int(h * 0.25) + 1) + 1
        assert int(w * 0.25) <= bw < max(int(w * 0.5), int(w * 0.25) + 1) + 1
        np.testing.assert_allclose(targets[i][j], from_partner.mean(),
                                   atol=0.02)

    # batch mode: one shared box, same bounds
    cfgb = MixupConfig(mixup_alpha=0.0, cutmix_alpha=0.0,
                       cutmix_minmax=(0.25, 0.5), prob=1.0, num_classes=8,
                       mode="batch")
    mixedb, targetsb = mixup_cutmix(jax.random.PRNGKey(3), imgs, labels, cfgb)
    fp = np.isclose(np.asarray(mixedb)[0], imgs_np[5]).all(-1)
    assert 0.25 * 0.25 * 0.9 <= fp.mean() <= 0.5 * 0.5 * 1.1

    # host collate twin
    from lafs_cvpr2024_tpu.ops.mixup import FastCollateMixup

    collate = FastCollateMixup(cfg, seed=1)
    u8 = (imgs_np * 255).astype(np.uint8)
    _, t_host = collate(u8, np.arange(6) % 8)
    np.testing.assert_allclose(t_host.sum(-1), 1.0, atol=1e-5)
    assert (t_host.max(-1) <= 1.0 - 0.25 * 0.25 + 1e-6).all(), (
        "minmax guarantees a box of at least min² area every time"
    )

    with pytest.raises(ValueError, match="cutmix_minmax"):
        mixup_cutmix(jax.random.PRNGKey(0), imgs, labels,
                     MixupConfig(cutmix_minmax=(0.9, 0.2), prob=1.0,
                                 num_classes=8, mode="batch"))


def test_mixup_unknown_mode_raises():
    import pytest

    cfg = MixupConfig(mixup_alpha=0.2, prob=1.0, num_classes=4, mode="half")
    imgs = jnp.zeros((4, 8, 8, 3))
    with pytest.raises(ValueError, match="unsupported mixup mode"):
        mixup_cutmix(jax.random.PRNGKey(0), imgs, jnp.zeros(4, jnp.int32), cfg)


def test_fast_collate_mixup_host():
    from lafs_cvpr2024_tpu.ops.mixup import FastCollateMixup

    rng = np.random.default_rng(2)
    imgs = rng.integers(0, 255, (6, 12, 12, 3)).astype(np.uint8)
    labels = np.arange(6) % 4
    for mode in ("batch", "elem", "pair"):
        collate = FastCollateMixup(
            MixupConfig(mixup_alpha=0.9, cutmix_alpha=0.9, prob=1.0,
                        num_classes=4, mode=mode),
            seed=3,
        )
        mixed, targets = collate(imgs, labels)
        assert mixed.dtype == np.uint8 and mixed.shape == imgs.shape
        np.testing.assert_allclose(targets.sum(-1), 1.0, atol=1e-5)
    import pytest

    with pytest.raises(ValueError):
        FastCollateMixup(MixupConfig(mode="nope"))
