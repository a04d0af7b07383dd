"""Training schedules as precomputed per-iteration arrays.

TPU-native stance: schedules are computed once on host as numpy arrays and a
single scalar is fed into the jitted train step each iteration (the reference
mutates optimizer param groups per step — ``utils.py:187-198``,
``lafs_train.py:513-517``).
"""

from __future__ import annotations

import numpy as np


def cosine_scheduler(
    base_value: float,
    final_value: float,
    epochs: int,
    niter_per_ep: int,
    warmup_epochs: int = 0,
    start_warmup_value: float = 0.0,
) -> np.ndarray:
    """Linear warmup to ``base_value`` then cosine decay to ``final_value``.

    Mirrors reference ``utils.py:187-198`` (one value per training iteration).
    """
    warmup_iters = warmup_epochs * niter_per_ep
    warmup = (
        np.linspace(start_warmup_value, base_value, warmup_iters)
        if warmup_epochs > 0
        else np.array([])
    )
    iters = np.arange(epochs * niter_per_ep - warmup_iters)
    n = max(len(iters), 1)
    sched = final_value + 0.5 * (base_value - final_value) * (
        1 + np.cos(np.pi * iters / n)
    )
    out = np.concatenate((warmup, sched))
    assert len(out) == epochs * niter_per_ep
    return out


def teacher_temp_schedule(
    warmup_teacher_temp: float,
    teacher_temp: float,
    warmup_teacher_temp_epochs: int,
    nepochs: int,
) -> np.ndarray:
    """Per-epoch teacher temperature (reference ``lafs_train.py:637-641``)."""
    return np.concatenate(
        (
            np.linspace(warmup_teacher_temp, teacher_temp, warmup_teacher_temp_epochs),
            np.ones(max(nepochs - warmup_teacher_temp_epochs, 0)) * teacher_temp,
        )
    )


def warmup_cosine_lr(
    base_lr: float,
    total_steps: int,
    warmup_steps: int,
    eta_min: float = 1e-6,
) -> np.ndarray:
    """Supervised schedule: linear warmup then CosineAnnealingLR.

    Equivalent of ``GradualWarmupScheduler(multiplier=1) + CosineAnnealingLR``
    (reference ``train_largescale.py:728-733``): lr ramps 0→base over
    ``warmup_steps`` optimizer steps, then cosine-anneals to ``eta_min`` over
    the remaining steps.
    """
    steps = np.arange(total_steps, dtype=np.float64)
    warm = base_lr * np.minimum(1.0, (steps + 1) / max(warmup_steps, 1))
    t = np.clip(steps - warmup_steps, 0, None)
    t_max = max(total_steps - warmup_steps, 1)
    cos = eta_min + 0.5 * (base_lr - eta_min) * (1 + np.cos(np.pi * t / t_max))
    return np.where(steps < warmup_steps, warm, cos)


def dino_lr_scaling(base_lr: float, batch_size_per_device: int, n_devices: int) -> float:
    """DINO linear LR scaling rule (reference ``lafs_train.py:411-412``)."""
    return base_lr * (batch_size_per_device * n_devices) / 256.0


def supervised_lr_scaling(
    base_lr: float, acc_step: int, batch_size: int, world_size: int
) -> float:
    """Supervised LR rule (reference ``train_largescale.py:472``):
    ``lr = acc_step/480 * base_lr * sqrt(world*batch/336) * 336``."""
    return acc_step / 480.0 * base_lr * float(np.sqrt(world_size * batch_size / 336.0)) * 336
