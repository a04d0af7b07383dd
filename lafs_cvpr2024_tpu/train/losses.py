"""Loss functions (pure jnp, psum-aware).

DINO loss (reference ``lafs_train.py:626-679``): cross-entropy between the
teacher's centered+sharpened softmax on the 2 global crops and the student's
softmax on all crops, skipping same-view pairs. The center EMA's
``dist.all_reduce`` becomes a ``psum`` over the data mesh axis *inside* the
jitted step — XLA fuses it with the backward collectives.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def softmax_cross_entropy(logits, soft_targets):
    """timm SoftTargetCrossEntropy (``train_largescale.py:47,602``)."""
    return jnp.mean(jnp.sum(-soft_targets * jax.nn.log_softmax(logits, axis=-1), axis=-1))


def cross_entropy(logits, labels):
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=1))


def dino_loss(
    student_output: jnp.ndarray,
    teacher_output: jnp.ndarray,
    center: jnp.ndarray,
    teacher_temp: jnp.ndarray,
    n_crops: int,
    student_temp: float = 0.1,
    center_momentum: float = 0.9,
    axis_name: Optional[str] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Compute DINO loss and the updated center.

    Args:
      student_output: (n_crops·B, K) head logits, crops stacked crop-major
        (crop 0 rows first) exactly like the reference's ``torch.cat`` order.
      teacher_output: (2·B, K) logits for the 2 global crops.
      center: (K,) or (1, K) running center buffer.
      teacher_temp: scalar (per-epoch schedule value).
      n_crops: total student crops.
      axis_name: data mesh axis for the center all-reduce (None = single
        device).

    Returns:
      (scalar loss, new center with EMA update applied).
    """
    k = student_output.shape[-1]
    center = center.reshape(1, k)
    student = (student_output / student_temp).reshape(n_crops, -1, k)
    teacher = jax.nn.softmax((teacher_output - center) / teacher_temp, axis=-1)
    teacher = jax.lax.stop_gradient(teacher).reshape(2, -1, k)

    logp = jax.nn.log_softmax(student, axis=-1)  # (n_crops, B, K)
    # cross terms: sum over iq in {0,1}, v != iq. (An einsum reformulation
    # measured ~4% slower on TPU and risks low-precision accumulation over
    # K=100k; the unrolled fp32 reductions are exact and XLA fuses them.)
    total = 0.0
    n_terms = 0
    for iq in range(2):
        for v in range(n_crops):
            if v == iq:
                continue
            total = total + jnp.mean(jnp.sum(-teacher[iq] * logp[v], axis=-1))
            n_terms += 1
    loss = total / n_terms

    # center update (lafs_train.py:669-679): mean over the GLOBAL batch of
    # teacher outputs, then EMA. psum(sum)/global_count == all_reduce path.
    batch_sum = jnp.sum(teacher_output, axis=0, keepdims=True)
    count = jnp.asarray(teacher_output.shape[0], batch_sum.dtype)
    if axis_name is not None:
        batch_sum = jax.lax.psum(batch_sum, axis_name)
        count = jax.lax.psum(count, axis_name)
    batch_center = batch_sum / count
    new_center = center * center_momentum + batch_center * (1 - center_momentum)
    return loss, new_center.reshape(center.shape)


def sface_loss(logits_s_cos, labels, s=64.0, k=80.0, a=0.80, b=1.23):
    """SFace sigmoid-weighted intra/inter loss on s·cosθ logits."""
    cos = logits_s_cos / s
    one_hot = jax.nn.one_hot(labels, cos.shape[-1], dtype=cos.dtype)
    cos_y = jnp.sum(cos * one_hot, axis=-1)
    w_intra = jax.nn.sigmoid(-k * (cos_y - a))
    intra = -w_intra * cos_y
    w_inter = jax.nn.sigmoid(k * (cos - b))
    inter = jnp.sum((1 - one_hot) * w_inter * cos, axis=-1)
    return jnp.mean(intra + inter) * s
