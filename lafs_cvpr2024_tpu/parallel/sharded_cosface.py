"""Class-sharded CosFace margin head with numerically-stable cross-shard CE.

The reference's only tensor parallelism: the CosFace classifier weight
(205,990×768 ≈ 158M params) chunked across GPUs with logits concatenated on
device 0 (``ViT_face.py:54-64``, disabled in shipped configs; PartialFC
import commented at ``ViT_face.py:645-651``). Here it is first-class: the
weight lives sharded over the ``model`` mesh axis, each shard computes
logits for its class slice, and softmax-CE is computed WITHOUT materializing
the full logit row — only scalar max/sum cross-shard reductions (pmax/psum)
travel the ICI.

Works for hard int labels and soft (mixup) label rows; the soft-label row is
sharded along classes together with the weight.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _l2norm(x, axis=-1, eps=1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)


def local_margin_logits(embeddings, weight_shard, one_hot_shard, s, m):
    """CosFace logits for this shard's class slice. one_hot_shard may be a
    hard one-hot slice or soft mixup rows (margin scaled by label value,
    ViT_face.py:69-88)."""
    cosine = _l2norm(embeddings) @ _l2norm(weight_shard).T
    return s * (cosine - m * one_hot_shard)


def sharded_softmax_ce(
    logits_shard: jnp.ndarray,
    target_shard: jnp.ndarray,
    axis_name: str = "model",
) -> jnp.ndarray:
    """Mean softmax cross-entropy where the class dim is sharded.

    logits_shard: (B, C/shard); target_shard: (B, C/shard) soft targets whose
    GLOBAL row-sum is 1. Returns scalar loss (identical on every shard).
    """
    # max-shift is gradient-neutral; pmax has no VJP rule, so gather the
    # per-shard maxima (B·n_shards scalars — negligible) and reduce locally.
    local_max = jax.lax.stop_gradient(jnp.max(logits_shard, axis=-1))
    row_max = jnp.max(jax.lax.all_gather(local_max, axis_name, axis=0), axis=0)
    shifted = logits_shard - row_max[:, None]
    denom = jax.lax.psum(jnp.sum(jnp.exp(shifted), axis=-1), axis_name)  # (B,)
    log_z = jnp.log(denom) + row_max
    # sum_c t_c * logit_c is a partial sum over this shard's classes
    tl = jax.lax.psum(jnp.sum(target_shard * logits_shard, axis=-1), axis_name)
    return jnp.mean(log_z - tl)


def shard_one_hot(labels, num_classes_global, axis_name="model"):
    """Build this shard's slice of the one-hot matrix from global int labels.

    Labels are replicated; each shard owns classes
    [idx*C_loc, (idx+1)*C_loc).
    """
    idx = jax.lax.axis_index(axis_name)
    n_shards = jax.lax.axis_size(axis_name)
    c_loc = num_classes_global // n_shards
    local = labels - idx * c_loc
    valid = (local >= 0) & (local < c_loc)
    return jax.nn.one_hot(jnp.where(valid, local, 0), c_loc) * valid[:, None]


def cosface_ce_sharded(
    embeddings: jnp.ndarray,
    weight_shard: jnp.ndarray,
    labels,
    s: float = 64.0,
    m: float = 0.4,
    num_classes_global: Optional[int] = None,
    axis_name: str = "model",
) -> jnp.ndarray:
    """Full sharded pipeline: margin logits on the local class slice + stable
    cross-shard CE. ``labels``: (B,) global ints or (B, C/shard) soft rows
    (already sharded along classes)."""
    if labels.ndim == 1:
        assert num_classes_global is not None
        target = shard_one_hot(labels, num_classes_global, axis_name)
    else:
        target = labels
    logits = local_margin_logits(embeddings, weight_shard, target, s, m)
    return sharded_softmax_ce(logits, target, axis_name)
