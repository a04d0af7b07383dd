"""PartialFC-style sampled margin head (negative-class sampling).

The reference imports insightface's PartialFC but ships it commented out
(``ViT_face.py:645-651``) — at 205,990 classes the margin head dominates
the supervised step's memory traffic (measured 24.1 ms/step of the
218.9 ms total, docs/PERF.md §factored-head). PartialFC is the standard
production fix: each step computes the margin softmax over ALL positive
classes of the step plus a uniform sample of negatives (a fraction
``pfc_ratio`` of the class set), and only the sampled weight rows (and
their optimizer moments) are touched.

TPU-native formulation (vs insightface's per-GPU sampling + sparse SGD):

- the sample is drawn ONCE per step, statically shaped, identical on
  every data shard (the sample rng is taken before the per-shard rng
  fold, so the sparse update is the same everywhere and the cross-shard
  dW allreduce shrinks by ``pfc_ratio``);
- composes with the TP-sharded head (block sampler only — insightface's
  actual PartialFC×model-parallel production layout): each model shard
  draws its own block within the class range it owns
  (:func:`block_sample_local`), positives contribute exactly one live
  column across the mesh (their owner's), and the cross-shard softmax
  reductions are unchanged;
- gradients reach the weight through the factored-head path
  (``train/supervised.py``): the scan emits ``(nemb, dcos)`` factors in
  SAMPLED class space, so the per-step dW GEMM is ``(C_s, acc·b × D)``;
- the update is a sparse-row AdamW: only the sampled rows of (w, μ, ν)
  are read/updated/written, fp32 math. Unsampled rows are untouched —
  exactly insightface's semantics (their moments do not decay on steps
  where the class is unsampled), with AdamW's global step count used for
  bias correction on every row (insightface sidesteps this by using SGD).

Two samplers ship (``pfc_sampler``):

- ``"uniform"`` — insightface-faithful: top_k over uniform keys with
  positives forced in; sampled rows are scattered across the class set.
  MEASURED A WASH vs the full dense head on TPU (208.5 vs 207.8 ms/step
  at ratio 0.1): XLA's scattered row gather/scatter on the (C, D)
  weight and moments runs at ~1.4 GB/s effective (45.7 ms standalone
  for a 63 MB row gather), wiping out everything the sampling saves
  (docs/PERF.md §partial-fc).
- ``"block"`` (default) — TPU-native: the negative sample is ONE random
  contiguous class block, and the step's positive classes ride along as
  explicit extra columns (duplicates masked). Every weight/moment/
  target access becomes a ``dynamic_slice``/``dynamic_update_slice``
  (contiguous, HBM-speed) plus a tiny P-row scatter for the positives.
  Measured 201.1 ms/step at ratio 0.1 (955 imgs/s/chip, +3.3% over the
  factored dense head, +8.9% over the baseline in-model head; head
  block cost 24.1 → 6.3 ms).
  Negatives are uniform across steps (random block start); within a
  step they are adjacent class ids — an arbitrary set, since class id
  order carries no semantics. Block starts are drawn from
  ``[0, C - C_s]`` (no wrap), so the first/last ``C_s`` class ids are
  negatives slightly less often — immaterial at ratio ≤ 0.5.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from typing import TYPE_CHECKING

if TYPE_CHECKING:  # runtime import would be circular: train.__init__ pulls
    # in train.supervised, which imports this module
    from ..train.optim import AdamWState


def sample_classes(rng, positive_labels, num_classes: int, num_sample: int):
    """Uniform class sample WITHOUT replacement, positives forced in.

    positive_labels: int array of class ids that must appear (duplicates
    fine — e.g. the concatenated labels of every microbatch and data
    shard). Requires ``num_sample >= unique(positive_labels)`` — the
    caller guarantees it statically with ``num_sample >= labels.size``.
    Returns ``idx`` (num_sample,) int32, unordered.
    """
    scores = jax.random.uniform(rng, (num_classes,))
    scores = scores.at[positive_labels.reshape(-1)].set(2.0)
    _, idx = jax.lax.top_k(scores, num_sample)
    return idx


def first_occurrence_mask(ids):
    """(P,) bool: True where ids[i] is the first slot holding that value.

    Sort-based O(P log P): the naive all-pairs comparison materializes a
    (P, P) boolean — at pod scale the step gathers every data shard's
    labels (P ≈ 50k on a 256-chip DP run), where P² would be gigabytes.
    jnp.argsort is stable, so the first slot of each run of equal sorted
    ids IS the first occurrence in original order (any one-slot-per-class
    choice would be correct — targets/updates are gated consistently —
    but stability keeps it deterministic and testable)."""
    order = jnp.argsort(ids)
    s = ids[order]
    first_sorted = jnp.concatenate(
        [jnp.ones((1,), bool), s[1:] != s[:-1]]
    )
    return jnp.zeros(ids.shape, bool).at[order].set(first_sorted)


def block_sample(rng, positives, num_classes: int, block_size: int):
    """Contiguous-block negative sample + explicit positive columns.

    Returns ``(start, u_pos)``: the block covers classes
    ``[start, start+block_size)``; ``u_pos`` (P,) bool marks positive
    slots that are LIVE — the first occurrence of each positive class
    that is NOT already inside the block. Dead slots must be masked out
    of the CE (logits → −inf, targets → 0) so each class contributes
    exactly one column.
    """
    start = jax.random.randint(rng, (), 0, num_classes - block_size + 1)
    in_block = (positives >= start) & (positives < start + block_size)
    return start, first_occurrence_mask(positives) & ~in_block


def block_sample_local(rng, positives, c_loc: int, block_size: int, shard_idx):
    """Per-shard block sample for the TP-sharded head (insightface's actual
    production layout: PartialFC *composed with* model parallelism — each
    rank samples within the class range it owns).

    ``positives`` are GLOBAL class ids; shard ``shard_idx`` owns
    ``[shard_idx·c_loc, (shard_idx+1)·c_loc)``. Returns
    ``(start, row_idx, u_pos)``: ``start`` is the block start in LOCAL
    class space; ``row_idx`` (P,) are local row indices for the positive
    slots (clipped to 0 for slots this shard does not own — their updates
    are gated off); ``u_pos`` marks LIVE positive slots: first global
    occurrence of a class this shard owns that is outside its block. A
    positive class therefore contributes exactly one live column across
    the whole mesh (its owner's), which keeps the cross-shard softmax
    normalization exact.
    """
    start = jax.random.randint(rng, (), 0, c_loc - block_size + 1)
    local = positives - shard_idx * c_loc
    owned = (local >= 0) & (local < c_loc)
    in_block = owned & (local >= start) & (local < start + block_size)
    u_pos = first_occurrence_mask(positives) & owned & ~in_block
    return start, jnp.where(owned, local, 0), u_pos


def block_pos_adamw(
    grad_rows: jnp.ndarray,
    opt: AdamWState,
    w: jnp.ndarray,
    start,
    block_size: int,
    positives: jnp.ndarray,
    u_pos: jnp.ndarray,
    lr,
    wd: float = 0.0,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
):
    """Sparse AdamW for the block sampler: the contiguous block rows move
    through ``dynamic_slice``/``dynamic_update_slice`` (HBM-speed), the
    P live positive rows through a tiny delta scatter-add (dead slots add
    exact zeros, so duplicate indices are harmless).

    ``grad_rows``: (block_size + P, D) — block rows first, positive-slot
    rows after (dead slots carry zero gradient by construction).
    """
    count = opt.count + 1
    cf = count.astype(jnp.float32)
    c1 = 1 - b1**cf
    c2 = 1 - b2**cf
    mu_full, nu_full = opt.mu["w"], opt.nu["w"]
    d = w.shape[1]

    def adam_rows(p, m, v, g):
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * jnp.square(g)
        new_p = p - lr * ((m / c1) / (jnp.sqrt(v / c2) + eps) + wd * p)
        return new_p, m, v

    # contiguous block rows
    sl = lambda a: jax.lax.dynamic_slice(
        a, (start, 0), (block_size, d)
    ).astype(jnp.float32)
    new_b, m_b, v_b = adam_rows(
        sl(w), sl(mu_full), sl(nu_full),
        grad_rows[:block_size].astype(jnp.float32),
    )
    ups = lambda a, rows: jax.lax.dynamic_update_slice(
        a, rows.astype(a.dtype), (start, 0)
    )
    w = ups(w, new_b)
    mu_full = ups(mu_full, m_b)
    nu_full = ups(nu_full, v_b)

    # positive rows OUTSIDE the block (gather AFTER the block write: rows
    # outside the block are untouched by it, and dead in-block slots are
    # gated to zero deltas anyway)
    p_o = w[positives].astype(jnp.float32)
    m_o = mu_full[positives].astype(jnp.float32)
    v_o = nu_full[positives].astype(jnp.float32)
    new_p, m_p, v_p = adam_rows(
        p_o, m_o, v_o, grad_rows[block_size:].astype(jnp.float32)
    )
    gate = u_pos[:, None]
    add = lambda a, new, old: a.at[positives].add(
        jnp.where(gate, new - old, 0.0).astype(a.dtype)
    )
    return (
        add(w, new_p, p_o),
        type(opt)(
            count,
            {"w": add(mu_full, m_p, m_o)},
            {"w": add(nu_full, v_p, v_o)},
        ),
    )


def sparse_row_adamw(
    grad_rows: jnp.ndarray,
    opt: AdamWState,
    w: jnp.ndarray,
    idx: jnp.ndarray,
    lr,
    wd: float = 0.0,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
):
    """AdamW on the ``idx`` rows of ``w`` only; other rows (and their
    moments) are untouched. Math in fp32 regardless of the moment storage
    dtype (mirrors ``optim.adamw_update``); ``idx`` must be
    duplicate-free (``sample_classes`` guarantees it).

    ``opt`` moments are ``{"w": (C, D)}`` trees as produced by
    ``create_classifier`` so the checkpoint payload layout is identical
    to the dense path.
    """
    count = opt.count + 1
    cf = count.astype(jnp.float32)
    c1 = 1 - b1**cf
    c2 = 1 - b2**cf
    mu_full, nu_full = opt.mu["w"], opt.nu["w"]
    g = grad_rows.astype(jnp.float32)
    m = b1 * mu_full[idx].astype(jnp.float32) + (1 - b1) * g
    v = b2 * nu_full[idx].astype(jnp.float32) + (1 - b2) * jnp.square(g)
    p = w[idx].astype(jnp.float32)
    step = (m / c1) / (jnp.sqrt(v / c2) + eps) + wd * p
    new_rows = p - lr * step
    return (
        w.at[idx].set(new_rows.astype(w.dtype)),
        type(opt)(
            count,
            {"w": mu_full.at[idx].set(m.astype(mu_full.dtype))},
            {"w": nu_full.at[idx].set(v.astype(nu_full.dtype))},
        ),
    )
