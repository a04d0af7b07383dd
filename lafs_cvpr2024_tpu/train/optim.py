"""Optimizers and parameter-group policies as pure pytree transforms.

The reference mutates torch param groups per step (lr/wd schedules,
layer-wise decay). TPU-native: per-leaf hyperparameter TREES are built once
on host; the jitted step takes scalar lr/wd and applies
``lr * lr_scale_leaf`` / ``wd_scale_leaf * wd`` elementwise — zero Python in
the hot loop, and the whole update fuses with the grad psum.

Covers: AdamW (torch semantics), LARS (``utils.py:553-591``), per-param
gradient clipping (``utils.py:132-141`` — DINO clips each parameter's norm
INDIVIDUALLY, not globally), last-layer grad cancellation
(``utils.py:144-149``), DINO wd masking (``utils.py:662-673``), and BEiT
layer-wise lr decay (``train_largescale.py:122-197``).
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp


class AdamWState(NamedTuple):
    count: jnp.ndarray
    mu: Any
    nu: Any


def stochastic_round(x, key, dtype=jnp.bfloat16):
    """Unbiased fp32 → bf16 cast via stochastic rounding.

    Round-to-nearest-even silently swallows increments below the target
    ulp — fatal for low-precision EMA/moment STORAGE, where the per-step
    update ``(1-m)·Δ`` is routinely smaller than ``ulp(state)`` (an RNE
    bf16 EMA with m=0.996 simply stops moving). SR rounds up with
    probability proportional to the truncated fraction, so the *expected*
    stored value equals the fp32 value and the state keeps integrating.

    Implementation: bf16 is fp32's top 16 bits, so add uniform 16-bit
    noise to the low mantissa bits and truncate (sign-magnitude ⇒ the
    same trick is unbiased for both signs). Non-finite values pass
    through untouched. Costs one hardware-PRNG draw per element — cheap
    on TPU with the rbg generator.
    """
    if dtype != jnp.bfloat16:
        raise ValueError("stochastic_round targets bfloat16 storage")
    bits = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
    noise = jax.random.bits(key, x.shape, jnp.uint32) & jnp.uint32(0xFFFF)
    finite = (bits & jnp.uint32(0x7F800000)) != jnp.uint32(0x7F800000)
    rounded = (bits + jnp.where(finite, noise, jnp.uint32(0))) >> 16
    return jax.lax.bitcast_convert_type(rounded.astype(jnp.uint16), jnp.bfloat16)


def _sr_cast(x, key, like):
    """Cast fp32 ``x`` to ``like``'s dtype — stochastically when that is
    bf16, exactly (no-op) when fp32."""
    if like.dtype == jnp.bfloat16:
        return stochastic_round(x, key)
    return x.astype(like.dtype)


def adamw_init(params, moment_dtype=None) -> AdamWState:
    """``moment_dtype`` stores the moments in a lower precision (bf16 halves
    the optimizer's HBM traffic — ~2 GB/step on the flagship SSL state); the
    update math always runs in fp32 (optax ``mu_dtype`` semantics)."""
    zeros = lambda p: jnp.zeros_like(p, dtype=moment_dtype or p.dtype)
    return AdamWState(
        count=jnp.zeros((), jnp.int32),
        mu=jax.tree_util.tree_map(zeros, params),
        nu=jax.tree_util.tree_map(zeros, params),
    )


def adamw_update(
    grads,
    state: AdamWState,
    params,
    lr,
    wd_scale_tree=None,
    lr_scale_tree=None,
    wd=0.0,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
):
    """torch.optim.AdamW semantics: ``p -= lr_leaf * (m̂/(√v̂+eps) + wd_leaf*p)``.

    ``wd_scale_tree`` leaves multiply the scalar ``wd`` (use 0/1 masks for
    the DINO no-decay groups, or absolute values with ``wd=1``);
    ``lr_scale_tree`` leaves multiply the scalar ``lr`` (layer-wise decay).
    """
    count = state.count + 1
    c1 = 1 - b1 ** count.astype(jnp.float32)
    c2 = 1 - b2 ** count.astype(jnp.float32)
    # moment math in fp32 regardless of storage dtype (bf16-stored moments
    # would otherwise swallow the (1-b2)=1e-3 vu increments entirely)
    mu = jax.tree_util.tree_map(
        lambda m, g: b1 * m.astype(jnp.float32) + (1 - b1) * g.astype(jnp.float32),
        state.mu, grads,
    )
    nu = jax.tree_util.tree_map(
        lambda v, g: b2 * v.astype(jnp.float32)
        + (1 - b2) * jnp.square(g.astype(jnp.float32)),
        state.nu, grads,
    )

    ones = jax.tree_util.tree_map(lambda p: 1.0, params)
    wd_t = wd_scale_tree if wd_scale_tree is not None else ones
    lr_t = lr_scale_tree if lr_scale_tree is not None else ones

    def upd(p, m, v, wscale, lscale):
        mhat = m / c1
        vhat = v / c2
        step = mhat / (jnp.sqrt(vhat) + eps) + (wd * wscale) * p.astype(jnp.float32)
        return (p.astype(jnp.float32) - (lr * lscale) * step).astype(p.dtype)

    new_params = jax.tree_util.tree_map(upd, params, mu, nu, wd_t, lr_t)
    cast_back = lambda new, old: jax.tree_util.tree_map(
        lambda n, o: n.astype(o.dtype), new, old
    )
    return new_params, AdamWState(
        count, cast_back(mu, state.mu), cast_back(nu, state.nu)
    )


def _zero1_chunk(n_shards: int, size: int) -> int:
    return -(-size // n_shards)


def zero1_init(params, n_shards: int, moment_dtype=None) -> AdamWState:
    """ZeRO-1 AdamW state: each moment leaf is stored FLAT, padded to
    ``n_shards`` equal chunks — shape ``(n_shards·ceil(size/n),)`` — and
    meant to live SHARDED over the data axis (``P('data')`` leading dim),
    so each data shard holds 1/n of the optimizer state instead of a full
    replica (the replicated layout costs 2×param-count per device; on the
    flagship that is ~0.9 GB fp32 per chip for moments alone). The count
    scalar stays replicated. Pair with :func:`zero1_adamw_update`."""
    def z(p):
        c = _zero1_chunk(n_shards, p.size)
        return jnp.zeros((n_shards * c,), dtype=moment_dtype or p.dtype)
    return AdamWState(
        count=jnp.zeros((), jnp.int32),
        mu=jax.tree_util.tree_map(z, params),
        nu=jax.tree_util.tree_map(z, params),
    )


def zero1_shard_moments(opt: AdamWState, params, n_shards: int) -> AdamWState:
    """Convert a replicated :func:`adamw_init`-layout state to the ZeRO-1
    flat-chunked layout (resume a dense checkpoint onto a mesh with
    ``zero1=True``). Values are preserved exactly; padding is zeros."""
    def to_flat(m, p):
        c = _zero1_chunk(n_shards, p.size)
        return jnp.pad(m.reshape(-1), (0, n_shards * c - p.size))
    return AdamWState(
        count=opt.count,
        mu=jax.tree_util.tree_map(to_flat, opt.mu, params),
        nu=jax.tree_util.tree_map(to_flat, opt.nu, params),
    )


def zero1_unshard_moments(opt: AdamWState, params) -> AdamWState:
    """Inverse of :func:`zero1_shard_moments`: flat-chunked → the leaf-shaped
    replicated layout (resume a ZeRO-1 checkpoint on a single chip or with
    ``zero1=False``)."""
    def to_leaf(m, p):
        return m[:p.size].reshape(p.shape)
    return AdamWState(
        count=opt.count,
        mu=jax.tree_util.tree_map(to_leaf, opt.mu, params),
        nu=jax.tree_util.tree_map(to_leaf, opt.nu, params),
    )


def adapt_moment_layout(opt: AdamWState, params, zero1_shards: int) -> AdamWState:
    """Convert an :class:`AdamWState` between the dense leaf-shaped layout
    (:func:`adamw_init`) and the ZeRO-1 flat-chunked layout
    (:func:`zero1_init`) to match ``zero1_shards`` (0 = dense). No-op when
    already in the target layout; a flat state chunked for a DIFFERENT
    shard count is re-chunked via the dense intermediate. This is the
    resume glue for switching ``--zero1`` (or the mesh's data-axis size)
    between runs — the CLIs call it through
    ``checkpoint.restore_checkpoint_flex``."""
    mu_leaves = jax.tree_util.tree_leaves(opt.mu)
    p_leaves = jax.tree_util.tree_leaves(params)
    leaf_shaped = all(
        m.shape == p.shape for m, p in zip(mu_leaves, p_leaves)
    )
    if zero1_shards:
        if not leaf_shaped:
            want = [
                (zero1_shards * _zero1_chunk(zero1_shards, p.size),)
                for p in p_leaves
            ]
            if all(m.shape == w for m, w in zip(mu_leaves, want)):
                return opt
            opt = zero1_unshard_moments(opt, params)
        return zero1_shard_moments(opt, params, zero1_shards)
    return opt if leaf_shaped else zero1_unshard_moments(opt, params)


def zero1_adamw_update(
    grad_sums,
    state: AdamWState,
    params,
    lr,
    n_shards: int,
    axis_name: str = "data",
    wd_scale_tree=None,
    lr_scale_tree=None,
    wd=0.0,
    grad_scale: float = 1.0,
    global_clip: float = 0.0,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
):
    """ZeRO-1 data-flow inside ``shard_map`` (How-to-Scale "optimizer state
    sharding"): per leaf, ``psum_scatter`` the locally-summed gradient over
    ``axis_name`` (HALF an allreduce — each shard receives only its chunk
    of the mean), run fp32 AdamW on this shard's 1/n chunk of the
    flattened padded parameter + its local moment chunks, and
    ``all_gather`` the updated parameter chunks back to the full replica
    (the second half of the allreduce). Total collective bytes match the
    plain pmean-allreduce path, but moment read/write traffic and storage
    drop by n, and the elementwise update runs on 1/n of the state per
    chip.

    ``grad_sums`` are LOCAL sums (no pmean applied); fold the microbatch/
    shard mean into ``grad_scale`` (e.g. ``1/(acc·n_data)``). ``state``
    holds the LOCAL (c,) moment chunk views that shard_map carves from
    the global ``(n·c,)`` arrays produced by :func:`zero1_init`.
    Semantics match :func:`adamw_update` exactly (same fp32 math, same
    torch AdamW update rule); padding chunks see zero grads and zero
    params, so they stay zero forever.

    ``global_clip`` > 0 applies torch ``clip_grad_norm_`` semantics on the
    scattered mean gradient — the global norm no shard holds is assembled
    as ONE scalar psum of the per-chunk squared sums.
    """
    count = state.count + 1
    f32 = jnp.float32
    c1 = 1 - b1 ** count.astype(f32)
    c2 = 1 - b2 ** count.astype(f32)
    ones = jax.tree_util.tree_map(lambda p: 1.0, params)
    wd_t = wd_scale_tree if wd_scale_tree is not None else ones
    lr_t = lr_scale_tree if lr_scale_tree is not None else ones
    idx = jax.lax.axis_index(axis_name)

    treedef = jax.tree_util.tree_structure(params)
    flat = lambda tree: treedef.flatten_up_to(tree)
    m_l, v_l, p_l = flat(state.mu), flat(state.nu), flat(params)

    # pass 1: reduce-scatter every leaf to its local mean chunk
    gls = []
    for g, m in zip(flat(grad_sums), m_l):
        c = m.shape[0]  # local chunk length
        gf = jnp.pad(g.reshape(-1).astype(f32), (0, n_shards * c - g.size))
        gls.append(jax.lax.psum_scatter(
            gf, axis_name, scatter_dimension=0, tiled=True
        ) * grad_scale)
    if global_clip:
        gn = jnp.sqrt(jax.lax.psum(
            sum(jnp.sum(jnp.square(gl)) for gl in gls), axis_name
        ))
        coef = jnp.minimum(global_clip / (gn + 1e-6), 1.0)
        gls = [gl * coef for gl in gls]

    # pass 2: AdamW on the local chunk, gather the updated params
    def leaf(gl, m, v, p, wscale, lscale):
        c = m.shape[0]
        pf = jnp.pad(p.reshape(-1).astype(f32), (0, n_shards * c - p.size))
        pl = jax.lax.dynamic_slice(pf, (idx * c,), (c,))
        m_new = b1 * m.astype(f32) + (1 - b1) * gl
        v_new = b2 * v.astype(f32) + (1 - b2) * jnp.square(gl)
        step = (m_new / c1) / (jnp.sqrt(v_new / c2) + eps) + (wd * wscale) * pl
        p_new = pl - (lr * lscale) * step
        full = jax.lax.all_gather(p_new, axis_name, axis=0, tiled=True)
        return (
            full[:p.size].reshape(p.shape).astype(p.dtype),
            m_new.astype(m.dtype),
            v_new.astype(v.dtype),
        )

    out = [
        leaf(gl, *leaves)
        for gl, leaves in zip(gls, zip(m_l, v_l, p_l, flat(wd_t), flat(lr_t)))
    ]
    unflat = lambda i: jax.tree_util.tree_unflatten(treedef, [o[i] for o in out])
    return unflat(0), AdamWState(count, unflat(1), unflat(2))


class LARSState(NamedTuple):
    mu: Any


def lars_init(params) -> LARSState:
    return LARSState(mu=jax.tree_util.tree_map(jnp.zeros_like, params))


def lars_update(
    grads, state: LARSState, params, lr, wd=0.0, momentum=0.9, eta=0.001
):
    """LARS (reference ``utils.py:553-591``): trust-ratio scaling on >1-D
    params, plain momentum-SGD on 1-D (bias/norm) params."""

    def upd(p, g, m):
        dp = g
        if p.ndim != 1:
            dp = dp + wd * p
            pn = jnp.linalg.norm(p)
            un = jnp.linalg.norm(dp)
            q = jnp.where((pn > 0) & (un > 0), eta * pn / un, 1.0)
            dp = dp * q
        m_new = momentum * m + dp
        return p - lr * m_new, m_new

    flat = jax.tree_util.tree_map(upd, params, grads, state.mu)
    new_params = jax.tree_util.tree_map(lambda t: t[0], flat, is_leaf=lambda t: isinstance(t, tuple))
    new_mu = jax.tree_util.tree_map(lambda t: t[1], flat, is_leaf=lambda t: isinstance(t, tuple))
    return new_params, LARSState(new_mu)


class SGDState(NamedTuple):
    mu: Any


def sgd_init(params) -> SGDState:
    return SGDState(mu=jax.tree_util.tree_map(jnp.zeros_like, params))


def sgd_update(
    grads, state: SGDState, params, lr, wd=0.0, momentum=0.9,
    wd_scale_tree=None,
):
    """``torch.optim.SGD(momentum=0.9)`` semantics (the reference's
    ``--optimizer sgd`` branch, ``lafs_train.py:401-402``): L2 weight decay
    folded into the gradient (``d = g + wd·p``), momentum buffer
    ``mu = m·mu + d`` (dampening 0, no nesterov), update ``p −= lr·mu``.
    A zero-initialized buffer makes step 1 equal torch's lazily-created
    ``buf = d``. ``wd_scale_tree`` carries the DINO no-WD mask for
    bias/1-D params (``utils.py:662-673``)."""
    wscale = (wd_scale_tree if wd_scale_tree is not None
              else jax.tree_util.tree_map(lambda _: 1.0, params))

    def upd(p, g, m, ws):
        d = g + wd * ws * p
        m_new = momentum * m + d
        return p - lr * m_new, m_new

    flat = jax.tree_util.tree_map(upd, params, grads, state.mu, wscale)
    is_pair = lambda t: isinstance(t, tuple)
    new_params = jax.tree_util.tree_map(lambda t: t[0], flat, is_leaf=is_pair)
    new_mu = jax.tree_util.tree_map(lambda t: t[1], flat, is_leaf=is_pair)
    return new_params, SGDState(new_mu)


def clip_grads_per_param(grads, clip: float):
    """DINO-style per-parameter norm clip (``utils.py:132-141``): each leaf
    whose 2-norm exceeds ``clip`` is scaled down to it."""

    def c(g):
        n = jnp.linalg.norm(g)
        coef = clip / (n + 1e-6)
        return g * jnp.minimum(coef, 1.0)

    return jax.tree_util.tree_map(c, grads)


def clip_grads_global(grads, max_norm: float):
    """torch.nn.utils.clip_grad_norm_ semantics (global norm)."""
    leaves = jax.tree_util.tree_leaves(grads)
    gn = jnp.sqrt(sum(jnp.sum(g.astype(jnp.float32) ** 2) for g in leaves))
    coef = jnp.minimum(max_norm / (gn + 1e-6), 1.0)
    return jax.tree_util.tree_map(lambda g: g * coef, grads)


def zero_grads_by_path(grads, predicate: Callable[[str], bool]):
    """Zero gradients of leaves whose '/'-joined path matches ``predicate``
    (e.g. freeze DINO's last layer at epoch 0, ``utils.py:144-149``, or the
    frozen stn during SSL, ``lafs_train.py:150-154``)."""
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    treedef = jax.tree_util.tree_structure(grads)
    out = []
    for path, leaf in flat:
        name = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)
        out.append(jnp.zeros_like(leaf) if predicate(name) else leaf)
    return jax.tree_util.tree_unflatten(treedef, out)


def _path_name(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)


def dino_wd_mask(params):
    """get_params_groups (``utils.py:662-673``): no weight decay for biases
    and 1-D params. Returns a 0/1 tree multiplying the scheduled wd."""
    return jax.tree_util.tree_map_with_path(
        lambda path, p: 0.0 if (p.ndim <= 1 or _path_name(path).endswith("bias")) else 1.0,
        params,
    )


def _vit_layer_id(name: str, num_layers: int) -> int:
    """get_layer_id_for_vit (``train_largescale.py:174-197``) translated to
    our param tree paths."""
    if name.startswith(("cls_token", "pos_embedding", "patch_to_embedding")):
        return 0
    if name.startswith(("landmark", "stn", "output_layer", "global_token")):
        return 0
    if name.startswith("transformer/layers_"):
        return int(name.split("layers_")[1].split("/")[0]) + 1
    return num_layers


def param_groups_lrd(params, depth: int, weight_decay=0.1, layer_decay=0.58,
                     stn_weight_decay=5e-2):
    """BEiT layer-wise lr decay policy (``train_largescale.py:122-197``,
    defaults from ``:621-623``). Returns ``(lr_scale_tree, wd_value_tree)``
    — use with ``adamw_update(..., wd=1.0, wd_scale_tree=wd_value_tree)``.
    """
    num_layers = depth + 1

    def lr_scale(path, p):
        name = _path_name(path)
        return float(layer_decay ** (num_layers - _vit_layer_id(name, num_layers)))

    def wd_val(path, p):
        name = _path_name(path)
        if p.ndim <= 1 or name.endswith("bias"):
            return 0.0
        if name.startswith(("landmark/stn", "stn")):
            return float(stn_weight_decay)
        return float(weight_decay)

    lr_tree = jax.tree_util.tree_map_with_path(lr_scale, params)
    wd_tree = jax.tree_util.tree_map_with_path(wd_val, params)
    return lr_tree, wd_tree


def fused_adamw_ema_update(
    grads,
    state: AdamWState,
    params,
    teacher,
    lr,
    wd,
    momentum,
    wd_scale_tree=None,
    gate_tree=None,
    gate_scalar=None,
    clip: float = 0.0,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    sr_rng=None,
    sr_moments: bool = False,
):
    """ONE traversal for the whole SSL update tail: per-leaf grad clip +
    freeze gating + AdamW + EMA teacher, chained per leaf so XLA emits a
    single fused elementwise pass over (g, μ, ν, p, t) per parameter
    instead of ~8 separate tree_map sweeps (clip, gate, μ, ν, update,
    2 casts, EMA). Bandwidth-bound tail — fewer passes = fewer HBM trips.

    ``gate_tree`` leaves (0/1) select gradients that are scaled by the
    runtime scalar ``gate_scalar`` (last-layer freeze: gate=1 leaves get
    ``g·gate_scalar``); leaves with gate 2 are hard-zeroed (weight-norm g
    freeze). Semantics identical to clip_grads_per_param +
    zero_grads_by_path + adamw_update + ema_update composed.

    ``sr_rng`` (a PRNG key, MUST differ every step): stochastically round
    the TEACHER storage cast — required for a bf16-stored EMA teacher,
    whose ``(1-m)·Δ`` increments are below bf16 resolution (see
    :func:`stochastic_round`). ``sr_moments=True`` extends SR to the
    bf16 moment casts too; off by default — RNE-bf16 moments are
    loss-trajectory-validated (docs/PERF.md) and each extra SR target
    costs a full hardware-PRNG pass over the state (measured +2 ms/step
    on the flagship when all three casts draw noise).
    """
    count = state.count + 1
    f32 = jnp.float32
    c1 = 1 - b1 ** count.astype(f32)
    c2 = 1 - b2 ** count.astype(f32)
    ones = jax.tree_util.tree_map(lambda p: 1.0, params)
    wd_t = wd_scale_tree if wd_scale_tree is not None else ones
    gate_t = gate_tree if gate_tree is not None else jax.tree_util.tree_map(
        lambda p: 0.0, params
    )
    def upd(g, m, v, p, t, wscale, gate, ks):
        g = g.astype(f32)
        if gate == 2.0:      # static: hard-frozen leaf (weight-norm g)
            g = jnp.zeros_like(g)
        elif gate == 1.0:    # runtime-gated leaf (last-layer freeze epochs)
            g = g * gate_scalar
        if clip:
            n = jnp.linalg.norm(g)
            g = g * jnp.minimum(clip / (n + 1e-6), 1.0)
        m_new = b1 * m.astype(f32) + (1 - b1) * g
        v_new = b2 * v.astype(f32) + (1 - b2) * jnp.square(g)
        step = m_new / c1 / (jnp.sqrt(v_new / c2) + eps) + (wd * wscale) * p.astype(f32)
        p_new = (p.astype(f32) - lr * step).astype(p.dtype)
        t_new = momentum * t.astype(f32) + (1.0 - momentum) * p_new.astype(f32)
        if ks is None:
            return (p_new, m_new.astype(m.dtype), v_new.astype(v.dtype),
                    t_new.astype(t.dtype))
        if sr_moments:
            return (p_new, _sr_cast(m_new, ks[0], m),
                    _sr_cast(v_new, ks[1], v), _sr_cast(t_new, ks[2], t))
        return (p_new, m_new.astype(m.dtype), v_new.astype(v.dtype),
                _sr_cast(t_new, ks[2], t))

    treedef = jax.tree_util.tree_structure(params)
    flat = lambda tree: treedef.flatten_up_to(tree)
    n_leaves = treedef.num_leaves
    if sr_rng is not None:
        ks = jax.random.split(sr_rng, 3 * n_leaves)
        key_leaves = [tuple(ks[3 * i:3 * i + 3]) for i in range(n_leaves)]
    else:
        key_leaves = [None] * n_leaves
    out = [
        upd(*leaves)
        for leaves in zip(
            flat(grads), flat(state.mu), flat(state.nu), flat(params),
            flat(teacher), flat(wd_t), flat(gate_t), key_leaves,
        )
    ]
    unflat = lambda i: jax.tree_util.tree_unflatten(treedef, [o[i] for o in out])
    return unflat(0), AdamWState(count, unflat(1), unflat(2)), unflat(3)


def zero1_fused_adamw_ema_update(
    grad_means,
    state: AdamWState,
    params,
    teacher,
    lr,
    wd,
    momentum,
    n_shards: int,
    axis_name: str = "data",
    wd_scale_tree=None,
    gate_tree=None,
    gate_scalar=None,
    clip: float = 0.0,
    grad_scale: float = 1.0,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    sr_rng=None,
    sr_moments: bool = False,
):
    """ZeRO-1 version of :func:`fused_adamw_ema_update` for the SSL tail:
    per leaf, ``psum_scatter`` the local grads over ``axis_name`` (each
    shard receives only its chunk of the cross-shard mean), gate + clip +
    fp32 AdamW on this shard's 1/n chunk of the flattened padded student
    state, ``all_gather`` the updated parameter chunks, and chain the EMA
    teacher update off the gathered full leaf. Moment storage and
    elementwise optimizer math drop to 1/n per chip; the replicated
    teacher EMA pass is unchanged.

    The per-leaf grad clip needs the FULL-leaf norm of the mean gradient,
    which no shard holds — it is assembled as ONE stacked scalar ``psum``
    of the per-chunk squared sums (n_leaves scalars; negligible next to
    the scattered grads). Gate/clip/update semantics and SR-cast noise
    derivation match the replicated fused tail exactly; the teacher SR
    keys are per-leaf and identical on every shard, which keeps the
    replicated teacher bit-identical across the mesh.

    ``grad_means`` are the LOCAL per-shard mean grads (no pmean applied);
    ``grad_scale`` folds the cross-shard mean into the scatter (pass
    ``1/n_shards``). ``state`` moments are the LOCAL (c,) chunk views of
    :func:`zero1_init` arrays sharded over ``axis_name``.
    """
    count = state.count + 1
    f32 = jnp.float32
    c1 = 1 - b1 ** count.astype(f32)
    c2 = 1 - b2 ** count.astype(f32)
    ones = jax.tree_util.tree_map(lambda p: 1.0, params)
    wd_t = wd_scale_tree if wd_scale_tree is not None else ones
    gate_t = gate_tree if gate_tree is not None else jax.tree_util.tree_map(
        lambda p: 0.0, params
    )
    idx = jax.lax.axis_index(axis_name)

    treedef = jax.tree_util.tree_structure(params)
    flat = lambda tree: treedef.flatten_up_to(tree)
    n_leaves = treedef.num_leaves
    if sr_rng is not None:
        ks = jax.random.split(sr_rng, 3 * n_leaves)
        key_leaves = [tuple(ks[3 * i:3 * i + 3]) for i in range(n_leaves)]
    else:
        key_leaves = [None] * n_leaves

    g_l, m_l, v_l, p_l, t_l = (
        flat(grad_means), flat(state.mu), flat(state.nu), flat(params),
        flat(teacher),
    )
    wd_l, gate_l = flat(wd_t), flat(gate_t)

    # pass 1: scatter grads to mean chunks, apply the static gates
    gls = []
    for g, m, gate in zip(g_l, m_l, gate_l):
        c = m.shape[0]
        gf = jnp.pad(g.reshape(-1).astype(f32), (0, n_shards * c - g.size))
        gl = jax.lax.psum_scatter(
            gf, axis_name, scatter_dimension=0, tiled=True
        ) * grad_scale
        if gate == 2.0:      # static: hard-frozen leaf (weight-norm g)
            gl = jnp.zeros_like(gl)
        elif gate == 1.0:    # runtime-gated leaf (last-layer freeze epochs)
            gl = gl * gate_scalar
        gls.append(gl)
    if clip:
        sq = jax.lax.psum(
            jnp.stack([jnp.sum(jnp.square(gl)) for gl in gls]), axis_name
        )
        coefs = jnp.minimum(clip / (jnp.sqrt(sq) + 1e-6), 1.0)

    # pass 2: AdamW on the local chunk, gather params, chain the EMA
    out = []
    for i, (m, v, p, t, wscale, kset) in enumerate(
        zip(m_l, v_l, p_l, t_l, wd_l, key_leaves)
    ):
        gl = gls[i] * (coefs[i] if clip else 1.0)
        c = m.shape[0]
        pad = n_shards * c - p.size
        pf = jnp.pad(p.reshape(-1).astype(f32), (0, pad))
        pl = jax.lax.dynamic_slice(pf, (idx * c,), (c,))
        m_new = b1 * m.astype(f32) + (1 - b1) * gl
        v_new = b2 * v.astype(f32) + (1 - b2) * jnp.square(gl)
        step = (m_new / c1) / (jnp.sqrt(v_new / c2) + eps) + (wd * wscale) * pl
        full = jax.lax.all_gather(
            pl - lr * step, axis_name, axis=0, tiled=True
        )
        p_new = full[:p.size].reshape(p.shape).astype(p.dtype)
        t_new = momentum * t.astype(f32) + (1.0 - momentum) * p_new.astype(f32)
        if kset is None:
            out.append((p_new, m_new.astype(m.dtype), v_new.astype(v.dtype),
                        t_new.astype(t.dtype)))
        elif sr_moments:
            out.append((p_new, _sr_cast(m_new, kset[0], m),
                        _sr_cast(v_new, kset[1], v), _sr_cast(t_new, kset[2], t)))
        else:
            out.append((p_new, m_new.astype(m.dtype), v_new.astype(v.dtype),
                        _sr_cast(t_new, kset[2], t)))
    unflat = lambda i: jax.tree_util.tree_unflatten(treedef, [o[i] for o in out])
    return unflat(0), AdamWState(count, unflat(1), unflat(2)), unflat(3)


def ema_update(teacher_params, student_params, momentum, sr_rng=None):
    """EMA teacher update (``lafs_train.py:610-613``) — pure tree_map, stays
    local/replicated (no comm). With ``sr_rng`` (required for bf16-stored
    teachers) the storage cast is stochastically rounded; math is fp32."""
    if sr_rng is None:
        return jax.tree_util.tree_map(
            lambda t, s: momentum * t + (1.0 - momentum) * s,
            teacher_params,
            student_params,
        )
    treedef = jax.tree_util.tree_structure(teacher_params)
    keys = jax.tree_util.tree_unflatten(
        treedef, list(jax.random.split(sr_rng, treedef.num_leaves))
    )
    return jax.tree_util.tree_map(
        lambda t, s, k: _sr_cast(
            momentum * t.astype(jnp.float32) + (1.0 - momentum) * s.astype(jnp.float32),
            k, t,
        ),
        teacher_params, student_params, keys,
    )
