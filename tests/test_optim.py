"""Optimizer semantics tests (AdamW vs torch oracle, clipping, EMA, lrd)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from lafs_cvpr2024_tpu.train.optim import (
    adamw_init,
    adamw_update,
    clip_grads_global,
    clip_grads_per_param,
    dino_wd_mask,
    ema_update,
    lars_init,
    lars_update,
    param_groups_lrd,
    zero_grads_by_path,
)


def test_adamw_matches_torch():
    rng = np.random.default_rng(0)
    p0 = rng.standard_normal((5, 3)).astype(np.float32)
    params = {"w": jnp.asarray(p0)}
    state = adamw_init(params)

    tp = torch.nn.Parameter(torch.from_numpy(p0.copy()))
    opt = torch.optim.AdamW([tp], lr=1e-2, weight_decay=0.3)

    for i in range(5):
        g = rng.standard_normal((5, 3)).astype(np.float32)
        tp.grad = torch.from_numpy(g.copy())
        opt.step()
        params, state = adamw_update(
            {"w": jnp.asarray(g)}, state, params, lr=1e-2, wd=0.3
        )
    np.testing.assert_allclose(
        np.asarray(params["w"]), tp.detach().numpy(), rtol=2e-4, atol=1e-6
    )


def test_adamw_torch_decoupled_wd_convention():
    # torch AdamW: p *= (1 - lr*wd) BEFORE the adam step. Verify ours tracks
    # torch over many steps with zero grads: ours p -= lr*wd*p each step too.
    p0 = np.ones((2,), np.float32)
    params = {"w": jnp.asarray(p0)}
    state = adamw_init(params)
    tp = torch.nn.Parameter(torch.from_numpy(p0.copy()))
    opt = torch.optim.AdamW([tp], lr=0.1, weight_decay=0.5)
    for _ in range(3):
        tp.grad = torch.zeros(2)
        opt.step()
        params, state = adamw_update(
            {"w": jnp.zeros(2)}, state, params, lr=0.1, wd=0.5
        )
    np.testing.assert_allclose(np.asarray(params["w"]), tp.detach().numpy(), rtol=1e-3)


def test_clip_per_param():
    g = {"a": jnp.ones(16) * 10.0, "b": jnp.ones(4) * 0.1}
    c = clip_grads_per_param(g, 3.0)
    np.testing.assert_allclose(float(jnp.linalg.norm(c["a"])), 3.0, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(c["b"]), 0.1, rtol=1e-5)


def test_clip_global():
    g = {"a": jnp.ones(9) * 4.0}  # norm 12
    c = clip_grads_global(g, 6.0)
    np.testing.assert_allclose(float(jnp.linalg.norm(c["a"])), 6.0, rtol=1e-4)


def test_zero_grads_by_path():
    g = {"head": {"last_layer_v": jnp.ones(3)}, "body": {"w": jnp.ones(3)}}
    z = zero_grads_by_path(g, lambda n: "last_layer" in n)
    assert float(z["head"]["last_layer_v"].sum()) == 0.0
    assert float(z["body"]["w"].sum()) == 3.0


def test_dino_wd_mask():
    params = {"w": jnp.ones((3, 3)), "bias": jnp.ones(3), "scale": jnp.ones(3)}
    mask = dino_wd_mask(params)
    assert mask["w"] == 1.0 and mask["bias"] == 0.0 and mask["scale"] == 0.0


def test_param_groups_lrd():
    params = {
        "cls_token": jnp.ones((1, 1, 8)),
        "transformer": {
            "layers_0": {"attn": {"to_qkv": {"kernel": jnp.ones((8, 8))}}},
            "layers_11": {"attn": {"to_qkv": {"kernel": jnp.ones((8, 8))}}},
        },
        "landmark": {"stn": {"stem": {"conv": {"kernel": jnp.ones((3, 3, 3, 8))}}}},
        "mlp_head": {"scale": jnp.ones(8)},
        "loss": {"weight": jnp.ones((10, 8))},
    }
    lr_tree, wd_tree = param_groups_lrd(params, depth=12, weight_decay=0.1, layer_decay=0.58)
    # cls_token: layer 0 → 0.58^13 ; last transformer layer: id 12 → 0.58^1
    np.testing.assert_allclose(lr_tree["cls_token"], 0.58 ** 13, rtol=1e-6)
    np.testing.assert_allclose(
        lr_tree["transformer"]["layers_11"]["attn"]["to_qkv"]["kernel"], 0.58, rtol=1e-6
    )
    assert lr_tree["loss"]["weight"] == 1.0  # head: id = num_layers → scale 0.58^0
    assert wd_tree["landmark"]["stn"]["stem"]["conv"]["kernel"] == 0.05
    assert wd_tree["mlp_head"]["scale"] == 0.0
    assert wd_tree["loss"]["weight"] == 0.1


def test_ema():
    t = {"w": jnp.zeros(3)}
    s = {"w": jnp.ones(3)}
    out = ema_update(t, s, 0.9)
    np.testing.assert_allclose(np.asarray(out["w"]), 0.1, rtol=1e-6)


def test_sgd_matches_torch():
    """sgd_update vs torch.optim.SGD(momentum=0.9) — the reference's
    --optimizer sgd branch (lafs_train.py:401-402), incl. L2-into-grad
    weight decay and the lazily-created first-step momentum buffer."""
    from lafs_cvpr2024_tpu.train.optim import sgd_init, sgd_update

    rng = np.random.default_rng(4)
    p0 = rng.standard_normal((5, 3)).astype(np.float32)
    params = {"w": jnp.asarray(p0)}
    state = sgd_init(params)

    tp = torch.nn.Parameter(torch.from_numpy(p0.copy()))
    opt = torch.optim.SGD([tp], lr=1e-2, momentum=0.9, weight_decay=0.3)

    for i in range(5):
        g = rng.standard_normal((5, 3)).astype(np.float32)
        tp.grad = torch.from_numpy(g.copy())
        opt.step()
        params, state = sgd_update(
            {"w": jnp.asarray(g)}, state, params, lr=1e-2, wd=0.3
        )
    np.testing.assert_allclose(
        np.asarray(params["w"]), tp.detach().numpy(), rtol=2e-4, atol=1e-6
    )


def test_sgd_wd_mask():
    """wd_scale_tree=0 leaves get NO weight decay (DINO get_params_groups
    semantics for bias/1-D params)."""
    from lafs_cvpr2024_tpu.train.optim import sgd_init, sgd_update

    params = {"w": jnp.ones((2, 2)), "b": jnp.ones(2)}
    state = sgd_init(params)
    zeros = {"w": jnp.zeros((2, 2)), "b": jnp.zeros(2)}
    new_params, _ = sgd_update(
        zeros, state, params, lr=0.1, wd=1.0,
        wd_scale_tree={"w": 1.0, "b": 0.0},
    )
    assert not np.allclose(np.asarray(new_params["w"]), 1.0)  # decayed
    np.testing.assert_allclose(np.asarray(new_params["b"]), 1.0)  # masked


def test_lars_runs():
    params = {"w": jnp.ones((4, 4)), "b": jnp.ones(4)}
    state = lars_init(params)
    grads = {"w": jnp.ones((4, 4)) * 0.1, "b": jnp.ones(4) * 0.1}
    new_params, state = lars_update(grads, state, params, lr=0.1, wd=1e-4)
    assert np.asarray(new_params["w"]).std() >= 0
    assert not np.allclose(np.asarray(new_params["w"]), np.asarray(params["w"]))


def test_adamw_bf16_moments_tracks_fp32():
    """bf16-STORED moments (fp32 math) stay close to the fp32 trajectory —
    the perf knob must not change optimizer semantics beyond storage
    rounding."""
    rng = np.random.default_rng(1)
    p0 = rng.standard_normal((8, 4)).astype(np.float32)
    params32 = {"w": jnp.asarray(p0)}
    params16 = {"w": jnp.asarray(p0)}
    s32 = adamw_init(params32)
    s16 = adamw_init(params16, moment_dtype=jnp.bfloat16)
    assert s16.mu["w"].dtype == jnp.bfloat16
    assert s16.nu["w"].dtype == jnp.bfloat16

    for i in range(20):
        g = jnp.asarray(rng.standard_normal((8, 4)).astype(np.float32))
        params32, s32 = adamw_update({"w": g}, s32, params32, lr=1e-2, wd=0.1)
        params16, s16 = adamw_update({"w": g}, s16, params16, lr=1e-2, wd=0.1)
    assert s16.mu["w"].dtype == jnp.bfloat16  # storage dtype preserved
    assert params16["w"].dtype == jnp.float32  # params stay full precision
    # bf16 has ~3 decimal digits; after 20 steps of lr=1e-2 drift stays small
    np.testing.assert_allclose(
        np.asarray(params16["w"]), np.asarray(params32["w"]), atol=2e-3
    )


def test_fused_tail_matches_composed_pipeline():
    """fused_adamw_ema_update == clip + freeze-gate + weight-norm-zero +
    adamw_update + ema_update composed, bit-for-bit semantics (ADVICE-level
    guarantee for the single-traversal SSL tail)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lafs_cvpr2024_tpu.train.optim import (
        AdamWState,
        adamw_init,
        adamw_update,
        clip_grads_per_param,
        ema_update,
        fused_adamw_ema_update,
        zero_grads_by_path,
    )

    rng = np.random.default_rng(0)
    mk = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32))
    params = {
        "backbone": {"w": mk(16, 16), "b": mk(16)},
        "head": {"last_layer": {"kernel": mk(16, 8)},
                 "last_layer_g": mk(8)},
    }
    teacher = jax.tree_util.tree_map(lambda p: p + 0.5, params)
    grads = jax.tree_util.tree_map(lambda p: p * 0.3 + 0.1, params)
    opt = adamw_init(params, moment_dtype=jnp.bfloat16)
    # take one step first so moments are non-trivial
    warm, opt = adamw_update(grads, opt, params, 1e-3)
    lr, wd, mom, freeze = 3e-3, 0.04, 0.97, 0.0
    wd_mask = jax.tree_util.tree_map(lambda p: 1.0 if p.ndim > 1 else 0.0, params)

    # composed reference path
    g = clip_grads_per_param(grads, 1.0)
    g = jax.tree_util.tree_map_with_path(
        lambda path, x: x * freeze
        if "last_layer" in "/".join(str(getattr(k, "key", k)) for k in path)
        else x,
        g,
    )
    g = zero_grads_by_path(g, lambda n: n.endswith("last_layer_g"))
    ref_p, ref_opt = adamw_update(g, opt, warm, lr, wd_scale_tree=wd_mask, wd=wd)
    ref_t = ema_update(teacher, ref_p, mom)

    def gate(path, p):
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        if name.endswith("last_layer_g"):
            return 2.0
        if "last_layer" in name:
            return 1.0
        return 0.0

    gate_tree = jax.tree_util.tree_map_with_path(gate, params)
    fus_p, fus_opt, fus_t = fused_adamw_ema_update(
        grads, opt, warm, teacher, lr, wd, mom,
        wd_scale_tree=wd_mask, gate_tree=gate_tree,
        gate_scalar=jnp.float32(freeze), clip=1.0,
    )
    for ref, fus in [(ref_p, fus_p), (ref_t, fus_t),
                     (ref_opt.mu, fus_opt.mu), (ref_opt.nu, fus_opt.nu)]:
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                atol=1e-6,
            ),
            ref, fus,
        )
    assert int(fus_opt.count) == int(ref_opt.count) == 2


def test_stochastic_round_unbiased_and_exact():
    """SR mean equals the fp32 value; exactly-representable values pass
    through deterministically; non-finites are preserved."""
    from lafs_cvpr2024_tpu.train.optim import stochastic_round

    # 1.0 + 1/4 ulp(bf16 at 1.0 = 2^-7): should round up ~25% of the time
    x = jnp.full((20000,), 1.0 + (2.0 ** -7) * 0.25, jnp.float32)
    out = stochastic_round(x, jax.random.PRNGKey(0))
    vals = np.asarray(out, np.float32)
    assert set(np.unique(vals)) == {1.0, np.float32(1.0 + 2.0 ** -7)}
    frac_up = (vals > 1.0).mean()
    assert 0.22 < frac_up < 0.28, frac_up
    # unbiasedness: mean of SR output ≈ x to ~1% of an ulp
    np.testing.assert_allclose(vals.mean(), float(x[0]), rtol=0, atol=2e-5)

    exact = jnp.asarray([0.0, 1.0, -2.5, 3.140625], jnp.float32)  # bf16-exact
    out = stochastic_round(jnp.tile(exact, 100), jax.random.PRNGKey(1))
    np.testing.assert_array_equal(
        np.asarray(out, np.float32), np.asarray(jnp.tile(exact, 100), np.float32)
    )

    nf = jnp.asarray([np.inf, -np.inf, np.nan], jnp.float32)
    out = np.asarray(stochastic_round(nf, jax.random.PRNGKey(2)), np.float32)
    assert np.isposinf(out[0]) and np.isneginf(out[1]) and np.isnan(out[2])


def test_bf16_ema_sr_tracks_while_rne_stalls():
    """The motivating failure: a bf16 EMA with m=0.996 toward a target ~1 ulp
    away NEVER moves under round-to-nearest (increment below resolution), but
    integrates correctly in expectation under stochastic rounding."""
    m = 0.996
    target = jnp.full((4096,), 1.0 + 6 * 2.0 ** -7, jnp.float32)  # 6 ulp away
    t_sr = {"w": jnp.ones((4096,), jnp.bfloat16)}
    t_rne = jnp.ones((4096,), jnp.bfloat16)
    for s in range(600):
        t_sr = ema_update(
            t_sr, {"w": target}, m, sr_rng=jax.random.PRNGKey(s)
        )
        t_rne = (m * t_rne.astype(jnp.float32)
                 + (1 - m) * target).astype(jnp.bfloat16)
    # fp32 reference after 600 steps: 1 + 6u(1 - m^600) ≈ 1 + 5.46u
    ref = 1.0 + 6 * 2.0 ** -7 * (1 - m ** 600)
    sr_mean = float(np.asarray(t_sr["w"], np.float32).mean())
    assert abs(sr_mean - ref) < 0.5 * 2.0 ** -7, (sr_mean, ref)
    assert float(np.asarray(t_rne, np.float32).mean()) == 1.0  # frozen


def test_fused_tail_sr_bf16_teacher():
    """fused_adamw_ema_update with sr_rng: bf16 teacher/moments stay in their
    storage dtypes, results match the fp32 composed path to bf16 resolution,
    and the same sr_rng reproduces bit-identical output (shard replication)."""
    from lafs_cvpr2024_tpu.train.optim import fused_adamw_ema_update

    rng = np.random.default_rng(3)
    mk = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32))
    params = {"w": mk(32, 32), "b": mk(32)}
    teacher = jax.tree_util.tree_map(
        lambda p: (p + 0.1).astype(jnp.bfloat16), params
    )
    grads = jax.tree_util.tree_map(lambda p: p * 0.2, params)
    opt = adamw_init(params, moment_dtype=jnp.bfloat16)

    key = jax.random.PRNGKey(7)
    p1, o1, t1 = fused_adamw_ema_update(
        grads, opt, params, teacher, 1e-3, 0.01, 0.99, sr_rng=key
    )
    p2, o2, t2 = fused_adamw_ema_update(
        grads, opt, params, teacher, 1e-3, 0.01, 0.99, sr_rng=key
    )
    assert t1["w"].dtype == jnp.bfloat16 and o1.mu["w"].dtype == jnp.bfloat16
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        (p1, o1.mu, o1.nu, t1), (p2, o2.mu, o2.nu, t2),
    )
    # against the fp32 composed path, within 1 bf16 ulp of the magnitudes
    t32 = jax.tree_util.tree_map(lambda p: p + 0.1, params)
    opt32 = adamw_init(params)
    p_ref, o_ref = adamw_update(grads, opt32, params, 1e-3, wd=0.01)
    t_ref = ema_update(t32, p_ref, 0.99)
    np.testing.assert_allclose(np.asarray(p1["w"]), np.asarray(p_ref["w"]),
                               atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(t1["w"], np.float32), np.asarray(t_ref["w"]), atol=0.04
    )  # |teacher| reaches ~3 ⇒ bf16 ulp 0.023; SR adds ≤1 ulp on top
    # default: moments keep the deterministic RNE cast (SR only costs a
    # PRNG pass where it is REQUIRED — the teacher); sr_moments=True flips
    # them to SR (same key ⇒ still deterministic, values may differ by 1 ulp)
    _, o_det, _ = fused_adamw_ema_update(
        grads, opt, params, teacher, 1e-3, 0.01, 0.99
    )
    np.testing.assert_array_equal(np.asarray(o1.mu["w"]), np.asarray(o_det.mu["w"]))
    _, o_sr, _ = fused_adamw_ema_update(
        grads, opt, params, teacher, 1e-3, 0.01, 0.99, sr_rng=key,
        sr_moments=True,
    )
    assert o_sr.nu["w"].dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(o_sr.mu["w"], np.float32), np.asarray(o1.mu["w"], np.float32),
        atol=0.02,
    )
