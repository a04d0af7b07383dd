"""SSL (DINO) train-step smoke tests: loss finite, EMA moves teacher,
center updates, last-layer freeze respected."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from lafs_cvpr2024_tpu.models.partfvit import PartFViTConfig
from lafs_cvpr2024_tpu.train.ssl import (
    SSLConfig,
    assemble_crop_batches,
    create_landmark_provider,
    create_ssl_state,
    make_ssl_train_step,
)

import pytest

TINY = SSLConfig(
    model=PartFViTConfig(
        dim=32, depth=1, heads=2, dim_head=16, mlp_dim=64,
        num_patches=36, with_land=False, loss_type="None", num_classes=0, image_size=48,
        stn_mode="small",
    ),
    out_dim=64,
    head_hidden_dim=32,
    head_bottleneck_dim=16,
    local_crops_number=2,
    compute_dtype=jnp.float32,
)


def _batches(b=4):
    rng = np.random.default_rng(0)
    shape = (b, 48, 48, 3)
    crops = [rng.uniform(-1, 1, shape).astype(np.float32) for _ in range(4 + 2 * TINY.local_crops_number)]
    return assemble_crop_batches(crops)


@pytest.fixture(scope="module")
def setup():
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(4, 1), ("data", "model"))
    state = jax.jit(lambda r: create_ssl_state(TINY, r))(jax.random.PRNGKey(0))
    land = create_landmark_provider(TINY, jax.random.PRNGKey(1))
    step = make_ssl_train_step(TINY, mesh)
    return state, land, step


def test_ssl_step_runs(setup):
    state, land, step = setup
    gc, ga, lc, la = (jnp.asarray(x) for x in _batches())

    teacher_before = state.teacher["backbone"]["patch_to_embedding"]["kernel"]
    args = dict(lr=jnp.float32(1e-3), wd=jnp.float32(0.04),
                momentum=jnp.float32(0.99), teacher_temp=jnp.float32(0.04),
                freeze_last=jnp.float32(0.0))
    state, metrics = step(state, land, gc, ga, lc, la, **args)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1
    # center moved away from zero
    assert float(jnp.abs(state.center).sum()) > 0
    # teacher EMA moved
    teacher_after = state.teacher["backbone"]["patch_to_embedding"]["kernel"]
    assert not np.allclose(np.asarray(teacher_before), np.asarray(teacher_after))


def test_ssl_freeze_last_layer(setup):
    state, land, step = setup
    gc, ga, lc, la = (jnp.asarray(x) for x in _batches())

    v_before = np.asarray(state.student["head"]["last_layer_v"])
    state2, _ = step(state, land, gc, ga, lc, la,
                     lr=jnp.float32(1e-3), wd=jnp.float32(0.0),
                     momentum=jnp.float32(0.99), teacher_temp=jnp.float32(0.04),
                     freeze_last=jnp.float32(0.0))
    np.testing.assert_allclose(
        np.asarray(state2.student["head"]["last_layer_v"]), v_before
    )
    state3, _ = step(state, land, gc, ga, lc, la,
                     lr=jnp.float32(1e-3), wd=jnp.float32(0.0),
                     momentum=jnp.float32(0.99), teacher_temp=jnp.float32(0.04),
                     freeze_last=jnp.float32(1.0))
    assert not np.allclose(
        np.asarray(state3.student["head"]["last_layer_v"]), v_before
    )
    # weight-norm gain frozen in both cases (norm_last_layer=True)
    np.testing.assert_allclose(
        np.asarray(state3.student["head"]["last_layer_g"]),
        np.asarray(state.student["head"]["last_layer_g"]),
    )


def test_ssl_loss_decreases_on_fixed_batch(setup):
    state, land, step = setup
    gc, ga, lc, la = (jnp.asarray(x) for x in _batches())
    losses = []
    for _ in range(5):
        state, m = step(state, land, gc, ga, lc, la,
                        lr=jnp.float32(5e-4), wd=jnp.float32(0.0),
                        momentum=jnp.float32(0.996), teacher_temp=jnp.float32(0.04),
                        freeze_last=jnp.float32(1.0))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_ssl_fused_device_aug_step():
    """fused_device_aug: raw uint8 batch in, full aug+train in one program."""
    cfg = SSLConfig(
        model=TINY.model, out_dim=64, head_hidden_dim=32, head_bottleneck_dim=16,
        local_crops_number=2, compute_dtype=jnp.float32, fused_device_aug=True,
    )
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(4, 1), ("data", "model"))
    state = jax.jit(lambda r: create_ssl_state(cfg, r))(jax.random.PRNGKey(0))
    land = create_landmark_provider(cfg, jax.random.PRNGKey(1))
    step = make_ssl_train_step(cfg, mesh)
    raw = jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (4, 48, 48, 3)).astype(np.uint8)
    )
    dummy = jnp.zeros((1,), jnp.float32)
    args = dict(lr=jnp.float32(1e-3), wd=jnp.float32(0.0),
                momentum=jnp.float32(0.99), teacher_temp=jnp.float32(0.04),
                freeze_last=jnp.float32(1.0))
    state, m = step(state, land, raw, dummy, dummy, dummy, **args)
    assert np.isfinite(float(m["loss"]))
    assert int(state.step) == 1


def test_ssl_step_fused_mlp_interpret():
    """Full SSL step with the pallas fused MLP active (interpret mode on the
    CPU mesh; dims %128 so the fused branch actually runs). Loss finite, a
    second step moves it, moments stored bf16."""
    cfg = SSLConfig(
        model=PartFViTConfig(
            dim=128, depth=1, heads=2, dim_head=16, mlp_dim=256,
            num_patches=16, patch_size=8, with_land=False, loss_type="None",
            num_classes=0, image_size=48, stn_mode="small",
            mlp_impl="fused",
        ),
        out_dim=32, head_hidden_dim=32, head_bottleneck_dim=16,
        local_crops_number=2, local_keep_landmarks=8,
        compute_dtype=jnp.float32,
        moment_dtype=jnp.bfloat16,
    )
    mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1), ("data", "model"))
    state = jax.jit(lambda r: create_ssl_state(cfg, r))(jax.random.PRNGKey(0))
    assert jax.tree_util.tree_leaves(state.opt_state.mu)[0].dtype == jnp.bfloat16
    land = create_landmark_provider(cfg, jax.random.PRNGKey(1))
    step = make_ssl_train_step(cfg, mesh)
    rng = np.random.default_rng(0)
    shape = (2, 48, 48, 3)
    crops = [rng.uniform(-1, 1, shape).astype(np.float32) for _ in range(8)]
    gc, ga, lc, la = (jnp.asarray(x) for x in assemble_crop_batches(crops))
    args = dict(lr=jnp.float32(1e-3), wd=jnp.float32(0.04),
                momentum=jnp.float32(0.99), teacher_temp=jnp.float32(0.04),
                freeze_last=jnp.float32(0.0))
    state, m1 = step(state, land, gc, ga, lc, la, **args)
    state, m2 = step(state, land, gc, ga, lc, la, **args)
    assert np.isfinite(float(m1["loss"])) and np.isfinite(float(m2["loss"]))
    assert float(m1["loss"]) != float(m2["loss"])  # params actually moved


def test_ssl_step_bf16_teacher_sr():
    """teacher_dtype=bf16: the step runs on a sharded mesh (SR noise must be
    shard-replicated or shard_map's vma check rejects the trace), the teacher
    stays stored in bf16, EMA still moves it, and both fused and composed
    tails agree on dtype handling."""
    for fused in (True, False):
        cfg = SSLConfig(
            model=TINY.model, out_dim=64, head_hidden_dim=32,
            head_bottleneck_dim=16, local_crops_number=2,
            compute_dtype=jnp.float32, teacher_dtype=jnp.bfloat16,
            moment_dtype=jnp.bfloat16, fused_tail=fused,
        )
        mesh = Mesh(np.array(jax.devices()[:4]).reshape(4, 1), ("data", "model"))
        state = jax.jit(lambda r: create_ssl_state(cfg, r))(jax.random.PRNGKey(0))
        land = create_landmark_provider(cfg, jax.random.PRNGKey(1))
        step = make_ssl_train_step(cfg, mesh)
        leaf = lambda s: s.teacher["backbone"]["patch_to_embedding"]["kernel"]
        assert leaf(state).dtype == jnp.bfloat16
        before = np.asarray(leaf(state), np.float32)
        gc, ga, lc, la = (jnp.asarray(x) for x in _batches())
        args = dict(lr=jnp.float32(1e-2), wd=jnp.float32(0.04),
                    momentum=jnp.float32(0.9), teacher_temp=jnp.float32(0.04),
                    freeze_last=jnp.float32(0.0))
        for _ in range(2):
            state, metrics = step(state, land, gc, ga, lc, la, **args)
        assert np.isfinite(float(metrics["loss"]))
        assert leaf(state).dtype == jnp.bfloat16
        assert not np.allclose(before, np.asarray(leaf(state), np.float32))


def test_ssl_zero1_matches_replicated_tail():
    """ZeRO-1 SSL tail (moments sharded over the (4,1) data mesh,
    psum_scatter grads + chunked AdamW + all_gather + chained EMA) must
    reproduce the replicated fused tail: same loss, same student/teacher
    params, gathered flat moments equal the dense ones. Covers the per-leaf
    clip (norm via stacked scalar psum), the wd mask, and the last-layer
    gate (freeze_last=0 leaves last_layer_v untouched)."""
    from dataclasses import replace

    mesh = Mesh(np.array(jax.devices()[:4]).reshape(4, 1), ("data", "model"))
    gc, ga, lc, la = (jnp.asarray(x) for x in _batches())
    args = dict(lr=jnp.float32(1e-3), wd=jnp.float32(0.04),
                momentum=jnp.float32(0.99), teacher_temp=jnp.float32(0.04),
                freeze_last=jnp.float32(0.0))
    land = create_landmark_provider(TINY, jax.random.PRNGKey(1))

    out = {}
    for z in (False, True):
        cfg = replace(TINY, zero1=z)
        state = jax.jit(lambda r: create_ssl_state(
            cfg, r, zero1_shards=4 if z else 0
        ))(jax.random.PRNGKey(0))
        step = make_ssl_train_step(cfg, mesh)
        new_state, metrics = step(state, land, gc, ga, lc, la, **args)
        out[z] = (float(metrics["loss"]), new_state)

    np.testing.assert_allclose(out[True][0], out[False][0], rtol=1e-6)
    dense, zero1 = out[False][1], out[True][1]
    for tree in ("student", "teacher"):
        for pd, pz in zip(jax.tree_util.tree_leaves(getattr(dense, tree)),
                          jax.tree_util.tree_leaves(getattr(zero1, tree))):
            np.testing.assert_allclose(np.asarray(pz), np.asarray(pd),
                                       rtol=2e-5, atol=1e-7)
    for md, mz in zip(jax.tree_util.tree_leaves(dense.opt_state.nu),
                      jax.tree_util.tree_leaves(zero1.opt_state.nu)):
        flat = np.asarray(mz)
        np.testing.assert_allclose(flat[:md.size],
                                   np.asarray(md).reshape(-1),
                                   rtol=2e-5, atol=1e-10)
        assert not flat[md.size:].any()
    # the weight-norm gain stays hard-frozen, last_layer_v gated off
    np.testing.assert_array_equal(
        np.asarray(zero1.student["head"]["last_layer_g"]),
        np.asarray(dense.student["head"]["last_layer_g"]))


def test_vma_autopsum_trap():
    """Documents the JAX shard_map behavior every trainer here must guard
    against: with check_vma=True, autodiff of a VARYING local loss wrt
    INVARIANT (replicated) params auto-psums the gradient, so a subsequent
    pmean is a no-op on the already-replicated value — the step would
    train on the grad SUM (n_data× the DDP mean the reference uses). All
    trainer shard_maps therefore run check_vma=False + explicit pmean.
    If this test starts failing, JAX changed the semantics — re-audit
    ssl.py / simmim.py / supervised.py check_vma settings."""
    from jax.sharding import PartitionSpec as P

    mesh = Mesh(np.array(jax.devices()[:4]).reshape(4, 1), ("data", "model"))
    params = jnp.ones((3,))
    x = jnp.arange(12, dtype=jnp.float32).reshape(4, 3)

    def mk(check):
        def f(params, xs):
            g = jax.grad(lambda p: jnp.sum(p * xs[0]))(params)  # local = xs[0]
            return jax.lax.pmean(g, "data")[None]
        return jax.jit(jax.shard_map(
            f, mesh=mesh, in_specs=(P(), P("data")),
            out_specs=P("data"), check_vma=check))

    mean = np.asarray(x).mean(0)
    got_false = np.asarray(mk(False)(params, x))[0]
    np.testing.assert_allclose(got_false, mean, rtol=1e-6)  # true DDP mean
    got_true = np.asarray(mk(True)(params, x))[0]
    np.testing.assert_allclose(got_true, np.asarray(x).sum(0), rtol=1e-6)


# ---------------------------------------------------------------------------
# vanilla (pixel-crop) SSL archs — reference --arch, lafs_train.py:34-37
# ---------------------------------------------------------------------------

def _vanilla_cfg(arch):
    return SSLConfig(
        model=PartFViTConfig(
            dim=32, depth=1, heads=2, dim_head=16, mlp_dim=64,
            num_patches=36, with_land=False, loss_type="None", num_classes=0,
            image_size=48, stn_mode="small", patch_size=8,
            dropout=0.0, emb_dropout=0.0, drop_path_rate=0.0,
            bn_axis_name="data" if arch in ("overlap", "mobile_dino") else None,
        ),
        arch=arch, local_crop_size=24, out_dim=64, head_hidden_dim=32,
        head_bottleneck_dim=16, local_crops_number=2,
        compute_dtype=jnp.float32,
    )


def _vanilla_batches(cfg, b=4):
    rng = np.random.default_rng(0)
    gc = rng.uniform(-1, 1, (2, b, 48, 48, 3)).astype(np.float32)
    lc = rng.uniform(
        -1, 1, (cfg.local_crops_number, b, cfg.local_crop_size,
                cfg.local_crop_size, 3)
    ).astype(np.float32)
    dummy = np.zeros((1,), np.float32)
    return jnp.asarray(gc), jnp.asarray(dummy), jnp.asarray(lc), jnp.asarray(dummy)


@pytest.mark.parametrize("arch", ["vit_tiny", "overlap", "mobile_dino"])
def test_vanilla_arch_step(arch):
    """One multi-device train step per vanilla arch: loss finite, teacher
    EMA moves, BN stats (where present) update and stay replicated."""
    cfg = _vanilla_cfg(arch)
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(4, 1), ("data", "model"))
    state = jax.jit(lambda r: create_ssl_state(cfg, r))(jax.random.PRNGKey(0))
    step = make_ssl_train_step(cfg, mesh)
    gc, ga, lc, la = _vanilla_batches(cfg)
    t_before = jax.tree_util.tree_leaves(state.teacher["backbone"])[0]
    args = dict(lr=jnp.float32(1e-3), wd=jnp.float32(0.04),
                momentum=jnp.float32(0.99), teacher_temp=jnp.float32(0.04),
                freeze_last=jnp.float32(1.0))
    has_bn = arch in ("overlap", "mobile_dino")
    if has_bn:
        assert state.stats, "BN arch must carry running stats"
        s_before = jax.tree_util.tree_leaves(state.stats["student"])
    else:
        assert state.stats == ()
    state, metrics = step(state, {}, gc, ga, lc, la, **args)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1
    t_after = jax.tree_util.tree_leaves(state.teacher["backbone"])[0]
    assert not np.allclose(np.asarray(t_before), np.asarray(t_after))
    if has_bn:
        s_after = jax.tree_util.tree_leaves(state.stats["student"])
        changed = any(
            not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(s_before, s_after)
        )
        assert changed, "student BN stats did not update"
        # teacher stats moved toward the student's (EMA)
        t_stats = jax.tree_util.tree_leaves(state.stats["teacher"])
        assert any(
            not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(s_before, t_stats)
        ) or all(
            np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(s_after, t_stats)
        )


@pytest.mark.parametrize("arch", ["vit_small", "vit_base"])
def test_vanilla_vit_state_shapes(arch):
    """vit_small/base state creation (structure only — eval_shape, no
    compute): head input width matches the arch's fixed embed dim."""
    cfg = _vanilla_cfg(arch)
    shapes = jax.eval_shape(
        lambda r: create_ssl_state(cfg, r), jax.random.PRNGKey(0)
    )
    dim = {"vit_small": 384, "vit_base": 768}[arch]
    assert shapes.student["head"]["mlp_0"]["kernel"].shape[0] == dim
    assert shapes.student["backbone"]["cls_token"].shape[-1] == dim


def test_vanilla_bn_arch_requires_sync_bn():
    cfg = SSLConfig(
        model=PartFViTConfig(
            dim=32, depth=1, heads=2, dim_head=16, mlp_dim=64,
            num_patches=36, with_land=False, loss_type="None", num_classes=0,
            image_size=48, stn_mode="small",
        ),
        arch="mobile_dino", out_dim=64, compute_dtype=jnp.float32,
    )
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(4, 1), ("data", "model"))
    with pytest.raises(ValueError, match="bn_axis_name"):
        make_ssl_train_step(cfg, mesh)

@pytest.mark.parametrize("arch", ["overlap", "vit_tiny"])
def test_vanilla_fused_device_aug_step(arch):
    """fused_device_aug on a VANILLA arch: raw uint8 batch in, the
    DataAugmentationDINO recipe runs inside the step
    (ops.augment_device.vanilla_multicrop_device) — no host transform."""
    from dataclasses import replace

    cfg = replace(_vanilla_cfg(arch), fused_device_aug=True)
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(4, 1), ("data", "model"))
    state = jax.jit(lambda r: create_ssl_state(cfg, r))(jax.random.PRNGKey(0))
    step = make_ssl_train_step(cfg, mesh)
    raw = jnp.asarray(
        np.random.default_rng(0).integers(0, 256, (4, 48, 48, 3), np.uint8)
    )
    dummy = jnp.zeros((1,), jnp.float32)
    args = dict(lr=jnp.float32(1e-3), wd=jnp.float32(0.0),
                momentum=jnp.float32(0.99), teacher_temp=jnp.float32(0.04),
                freeze_last=jnp.float32(1.0))
    state, m = step(state, {}, raw, dummy, dummy, dummy, **args)
    assert np.isfinite(float(m["loss"]))
    assert int(state.step) == 1
    state, m2 = step(state, {}, raw, dummy, dummy, dummy, **args)
    assert np.isfinite(float(m2["loss"])) and int(state.step) == 2


@pytest.mark.parametrize("arch", ["vit_tiny", "partfvit"])
def test_use_bn_in_head_step(arch):
    """--use_bn_in_head (lafs_train.py:53,350): the head's BN stats are
    created, threaded through the student step (batch stats in train,
    running averages for the teacher), synced over the data axis, and the
    teacher's copy EMA-follows the student's — for both the token path
    (partfvit) and a vanilla pixel arch."""
    import dataclasses

    if arch == "partfvit":
        cfg = SSLConfig(
            model=PartFViTConfig(
                dim=32, depth=1, heads=2, dim_head=16, mlp_dim=64,
                num_patches=36, with_land=False, loss_type="None",
                num_classes=0, image_size=48, stn_mode="small", patch_size=8,
                dropout=0.0, emb_dropout=0.0, drop_path_rate=0.0,
                bn_axis_name="data",
            ),
            out_dim=64, head_hidden_dim=32, head_bottleneck_dim=16,
            local_crops_number=2, use_bn_in_head=True,
            compute_dtype=jnp.float32,
        )
    else:
        cfg = dataclasses.replace(
            _vanilla_cfg(arch), use_bn_in_head=True,
            model=PartFViTConfig(
                **{**_vanilla_cfg(arch).model.__dict__,
                   "bn_axis_name": "data"}
            ),
        )
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(4, 1), ("data", "model"))
    state = jax.jit(lambda r: create_ssl_state(cfg, r))(jax.random.PRNGKey(0))
    assert state.stats and "head" in state.stats["student"], \
        "use_bn_in_head must create head running stats"
    step = make_ssl_train_step(cfg, mesh)
    if arch == "partfvit":
        rng = np.random.default_rng(0)
        b = 4
        gc = jnp.asarray(rng.uniform(
            -1, 1, (2, b, 48, 48, 3)).astype(np.float32))
        ga = jnp.asarray(rng.uniform(
            -1, 1, (2, b, 48, 48, 3)).astype(np.float32))
        lc = jnp.asarray(rng.uniform(
            -1, 1, (2, b, 48, 48, 3)).astype(np.float32))
        la = jnp.asarray(rng.uniform(
            -1, 1, (2, b, 48, 48, 3)).astype(np.float32))
        from lafs_cvpr2024_tpu.train.ssl import create_landmark_provider

        land_vars = create_landmark_provider(cfg, jax.random.PRNGKey(7))
    else:
        gc, ga, lc, la = _vanilla_batches(cfg)
        land_vars = {}
    hs_before = jax.tree_util.tree_leaves(state.stats["student"]["head"])
    state, metrics = step(
        state, land_vars, gc, ga, lc, la,
        lr=jnp.float32(1e-3), wd=jnp.float32(0.04),
        momentum=jnp.float32(0.99), teacher_temp=jnp.float32(0.04),
        freeze_last=jnp.float32(1.0),
    )
    assert np.isfinite(float(metrics["loss"]))
    hs_after = jax.tree_util.tree_leaves(state.stats["student"]["head"])
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(hs_before, hs_after)
    ), "head BN stats did not update"
    # teacher head stats = EMA between old and new student stats
    ht = jax.tree_util.tree_leaves(state.stats["teacher"]["head"])
    for old, new, tea in zip(hs_before, hs_after, ht):
        expect = 0.99 * np.asarray(old) + 0.01 * np.asarray(new)
        np.testing.assert_allclose(np.asarray(tea), expect, rtol=1e-5,
                                   atol=1e-6)


def test_glo_diff_step_and_vanilla_refusal():
    """cfg.glo_diff (utils.py:646 → ViT_face.py:474-516): the step runs and
    trains; the vanilla archs refuse the flag loudly (no landmarks there)."""
    from dataclasses import replace

    cfg = replace(TINY, glo_diff=True)
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(4, 1), ("data", "model"))
    state = jax.jit(lambda r: create_ssl_state(cfg, r))(jax.random.PRNGKey(0))
    land = create_landmark_provider(cfg, jax.random.PRNGKey(1))
    step = make_ssl_train_step(cfg, mesh)
    gc, ga, lc, la = (jnp.asarray(x) for x in _batches())
    state, metrics = step(
        state, land, gc, ga, lc, la, jnp.float32(1e-3), jnp.float32(0.04),
        jnp.float32(0.99), jnp.float32(0.04), jnp.float32(0.0),
    )
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1

    with pytest.raises(ValueError, match="glo_diff"):
        make_ssl_train_step(
            replace(cfg, arch="vit_tiny", local_crop_size=24), mesh
        )


def test_random_coor_step_and_refusals():
    """cfg.random_coor (ViT_face.py:1391-1400; the reference hard-codes it
    False in the inner loop, lafs_train.py:535-565): the step runs with
    uniform-random landmark coordinates (no landmark-CNN forward), trains,
    and the flag refuses the vanilla archs and the glo_diff combination."""
    from dataclasses import replace

    cfg = replace(TINY, random_coor=True)
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(4, 1), ("data", "model"))
    state = jax.jit(lambda r: create_ssl_state(cfg, r))(jax.random.PRNGKey(0))
    land = create_landmark_provider(cfg, jax.random.PRNGKey(1))
    step = make_ssl_train_step(cfg, mesh)
    gc, ga, lc, la = (jnp.asarray(x) for x in _batches())
    before = state.student["backbone"]["transformer"]
    state, metrics = step(
        state, land, gc, ga, lc, la, jnp.float32(1e-3), jnp.float32(0.04),
        jnp.float32(0.99), jnp.float32(0.04), jnp.float32(0.0),
    )
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1
    after = state.student["backbone"]["transformer"]
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(before),
                        jax.tree_util.tree_leaves(after))
    ), "student did not train under random_coor"

    with pytest.raises(ValueError, match="random_coor"):
        make_ssl_train_step(
            replace(cfg, arch="vit_tiny", local_crop_size=24), mesh
        )
    with pytest.raises(ValueError, match="mutually exclusive"):
        make_ssl_train_step(replace(cfg, glo_diff=True), mesh)


@pytest.mark.parametrize("opt", ["sgd", "lars"])
def test_ssl_optimizer_choice(opt):
    """--optimizer {sgd,lars} (lafs_train.py:92-93,399-404): the SSL step
    trains through the separate-pass tail with the chosen optimizer —
    student moves, teacher EMA-follows; the fused tail and zero1 refuse
    non-AdamW."""
    from dataclasses import replace

    cfg = replace(TINY, optimizer=opt, fused_tail=False)
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(4, 1), ("data", "model"))
    state = jax.jit(lambda r: create_ssl_state(cfg, r))(jax.random.PRNGKey(0))
    land = create_landmark_provider(cfg, jax.random.PRNGKey(1))
    step = make_ssl_train_step(cfg, mesh)
    gc, ga, lc, la = (jnp.asarray(x) for x in _batches())
    s_before = jax.tree_util.tree_leaves(state.student)
    t_before = [np.asarray(x) for x in jax.tree_util.tree_leaves(state.teacher)]
    state, metrics = step(
        state, land, gc, ga, lc, la, jnp.float32(1e-2), jnp.float32(0.04),
        jnp.float32(0.9), jnp.float32(0.04), jnp.float32(1.0),
    )
    assert np.isfinite(float(metrics["loss"]))
    s_after = jax.tree_util.tree_leaves(state.student)
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(s_before, s_after)
    ), f"student did not move under {opt}"
    # teacher = 0.9·teacher + 0.1·new_student on every leaf
    for tb, sa, ta in zip(t_before, s_after,
                          jax.tree_util.tree_leaves(state.teacher)):
        np.testing.assert_allclose(
            np.asarray(ta), 0.9 * tb + 0.1 * np.asarray(sa),
            rtol=1e-4, atol=1e-5,
        )

    with pytest.raises(ValueError, match="separate-pass tail"):
        make_ssl_train_step(replace(TINY, optimizer=opt), mesh)
    with pytest.raises(ValueError, match="AdamW math only"):
        create_ssl_state(replace(TINY, optimizer=opt, zero1=True),
                         jax.random.PRNGKey(0), zero1_shards=4)
