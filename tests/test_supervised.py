"""End-to-end supervised train-step smoke tests on the 8-device CPU mesh.

One step function is compiled once (module-scoped fixture) and shared —
CPU compiles of the full shard_map'd step are expensive.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from lafs_cvpr2024_tpu.models.partfvit import PartFViTConfig
from lafs_cvpr2024_tpu.ops.mixup import MixupConfig
from lafs_cvpr2024_tpu.train.supervised import (
    SupervisedConfig,
    create_classifier,
    create_state,
    make_embed_fn,
    make_train_step,
)

TINY_MODEL = PartFViTConfig(
    image_size=48, dim=32, depth=1, heads=2, dim_head=16, mlp_dim=64,
    num_patches=36, num_classes=16, with_land=True, stn_mode="small",
)

CFG = SupervisedConfig(
    model=TINY_MODEL,
    acc_step=2,
    mixup=MixupConfig(mixup_alpha=0.2, prob=0.1, num_classes=16),
    compute_dtype=jnp.float32,
)


@pytest.fixture(scope="module")
def setup():
    mesh = Mesh(np.array(jax.devices()).reshape(2, 4), ("data", "model"))
    state = jax.jit(lambda r: create_state(CFG, r))(jax.random.PRNGKey(0))
    w, w_opt = create_classifier(CFG, jax.random.PRNGKey(1))
    step = make_train_step(CFG, mesh)
    return mesh, state, w, w_opt, step



def _own_class_cos(embed, images, labels, state, w):
    """Deterministic learning probe: mean cosine between each image's
    eval-mode embedding and its class's margin-weight row. Per-step train
    losses are NOT comparable under pfc — each step scores a different
    negative sample (and a different PRNG impl reorders the draws), so a
    loss-trend assert is sampling noise; this dense, sample-free quantity
    is what CosFace actually optimizes."""
    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    emb = np.asarray(embed(variables, images))
    emb = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    wn = np.asarray(w, np.float32)
    wn = wn / np.linalg.norm(wn, axis=1, keepdims=True)
    cos = emb @ wn.T
    return float(cos[np.arange(labels.shape[0]), np.asarray(labels)].mean())

def test_train_step_runs_and_loss_decreases(setup):
    _, state, w, w_opt, step = setup
    rng = jax.random.PRNGKey(2)
    b = 8
    images = jax.random.uniform(rng, (CFG.acc_step * b, 48, 48, 3)) * 2 - 1
    labels = jnp.tile(jnp.arange(b), CFG.acc_step) % 16

    losses = []
    for _ in range(6):
        state, w, w_opt, metrics = step(state, w, w_opt, images, labels, 1e-3)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    # overfits the fixed batch (mixup noise makes individual steps jumpy)
    assert min(losses[2:]) < losses[0]
    assert int(state.step) == 6


def test_classifier_stays_sharded_shape(setup):
    _, state, w, w_opt, step = setup
    images = jnp.zeros((CFG.acc_step * 8, 48, 48, 3))
    labels = jnp.zeros((CFG.acc_step * 8,), jnp.int32)
    state, w, w_opt, metrics = step(state, w, w_opt, images, labels, 1e-3)
    assert w.shape == (16, 32)
    assert np.isfinite(float(metrics["loss"]))


def test_landmark_distill_step():
    """pre_land+keep_land path: MSE against a frozen landmark teacher."""
    from lafs_cvpr2024_tpu.train.ssl import create_landmark_provider, SSLConfig
    from lafs_cvpr2024_tpu.train.supervised import land_loss_schedule

    cfg = SupervisedConfig(
        model=TINY_MODEL, acc_step=1,
        mixup=MixupConfig(mixup_alpha=0.0, prob=0.0, num_classes=16),
        compute_dtype=jnp.float32, landmark_distill=True,
    )
    mesh = Mesh(np.array(jax.devices()[:2]).reshape(2, 1), ("data", "model"))
    state = jax.jit(lambda r: create_state(cfg, r))(jax.random.PRNGKey(0))
    w, w_opt = create_classifier(cfg, jax.random.PRNGKey(1))
    step = make_train_step(cfg, mesh)
    land_vars = create_landmark_provider(
        SSLConfig(model=TINY_MODEL), jax.random.PRNGKey(2)
    )
    images = jax.random.uniform(jax.random.PRNGKey(3), (4, 48, 48, 3)) * 2 - 1
    labels = jnp.arange(4) % 16
    s0, w0, o0, m0 = step(state, w, w_opt, images, labels, 1e-3,
                          land_vars=land_vars, land_weight=0.0)
    s1, w1, o1, m1 = step(state, w, w_opt, images, labels, 1e-3,
                          land_vars=land_vars, land_weight=1000.0)
    assert np.isfinite(float(m0["loss"])) and np.isfinite(float(m1["loss"]))
    # the distillation term contributes when weighted
    assert float(m1["loss"]) > float(m0["loss"])
    # schedule bands (train_largescale.py:826-835)
    assert land_loss_schedule(5) == 1000.0
    assert land_loss_schedule(10) == 100.0
    assert land_loss_schedule(15) == 1.0
    assert land_loss_schedule(25) == 0.11
    assert land_loss_schedule(30) == 0.0


def test_fused_device_aug_step():
    """fused_device_aug: RAW uint8 batch in, full aug pipeline inside the
    compiled step, multi-device mesh, loss finite and decreasing-ish."""
    import numpy as np

    from lafs_cvpr2024_tpu.parallel.mesh import create_mesh

    cfg = SupervisedConfig(
        model=PartFViTConfig(
            image_size=48, dim=32, depth=1, heads=2, dim_head=16, mlp_dim=64,
            num_patches=36, num_classes=16, with_land=True, stn_mode="small",
        ),
        acc_step=2,
        mixup=MixupConfig(mixup_alpha=0.2, prob=0.5, num_classes=16),
        compute_dtype=jnp.float32,
        fused_device_aug=True,
        rand_aug="rand-m1-mstd0.5-inc1",
    )
    mesh = create_mesh(model=1)
    state = jax.jit(lambda r: create_state(cfg, r))(jax.random.PRNGKey(0))
    w, wopt = create_classifier(cfg, jax.random.PRNGKey(1))
    step = make_train_step(cfg, mesh)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 255, (32, 56, 56, 3)).astype(np.uint8))
    labels = jnp.asarray(rng.integers(0, 16, (32,)), jnp.int32)
    losses = []
    for _ in range(3):
        state, w, wopt, m = step(state, w, wopt, imgs, labels, 1e-3)
        losses.append(float(m["loss"]))
    assert all(np.isfinite(losses)), losses


def test_nonfinite_loss_skips_update():
    """A NaN loss must leave the parameters untouched (the reference clips
    the poisoned grads and steps anyway — train_largescale.py:877-878; here
    the whole update is zeroed and surfaced as skipped_nonfinite)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from lafs_cvpr2024_tpu.models.partfvit import PartFViTConfig
    from lafs_cvpr2024_tpu.ops.mixup import MixupConfig
    from lafs_cvpr2024_tpu.train.supervised import (
        SupervisedConfig,
        create_classifier,
        create_state,
        make_train_step,
    )

    cfg = SupervisedConfig(
        model=PartFViTConfig(
            image_size=48, dim=32, depth=1, heads=2, dim_head=16, mlp_dim=64,
            num_patches=36, num_classes=8, with_land=True, stn_mode="small",
        ),
        acc_step=1,
        mixup=MixupConfig(mixup_alpha=0.0, cutmix_alpha=0.0, prob=0.0,
                          num_classes=8),
        compute_dtype=jnp.float32,
        shard_classifier=False,
    )
    mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1), ("data", "model"))
    state = create_state(cfg, jax.random.PRNGKey(0))
    w, w_opt = create_classifier(cfg, jax.random.PRNGKey(1), enabled=False)
    step = make_train_step(cfg, mesh)

    # NaN images poison the loss
    images = jnp.full((2, 48, 48, 3), jnp.nan, jnp.float32)
    labels = jnp.zeros((2,), jnp.int32)
    before = jax.tree_util.tree_leaves(state.params)[0].copy()
    new_state, w, w_opt, metrics = step(state, w, w_opt, images, labels, 1e-2)
    assert float(metrics["skipped_nonfinite"]) == 1.0
    after = jax.tree_util.tree_leaves(new_state.params)[0]
    np.testing.assert_array_equal(np.asarray(before), np.asarray(after))
    assert bool(jnp.all(jnp.isfinite(after)))

    # a clean batch afterwards must step normally
    images = jnp.zeros((2, 48, 48, 3), jnp.float32)
    new_state2, w, w_opt, metrics2 = step(new_state, w, w_opt, images, labels, 1e-2)
    assert float(metrics2["skipped_nonfinite"]) == 0.0
    assert np.isfinite(float(metrics2["loss"]))


def test_factored_head_matches_autodiff():
    """The factored head path (dW assembled from stacked (nemb, dcos)
    factors after the scan, weight-norm chain applied once) must produce
    the SAME loss and the SAME classifier update as plain autodiff through
    an in-graph CosFace head."""
    from lafs_cvpr2024_tpu.models.heads import cosface_logits
    from lafs_cvpr2024_tpu.models.partfvit import PartFViT
    from lafs_cvpr2024_tpu.train.losses import softmax_cross_entropy
    from lafs_cvpr2024_tpu.train.optim import adamw_init, adamw_update

    model_cfg = PartFViTConfig(
        image_size=48, dim=32, depth=1, heads=2, dim_head=16, mlp_dim=64,
        num_patches=36, num_classes=16, with_land=False,
        dropout=0.0, emb_dropout=0.0, drop_path_rate=0.0,
    )
    cfg = SupervisedConfig(
        model=model_cfg, acc_step=2,
        mixup=MixupConfig(mixup_alpha=0.0, cutmix_alpha=0.0, prob=0.0,
                          num_classes=16, label_smoothing=0.0),
        compute_dtype=jnp.float32, factored_head=True, weight_decay=0.1,
    )
    mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1), ("data", "model"))
    state = create_state(cfg, jax.random.PRNGKey(0), sharded_classifier=True)
    w, w_opt = create_classifier(cfg, jax.random.PRNGKey(1))
    step = make_train_step(cfg, mesh)

    b = 4
    images = jax.random.uniform(
        jax.random.PRNGKey(3), (cfg.acc_step * b, 48, 48, 3)) * 2 - 1
    labels = jnp.arange(cfg.acc_step * b) % 16
    lr = 1e-3
    new_state, new_w, new_opt, metrics = step(state, w, w_opt, images, labels, lr)

    # reference: plain autodiff through the margin head (deterministic model:
    # no dropout/mixup/batch_stats, so the rng does not matter)
    model = PartFViT(PartFViTConfig(**{**model_cfg.__dict__, "loss_type": "None"}))
    imgs = images.reshape(cfg.acc_step, b, 48, 48, 3)
    labs = labels.reshape(cfg.acc_step, b)

    def ref_loss(params, weight):
        total = 0.0
        for i in range(cfg.acc_step):
            emb = model.apply(
                {"params": params}, imgs[i], None, train=True,
                rngs={"dropout": jax.random.PRNGKey(9)},
            ).astype(jnp.float32)
            onehot = jax.nn.one_hot(labs[i], 16)
            logits = cosface_logits(
                emb, weight, onehot,
                s=model_cfg.cosface_s, m=model_cfg.cosface_m,
            )
            total = total + softmax_cross_entropy(logits, onehot)
        return total / cfg.acc_step

    loss_ref, wgrad_ref = jax.value_and_grad(ref_loss, argnums=1)(
        state.params, w
    )
    np.testing.assert_allclose(
        float(metrics["loss"]), float(loss_ref), rtol=2e-5)

    ref_w, _ = adamw_update(
        {"w": wgrad_ref}, adamw_init({"w": w}), {"w": w}, lr,
        wd=cfg.weight_decay,
    )
    np.testing.assert_allclose(
        np.asarray(new_w), np.asarray(ref_w["w"]), rtol=2e-4, atol=2e-6)


def test_factored_head_trains_on_mesh():
    """Factored head on a (2,1) data-parallel mesh with mixup: loss finite
    and the fixed batch overfits."""
    cfg = SupervisedConfig(
        model=TINY_MODEL, acc_step=2,
        mixup=MixupConfig(mixup_alpha=0.2, prob=0.1, num_classes=16),
        compute_dtype=jnp.float32, factored_head=True,
    )
    mesh = Mesh(np.array(jax.devices()[:2]).reshape(2, 1), ("data", "model"))
    state = jax.jit(
        lambda r: create_state(cfg, r, sharded_classifier=True)
    )(jax.random.PRNGKey(0))
    w, w_opt = create_classifier(cfg, jax.random.PRNGKey(1))
    step = make_train_step(cfg, mesh)
    b = 8
    images = jax.random.uniform(
        jax.random.PRNGKey(2), (cfg.acc_step * b, 48, 48, 3)) * 2 - 1
    labels = jnp.tile(jnp.arange(b), cfg.acc_step) % 16
    losses = []
    for _ in range(6):
        state, w, w_opt, metrics = step(state, w, w_opt, images, labels, 1e-3)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert min(losses[2:]) < losses[0]


def test_factored_head_matches_sharded_autodiff():
    """Factored + class-sharded (TP) head: same loss and same classifier
    update as the autodiff TP path, on a (2,4) mesh (deterministic model:
    no dropout/mixup, so the two step functions are comparable)."""
    model_cfg = PartFViTConfig(
        image_size=48, dim=32, depth=1, heads=2, dim_head=16, mlp_dim=64,
        num_patches=36, num_classes=16, with_land=False,
        dropout=0.0, emb_dropout=0.0, drop_path_rate=0.0,
    )
    mk = lambda fact: SupervisedConfig(
        model=model_cfg, acc_step=2,
        mixup=MixupConfig(mixup_alpha=0.0, cutmix_alpha=0.0, prob=0.0,
                          num_classes=16, label_smoothing=0.0),
        compute_dtype=jnp.float32, factored_head=fact, shard_classifier=True,
    )
    mesh = Mesh(np.array(jax.devices()).reshape(2, 4), ("data", "model"))
    state = create_state(mk(False), jax.random.PRNGKey(0), sharded_classifier=True)
    w, w_opt = create_classifier(mk(False), jax.random.PRNGKey(1))
    b = 8
    images = jax.random.uniform(
        jax.random.PRNGKey(3), (2 * b, 48, 48, 3)) * 2 - 1
    labels = jnp.arange(2 * b) % 16

    outs = {}
    for fact in (False, True):
        step = make_train_step(mk(fact), mesh)
        _, new_w, _, metrics = step(state, w, w_opt, images, labels, 1e-3)
        outs[fact] = (float(metrics["loss"]), np.asarray(new_w))
    np.testing.assert_allclose(outs[True][0], outs[False][0], rtol=2e-5)
    np.testing.assert_allclose(outs[True][1], outs[False][1],
                               rtol=2e-4, atol=2e-6)


def test_pfc_sample_classes_properties():
    """Every positive appears in the sample; no duplicates; correct size."""
    from lafs_cvpr2024_tpu.parallel.partial_fc import sample_classes

    labels = jnp.array([3, 3, 7, 15, 200, 511])
    idx = np.asarray(sample_classes(jax.random.PRNGKey(0), labels, 512, 64))
    assert idx.shape == (64,)
    assert len(set(idx.tolist())) == 64
    assert set(np.asarray(labels).tolist()) <= set(idx.tolist())


def test_pfc_sparse_row_adamw_matches_dense_on_rows():
    """Sampled rows get exactly the dense AdamW update; unsampled rows (and
    their moments) are bit-untouched."""
    from lafs_cvpr2024_tpu.parallel.partial_fc import sparse_row_adamw
    from lafs_cvpr2024_tpu.train.optim import adamw_init, adamw_update

    rng = jax.random.PRNGKey(0)
    w = jax.random.normal(rng, (10, 4))
    opt = adamw_init({"w": w})
    # tick the moments once so they are non-zero
    g0 = jax.random.normal(jax.random.fold_in(rng, 1), (10, 4))
    wd, lr = 0.1, 1e-2
    wfull, opt = adamw_update({"w": g0}, opt, {"w": w}, lr, wd=wd)
    w = wfull["w"]

    idx = jnp.array([7, 2, 5])
    grad_rows = jax.random.normal(jax.random.fold_in(rng, 2), (3, 4))
    new_w, new_opt = sparse_row_adamw(grad_rows, opt, w, idx, lr, wd=wd)

    # dense reference on the gathered 3-row problem with the same count
    sub_opt = type(opt)(opt.count, {"w": opt.mu["w"][idx]}, {"w": opt.nu["w"][idx]})
    ref_rows, ref_opt = adamw_update(
        {"w": grad_rows}, sub_opt, {"w": w[idx]}, lr, wd=wd
    )
    np.testing.assert_allclose(np.asarray(new_w[idx]),
                               np.asarray(ref_rows["w"]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(new_opt.mu["w"][idx]),
                               np.asarray(ref_opt.mu["w"]), rtol=1e-6)
    untouched = jnp.array([0, 1, 3, 4, 6, 8, 9])
    np.testing.assert_array_equal(np.asarray(new_w[untouched]),
                                  np.asarray(w[untouched]))
    np.testing.assert_array_equal(np.asarray(new_opt.nu["w"][untouched]),
                                  np.asarray(opt.nu["w"][untouched]))
    assert int(new_opt.count) == int(opt.count) + 1


@pytest.mark.parametrize("sampler", ["block", "uniform"])
def test_pfc_full_coverage_matches_factored(sampler):
    """When the sample covers every class (ratio→1), both pfc samplers must
    reproduce the plain factored head exactly: uniform's sample is a
    permutation of all classes (CE/dW are permutation-invariant); block's
    only start is 0 and every positive column is a masked duplicate."""
    model_cfg = PartFViTConfig(
        image_size=48, dim=32, depth=1, heads=2, dim_head=16, mlp_dim=64,
        num_patches=36, num_classes=16, with_land=False,
        dropout=0.0, emb_dropout=0.0, drop_path_rate=0.0,
    )
    mk = lambda ratio: SupervisedConfig(
        model=model_cfg, acc_step=2,
        mixup=MixupConfig(mixup_alpha=0.0, cutmix_alpha=0.0, prob=0.0,
                          num_classes=16, label_smoothing=0.0),
        compute_dtype=jnp.float32, factored_head=True, pfc_ratio=ratio,
        pfc_sampler=sampler, weight_decay=0.1,
    )
    mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1), ("data", "model"))
    state = create_state(mk(1.0), jax.random.PRNGKey(0), sharded_classifier=True)
    w, w_opt = create_classifier(mk(1.0), jax.random.PRNGKey(1))
    b = 4
    images = jax.random.uniform(
        jax.random.PRNGKey(3), (2 * b, 48, 48, 3)) * 2 - 1
    labels = jnp.arange(2 * b) % 16

    outs = {}
    for ratio in (1.0, 0.99):  # round(0.99*16) == 16: full-coverage sample
        step = make_train_step(mk(ratio), mesh)
        _, new_w, _, metrics = step(state, w, w_opt, images, labels, 1e-3)
        outs[ratio] = (float(metrics["loss"]), np.asarray(new_w))
    np.testing.assert_allclose(outs[0.99][0], outs[1.0][0], rtol=1e-5)
    np.testing.assert_allclose(outs[0.99][1], outs[1.0][1],
                               rtol=2e-4, atol=2e-6)


@pytest.mark.parametrize("sampler,ratio,row_bound", [
    # uniform: ≤ num_sample=12 rows move/step (labels must fit the sample)
    ("uniform", 0.75, 12),
    # block: ≤ block(4) + distinct out-of-block positives(≤4) rows move
    ("block", 0.25, 8),
])
def test_pfc_trains_on_mesh(sampler, ratio, row_bound):
    """Sampled head on a (2,1) data-parallel mesh with mixup: finite
    losses, the fixed batch overfits, and per-step row sparsity holds."""
    cfg = SupervisedConfig(
        model=TINY_MODEL, acc_step=2,
        mixup=MixupConfig(mixup_alpha=0.2, prob=0.1, num_classes=16,
                          label_smoothing=0.0),
        compute_dtype=jnp.float32, factored_head=True, pfc_ratio=ratio,
        pfc_sampler=sampler,
    )
    mesh = Mesh(np.array(jax.devices()[:2]).reshape(2, 1), ("data", "model"))
    state = jax.jit(
        lambda r: create_state(cfg, r, sharded_classifier=True)
    )(jax.random.PRNGKey(0))
    w, w_opt = create_classifier(cfg, jax.random.PRNGKey(1))
    step = make_train_step(cfg, mesh)
    # gathered labels/step = 2 shards × acc 2 × b 2 = 8, 4 distinct
    b = 2
    images = jax.random.uniform(
        jax.random.PRNGKey(2), (cfg.acc_step * b, 48, 48, 3)) * 2 - 1
    labels = (jnp.arange(cfg.acc_step * b) * 3) % 16
    embed = make_embed_fn(cfg)

    def own_class_cos(state, w):
        return _own_class_cos(embed, images, labels, state, w)

    cos0 = own_class_cos(state, w)
    prev_w = np.asarray(w)
    state, w, w_opt, metrics = step(state, w, w_opt, images, labels, 1e-2)
    changed = (np.abs(np.asarray(w) - prev_w).max(axis=1) > 0).sum()
    assert changed <= row_bound
    losses = [float(metrics["loss"])]
    for _ in range(19):
        state, w, w_opt, metrics = step(state, w, w_opt, images, labels, 1e-2)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    cos1 = own_class_cos(state, w)
    assert cos1 > cos0 + 0.1, (cos0, cos1)


def test_pfc_config_guards():
    """Invalid pfc combinations fail loudly at build/trace time."""
    mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1), ("data", "model"))
    base = dict(model=TINY_MODEL, acc_step=1, compute_dtype=jnp.float32)
    with pytest.raises(ValueError, match="factored_head"):
        make_train_step(SupervisedConfig(
            mixup=MixupConfig(num_classes=16), pfc_ratio=0.5, **base), mesh)
    with pytest.raises(ValueError, match="smoothing"):
        make_train_step(SupervisedConfig(
            mixup=MixupConfig(num_classes=16, label_smoothing=0.1),
            factored_head=True, pfc_ratio=0.5, **base), mesh)
    with pytest.raises(ValueError, match="pfc_sampler"):
        make_train_step(SupervisedConfig(
            mixup=MixupConfig(num_classes=16, label_smoothing=0.0),
            factored_head=True, pfc_ratio=0.5, pfc_sampler="nope", **base),
            mesh)
    # uniform sampler: too many labels for the sample raises at trace time
    # (the block sampler has no such limit — positives ride as extra cols)
    cfg = SupervisedConfig(
        mixup=MixupConfig(mixup_alpha=0.0, prob=0.0, num_classes=16,
                          label_smoothing=0.0),
        factored_head=True, pfc_ratio=0.25, pfc_sampler="uniform",
        **base)  # num_sample = 4
    state = create_state(cfg, jax.random.PRNGKey(0), sharded_classifier=True)
    w, w_opt = create_classifier(cfg, jax.random.PRNGKey(1))
    step = make_train_step(cfg, mesh)
    images = jnp.zeros((8, 48, 48, 3))
    with pytest.raises(ValueError, match="raise pfc_ratio"):
        step(state, w, w_opt, images, jnp.arange(8) % 16, 1e-3)


def test_pfc_block_sample_and_adamw():
    """block_sample masks in-block and duplicate positives; block_pos_adamw
    applies dense AdamW to block + live positive rows and leaves everything
    else (incl. dead-slot rows) bit-untouched."""
    from lafs_cvpr2024_tpu.parallel.partial_fc import (
        block_pos_adamw, block_sample, first_occurrence_mask)
    from lafs_cvpr2024_tpu.train.optim import adamw_init, adamw_update

    assert np.asarray(first_occurrence_mask(
        jnp.array([5, 3, 5, 5, 7, 3]))).tolist() == [
        True, True, False, False, True, False]

    C, D, bs = 20, 4, 6
    pos = jnp.array([2, 11, 11, 19])
    start, u_pos = block_sample(jax.random.PRNGKey(4), pos, C, bs)
    start = int(start)
    assert 0 <= start <= C - bs
    exp = []
    seen = set()
    for p in np.asarray(pos).tolist():
        live = p not in seen and not (start <= p < start + bs)
        seen.add(p)
        exp.append(live)
    assert np.asarray(u_pos).tolist() == exp

    rng = jax.random.PRNGKey(0)
    w = jax.random.normal(rng, (C, D))
    opt = adamw_init({"w": w})
    g0 = jax.random.normal(jax.random.fold_in(rng, 1), (C, D))
    lr, wd = 1e-2, 0.1
    wfull, opt = adamw_update({"w": g0}, opt, {"w": w}, lr, wd=wd)
    w = wfull["w"]

    grad_rows = jax.random.normal(jax.random.fold_in(rng, 2), (bs + 4, D))
    # dead slots must carry zero gradient (as the masked CE guarantees)
    grad_rows = grad_rows * np.concatenate(
        [np.ones(bs), np.asarray(u_pos, np.float32)])[:, None]
    new_w, new_opt = block_pos_adamw(
        grad_rows, opt, w, jnp.int32(start), bs, pos, u_pos, lr, wd=wd)

    # dense reference: scatter the sampled grads into a full (C, D) grad and
    # run dense AdamW, then compare ONLY on touched rows
    dense_g = np.zeros((C, D), np.float32)
    dense_g[start:start + bs] = np.asarray(grad_rows[:bs])
    for slot, p in enumerate(np.asarray(pos).tolist()):
        if exp[slot]:
            dense_g[p] += np.asarray(grad_rows[bs + slot])
    ref_w, ref_opt = adamw_update({"w": jnp.asarray(dense_g)}, opt, {"w": w},
                                  lr, wd=wd)
    touched = sorted(set(range(start, start + bs)) |
                     {p for slot, p in enumerate(np.asarray(pos).tolist())
                      if exp[slot]})
    untouched = sorted(set(range(C)) - set(touched))
    np.testing.assert_allclose(np.asarray(new_w[jnp.array(touched)]),
                               np.asarray(ref_w["w"][jnp.array(touched)]),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(new_opt.mu["w"][jnp.array(touched)]),
                               np.asarray(ref_opt.mu["w"][jnp.array(touched)]),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(new_w[jnp.array(untouched)]),
                                  np.asarray(w[jnp.array(untouched)]))
    np.testing.assert_array_equal(
        np.asarray(new_opt.nu["w"][jnp.array(untouched)]),
        np.asarray(opt.nu["w"][jnp.array(untouched)]))


def test_pfc_tp_full_coverage_matches_factored_tp():
    """pfc block sampler COMPOSED with the TP-sharded head: when every
    shard's block covers its whole local class range (ratio→1 pins each
    block start at 0), the step must reproduce the plain factored TP path
    exactly — every positive column is a masked duplicate of an in-block
    column on its owner shard and dead everywhere else."""
    model_cfg = PartFViTConfig(
        image_size=48, dim=32, depth=1, heads=2, dim_head=16, mlp_dim=64,
        num_patches=36, num_classes=16, with_land=False,
        dropout=0.0, emb_dropout=0.0, drop_path_rate=0.0,
    )
    mk = lambda ratio: SupervisedConfig(
        model=model_cfg, acc_step=2,
        mixup=MixupConfig(mixup_alpha=0.0, cutmix_alpha=0.0, prob=0.0,
                          num_classes=16, label_smoothing=0.0),
        compute_dtype=jnp.float32, factored_head=True, shard_classifier=True,
        pfc_ratio=ratio, weight_decay=0.1,
    )
    mesh = Mesh(np.array(jax.devices()).reshape(2, 4), ("data", "model"))
    state = create_state(mk(1.0), jax.random.PRNGKey(0), sharded_classifier=True)
    w, w_opt = create_classifier(mk(1.0), jax.random.PRNGKey(1))
    b = 8
    images = jax.random.uniform(
        jax.random.PRNGKey(3), (2 * b, 48, 48, 3)) * 2 - 1
    labels = jnp.arange(2 * b) % 16

    outs = {}
    for ratio in (1.0, 0.99):  # c_loc=4: round(0.99*4) == 4 — full coverage
        step = make_train_step(mk(ratio), mesh)
        _, new_w, _, metrics = step(state, w, w_opt, images, labels, 1e-3)
        outs[ratio] = (float(metrics["loss"]), np.asarray(new_w))
    np.testing.assert_allclose(outs[0.99][0], outs[1.0][0], rtol=1e-5)
    np.testing.assert_allclose(outs[0.99][1], outs[1.0][1],
                               rtol=2e-4, atol=2e-6)


def test_pfc_tp_trains_on_mesh():
    """pfc block sampler + TP head on a (2,2) mesh with mixup: finite
    losses, the deterministic embedding-to-class-row probe rises, and
    per-shard row sparsity holds (each shard touches at most its block +
    the positives it owns)."""
    cfg = SupervisedConfig(
        model=TINY_MODEL, acc_step=2,
        mixup=MixupConfig(mixup_alpha=0.2, prob=0.1, num_classes=16,
                          label_smoothing=0.0),
        compute_dtype=jnp.float32, factored_head=True, shard_classifier=True,
        pfc_ratio=0.25,  # c_loc=8 -> block 2 per shard
    )
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2), ("data", "model"))
    state = jax.jit(
        lambda r: create_state(cfg, r, sharded_classifier=True)
    )(jax.random.PRNGKey(0))
    w, w_opt = create_classifier(cfg, jax.random.PRNGKey(1))
    step = make_train_step(cfg, mesh)
    # gathered labels/step = 2 data shards x acc 2 x b 2 = 8, 4 distinct
    b = 2
    images = jax.random.uniform(
        jax.random.PRNGKey(2), (cfg.acc_step * b, 48, 48, 3)) * 2 - 1
    labels = (jnp.arange(cfg.acc_step * b) * 3) % 16

    embed = make_embed_fn(cfg)

    def own_class_cos(state, w):
        return _own_class_cos(embed, images, labels, state, w)

    cos0 = own_class_cos(state, w)
    prev_w = np.asarray(w)
    state, w, w_opt, metrics = step(state, w, w_opt, images, labels, 1e-2)
    changed = (np.abs(np.asarray(w) - prev_w).max(axis=1) > 0).sum()
    # 2 shards x block 2 + <=4 distinct out-of-block positives
    assert changed <= 8
    losses = [float(metrics["loss"])]
    for _ in range(19):
        state, w, w_opt, metrics = step(state, w, w_opt, images, labels, 1e-2)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    cos1 = own_class_cos(state, w)
    assert cos1 > cos0 + 0.1, (cos0, cos1)


def test_pfc_tp_uniform_rejected():
    """The TP head + 'uniform' pfc sampler is a loud error (block only)."""
    cfg = SupervisedConfig(
        model=TINY_MODEL, acc_step=1,
        mixup=MixupConfig(num_classes=16, label_smoothing=0.0),
        compute_dtype=jnp.float32, factored_head=True, shard_classifier=True,
        pfc_ratio=0.5, pfc_sampler="uniform",
    )
    mesh = Mesh(np.array(jax.devices()[:2]).reshape(1, 2), ("data", "model"))
    with pytest.raises(ValueError, match="block"):
        make_train_step(cfg, mesh)


def test_first_occurrence_mask_matches_naive():
    """Sort-based O(P log P) mask equals the naive first-seen scan for
    random duplicate-heavy inputs (incl. the P=1 edge)."""
    from lafs_cvpr2024_tpu.parallel.partial_fc import first_occurrence_mask

    rng = np.random.default_rng(0)
    for n in (1, 2, 7, 100, 1000):
        ids = rng.integers(0, max(1, n // 3), n)
        got = np.asarray(first_occurrence_mask(jnp.asarray(ids)))
        seen, exp = set(), []
        for v in ids.tolist():
            exp.append(v not in seen)
            seen.add(v)
        assert got.tolist() == exp, n


def test_zero1_matches_dense_adamw():
    """ZeRO-1 (moments sharded over a (4,1) data mesh, psum_scatter grads,
    all_gather params) must reproduce the replicated-AdamW step: same loss,
    same updated params, and the gathered flat moment chunks equal the
    dense moments leaf-for-leaf (padding stays zero)."""
    model_cfg = PartFViTConfig(
        image_size=48, dim=32, depth=1, heads=2, dim_head=16, mlp_dim=64,
        num_patches=36, num_classes=16, with_land=False,
        dropout=0.0, emb_dropout=0.0, drop_path_rate=0.0,
    )
    mk = lambda z: SupervisedConfig(
        model=model_cfg, acc_step=2,
        mixup=MixupConfig(mixup_alpha=0.0, cutmix_alpha=0.0, prob=0.0,
                          num_classes=16, label_smoothing=0.0),
        compute_dtype=jnp.float32, zero1=z,
    )
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(4, 1), ("data", "model"))
    b = 8
    images = jax.random.uniform(
        jax.random.PRNGKey(3), (2 * b, 48, 48, 3)) * 2 - 1
    labels = jnp.arange(2 * b) % 16

    out = {}
    for z in (False, True):
        cfg = mk(z)
        state = create_state(cfg, jax.random.PRNGKey(0),
                             zero1_shards=4 if z else 0)
        w, w_opt = create_classifier(cfg, jax.random.PRNGKey(1), enabled=False)
        step = make_train_step(cfg, mesh)
        new_state, _, _, metrics = step(state, w, w_opt, images, labels, 1e-3)
        out[z] = (float(metrics["loss"]), new_state)

    np.testing.assert_allclose(out[True][0], out[False][0], rtol=1e-5)
    dense, zero1 = out[False][1], out[True][1]
    for pd, pz in zip(jax.tree_util.tree_leaves(dense.params),
                      jax.tree_util.tree_leaves(zero1.params)):
        np.testing.assert_allclose(np.asarray(pz), np.asarray(pd),
                                   rtol=2e-5, atol=1e-7)
    for md, mz in zip(jax.tree_util.tree_leaves(dense.opt_state.mu),
                      jax.tree_util.tree_leaves(zero1.opt_state.mu)):
        flat = np.asarray(mz)
        np.testing.assert_allclose(flat[:md.size],
                                   np.asarray(md).reshape(-1),
                                   rtol=2e-5, atol=1e-8)
        assert not flat[md.size:].any()  # padding stays zero


def test_zero1_with_pfc_tp_trains():
    """ZeRO-1 model-state sharding composes with the PartialFC×TP head on a
    (2,2) mesh: finite losses and the deterministic probe rises."""
    cfg = SupervisedConfig(
        model=TINY_MODEL, acc_step=2,
        mixup=MixupConfig(mixup_alpha=0.2, prob=0.1, num_classes=16,
                          label_smoothing=0.0),
        compute_dtype=jnp.float32, factored_head=True, shard_classifier=True,
        pfc_ratio=0.25, zero1=True,
    )
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2), ("data", "model"))
    state = jax.jit(lambda r: create_state(
        cfg, r, sharded_classifier=True, zero1_shards=2
    ))(jax.random.PRNGKey(0))
    w, w_opt = create_classifier(cfg, jax.random.PRNGKey(1))
    step = make_train_step(cfg, mesh)
    b = 2
    images = jax.random.uniform(
        jax.random.PRNGKey(2), (cfg.acc_step * b, 48, 48, 3)) * 2 - 1
    labels = (jnp.arange(cfg.acc_step * b) * 3) % 16

    embed = make_embed_fn(cfg)

    def own_class_cos(state, w):
        return _own_class_cos(embed, images, labels, state, w)

    cos0 = own_class_cos(state, w)
    losses = []
    for _ in range(20):
        state, w, w_opt, metrics = step(state, w, w_opt, images, labels, 1e-2)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    cos1 = own_class_cos(state, w)
    assert cos1 > cos0 + 0.1, (cos0, cos1)


def test_zero1_single_data_shard_rejected():
    cfg = SupervisedConfig(
        model=TINY_MODEL, acc_step=1, mixup=MixupConfig(num_classes=16),
        compute_dtype=jnp.float32, zero1=True,
    )
    mesh = Mesh(np.array(jax.devices()[:2]).reshape(1, 2), ("data", "model"))
    with pytest.raises(ValueError, match="zero1"):
        make_train_step(cfg, mesh)


def test_embed_fn_bf16_matches_fp32_to_cosine():
    """make_embed_fn(compute_dtype=bf16): ~2x eval throughput must not
    change embeddings beyond bf16 resolution. The pure transformer path
    (with_land=False) holds cosine >= 1 - 1e-3; the with_land path is
    looser UNDER RANDOM INIT ONLY — the untrained landmark CNN's min-max
    rescale amplifies bf16 noise into sub-pixel patch-position shifts
    (production landmark CNNs are trained/stable, and training itself
    jitters landmarks by N(0, 5px), so the model is robust to far larger
    coordinate noise)."""
    import jax.numpy as jnp

    def cos_min(with_land):
        cfg = SupervisedConfig(
            model=PartFViTConfig(
                image_size=48, dim=64, depth=2, heads=2, dim_head=32,
                mlp_dim=128, num_patches=36, num_classes=0,
                loss_type="None", with_land=with_land, stn_mode="small",
            ),
            compute_dtype=jnp.float32,
        )
        from lafs_cvpr2024_tpu.models.partfvit import PartFViT

        model = PartFViT(cfg.model)
        shape = (1, 48, 48, 3) if with_land else (1, 36, 192)
        variables = jax.jit(model.init)(
            jax.random.PRNGKey(0), jnp.zeros(shape)
        )
        xs = (4, 48, 48, 3) if with_land else (4, 36, 192)
        x = jax.random.uniform(jax.random.PRNGKey(1), xs) * 2 - 1
        f32 = make_embed_fn(cfg)
        b16 = make_embed_fn(cfg, compute_dtype=jnp.bfloat16)
        e32 = np.asarray(f32(variables, x))
        e16 = np.asarray(b16(variables, x))
        assert e16.dtype == np.float32
        num = (e32 * e16).sum(-1)
        den = np.linalg.norm(e32, axis=-1) * np.linalg.norm(e16, axis=-1)
        return (num / np.maximum(den, 1e-12)).min()

    assert cos_min(with_land=False) >= 1 - 1e-3
    assert cos_min(with_land=True) >= 0.99


def test_iresnet_network_step():
    """--network iresnet18: one multi-device step on the insightface
    backbone — in-model CosFace, BN stats update, loss finite and the
    class-cosine probe improves; the embed fn returns the fc embedding."""
    cfg = SupervisedConfig(
        model=PartFViTConfig(
            image_size=32, dim=24, num_classes=8, with_land=False,
            loss_type="CosFace",
        ),
        network="iresnet18",
        layer_decay=1.0,
        acc_step=1,
        mixup=MixupConfig(mixup_alpha=0.0, prob=0.0, num_classes=8),
        compute_dtype=jnp.float32,
    )
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(4, 1), ("data", "model"))
    state = jax.jit(lambda r: create_state(cfg, r))(jax.random.PRNGKey(0))
    assert "layer1_0" in state.params and state.batch_stats
    w, w_opt = create_classifier(cfg, jax.random.PRNGKey(1), enabled=False)
    step = make_train_step(cfg, mesh)

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(-1, 1, (8, 32, 32, 3)).astype(np.float32))
    labels = jnp.asarray(np.arange(8, dtype=np.int32) % 8)
    embed = make_embed_fn(cfg)
    # deterministic probe (same rationale as _own_class_cos): the s=64
    # margin makes the raw per-step CE jumpy on a random-init net, but the
    # embedding→class-row cosine is the quantity CosFace optimizes
    cos0 = _own_class_cos(
        embed, images, labels, state, state.params["loss"]["weight"]
    )
    stats_before = jax.tree_util.tree_leaves(state.batch_stats)
    losses = []
    for _ in range(8):
        state, w, w_opt, m = step(state, w, w_opt, images, labels, 1e-3)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert min(losses[2:]) < losses[0]
    cos1 = _own_class_cos(
        embed, images, labels, state, state.params["loss"]["weight"]
    )
    assert cos1 > cos0, f"class cosine did not improve: {cos0} -> {cos1}"
    stats_after = jax.tree_util.tree_leaves(state.batch_stats)
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(stats_before, stats_after)
    ), "BN running stats did not update"

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    emb = np.asarray(embed(variables, images))
    assert emb.shape == (8, 24) and np.isfinite(emb).all()


def test_iresnet_network_validations():
    """Misuse fails loudly: ViT layer decay has no iresnet mapping, the
    avg head's embedding is fixed at 512, unknown networks refuse."""
    base = dict(
        model=PartFViTConfig(image_size=32, dim=24, num_classes=8,
                             with_land=False, loss_type="CosFace"),
        acc_step=1,
        mixup=MixupConfig(mixup_alpha=0.0, prob=0.0, num_classes=8),
        compute_dtype=jnp.float32,
    )
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(4, 1), ("data", "model"))
    with pytest.raises(ValueError, match="layer_decay"):
        make_train_step(
            SupervisedConfig(network="iresnet18", **base), mesh
        )
    with pytest.raises(ValueError, match="512"):
        create_state(
            SupervisedConfig(network="iresnet18", iresnet_avg=True,
                             layer_decay=1.0, **base),
            jax.random.PRNGKey(0),
        )
    with pytest.raises(ValueError, match="unknown network"):
        create_state(
            SupervisedConfig(network="resnet50", layer_decay=1.0, **base),
            jax.random.PRNGKey(0),
        )
