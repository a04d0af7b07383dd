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
