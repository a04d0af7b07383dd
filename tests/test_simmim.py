"""SimMIM pretraining: masked-patch L1 objective decreases; masking matters."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from lafs_cvpr2024_tpu.models.partfvit import PartFViTConfig
from lafs_cvpr2024_tpu.train.simmim import (
    SimMIMConfig,
    create_simmim_state,
    make_simmim_train_step,
)
from lafs_cvpr2024_tpu.train.ssl import SSLConfig, create_landmark_provider

TINY = SimMIMConfig(
    model=PartFViTConfig(
        image_size=48, dim=32, depth=1, heads=2, dim_head=16, mlp_dim=64,
        num_patches=36, with_land=False, loss_type="None", num_classes=0,
        stn_mode="small", simmim=True,
    ),
    compute_dtype=jnp.float32,
)


@pytest.fixture(scope="module")
def setup():
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(4, 1), ("data", "model"))
    state = jax.jit(lambda r: create_simmim_state(TINY, r))(jax.random.PRNGKey(0))
    land = create_landmark_provider(SSLConfig(model=TINY.model), jax.random.PRNGKey(1))
    step = make_simmim_train_step(TINY, mesh)
    return state, land, step


def test_simmim_loss_decreases(setup):
    state, land, step = setup
    imgs = jax.random.uniform(jax.random.PRNGKey(2), (4, 48, 48, 3)) * 2 - 1
    losses = []
    for _ in range(8):
        state, m = step(state, land, imgs, jnp.float32(2e-3), jnp.float32(0.05))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    assert int(state.step) == 8


def test_simmim_grid_variant():
    cfg = SimMIMConfig(model=TINY.model, compute_dtype=jnp.float32,
                       use_landmarks=False)
    mesh = Mesh(np.array(jax.devices()[:2]).reshape(2, 1), ("data", "model"))
    state = jax.jit(lambda r: create_simmim_state(cfg, r))(jax.random.PRNGKey(0))
    land = create_landmark_provider(SSLConfig(model=cfg.model), jax.random.PRNGKey(1))
    step = make_simmim_train_step(cfg, mesh)
    imgs = jnp.zeros((2, 48, 48, 3))
    state, m = step(state, land, imgs, jnp.float32(1e-3), jnp.float32(0.05))
    assert np.isfinite(float(m["loss"]))


def test_simmim_zero1_matches_replicated():
    """ZeRO-1 SimMIM step (moments sharded over (4,1) data mesh, global
    grad clip assembled as one scalar psum of chunk squared-sums) must
    reproduce the replicated pmean+clip_grads_global+adamw path exactly."""
    from dataclasses import replace

    mesh = Mesh(np.array(jax.devices()[:4]).reshape(4, 1), ("data", "model"))
    land = create_landmark_provider(SSLConfig(model=TINY.model),
                                    jax.random.PRNGKey(1))
    images = jax.random.uniform(jax.random.PRNGKey(2), (8, 48, 48, 3)) * 2 - 1

    out = {}
    for z in (False, True):
        cfg = replace(TINY, zero1=z)
        state = jax.jit(lambda r: create_simmim_state(
            cfg, r, zero1_shards=4 if z else 0
        ))(jax.random.PRNGKey(0))
        step = make_simmim_train_step(cfg, mesh)
        new_state, metrics = step(state, land, images,
                                  jnp.float32(1e-3), jnp.float32(0.05))
        out[z] = (float(metrics["loss"]), new_state)

    np.testing.assert_allclose(out[True][0], out[False][0], rtol=1e-6)
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
                                   rtol=2e-5, atol=1e-9)


def test_zero1_moment_layout_converters():
    """zero1_shard_moments / zero1_unshard_moments round-trip exactly and
    produce the layouts the respective init functions produce."""
    from lafs_cvpr2024_tpu.train.optim import (
        adamw_init, adamw_update, zero1_init, zero1_shard_moments,
        zero1_unshard_moments)

    k = jax.random.PRNGKey(0)
    params = {"a": jax.random.normal(k, (5, 3)), "b": jnp.ones((7,))}
    opt = adamw_init(params)
    g = jax.tree_util.tree_map(jnp.ones_like, params)
    _, opt = adamw_update(g, opt, params, 1e-3)

    sharded = zero1_shard_moments(opt, params, 4)
    for leaf, ref in zip(jax.tree_util.tree_leaves(sharded.mu),
                         jax.tree_util.tree_leaves(zero1_init(params, 4).mu)):
        assert leaf.shape == ref.shape
    back = zero1_unshard_moments(sharded, params)
    for a, b in zip(jax.tree_util.tree_leaves(back),
                    jax.tree_util.tree_leaves(opt)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(sharded.count) == int(opt.count)
