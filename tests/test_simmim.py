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
