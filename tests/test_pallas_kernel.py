"""Pallas patch-gather kernel vs the golden-tested XLA implementation
(interpret mode — the compiled kernel is exercised on real TPU by bench/CLI).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from lafs_cvpr2024_tpu.ops.patch_gather import patch_gather
from lafs_cvpr2024_tpu.ops.patch_gather_pallas import patch_gather_pallas


@pytest.mark.parametrize("n_land", [16, 196])
def test_pallas_matches_reference(n_land):
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.standard_normal((2, 112, 112, 3)).astype(np.float32))
    lands = jnp.asarray(rng.uniform(-4, 116, (2, n_land, 2)).astype(np.float32))
    ref = np.asarray(patch_gather(imgs, lands, 8, impl="gather"))
    got = np.asarray(patch_gather_pallas(imgs, lands, 8, interpret=True))
    np.testing.assert_allclose(got, ref, atol=5e-5, rtol=1e-5)


def test_pallas_nonsquare_and_other_patch():
    rng = np.random.default_rng(1)
    imgs = jnp.asarray(rng.standard_normal((1, 64, 48, 3)).astype(np.float32))
    lands = jnp.asarray(rng.uniform(0, 47, (1, 9, 2)).astype(np.float32))
    ref = np.asarray(patch_gather(imgs, lands, 4, impl="gather"))
    got = np.asarray(patch_gather_pallas(imgs, lands, 4, interpret=True))
    np.testing.assert_allclose(got, ref, atol=5e-5, rtol=1e-5)


def test_pallas_diff_wrapper_gradients():
    import jax

    rng = np.random.default_rng(2)
    imgs = jnp.asarray(rng.standard_normal((1, 32, 32, 3)).astype(np.float32))
    lands = jnp.asarray(rng.uniform(4, 27, (1, 4, 2)).astype(np.float32))

    def f(l):
        return patch_gather(imgs, l, 4, impl="pallas").sum()

    def f_ref(l):
        return patch_gather(imgs, l, 4, impl="mxu").sum()

    # interpret-mode fwd runs under the custom_vjp too (CPU test backend)
    from lafs_cvpr2024_tpu.ops import patch_gather_pallas as pgp

    orig = pgp.patch_gather_pallas
    pgp.patch_gather_pallas = lambda i, l, p, interpret=False: orig(i, l, p, interpret=True)
    try:
        g = jax.grad(f)(lands)
        g_ref = jax.grad(f_ref)(lands)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-4)
    finally:
        pgp.patch_gather_pallas = orig
