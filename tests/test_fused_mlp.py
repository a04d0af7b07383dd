"""Fused Pallas MLP vs the dense reference path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from lafs_cvpr2024_tpu.models.layers import FeedForward
from lafs_cvpr2024_tpu.ops.fused_mlp import fused_mlp

D, H = 128, 256  # %128 like the flagship 768/2048 but test-sized


def _ref_mlp(x, w1, b1, w2, b2):
    h = jax.nn.gelu(x @ w1 + b1, approximate=False)
    return h @ w2 + b2


def _params(key, t=48):
    ks = jax.random.split(key, 5)
    x = jax.random.normal(ks[0], (t, D), jnp.float32)
    w1 = jax.random.normal(ks[1], (D, H), jnp.float32) * 0.05
    b1 = jax.random.normal(ks[2], (H,), jnp.float32) * 0.01
    w2 = jax.random.normal(ks[3], (H, D), jnp.float32) * 0.05
    b2 = jax.random.normal(ks[4], (D,), jnp.float32) * 0.01
    return x, w1, b1, w2, b2


def test_forward_matches_dense_no_dropout():
    x, w1, b1, w2, b2 = _params(jax.random.PRNGKey(0))
    y = fused_mlp(x, w1, b1, w2, b2, rate=0.0, deterministic=True)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(_ref_mlp(x, w1, b1, w2, b2)),
        atol=2e-5, rtol=1e-5,
    )


def test_forward_batched_leading_dims():
    x, w1, b1, w2, b2 = _params(jax.random.PRNGKey(1), t=36)
    x3 = x.reshape(3, 12, D)
    y = fused_mlp(x3, w1, b1, w2, b2, deterministic=True)
    assert y.shape == (3, 12, D)
    np.testing.assert_allclose(
        np.asarray(y.reshape(36, D)),
        np.asarray(_ref_mlp(x, w1, b1, w2, b2)), atol=2e-5, rtol=1e-5,
    )


def test_grads_match_dense_no_dropout():
    x, w1, b1, w2, b2 = _params(jax.random.PRNGKey(2))

    def loss_fused(args):
        return jnp.sum(fused_mlp(*args, rate=0.0, deterministic=True) ** 2)

    def loss_ref(args):
        return jnp.sum(_ref_mlp(*args) ** 2)

    gf = jax.grad(loss_fused)((x, w1, b1, w2, b2))
    gr = jax.grad(loss_ref)((x, w1, b1, w2, b2))
    for a, b, name in zip(gf, gr, ["x", "w1", "b1", "w2", "b2"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-4,
            err_msg=f"grad mismatch for {name}",
        )


def test_dropout_zero_fraction_and_scaling():
    x, w1, b1, w2, b2 = _params(jax.random.PRNGKey(3), t=256)
    rate = 0.3
    y = fused_mlp(
        x, w1, b1, w2, b2, rate=rate, rng=jax.random.PRNGKey(7),
        deterministic=False,
    )
    zero_frac = float(jnp.mean(y == 0.0))
    assert abs(zero_frac - rate) < 0.02, zero_frac
    # kept elements are scaled by 1/keep twice at most — just check finite
    assert bool(jnp.all(jnp.isfinite(y)))
    # different rng ⇒ different mask
    y2 = fused_mlp(
        x, w1, b1, w2, b2, rate=rate, rng=jax.random.PRNGKey(8),
        deterministic=False,
    )
    assert not bool(jnp.all(y == y2))
    # same rng ⇒ deterministic
    y3 = fused_mlp(
        x, w1, b1, w2, b2, rate=rate, rng=jax.random.PRNGKey(7),
        deterministic=False,
    )
    np.testing.assert_array_equal(np.asarray(y), np.asarray(y3))


def test_dropout_vjp_matches_finite_differences():
    """The backward kernel must regenerate the SAME masks the forward drew:
    a finite-difference directional derivative through the fixed-seed
    dropout catches any fwd/bwd mask drift."""
    x, w1, b1, w2, b2 = _params(jax.random.PRNGKey(4), t=32)
    rng = jax.random.PRNGKey(11)
    rate = 0.2

    def f(xx):
        return jnp.sum(
            fused_mlp(xx, w1, b1, w2, b2, rate=rate, rng=rng,
                      deterministic=False)
        )

    g = jax.grad(f)(x)
    v = jax.random.normal(jax.random.PRNGKey(5), x.shape) * 0.5
    eps = 1e-3
    fd = (f(x + eps * v) - f(x - eps * v)) / (2 * eps)
    np.testing.assert_allclose(
        float(jnp.vdot(g, v)), float(fd), rtol=5e-3, atol=5e-3
    )


def test_feedforward_fused_loads_dense_params():
    """Param-tree compatibility: a checkpoint initialized on the dense path
    must run unchanged on the fused path."""
    dense = FeedForward(dim=D, hidden_dim=H, dropout=0.1, mlp_impl="dense")
    fused = FeedForward(dim=D, hidden_dim=H, dropout=0.1, mlp_impl="fused")
    x = jax.random.normal(jax.random.PRNGKey(6), (4, 10, D))
    variables = dense.init(jax.random.PRNGKey(0), x)
    y_dense = dense.apply(variables, x, deterministic=True)
    y_fused = fused.apply(variables, x, deterministic=True)
    np.testing.assert_allclose(
        np.asarray(y_fused), np.asarray(y_dense), atol=2e-5, rtol=1e-5
    )
    assert jax.tree_util.tree_all(
        jax.tree_util.tree_map(
            lambda a, b: a.shape == b.shape,
            variables, fused.init(jax.random.PRNGKey(0), x),
        )
    )


def test_feedforward_fused_train_mode_runs():
    fused = FeedForward(dim=D, hidden_dim=H, dropout=0.1, mlp_impl="fused")
    x = jax.random.normal(jax.random.PRNGKey(9), (4, 10, D))
    variables = fused.init(jax.random.PRNGKey(0), x)
    y = fused.apply(
        variables, x, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(1)},
    )
    assert y.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(y)))


def test_fused_mlp_under_shard_map():
    """The custom-VJP fused op must compose with shard_map over a data axis
    (the SSL/supervised train steps run it per-shard)."""
    from jax.sharding import Mesh, PartitionSpec as P

    devs = jax.devices()[:2]
    mesh = Mesh(np.array(devs).reshape(2), ("data",))
    x = jax.random.normal(jax.random.PRNGKey(0), (8, D), jnp.float32)
    w1 = jax.random.normal(jax.random.PRNGKey(1), (D, H), jnp.float32) * 0.05
    b1 = jnp.zeros((H,), jnp.float32)
    w2 = jax.random.normal(jax.random.PRNGKey(2), (H, D), jnp.float32) * 0.05
    b2 = jnp.zeros((D,), jnp.float32)

    def shard_fn(x, w1, b1, w2, b2):
        def loss(w1):
            y = fused_mlp(x, w1, b1, w2, b2, deterministic=True)
            return jnp.sum(y ** 2)

        l, g = jax.value_and_grad(loss)(w1)
        return jax.lax.pmean(l, "data"), jax.lax.pmean(g, "data")

    # check_vma=False ONLY for interpret mode: the pallas hlo_interpreter's
    # internal block dynamic_slice trips the vma check (jax limitation); the
    # COMPILED TPU lowering passes with check_vma=True (verified on-chip) —
    # ops/fused_mlp.py declares out vma and pvary-aligns its operands.
    l, g = jax.jit(
        jax.shard_map(
            shard_fn, mesh=mesh,
            in_specs=(P("data"), P(), P(), P(), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )
    )(x, w1, b1, w2, b2)

    def ref_loss(w1):
        h = jax.nn.gelu(x @ w1 + b1, approximate=False)
        return jnp.mean(
            jnp.sum((h @ w2 + b2) ** 2, axis=-1).reshape(2, -1).sum(-1)
        )

    l_ref, g_ref = jax.value_and_grad(ref_loss)(w1)
    np.testing.assert_allclose(float(l), float(l_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-4, rtol=1e-4)


# ---------------------------------------------------------------------------
# LN-fused variant (mlp_impl='fused_ln'): the pre-MLP LayerNorm runs inside
# the kernel — ops/fused_mlp.py::fused_ln_mlp
# ---------------------------------------------------------------------------


def _ref_ln_mlp(x, g, bt, w1, b1, w2, b2, eps=1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    xn = xc * jax.lax.rsqrt(var + eps) * g + bt
    return _ref_mlp(xn, w1, b1, w2, b2)


def _ln_params(key, t=48):
    x, w1, b1, w2, b2 = _params(key, t=t)
    ks = jax.random.split(jax.random.fold_in(key, 99), 2)
    g = 1.0 + 0.1 * jax.random.normal(ks[0], (D,), jnp.float32)
    bt = 0.05 * jax.random.normal(ks[1], (D,), jnp.float32)
    return x, g, bt, w1, b1, w2, b2


def test_fused_ln_forward_matches_reference():
    from lafs_cvpr2024_tpu.ops.fused_mlp import fused_ln_mlp

    args = _ln_params(jax.random.PRNGKey(20))
    y = fused_ln_mlp(*args, rate=0.0, deterministic=True)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(_ref_ln_mlp(*args)), atol=3e-5, rtol=1e-5
    )


def test_fused_ln_grads_match_reference():
    from lafs_cvpr2024_tpu.ops.fused_mlp import fused_ln_mlp

    args = _ln_params(jax.random.PRNGKey(21))

    def loss_fused(a):
        return jnp.sum(fused_ln_mlp(*a, rate=0.0, deterministic=True) ** 2)

    def loss_ref(a):
        return jnp.sum(_ref_ln_mlp(*a) ** 2)

    gf = jax.grad(loss_fused)(args)
    gr = jax.grad(loss_ref)(args)
    for a, b, name in zip(gf, gr, ["x", "g", "bt", "w1", "b1", "w2", "b2"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=7e-4, rtol=7e-4,
            err_msg=f"grad mismatch for {name}",
        )


def test_fused_ln_dropout_vjp_matches_finite_differences():
    """Backward must regenerate the forward's dropout masks AND apply the
    LayerNorm backward in-core; a directional finite difference through the
    fixed-seed dropout catches drift in either."""
    from lafs_cvpr2024_tpu.ops.fused_mlp import fused_ln_mlp

    x, g, bt, w1, b1, w2, b2 = _ln_params(jax.random.PRNGKey(22), t=32)
    rng = jax.random.PRNGKey(13)
    rate = 0.2

    def f(xx):
        return jnp.sum(
            fused_ln_mlp(xx, g, bt, w1, b1, w2, b2, rate=rate, rng=rng,
                         deterministic=False)
        )

    grad = jax.grad(f)(x)
    v = jax.random.normal(jax.random.PRNGKey(5), x.shape) * 0.5
    eps = 1e-3
    fd = (f(x + eps * v) - f(x - eps * v)) / (2 * eps)
    np.testing.assert_allclose(
        float(jnp.vdot(grad, v)), float(fd), rtol=5e-3, atol=5e-3
    )


def test_transformer_block_fused_ln_loads_dense_params():
    """Checkpoint compatibility across all three MLP impls: one param tree,
    identical eval-mode outputs (the fused_ln path holds the norm2 params in
    _LNParams under nn.LayerNorm's names)."""
    from lafs_cvpr2024_tpu.models.layers import TransformerBlock

    x = jax.random.normal(jax.random.PRNGKey(30), (2, 12, D))
    blocks = {
        impl: TransformerBlock(
            dim=D, heads=2, dim_head=64, mlp_dim=H, dropout=0.1,
            mlp_impl=impl,
        )
        for impl in ("dense", "fused", "fused_ln")
    }
    variables = blocks["dense"].init(jax.random.PRNGKey(0), x)
    for impl in ("fused", "fused_ln"):
        vi = blocks[impl].init(jax.random.PRNGKey(0), x)
        assert jax.tree_util.tree_structure(vi) == jax.tree_util.tree_structure(variables)
    y_dense = blocks["dense"].apply(variables, x, deterministic=True)
    for impl in ("fused", "fused_ln"):
        y = blocks[impl].apply(variables, x, deterministic=True)
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(y_dense), atol=5e-5, rtol=1e-5,
            err_msg=f"TransformerBlock {impl} != dense",
        )


def test_fused_ln_requires_aligned_dims():
    from lafs_cvpr2024_tpu.models.layers import FeedForward as FF

    ff = FF(dim=96, hidden_dim=H, mlp_impl="fused_ln")
    x = jnp.zeros((2, 4, 96))
    g = jnp.ones((96,))
    bt = jnp.zeros((96,))
    with pytest.raises(ValueError, match="128"):
        ff.init(jax.random.PRNGKey(0), x, ln=(g, bt))
