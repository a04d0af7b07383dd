"""LN-fused QKV projection kernel (attn_impl='lnqkv') vs the dense
LayerNorm + Dense reference path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lafs_cvpr2024_tpu.ops.fused_ln_linear import fused_ln_linear

D = 128


def _ref(x, g, bt, w, eps=1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    xn = xc * jax.lax.rsqrt(var + eps) * g + bt
    return xn @ w


def _params(key, t=48, o=160):
    # o=160 deliberately NOT a lane multiple — exercises the internal
    # zero-column padding (flagship to_qkv is 2112 = 16.5 x 128)
    ks = jax.random.split(key, 4)
    x = jax.random.normal(ks[0], (t, D), jnp.float32)
    g = 1.0 + 0.1 * jax.random.normal(ks[1], (D,), jnp.float32)
    bt = 0.05 * jax.random.normal(ks[2], (D,), jnp.float32)
    w = jax.random.normal(ks[3], (D, o), jnp.float32) * 0.05
    return x, g, bt, w


def test_forward_matches_reference():
    args = _params(jax.random.PRNGKey(0))
    y = fused_ln_linear(*args)
    assert y.shape == (48, 160)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(_ref(*args)), atol=3e-5, rtol=1e-5
    )


def test_forward_lane_aligned_output():
    args = _params(jax.random.PRNGKey(1), o=256)
    np.testing.assert_allclose(
        np.asarray(fused_ln_linear(*args)), np.asarray(_ref(*args)),
        atol=3e-5, rtol=1e-5,
    )


def test_forward_batched_leading_dims():
    x, g, bt, w = _params(jax.random.PRNGKey(2), t=36)
    x3 = x.reshape(3, 12, D)
    y = fused_ln_linear(x3, g, bt, w)
    assert y.shape == (3, 12, 160)
    np.testing.assert_allclose(
        np.asarray(y.reshape(36, 160)), np.asarray(_ref(x, g, bt, w)),
        atol=3e-5, rtol=1e-5,
    )


def test_grads_match_reference():
    args = _params(jax.random.PRNGKey(3))

    def loss_fused(a):
        return jnp.sum(fused_ln_linear(*a) ** 2)

    def loss_ref(a):
        return jnp.sum(_ref(*a) ** 2)

    gf = jax.grad(loss_fused)(args)
    gr = jax.grad(loss_ref)(args)
    for a, b, name in zip(gf, gr, ["x", "g", "bt", "w"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=7e-4, rtol=7e-4,
            err_msg=f"grad mismatch for {name}",
        )


def test_unaligned_dim_raises():
    x = jnp.zeros((4, 96))
    with pytest.raises(ValueError, match="128"):
        fused_ln_linear(x, jnp.ones((96,)), jnp.zeros((96,)),
                        jnp.zeros((96, 64)))


def test_transformer_block_lnqkv_loads_dense_params():
    """attn_impl='lnqkv' holds norm1 under nn.LayerNorm's names and to_qkv
    under nn.Dense's — one param tree, identical eval outputs. dim_head=40
    makes inner*3 = 240 (NOT a lane multiple) to exercise the padding."""
    from lafs_cvpr2024_tpu.models.layers import TransformerBlock

    x = jax.random.normal(jax.random.PRNGKey(30), (2, 12, D))
    mk = lambda impl: TransformerBlock(
        dim=D, heads=3, dim_head=40, mlp_dim=256, dropout=0.1,
        attn_impl=impl,
    )
    variables = mk("einsum").init(jax.random.PRNGKey(0), x)
    vi = mk("lnqkv").init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(vi) == jax.tree_util.tree_structure(
        variables
    )
    y_dense = mk("einsum").apply(variables, x, deterministic=True)
    y = mk("lnqkv").apply(variables, x, deterministic=True)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(y_dense), atol=5e-5, rtol=1e-5,
        err_msg="TransformerBlock lnqkv != einsum",
    )


def test_transformer_block_lnqkv_unaligned_dim_falls_back():
    """dim not a 128 multiple: the block applies nn.LayerNorm itself and
    attention runs the plain Dense projection (same tree as einsum)."""
    from lafs_cvpr2024_tpu.models.layers import TransformerBlock

    x = jax.random.normal(jax.random.PRNGKey(31), (2, 8, 96))
    mk = lambda impl: TransformerBlock(
        dim=96, heads=2, dim_head=32, mlp_dim=192, attn_impl=impl,
    )
    variables = mk("einsum").init(jax.random.PRNGKey(0), x)
    y_dense = mk("einsum").apply(variables, x, deterministic=True)
    y = mk("lnqkv").apply(variables, x, deterministic=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_dense), atol=1e-6)


def test_lnqkv_grads_through_block_match_einsum():
    from lafs_cvpr2024_tpu.models.layers import TransformerBlock

    x = jax.random.normal(jax.random.PRNGKey(32), (2, 12, D))
    mk = lambda impl: TransformerBlock(
        dim=D, heads=2, dim_head=64, mlp_dim=256, attn_impl=impl,
    )
    variables = mk("einsum").init(jax.random.PRNGKey(0), x)

    def loss(impl, v):
        return jnp.sum(mk(impl).apply(v, x, deterministic=True) ** 2)

    ge = jax.grad(lambda v: loss("einsum", v))(variables)
    gl = jax.grad(lambda v: loss("lnqkv", v))(variables)
    flat_e = jax.tree_util.tree_leaves_with_path(ge)
    flat_l = jax.tree_util.tree_leaves_with_path(gl)
    for (pe, ae), (plq, al) in zip(flat_e, flat_l):
        assert pe == plq
        np.testing.assert_allclose(
            np.asarray(al), np.asarray(ae), atol=1e-3, rtol=1e-3,
            err_msg=f"block grad mismatch at {jax.tree_util.keystr(pe)}",
        )
