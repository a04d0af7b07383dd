"""Fused short-sequence attention kernel vs the einsum reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lafs_cvpr2024_tpu.ops.fused_attention import fused_attention


def _reference(q, k, v, scale):
    logits = jnp.einsum("bhid,bhjd->bhij", q, k).astype(jnp.float32) * scale
    attn = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhij,bhjd->bhid", attn, v.astype(jnp.float32))


@pytest.mark.parametrize("s", [37, 128, 197])
def test_fused_attention_forward_matches(s):
    rng = np.random.default_rng(0)
    b, h, d = 2, 3, 64
    q, k, v = (
        jnp.asarray(rng.standard_normal((b, h, s, d)).astype(np.float32))
        for _ in range(3)
    )
    scale = 768 ** -0.5
    out = jax.jit(lambda q, k, v: fused_attention(q, k, v, scale))(q, k, v)
    ref = _reference(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_attention_grads_match():
    rng = np.random.default_rng(1)
    b, h, s, d = 2, 2, 197, 64
    q, k, v = (
        jnp.asarray(rng.standard_normal((b, h, s, d)).astype(np.float32))
        for _ in range(3)
    )
    co = jnp.asarray(rng.standard_normal((b, h, s, d)).astype(np.float32))
    scale = 768 ** -0.5

    def loss_fused(q, k, v):
        return jnp.sum(fused_attention(q, k, v, scale) * co)

    def loss_ref(q, k, v):
        return jnp.sum(_reference(q, k, v, scale) * co)

    gf = jax.jit(jax.grad(loss_fused, argnums=(0, 1, 2)))(q, k, v)
    gr = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(q, k, v)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=3e-4)


def test_fused_attention_bf16_close():
    rng = np.random.default_rng(2)
    b, h, s, d = 2, 2, 37, 64
    mk = lambda: jnp.asarray(
        rng.standard_normal((b, h, s, d)).astype(np.float32)
    ).astype(jnp.bfloat16)
    q, k, v = mk(), mk(), mk()
    scale = 768 ** -0.5
    out = np.asarray(
        jax.jit(lambda q, k, v: fused_attention(q, k, v, scale))(q, k, v)
    ).astype(np.float32)
    ref = np.asarray(
        _reference(
            q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32),
            scale,
        )
    )
    # bf16 inputs: tolerate bf16 resolution
    assert np.max(np.abs(out - ref)) < 0.02


def test_attention_module_fused_impl_matches_einsum():
    """The flax Attention layer with attn_impl='fused' must agree with the
    einsum path on identical weights — at a sequence length INSIDE the
    128..512 kernel gate (layers.py), so the kernel branch (heads_first
    layout, model-dim scale, output transpose) actually executes. Short
    sequences (37) deliberately fall back to einsum and would make this
    test vacuous."""
    from lafs_cvpr2024_tpu.models.layers import Attention

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 197, 64)).astype(np.float32))
    a_ein = Attention(64, heads=2, dim_head=32, attn_impl="einsum")
    a_fus = Attention(64, heads=2, dim_head=32, attn_impl="fused")
    variables = a_ein.init(jax.random.PRNGKey(0), x)
    y_ein = jax.jit(lambda v, x: a_ein.apply(v, x))(variables, x)
    y_fus = jax.jit(lambda v, x: a_fus.apply(v, x))(variables, x)
    np.testing.assert_allclose(
        np.asarray(y_fus), np.asarray(y_ein), atol=2e-5
    )
    # sanity that the gate actually routed to the kernel: short sequences
    # must hit the einsum fallback without error either way
    xs = jnp.asarray(rng.standard_normal((2, 37, 64)).astype(np.float32))
    jax.jit(lambda v, x: a_fus.apply(v, x))(variables, xs)


@pytest.mark.parametrize("impl", ["packed_av", "packed_qk"])
@pytest.mark.parametrize("heads", [2, 3])
def test_packed_geometry_impls_match_einsum(impl, heads):
    """The d_head-geometry experiment packings (docs/PERF.md §round-3:
    head pairs packed into 128 output lanes / a 128-wide contraction) are
    exact reformulations — identical math to the einsum path, including an
    ODD head count (the reference's 11-head geometry), which exercises the
    zero-head padding."""
    from lafs_cvpr2024_tpu.models.layers import Attention

    rng = np.random.default_rng(4)
    dim = 32 * heads
    x = jnp.asarray(rng.standard_normal((2, 37, dim)).astype(np.float32))
    a_ein = Attention(dim, heads=heads, dim_head=32, attn_impl="einsum")
    a_pkd = Attention(dim, heads=heads, dim_head=32, attn_impl=impl)
    variables = a_ein.init(jax.random.PRNGKey(0), x)
    y_ein = jax.jit(lambda v, x: a_ein.apply(v, x))(variables, x)
    y_pkd = jax.jit(lambda v, x: a_pkd.apply(v, x))(variables, x)
    np.testing.assert_allclose(
        np.asarray(y_pkd), np.asarray(y_ein), atol=2e-5
    )
