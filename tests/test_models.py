"""Shape/semantics tests for the model stack."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lafs_cvpr2024_tpu.models import (
    CosFace,
    DINOHead,
    LandmarkProvider,
    MobileNetV3Backbone,
    PartFViT,
    PartFViTConfig,
    cosface_logits,
)

TINY = PartFViTConfig(
    dim=64, depth=2, heads=2, dim_head=16, mlp_dim=128, num_classes=10,
    num_patches=196,
)


def test_mobilenet_backbone_shape():
    m = MobileNetV3Backbone("large")
    x = jnp.zeros((2, 112, 112, 3))
    var = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(var, x)
    assert y.shape == (2, 4, 4, 160)


def test_partfvit_with_land_forward():
    m = PartFViT(TINY)
    x = jnp.zeros((2, 112, 112, 3))
    labels = jnp.array([1, 3])
    var = m.init(jax.random.PRNGKey(0), x, labels)
    logits, theta = m.apply(var, x, labels)
    assert logits.shape == (2, 10)
    assert theta.shape == (2, 196, 2)
    emb = m.apply(var, x)
    assert emb.shape == (2, 64)


def test_partfvit_token_input():
    m = PartFViT(TINY)
    toks = jnp.zeros((2, 36, 192))
    var = m.init(jax.random.PRNGKey(0), jnp.zeros((2, 112, 112, 3)))
    emb = m.apply(var, toks)
    assert emb.shape == (2, 64)


def test_partfvit_standcoord():
    cfg = PartFViTConfig(
        dim=64, depth=1, heads=2, dim_head=16, mlp_dim=128, num_classes=10,
        with_land=False, use_standcoord=True,
    )
    m = PartFViT(cfg)
    x = jnp.ones((1, 112, 112, 3))
    var = m.init(jax.random.PRNGKey(0), x)
    emb = m.apply(var, x)
    assert emb.shape == (1, 64)


def test_cosface_margin_semantics():
    w = np.eye(4, 8).astype(np.float32)  # class c center = e_c
    emb = np.eye(4, 8).astype(np.float32) * 3.0  # emb i aligned with class i
    labels = jnp.arange(4)
    logits = np.asarray(cosface_logits(jnp.asarray(emb), jnp.asarray(w), labels))
    # target logit = s*(1-m) = 64*0.6 = 38.4 ; off-target = 0
    np.testing.assert_allclose(np.diag(logits), 64 * 0.6, rtol=1e-5)
    off = logits[~np.eye(4, dtype=bool)]
    np.testing.assert_allclose(off, 0.0, atol=1e-4)


def test_cosface_soft_labels():
    w = np.eye(4, 8).astype(np.float32)
    emb = np.eye(4, 8).astype(np.float32)
    soft = jnp.full((4, 4), 0.25)
    logits = np.asarray(cosface_logits(jnp.asarray(emb), jnp.asarray(w), soft))
    # margin scaled by soft label: diag = s*(1 - m*0.25)
    np.testing.assert_allclose(np.diag(logits), 64 * (1 - 0.4 * 0.25), rtol=1e-5)


def test_dino_head_weight_norm():
    h = DINOHead(in_dim=32, out_dim=100, hidden_dim=64, bottleneck_dim=16)
    x = jnp.ones((2, 32))
    var = h.init(jax.random.PRNGKey(0), x)
    y = h.apply(var, x)
    assert y.shape == (2, 100)
    # rows of effective weight are unit-norm (g=1): logits bounded by |x|=1
    assert np.abs(np.asarray(y)).max() <= 1.0 + 1e-5


def test_landmark_provider():
    p = LandmarkProvider(num_landmarks=196)
    x = jnp.zeros((2, 112, 112, 3))
    var = p.init(jax.random.PRNGKey(0), x)
    theta, toks = p.apply(var, x)
    assert theta.shape == (2, 196, 2) and toks.shape == (2, 196, 192)
    theta, toks = p.apply(
        var, x, x_aug=x, rng=jax.random.PRNGKey(1), jitter_std=5.0, ran_sample=36
    )
    assert theta.shape == (2, 36, 2) and toks.shape == (2, 36, 192)


def test_remat_policy_equivalence():
    """remat trades backward HBM for recompute FLOPs — it must NOT change
    the math: forward outputs and parameter gradients are identical (up to
    fp tolerance) across remat_policy none/dots/all, train and eval, with
    identical dropout draws."""
    import jax

    def build(policy):
        cfg = PartFViTConfig(
            dim=32, depth=2, heads=2, dim_head=16, mlp_dim=64,
            num_patches=16, image_size=32, with_land=False,
            loss_type="None", num_classes=0, remat_policy=policy,
        )
        return PartFViT(cfg)

    tokens = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 192))
    var = build("none").init(jax.random.PRNGKey(0), tokens)

    def loss(params, model, train):
        rngs = {"dropout": jax.random.PRNGKey(2)} if train else None
        emb = model.apply({"params": params}, tokens, train=train, rngs=rngs)
        return jnp.sum(emb ** 2)

    for train in (False, True):
        base, gbase = jax.value_and_grad(loss)(var["params"], build("none"),
                                               train)
        for policy in ("dots", "all"):
            v, g = jax.value_and_grad(loss)(var["params"], build(policy),
                                            train)
            np.testing.assert_allclose(float(v), float(base), rtol=1e-5,
                                       err_msg=f"{policy} train={train}")
            jax.tree_util.tree_map(
                lambda a, b: np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
                ),
                g, gbase,
            )


def test_partfvit_global_token_call_options():
    """glo_diff / random_prob / ran_sample / x_noaug call options
    (ViT_face.py:421-518): glo_diff keeps the FIRST global crop's landmarks
    clean and only jitters+resamples the second; x_noaug predicts landmarks
    on the clean view while gathering patches from the augmented one."""
    import functools

    cfg = PartFViTConfig(
        image_size=48, dim=32, depth=1, heads=2, dim_head=16, mlp_dim=64,
        num_patches=36, num_classes=0, loss_type="None", with_land=True,
        stn_mode="small", use_global_token=True,
    )
    m = PartFViT(cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (4, 48, 48, 3)), jnp.float32)
    xa = jnp.asarray(rng.uniform(-1, 1, (4, 48, 48, 3)), jnp.float32)
    v = jax.jit(m.init)(jax.random.PRNGKey(0), x)

    @functools.partial(jax.jit, static_argnames=("rp", "rs", "gd", "rt"))
    def fwd(v, x, xn=None, rp=False, rs=False, gd=False, rt=False, key=None):
        return m.apply(
            v, x, x_noaug=xn, random_prob=rp, ran_sample=rs, glo_diff=gd,
            train=False, return_tokens=rt,
            rngs={"augment": key} if key is not None else None,
        )

    # x_noaug changes the landmark/global-token branch input
    e_noaug = fwd(v, xa, x)
    e_plain = fwd(v, x)
    assert e_noaug.shape == (4, 32)
    assert float(jnp.abs(e_noaug - e_plain).max()) > 1e-6

    # glo_diff: first half clean, second half jittered+resampled
    k = jax.random.PRNGKey(3)
    _, _, theta = fwd(v, x, rp=True, gd=True, rt=True, key=k)
    _, _, theta_clean = fwd(v, x, rt=True)
    assert np.allclose(np.asarray(theta[:2]), np.asarray(theta_clean[:2]))
    assert not np.allclose(np.asarray(theta[2:]), np.asarray(theta_clean[2:]))

    # ran_sample keeps 36 of num_patches (here num_patches==36: shape holds)
    _, toks, _ = fwd(v, x, rp=True, rs=True, rt=True, key=k)
    assert toks.shape[1] == 36

    # invalid combinations refuse loudly
    with pytest.raises(ValueError):
        fwd(v, x, rp=True, rs=True, gd=True, key=k)
    with pytest.raises(ValueError):
        fwd(v, jnp.zeros((4, 36, 192)), gd=True)
    with pytest.raises(ValueError):  # odd batch cannot be two stacked crops
        fwd(v, x[:3], rp=True, gd=True, key=k)
