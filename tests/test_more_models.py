"""Tests for the secondary model families: iResNet, DINO ViT, OverlapViT,
SimMIM mask-token path, GNN."""

import jax
import jax.numpy as jnp
import numpy as np

from lafs_cvpr2024_tpu.models import PartFViT, PartFViTConfig, OverlapViT
from lafs_cvpr2024_tpu.models.dino_vit import vit_tiny
from lafs_cvpr2024_tpu.models.gnn import GNN
from lafs_cvpr2024_tpu.models.iresnet import IResNet


def test_iresnet_forward_and_loss():
    m = IResNet(layers=(1, 1, 1, 1), num_features=64, with_loss=True, num_classes=8)
    x = jnp.zeros((2, 112, 112, 3))
    var = jax.jit(m.init)(jax.random.PRNGKey(0), x, jnp.zeros((2,), jnp.int32))
    logits, emb = m.apply(var, x, jnp.array([0, 1]))
    assert logits.shape == (2, 8) and emb.shape == (2, 64)
    emb_only = m.apply(var, x)
    assert emb_only.shape == (2, 64)
    # frozen BN1d scale: 'features' has no scale param
    assert "scale" not in var["params"]["features"]


def test_dino_vit_variable_resolution():
    m = vit_tiny(patch_size=16, img_size=64)
    var = jax.jit(m.init)(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    out64 = m.apply(var, jnp.zeros((1, 64, 64, 3)))
    out96 = m.apply(var, jnp.zeros((2, 96, 96, 3)))  # pos-embed interpolation
    assert out64.shape == (1, 192) and out96.shape == (2, 192)


def test_dino_vit_attention_and_intermediates():
    m = vit_tiny(patch_size=16, img_size=32)
    x = jnp.zeros((1, 32, 32, 3))
    var = jax.jit(m.init)(jax.random.PRNGKey(0), x)
    attn = m.apply(var, x, method=m.get_last_selfattention)
    assert attn.shape == (1, 3, 5, 5)  # 4 patches + CLS, 3 heads
    feats = m.apply(var, x, 2, method=m.get_intermediate_layers)
    assert len(feats) == 2 and feats[0].shape == (1, 5, 192)


def test_overlap_vit():
    cfg = PartFViTConfig(
        image_size=48, dim=32, depth=1, heads=2, dim_head=16, mlp_dim=64,
        patch_size=8, num_patches=36, num_classes=8, with_land=False,
    )
    m = OverlapViT(cfg, ac_patch_size=12, pad=4)
    x = jnp.zeros((2, 48, 48, 3))
    var = jax.jit(m.init)(jax.random.PRNGKey(0), x, jnp.zeros((2,), jnp.int32))
    emb = m.apply(var, x)
    assert emb.shape == (2, 32)
    logits, _ = m.apply(var, x, jnp.array([0, 1]))
    assert logits.shape == (2, 8)


def test_simmim_mask_token():
    cfg = PartFViTConfig(
        image_size=48, dim=32, depth=1, heads=2, dim_head=16, mlp_dim=64,
        num_patches=36, with_land=False, loss_type="None", num_classes=0,
        simmim=True,
    )
    m = PartFViT(cfg)
    toks = jnp.ones((2, 36, 192))
    var = jax.jit(m.init)(jax.random.PRNGKey(0), toks)
    assert "mask_token" in var["params"]
    emb_nomask = m.apply(var, toks)
    mask = jnp.zeros((2, 36)).at[:, :18].set(1.0)
    emb_mask = m.apply(var, toks, mask=mask)
    assert not np.allclose(np.asarray(emb_nomask), np.asarray(emb_mask))


def test_gnn():
    g = GNN(channels=16, depth=2)
    x = jnp.ones((2, 9, 16))
    var = jax.jit(g.init)(jax.random.PRNGKey(0), x)
    out, edge = g.apply(var, x)
    assert out.shape == (2, 9, 16)
    assert edge.shape == (2, 9, 9, 16)
    assert np.isfinite(np.asarray(out)).all()
    # train mode mutates BN batch stats
    (out_t, _), updates = g.apply(
        var, x, train=True, mutable=["batch_stats"]
    )
    assert "batch_stats" in updates


def test_arcface_margin_monotone_for_hard_samples():
    """insightface easy_margin=False guard: past θ > π − m the penalized
    target logit must keep DECREASING in θ (the naive cos(θ+m) turns
    increasing and would reward worse embeddings)."""
    import numpy as np

    from lafs_cvpr2024_tpu.models.heads import ArcFace

    m = ArcFace(in_features=4, out_features=3, s=1.0, m=0.5)
    w = jnp.eye(3, 4)  # class centers along axes
    thetas = np.linspace(0.05, np.pi - 0.05, 40)
    embs = jnp.stack(
        [jnp.array([np.cos(t), np.sin(t), 0.0, 0.0]) for t in thetas]
    )
    labels = jnp.zeros((len(thetas),), jnp.int32)
    logits = m.apply(
        {"params": {"weight": w}}, embs, labels
    )
    target = np.asarray(logits)[:, 0]
    assert np.all(np.diff(target) < 1e-6), "target logit not monotone in θ"


def test_with_land_and_standcoord_mutually_exclusive():
    from lafs_cvpr2024_tpu.models.partfvit import PartFViT, PartFViTConfig

    cfg = PartFViTConfig(
        image_size=48, dim=32, depth=1, heads=2, dim_head=16, mlp_dim=64,
        num_patches=36, with_land=True, use_standcoord=True,
        stn_mode="small",
    )
    import pytest

    with pytest.raises(ValueError, match="mutually exclusive"):
        PartFViT(cfg).init(
            jax.random.PRNGKey(0), jnp.zeros((1, 48, 48, 3))
        )
