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


def _sharded_equals_global(make_model, variables, args_builder, n_dev=4,
                           tol=5e-4, **apply_kw):
    """SyncBN completeness pin: a train-mode forward on a ``n_dev``-way
    data-sharded mesh (model built with ``axis_name='data'``) must equal
    the single-device global-batch forward (``axis_name=None``).

    Regression shape: a single un-synced ``nn.BatchNorm`` (one missing
    ``axis_name``) normalizes over per-device batch statistics and
    silently diverges — exactly how the iResNet ``features`` BN broke
    multi-device supervised training while every block BN synced.
    ``make_model(axis_name)`` must return the same architecture either
    way (identical param tree)."""
    from jax.sharding import Mesh, PartitionSpec as P

    global_args = args_builder()

    def fwd(model, v, *args):
        out = model.apply(v, *args, **apply_kw)
        while isinstance(out, tuple) and not hasattr(out, "shape"):
            out = out[0]  # drop mutated-collections dict / (logits, emb) aux
        return out

    ref = fwd(make_model(None), variables, *global_args)
    mesh = Mesh(np.array(jax.devices()[:n_dev]).reshape(n_dev), ("data",))
    sync_model = make_model("data")
    n_args = len(global_args)
    sharded = jax.shard_map(
        lambda v, *a: fwd(sync_model, v, *a),
        mesh=mesh, in_specs=(P(), *([P("data")] * n_args)),
        out_specs=P("data"), check_vma=False,
    )(variables, *global_args)
    np.testing.assert_allclose(
        np.asarray(sharded), np.asarray(ref), atol=tol, rtol=tol
    )


def test_iresnet_syncbn_forward_matches_global_batch():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (8, 32, 32, 3)).astype(np.float32))
    labels = jax.nn.one_hot(jnp.arange(8) % 4, 4)
    for avg in (False, True):
        def make(axis_name, avg=avg):
            return IResNet(layers=(1, 1, 1, 1),
                           num_features=16 if not avg else 512,
                           with_loss=True, num_classes=4, avg_pool=avg,
                           axis_name=axis_name)
        v = make(None).init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            x, jnp.zeros((8,), jnp.int32), train=False)
        _sharded_equals_global(
            make, v, lambda: (x, labels), train=True,
            mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(2)},
        )


def test_mobilenet_backbone_syncbn_forward_matches_global_batch():
    from lafs_cvpr2024_tpu.models.mobilenet import MobileNetV3Backbone

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(-1, 1, (8, 32, 32, 3)).astype(np.float32))

    def make(axis_name):
        return MobileNetV3Backbone("small", axis_name)

    v = make(None).init(jax.random.PRNGKey(0), x, False)
    _sharded_equals_global(make, v, lambda: (x,), train=True,
                           mutable=["batch_stats"])


def test_dino_head_bn_syncs_over_data_axis():
    from lafs_cvpr2024_tpu.models.heads import DINOHead

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(8, 24)).astype(np.float32))

    def make(axis_name):
        return DINOHead(in_dim=24, out_dim=32, hidden_dim=16,
                        bottleneck_dim=8, use_bn=True, axis_name=axis_name)

    v = make(None).init(jax.random.PRNGKey(0), x)
    _sharded_equals_global(make, v, lambda: (x,), deterministic=False,
                           mutable=["batch_stats"])


def test_gnn_bn_syncs_over_data_axis():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(8, 5, 6)).astype(np.float32))
    v = GNN(channels=6).init(jax.random.PRNGKey(0), x)

    from jax.sharding import Mesh, PartitionSpec as P

    (ref_x, ref_e), _ = GNN(channels=6).apply(
        v, x, train=True, mutable=["batch_stats"])
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(4), ("data",))
    m_sync = GNN(channels=6, axis_name="data")

    def fwd(variables, xs):
        (nx, ne), _ = m_sync.apply(variables, xs, train=True,
                                   mutable=["batch_stats"])
        return nx, ne

    sx, se = jax.shard_map(fwd, mesh=mesh, in_specs=(P(), P("data")),
                           out_specs=P("data"), check_vma=False)(v, x)
    np.testing.assert_allclose(np.asarray(sx), np.asarray(ref_x), atol=5e-4)
    np.testing.assert_allclose(np.asarray(se), np.asarray(ref_e), atol=5e-4)
