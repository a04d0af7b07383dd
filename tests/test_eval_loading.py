"""Architecture inference from checkpoint trees (eval/loading.py).

Every eval/serving CLI builds its model through ``load_eval_model``; these
tests pin the inference rules: round-trip on inferable fields, override
precedence, ambiguity errors, and the orbax/.pth loading paths.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lafs_cvpr2024_tpu.eval.loading import (
    infer_partfvit_config,
    load_eval_model,
)
from lafs_cvpr2024_tpu.models.partfvit import PartFViT, PartFViTConfig

INFERABLE = (
    "dim", "depth", "heads", "dim_head", "mlp_dim", "num_patches",
    "patch_size", "with_land", "stn_mode", "use_global_token", "simmim",
)


def _params(cfg):
    model = PartFViT(cfg)
    v = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.image_size, cfg.image_size, 3)),
    )
    return v["params"]


@pytest.mark.parametrize(
    "cfg",
    [
        # production-shaped (dim_head=64 is the inferable default), small stn
        PartFViTConfig(dim=128, depth=2, heads=2, dim_head=64, mlp_dim=256,
                       num_patches=16, image_size=32, stn_mode="small",
                       loss_type="None", num_classes=0),
        # landmark stem large + global token
        PartFViTConfig(dim=64, depth=1, heads=1, dim_head=64, mlp_dim=128,
                       num_patches=16, image_size=32, stn_mode="large",
                       use_global_token=True, loss_type="None",
                       num_classes=0),
        # SSL-style: no landmark branch, simmim mask token
        PartFViTConfig(dim=64, depth=2, heads=1, dim_head=64, mlp_dim=128,
                       num_patches=16, image_size=32, with_land=False,
                       simmim=True, loss_type="None", num_classes=0),
    ],
)
def test_infer_round_trip(cfg):
    inferred = infer_partfvit_config(_params(cfg))
    for name in INFERABLE:
        if name == "stn_mode" and not cfg.with_land:
            continue  # stem absent from the tree; default applies
        assert getattr(inferred, name) == getattr(cfg, name), name
    assert inferred.loss_type == "None" and inferred.num_classes == 0


def test_infer_nondefault_head_width_needs_a_hint():
    """inner=32 is not divisible by the default 64-wide heads: inference
    must refuse loudly, and either --heads or --dim-head resolves it."""
    cfg = PartFViTConfig(dim=32, depth=1, heads=2, dim_head=16, mlp_dim=64,
                         num_patches=16, image_size=32, stn_mode="small",
                         loss_type="None", num_classes=0)
    params = _params(cfg)
    with pytest.raises(ValueError, match="head"):
        infer_partfvit_config(params)
    assert infer_partfvit_config(params, dim_head=16).heads == 2
    assert infer_partfvit_config(params, heads=2).dim_head == 16
    with pytest.raises(ValueError, match="!="):
        infer_partfvit_config(params, heads=2, dim_head=64)


def test_infer_overrides_win_and_unknown_keys_raise():
    cfg = PartFViTConfig(dim=64, depth=2, heads=1, dim_head=64, mlp_dim=128,
                         num_patches=16, image_size=32, stn_mode="small",
                         loss_type="None", num_classes=0)
    params = _params(cfg)
    forced = infer_partfvit_config(params, depth=1, image_size=48,
                                   pool="mean")
    assert forced.depth == 1          # explicit flag beats the tree
    assert forced.image_size == 48    # non-inferable, passed through
    assert forced.pool == "mean"
    with pytest.raises(TypeError, match="unknown"):
        infer_partfvit_config(params, bogus=3)


def test_infer_rejects_foreign_tree():
    with pytest.raises(ValueError, match="cls_token"):
        infer_partfvit_config({"something": np.zeros((2, 2))})


def test_load_eval_model_orbax_train_payload(tmp_path):
    """orbax path: infer from a train-CLI payload (TrainState + margin
    head) and apply without any init."""
    from lafs_cvpr2024_tpu.ops.mixup import MixupConfig
    from lafs_cvpr2024_tpu.train.checkpoint import save_checkpoint
    from lafs_cvpr2024_tpu.train.supervised import (
        SupervisedConfig,
        create_state,
    )

    cfg = SupervisedConfig(
        model=PartFViTConfig(
            image_size=32, dim=64, depth=1, heads=1, dim_head=64,
            mlp_dim=128, num_patches=16, num_classes=4, with_land=True,
            stn_mode="small",
        ),
        mixup=MixupConfig(num_classes=4),
        shard_classifier=False,
    )
    state = create_state(cfg, jax.random.PRNGKey(0))
    ckpt = tmp_path / "ckpt"
    save_checkpoint(str(ckpt), {"state": state}, step=3)

    logs = []
    loaded = load_eval_model(str(ckpt), {"image_size": 32}, log=logs.append)
    assert loaded.step == 3
    assert loaded.cfg.depth == 1 and loaded.cfg.dim == 64
    assert loaded.cfg.stn_mode == "small"
    emb = loaded.model.apply(
        loaded.variables, jnp.zeros((2, 32, 32, 3)), train=False
    )
    assert emb.shape == (2, 64) and bool(jnp.isfinite(emb).all())
    assert any("architecture" in m for m in logs)


def test_load_eval_model_pth(tmp_path):
    """.pth path: the torch importer's tree drives the same inference."""
    torch = pytest.importorskip("torch")

    cfg = PartFViTConfig(dim=64, depth=1, heads=1, dim_head=64, mlp_dim=128,
                         num_patches=16, image_size=32, with_land=False,
                         loss_type="None", num_classes=0)
    params = _params(cfg)

    # build a torch-dialect state dict from the flax tree (transformer
    # naming as the importer expects, kernels transposed)
    sd = {
        "cls_token": torch.from_numpy(np.asarray(params["cls_token"])),
        "pos_embedding": torch.from_numpy(
            np.asarray(params["pos_embedding"])
        ),
        "patch_to_embedding.weight": torch.from_numpy(
            np.asarray(params["patch_to_embedding"]["kernel"]).T.copy()
        ),
        "patch_to_embedding.bias": torch.from_numpy(
            np.asarray(params["patch_to_embedding"]["bias"])
        ),
        "mlp_head.0.weight": torch.from_numpy(
            np.asarray(params["mlp_head"]["scale"])
        ),
        "mlp_head.0.bias": torch.from_numpy(
            np.asarray(params["mlp_head"]["bias"])
        ),
    }
    blk = params["transformer"]["layers_0"]
    prefix = "transformer.layers.0"
    sd.update({
        f"{prefix}.0.fn.fn.to_qkv.weight": torch.from_numpy(
            np.asarray(blk["attn"]["to_qkv"]["kernel"]).T.copy()
        ),
        f"{prefix}.0.fn.fn.to_out.0.weight": torch.from_numpy(
            np.asarray(blk["attn"]["to_out"]["kernel"]).T.copy()
        ),
        f"{prefix}.0.fn.fn.to_out.0.bias": torch.from_numpy(
            np.asarray(blk["attn"]["to_out"]["bias"])
        ),
        f"{prefix}.0.fn.norm.weight": torch.from_numpy(
            np.asarray(blk["norm1"]["scale"])
        ),
        f"{prefix}.0.fn.norm.bias": torch.from_numpy(
            np.asarray(blk["norm1"]["bias"])
        ),
        f"{prefix}.1.fn.norm.weight": torch.from_numpy(
            np.asarray(blk["norm2"]["scale"])
        ),
        f"{prefix}.1.fn.norm.bias": torch.from_numpy(
            np.asarray(blk["norm2"]["bias"])
        ),
        f"{prefix}.1.fn.fn.net.0.weight": torch.from_numpy(
            np.asarray(blk["mlp"]["fc1"]["kernel"]).T.copy()
        ),
        f"{prefix}.1.fn.fn.net.0.bias": torch.from_numpy(
            np.asarray(blk["mlp"]["fc1"]["bias"])
        ),
        f"{prefix}.1.fn.fn.net.3.weight": torch.from_numpy(
            np.asarray(blk["mlp"]["fc2"]["kernel"]).T.copy()
        ),
        f"{prefix}.1.fn.fn.net.3.bias": torch.from_numpy(
            np.asarray(blk["mlp"]["fc2"]["bias"])
        ),
    })
    pth = tmp_path / "model.pth"
    torch.save(sd, str(pth))

    loaded = load_eval_model(str(pth), {"image_size": 32}, log=lambda m: None)
    assert loaded.step is None
    assert loaded.cfg.dim == 64 and loaded.cfg.depth == 1
    assert loaded.cfg.with_land is False
    # imported weights actually landed: apply matches the source params
    want = PartFViT(cfg).apply(
        {"params": params}, jnp.ones((1, 32, 32, 3)) * 0.5, train=False
    )
    got = loaded.model.apply(
        loaded.variables, jnp.ones((1, 32, 32, 3)) * 0.5, train=False
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_infer_standcoord_override():
    """use_standcoord is NOT inferable (tree identical to with_land=False):
    the explicit override must flip the forward to the grid-mosaic path,
    and passing it against a landmark checkpoint fails loudly at apply."""
    cfg = PartFViTConfig(dim=64, depth=1, heads=1, dim_head=64, mlp_dim=128,
                         num_patches=16, image_size=32, with_land=False,
                         use_standcoord=True, loss_type="None",
                         num_classes=0)
    params = _params(cfg)
    plain = infer_partfvit_config(params)
    assert plain.use_standcoord is False  # indistinguishable by design
    forced = infer_partfvit_config(params, use_standcoord=True,
                                   image_size=32)
    assert forced.use_standcoord is True and forced.with_land is False
    # the two forwards genuinely differ on the same weights
    x = jnp.linspace(0, 1, 2 * 32 * 32 * 3).reshape(2, 32, 32, 3)
    e_grid = PartFViT(forced).apply({"params": params}, x, train=False)
    e_plain = PartFViT(plain).apply({"params": params}, x, train=False)
    assert not np.allclose(np.asarray(e_grid), np.asarray(e_plain))

    land_params = _params(
        PartFViTConfig(dim=64, depth=1, heads=1, dim_head=64, mlp_dim=128,
                       num_patches=16, image_size=32, stn_mode="small",
                       loss_type="None", num_classes=0)
    )
    bad = infer_partfvit_config(land_params, use_standcoord=True,
                                image_size=32)
    with pytest.raises(ValueError, match="mutually exclusive"):
        PartFViT(bad).init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))


def test_load_eval_model_simmim_payload(tmp_path):
    """A SimMIM train checkpoint (bare 4-field SimMIMTrainState) restores
    to its ENCODER backbone: the decoder is pretraining-only, matching the
    reference's export of only the encoder from its SimMIM stage
    (train_largescale.py:198-315)."""
    from lafs_cvpr2024_tpu.train.checkpoint import save_checkpoint
    from lafs_cvpr2024_tpu.train.simmim import (
        SimMIMConfig,
        create_simmim_state,
    )

    cfg = SimMIMConfig(
        model=PartFViTConfig(
            image_size=32, dim=64, depth=1, heads=1, dim_head=64,
            mlp_dim=128, num_patches=16, with_land=False, simmim=True,
            loss_type="None", num_classes=0,
        ),
    )
    state = create_simmim_state(cfg, jax.random.PRNGKey(0))
    assert set(state.params) == {"backbone", "decoder"}
    ckpt = tmp_path / "ckpt"
    save_checkpoint(str(ckpt), state, step=2)

    loaded = load_eval_model(str(ckpt), {"image_size": 32},
                             log=lambda m: None)
    assert loaded.step == 2
    assert loaded.cfg.simmim is True          # mask_token in the backbone
    assert loaded.cfg.with_land is False
    emb = loaded.model.apply(
        loaded.variables, jnp.zeros((2, 32, 32, 3)), train=False
    )
    assert emb.shape == (2, 64) and bool(jnp.isfinite(emb).all())

# ---------------------------------------------------------------------------
# backbone-family inference: every SSL --arch teacher must be evaluable
# ---------------------------------------------------------------------------

def _overlap_cfg():
    return PartFViTConfig(
        image_size=48, dim=32, depth=1, heads=2, dim_head=16, mlp_dim=64,
        patch_size=8, num_patches=36, with_land=False, loss_type="None",
        num_classes=0,
    )


def test_tree_family_all_archs():
    """tree_family on real init trees of all four families; in particular
    the overlap/partfvit ambiguity: OverlapViT shares every top-level PARAM
    name with PartFViT(with_land=False) — only the BatchNorm head's running
    stats tell them apart, so params-only classification must say partfvit
    (SSL flagship checkpoints!) and stats must flip it to overlap."""
    from lafs_cvpr2024_tpu.eval.loading import tree_family
    from lafs_cvpr2024_tpu.models import MobileDINO, OverlapViT
    from lafs_cvpr2024_tpu.models.dino_vit import VisionTransformer

    land = _params(
        PartFViTConfig(dim=64, depth=1, heads=1, dim_head=64, mlp_dim=128,
                       num_patches=16, image_size=32, stn_mode="small",
                       loss_type="None", num_classes=0)
    )
    assert tree_family(land) == "partfvit"

    ssl = _params(
        PartFViTConfig(dim=64, depth=1, heads=1, dim_head=64, mlp_dim=128,
                       num_patches=16, image_size=32, with_land=False,
                       loss_type="None", num_classes=0)
    )
    assert tree_family(ssl) == "partfvit"
    assert tree_family(ssl, batch_stats=None) == "partfvit"

    vit = VisionTransformer(img_size=32, patch_size=16, embed_dim=192,
                            depth=1, num_heads=3)
    v = vit.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    assert tree_family(v["params"]) == "dino_vit"

    md = MobileDINO(embd_dim=32, mode="small")
    v = md.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    assert tree_family(v["params"], v["batch_stats"]) == "mobile_dino"

    ov = OverlapViT(_overlap_cfg(), ac_patch_size=12, pad=4)
    v = ov.init(jax.random.PRNGKey(0), jnp.zeros((1, 48, 48, 3)))
    assert tree_family(v["params"], v["batch_stats"]) == "overlap"
    # params alone (no BN stats) must fall back to partfvit, never overlap
    assert tree_family(v["params"]) == "partfvit"


def test_load_eval_model_dino_vit_orbax(tmp_path):
    """A dino_vit tree restores to a working VisionTransformer: geometry
    (dim/depth/patch/img) read from the shapes, heads from the published
    vit_* widths; non-published widths demand --heads loudly."""
    from lafs_cvpr2024_tpu.models.dino_vit import VisionTransformer
    from lafs_cvpr2024_tpu.train.checkpoint import save_checkpoint

    vit = VisionTransformer(img_size=32, patch_size=16, embed_dim=192,
                            depth=2, num_heads=3)
    v = jax.jit(vit.init)(jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 3)))
    ckpt = tmp_path / "ckpt"
    save_checkpoint(str(ckpt), dict(v), step=0)

    loaded = load_eval_model(str(ckpt), log=lambda m: None)
    assert loaded.family == "dino_vit"
    m = loaded.model
    assert (m.embed_dim, m.depth, m.patch_size, m.img_size,
            m.num_heads) == (192, 2, 16, 32, 3)
    x = jnp.linspace(-1, 1, 2 * 32 * 32 * 3).reshape(2, 32, 32, 3)
    got = loaded.model.apply(loaded.variables, x, train=False)
    want = vit.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)

    # width 64 is not a published vit_* width: head count is unrecoverable
    tiny = VisionTransformer(img_size=32, patch_size=16, embed_dim=64,
                             depth=1, num_heads=2)
    v64 = tiny.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    ckpt2 = tmp_path / "ckpt64"
    save_checkpoint(str(ckpt2), dict(v64), step=0)
    with pytest.raises(ValueError, match="--heads"):
        load_eval_model(str(ckpt2), log=lambda m: None)
    forced = load_eval_model(str(ckpt2), {"heads": 2}, log=lambda m: None)
    assert forced.model.num_heads == 2


def test_load_eval_model_mobile_dino_orbax(tmp_path):
    from lafs_cvpr2024_tpu.models import MobileDINO
    from lafs_cvpr2024_tpu.train.checkpoint import save_checkpoint

    md = MobileDINO(embd_dim=32, mode="small")
    v = jax.jit(md.init)(jax.random.PRNGKey(2), jnp.zeros((1, 64, 64, 3)))
    ckpt = tmp_path / "ckpt"
    save_checkpoint(str(ckpt), dict(v), step=0)

    loaded = load_eval_model(str(ckpt), log=lambda m: None)
    assert loaded.family == "mobile_dino"
    assert loaded.model.embd_dim == 32 and loaded.model.mode == "small"
    x = jnp.linspace(-1, 1, 64 * 64 * 3).reshape(1, 64, 64, 3)
    got = loaded.model.apply(loaded.variables, x, train=False)
    want = md.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_load_eval_model_overlap_orbax(tmp_path):
    """Overlap checkpoints carry BN running stats — family flips to overlap
    and the restored forward (Unfold soft-split + BN head in eval mode)
    matches the source model."""
    from lafs_cvpr2024_tpu.models import OverlapViT
    from lafs_cvpr2024_tpu.train.checkpoint import save_checkpoint

    src_cfg = _overlap_cfg()
    ov = OverlapViT(src_cfg, ac_patch_size=12, pad=4)
    v = jax.jit(ov.init)(jax.random.PRNGKey(3), jnp.zeros((1, 48, 48, 3)))
    ckpt = tmp_path / "ckpt"
    save_checkpoint(str(ckpt), dict(v), step=0)

    # inner=32 is not divisible by the default 64-wide heads: the overlap
    # path must refuse with the same actionable error as partfvit (never
    # build a heads=0 model)
    with pytest.raises(ValueError, match="--heads"):
        load_eval_model(str(ckpt), log=lambda m: None)

    loaded = load_eval_model(
        str(ckpt), {"heads": 2, "image_size": 48}, log=lambda m: None
    )
    assert loaded.family == "overlap"
    assert loaded.model.ac_patch_size == 12
    assert loaded.cfg.patch_size == 8      # the unfold stride default
    assert loaded.cfg.num_patches == 36
    x = jnp.linspace(-1, 1, 48 * 48 * 3).reshape(1, 48, 48, 3)
    got = loaded.model.apply(loaded.variables, x, train=False)
    want = ov.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_load_eval_model_dino_vit_pth(tmp_path):
    """The torch DINO dialect ("blocks.N...", vision_transformer.py) routes
    to import_dino_vit_state_dict and lands on the same weights."""
    torch = pytest.importorskip("torch")

    from lafs_cvpr2024_tpu.models.dino_vit import VisionTransformer

    vit = VisionTransformer(img_size=32, patch_size=16, embed_dim=192,
                            depth=1, num_heads=3)
    v = vit.init(jax.random.PRNGKey(4), jnp.zeros((1, 32, 32, 3)))
    p = v["params"]

    def t(a):
        return torch.from_numpy(np.asarray(a).copy())

    blk = p["block_0"]
    sd = {
        "cls_token": t(p["cls_token"]),
        "pos_embed": t(p["pos_embed"]),
        "patch_embed.proj.weight": t(
            np.asarray(p["patch_embed"]["kernel"]).transpose(3, 2, 0, 1)
        ),
        "patch_embed.proj.bias": t(p["patch_embed"]["bias"]),
        "norm.weight": t(p["norm"]["scale"]),
        "norm.bias": t(p["norm"]["bias"]),
        "blocks.0.norm1.weight": t(blk["norm1"]["scale"]),
        "blocks.0.norm1.bias": t(blk["norm1"]["bias"]),
        "blocks.0.attn.qkv.weight": t(np.asarray(blk["attn"]["qkv"]["kernel"]).T),
        "blocks.0.attn.qkv.bias": t(blk["attn"]["qkv"]["bias"]),
        "blocks.0.attn.proj.weight": t(np.asarray(blk["attn"]["proj"]["kernel"]).T),
        "blocks.0.attn.proj.bias": t(blk["attn"]["proj"]["bias"]),
        "blocks.0.norm2.weight": t(blk["norm2"]["scale"]),
        "blocks.0.norm2.bias": t(blk["norm2"]["bias"]),
        "blocks.0.mlp.fc1.weight": t(np.asarray(blk["fc1"]["kernel"]).T),
        "blocks.0.mlp.fc1.bias": t(blk["fc1"]["bias"]),
        "blocks.0.mlp.fc2.weight": t(np.asarray(blk["fc2"]["kernel"]).T),
        "blocks.0.mlp.fc2.bias": t(blk["fc2"]["bias"]),
    }
    pth = tmp_path / "dino.pth"
    torch.save(sd, str(pth))

    loaded = load_eval_model(str(pth), log=lambda m: None)
    assert loaded.family == "dino_vit" and loaded.step is None
    x = jnp.linspace(-1, 1, 32 * 32 * 3).reshape(1, 32, 32, 3)
    got = loaded.model.apply(loaded.variables, x, train=False)
    want = vit.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)

def test_resolve_input_scale():
    """'auto' picks by family: EVERY vanilla-DINO family (vit_*, overlap,
    mobile_dino — their only training path is the ImageNet-normalized
    DataAugmentationDINO) resolves to imagenet; partfvit/iresnet keep the
    reference eval convention. An explicit mismatch warns loudly (it
    silently degrades accuracy and leaves no other trace)."""
    from lafs_cvpr2024_tpu.eval.loading import resolve_input_scale

    logs = []
    assert resolve_input_scale("auto", "partfvit", logs.append) == "half"
    assert resolve_input_scale("auto", "iresnet", logs.append) == "half"
    for fam in ("dino_vit", "overlap", "mobile_dino"):
        assert resolve_input_scale("auto", fam, logs.append) == "imagenet"
    assert all("auto" in m for m in logs)

    logs.clear()
    assert resolve_input_scale("unit", "partfvit", logs.append) == "unit"
    assert not logs  # explicit + consistent: silent
    for fam in ("dino_vit", "overlap", "mobile_dino"):
        logs.clear()
        assert resolve_input_scale("half", fam, logs.append) == "half"
        assert logs and "WARNING" in logs[0]  # explicit mismatch: loud

def test_load_eval_model_iresnet_orbax(tmp_path):
    """iResNet trees are fully inferable: stage block counts from the
    layer{s}_{b} names, head variant from fc presence, features-BN scale
    from the param itself."""
    from lafs_cvpr2024_tpu.eval.loading import tree_family
    from lafs_cvpr2024_tpu.models.iresnet import iresnet18
    from lafs_cvpr2024_tpu.train.checkpoint import save_checkpoint

    m = iresnet18(num_features=48)
    v = jax.jit(m.init)(jax.random.PRNGKey(5), jnp.zeros((1, 32, 32, 3)))
    assert tree_family(v["params"], v["batch_stats"]) == "iresnet"
    ckpt = tmp_path / "ckpt"
    save_checkpoint(str(ckpt), dict(v), step=0)

    loaded = load_eval_model(str(ckpt), log=lambda m_: None)
    assert loaded.family == "iresnet"
    assert loaded.model.layers == (2, 2, 2, 2)
    assert loaded.model.num_features == 48
    assert loaded.model.avg_pool is False
    assert loaded.model.features_scale is False  # canonical frozen scale
    x = jnp.linspace(-1, 1, 2 * 32 * 32 * 3).reshape(2, 32, 32, 3)
    got = loaded.model.apply(loaded.variables, x, train=False)
    want = m.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)

    # the avg-pool factory variant: no fc, trainable features scale
    from lafs_cvpr2024_tpu.models.iresnet import IResNet

    ma = IResNet(layers=(2, 2, 2, 2), avg_pool=True)
    va = jax.jit(ma.init)(jax.random.PRNGKey(6), jnp.zeros((1, 32, 32, 3)))
    ckpt2 = tmp_path / "ckpt_avg"
    save_checkpoint(str(ckpt2), dict(va), step=0)
    loaded2 = load_eval_model(str(ckpt2), log=lambda m_: None)
    assert loaded2.family == "iresnet"
    assert loaded2.model.avg_pool is True
    assert loaded2.model.features_scale is True
    got2 = loaded2.model.apply(loaded2.variables, x, train=False)
    want2 = ma.apply(va, x, train=False)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2), atol=1e-6)
