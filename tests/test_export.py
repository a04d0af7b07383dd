"""StableHLO export round-trip."""

import jax
import jax.numpy as jnp
import numpy as np

from lafs_cvpr2024_tpu.models import PartFViT, PartFViTConfig
from lafs_cvpr2024_tpu.utils.export import export_embedding_fn, load_exported


def test_export_roundtrip(tmp_path):
    cfg = PartFViTConfig(
        image_size=48, dim=32, depth=1, heads=2, dim_head=16, mlp_dim=64,
        num_patches=36, with_land=False, use_standcoord=True,
        loss_type="None", num_classes=0,
    )
    model = PartFViT(cfg)
    x = jnp.ones((1, 48, 48, 3))
    var = jax.jit(model.init)(jax.random.PRNGKey(0), x)

    path = str(tmp_path / "model.stablehlo")
    blob = export_embedding_fn(
        lambda v, imgs: model.apply(v, imgs), var, (1, 48, 48, 3), path
    )
    assert len(blob) > 1000

    fn = load_exported(path)
    out = np.asarray(fn(x))
    ref = np.asarray(model.apply(var, x))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_export_stablehlo_cli(tmp_path):
    """The export CLI: family-aware load → serialize → built-in self-check,
    for both the raw-float form and the baked-uint8-input-scale form (and
    on a non-partfvit family)."""
    from lafs_cvpr2024_tpu.cli.export_stablehlo import main
    from lafs_cvpr2024_tpu.models.dino_vit import VisionTransformer
    from lafs_cvpr2024_tpu.train.checkpoint import save_checkpoint

    cfg = PartFViTConfig(
        image_size=32, dim=32, depth=1, heads=2, dim_head=16, mlp_dim=64,
        num_patches=16, with_land=False, loss_type="None", num_classes=0,
    )
    v = PartFViT(cfg).init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    ckpt = tmp_path / "ckpt"
    save_checkpoint(str(ckpt), dict(v), step=0)

    out = main(["--checkpoint", str(ckpt),
                "--out", str(tmp_path / "m.stablehlo"),
                "--image-size", "32", "--batch-size", "2",
                "--dim-head", "16"])
    fn = load_exported(out)
    x = np.linspace(-1, 1, 2 * 32 * 32 * 3, dtype=np.float32).reshape(
        2, 32, 32, 3)
    got = np.asarray(fn(x))
    want = np.asarray(PartFViT(cfg).apply(v, jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    # baked input scale on a dino_vit checkpoint: uint8 in, auto→imagenet
    vit = VisionTransformer(img_size=32, patch_size=16, embed_dim=192,
                            depth=1, num_heads=3)
    vv = vit.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 3)))
    ckpt2 = tmp_path / "ckpt_vit"
    save_checkpoint(str(ckpt2), dict(vv), step=0)
    out2 = main(["--checkpoint", str(ckpt2),
                 "--out", str(tmp_path / "vit.stablehlo"),
                 "--bake-input-scale"])
    fn2 = load_exported(out2)
    x8 = np.random.default_rng(2).integers(0, 256, (1, 32, 32, 3), np.uint8)
    got2 = np.asarray(fn2(x8))
    from lafs_cvpr2024_tpu.ops.augment_device import scale_uint8

    want2 = np.asarray(vit.apply(vv, jnp.asarray(scale_uint8(x8, "imagenet")),
                                 train=False))
    np.testing.assert_allclose(got2, want2, rtol=2e-5, atol=2e-5)
