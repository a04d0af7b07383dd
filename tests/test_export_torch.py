"""Torch state_dict EXPORT interop (train/checkpoint.py exporters +
cli/export_torch): the reverse of the importers — a TPU-trained checkpoint
must load into the reference's torch classes with ``strict=True``.

Round-trips assert export∘import == identity per backbone family; the
reference-class strict-load golden lives in test_reference_parity.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lafs_cvpr2024_tpu.models import MobileDINO, OverlapViT
from lafs_cvpr2024_tpu.models.dino_vit import VisionTransformer
from lafs_cvpr2024_tpu.models.partfvit import PartFViT, PartFViTConfig
from lafs_cvpr2024_tpu.train.checkpoint import (
    export_dino_vit_state_dict,
    export_torch_state_dict,
    import_dino_vit_state_dict,
    import_torch_state_dict,
)


def _flat(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flat(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = np.asarray(v)
    return out


def _assert_trees_equal(a, b):
    fa, fb = _flat(a), _flat(b)
    assert set(fa) == set(fb), (
        sorted(set(fa) ^ set(fb))[:8]
    )
    for k in fa:
        np.testing.assert_allclose(fa[k], fb[k], atol=1e-6, err_msg=str(k))


def test_export_import_roundtrip_partfvit():
    cfg = PartFViTConfig(dim=64, depth=2, heads=2, dim_head=32, mlp_dim=128,
                         num_patches=16, image_size=32, stn_mode="small",
                         use_global_token=True, loss_type="CosFace",
                         num_classes=8)
    v = PartFViT(cfg).init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                           jnp.zeros((1,), jnp.int32))
    sd = export_torch_state_dict(v["params"], v.get("batch_stats"))
    imp = import_torch_state_dict(sd, strict=True)
    _assert_trees_equal(imp.params, v["params"])
    if v.get("batch_stats"):
        _assert_trees_equal(imp.stats, v["batch_stats"])


def test_export_import_roundtrip_dino_vit():
    vit = VisionTransformer(img_size=32, patch_size=16, embed_dim=64,
                            depth=2, num_heads=2, num_classes=5)
    v = vit.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 3)))
    sd = export_dino_vit_state_dict(v["params"])
    # the conv kernel really crossed NHWC↔OIHW (not a no-op layout)
    assert sd["patch_embed.proj.weight"].shape == (64, 3, 16, 16)
    imp = import_dino_vit_state_dict(sd, strict=True)
    _assert_trees_equal(imp.params, v["params"])


def test_export_import_roundtrip_mobile_dino():
    md = MobileDINO(embd_dim=32, mode="small")
    v = md.init(jax.random.PRNGKey(2), jnp.zeros((1, 64, 64, 3)))
    sd = export_torch_state_dict(v["params"], v["batch_stats"])
    assert "output_layer.weight" in sd  # top-level, NOT landmark-scoped
    imp = import_torch_state_dict(sd, strict=True)
    # the partfvit importer nests the stem under the landmark scope; the
    # eval loader unwraps it (eval/loading.py) — compare against that form
    _assert_trees_equal(imp.params["landmark"], v["params"])
    _assert_trees_equal(imp.stats["landmark"], v["batch_stats"])


def test_export_import_roundtrip_overlap_bn_head():
    cfg = PartFViTConfig(image_size=48, dim=32, depth=1, heads=2,
                         dim_head=16, mlp_dim=64, patch_size=8,
                         num_patches=36, with_land=False, loss_type="None",
                         num_classes=0)
    m = OverlapViT(cfg, ac_patch_size=12, pad=4)
    v = m.init(jax.random.PRNGKey(3), jnp.zeros((1, 48, 48, 3)))
    sd = export_torch_state_dict(v["params"], v["batch_stats"])
    assert "mlp_head.0.running_mean" in sd  # BN head exports its stats
    assert "mlp_head.0.num_batches_tracked" in sd
    imp = import_torch_state_dict(sd, strict=True)
    _assert_trees_equal(imp.params, v["params"])
    _assert_trees_equal(imp.stats, v["batch_stats"])


def test_export_torch_cli_dino_vit(tmp_path):
    """cli/export_torch routes a dino_vit orbax checkpoint to the DINO
    dialect; reloading the .pth through load_eval_model lands on the same
    weights (numeric, via apply)."""
    pytest.importorskip("torch")

    from lafs_cvpr2024_tpu.cli.export_torch import main as export_main
    from lafs_cvpr2024_tpu.eval.loading import load_eval_model
    from lafs_cvpr2024_tpu.train.checkpoint import save_checkpoint

    vit = VisionTransformer(img_size=32, patch_size=16, embed_dim=192,
                            depth=1, num_heads=3)
    v = jax.jit(vit.init)(jax.random.PRNGKey(4), jnp.zeros((1, 32, 32, 3)))
    ckpt = tmp_path / "ckpt"
    save_checkpoint(str(ckpt), dict(v), step=0)

    pth = tmp_path / "teacher.pth"
    export_main(["--checkpoint", str(ckpt), "--out", str(pth)])
    loaded = load_eval_model(str(pth), log=lambda m: None)
    assert loaded.family == "dino_vit"
    x = jnp.linspace(-1, 1, 32 * 32 * 3).reshape(1, 32, 32, 3)
    got = loaded.model.apply(loaded.variables, x, train=False)
    want = vit.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("avg_pool", [False, True])
def test_export_import_roundtrip_iresnet(avg_pool):
    from lafs_cvpr2024_tpu.models.iresnet import IResNet
    from lafs_cvpr2024_tpu.train.checkpoint import (
        export_iresnet_state_dict,
        import_iresnet_state_dict,
    )

    m = IResNet(layers=(2, 2, 2, 2), num_features=48, avg_pool=avg_pool)
    v = m.init(jax.random.PRNGKey(5), jnp.zeros((1, 32, 32, 3)))
    sd = export_iresnet_state_dict(v["params"], v["batch_stats"])
    assert "layer1.0.bn1.weight" in sd
    assert "features.weight" in sd  # emitted even for the frozen-scale head
    assert "conv1.num_batches_tracked" not in sd  # conv has no stats
    imp = import_iresnet_state_dict(sd, strict=True)
    _assert_trees_equal(imp.params, v["params"])
    _assert_trees_equal(imp.stats, v["batch_stats"])


def test_import_dino_vit_rejects_projection_head():
    """A FULL DINO teacher's MultiCropWrapper head (head.mlp.N /
    head.last_layer.weight_{g,v}) must stay unmapped — not silently
    collapse into one kernel/bias pair — so strict mode raises."""
    from lafs_cvpr2024_tpu.train.checkpoint import import_dino_vit_state_dict

    vit = VisionTransformer(img_size=32, patch_size=16, embed_dim=64,
                            depth=1, num_heads=2)
    v = vit.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    sd = export_dino_vit_state_dict(v["params"])
    sd.update({
        "head.mlp.0.weight": np.zeros((8, 64), np.float32),
        "head.mlp.0.bias": np.zeros((8,), np.float32),
        "head.last_layer.weight_v": np.zeros((16, 8), np.float32),
        "head.last_layer.weight_g": np.zeros((16, 1), np.float32),
    })
    with pytest.raises(ValueError, match="unmapped"):
        import_dino_vit_state_dict(sd, strict=True)
    # non-strict: the head keys are skipped, the backbone still lands
    imp = import_dino_vit_state_dict(sd, strict=False)
    assert {k for k in imp.skipped} == {
        "head.mlp.0.weight", "head.mlp.0.bias",
        "head.last_layer.weight_v", "head.last_layer.weight_g",
    }
    _assert_trees_equal(imp.params, v["params"])


def test_export_torch_cli_iresnet(tmp_path):
    """cli/export_torch routes an iresnet orbax checkpoint to the
    insightface dialect; the .pth re-imports to identical weights."""
    pytest.importorskip("torch")

    from lafs_cvpr2024_tpu.cli.export_torch import main as export_main
    from lafs_cvpr2024_tpu.eval.loading import load_eval_model
    from lafs_cvpr2024_tpu.models.iresnet import iresnet18
    from lafs_cvpr2024_tpu.train.checkpoint import save_checkpoint

    m = iresnet18(num_features=48)
    v = jax.jit(m.init)(jax.random.PRNGKey(6), jnp.zeros((1, 32, 32, 3)))
    ckpt = tmp_path / "ckpt"
    save_checkpoint(str(ckpt), dict(v), step=0)

    pth = tmp_path / "iresnet.pth"
    export_main(["--checkpoint", str(ckpt), "--out", str(pth)])
    loaded = load_eval_model(str(pth), log=lambda s: None)
    assert loaded.family == "iresnet" and loaded.input_size == 32
    x = jnp.linspace(-1, 1, 32 * 32 * 3).reshape(1, 32, 32, 3)
    got = loaded.model.apply(loaded.variables, x, train=False)
    want = m.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
