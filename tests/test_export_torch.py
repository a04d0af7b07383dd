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
