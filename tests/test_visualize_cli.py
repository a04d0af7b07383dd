"""Attention capture (Attention.sow) + the standalone visualization CLI.

Reference parity: per-layer ``attention_score`` storage (ViT_face.py:177)
feeding the rollout/overlay renderers (util/utils.py:730-988,1141-1251).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lafs_cvpr2024_tpu.models.partfvit import PartFViT, PartFViTConfig

TINY = dict(dim=64, depth=2, heads=2, dim_head=32, mlp_dim=128,
            num_patches=16, image_size=32, patch_size=8, stn_mode="small")


def _variables(cfg):
    model = PartFViT(cfg)
    return model, model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.image_size, cfg.image_size, 3)),
    )


def test_attention_probs_sown_only_when_requested():
    cfg = PartFViTConfig(**TINY, with_land=False, loss_type="None",
                         num_classes=0)
    model, variables = _variables(cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (3, 32, 32, 3)) - 0.5

    # plain apply: unchanged output type, no intermediates anywhere
    emb = model.apply(variables, x, train=False)
    assert emb.shape == (3, cfg.dim)

    out, muts = model.apply(
        variables, x, train=False, mutable=["intermediates"]
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(emb), atol=1e-6)
    layers = muts["intermediates"]["transformer"]
    n_tok = 16 + 1  # (32/8)^2 patches + CLS
    for i in range(cfg.depth):
        (probs,) = layers[f"layers_{i}"]["attn"]["attn_probs"]
        assert probs.shape == (3, cfg.heads, n_tok, n_tok)
        # rows are softmaxed
        np.testing.assert_allclose(
            np.asarray(probs).sum(-1), 1.0, atol=1e-5
        )


@pytest.mark.parametrize("with_land", [True, False])
def test_visualize_cli_end_to_end(tmp_path, with_land):
    from PIL import Image

    from lafs_cvpr2024_tpu.cli.visualize import main
    from lafs_cvpr2024_tpu.train.checkpoint import save_checkpoint

    cfg = PartFViTConfig(**TINY, with_land=with_land, loss_type="None",
                         num_classes=0)
    _, variables = _variables(cfg)
    ckpt = tmp_path / "ckpt"
    save_checkpoint(str(ckpt), dict(variables), step=0)

    img_dir = tmp_path / "faces"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        Image.fromarray(
            rng.integers(0, 255, (40, 40, 3), dtype=np.uint8), "RGB"
        ).save(img_dir / f"f{i}.png")

    out = tmp_path / "viz"
    # image_size is not inferable from the tree (documented in
    # eval/loading.py) — the 32px toy model must pass it explicitly
    written = main([
        "--checkpoint", str(ckpt), "--images", str(img_dir),
        "--out", str(out), "--num", "2", "--image-size", "32",
    ])
    expect = ["rollout", "perhead"] + (
        ["landmarks", "patches"] if with_land else []
    )
    for i in range(2):
        for style in expect:
            path = out / f"{style}_{i}.png"
            assert path.exists() and path.stat().st_size > 0, path
    assert len(written) == 2 * len(expect)
    # landmark-free models must not emit overlay files
    if not with_land:
        assert not (out / "landmarks_0.png").exists()

    # --input-scale unit is accepted and renders (train-convention ckpts)
    out2 = tmp_path / "viz_unit"
    written2 = main([
        "--checkpoint", str(ckpt), "--images", str(img_dir),
        "--out", str(out2), "--num", "1", "--image-size", "32",
        "--input-scale", "unit",
    ])
    assert len(written2) == len(expect)

    # out-of-range --layer: actionable error naming the depth, not an
    # IndexError after the model already ran
    with pytest.raises(SystemExit, match="depth=2"):
        main([
            "--checkpoint", str(ckpt), "--images", str(img_dir),
            "--out", str(out), "--image-size", "32", "--layer", "2",
        ])

def test_visualize_cli_dino_vit_family(tmp_path):
    """A vanilla --arch vit_* teacher visualizes its attention maps (the
    rollout/perhead styles); landmark styles are skipped (no landmarks)."""
    from PIL import Image

    from lafs_cvpr2024_tpu.cli.visualize import main
    from lafs_cvpr2024_tpu.models.dino_vit import VisionTransformer
    from lafs_cvpr2024_tpu.train.checkpoint import save_checkpoint

    vit = VisionTransformer(img_size=32, patch_size=16, embed_dim=192,
                            depth=2, num_heads=3)
    variables = vit.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    ckpt = tmp_path / "ckpt"
    save_checkpoint(str(ckpt), dict(variables), step=0)

    img_dir = tmp_path / "faces"
    img_dir.mkdir()
    rng = np.random.default_rng(1)
    Image.fromarray(
        rng.integers(0, 255, (40, 40, 3), dtype=np.uint8), "RGB"
    ).save(img_dir / "f0.png")

    out = tmp_path / "viz"
    written = main([
        "--checkpoint", str(ckpt), "--images", str(img_dir),
        "--out", str(out), "--num", "1", "--input-scale", "imagenet",
    ])
    for style in ("rollout", "perhead"):
        path = out / f"{style}_0.png"
        assert path.exists() and path.stat().st_size > 0, path
    assert not (out / "landmarks_0.png").exists()
    assert len(written) == 2

    with pytest.raises(SystemExit, match="depth=2"):
        main([
            "--checkpoint", str(ckpt), "--images", str(img_dir),
            "--out", str(out), "--layer", "2",
        ])


def test_visualize_cli_mobile_dino_refuses(tmp_path):
    """mobile_dino has no transformer: the CLI must refuse with an
    actionable message, not crash on a missing intermediates scope."""
    from PIL import Image

    from lafs_cvpr2024_tpu.cli.visualize import main
    from lafs_cvpr2024_tpu.models import MobileDINO
    from lafs_cvpr2024_tpu.train.checkpoint import save_checkpoint

    md = MobileDINO(embd_dim=32, mode="small")
    variables = md.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    ckpt = tmp_path / "ckpt"
    save_checkpoint(str(ckpt), dict(variables), step=0)

    img_dir = tmp_path / "faces"
    img_dir.mkdir()
    Image.fromarray(np.zeros((40, 40, 3), np.uint8), "RGB").save(
        img_dir / "f0.png"
    )
    with pytest.raises(SystemExit, match="no attention"):
        main([
            "--checkpoint", str(ckpt), "--images", str(img_dir),
            "--out", str(tmp_path / "viz"),
        ])
