"""Aux component tests: degradations, retrieval utils, visualization,
attribute dataset, token/two-model verification variants, global-token model."""

import io
import os

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from lafs_cvpr2024_tpu.data import (
    AttributeFaceDataset,
    random_down_upsample,
    random_jpeg_compression,
)
from lafs_cvpr2024_tpu.data.recordio import IRHeader, IndexedRecordIOWriter, pack
from lafs_cvpr2024_tpu.eval.verification import evaluate_token, evaluate_two
from lafs_cvpr2024_tpu.models import PartFViT, PartFViTConfig
from lafs_cvpr2024_tpu.utils.retrieval import PCA, compute_ap, compute_map
from lafs_cvpr2024_tpu.utils.visualize import (
    attention_rollout,
    gen_roc_plot,
    plot_landmarks,
)


def test_degradations():
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 255, (112, 112, 3), np.uint8)
    out = random_jpeg_compression(arr)
    assert out.shape == arr.shape and out.dtype == np.uint8
    out2 = random_down_upsample(arr, p=1.0)
    assert out2.shape == arr.shape


def test_pca_whitening():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((500, 16)) @ np.diag(np.linspace(1, 10, 16))
    cov = np.cov(x.T)
    pca = PCA(dim=8, whit=0.5)
    pca.train_pca(cov)
    y = pca.apply(x)
    assert y.shape == (500, 8)
    # whitened components have ~unit variance
    np.testing.assert_allclose(y.var(axis=0), 1.0, rtol=0.35)


def test_compute_map():
    # db of 4 items; query 0's positives are items 0,1
    ranks = np.array([[0], [1], [2], [3]])
    gnd = [{"ok": [0, 1], "junk": []}]
    assert compute_map(ranks, gnd) == 1.0
    ranks_bad = np.array([[3], [2], [1], [0]])
    assert compute_map(ranks_bad, gnd) < 1.0
    assert compute_ap(np.array([0, 1]), 2) == 1.0


def test_visualization_outputs():
    img = np.zeros((112, 112, 3), np.float32)
    lands = np.random.default_rng(0).uniform(0, 111, (196, 2))
    png = plot_landmarks(img, lands)
    assert png[:4] == b"\x89PNG"
    roc = gen_roc_plot(np.linspace(0, 1, 10), np.linspace(0, 1, 10))
    assert len(roc) > 100


def test_attention_rollout():
    rng = np.random.default_rng(2)
    attns = [jax.nn.softmax(jnp.asarray(rng.standard_normal((2, 3, 5, 5))), axis=-1)]
    attns = [np.asarray(a) for a in attns] * 2
    out = attention_rollout(attns)
    assert out.shape == (2, 4)
    assert np.isfinite(out).all()


def test_attribute_dataset(tmp_path):
    rng = np.random.default_rng(3)
    rec = str(tmp_path / "a.rec")
    w = IndexedRecordIOWriter(str(tmp_path / "a.idx"), rec)
    for i in range(4):
        buf = io.BytesIO()
        Image.fromarray(rng.integers(0, 255, (32, 32, 3), np.uint8)).save(
            buf, format="JPEG"
        )
        w.write_idx(i, pack(IRHeader(0, float(i), i, 0), buf.getvalue()))
    w.close()
    csv_path = str(tmp_path / "attrs.csv")
    with open(csv_path, "w") as f:
        f.write("idx,a1,a2\n")
        for i in range(3):  # one record without attrs → excluded
            f.write(f"{i},{i * 0.5},{1 - i * 0.5}\n")
    ds = AttributeFaceDataset(rec, csv_path)
    assert len(ds) == 3
    img, (label, attrs) = ds[1]
    assert attrs.shape == (2,)
    assert label == 1.0
    if ds.supports_batch_fetch:
        # the native fast path must NOT drop the attribute labels (it is
        # documented equivalent to [ds[i] for i in indices])
        imgs, (labels, battrs) = ds.fetch_batch([0, 2])
        assert imgs.shape[0] == 2 and battrs.shape == (2, 2)
        np.testing.assert_allclose(battrs[1], ds.attrs[ds.seq[2]])
        np.testing.assert_allclose(labels, [0.0, 2.0])


def test_evaluate_token_and_two():
    rng = np.random.default_rng(4)
    n_pairs = 60
    emb = np.zeros((n_pairs * 2, 8))
    issame = []
    for i in range(n_pairs):
        same = i % 2 == 0
        base = rng.standard_normal(8)
        emb[2 * i] = base
        emb[2 * i + 1] = base + rng.standard_normal(8) * (0.05 if same else 2.0)
        issame.append(same)
    _, _, acc, _ = evaluate_token(emb, issame)
    assert acc.mean() > 0.9
    _, _, acc2, _ = evaluate_two(
        emb / np.linalg.norm(emb, axis=1, keepdims=True),
        emb / np.linalg.norm(emb, axis=1, keepdims=True),
        issame,
    )
    assert acc2.mean() > 0.9


def test_global_token_variant():
    cfg = PartFViTConfig(
        image_size=48, dim=32, depth=1, heads=2, dim_head=16, mlp_dim=64,
        num_patches=36, num_classes=8, with_land=True, stn_mode="small",
        use_global_token=True,
    )
    m = PartFViT(cfg)
    x = jnp.zeros((2, 48, 48, 3))
    var = jax.jit(m.init)(jax.random.PRNGKey(0), x, jnp.zeros((2,), jnp.int32))
    assert "global_token" in var["params"]
    logits, theta = m.apply(var, x, jnp.array([0, 1]))
    assert logits.shape == (2, 8)


def test_patch_grid_and_heatmap(tmp_path):
    from lafs_cvpr2024_tpu.utils.visualize import attention_heatmap, save_patch_grid

    rng = np.random.default_rng(7)
    patches = rng.uniform(-1, 1, (9, 8, 8, 3)).astype(np.float32)
    out = str(tmp_path / "grid.png")
    save_patch_grid(patches, out)
    assert os.path.getsize(out) > 0

    img = rng.uniform(-1, 1, (48, 48, 3)).astype(np.float32)
    rollout = rng.uniform(0, 1, 36)
    png = attention_heatmap(img, rollout)
    assert png[:4] == b"\x89PNG"


def test_kshot_keys_restrict(tmp_path):
    from helpers import make_identity_rec

    from lafs_cvpr2024_tpu.data import FaceRecordDataset

    rec = make_identity_rec(tmp_path, n_ids=3, per_id=5, size=16, name="k",
                            seed=8)

    ds = FaceRecordDataset(rec)
    assert len(ds) == 15
    keys2 = ds.kshot_keys(2, seed=0)
    assert len(keys2) == 6
    ds.restrict_to_keys(keys2)
    assert len(ds) == 6
    labels = sorted(ds[i][1] for i in range(6))
    assert labels == [0.0, 0.0, 1.0, 1.0, 2.0, 2.0]


def test_attention_rollout_variants():
    """Landmark-splatted heatmap + per-head CLS maps (utils.py:730-988)."""
    import numpy as np

    from lafs_cvpr2024_tpu.utils.visualize import (
        attention_heatmap_landmark,
        per_head_cls_attention,
    )

    rng = np.random.default_rng(0)
    nh, n = 3, 17  # 16 tokens + CLS
    attn = rng.uniform(0, 1, (nh, n, n)).astype(np.float32)
    attn /= attn.sum(-1, keepdims=True)
    maps = per_head_cls_attention(attn, out_size=32)
    assert maps.shape == (nh, 32, 32)
    # nearest-upsample preserves per-token values
    assert np.isclose(maps[0, 0, 0], attn[0, 0, 1])

    img = rng.uniform(-1, 1, (32, 32, 3)).astype(np.float32)
    lands = rng.uniform(0, 31, (16, 2)).astype(np.float32)
    png = attention_heatmap_landmark(img, attn[0, 0, 1:], lands, patch_size=8)
    assert isinstance(png, bytes) and png[:4] == b"\x89PNG"


def test_shipped_config_presets_validate():
    """Every configs/*.toml preset must parse against its CLI parser —
    apply_toml_defaults raises on any key that is not a real flag, so this
    catches preset/CLI drift."""
    import pathlib
    import sys
    from unittest import mock

    repo = pathlib.Path(__file__).resolve().parent.parent
    presets = sorted((repo / "configs").glob("*.toml"))
    assert presets, "no shipped presets found"
    from lafs_cvpr2024_tpu.cli import train_ssl, train_supervised

    for preset in presets:
        import tomllib

        with open(preset, "rb") as f:
            table = next(iter(tomllib.load(f)))
        from lafs_cvpr2024_tpu.cli import train_simmim

        mod, required = {
            "ssl": (train_ssl, ["--data-path", "d", "--output-dir", "o"]),
            "train": (
                train_supervised,
                ["--data-root", "d", "--work-path", "o"],
            ),
            "simmim": (
                train_simmim, ["--data-path", "d", "--output-dir", "o"]
            ),
        }[table]
        argv = ["prog", "--config", str(preset), *required]
        with mock.patch.object(sys, "argv", argv):
            args = mod.get_args()
        assert args.config == str(preset)
