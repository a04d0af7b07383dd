"""Coverage for per-process sampling (DistributedSampler semantics), mesh
helpers, and the contrastive pair sampler."""

import io

import jax
import numpy as np
from PIL import Image

from lafs_cvpr2024_tpu.data import ContrastivePairSampler, EpochSampler, FaceRecordDataset
from lafs_cvpr2024_tpu.data.recordio import IRHeader, IndexedRecordIOWriter, pack
from lafs_cvpr2024_tpu.parallel.mesh import (
    classifier_sharding,
    create_mesh,
    is_main_process,
    replicated,
    shard_batch,
)


def test_epoch_sampler_process_shards_partition_everything():
    n, procs, bs = 103, 4, 4
    samplers = [
        EpochSampler(n, bs, process_index=i, process_count=procs, drop_last=False)
        for i in range(procs)
    ]
    all_idx = np.concatenate([s.epoch_indices(3) for s in samplers])
    # every sample covered (with wraparound padding allowed)
    assert set(all_idx.tolist()) == set(range(n))
    # shards are disjoint modulo the pad
    sizes = [len(s.epoch_indices(3)) for s in samplers]
    assert len(set(sizes)) == 1  # equal shard sizes


def test_epoch_sampler_drop_last():
    s = EpochSampler(10, 4, process_index=0, process_count=1)
    assert len(s.epoch_indices(0)) == 8
    assert s.steps_per_epoch() == 2


def test_shard_batch_and_shardings():
    mesh = create_mesh(model=2)
    x = np.zeros((8, 4), np.float32)
    arr = shard_batch(mesh, x)
    assert arr.shape == (8, 4)
    assert classifier_sharding(mesh).spec[0] == "model"
    assert replicated(mesh).spec == ()
    assert is_main_process()


def _identity_rec(tmp_path, n_ids=3, per=4):
    from helpers import make_identity_rec

    return make_identity_rec(tmp_path, n_ids=n_ids, per_id=per, size=16,
                             name="c")


def test_contrastive_pair_sampler(tmp_path):
    ds = FaceRecordDataset(_identity_rec(tmp_path))
    sampler = ContrastivePairSampler(ds, pos_prob=1.0, seed=0)
    (img1, img2), same = sampler.sample_pair(0)
    assert same == 1
    assert img1.shape == img2.shape == (16, 16, 3)
    sampler_neg = ContrastivePairSampler(ds, pos_prob=0.0, seed=0)
    results = [sampler_neg.sample_pair(i)[1] for i in range(6)]
    assert 0 in results  # negatives do appear


def test_toml_config_defaults(tmp_path):
    import argparse

    from lafs_cvpr2024_tpu.utils.config import apply_toml_defaults

    cfg = tmp_path / "run.toml"
    cfg.write_text("[train]\nbatch-size = 7\nlr = 0.5\n")
    p = argparse.ArgumentParser()
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--lr", type=float, default=0.1)
    args = apply_toml_defaults(p, ["--config", str(cfg)])
    assert args.batch_size == 7 and args.lr == 0.5
    # explicit flags beat config
    p2 = argparse.ArgumentParser()
    p2.add_argument("--batch-size", type=int, default=1)
    p2.add_argument("--lr", type=float, default=0.1)
    args2 = apply_toml_defaults(p2, ["--config", str(cfg), "--batch-size", "3"])
    assert args2.batch_size == 3 and args2.lr == 0.5
    # typo detection
    bad = tmp_path / "bad.toml"
    bad.write_text("[train]\nbatchsz = 2\n")
    p3 = argparse.ArgumentParser()
    p3.add_argument("--batch-size", type=int, default=1)
    import pytest

    with pytest.raises(ValueError):
        apply_toml_defaults(p3, ["--config", str(bad)])


def test_fold_in_shard_decorrelates_data_shards():
    """Each data shard must draw DIFFERENT random numbers from the same
    replicated key (the reference's independent per-DDP-worker RNG)."""
    from jax.sharding import PartitionSpec as P

    from lafs_cvpr2024_tpu.parallel.mesh import fold_in_shard

    mesh = create_mesh(model=1)
    n = mesh.shape["data"]

    def draw(key):
        key = fold_in_shard(key, "data")
        return jax.random.uniform(key, (1, 4))

    out = jax.jit(
        jax.shard_map(draw, mesh=mesh, in_specs=P(), out_specs=P("data"))
    )(jax.random.PRNGKey(0))
    rows = np.asarray(out)
    assert rows.shape == (n, 4)
    assert len({r.tobytes() for r in rows}) == n, "shards drew identical RNG"


def test_pipeline_mesh_routing_produces_global_batch(tmp_path):
    """DataPipeline(mesh=...) must yield a global jax.Array sharded over
    'data' (single-process: equivalent to device_put with that sharding)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from lafs_cvpr2024_tpu.data import DataPipeline

    ds = FaceRecordDataset(_identity_rec(tmp_path))
    mesh = create_mesh(model=1)
    sampler = EpochSampler(len(ds), 8, seed=0)
    pipe = DataPipeline(ds, sampler, num_workers=2, mesh=mesh)
    batches = list(pipe.epoch(0))
    assert batches, "no batches produced"
    imgs, labels = batches[0]
    assert isinstance(imgs, jax.Array) and imgs.shape[0] == 8
    assert imgs.sharding.is_equivalent_to(
        NamedSharding(mesh, P("data")), imgs.ndim
    )
    assert labels.shape == (8,)


def test_contrastive_pair_sampler_subset_no_self_pairs(tmp_path):
    """Subsetted dataset: partners must come from the live subset with
    correct same/diff labels (never silent anchor self-pairing)."""
    ds = FaceRecordDataset(_identity_rec(tmp_path, n_ids=4, per=6))
    # keep every other image only
    ds.restrict_to_keys(ds.seq[::2])
    sampler = ContrastivePairSampler(ds, pos_prob=0.5, seed=1)
    subset = set(ds.seq)
    pos_seen = neg_seen = 0
    for i in range(len(ds)):
        ident = sampler._key_to_ident[ds.seq[i]]
        for _ in range(4):
            # capture the partner position so the label can be verified
            # against the ACTUAL drawn identity (the sibling labels test's
            # probe), and the partner proven inside the live subset
            captured = {}
            orig = sampler._draw_position

            def capture(fn, avoid=-1):
                p = orig(fn, avoid=avoid)
                captured["pos"] = p
                return p

            sampler._draw_position = capture
            (img1, img2), same = sampler.sample_pair(i)
            sampler._draw_position = orig
            other_key = ds.seq[captured["pos"]]
            assert other_key in subset
            assert other_key != ds.seq[i], "anchor self-pair"
            assert same == int(
                sampler._key_to_ident[other_key] == ident
            )
            pos_seen += same
            neg_seen += 1 - same
    assert pos_seen and neg_seen
    # internal draw helper never escapes the subset
    for _ in range(50):
        pos = sampler._draw_position(lambda: sampler._rng.randrange(1, 25))
        assert ds.seq[pos] in subset


def test_contrastive_pair_labels_match_identities(tmp_path):
    """same==1 iff both images come from the same identity range."""
    ds = FaceRecordDataset(_identity_rec(tmp_path, n_ids=3, per=4))
    sampler = ContrastivePairSampler(ds, pos_prob=0.5, seed=3)
    for i in range(len(ds)):
        key = ds.seq[i]
        ident = sampler._key_to_ident[key]
        # monkey-probe: wrap _draw_position to capture the partner position
        captured = {}
        orig = sampler._draw_position

        def capture(fn, avoid=-1):
            p = orig(fn, avoid=avoid)
            captured["pos"] = p
            return p

        sampler._draw_position = capture
        (_, _), same = sampler.sample_pair(i)
        sampler._draw_position = orig
        other_ident = sampler._key_to_ident[ds.seq[captured["pos"]]]
        assert same == int(other_ident == ident)


def test_face_folder_dataset(tmp_path):
    from PIL import Image as PILImage

    from lafs_cvpr2024_tpu.data import FaceFolderDataset

    root = tmp_path / "folder"
    rng = np.random.default_rng(0)
    for c in range(3):
        d = root / f"id_{c}"
        d.mkdir(parents=True)
        for j in range(4):
            PILImage.fromarray(
                rng.integers(0, 255, (20, 20, 3), np.uint8)
            ).save(str(d / f"{j}.jpg"))
    ds = FaceFolderDataset(str(root))
    assert len(ds) == 12 and ds.num_identities == 3
    img, label = ds[5]
    assert img.shape == (20, 20, 3) and label == 1.0
    assert ds.id2range == {0: (0, 4), 1: (4, 8), 2: (8, 12)}
    # JSON cache written and reused (scan results identical)
    assert (root / "Webface_list.json").exists()
    ds2 = FaceFolderDataset(str(root))
    assert ds2.samples == ds.samples
    # k-shot restriction
    ds.restrict_to_keys(ds.kshot_keys(2, seed=0))
    assert len(ds) == 6
    labels = sorted(ds[i][1] for i in range(len(ds)))
    assert labels == [0.0, 0.0, 1.0, 1.0, 2.0, 2.0]


def test_epoch_sampler_tiny_dataset_equal_shards():
    """n < process_count: wraparound padding must TILE (np.resize), not
    short-concat — every process gets an equal shard or multi-host
    collectives desync."""
    from lafs_cvpr2024_tpu.data.pipeline import EpochSampler

    for n, pc in [(3, 8), (1, 8), (5, 4), (7, 16)]:
        shards = [
            EpochSampler(n, 1, process_index=i, process_count=pc,
                         shuffle=False).epoch_indices(0)
            for i in range(pc)
        ]
        sizes = {len(s) for s in shards}
        assert len(sizes) == 1, (n, pc, [len(s) for s in shards])
        per = -(-n // pc)
        assert sizes == {per}
        # every real index still appears at least once across the shards
        all_idx = set(np.concatenate(shards).tolist())
        assert all_idx == set(range(n))
