"""Native C++ data plane: build, round-trip, decode parity vs PIL, threading."""

import io
import os

import numpy as np
import pytest
from PIL import Image

from lafs_cvpr2024_tpu.data.recordio import IRHeader, IndexedRecordIOWriter, pack

native = pytest.importorskip("lafs_cvpr2024_tpu.data.native")
if not native.native_available():
    pytest.skip("native data plane unavailable", allow_module_level=True)


@pytest.fixture()
def rec(tmp_path):
    rng = np.random.default_rng(0)
    rec_path = str(tmp_path / "t.rec")
    w = IndexedRecordIOWriter(str(tmp_path / "t.idx"), rec_path)
    originals = []
    for i in range(8):
        arr = rng.integers(0, 255, (112, 112, 3), np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="JPEG", quality=95)
        w.write_idx(i, pack(IRHeader(0, float(i), i, 0), buf.getvalue()))
        originals.append(buf.getvalue())
    w.close()
    return rec_path, originals


def test_native_decode_matches_pil(rec):
    rec_path, originals = rec
    r = native.NativeRecordReader(rec_path, 112, threads=2)
    assert len(r) == 8
    out, labels = r.decode_batch(np.arange(8))
    np.testing.assert_array_equal(labels, np.arange(8, dtype=np.float32))
    for i in (0, 3, 7):
        pil = np.asarray(Image.open(io.BytesIO(originals[i])).convert("RGB"))
        np.testing.assert_array_equal(out[i], pil)
    r.close()


def test_native_payload_roundtrip(rec):
    rec_path, originals = rec
    r = native.NativeRecordReader(rec_path)
    payload, label = r.read_payload(5)
    assert payload == originals[5]
    assert label == 5.0
    r.close()


def test_native_multithread_consistency(rec):
    rec_path, _ = rec
    r1 = native.NativeRecordReader(rec_path, threads=1)
    r4 = native.NativeRecordReader(rec_path, threads=4)
    keys = np.array([7, 0, 3, 3, 1, 6, 2, 5, 4, 0], np.int64)
    out1, lab1 = r1.decode_batch(keys)
    out4, lab4 = r4.decode_batch(keys)
    np.testing.assert_array_equal(out1, out4)
    np.testing.assert_array_equal(lab1, lab4)


def test_native_resize_path(tmp_path):
    """Odd-sized record goes through the nearest-resize fallback."""
    rec_path = str(tmp_path / "r.rec")
    w = IndexedRecordIOWriter(str(tmp_path / "r.idx"), rec_path)
    arr = np.full((56, 56, 3), 200, np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=95)
    w.write_idx(0, pack(IRHeader(0, 1.0, 0, 0), buf.getvalue()))
    w.close()
    r = native.NativeRecordReader(rec_path, 112)
    out, _ = r.decode_batch(np.array([0]))
    assert out.shape == (1, 112, 112, 3)
    assert abs(int(out.mean()) - 200) < 5


def test_fetch_batch_matches_getitem(rec, tmp_path):
    """FaceRecordDataset.fetch_batch (one multithreaded C++ decode per
    batch) must return exactly what the per-sample path returns, with and
    without a host transform, and the DataPipeline must route through it."""
    from lafs_cvpr2024_tpu.data import DataPipeline, EpochSampler
    from lafs_cvpr2024_tpu.data.dataset import FaceRecordDataset

    rec_path, _ = rec
    ds = FaceRecordDataset(rec_path, native_threads=2)
    assert ds.supports_batch_fetch
    items, labels = ds.fetch_batch([0, 3, 5])
    assert items.shape == (3, 112, 112, 3) and items.dtype == np.uint8
    for j, i in enumerate([0, 3, 5]):
        ref_item, ref_label = ds[i]
        np.testing.assert_array_equal(items[j], ref_item)
        assert labels[j] == ref_label

    # bgr flag respected on the batch path
    ds_bgr = FaceRecordDataset(rec_path, bgr=True, native_threads=2)
    it_bgr, _ = ds_bgr.fetch_batch([1])
    np.testing.assert_array_equal(it_bgr[0], ds_bgr[1][0])

    # with a transform: per-sample outputs, same shapes as __getitem__
    tf = lambda arr: arr[::2, ::2]
    ds_tf = FaceRecordDataset(rec_path, transform=tf, native_threads=2)
    items_tf, labels_tf = ds_tf.fetch_batch([2, 4])
    assert isinstance(items_tf, list) and items_tf[0].shape == (56, 56, 3)
    np.testing.assert_array_equal(items_tf[0], ds_tf[2][0])

    # pipeline end-to-end: batches come out identical to the slow path
    sampler = EpochSampler(len(ds), batch_size=4, shuffle=False,
                           process_index=0, process_count=1)
    fast = list(DataPipeline(ds, sampler, num_workers=2).epoch(0))
    ds_slow = FaceRecordDataset(rec_path, use_native=False)
    assert not ds_slow.supports_batch_fetch
    slow = list(DataPipeline(ds_slow, sampler, num_workers=2).epoch(0))
    assert len(fast) == len(slow) == 2
    for (fi, fl), (si, sl) in zip(fast, slow):
        np.testing.assert_array_equal(np.asarray(fi), np.asarray(si))
        np.testing.assert_array_equal(np.asarray(fl), np.asarray(sl))


def test_native_decode_warp_matches_numpy_warp():
    """Fused C++ decode+align == PIL decode + eval.ijb.warp_affine (the
    pure-numpy cv2.warpAffine equivalent) to ±1 intensity step, including
    out-of-bounds border-0 regions; landmarks → Umeyama matrices exactly as
    the IJB CLI builds them."""
    from lafs_cvpr2024_tpu.eval.ijb import ARCFACE_SRC, umeyama, warp_affine

    rng = np.random.default_rng(1)
    jpegs, mats, refs = [], [], []
    for i in range(6):
        h, w = int(rng.integers(90, 200)), int(rng.integers(90, 200))
        arr = rng.integers(0, 255, (h, w, 3), np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="JPEG", quality=95)
        jpegs.append(buf.getvalue())
        # plausible 5-point landmarks scattered in the frame (some warps
        # will sample outside the image -> exercises the border-0 path)
        lmk = np.stack(
            [rng.uniform(0, w, 5), rng.uniform(0, h, 5)], axis=1
        ).astype(np.float32)
        M = umeyama(lmk, ARCFACE_SRC)[:2]
        mats.append(M)
        decoded = np.asarray(Image.open(io.BytesIO(jpegs[-1])).convert("RGB"))
        refs.append(warp_affine(decoded, M, (112, 112)))
    out = native.decode_warp_batch(jpegs, np.stack(mats), threads=2)
    assert out.shape == (6, 112, 112, 3) and out.dtype == np.uint8
    for got, ref in zip(out, refs):
        # float-order differences can flip a truncation by 1
        assert np.abs(got.astype(np.int16) - ref.astype(np.int16)).max() <= 1


def test_native_decode_warp_bad_jpeg_raises():
    good = io.BytesIO()
    Image.fromarray(np.zeros((64, 64, 3), np.uint8)).save(good, format="JPEG")
    mats = np.tile(np.eye(2, 3, dtype=np.float32), (2, 1, 1))
    with pytest.raises(RuntimeError, match="failed to decode"):
        native.decode_warp_batch([good.getvalue(), b"not a jpeg"], mats)
