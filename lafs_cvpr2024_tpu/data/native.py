"""ctypes bindings for the native data plane (``native/lafs_dataplane.cc``).

mmap'd indexed RecordIO + multithreaded libjpeg batch decode. Builds on
first use (``make -C native``) and falls back to the pure-Python path when
the toolchain or libjpeg is unavailable — all consumers go through
``NativeFaceDataset`` which mirrors ``FaceRecordDataset``'s interface.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_LIB_PATH = os.path.join(_REPO_ROOT, "native", "liblafs_dataplane.so")
_lib = None


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", os.path.join(_REPO_ROOT, "native")],
            check=True, capture_output=True,
        )
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def load_library() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    src = os.path.join(_REPO_ROOT, "native", "lafs_dataplane.cc")
    stale = (
        not os.path.exists(_LIB_PATH)
        or (
            os.path.exists(src)
            and os.path.getmtime(src) > os.path.getmtime(_LIB_PATH)
        )
    )
    # rebuild on stale: a leftover binary must never shadow newer C++ source
    if stale and not _build():
        if os.path.exists(_LIB_PATH):
            # old binary exists but the rebuild failed — loading it would
            # silently diverge from the current .cc; refuse (PIL fallback)
            import warnings

            warnings.warn(
                "native/lafs_dataplane.cc is newer than the built library "
                "and `make` failed — native data plane DISABLED (stale "
                "binary not loaded); rebuild manually with "
                "`make -C native`", RuntimeWarning,
            )
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.lafs_open.restype = ctypes.c_void_p
    lib.lafs_open.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    lib.lafs_close.argtypes = [ctypes.c_void_p]
    lib.lafs_num_records.restype = ctypes.c_int64
    lib.lafs_num_records.argtypes = [ctypes.c_void_p]
    lib.lafs_keys.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64)]
    lib.lafs_record.restype = ctypes.POINTER(ctypes.c_uint8)
    lib.lafs_record.argtypes = [
        ctypes.c_void_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_float),
    ]
    lib.lafs_decode_batch.restype = ctypes.c_int
    lib.lafs_decode_batch.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.lafs_decode_warp_batch.restype = ctypes.c_int
    lib.lafs_decode_warp_batch.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    _lib = lib
    return lib


def native_available() -> bool:
    return load_library() is not None


class NativeRecordReader:
    """mmap-backed reader with batch JPEG decode."""

    def __init__(self, rec_path: str, image_size: int = 112, threads: int = 4):
        lib = load_library()
        if lib is None:
            raise RuntimeError("native data plane unavailable")
        self._lib = lib
        idx_path = rec_path[:-4] + ".idx"
        self._h = lib.lafs_open(idx_path.encode(), rec_path.encode())
        if not self._h:
            raise OSError(f"cannot open {rec_path}")
        self.image_size = image_size
        self.threads = threads
        n = lib.lafs_num_records(self._h)
        keys = np.zeros(n, np.int64)
        lib.lafs_keys(self._h, keys.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        self.keys = keys

    def __len__(self):
        return len(self.keys)

    def read_payload(self, key: int):
        """Raw payload bytes (copied out of the mmap) + label."""
        length = ctypes.c_int64()
        label = ctypes.c_float()
        ptr = self._lib.lafs_record(
            self._h, int(key), ctypes.byref(length), ctypes.byref(label)
        )
        if not ptr:
            raise KeyError(key)
        return ctypes.string_at(ptr, length.value), float(label.value)

    def decode_batch(self, keys) -> tuple:
        """Decode records → ((n, S, S, 3) uint8 RGB, (n,) float labels)."""
        keys = np.ascontiguousarray(keys, np.int64)
        n = len(keys)
        s = self.image_size
        out = np.empty((n, s, s, 3), np.uint8)
        labels = np.empty(n, np.float32)
        failures = self._lib.lafs_decode_batch(
            self._h,
            keys.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            n,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            labels.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            s, s, min(self.threads, n),  # don't spawn idle threads
        )
        if failures:
            raise RuntimeError(f"{failures} records failed to decode")
        return out, labels

    def close(self):
        if self._h:
            self._lib.lafs_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def decode_warp_batch(jpegs, mats, out_size: int = 112, threads: int = 4):
    """Fused JPEG decode + per-face affine alignment in one native call
    (``lafs_decode_warp_batch``): the full-resolution decodes stay inside
    the C++ thread pool and never cross into Python — only the aligned
    (n, S, S, 3) uint8 batch comes back. This is the IJB loose-crop host
    path (decode → Umeyama warp for ~470k faces per protocol run,
    reference ``IJB_evaluation.py:198-235``).

    jpegs: sequence of JPEG byte strings; mats: (n, 2, 3) float32 FORWARD
    src→dst affines (``eval.ijb.umeyama(...)[: 2]``). Raises RuntimeError
    on decode failures; callers fall back to the PIL path when the native
    plane is unavailable (``native_available()``).
    """
    lib = load_library()
    if lib is None:
        raise RuntimeError("native data plane unavailable")
    n = len(jpegs)
    mats = np.ascontiguousarray(mats, np.float32)
    assert mats.shape == (n, 2, 3), mats.shape
    lens = np.asarray([len(j) for j in jpegs], np.int64)
    offs = np.zeros(n, np.int64)
    np.cumsum(lens[:-1], out=offs[1:])
    blob = np.frombuffer(b"".join(jpegs), np.uint8)
    out = np.empty((n, out_size, out_size, 3), np.uint8)
    failures = lib.lafs_decode_warp_batch(
        blob.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n,
        mats.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out_size, out_size, min(threads, n),
    )
    if failures:
        raise RuntimeError(f"{failures} JPEGs failed to decode")
    return out
