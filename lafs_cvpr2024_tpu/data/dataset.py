"""Face datasets over indexed RecordIO — host-side, loader-agnostic.

Replaces the reference's six near-identical ``FaceDataset`` variants
(``image_iter.py:187-1254``, ``face_pre_pro/dataloader_web.py:216-777``)
with ONE dataset class + configurable options:

- channel order is an EXPLICIT config (``bgr=True`` keeps the packed BGR —
  the reference sniffs 'ms1m' in the path string, ``image_iter.py:320-321``),
- ``partition`` keeps the first fraction of samples (few-shot protocol,
  ``image_iter.py:294-297``),
- ``random_subset`` caches a random index subset to JSON (the ``sifenzhiyi``
  40% MS1M subset, ``dataloader_web.py:291-316``),
- ``transform`` hook: SupervisedAugment, LAFSMultiCrop, or None,
- per-identity k-shot index builders (``dataloader_web.py:385-777``).
"""

from __future__ import annotations

import io
import json
import os
import random
from dataclasses import dataclass
from typing import Callable, List, Optional, Sequence

import numpy as np
from PIL import Image

from .recordio import IndexedRecordIOReader, parse_face_index, unpack


def decode_jpeg(data: bytes) -> np.ndarray:
    """JPEG bytes → uint8 HWC array (mx.image.imdecode equivalent)."""
    return np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))


class FaceRecordDataset:
    """Map-style dataset: index → (uint8/float HWC image or crop list, label)."""

    def __init__(
        self,
        rec_path: str,
        transform: Optional[Callable] = None,
        bgr: bool = False,
        partition: Optional[float] = None,
        random_subset: Optional[float] = None,
        subset_cache_path: Optional[str] = None,
        seed: int = 0,
        use_native: bool = True,
        image_size: int = 112,
    ):
        idx_path = rec_path[:-4] + ".idx"
        self.reader = IndexedRecordIOReader(idx_path, rec_path)
        self._native = None
        self._rec_path = rec_path
        self._use_native = use_native
        index = parse_face_index(self.reader)
        self.id2range = index.id2range
        self.num_identities = index.num_identities
        self.seq: List[int] = list(index.image_keys)
        self.transform = transform
        self.bgr = bgr

        index_keys = index.image_keys
        if use_native and index_keys:
            try:
                from .native import NativeRecordReader, native_available

                if native_available():
                    # size the native decoder from the first actual image
                    _, first_bytes = unpack(self.reader.read_idx(index_keys[0]))
                    h = decode_jpeg(first_bytes).shape[0]
                    self._native = NativeRecordReader(rec_path, h, threads=1)
            except Exception:
                self._native = None

        if random_subset:
            # cached random subset (dataloader_web.py:291-316)
            cache = subset_cache_path or (rec_path + f".subset{random_subset}.json")
            if os.path.exists(cache):
                with open(cache) as f:
                    order = json.load(f)["index"]
            else:
                rng = random.Random(seed)
                n = int(len(self.seq) * random_subset)
                order = rng.sample(range(len(self.seq)), n)
                with open(cache, "w") as f:
                    json.dump({"index": order}, f)
            self.seq = [self.seq[i] for i in order]
        if partition:
            self.seq = self.seq[: int(np.int64(len(self.seq) * partition))]

    def __len__(self):
        return len(self.seq)

    def __getitem__(self, index: int):
        key = self.seq[index]
        if self._native is not None:
            arr, labels = self._native.decode_batch(np.array([key], np.int64))
            arr, label = arr[0], float(labels[0])
        else:
            header, img_bytes = unpack(self.reader.read_idx(key))
            label = header.label
            if not np.isscalar(label):
                label = float(np.asarray(label).ravel()[0])
            arr = decode_jpeg(img_bytes)
        if self.bgr:
            arr = arr[:, :, ::-1]
        if self.transform is not None:
            out = self.transform(Image.fromarray(arr)) if _wants_pil(self.transform) else self.transform(arr)
        else:
            out = arr
        return out, label

    def kshot_keys(self, k: int, seed: int = 0) -> List[int]:
        """k images per identity (FaceDataset_gen_*imgperid,
        dataloader_web.py:385-777)."""
        rng = random.Random(seed)
        keys: List[int] = []
        for ident, (a, b) in self.id2range.items():
            pool = list(range(a, b))
            rng.shuffle(pool)
            keys.extend(pool[:k])
        return keys

    def restrict_to_keys(self, keys: Sequence[int]) -> None:
        self.seq = list(keys)


def _wants_pil(transform) -> bool:
    from .augment import LAFSMultiCrop

    return isinstance(transform, LAFSMultiCrop)


class AttributeFaceDataset(FaceRecordDataset):
    """RecordIO faces + per-image attribute labels from a CSV
    (``FaceDataset_withatt``, ``image_iter.py:752-893``).

    CSV format: header row, then ``image_index,attr1,attr2,...`` rows; the
    row's image_index selects the record. Returns (img, (label, attrs)).
    """

    def __init__(self, rec_path: str, attr_csv: str, **kw):
        super().__init__(rec_path, **kw)
        import csv

        self.attrs = {}
        with open(attr_csv) as f:
            reader = csv.reader(f)
            next(reader, None)  # header
            for row in reader:
                self.attrs[int(row[0])] = np.asarray(row[1:], dtype=np.float32)
        # restrict to records that have attributes
        self.seq = [k for k in self.seq if k in self.attrs]

    def __getitem__(self, index: int):
        img, label = super().__getitem__(index)
        return img, (label, self.attrs[self.seq[index]])


@dataclass
class ContrastivePairSampler:
    """Positive/negative pair sampling via id2range
    (``FaceDataset_contrastive``, ``image_iter.py:1085-1254``)."""

    dataset: FaceRecordDataset
    pos_prob: float = 0.5
    seed: int = 0

    def __post_init__(self):
        self._rng = random.Random(self.seed)
        self._ranges = list(self.dataset.id2range.values())
        self._key_to_ident = {}
        for ident, (a, b) in self.dataset.id2range.items():
            for kk in range(a, b):
                self._key_to_ident[kk] = ident

    def sample_pair(self, index: int):
        """Returns ((img1, img2), same: int)."""
        key = self.dataset.seq[index]
        ident = self._key_to_ident.get(key)
        same = int(self._rng.random() < self.pos_prob)
        if same and ident is not None:
            a, b = self.dataset.id2range[ident]
            other = self._rng.randrange(a, b)
        else:
            a, b = self._rng.choice(self._ranges)
            other = self._rng.randrange(a, b)
            same = int(self._key_to_ident.get(other) == ident)
        i2 = self.dataset.seq.index(other) if other in self.dataset.seq else index
        img1, _ = self.dataset[index]
        img2, _ = self.dataset[i2]
        return (img1, img2), same
