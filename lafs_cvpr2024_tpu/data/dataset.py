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
        native_threads: Optional[int] = None,
    ):
        # NOTE: no image_size parameter — records decode at their packed
        # size (the native decoder sizes itself from the first image); a
        # resize belongs in `transform` where it composes with augmentation
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
                    # batch decode (fetch_batch) fans out across host cores;
                    # per-record reads use the same handle single-threaded
                    nt = native_threads or min(os.cpu_count() or 1, 16)
                    self._native = NativeRecordReader(rec_path, h, threads=nt)
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

    @property
    def supports_batch_fetch(self) -> bool:
        """True when the C++ multithreaded batch-decode path is live."""
        return self._native is not None

    def fetch_batch(self, indices: Sequence[int], pool=None):
        """Batch fast path: ONE native call decodes the whole batch with
        multithreaded libjpeg (``native/lafs_dataplane.cc::lafs_decode_batch``
        — the mxnet ``imdecode`` analogue at batch granularity), then the
        host transform (if any) runs per-sample, on ``pool`` when given.

        Returns ``(items, labels)`` equivalent to ``[self[i] for i in
        indices]`` — items is a stacked (B, H, W, 3) uint8 array when there
        is no transform, else a list of per-sample transform outputs."""
        keys = np.asarray([self.seq[i] for i in indices], np.int64)
        arrs, labels = self._native.decode_batch(keys)
        labels = labels.astype(np.float32)
        if self.bgr:
            arrs = arrs[:, :, :, ::-1]
        if self.transform is None:
            return arrs, labels

        if _wants_pil(self.transform):
            tf = lambda arr: self.transform(Image.fromarray(arr))
        else:
            tf = self.transform
        mapper = pool.map if pool is not None else map
        return list(mapper(tf, list(arrs))), labels

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
    from .augment import DataAugmentationDINO, LAFSMultiCrop

    return isinstance(transform, (LAFSMultiCrop, DataAugmentationDINO))


class FaceFolderDataset:
    """ImageFolder-direct training — no packing step required.

    Replaces ``FaceDataset_webface`` (``image_iter.py:897-1082``): scan a
    class-per-subdirectory tree, JSON-cache the (path, label) list (the
    reference's ``Webface_list.json`` — rescanning WebFace4M's 4M files takes
    minutes), and expose the same interface as :class:`FaceRecordDataset`
    (``seq``/``id2range``/``num_identities``/``transform``/``kshot_keys``/
    ``restrict_to_keys``) so the supervised CLI and the few-shot 1/2/4/10-
    images-per-identity protocol (README.md:52-56) run straight off a folder.
    """

    _EXTS = (".jpg", ".jpeg", ".png", ".bmp", ".webp", ".ppm")

    def __init__(
        self,
        root: str,
        transform: Optional[Callable] = None,
        bgr: bool = False,
        list_cache_path: Optional[str] = None,
        partition: Optional[float] = None,
        seed: int = 0,
    ):
        cache = list_cache_path or os.path.join(root, "Webface_list.json")
        if os.path.exists(cache):
            with open(cache) as f:
                samples = json.load(f)
        else:
            classes = sorted(
                d for d in os.listdir(root)
                if os.path.isdir(os.path.join(root, d))
            )
            if not classes:
                raise FileNotFoundError(f"no class subdirectories in {root}")
            samples = []
            for label, cls in enumerate(classes):
                d = os.path.join(root, cls)
                for fn in sorted(os.listdir(d)):
                    if fn.lower().endswith(self._EXTS):
                        samples.append([os.path.join(d, fn), label])
            with open(cache, "w") as f:
                json.dump(samples, f)
        self.samples = [(p, int(t)) for p, t in samples]
        self.transform = transform
        self.bgr = bgr
        # positions are contiguous per class (sorted scan) → id2range over
        # positions, mirroring the rec datasets' key ranges
        self.id2range = {}
        start = 0
        for i, (_, label) in enumerate(self.samples):
            if i + 1 == len(self.samples) or self.samples[i + 1][1] != label:
                self.id2range[label] = (start, i + 1)
                start = i + 1
        self.num_identities = len(self.id2range)
        self.seq: List[int] = list(range(len(self.samples)))
        if partition:
            self.seq = self.seq[: int(np.int64(len(self.seq) * partition))]

    def __len__(self):
        return len(self.seq)

    def __getitem__(self, index: int):
        path, label = self.samples[self.seq[index]]
        arr = np.asarray(Image.open(path).convert("RGB"))
        if self.bgr:
            arr = arr[:, :, ::-1]
        if self.transform is not None:
            out = (
                self.transform(Image.fromarray(arr))
                if _wants_pil(self.transform)
                else self.transform(arr)
            )
        else:
            out = arr
        return out, float(label)

    def kshot_keys(self, k: int, seed: int = 0) -> List[int]:
        """k images per identity (few-shot protocol)."""
        rng = random.Random(seed)
        keys: List[int] = []
        for _, (a, b) in sorted(self.id2range.items()):
            pool = list(range(a, b))
            rng.shuffle(pool)
            keys.extend(pool[:k])
        return keys

    def restrict_to_keys(self, keys: Sequence[int]) -> None:
        self.seq = list(keys)


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

    def fetch_batch(self, indices, pool=None):
        """Batch fast path with the attribute labels ATTACHED — the
        inherited native path returns only (imgs, id_labels) and would
        silently drop ``self.attrs``, breaking fetch_batch's documented
        equivalence to ``[self[i] for i in indices]``."""
        items, labels = super().fetch_batch(indices, pool)
        attrs = np.stack([self.attrs[self.seq[i]] for i in indices])
        return items, (labels, attrs)


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
        # O(1) key → dataset position (construct the sampler AFTER any
        # restrict_to_keys/subset so this reflects the live seq)
        self._key_to_pos = {k: i for i, k in enumerate(self.dataset.seq)}

    def _draw_position(self, draw_key, avoid: int = -1) -> int:
        """Re-draw until the candidate key is in the (possibly subsetted)
        dataset AND is not ``avoid`` (the anchor's position) — a self-pair
        is a degenerate trivially-positive example that contaminates the
        contrastive objective."""
        for _ in range(64):
            pos = self._key_to_pos.get(draw_key())
            if pos is not None and pos != avoid:
                return pos
        # identity/range too sparse in this subset: any OTHER subset entry
        n = len(self.dataset.seq)
        pos = self._rng.randrange(n)
        while pos == avoid and n > 1:
            pos = self._rng.randrange(n)
        return pos

    def sample_pair(self, index: int):
        """Returns ((img1, img2), same: int)."""
        key = self.dataset.seq[index]
        ident = self._key_to_ident.get(key)
        want_pos = self._rng.random() < self.pos_prob
        if want_pos and ident is not None:
            a, b = self.dataset.id2range[ident]
            i2 = self._draw_position(
                lambda: self._rng.randrange(a, b), avoid=index
            )
        else:
            def _neg():
                lo, hi = self._rng.choice(self._ranges)
                return self._rng.randrange(lo, hi)

            i2 = self._draw_position(_neg, avoid=index)
        other = self.dataset.seq[i2]
        # label from the ACTUAL partner (a fallback draw may flip intent)
        same = int(ident is not None and self._key_to_ident.get(other) == ident)
        img1, _ = self.dataset[index]
        img2, _ = self.dataset[i2]
        return (img1, img2), same
