"""Shared test fixtures: the insightface-style identity rec builder.

One implementation of the header-0 / identity-range record layout
(``image_iter.py:264-291`` semantics) — previously three near-identical
copies across test modules that had to be kept in sync by hand.
"""

import io

import numpy as np
from PIL import Image

from lafs_cvpr2024_tpu.data.recordio import (
    IndexedRecordIOWriter,
    IRHeader,
    pack,
)


def make_identity_rec(tmp_path, n_ids=4, per_id=3, size=32, name="train",
                      seed=0) -> str:
    """Pack ``n_ids × per_id`` random JPEGs with identity-range headers;
    returns the .rec path. Image records occupy keys 1..n, identity header
    records follow, key 0 carries (ident_start, ident_end)."""
    rng = np.random.default_rng(seed)
    rec = str(tmp_path / f"{name}.rec")
    w = IndexedRecordIOWriter(str(tmp_path / f"{name}.idx"), rec)
    key = 1
    ranges = []
    for ident in range(n_ids):
        start = key
        for _ in range(per_id):
            buf = io.BytesIO()
            Image.fromarray(
                rng.integers(0, 255, (size, size, 3), np.uint8)
            ).save(buf, format="JPEG", quality=95)
            w.write_idx(key, pack(IRHeader(0, float(ident), key, 0),
                                  buf.getvalue()))
            key += 1
        ranges.append((start, key))
    ident_start = key
    for a, b in ranges:
        w.write_idx(
            key, pack(IRHeader(2, np.array([a, b], np.float32), key, 0), b"")
        )
        key += 1
    w.write_idx(
        0,
        pack(IRHeader(2, np.array([ident_start, key], np.float32), 0, 0),
             b""),
    )
    w.close()
    return rec
