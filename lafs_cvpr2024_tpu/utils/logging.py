"""Metrics, logging, observability.

Replaces the reference's MetricLogger/SmoothedValue/AverageMeter + JSONL +
tensorboardX stack (``utils.py:202-400``, ``util/utils.py:1046-1061``,
``train_largescale.py:896-923``): host-side smoothed meters with optional
cross-process sync (psum via ``jax.experimental.multihost_utils``), a JSONL
metrics writer, and a minimal TensorBoard-compatible scalar event writer
(no tensorboardX dependency).
"""

from __future__ import annotations

import json
import os
import struct
import time
from collections import defaultdict, deque
from typing import Dict, Optional

import numpy as np


class SmoothedValue:
    """Windowed median/avg meter (reference ``utils.py:202-253``)."""

    def __init__(self, window_size: int = 20, fmt: str = "{median:.4f} ({global_avg:.4f})"):
        self.deque = deque(maxlen=window_size)
        self.total = 0.0
        self.count = 0
        self.fmt = fmt

    def update(self, value: float, n: int = 1):
        self.deque.append(value)
        self.count += n
        self.total += value * n

    @property
    def median(self):
        return float(np.median(self.deque)) if self.deque else 0.0

    @property
    def avg(self):
        return float(np.mean(self.deque)) if self.deque else 0.0

    @property
    def global_avg(self):
        return self.total / max(self.count, 1)

    @property
    def max(self):
        return float(np.max(self.deque)) if self.deque else 0.0

    @property
    def value(self):
        return self.deque[-1] if self.deque else 0.0

    def __str__(self):
        return self.fmt.format(
            median=self.median, avg=self.avg, global_avg=self.global_avg,
            max=self.max, value=self.value,
        )


class AverageMeter:
    """Reference ``util/utils.py:1046-1061``."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = self.avg = self.sum = 0.0
        self.count = 0

    def update(self, val, n=1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)


class MetricLogger:
    """Iteration logger with ETA + throughput (``utils.py:313-400``)."""

    def __init__(self, delimiter: str = "  ", print_fn=print):
        self.meters: Dict[str, SmoothedValue] = defaultdict(SmoothedValue)
        self.delimiter = delimiter
        self.print_fn = print_fn

    def update(self, **kwargs):
        for k, v in kwargs.items():
            self.meters[k].update(float(v))

    def synchronize_between_processes(self):
        """Sync counts/totals across hosts (``utils.py:242-253``)."""
        import jax

        if jax.process_count() == 1:
            return
        from jax.experimental import multihost_utils

        for meter in self.meters.values():
            t = np.array([meter.count, meter.total], np.float64)
            t = multihost_utils.process_allgather(t).sum(axis=0)
            meter.count = int(t[0])
            meter.total = float(t[1])

    def log_every(self, iterable, print_freq: int, header: str = "", total: Optional[int] = None):
        i = 0
        start = time.time()
        iter_time = SmoothedValue(fmt="{avg:.4f}")
        end = time.time()
        n = total if total is not None else (len(iterable) if hasattr(iterable, "__len__") else None)
        for obj in iterable:
            yield obj
            iter_time.update(time.time() - end)
            if i % print_freq == 0:
                eta = ""
                if n:
                    eta_s = iter_time.global_avg * (n - i)
                    eta = f"eta: {int(eta_s // 3600)}:{int(eta_s % 3600 // 60):02d}:{int(eta_s % 60):02d}  "
                meters = self.delimiter.join(f"{k}: {v}" for k, v in self.meters.items())
                self.print_fn(
                    f"{header} [{i}{'/' + str(n) if n else ''}]  {eta}{meters}  "
                    f"time: {iter_time}"
                )
            i += 1
            end = time.time()
        total_time = time.time() - start
        self.print_fn(f"{header} Total time: {total_time:.1f}s")

    def __str__(self):
        return self.delimiter.join(f"{k}: {v}" for k, v in self.meters.items())


class JSONLLogger:
    """Per-epoch JSONL log (reference ``lafs_train.py:464-468`` log.txt)."""

    def __init__(self, path: str, enabled: bool = True):
        self.path = path
        self.enabled = enabled
        if enabled:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)

    def write(self, record: dict):
        if not self.enabled:
            return
        with open(self.path, "a") as f:
            f.write(json.dumps(record) + "\n")


class TensorBoardWriter:
    """Minimal TF-event scalar writer (tensorboardX replacement,
    ``train_largescale.py:500,900-923``). Writes the TFRecord/Event wire
    format directly — readable by standard TensorBoard."""

    def __init__(self, logdir: str, enabled: bool = True):
        self.enabled = enabled
        if not enabled:
            return
        os.makedirs(logdir, exist_ok=True)
        fname = f"events.out.tfevents.{int(time.time())}.lafs"
        self._f = open(os.path.join(logdir, fname), "ab")
        self._write_event(self._event(wall_time=time.time(), file_version="brain.Event:2"))

    def _write_event(self, payload: bytes):
        data_len = struct.pack("<Q", len(payload))
        self._f.write(data_len)
        self._f.write(struct.pack("<I", _crc32c_masked(data_len)))
        self._f.write(payload)
        self._f.write(struct.pack("<I", _crc32c_masked(payload)))
        self._f.flush()

    @staticmethod
    def _varint(n: int) -> bytes:
        out = b""
        while True:
            b7 = n & 0x7F
            n >>= 7
            if n:
                out += bytes([b7 | 0x80])
            else:
                out += bytes([b7])
                return out

    def _event(self, wall_time: float, step: int = 0, file_version: str = None,
               tag: str = None, value: float = None,
               value_bytes: bytes = None) -> bytes:
        # hand-rolled protobuf: Event{1: double wall_time, 2: int64 step,
        #   3: string file_version, 5: Summary{1: Value{1: tag, 2: float,
        #   4: Image}}}; value_bytes = a pre-encoded Summary.Value payload
        out = b"\x09" + struct.pack("<d", wall_time)
        if step:
            out += b"\x10" + self._varint(step)
        if file_version is not None:
            fv = file_version.encode()
            out += b"\x1a" + self._varint(len(fv)) + fv
        if tag is not None:
            t = tag.encode()
            value_bytes = (
                b"\x0a" + self._varint(len(t)) + t
                + b"\x15" + struct.pack("<f", value)
            )
        if value_bytes is not None:
            summary = b"\x0a" + self._varint(len(value_bytes)) + value_bytes
            out += b"\x2a" + self._varint(len(summary)) + summary
        return out

    def add_scalar(self, tag: str, value: float, step: int):
        if not self.enabled:
            return
        self._write_event(
            self._event(wall_time=time.time(), step=step, tag=tag, value=float(value))
        )

    def add_image(self, tag: str, image, step: int):
        """Image summary (tensorboardX ``add_image`` replacement — the
        reference logs ROC plots this way, ``buffer_val``,
        ``util/utils.py:1038-1043`` + ``train_largescale.py:938-943``).

        ``image``: HWC uint8/float-[0,1] array, or already-encoded PNG
        bytes. Writes a ``Summary.Value{tag, Image{h, w, colorspace,
        encoded_image_string}}`` event readable by standard TensorBoard."""
        if not self.enabled:
            return
        import io

        import numpy as np
        from PIL import Image as PILImage

        if isinstance(image, (bytes, bytearray)):
            png = bytes(image)
            with PILImage.open(io.BytesIO(png)) as im:
                w, h = im.size
        else:
            arr = np.asarray(image)
            if arr.dtype != np.uint8:
                arr = (np.clip(arr, 0.0, 1.0) * 255).astype(np.uint8)
            if arr.ndim == 2:
                arr = np.stack([arr] * 3, axis=-1)
            h, w = arr.shape[:2]
            buf = io.BytesIO()
            PILImage.fromarray(arr).save(buf, "PNG")
            png = buf.getvalue()
        # Summary.Image{1: height, 2: width, 3: colorspace(3=RGB), 4: png}
        img = (
            b"\x08" + self._varint(h)
            + b"\x10" + self._varint(w)
            + b"\x18" + self._varint(3)
            + b"\x22" + self._varint(len(png)) + png
        )
        t = tag.encode()
        val = (
            b"\x0a" + self._varint(len(t)) + t
            + b"\x22" + self._varint(len(img)) + img
        )
        self._write_event(
            self._event(wall_time=time.time(), step=step, value_bytes=val)
        )

    def close(self):
        if self.enabled:
            self._f.close()


_CRC_TABLE = None


def _crc32c(data: bytes) -> int:
    global _CRC_TABLE
    if _CRC_TABLE is None:
        poly = 0x82F63B78
        table = []
        for i in range(256):
            c = i
            for _ in range(8):
                c = (c >> 1) ^ poly if c & 1 else c >> 1
            table.append(c)
        _CRC_TABLE = table
    crc = 0xFFFFFFFF
    for b in data:
        crc = _CRC_TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def _crc32c_masked(data: bytes) -> int:
    crc = _crc32c(data)
    return ((crc >> 15) | (crc << 17)) & 0xFFFFFFFF


def get_sha(repo_root: Optional[str] = None) -> str:
    """Git SHA + dirty flag stamp (reference ``utils.py:403-420``)."""
    import subprocess

    cwd = repo_root or os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    def _run(cmd):
        return subprocess.check_output(cmd, cwd=cwd).decode("ascii").strip()

    try:
        sha = _run(["git", "rev-parse", "HEAD"])
        diff = _run(["git", "diff-index", "HEAD"])
        status = "has uncommitted changes" if diff else "clean"
        branch = _run(["git", "rev-parse", "--abbrev-ref", "HEAD"])
        return f"sha: {sha}, status: {status}, branch: {branch}"
    except Exception:
        return "sha: N/A"


def dump_config(path: str, args) -> None:
    """Write the run configuration (reference writes ``config.txt``,
    ``train_largescale.py:490-491``)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        f.write(get_sha() + "\n")
        for k, v in sorted(vars(args).items()):
            f.write(f"{k}: {v}\n")


def need_save(acc, highest_acc):
    """Validation-accuracy checkpoint gate (``train_largescale.py:49-63``).

    Mutates ``highest_acc`` in place like the reference."""
    do_save = False
    save_cnt = 0
    if acc[0] > 0.98:
        do_save = True
    for i, accuracy in enumerate(acc):
        if accuracy > highest_acc[i]:
            highest_acc[i] = accuracy
            do_save = True
        if i > 0 and accuracy >= highest_acc[i] - 0.002:
            save_cnt += 1
    if save_cnt >= len(acc) * 3 / 4 and acc[0] > 0.99:
        do_save = True
    return do_save


class DeferredLossFetcher:
    """Buffer per-step device loss scalars; fetch in ONE ``device_get`` at
    flush boundaries.

    On this class of backends a host fetch (``float(loss)``) is the only
    reliable sync, so fetching per step serializes device step → host read →
    next dispatch (the reference reads ``loss.item()`` every iteration,
    ``lafs_train.py:585``). Buffering keeps the dispatch queue full; the
    flush cadence is the observability/robustness knob.

    MULTI-PROCESS RULE: with ``nan_exit=True`` every process must flush at
    the SAME steps — a rank that aborts at a boundary other ranks don't
    check leaves the survivors blocked in the next collective until
    timeout. ``maybe_flush(it)`` (fixed every-N cadence) is safe; add extra
    main-process-only flushes only when ``nan_exit=False``.
    """

    def __init__(self, logger: "MetricLogger", nan_exit: bool = False,
                 key: str = "loss"):
        self._logger = logger
        self._nan_exit = nan_exit
        self._key = key
        self._pending: list = []

    def append(self, gstep: int, dev_scalar) -> None:
        self._pending.append((gstep, dev_scalar))

    def maybe_flush(self, it: int, every: int = 100) -> None:
        if (it + 1) % every == 0:
            self.flush()

    def flush(self) -> None:
        import jax

        if not self._pending:
            return
        vals = jax.device_get([d for _, d in self._pending])
        pending, self._pending = self._pending, []
        for (gs, _), v in zip(pending, vals):
            v = float(v)
            if self._nan_exit and not np.isfinite(v):
                raise SystemExit(f"Loss is {v} at step {gs}, stopping training")
            self._logger.update(**{self._key: v})
