"""Host→device input pipeline: parallel decode workers + device prefetch.

TPU-native replacement for torch DataLoader worker processes
(``lafs_train.py:186-193``: 6-8 workers/GPU + pin_memory): a thread pool
decodes/augments (PIL releases the GIL around JPEG decode), batches are
collated to numpy and ``jax.device_put`` with the data-axis sharding while
the previous step executes — a double-buffered prefetch queue.

Per-host sharding for multi-host meshes: each process samples its own
``process_index``-strided shard, replacing ``DistributedSampler``
(``lafs_train.py:185``).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterator, Optional

import jax
import numpy as np


class EpochSampler:
    """Shuffled per-epoch index sampler with per-process sharding
    (DistributedSampler.set_epoch semantics)."""

    def __init__(
        self,
        n: int,
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool = True,
        seed: int = 0,
        process_index: Optional[int] = None,
        process_count: Optional[int] = None,
    ):
        self.n = n
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.process_index = (
            process_index if process_index is not None else jax.process_index()
        )
        self.process_count = (
            process_count if process_count is not None else jax.process_count()
        )

    def epoch_indices(self, epoch: int) -> np.ndarray:
        idx = np.arange(self.n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + epoch)
            rng.shuffle(idx)
        # pad/shard per process (DistributedSampler pads with wraparound;
        # np.resize tiles, so even n < process_count/2 pads fully and every
        # process gets an equal shard — a short concat would leave trailing
        # processes empty and desync the multi-host collectives)
        per = -(-self.n // self.process_count)
        if len(idx) < per * self.process_count:
            idx = np.resize(idx, per * self.process_count)
        local = idx[self.process_index :: self.process_count]
        if self.drop_last:
            local = local[: len(local) // self.batch_size * self.batch_size]
        return local

    def steps_per_epoch(self) -> int:
        per = -(-self.n // self.process_count)
        return per // self.batch_size if self.drop_last else -(-per // self.batch_size)


def _collate(samples):
    """Stack (item, label) pairs; item may be an array or a list of arrays
    (multi-crop) — lists collate to a list of batched arrays."""
    items = [s[0] for s in samples]
    labels = np.asarray([s[1] for s in samples], dtype=np.float32)
    if isinstance(items[0], (list, tuple)):
        ncrops = len(items[0])
        batched = [np.stack([it[c] for it in items]) for c in range(ncrops)]
        return batched, labels
    return np.stack(items), labels


def prefetch_iter(it, depth: int = 2):
    """Run an iterator on a background thread with a bounded queue.

    The eval-sweep analogue of ``DataPipeline``'s producer thread: host
    decode/alignment of batch i+1 overlaps the device embed + fetch of
    batch i (the loops in ``cli/evaluate_ijb`` / ``cli/extract_embeddings``
    are otherwise strictly serial — throughput becomes
    ``max(host, device)`` instead of their sum). ``depth=0`` returns the
    iterator unchanged (the serial A/B control). Exceptions raised by the
    producer re-raise at the consumer's next pull."""
    if depth <= 0:
        return it

    def gen():
        q: "queue.Queue" = queue.Queue(maxsize=depth)
        done = object()

        def run():
            try:
                for x in it:
                    q.put(x)
                q.put(done)
            except BaseException as e:  # surface to the consumer
                q.put(e)

        threading.Thread(target=run, daemon=True).start()
        while True:
            x = q.get()
            if x is done:
                return
            if isinstance(x, BaseException):
                raise x
            yield x

    return gen()


class DataPipeline:
    """Iterable over device-resident batches for one epoch.

    Args:
      dataset: map-style dataset (``dataset[i] -> (item, label)``).
      sampler: EpochSampler.
      num_workers: decode threads.
      prefetch: queue depth of device-put batches.
      sharding: optional ``jax.sharding.NamedSharding`` for device_put;
        None keeps batches on the default device. Single-process only —
        multi-host feeding must go through ``mesh``/``spec``.
      mesh: optional ``jax.sharding.Mesh``; batches are assembled into
        GLOBAL arrays via ``parallel.mesh.global_batch`` (each process
        contributes its local rows — multi-host safe, replaces
        DistributedSampler + DDP's implicit global batch). Overrides
        ``sharding``.
      spec: PartitionSpec used with ``mesh`` (default ``P('data')``).
      postprocess: optional host fn(batch_items, labels) -> (items, labels).
    """

    def __init__(
        self,
        dataset,
        sampler: EpochSampler,
        num_workers: int = 8,
        prefetch: int = 2,
        sharding=None,
        postprocess: Optional[Callable] = None,
        mesh=None,
        spec=None,
    ):
        self.dataset = dataset
        self.sampler = sampler
        self.num_workers = num_workers
        self.prefetch = prefetch
        self.sharding = sharding
        self.postprocess = postprocess
        self.mesh = mesh
        self.spec = spec
        if sharding is not None and mesh is None and jax.process_count() > 1:
            raise ValueError(
                "multi-process feeding needs mesh= (global_batch assembly); "
                "a raw device_put sharding would address non-local devices"
            )

    def epoch(self, epoch: int, start_step: int = 0) -> Iterator:
        """``start_step`` skips the first N batches BEFORE decode — exact
        mid-epoch resume (the sampler's order is a pure function of
        (seed, epoch), so step k of a resumed run sees the same indices)."""
        indices = self.sampler.epoch_indices(epoch)
        bs = self.sampler.batch_size
        batches = [indices[i : i + bs] for i in range(0, len(indices), bs)]
        if start_step:
            batches = batches[start_step:]
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        # native batch-decode fast path: ONE ctypes call fans the whole
        # batch's JPEG decode across C++ threads (releases the GIL) instead
        # of per-sample PIL decodes on the Python pool
        batch_fetch = (
            self.dataset.fetch_batch
            if getattr(self.dataset, "supports_batch_fetch", False)
            else None
        )

        def produce():
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    for batch_idx in batches:
                        if stop.is_set():
                            return
                        if batch_fetch is not None:
                            items, labels = batch_fetch(batch_idx, pool=pool)
                            if isinstance(items, list):
                                items, labels = _collate(
                                    list(zip(items, labels))
                                )
                        else:
                            samples = list(
                                pool.map(self.dataset.__getitem__, batch_idx)
                            )
                            items, labels = _collate(samples)
                        if self.postprocess is not None:
                            items, labels = self.postprocess(items, labels)
                        q.put((items, labels))
                q.put(None)
            except BaseException as e:  # surface worker errors to the consumer
                q.put(e)

        def place(items, labels):
            # device placement happens HERE, on the consumer thread:
            # device_put is async (returns in ms; the transfer streams in
            # the background and overlaps the previous step's compute), and
            # background-thread device_put is pathologically slow on some
            # PJRT backends (measured seconds/batch on the tunneled chip)
            if self.mesh is not None:
                from jax.sharding import PartitionSpec
                from ..parallel.mesh import global_batch

                sp = (
                    self.spec if self.spec is not None
                    else PartitionSpec("data")
                )
                items = jax.tree_util.tree_map(
                    lambda a: global_batch(self.mesh, a, sp), items
                )
                labels = global_batch(self.mesh, labels, sp)
            elif self.sharding is not None:
                items = jax.device_put(items, self.sharding)
                labels = jax.device_put(labels, self.sharding)
            return items, labels

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield place(*item)
        finally:
            stop.set()
            # drain so the producer can exit if blocked on a full queue
            while not q.empty():
                q.get_nowait()
