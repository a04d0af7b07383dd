"""Profiling & cost analysis.

Replaces the reference's ptflops MACs print (``train_largescale.py:590-593``)
with XLA's own cost analysis, and exposes ``jax.profiler`` trace hooks for
TensorBoard-viewable device profiles (the aux subsystem SURVEY §5 calls for).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict

import jax
import numpy as np


def cost_analysis(fn: Callable, *example_args) -> Dict[str, float]:
    """FLOPs / bytes-accessed estimate from the lowered XLA module."""
    lowered = jax.jit(fn).lower(*example_args)
    compiled = lowered.compile()
    costs = compiled.cost_analysis()
    if isinstance(costs, list):
        costs = costs[0] if costs else None
    if not costs:  # some PJRT backends return None/empty: degrade, not crash
        return {"flops": -1.0, "bytes_accessed": -1.0,
                "utilization_hint": -1.0}
    return {
        "flops": float(costs.get("flops", -1)),
        "bytes_accessed": float(costs.get("bytes accessed", -1)),
        "utilization_hint": float(costs.get("utilization operand 0 {}", -1)),
    }


def count_params(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))


def model_complexity(fn: Callable, params, *example_args) -> str:
    """ptflops-style one-line summary: params + GFLOPs of one forward."""
    costs = cost_analysis(lambda *a: fn(params, *a), *example_args)
    n = count_params(params)
    return (
        f"params: {n / 1e6:.2f}M, forward flops: {costs['flops'] / 1e9:.2f} GFLOPs, "
        f"bytes accessed: {costs['bytes_accessed'] / 1e6:.1f} MB"
    )


@contextlib.contextmanager
def trace(logdir: str, enabled: bool = True):
    """``jax.profiler`` trace context (view in TensorBoard / Perfetto)."""
    if not enabled:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Throughput:
    """Samples/sec meter (reference ``train_largescale.py:904-911``)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._t0 = time.time()
        self._n = 0

    def update(self, n: int):
        self._n += n

    def rate(self) -> float:
        dt = time.time() - self._t0
        return self._n / dt if dt > 0 else 0.0


def _hard_sync(out):
    """Force completion via a host fetch of one scalar-ish leaf —
    ``block_until_ready`` does not reliably block on tunneled TPU backends."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf)).ravel()[:1]


def benchmark(fn: Callable, *args, warmup: int = 3, iters: int = 20) -> float:
    """Mean wall-clock seconds per call of a jitted fn (hard host sync)."""
    for _ in range(warmup):
        _hard_sync(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    _hard_sync(out)
    return (time.perf_counter() - t0) / iters
