"""Microbenchmark: transformer-MLP dropout cost and a fused Pallas MLP.

Quantifies — on the real chip — where the SSL step's ~13 ms dropout cost
(docs/PERF.md) actually goes, and whether a Pallas kernel that keeps the
2048-wide hidden activation in VMEM and draws dropout bits with the
in-kernel PRNG can beat the XLA lowering.

Variants (forward-only, flagship student shape: 22080 tokens x 768,
mlp_dim 2048, bf16):
  xla_nodrop   x@W1 -> gelu -> @W2                        (XLA)
  xla_drop     + uint16-threshold dropout after gelu and after fc2 (XLA,
               exactly the shipped FastDropout lowering)
  pallas_nodrop  fused kernel, no dropout
  pallas_drop    fused kernel, in-kernel PRNG dropout (no bits in HBM)

Usage: python benchmarks/bench_mlp_fusion.py [tokens]
"""

import functools
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
jax.config.update("jax_default_prng_impl", "rbg")

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

D, H = 768, 2048
TILE = 256  # token tile; hidden tile 256x2048 fp32 = 2 MB VMEM


def _gelu_exact(x):
    # Mosaic lacks erf/erfc; Abramowitz-Stegun 7.1.26 rational erf approx
    # (|err| <= 1.5e-7 — below bf16 resolution, numerically "exact")
    z = x * (2.0 ** -0.5)
    s = jnp.sign(z)
    a = jnp.abs(z)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
           + t * (-1.453152027 + t * 1.061405429))))
    erf = s * (1.0 - poly * jnp.exp(-a * a))
    return x * 0.5 * (1.0 + erf)


def _mlp_kernel(seed_ref, x_ref, w1_ref, w2_ref, o_ref, *, rate: float):
    h = jnp.dot(x_ref[:], w1_ref[:], preferred_element_type=jnp.float32)
    h = _gelu_exact(h)
    if rate > 0.0:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
        keep = 1.0 - rate
        thresh = np.uint32(int(round(keep * 2**32)) & 0xFFFFFFFF)
        bits = pltpu.bitcast(pltpu.prng_random_bits(h.shape), jnp.uint32)
        h = jnp.where(bits < thresh, h / keep, 0.0)
    h = h.astype(jnp.bfloat16)
    o = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)
    if rate > 0.0:
        bits = pltpu.bitcast(pltpu.prng_random_bits(o.shape), jnp.uint32)
        keep = 1.0 - rate
        thresh = np.uint32(int(round(keep * 2**32)) & 0xFFFFFFFF)
        o = jnp.where(bits < thresh, o / keep, 0.0)
    o_ref[:] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("rate",))
def pallas_mlp(seed, x, w1, w2, rate=0.0):
    n = x.shape[0]
    # pad to the tile like the production kernel (a floor-grid would leave
    # the last n % TILE output rows UNWRITTEN — garbage that feeds the
    # chained timing loop while FLOPs are counted for all n)
    np_tokens = pl.cdiv(n, TILE) * TILE
    if np_tokens != n:
        x = jnp.pad(x, ((0, np_tokens - n), (0, 0)))
    grid = (np_tokens // TILE,)
    out = pl.pallas_call(
        functools.partial(_mlp_kernel, rate=rate),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((TILE, D), lambda i, s: (i, 0)),
                pl.BlockSpec((D, H), lambda i, s: (0, 0)),
                pl.BlockSpec((H, D), lambda i, s: (0, 0)),
            ],
            out_specs=pl.BlockSpec((TILE, D), lambda i, s: (i, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((np_tokens, D), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(seed, x, w1, w2)
    return out[:n]


def _fast_dropout(key, x, rate):
    keep = 1.0 - rate
    thresh = jnp.uint16(min(int(round(keep * 65536.0)), 65535))
    bits = jax.random.bits(key, x.shape, jnp.uint16)
    return jnp.where(bits < thresh, x / keep, jnp.zeros_like(x))


@functools.partial(jax.jit, static_argnames=("rate",))
def xla_mlp(key, x, w1, w2, rate=0.0):
    h = jnp.dot(x, w1, preferred_element_type=jnp.float32)
    h = jax.nn.gelu(h, approximate=False).astype(jnp.bfloat16)
    if rate > 0.0:
        k1, k2 = jax.random.split(key)
        h = _fast_dropout(k1, h, rate)
    o = jnp.dot(h, w2, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    if rate > 0.0:
        o = _fast_dropout(k2, o, rate)
    return o


def time_fn(fn, *args, iters=30):
    # serialize by chaining: out feeds back as x
    out = fn(*args)
    jax.block_until_ready(out)
    float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    x = args[1]
    for _ in range(iters):
        out = fn(args[0], x, *args[2:])
        x = out  # chain dependency
    float(jnp.sum(out.astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 22016  # ~22080, 256-mult
    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (n, D), jnp.bfloat16)
    w1 = jax.random.normal(k, (D, H), jnp.bfloat16) * 0.02
    w2 = jax.random.normal(k, (H, D), jnp.bfloat16) * 0.02
    seed = jnp.zeros((1,), jnp.int32)
    key = jax.random.PRNGKey(1)

    flops = 2 * n * D * H * 2
    res = {}
    res["xla_nodrop"] = time_fn(lambda s, x, a, b: xla_mlp(key, x, a, b, 0.0), seed, x, w1, w2)
    res["xla_drop"] = time_fn(lambda s, x, a, b: xla_mlp(key, x, a, b, 0.1), seed, x, w1, w2)
    res["pallas_nodrop"] = time_fn(lambda s, x, a, b: pallas_mlp(s, x, a, b, 0.0), seed, x, w1, w2)
    res["pallas_drop"] = time_fn(lambda s, x, a, b: pallas_mlp(s, x, a, b, 0.1), seed, x, w1, w2)

    print(json.dumps({
        "tokens": n,
        **{k2: {"ms": round(v * 1e3, 3), "tflops": round(flops / v / 1e12, 1)}
           for k2, v in res.items()},
    }))


if __name__ == "__main__":
    main()
