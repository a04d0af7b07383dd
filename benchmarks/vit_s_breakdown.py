"""Attribute the ViT-S north-star utilization gap (VERDICT r4 weak #2).

bench.py r4: ViT-S SSL step 58.9 ms at batch 32 vs a 40.9 ms geometry-aware
speed-of-light floor (geometry_sol 0.694, vs the flagship's 0.873). The
analytic FLOP table says the gap is NOT matmuls (the DINO head is only
~0.6 ms of it), so this script A/Bs the non-matmul suspects ON THE CHIP,
each isolated by one config/recipe toggle against the same baseline:

  base       bench.py's exact north-star config
  drop0      dropout=emb_dropout=drop_path=0   (RNG + mask traffic)
  head4k     out_dim=4096                      (DINO-head share, all 3 tails)
  teacher16  teacher_dtype=bfloat16            (teacher EMA HBM traffic)
  dense      mlp_impl='dense'                  (pallas fused_ln win at 384?)
  tailsep    fused_tail=False                  (fused-tail win at this size)
  b64drop0   batch 64 + dropout0               (fixed-overhead amortization)
  randcoor   random_coor=True                  (landmark-CNN share; the
                                               patch gather still runs —
                                               ViT_face.py:1391-1400)
  floor      drop0+head4k+randcoor             (additivity check: the step
                                               stripped of every attributed
                                               non-floor cost at once)

Prints one line per variant with ms/step, imgs/s, and delta vs base.
Run on the real chip: python benchmarks/vit_s_breakdown.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/benchmarks")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
jax.config.update("jax_default_prng_impl", "rbg")

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from lafs_cvpr2024_tpu.models.partfvit import PartFViTConfig
from lafs_cvpr2024_tpu.train.ssl import (
    SSLConfig,
    create_landmark_provider,
    create_ssl_state,
    make_ssl_train_step,
)

from _util import _flag  # noqa: E402

ITERS = int(_flag("--iters", 10))
WINDOWS = int(_flag("--windows", 3))


def north_star(batch=32, out_dim=100000, drop=True, teacher16=False,
               mlp_impl="fused_ln", fused_tail=True, random_coor=False):
    model = dict(
        dim=384, depth=12, heads=6, dim_head=64, mlp_dim=1536,
        num_patches=196, with_land=False, loss_type="None", num_classes=0,
        mlp_impl=mlp_impl,
    )
    if not drop:
        model.update(dropout=0.0, emb_dropout=0.0, drop_path_rate=0.0)
    return SSLConfig(
        model=PartFViTConfig(**model),
        out_dim=out_dim,
        local_crops_number=8,
        compute_dtype=jnp.bfloat16,
        landmark_dtype=jnp.bfloat16,
        head_dtype=jnp.bfloat16,
        moment_dtype=jnp.bfloat16,
        teacher_dtype=jnp.bfloat16 if teacher16 else jnp.float32,
        fused_tail=fused_tail,
        random_coor=random_coor,
    ), batch


def measure(cfg, batch, tag):
    n_dev = len(jax.devices())
    mesh = Mesh(np.array(jax.devices()).reshape(n_dev, 1), ("data", "model"))
    state = jax.jit(lambda r: create_ssl_state(cfg, r))(jax.random.PRNGKey(0))
    land = create_landmark_provider(cfg, jax.random.PRNGKey(1))
    step = make_ssl_train_step(cfg, mesh, donate=True)
    b = batch * n_dev
    shape = (b, 112, 112, 3)
    k = jax.random.PRNGKey(2)
    gc = jax.random.uniform(k, (2, *shape), jnp.float32) * 2 - 1
    lc = jax.random.uniform(
        k, (cfg.local_crops_number, *shape), jnp.float32) * 2 - 1
    args = dict(lr=jnp.float32(5e-4), wd=jnp.float32(0.04),
                momentum=jnp.float32(0.996), teacher_temp=jnp.float32(0.04),
                freeze_last=jnp.float32(1.0))
    state, m = step(state, land, gc, gc, lc, lc, **args)
    float(m["loss"])
    dts = []
    for _ in range(WINDOWS):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            state, m = step(state, land, gc, gc, lc, lc, **args)
        float(m["loss"])
        dts.append((time.perf_counter() - t0) / ITERS)
    dt = min(dts)
    return dt * 1e3, b / dt


def main():
    variants = [
        ("base", north_star()),
        ("drop0", north_star(drop=False)),
        ("head4k", north_star(out_dim=4096)),
        ("teacher16", north_star(teacher16=True)),
        ("dense", north_star(mlp_impl="dense")),
        ("tailsep", north_star(fused_tail=False)),
        ("b64drop0", north_star(batch=64, drop=False)),
        ("randcoor", north_star(random_coor=True)),
        ("floor", north_star(out_dim=4096, drop=False, random_coor=True)),
    ]
    base_ms = None
    for tag, (cfg, batch) in variants:
        ms, ips = measure(cfg, batch, tag)
        if tag == "base":
            base_ms = ms
        delta = "" if base_ms is None or tag == "base" else (
            f"  ({ms - base_ms:+.1f} ms vs base)")
        print(f"[{tag:>9}] {ms:7.1f} ms/step  {ips:7.1f} imgs/s{delta}",
              flush=True)


if __name__ == "__main__":
    main()
