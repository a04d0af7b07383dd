"""Supervised train-step throughput (flagship: with_land, CosFace-205990).

Not the driver's bench.py — an auxiliary number for docs/PARITY.md.
Usage: python bench_supervised.py [variant]
  base     — shipped config (einsum attention, acc 3x64, mixup, CosFace,
             with_land)
  fused / flash — attention impl swap (197-token sequences everywhere)
  acc1     — no grad-accumulation scan: one 192-row microbatch
  nomixup  — mixup/cutmix disabled (device-side mixup cost)
  smallhead — 1,000 classes instead of 205,990 (margin-head + CE cost)
  noland   — with_land=False (landmark CNN + patch-gather cost)
  factored — factored external-head dW accumulation (one dW GEMM + one
             weight-norm pass per step; docs/PERF.md §factored-head)
  pfc      — PartialFC sampled head at ratio 0.1 (20,599 of 205,990
             classes/step, block sampler; parallel/partial_fc.py)
  pfcuni   — PartialFC ratio 0.1 with the insightface-faithful 'uniform'
             scattered sampler (docs/PERF.md §partial-fc)
  fusedln  — base + mlp_impl='fused_ln' (pre-MLP LayerNorm inside the
             pallas MLP kernel; docs/PERF.md §round-3)
  pfcln    — pfc + mlp_impl='fused_ln' (best-known supervised config)
  pfclnq   — pfcln + attn_impl='lnqkv' (pre-attention LN fused into the
             QKV projection kernel; ops/fused_ln_linear.py)
DIAGNOSTIC variants quantify the supervised step's fixed costs the way
bench_ssl_variants.py bisected the SSL step.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
jax.config.update("jax_default_prng_impl", "rbg")
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from lafs_cvpr2024_tpu.models.partfvit import PartFViTConfig
from lafs_cvpr2024_tpu.ops.mixup import MixupConfig
from lafs_cvpr2024_tpu.train.supervised import (
    SupervisedConfig, create_classifier, create_state, make_train_step,
)

NUM_CLASSES = 205990
B = 64  # per microbatch; acc_step 3 → 192 rows/step (ref: 200/A100)

def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "base"
    attn = (
        variant if variant in ("fused", "flash")
        else "lnqkv" if variant == "pfclnq"
        else "einsum"
    )
    n_dev = len(jax.devices())
    mesh = Mesh(np.array(jax.devices()).reshape(n_dev, 1), ("data", "model"))
    cfg = SupervisedConfig(
        model=PartFViTConfig(
            dim=768, depth=12, heads=11, dim_head=64, mlp_dim=2048,
            num_patches=196,
            num_classes=1000 if variant == "smallhead" else NUM_CLASSES,
            with_land=variant != "noland",
            loss_type="CosFace",
            mlp_impl="fused_ln" if variant in ("fusedln", "pfcln", "pfclnq")
            else "fused",
            attn_impl=attn,
        ),
        acc_step=1 if variant == "acc1" else 3,
        moment_dtype=jnp.bfloat16,
        mixup=MixupConfig(
            mixup_alpha=0.2, prob=0.0 if variant == "nomixup" else 0.1,
            num_classes=1000 if variant == "smallhead" else NUM_CLASSES,
        ),
        shard_classifier=False,
        factored_head=variant in ("factored", "pfc", "pfcuni", "pfcln",
                                  "pfclnq"),
        pfc_ratio=0.1 if variant in ("pfc", "pfcuni", "pfcln", "pfclnq")
        else 1.0,
        pfc_sampler="uniform" if variant == "pfcuni" else "block",
    )
    B_local = 192 if variant == "acc1" else B
    state = jax.jit(lambda r: create_state(
        cfg, r, sharded_classifier=cfg.factored_head))(jax.random.PRNGKey(0))
    w, w_opt = create_classifier(
        cfg, jax.random.PRNGKey(1), enabled=cfg.factored_head)
    step = make_train_step(cfg, mesh, donate=True)  # in-place update like every steady-state bench
    rows = cfg.acc_step * B_local * n_dev
    images = jax.random.uniform(jax.random.PRNGKey(2), (rows, 112, 112, 3)) * 2 - 1
    labels = jnp.arange(rows) % cfg.model.num_classes
    t0 = time.perf_counter()
    state, w, w_opt, m = step(state, w, w_opt, images, labels, 1e-4)
    print("compile+1st:", round(time.perf_counter() - t0, 1), "s; loss", float(m["loss"]))
    t0 = time.perf_counter()
    for _ in range(10):
        state, w, w_opt, m = step(state, w, w_opt, images, labels, 1e-4)
    float(m["loss"])
    dt = (time.perf_counter() - t0) / 10
    print(f"supervised flagship [{variant}]: {dt*1000:.1f} ms/step ({rows} imgs) -> "
          f"{rows/dt/n_dev:.1f} imgs/s/chip")

if __name__ == "__main__":
    main()
