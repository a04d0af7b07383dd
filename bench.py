"""Benchmark: SSL multi-crop train-step throughput on the real chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "imgs/sec/chip", "vs_baseline": N}

Baseline anchor (BASELINE.md): the reference SSL pretrain runs ~2-3 days on
2×A100 for 41 epochs over the 40% MS1M subset (~2.05M imgs/epoch) at batch
82/GPU → ≈ 190 imgs/sec per A100. vs_baseline = ours / 190.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
# hardware-accelerated PRNG: threefry dropout masks cost ~30% of the SSL step
jax.config.update("jax_default_prng_impl", "rbg")

import jax.numpy as jnp
import numpy as np

A100_SSL_IMGS_PER_SEC = 190.0  # per-GPU anchor derived from README.md:68


def main():
    from jax.sharding import Mesh

    from lafs_cvpr2024_tpu.models.partfvit import PartFViTConfig
    from lafs_cvpr2024_tpu.train.ssl import (
        SSLConfig,
        create_landmark_provider,
        create_ssl_state,
        make_ssl_train_step,
    )

    n_dev = len(jax.devices())
    mesh = Mesh(np.array(jax.devices()).reshape(n_dev, 1), ("data", "model"))

    # flagship SSL config: ViT-B-ish dim 768 / depth 12 / heads 11, 2 global
    # + 8 local crops (lafs_train.py:302-333)
    batch = 32 * n_dev  # per-chip batch 32 samples (x10 crops each)
    cfg = SSLConfig(
        model=PartFViTConfig(
            dim=768, depth=12, heads=11, dim_head=64, mlp_dim=2048,
            num_patches=196, with_land=False, loss_type="None", num_classes=0,
            mlp_impl="fused_ln",  # pallas LN+fc1+gelu+dropout+fc2 kernel
        ),
        out_dim=100000,
        local_crops_number=8,
        compute_dtype=jnp.bfloat16,
        landmark_dtype=jnp.bfloat16,
        head_dtype=jnp.bfloat16,
        moment_dtype=jnp.bfloat16,  # AdamW moment storage (fp32 math)
    )

    rng = jax.random.PRNGKey(0)
    state = jax.jit(lambda r: create_ssl_state(cfg, r))(rng)
    land = create_landmark_provider(cfg, jax.random.PRNGKey(1))
    step = make_ssl_train_step(cfg, mesh, donate=True)

    shape = (batch, 112, 112, 3)
    k = jax.random.PRNGKey(2)
    gc = jax.random.uniform(k, (2, *shape), jnp.float32) * 2 - 1
    ga = jax.random.uniform(k, (2, *shape), jnp.float32) * 2 - 1
    lc = jax.random.uniform(k, (cfg.local_crops_number, *shape), jnp.float32) * 2 - 1
    la = jax.random.uniform(k, (cfg.local_crops_number, *shape), jnp.float32) * 2 - 1
    args = dict(
        lr=jnp.float32(5e-4), wd=jnp.float32(0.04), momentum=jnp.float32(0.996),
        teacher_temp=jnp.float32(0.04), freeze_last=jnp.float32(1.0),
    )

    # warmup/compile; float() fetch is a hard sync (block_until_ready does
    # not reliably block on the tunneled TPU backend)
    state, m = step(state, land, gc, ga, lc, la, **args)
    float(m["loss"])

    # best-of-4 windows: the eval tunnel intermittently degrades (observed
    # 0.5-9 s/step dispatch stalls); the device step time is a hard floor,
    # so the fastest window is the honest hardware number while a single
    # window could record a transient-interference artifact
    iters, windows = 10, 4
    dts = []
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            state, m = step(state, land, gc, ga, lc, la, **args)
        float(m["loss"])  # state chain serializes steps; one fetch syncs
        dts.append((time.perf_counter() - t0) / iters)
    dt = min(dts)
    if max(dts) > 1.5 * dt:
        print(f"[bench] window variance (tunnel interference?): "
              f"{[round(d * 1e3, 1) for d in dts]} ms/step, using best",
              file=sys.stderr)

    imgs_per_sec_per_chip = batch / dt / n_dev
    print(
        json.dumps(
            {
                "metric": "SSL pretrain imgs/sec/chip (Part-fViT-B multi-crop, 2g+8l)",
                "value": round(imgs_per_sec_per_chip, 2),
                "unit": "imgs/sec/chip",
                "vs_baseline": round(imgs_per_sec_per_chip / A100_SSL_IMGS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
