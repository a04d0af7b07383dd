"""Supervised train-step throughput (flagship: with_land, CosFace-205990).

Not the driver's bench.py — an auxiliary number for docs/PARITY.md.
Usage: python bench_supervised.py [attn_impl]  (einsum | fused | flash)
— unlike the SSL step (8 of 10 crops are 37-token locals, below the
fused kernel's 128-token gate), EVERY supervised sequence is 197 tokens,
so the whole-seq pallas attention kernel applies to all of them.
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
    attn = sys.argv[1] if len(sys.argv) > 1 else "einsum"
    n_dev = len(jax.devices())
    mesh = Mesh(np.array(jax.devices()).reshape(n_dev, 1), ("data", "model"))
    cfg = SupervisedConfig(
        model=PartFViTConfig(
            dim=768, depth=12, heads=11, dim_head=64, mlp_dim=2048,
            num_patches=196, num_classes=NUM_CLASSES, with_land=True,
            loss_type="CosFace", mlp_impl="fused", attn_impl=attn,
        ),
        acc_step=3,
        moment_dtype=jnp.bfloat16,
        mixup=MixupConfig(mixup_alpha=0.2, prob=0.1, num_classes=NUM_CLASSES),
        shard_classifier=False,
    )
    state = jax.jit(lambda r: create_state(cfg, r))(jax.random.PRNGKey(0))
    w, w_opt = create_classifier(cfg, jax.random.PRNGKey(1))
    step = make_train_step(cfg, mesh)
    rows = cfg.acc_step * B * n_dev
    images = jax.random.uniform(jax.random.PRNGKey(2), (rows, 112, 112, 3)) * 2 - 1
    labels = jnp.arange(rows) % NUM_CLASSES
    t0 = time.perf_counter()
    state, w, w_opt, m = step(state, w, w_opt, images, labels, 1e-4)
    print("compile+1st:", round(time.perf_counter() - t0, 1), "s; loss", float(m["loss"]))
    t0 = time.perf_counter()
    for _ in range(10):
        state, w, w_opt, m = step(state, w, w_opt, images, labels, 1e-4)
    float(m["loss"])
    dt = (time.perf_counter() - t0) / 10
    print(f"supervised flagship [{attn}]: {dt*1000:.1f} ms/step ({rows} imgs) -> "
          f"{rows/dt/n_dev:.1f} imgs/s/chip")

if __name__ == "__main__":
    main()
