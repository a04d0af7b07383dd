"""Loss-trajectory A/B: fp32 teacher vs SR-bf16 teacher, same data/seed.

The quality evidence behind docs/PERF.md's bf16-SR-teacher entry: 60
flagship steps, fixed data and seed, losses printed every 10 steps —
measured agreement 6e-4 absolute (2026-08-17, this chip).

Usage: python benchmarks/ab_teacher_dtype.py {fp32|bf16} — one variant per
process so the single-core host never runs two chip jobs at once.
"""
import sys, time, json
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
jax.config.update("jax_default_prng_impl", "rbg")
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh
from lafs_cvpr2024_tpu.models.partfvit import PartFViTConfig
from lafs_cvpr2024_tpu.train.ssl import (SSLConfig, create_landmark_provider,
                                          create_ssl_state, make_ssl_train_step)

variant = sys.argv[1] if len(sys.argv) > 1 else "fp32"
n_dev = len(jax.devices())
mesh = Mesh(np.array(jax.devices()).reshape(n_dev, 1), ("data", "model"))
cfg = SSLConfig(
    model=PartFViTConfig(dim=768, depth=12, heads=11, dim_head=64, mlp_dim=2048,
                         num_patches=196, with_land=False, loss_type="None",
                         num_classes=0, mlp_impl="fused"),
    out_dim=100000, local_crops_number=8, compute_dtype=jnp.bfloat16,
    landmark_dtype=jnp.bfloat16, head_dtype=jnp.bfloat16,
    moment_dtype=jnp.bfloat16, fused_tail=True,
    teacher_dtype=jnp.bfloat16 if variant == "bf16" else jnp.float32,
)
state = jax.jit(lambda r: create_ssl_state(cfg, r))(jax.random.PRNGKey(0))
land = create_landmark_provider(cfg, jax.random.PRNGKey(1))
step = make_ssl_train_step(cfg, mesh, donate=True)
b = 32 * n_dev
shape = (b, 112, 112, 3)
k = jax.random.PRNGKey(2)
gc = jax.random.uniform(k, (2, *shape), jnp.float32) * 2 - 1
ga = jax.random.uniform(jax.random.PRNGKey(3), (2, *shape), jnp.float32) * 2 - 1
lc = jax.random.uniform(jax.random.PRNGKey(4), (8, *shape), jnp.float32) * 2 - 1
la = jax.random.uniform(jax.random.PRNGKey(5), (8, *shape), jnp.float32) * 2 - 1
args = dict(lr=jnp.float32(5e-4), wd=jnp.float32(0.04),
            momentum=jnp.float32(0.996), teacher_temp=jnp.float32(0.04),
            freeze_last=jnp.float32(1.0))
losses = []
for s in range(60):
    state, m = step(state, land, gc, ga, lc, la, **args)
    if s % 10 == 9:
        losses.append(round(float(m["loss"]), 4))
print(json.dumps({"variant": variant, "losses_every10": losses}))
