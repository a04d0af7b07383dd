"""On-chip SSL recipe sweep: ONE compile, many hyperparameter configs.

The search tool behind docs/STATUS.md §ssl-recipe: lr / teacher-momentum /
teacher-temp / wd are runtime scalars of the jitted step, so every config
reuses the same compiled program — ~40 s per 3000-step config on the eval
chip instead of a recompile each. Identities/probes/landmark pinning come
from benchmarks/ssl_sanity.py (same seeded construction).

Edit CONFIGS below; ttemp < 0 means "warm up 0.01 → |ttemp| over 3k steps".
Usage: python benchmarks/ssl_recipe_sweep.py
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_default_prng_impl", "rbg")
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from lafs_cvpr2024_tpu.models.partfvit import PartFViTConfig
from lafs_cvpr2024_tpu.train.ssl import (
    SSLConfig, create_landmark_provider, create_ssl_state, make_ssl_train_step,
)

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))
import ssl_sanity as S

N_IDS, PER, B, SIZE = 64, 8, 32, 48
rng = np.random.default_rng(0)
bases = S.make_bases(rng, N_IDS, SIZE)
train_imgs, train_labels = S.samples(rng, bases, PER)
train_u8 = (train_imgs * 255).astype(np.uint8)
vr = np.random.default_rng(1)
v_imgs, v_labels = S.samples(vr, bases, 6)

v_u8 = np.stack([S.hard_crop(vr, im) for im in v_imgs])

cfg = SSLConfig(
    model=PartFViTConfig(
        image_size=SIZE, dim=64, depth=2, heads=2, dim_head=32, mlp_dim=128,
        num_patches=36, with_land=False, loss_type="None", num_classes=0,
        stn_mode="small",
    ),
    out_dim=1024, head_hidden_dim=128, head_bottleneck_dim=32,
    center_momentum=0.99, local_crops_number=4, local_keep_landmarks=16,
    global_crops_scale=(0.5, 1.0), compute_dtype=jnp.float32,
    landmark_jitter_std=2.0,  # N(0,5^2) on 112px scales to ~2px at 48px
    fused_device_aug=True,
)
mesh = Mesh(np.array(jax.devices()[:1]).reshape(1,1), ("data","model"))
land = create_landmark_provider(cfg, jax.random.PRNGKey(1))
# STABLE landmarks (recipe piece 1) — shared with ssl_sanity
S.pin_fixed_grid(land, 36, 8)
step = make_ssl_train_step(cfg, mesh)
embed, embed_u8 = S.make_embed_fns(cfg, land)

def knn(state):
    return S.knn_accuracy(embed_u8, state.teacher, train_u8, train_labels,
                          v_u8, v_labels, N_IDS)

CONFIGS = [
    # (tag, lr, mom, ttemp, steps, warmup)  ttemp<0 => warmup 0.01->|ttemp| over 3k
    ("mom9995_lr2e-3",      2e-3, 0.9995, 0.04,  10000, 300),
    ("mom9995_lr1e-3_ttw",  1e-3, 0.9995, -0.04, 10000, 300),
    ("mom9997_lr2e-3",      2e-3, 0.9997, 0.04,  10000, 300),
    ("mom9995_lr1e-3_6k",   1e-3, 0.9995, 0.04,  6000,  300),
    ("mom9995_lr1e-3_wd04", 1e-3, 0.9995, 0.04,  10000, 300),
]
dummy = jnp.zeros((1,), jnp.float32)
for tag, lr0, mom, tt, steps, warm in CONFIGS:
    state = jax.jit(lambda r: create_ssl_state(cfg, r))(jax.random.PRNGKey(0))
    print(f"[{tag}] init kNN {knn(state):.3f}", flush=True)
    t0 = time.time()
    for s in range(steps):
        idx = np.random.default_rng(s).choice(len(train_u8), B, replace=False)
        lr = lr0 * min(1.0, (s+1)/warm) * (0.5*(1+np.cos(np.pi*max(0,s-warm)/max(1,steps-warm))))
        wd = 0.04 if tag.endswith("wd04") else 0.01
        tt_s = (0.01 + (abs(tt) - 0.01) * min(1.0, s / 3000)) if tt < 0 else tt
        state, m = step(state, land, jnp.asarray(train_u8[idx]), dummy, dummy, dummy,
                        lr=jnp.float32(lr), wd=jnp.float32(wd),
                        momentum=jnp.float32(mom), teacher_temp=jnp.float32(tt_s),
                        freeze_last=jnp.float32(0.0 if s < 30 else 1.0))
        if s % 2000 == 1999:
            print(f"[{tag}] step {s+1}: loss {float(m['loss']):.4f} kNN {knn(state):.3f} ({time.time()-t0:.0f}s)", flush=True)
    print(f"[{tag}] FINAL loss {float(m['loss']):.4f} kNN {knn(state):.3f} in {time.time()-t0:.0f}s", flush=True)
