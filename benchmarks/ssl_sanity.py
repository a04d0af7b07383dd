"""SSL pipeline diagnostic on the real chip: DINO multi-crop pretraining on
synthetic identities, reporting the label-free verification accuracy of the
teacher embeddings.

NOTE: this is a DIAGNOSTIC, not an assertion — DINO at toy scale (8
identities x 16 smoothed-noise images, ~1k steps) sits in a collapse-prone
regime regardless of implementation; the mechanism-level checks (loss
decreases, EMA moves, center updates, gradients flow) live in
tests/test_ssl.py, and supervised end-to-end learning is asserted by
benchmarks/train_sanity.py."""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_default_prng_impl", "rbg")

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from lafs_cvpr2024_tpu.eval.verification import perform_val
from lafs_cvpr2024_tpu.models.partfvit import PartFViT, PartFViTConfig
from lafs_cvpr2024_tpu.ops.augment_device import lafs_multicrop_device
from lafs_cvpr2024_tpu.train.ssl import (
    SSLConfig,
    create_landmark_provider,
    create_ssl_state,
    make_ssl_train_step,
)

N_IDS, PER, STEPS, B = 8, 16, 1200, 32
SIZE = 48


def make_bases(rng, n_ids, size=SIZE):
    bases = rng.uniform(0, 1, (n_ids, size, size, 3)).astype(np.float32)
    bases = 0.5 + (bases - 0.5) * 1.6  # higher identity contrast
    for _ in range(3):
        bases = (bases + np.roll(bases, 1, 1) + np.roll(bases, 1, 2)) / 3
    return bases


def samples(rng, bases, per):
    imgs, labels = [], []
    for i in range(len(bases)):
        for _ in range(per):
            imgs.append(np.clip(bases[i] + rng.normal(0, 0.05, bases[i].shape), 0, 1))
            labels.append(i)
    return np.stack(imgs).astype(np.float32), np.asarray(labels)


def main():
    rng = np.random.default_rng(0)
    cfg = SSLConfig(
        model=PartFViTConfig(
            image_size=SIZE, dim=64, depth=2, heads=2, dim_head=32, mlp_dim=128,
            num_patches=36, with_land=False, loss_type="None", num_classes=0,
            stn_mode="small",
        ),
        out_dim=256, head_hidden_dim=128, head_bottleneck_dim=32,
        local_crops_number=4, local_keep_landmarks=16,
        compute_dtype=jnp.float32, fused_device_aug=True,
    )
    mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1), ("data", "model"))
    state = jax.jit(lambda r: create_ssl_state(cfg, r))(jax.random.PRNGKey(0))
    land = create_landmark_provider(cfg, jax.random.PRNGKey(1))
    step = make_ssl_train_step(cfg, mesh)

    bases = make_bases(rng, N_IDS)
    train_imgs, _ = samples(rng, bases, PER)
    train_u8 = (train_imgs * 255).astype(np.uint8)

    # held-out verification pairs from the same identities
    vr = np.random.default_rng(1)
    v_imgs, v_labels = samples(vr, bases, 4)
    n_pairs = 24
    val = np.zeros((2, n_pairs * 2, SIZE, SIZE, 3), np.uint8)
    issame = np.zeros(n_pairs, bool)
    for p in range(n_pairs):
        issame[p] = p % 2 == 0
        i = vr.integers(0, len(v_imgs))
        cands = np.where(
            (v_labels == v_labels[i]) if issame[p] else (v_labels != v_labels[i])
        )[0]
        j = vr.choice(cands)
        val[0, 2 * p] = (v_imgs[i] * 255).astype(np.uint8)
        val[0, 2 * p + 1] = (v_imgs[j] * 255).astype(np.uint8)
    val[1] = val[0, :, :, ::-1]

    backbone = PartFViT(
        PartFViTConfig(**{**cfg.model.__dict__, "with_land": False, "loss_type": "None"})
    )

    from lafs_cvpr2024_tpu.models.partfvit import LandmarkProvider

    provider = LandmarkProvider(
        num_landmarks=cfg.model.num_patches, patch_size=cfg.model.patch_size,
        stn_mode=cfg.model.stn_mode, coord_scale=float(SIZE - 1),
    )

    @jax.jit
    def embed(params, images):
        _, toks = provider.apply(land, images)
        return backbone.apply({"params": params["backbone"]}, toks)

    def eval_acc():
        res = perform_val(
            lambda b: embed(state.teacher, jnp.asarray((b + 0.5) * 2 - 1)),
            val, issame, batch_size=48, input_scale="half",
        )
        return res.accuracy

    acc0 = eval_acc()
    t0 = time.perf_counter()
    sched_m = 0.996
    dummy = jnp.zeros((1,), jnp.float32)
    for s in range(STEPS):
        idx = np.random.default_rng(s).choice(len(train_u8), B, replace=False)
        raw = jnp.asarray(train_u8[idx])
        state, m = step(
            state, land, raw, dummy, dummy, dummy,
            lr=jnp.float32(1.5e-3), wd=jnp.float32(1e-4),
            momentum=jnp.float32(0.99), teacher_temp=jnp.float32(0.04),
            freeze_last=jnp.float32(0.0 if s < 30 else 1.0),
        )
        if s % 200 == 0:
            print(f"step {s}: loss {float(m['loss']):.4f}", flush=True)
    print(f"{STEPS} steps in {time.perf_counter() - t0:.1f}s")
    acc1 = eval_acc()
    print(f"SSL verification accuracy (teacher, no labels): {acc0:.3f} -> {acc1:.3f}")
    if acc1 > 0.65:
        print("SSL DIAGNOSTIC: separation achieved")
    else:
        print("SSL DIAGNOSTIC: no separation at toy scale (expected; see docstring)")


if __name__ == "__main__":
    main()
