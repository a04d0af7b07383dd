"""SSL end-to-end learning assertion: DINO multi-crop pretraining on
synthetic identities must separate them WITHOUT labels.

Asserts (exit code 1 on failure): after STEPS on-chip steps, the teacher
backbone's k-NN identity accuracy on HELD-OUT images rises from ~chance
(1/N_IDS) to ≥ ASSERT_KNN, and bin-pair verification accuracy to
≥ ASSERT_VER — i.e. the full LAFS stack (device multi-crop aug → frozen
landmark patch tokens → teacher/student DINO distillation with psum
centering → EMA) demonstrably LEARNS, not just runs. Seeded and
reproducible. Reference behavior matched: ``lafs_train.py:474-623``
training dynamics at toy scale.

Anti-collapse recipe — found by on-chip sweep (runtime-scalar hypers, ONE
compile, ~40 s per 3000-step config). Three structural pieces and one
hyperparameter regime were each necessary at toy scale:

1. **Stable landmarks** (``--fixed-grid``, default on): the real pipeline
   uses a PRETRAINED frozen landmark CNN; a random-init one min-max
   -amplifies pixel noise, so patch positions jump chaotically between
   crops of the same image and the two views share nothing learnable —
   every config collapses. Pinning the provider's output layer to the
   standard grid (kernel=0, bias=grid — the ``use_standcoord`` analogue,
   ``ViT_face.py:727``) restores learnable correspondence.
2. **Geometric (luminance) identities**, not color fields: the LAFS
   photometric augmentation (hue/saturation jitter + grayscale) erases
   color identity by construction; oriented-grating + blob-layout
   identities survive it, like real face structure.
3. **Hard-cropped probes**: random-init features already separate CLEAN
   toy images (kNN ≈ 0.7 at init), so the eval targets what DINO actually
   learns — crop/flip invariance (probes are 40-70%-area crops + flips;
   the gallery stays clean).
4. **High teacher momentum (0.9997) + lr 2e-3**: at toy scale the teacher
   sees only ~500 images, and lower momenta (0.99-0.996) let it track the
   student into the uniform-collapse pole (loss → ln(out_dim), kNN at
   floor). mom ≥0.9995 holds targets stable long enough for structure to
   form: on-chip sweep measured kNN 0.19 (init) → 0.65 at 4k steps for
   mom 0.9997/lr 2e-3 (0.55-0.65 across the mom 0.9995-0.9997 ×
   lr 1e-3-2e-3 grid; teacher-temp warmup HURT at this scale).
Last-layer frozen for the first 30 steps (reference epoch-0 freeze).
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_default_prng_impl", "rbg")
if "--cpu" in sys.argv:
    # recipe iteration off-chip (env-var platform overrides are unreliable
    # when a TPU plugin pre-sets JAX_PLATFORMS — pin via config)
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from lafs_cvpr2024_tpu.eval.verification import perform_val
from lafs_cvpr2024_tpu.models.partfvit import PartFViT, PartFViTConfig
from lafs_cvpr2024_tpu.train.ssl import (
    SSLConfig,
    create_landmark_provider,
    create_ssl_state,
    make_ssl_train_step,
)

from _util import _flag  # noqa: E402  (benchmarks/ path, shared helper)

N_IDS = _flag("--n-ids", 64, int)
PER, B = 512 // N_IDS, 32
STEPS = _flag("--steps", 4000, int)
LR = _flag("--lr", 2e-3)
WD = _flag("--wd", 0.01)
MOM = _flag("--momentum", 0.9997)
TTEMP = _flag("--teacher-temp", 0.04)
OUT_DIM = _flag("--out-dim", 1024, int)
CENTER_MOM = _flag("--center-mom", 0.99)
FIXED_GRID = "--no-fixed-grid" not in sys.argv
SIZE = 48
ASSERT_KNN = 0.40   # vs init ≈ 0.19 on hard-cropped probes; chance = 1/N_IDS
ASSERT_VER = 0.70   # chance = 0.5


def make_bases(rng, n_ids, size=SIZE):
    """GEOMETRIC luminance identities: oriented gratings + Gaussian blobs
    with identity-specific orientations/frequencies/positions.

    Color fields don't survive the LAFS photometric augmentation (hue/
    saturation jitter + random grayscale erase color identity — the task
    becomes unlearnable by construction); spatial-structure identities are
    jitter/blur/crop-robust, like real faces."""
    yy, xx = np.mgrid[0:size, 0:size] / size
    bases = np.zeros((n_ids, size, size, 3), np.float32)
    for i in range(n_ids):
        img = np.zeros((size, size))
        for _ in range(3):  # oriented gratings
            th = rng.uniform(0, np.pi)
            f = rng.uniform(2.0, 6.0)
            ph = rng.uniform(0, 2 * np.pi)
            img += rng.uniform(0.5, 1.0) * np.sin(
                2 * np.pi * f * (np.cos(th) * xx + np.sin(th) * yy) + ph
            )
        for _ in range(3):  # blob layout
            cx, cy = rng.uniform(0.15, 0.85, 2)
            s = rng.uniform(0.08, 0.2)
            img += rng.choice([-1.5, 1.5]) * np.exp(
                -((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * s * s)
            )
        img = (img - img.min()) / (img.max() - img.min() + 1e-9)
        # near-gray: identical structure per channel + slight tint
        tint = rng.uniform(0.9, 1.1, 3)
        bases[i] = np.clip(img[..., None] * tint, 0, 1)
    return bases


def samples(rng, bases, per):
    imgs, labels = [], []
    for i in range(len(bases)):
        for _ in range(per):
            imgs.append(np.clip(bases[i] + rng.normal(0, 0.05, bases[i].shape), 0, 1))
            labels.append(i)
    return np.stack(imgs).astype(np.float32), np.asarray(labels)


def hard_crop(vr, img, size=SIZE):
    """Random 40-70%-area crop + flip, resized back (the probe transform —
    shared with benchmarks/ssl_recipe_sweep.py; the draw ORDER from ``vr``
    is part of the seeded construction, do not reorder)."""
    s = vr.uniform(0.4, 0.7)
    side = max(8, int(size * np.sqrt(s)))
    y = vr.integers(0, size - side + 1)
    x = vr.integers(0, size - side + 1)
    crop = img[y:y + side, x:x + side]
    if vr.random() < 0.5:
        crop = crop[:, ::-1]
    from PIL import Image

    pil = Image.fromarray((crop * 255).astype(np.uint8))
    return np.asarray(pil.resize((size, size), Image.BILINEAR))


def pin_fixed_grid(land, num_patches, patch_size):
    """Stable-landmark analogue of the production pipeline's PRETRAINED
    frozen landmark CNN: pin the provider's output layer to the standard
    grid (kernel=0, bias=grid — the use_standcoord analogue)."""
    from lafs_cvpr2024_tpu.ops.patchify import standard_grid_landmarks

    grid = standard_grid_landmarks(num_patches, patch_size).reshape(-1)
    out_layer = land["params"]["landmark"]["output_layer"]
    out_layer["kernel"] = jnp.zeros_like(out_layer["kernel"])
    out_layer["bias"] = jnp.asarray(grid)


def make_embed_fns(cfg, land, size=SIZE):
    """(jitted token-path embed, batched uint8 embed with L2 norm)."""
    from lafs_cvpr2024_tpu.models.partfvit import LandmarkProvider

    backbone = PartFViT(
        PartFViTConfig(**{**cfg.model.__dict__, "with_land": False,
                          "loss_type": "None"})
    )
    provider = LandmarkProvider(
        num_landmarks=cfg.model.num_patches, patch_size=cfg.model.patch_size,
        stn_mode=cfg.model.stn_mode, coord_scale=float(size - 1),
    )

    @jax.jit
    def embed(params, images):
        _, toks = provider.apply(land, images)
        return backbone.apply({"params": params["backbone"]}, toks)

    def embed_u8(params, u8):
        out = []
        for s in range(0, len(u8), 128):
            x = jnp.asarray(u8[s:s + 128], jnp.float32) / 255.0 * 2 - 1
            out.append(np.asarray(embed(params, x)))
        e = np.concatenate(out)
        return e / np.maximum(np.linalg.norm(e, axis=1, keepdims=True), 1e-9)

    return embed, embed_u8


def knn_accuracy(embed_u8, teacher, train_u8, train_labels, v_u8, v_labels,
                 n_ids):
    """Teacher k-NN (k=5, cosine) identity accuracy: held-out probes vs the
    train gallery — the standard DINO eval at toy scale."""
    gal = embed_u8(teacher, train_u8)
    probe = embed_u8(teacher, v_u8)
    sims = probe @ gal.T
    top = np.argsort(-sims, axis=1)[:, :5]
    votes = train_labels[top]
    pred = np.array([np.bincount(v, minlength=n_ids).argmax() for v in votes])
    return float((pred == v_labels).mean())


def main():
    rng = np.random.default_rng(0)
    cfg = SSLConfig(
        model=PartFViTConfig(
            image_size=SIZE, dim=64, depth=2, heads=2, dim_head=32, mlp_dim=128,
            num_patches=36, with_land=False, loss_type="None", num_classes=0,
            stn_mode="small",
        ),
        out_dim=OUT_DIM, head_hidden_dim=128, head_bottleneck_dim=32,
        center_momentum=CENTER_MOM,
        local_crops_number=4, local_keep_landmarks=16,
        global_crops_scale=(0.5, 1.0),
        landmark_jitter_std=2.0,  # N(0,5²) at 112px ≈ N(0,2²) at 48px
        compute_dtype=jnp.float32, fused_device_aug=True,
    )
    mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1), ("data", "model"))
    state = jax.jit(lambda r: create_ssl_state(cfg, r))(jax.random.PRNGKey(0))
    land = create_landmark_provider(cfg, jax.random.PRNGKey(1))
    if FIXED_GRID:
        # recipe piece 1 (see module docstring): stable landmarks
        pin_fixed_grid(land, cfg.model.num_patches, cfg.model.patch_size)
    step = make_ssl_train_step(cfg, mesh)

    bases = make_bases(rng, N_IDS)
    train_imgs, train_labels = samples(rng, bases, PER)
    train_u8 = (train_imgs * 255).astype(np.uint8)

    # held-out probe/gallery + verification pairs from the same identities.
    # PROBES ARE HEAVILY CROPPED (random 40-70% area crops + flips): random
    # -init features already separate the clean fields (kNN ~0.7 at init),
    # so the assertion targets the thing DINO actually learns — crop/flip
    # INVARIANCE. The gallery stays clean.
    vr = np.random.default_rng(1)
    v_imgs, v_labels = samples(vr, bases, 6)

    v_u8 = np.stack([hard_crop(vr, im) for im in v_imgs])
    n_pairs = 48
    val = np.zeros((2, n_pairs * 2, SIZE, SIZE, 3), np.uint8)
    issame = np.zeros(n_pairs, bool)
    for p in range(n_pairs):
        issame[p] = p % 2 == 0
        i = vr.integers(0, len(v_imgs))
        cands = np.where(
            (v_labels == v_labels[i]) if issame[p] else (v_labels != v_labels[i])
        )[0]
        cands = cands[cands != i]
        j = vr.choice(cands)
        val[0, 2 * p] = v_u8[i]
        val[0, 2 * p + 1] = v_u8[j]
    val[1] = val[0, :, :, ::-1]

    embed, embed_u8 = make_embed_fns(cfg, land)

    def knn_acc():
        return knn_accuracy(embed_u8, state.teacher, train_u8, train_labels,
                            v_u8, v_labels, N_IDS)

    def ver_acc():
        res = perform_val(
            lambda b: embed(state.teacher, jnp.asarray((b + 0.5) * 2 - 1)),
            val, issame, batch_size=96, input_scale="half",
        )
        return res.accuracy

    print("data+state ready; first eval...", flush=True)
    knn0, ver0 = knn_acc(), ver_acc()
    print(f"start: kNN {knn0:.3f} ver {ver0:.3f} "
          f"(lr {LR} wd {WD} mom {MOM} ttemp {TTEMP} out {OUT_DIM})", flush=True)
    t0 = time.perf_counter()
    warmup = 100
    for s in range(STEPS):
        idx = np.random.default_rng(s).choice(len(train_u8), B, replace=False)
        raw = jnp.asarray(train_u8[idx])
        lr = LR * min(1.0, (s + 1) / warmup) * (
            0.5 * (1 + np.cos(np.pi * max(0, s - warmup) / max(1, STEPS - warmup)))
        )
        dummy = jnp.zeros((1,), jnp.float32)
        state, m = step(
            state, land, raw, dummy, dummy, dummy,
            lr=jnp.float32(lr), wd=jnp.float32(WD),
            momentum=jnp.float32(MOM), teacher_temp=jnp.float32(TTEMP),
            freeze_last=jnp.float32(0.0 if s < 30 else 1.0),
        )
        if s % 500 == 0:
            # early collapse telemetry: uniform collapse shows as
            # loss == ln(out_dim) and chance-level kNN
            print(f"step {s}: loss {float(m['loss']):.4f} "
                  f"(ln(out)={np.log(OUT_DIM):.4f}) kNN {knn_acc():.3f}",
                  flush=True)
    print(f"{STEPS} steps in {time.perf_counter() - t0:.1f}s")
    knn1, ver1 = knn_acc(), ver_acc()
    print(f"teacher kNN identity acc (held-out, no labels): {knn0:.3f} -> {knn1:.3f} "
          f"(chance {1 / N_IDS:.3f}, assert >= {ASSERT_KNN})")
    print(f"bin verification acc: {ver0:.3f} -> {ver1:.3f} (assert >= {ASSERT_VER})")
    ok = knn1 >= ASSERT_KNN and ver1 >= ASSERT_VER
    print("SSL LEARNING ASSERTION:", "PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
