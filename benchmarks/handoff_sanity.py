"""End-to-end assertion of the LAFS core claim: SSL-pretrained init beats
scratch init after an identical supervised finetune.

The whole point of LAFS (reference ``README.md:96-97``: IJB-C 97.40
supervised-only vs 97.58 LAFS-pretrained) is the SSL -> supervised handoff
(``train_largescale.py:639-657`` loads the SSL TEACHER backbone before
finetuning). `ssl_sanity.py` asserts the SSL stage learns and
`train_sanity.py` asserts the supervised stage learns; THIS benchmark
asserts the composition transfers:

  1. DINO multi-crop SSL pretrain on synthetic identities (no labels) —
     the exact `ssl_sanity` recipe (fixed-grid landmarks, geometric
     luminance identities, mom 0.9997).
  2. TWO supervised CosFace finetunes with MATCHED steps/seed/data on a
     FEW-SHOT labeled subset (the reference's few-shot protocol,
     ``README.md:52-56``): one initialized from the SSL teacher backbone
     (merge_params, mirroring ``cli/train_supervised --ssl-checkpoint``),
     one from scratch.
  3. Both evaluated on HELD-OUT hard-cropped verification pairs (the
     crop-invariance probe from ssl_sanity — what SSL actually buys),
     every EVAL_EVERY steps; each arm scores its BEST checkpoint
     (early stopping on the held-out protocol — on a 2-shot labeled set
     both arms eventually overfit and converge to the same memorized
     solution, so final-step accuracy measures nothing; the measured
     curves are in docs/PERF.md).

Asserts (exit 1 on failure): SSL-init best verification accuracy beats
scratch-init best by >= MARGIN. Seeded and reproducible.
"""

import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/benchmarks")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_default_prng_impl", "rbg")
if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from lafs_cvpr2024_tpu.eval.verification import perform_val
from lafs_cvpr2024_tpu.models.partfvit import PartFViTConfig
from lafs_cvpr2024_tpu.ops.mixup import MixupConfig
from lafs_cvpr2024_tpu.train.checkpoint import merge_params
from lafs_cvpr2024_tpu.train.ssl import (
    SSLConfig,
    create_landmark_provider,
    create_ssl_state,
    make_ssl_train_step,
)
from lafs_cvpr2024_tpu.train.supervised import (
    SupervisedConfig,
    create_classifier,
    create_state,
    make_embed_fn,
    make_train_step,
)

from _util import _flag  # noqa: E402  (benchmarks/ path, shared helper)
from ssl_sanity import (  # noqa: E402  (benchmarks/ path, shared recipe)
    SIZE,
    hard_crop,
    make_bases,
    pin_fixed_grid,
    samples,
)


N_IDS = _flag("--n-ids", 64, int)
SSL_STEPS = _flag("--ssl-steps", 3000, int)
FT_STEPS = _flag("--ft-steps", 300, int)
K_SHOT = _flag("--k-shot", 2, int)
FT_LR = _flag("--ft-lr", 1e-3)
MARGIN = _flag("--margin", 0.05)
EVAL_EVERY = _flag("--eval-every", 30, int)
# 'bin' = verification-pair accuracy (perform_val); 'ijb' = the IJB
# TEMPLATE protocol (media/template aggregation + TPR@FPR,
# eval/ijb.run_ijb_protocol) on held-out UNSEEN identities —
# the full synthetic replication chain of README.md:96-97
PROTOCOL = _flag("--protocol", "bin", str)
N_EVAL_IDS = _flag("--eval-ids", 32, int)
B = 32

# backbone shared by both stages: same transformer tree; the SSL stage
# consumes fixed-grid tokens via the provider, the supervised stage gathers
# the SAME fixed grid in-model (use_standcoord — ViT_face.py:717-758), so
# the teacher backbone transplants coherently (token geometry matches).
_MODEL = dict(
    image_size=SIZE, dim=64, depth=2, heads=2, dim_head=32, mlp_dim=128,
    num_patches=36, dropout=0.0, emb_dropout=0.0, drop_path_rate=0.0,
    stn_mode="small",
)


def ssl_pretrain():
    """ssl_sanity's winning recipe, returning the trained teacher params."""
    cfg = SSLConfig(
        model=PartFViTConfig(**_MODEL, with_land=False, loss_type="None",
                             num_classes=0),
        out_dim=1024, head_hidden_dim=128, head_bottleneck_dim=32,
        center_momentum=0.99, local_crops_number=4, local_keep_landmarks=16,
        global_crops_scale=(0.5, 1.0), landmark_jitter_std=2.0,
        compute_dtype=jnp.float32, fused_device_aug=True,
    )
    mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1), ("data", "model"))
    state = jax.jit(lambda r: create_ssl_state(cfg, r))(jax.random.PRNGKey(0))
    land = create_landmark_provider(cfg, jax.random.PRNGKey(1))
    pin_fixed_grid(land, cfg.model.num_patches, cfg.model.patch_size)
    step = make_ssl_train_step(cfg, mesh)

    rng = np.random.default_rng(0)
    bases = make_bases(rng, N_IDS)
    pool_imgs, pool_labels = samples(rng, bases, 512 // N_IDS)
    pool_u8 = (pool_imgs * 255).astype(np.uint8)

    warmup = 100
    t0 = time.perf_counter()
    for s in range(SSL_STEPS):
        idx = np.random.default_rng(s).choice(len(pool_u8), B, replace=False)
        raw = jnp.asarray(pool_u8[idx])
        lr = 2e-3 * min(1.0, (s + 1) / warmup) * (
            0.5 * (1 + np.cos(np.pi * max(0, s - warmup)
                              / max(1, SSL_STEPS - warmup)))
        )
        dummy = jnp.zeros((1,), jnp.float32)
        state, m = step(
            state, land, raw, dummy, dummy, dummy,
            lr=jnp.float32(lr), wd=jnp.float32(0.01),
            momentum=jnp.float32(0.9997), teacher_temp=jnp.float32(0.04),
            freeze_last=jnp.float32(0.0 if s < 30 else 1.0),
        )
        if s % 500 == 0:
            print(f"[ssl] step {s}: loss {float(m['loss']):.4f}", flush=True)
    print(f"[ssl] {SSL_STEPS} steps in {time.perf_counter() - t0:.1f}s",
          flush=True)
    return jax.device_get(state.teacher), bases


def build_eval(bases):
    """Held-out hard-cropped verification pairs (crop-invariance probe)."""
    vr = np.random.default_rng(1)
    v_imgs, v_labels = samples(vr, bases, 6)
    v_u8 = np.stack([hard_crop(vr, im) for im in v_imgs])
    n_pairs = 96
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
    return val, issame


def build_eval_ijb():
    """Synthetic IJB-style template protocol over UNSEEN identities.

    Mirrors the real protocol's structure (IJB_evaluation.py:501-567,
    784-827): per identity 4 templates; each template = one 3-frame
    "video" media (three hard crops of the SAME sample — near-duplicates
    that media-averaging must keep from dominating the template sum) +
    one "still" media (a different sample). Genuine pairs = all template
    pairs within an identity; impostors sampled across identities.

    Returns (images_u8, templates, medias, p1, p2, labels)."""
    er = np.random.default_rng(9)
    eval_bases = make_bases(er, N_EVAL_IDS)
    per_id_templates = 4
    imgs, templates, medias = [], [], []
    tid, mid = 0, 0
    for i in range(N_EVAL_IDS):
        for _ in range(per_id_templates):
            video = np.clip(
                eval_bases[i] + er.normal(0, 0.05, eval_bases[i].shape), 0, 1
            )
            for _ in range(3):  # frames: crops of the SAME sample
                imgs.append(hard_crop(er, video))
                templates.append(tid)
                medias.append(mid)
            mid += 1
            still = np.clip(
                eval_bases[i] + er.normal(0, 0.05, eval_bases[i].shape), 0, 1
            )
            imgs.append(hard_crop(er, still))
            templates.append(tid)
            medias.append(mid)
            mid += 1
            tid += 1
    images = np.stack(imgs)
    templates = np.asarray(templates)
    medias = np.asarray(medias)

    # pairs over template ids (template t belongs to identity t // 4)
    p1, p2, labels = [], [], []
    for i in range(N_EVAL_IDS):  # genuine: all within-id template pairs
        base = i * per_id_templates
        for a in range(per_id_templates):
            for b in range(a + 1, per_id_templates):
                p1.append(base + a)
                p2.append(base + b)
                labels.append(1)
    for i in range(N_EVAL_IDS):  # impostors: 4 per id pair
        for j in range(i + 1, N_EVAL_IDS):
            for _ in range(4):
                p1.append(i * per_id_templates + er.integers(per_id_templates))
                p2.append(j * per_id_templates + er.integers(per_id_templates))
                labels.append(0)
    return (images, templates, medias, np.asarray(p1), np.asarray(p2),
            np.asarray(labels))


def ijb_tpr(embed, variables, ijb_data, fpr_target=1e-2):
    """TPR@FPR for one model on the synthetic template protocol, with
    orig+flip fusion like the real pipeline (IJB_evaluation.py:725-749)."""
    from lafs_cvpr2024_tpu.eval.ijb import run_ijb_protocol

    images, templates, medias, p1, p2, labels = ijb_data
    feats = []
    for flip in (False, True):
        ims = images[:, :, ::-1] if flip else images
        x = ims.astype(np.float32) / 255.0 * 2 - 1
        pad = (-len(x)) % 128  # one static batch shape -> one compile
        if pad:
            x = np.concatenate([x, np.zeros((pad, *x.shape[1:]), x.dtype)])
        x = jnp.asarray(x)
        out = []
        for s in range(0, len(x), 128):
            out.append(np.asarray(embed(variables, x[s:s + 128])))
        feats.append(np.concatenate(out)[:len(images)])
    img_feats = np.concatenate(feats, axis=1)  # (N, 2D) [orig | flip]
    table = run_ijb_protocol(img_feats, templates, medias, p1, p2, labels)
    return table[fpr_target]


def finetune(teacher_backbone, bases, val, issame, tag, ijb_data=None):
    """One supervised CosFace finetune on the K_SHOT labeled subset; returns
    BEST held-out metric over the run (eval every EVAL_EVERY steps):
    verification accuracy (bin protocol) or TPR@FPR=1e-2 on the synthetic
    IJB template protocol when ``ijb_data`` is given.
    `teacher_backbone=None` = scratch."""
    cfg = SupervisedConfig(
        model=PartFViTConfig(**_MODEL, with_land=False, use_standcoord=True,
                             num_classes=N_IDS),
        acc_step=1,
        mixup=MixupConfig(mixup_alpha=0.0, cutmix_alpha=0.0, prob=0.0,
                          num_classes=N_IDS),
        compute_dtype=jnp.float32,
    )
    mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1), ("data", "model"))
    state = jax.jit(lambda r: create_state(cfg, r))(jax.random.PRNGKey(7))
    if teacher_backbone is not None:
        # the cli/train_supervised --ssl-checkpoint merge: overlay the SSL
        # teacher BACKBONE onto the supervised tree (DINO head dropped);
        # every teacher leaf must land (the trees are the same class)
        unmatched = []
        state = state._replace(params=merge_params(
            state.params, teacher_backbone["backbone"], unmatched=unmatched))
        assert not unmatched, f"SSL backbone leaves not in model: {unmatched}"
    w, w_opt = create_classifier(cfg, jax.random.PRNGKey(8))
    step = make_train_step(cfg, mesh)
    embed = make_embed_fn(cfg, mesh)

    # few-shot labeled subset, IDENTICAL for both arms (seeded)
    fr = np.random.default_rng(42)
    ft_imgs, ft_labels = samples(fr, bases, K_SHOT)
    ft_imgs = jnp.asarray(ft_imgs * 2 - 1)
    ft_labels = jnp.asarray(ft_labels, jnp.int32)

    def held_out_acc():
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        if ijb_data is not None:
            return ijb_tpr(embed, variables, ijb_data)
        res = perform_val(
            lambda b: embed(variables, jnp.asarray((b + 0.5) * 2 - 1)),
            val, issame, batch_size=96, input_scale="half",
        )
        return res.accuracy

    curve = {}
    for s in range(FT_STEPS):
        if s and s % EVAL_EVERY == 0:
            curve[s] = held_out_acc()
        idx = np.random.default_rng(1000 + s).choice(
            len(ft_labels), min(B, len(ft_labels)), replace=False)
        state, w, w_opt, m = step(
            state, w, w_opt, ft_imgs[idx], ft_labels[idx], FT_LR)
        if s % 100 == 0:
            print(f"[{tag}] step {s}: loss {float(m['loss']):.3f}", flush=True)
    curve[FT_STEPS] = held_out_acc()

    best = max(curve.values())
    print(f"[{tag}] held-out curve: "
          + " ".join(f"{k}:{v:.3f}" for k, v in sorted(curve.items()))
          + f"  best {best:.3f}", flush=True)
    return best


def main():
    assert PROTOCOL in ("bin", "ijb"), f"--protocol bin|ijb, got {PROTOCOL!r}"
    t0 = time.perf_counter()
    teacher, bases = ssl_pretrain()
    val, issame = build_eval(bases)
    ijb_data = build_eval_ijb() if PROTOCOL == "ijb" else None
    acc_ssl = finetune(teacher, bases, val, issame, "ft-ssl", ijb_data)
    acc_scratch = finetune(None, bases, val, issame, "ft-scratch", ijb_data)
    metric = ("TPR@FPR=1e-2 (IJB template protocol, unseen ids)"
              if PROTOCOL == "ijb" else "verification accuracy")
    print(f"total {time.perf_counter() - t0:.1f}s")
    print(f"SSL-init best {acc_ssl:.3f} vs scratch best {acc_scratch:.3f} "
          f"[{metric}] (assert SSL >= scratch + {MARGIN})")
    print("LAFS HANDOFF ASSERTION:", "PASS" if acc_ssl >= acc_scratch + MARGIN
          else "FAIL")
    sys.exit(0 if acc_ssl >= acc_scratch + MARGIN else 1)


if __name__ == "__main__":
    main()
