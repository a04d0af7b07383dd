"""LAFS self-supervised pretraining — DINO multi-crop teacher–student with
landmark-consistent crops, as ONE jitted SPMD step.

Replaces ``lafs_train.py:474-623`` (train_one_epoch): per step the frozen
landmark CNN predicts landmarks on the CLEAN view of each crop and 8×8
patches are gathered from the AUGMENTED view (global: all 196 landmarks +
N(0,5²) jitter; local: 36 random landmarks — ``lafs_train.py:535-574``);
the student sees all 10 crops, the teacher the 2 globals; DINO loss with
psum-centered teacher softmax; per-param grad clip 3.0; AdamW with scheduled
lr/wd; EMA teacher update. Everything — including the teacher EMA and the
center all-reduce — lives inside the single compiled step.

Static-shape multi-crop: exactly two compiled token shapes (2B×197 global,
8B×37 local) replace the reference's dynamic shape-grouping
(``utils.py:619-629``).

Intentional deviation: the teacher forward runs deterministic
(``train=False``). The reference builds the teacher with
dropout=0.1/emb_dropout=0.1 and never calls ``teacher.eval()``
(``lafs_train.py:340-377``), so its teacher has ACTIVE dropout — widely
considered an oversight (DINO's original recipe uses drop_path/dropout 0 on
the teacher); a deterministic teacher gives cleaner targets. Other faithful
quirks (local crops drawing the GLOBAL scale, attention dim**-0.5, 704 inner
dim) are preserved — see the module docstrings where each lives.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..models.heads import DINOHead
from ..models.partfvit import LandmarkProvider, PartFViT, PartFViTConfig
from ..ops.patch_gather import patch_gather
from .losses import dino_loss
from .optim import (
    AdamWState,
    adamw_init,
    adamw_update,
    clip_grads_per_param,
    dino_wd_mask,
    ema_update,
    fused_adamw_ema_update,
    lars_init,
    lars_update,
    sgd_init,
    sgd_update,
    zero1_fused_adamw_ema_update,
    zero1_init,
    zero_grads_by_path,
)


#: vanilla pixel-patch DINO architectures (reference ``--arch``,
#: ``lafs_train.py:34-37,198-209``) + the in-repo secondary SSL backbones.
#: "partfvit" is the LAFS landmark-token path.
SSL_ARCHS = ("partfvit", "vit_tiny", "vit_small", "vit_base", "overlap",
             "mobile_dino")
#: archs whose backbones carry BatchNorm running stats (tracked in
#: ``SSLTrainState.stats``; the pure-ViT archs have none)
_BN_ARCHS = ("overlap", "mobile_dino")
_VIT_DIMS = {"vit_tiny": 192, "vit_small": 384, "vit_base": 768}


@dataclass(frozen=True)
class SSLConfig:
    model: PartFViTConfig = field(
        default_factory=lambda: PartFViTConfig(
            with_land=False, loss_type="None", num_classes=0
        )
    )
    arch: str = "partfvit"  # one of SSL_ARCHS. Vanilla archs consume PIXEL
                            # crops (2 global at image_size + N local at
                            # local_crop_size, DataAugmentationDINO) instead
                            # of landmark tokens; no landmark provider runs.
    local_crop_size: int = 48  # vanilla local-crop resolution
                               # (lafs_train.py:775: RandomResizedCrop(48))
    out_dim: int = 100000
    head_hidden_dim: int = 2048
    head_bottleneck_dim: int = 256
    use_bn_in_head: bool = False  # --use_bn_in_head (lafs_train.py:53,350);
                                  # the BNs sync over the data axis like
                                  # every other BN (lafs_train.py:362-365)
    norm_last_layer: bool = True
    local_crops_number: int = 8
    local_keep_landmarks: int = 36
    landmark_jitter_std: float = 5.0
    glo_diff: bool = False  # differentiated global-crop landmarks (the
                            # reference global-token recipe, utils.py:646 →
                            # ViT_face.py:474-516): global crop 1 keeps the
                            # CLEAN landmarks, only crop 2 gets the jitter +
                            # full-count resample-with-replacement. Token
                            # path (partfvit arch) only.
    random_coor: bool = False  # uniform-random landmark coordinates instead
                               # of the CNN's (ViT_face.py:1391-1400). The
                               # reference inner loop hard-codes
                               # random_coor=False at lafs_train.py:535-565 —
                               # promoted to config per SURVEY §5. Skips the
                               # landmark CNN forward entirely; the patch
                               # gather still runs. Token path only.
    # crop scales for the fused device-aug path. NOTE the LAFS recipe draws
    # LOCAL crops from the GLOBAL scale (``lafs_train.py:852-858``) —
    # local_crops_scale applies to the VANILLA archs only
    # (DataAugmentationDINO, ``lafs_train.py:773``).
    global_crops_scale: tuple = (0.4, 1.0)
    local_crops_scale: tuple = (0.05, 0.4)
    student_temp: float = 0.1
    center_momentum: float = 0.9
    clip_grad: float = 3.0
    freeze_last_layer_epochs: int = 1
    compute_dtype: Any = jnp.bfloat16
    head_dtype: Any = jnp.float32  # the 100k-way projection head's compute
                                   # dtype (loss math stays fp32 either way)
    landmark_dtype: Any = jnp.float32  # frozen landmark-CNN compute dtype;
                                       # bf16 is safe (landmarks get N(0,5px)
                                       # jitter anyway) and skips fp32 convs
    moment_dtype: Any = jnp.float32  # AdamW moment STORAGE dtype (math is
                                     # always fp32); bf16 halves the ~2 GB
                                     # optimizer HBM traffic per step
    teacher_dtype: Any = jnp.float32  # EMA teacher STORAGE dtype. bf16
                                      # halves the teacher's EMA+forward HBM
                                      # traffic; the storage cast switches
                                      # to STOCHASTIC ROUNDING (plain RNE
                                      # would swallow the (1-m)·Δ EMA
                                      # increments, freezing the teacher —
                                      # see optim.stochastic_round)

    teacher_mlp_impl: str = "same"  # MLP impl for the TEACHER forward only
                                    # ('same' = cfg.model.mlp_impl). The
                                    # teacher graph is inference-only, where
                                    # the pallas kernels measured slower in
                                    # round 2 (IJB) — 'dense' lets XLA fuse
                                    # it freely. Param tree is identical
                                    # across impls, so the EMA is unaffected.
    optimizer: str = "adamw"  # 'adamw' | 'sgd' | 'lars' (the reference's
                              # --optimizer, lafs_train.py:92-93,399-404:
                              # "adamw with ViTs", SGD momentum 0.9, "LARS
                              # ... with convnet and large batches" — e.g.
                              # the mobile_dino arch). sgd/lars run the
                              # separate-pass tail: they require
                              # fused_tail=False and exclude zero1 (the
                              # fused/sharded tails ship AdamW math only).
    fused_tail: bool = True  # clip+freeze+AdamW+EMA as ONE tree traversal
                             # (optim.fused_adamw_ema_update) — fewer HBM
                             # passes over the ~134M-param state
    zero1: bool = False  # ZeRO-1 optimizer-state sharding over the data
                         # axis: AdamW moments live 1/n_data per chip,
                         # grads reach the update via psum_scatter and
                         # updated student params return via all_gather
                         # (same collective bytes as the grad pmean; the
                         # per-leaf clip norm is ONE stacked scalar psum).
                         # Requires fused_tail and n_data > 1; create the
                         # state with create_ssl_state(...,
                         # zero1_shards=n_data)
    fused_device_aug: bool = False  # run the 20-crop augmentation INSIDE the
                                    # train step (input = raw uint8 batch);
                                    # one compiled program, XLA overlaps the
                                    # aug with the backward of the prior ops

    @property
    def ncrops(self) -> int:
        return self.local_crops_number + 2


class SSLTrainState(NamedTuple):
    student: Any          # {"backbone": ..., "head": ...}
    teacher: Any
    opt_state: Any
    center: jnp.ndarray
    step: jnp.ndarray
    rng: jnp.ndarray
    # BatchNorm running stats for the BN archs (overlap/mobile_dino):
    # {"student": {"backbone": ...}, "teacher": {"backbone": ...}}; the
    # teacher's follow the student's by the same EMA momentum as the params
    # (the reference never trains a BN arch under DINO — its teacher buffers
    # are copied once at init, lafs_train.py:377 — EMA is the stable choice).
    # () for the stat-less archs, keeping their checkpoint trees unchanged.
    stats: Any = ()


def _cast(tree, dtype):
    return jax.tree_util.tree_map(
        lambda p: p.astype(dtype) if jnp.issubdtype(p.dtype, jnp.floating) else p,
        tree,
    )


def _backbone(cfg: SSLConfig, mlp_impl: Optional[str] = None):
    """SSL backbone per ``cfg.arch``, config overrides in ONE place
    (``mlp_impl`` lets the inference-only teacher graph pick a different
    lowering — PartFViT/OverlapViT only; the DINO ViT keeps dense MLPs)."""
    if cfg.arch not in SSL_ARCHS:
        raise ValueError(f"unknown SSL arch {cfg.arch!r}; one of {SSL_ARCHS}")
    over = {"with_land": False, "loss_type": "None"}
    if mlp_impl is not None:
        over["mlp_impl"] = mlp_impl
    if cfg.arch == "partfvit":
        return PartFViT(PartFViTConfig(**{**cfg.model.__dict__, **over}))
    if cfg.arch in _VIT_DIMS:
        from ..models import dino_vit

        return getattr(dino_vit, cfg.arch)(
            patch_size=cfg.model.patch_size,
            img_size=cfg.model.image_size,
            drop_rate=cfg.model.dropout,
            drop_path_rate=cfg.model.drop_path_rate,
        )
    if cfg.arch == "overlap":
        from ..models.partfvit import OverlapViT

        return OverlapViT(PartFViTConfig(**{**cfg.model.__dict__, **over}))
    # mobile_dino: MobileNetV3 stem + projector (ViT_face.py:1203-1217)
    from ..models.mobilenet import MobileDINO

    return MobileDINO(embd_dim=cfg.model.dim, mode=cfg.model.stn_mode,
                      axis_name=cfg.model.bn_axis_name)


def _embed_dim(cfg: SSLConfig) -> int:
    """Backbone output width feeding the DINO head."""
    return _VIT_DIMS.get(cfg.arch, cfg.model.dim)


def _head(cfg: SSLConfig) -> DINOHead:
    return DINOHead(
        in_dim=_embed_dim(cfg),
        out_dim=cfg.out_dim,
        hidden_dim=cfg.head_hidden_dim,
        bottleneck_dim=cfg.head_bottleneck_dim,
        use_bn=cfg.use_bn_in_head,
        axis_name=cfg.model.bn_axis_name,
    )


def create_ssl_state(
    cfg: SSLConfig, rng: jax.Array, zero1_shards: int = 0
) -> SSLTrainState:
    """Init student/teacher (identical weights — ``lafs_train.py:377``).

    ``zero1_shards`` (pass ``mesh.shape['data']`` when ``cfg.zero1``): store
    the AdamW moments in the ZeRO-1 flat-chunked layout so the train step
    can shard them over the data axis."""
    backbone = _backbone(cfg)
    head = _head(cfg)
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    if cfg.arch == "partfvit":
        x = jnp.zeros((2, cfg.model.num_patches, 3 * cfg.model.patch_size ** 2))
    else:
        # vanilla archs consume pixels; one init at the global size creates
        # every param (local sizes reuse them — pos-embed interpolation /
        # truncation / global pooling)
        x = jnp.zeros((2, cfg.model.image_size, cfg.model.image_size, 3))
    variables = backbone.init({"params": k1, "dropout": k4}, x)
    bb = variables["params"]
    bb_stats = variables.get("batch_stats", {})
    hd_variables = head.init(k2, jnp.zeros((2, _embed_dim(cfg))))
    hd = hd_variables["params"]
    hd_stats = hd_variables.get("batch_stats", {})
    student = {"backbone": bb, "head": hd}
    if cfg.optimizer not in ("adamw", "sgd", "lars"):
        raise ValueError(f"optimizer must be adamw|sgd|lars, got "
                         f"{cfg.optimizer!r} (lafs_train.py:92-93)")
    if cfg.optimizer != "adamw" and zero1_shards > 1:
        raise ValueError("zero1 moment sharding ships AdamW math only; "
                         f"optimizer={cfg.optimizer!r} needs zero1=False")
    if cfg.optimizer == "sgd":
        opt_state = sgd_init(student)
    elif cfg.optimizer == "lars":
        opt_state = lars_init(student)
    elif zero1_shards > 1:
        opt_state = zero1_init(student, zero1_shards, moment_dtype=cfg.moment_dtype)
    else:
        opt_state = adamw_init(student, moment_dtype=cfg.moment_dtype)
    stats = ()
    # keys appear only for the parts that HAVE running stats, so the state
    # tree (and therefore existing checkpoints) is unchanged unless
    # use_bn_in_head / a BN arch is actually in play
    stats_entry = {}
    if bb_stats:
        stats_entry["backbone"] = bb_stats
    if hd_stats:
        stats_entry["head"] = hd_stats
    if stats_entry:
        stats = {
            "student": stats_entry,
            "teacher": jax.tree_util.tree_map(jnp.copy, stats_entry),
        }
    return SSLTrainState(
        student=student,
        teacher=_cast(jax.tree_util.tree_map(jnp.copy, student), cfg.teacher_dtype),
        opt_state=opt_state,
        center=jnp.zeros((1, cfg.out_dim)),
        step=jnp.zeros((), jnp.int32),
        rng=k3,
        stats=stats,
    )


def create_landmark_provider(cfg: SSLConfig, rng: jax.Array):
    """Frozen landmark CNN variables (load real weights via
    ``checkpoint.load_landmark_variables`` afterwards)."""
    provider = LandmarkProvider(
        num_landmarks=cfg.model.num_patches, patch_size=cfg.model.patch_size,
        stn_mode=cfg.model.stn_mode, coord_scale=float(cfg.model.image_size - 1),
    )
    x = jnp.zeros((1, cfg.model.image_size, cfg.model.image_size, 3))
    return jax.jit(provider.init)({"params": rng}, x)


def make_ssl_train_step(cfg: SSLConfig, mesh: Mesh, donate: bool = False) -> Callable:
    """Build ``step_fn(state, landmark_vars, glob_clean, glob_aug, loc_clean,
    loc_aug, lr, wd, momentum, teacher_temp, freeze_last) -> (state, metrics)``.

    glob_*: (2, B, H, W, 3); loc_*: (L, B, H, W, 3) float in [-1, 1]
    (the LAFSMultiCrop output), batch dim sharded over ``data``.

    ``donate=True`` donates the input state's buffers to the step (XLA
    updates student/teacher/opt in place instead of allocating + copying
    ~1.4 GB of fresh buffers per step) — use when the caller never touches
    the pre-step state again (the CLIs and bench do; some tests re-step from
    a saved state and must not donate).
    """
    backbone = _backbone(cfg)
    if cfg.teacher_mlp_impl not in ("same", cfg.model.mlp_impl):
        t_backbone = _backbone(cfg, mlp_impl=cfg.teacher_mlp_impl)
    else:
        t_backbone = backbone
    head = _head(cfg)
    vanilla = cfg.arch != "partfvit"
    has_bn = cfg.arch in _BN_ARCHS   # BN in the BACKBONE (stats threaded)
    head_bn = cfg.use_bn_in_head     # BN in the DINO head (stats threaded)
    any_bn = has_bn or head_bn
    provider = None if vanilla else LandmarkProvider(
        num_landmarks=cfg.model.num_patches, patch_size=cfg.model.patch_size,
        gather_impl=cfg.model.gather_impl, stn_mode=cfg.model.stn_mode,
        coord_scale=float(cfg.model.image_size - 1),
    )
    L = cfg.local_crops_number
    # single-device fast path: plain jit, no collectives (shard_map over a
    # 1-device mesh compiles to a pathologically slow program on some
    # platforms, measured ~2000x on the tunneled TPU backend)
    multi = int(np.prod(list(mesh.shape.values()))) > 1
    data_axis = "data" if multi else None
    _pmean = (lambda x: jax.lax.pmean(x, "data")) if multi else (lambda x: x)
    n_data = mesh.shape["data"]
    zero1 = cfg.zero1
    if zero1 and n_data < 2:
        raise ValueError("zero1=True needs a data axis to shard over "
                         f"(n_data={n_data})")
    if zero1 and not cfg.fused_tail:
        raise ValueError("zero1=True requires fused_tail=True (the sharded "
                         "update ships only in the fused tail)")
    if cfg.optimizer != "adamw" and cfg.fused_tail:
        raise ValueError(
            f"optimizer={cfg.optimizer!r} runs the separate-pass tail — set "
            "fused_tail=False (the fused tail ships AdamW math only; the "
            "train_ssl CLI does this automatically for --optimizer sgd/lars)"
        )
    if cfg.glo_diff and vanilla:
        raise ValueError(
            "glo_diff differentiates LANDMARK treatment between the two "
            "global crops (ViT_face.py:474-516) — only the token path "
            f"(arch='partfvit') has landmarks; arch={cfg.arch!r} does not"
        )
    if cfg.random_coor and vanilla:
        raise ValueError(
            "random_coor replaces the landmark CNN's coordinates "
            "(ViT_face.py:1391-1400) — only the token path "
            f"(arch='partfvit') has a landmark branch; arch={cfg.arch!r} "
            "does not"
        )
    if cfg.random_coor and cfg.glo_diff:
        raise ValueError(
            "random_coor and glo_diff are mutually exclusive: glo_diff "
            "differentiates the CNN-PREDICTED landmarks between the two "
            "global crops (ViT_face.py:474-516); with uniform-random "
            "coordinates there is nothing to differentiate"
        )
    if any_bn and multi and cfg.model.bn_axis_name is None:
        raise ValueError(
            f"{'arch ' + repr(cfg.arch) if has_bn else 'use_bn_in_head'} "
            "has BatchNorm: on a multi-device mesh set "
            "model.bn_axis_name='data' (SyncBN) so the running stats stay "
            "replicated across shards"
        )

    def make_tokens(landmark_vars, glob_clean, glob_aug, loc_clean, loc_aug, rng):
        """Frozen landmark branch (no gradients — lafs_train.py:381-382)."""
        b = glob_clean.shape[1]
        k1, k2, k3 = jax.random.split(rng, 3)
        ld = cfg.landmark_dtype
        lvars = jax.tree_util.tree_map(
            lambda p: p.astype(ld) if jnp.issubdtype(p.dtype, jnp.floating) else p,
            landmark_vars,
        )
        # globals: jitter only, keep all landmarks (Random_prob + return_prob)
        g_clean = glob_clean.reshape(2 * b, *glob_clean.shape[2:]).astype(ld)
        g_aug = glob_aug.reshape(2 * b, *glob_aug.shape[2:]).astype(ld)
        if cfg.glo_diff:
            # differentiated globals (utils.py:646 → ViT_face.py:474-516):
            # crop 1 keeps the CLEAN landmarks; crop 2 gets jitter + a
            # full-count resample WITH replacement. One stn forward for
            # the stacked pair, then post-process the second half.
            theta, _ = provider.apply(lvars, g_clean, return_land=True)
            t1, t2 = theta[:b], theta[b:]
            kj, ki = jax.random.split(k1)
            t2 = t2 + cfg.landmark_jitter_std * jax.random.normal(
                kj, t2.shape, dtype=t2.dtype
            )
            n_land = t2.shape[1]
            idx = jax.random.randint(ki, (b, n_land), 0, n_land)
            t2 = jnp.take_along_axis(t2, idx[..., None], axis=1)
            g_tokens = patch_gather(
                g_aug, jnp.concatenate([t1, t2], axis=0),
                cfg.model.patch_size, impl=cfg.model.gather_impl,
            )
        else:
            _, g_tokens = provider.apply(
                lvars, g_clean, x_aug=g_aug, rng=k1,
                jitter_std=cfg.landmark_jitter_std,
                random_coor=cfg.random_coor,
            )
        # locals: jitter + keep 36 random landmarks (ran_sample=True)
        l_clean = loc_clean.reshape(L * b, *loc_clean.shape[2:]).astype(ld)
        l_aug = loc_aug.reshape(L * b, *loc_aug.shape[2:]).astype(ld)
        _, l_tokens = provider.apply(
            lvars, l_clean, x_aug=l_aug, rng=k2,
            jitter_std=cfg.landmark_jitter_std,
            ran_sample=cfg.local_keep_landmarks,
            random_coor=cfg.random_coor,
        )
        return jax.lax.stop_gradient(g_tokens), jax.lax.stop_gradient(l_tokens)

    def apply_head(params, head_stats, emb, train: bool):
        """DINO projection head with optional BN-stats threading
        (``use_bn_in_head``). Student train steps update batch stats;
        the teacher (train=False) reads running averages."""
        hv = {"params": _cast(params["head"], cfg.head_dtype)}
        if head_bn:
            hv["batch_stats"] = head_stats
            if train:
                out, mut = head.apply(
                    hv, emb, deterministic=False, mutable=["batch_stats"]
                )
                return out, mut["batch_stats"]
            return head.apply(hv, emb, deterministic=True), head_stats
        return head.apply(hv, emb), head_stats

    def forward(params, stats, g_tokens, l_tokens, rng, train: bool):
        """Token-path forward (partfvit). Returns
        ``(head_out_fp32, new_stats)`` — stats only carry the head's BN
        running averages (the Part-fViT backbone has none)."""
        cparams = _cast(params, cfg.compute_dtype)
        rngs = {"dropout": rng} if train else None
        bb = backbone if train else t_backbone
        emb_g = bb.apply(
            {"params": cparams["backbone"]},
            g_tokens.astype(cfg.compute_dtype), train=train, rngs=rngs,
        )
        outs = [emb_g]
        if l_tokens is not None:
            emb_l = bb.apply(
                {"params": cparams["backbone"]},
                l_tokens.astype(cfg.compute_dtype), train=train,
                rngs={"dropout": jax.random.fold_in(rng, 3)} if train else None,
            )
            outs.append(emb_l)
        emb = jnp.concatenate(outs, axis=0).astype(cfg.head_dtype)
        out, new_hstats = apply_head(
            params, stats["head"] if head_bn else None, emb, train
        )
        new_stats = {"head": new_hstats} if head_bn else stats
        return out.astype(jnp.float32), new_stats

    def forward_vanilla(params, stats, g_imgs, l_imgs, rng, train: bool):
        """Pixel-crop forward for the vanilla archs: two static shapes
        (global image_size², local local_crop_size²), BN running stats
        threaded through when the backbone has them. Returns
        (head_out_fp32, new_backbone_stats)."""
        cparams = _cast(params, cfg.compute_dtype)
        bb = backbone if train else t_backbone
        new_stats = stats

        def run(imgs, variables, key):
            kw = dict(train=train)
            if train:
                kw["rngs"] = {"dropout": key}
            if train and has_bn:
                out, mut = bb.apply(imgs_vars(variables), imgs, mutable=["batch_stats"], **kw)
                return out, mut["batch_stats"]
            return bb.apply(imgs_vars(variables), imgs, **kw), variables[1]

        def imgs_vars(variables):
            v = {"params": variables[0]}
            if has_bn:
                v["batch_stats"] = variables[1]
            return v

        bb_stats = stats["backbone"] if has_bn else None
        emb_g, bb_stats = run(
            g_imgs.astype(cfg.compute_dtype), (cparams["backbone"], bb_stats), rng
        )
        outs = [emb_g]
        if l_imgs is not None:
            emb_l, bb_stats = run(
                l_imgs.astype(cfg.compute_dtype),
                (cparams["backbone"], bb_stats),
                jax.random.fold_in(rng, 3),
            )
            outs.append(emb_l)
        emb = jnp.concatenate(outs, axis=0).astype(cfg.head_dtype)
        out, new_hstats = apply_head(
            params, stats["head"] if head_bn else None, emb, train
        )
        if any_bn:
            new_stats = {}
            if has_bn:
                new_stats["backbone"] = bb_stats
            if head_bn:
                new_stats["head"] = new_hstats
        return out.astype(jnp.float32), new_stats

    def step_impl(state, landmark_vars, glob_clean, glob_aug, loc_clean,
                  loc_aug, lr, wd, momentum, teacher_temp, freeze_last):
        rng = jax.random.fold_in(state.rng, state.step)
        # SR noise for low-precision state casts must be IDENTICAL across
        # data shards (the post-pmean update is replicated; per-shard noise
        # would silently de-replicate the teacher) — derive it BEFORE the
        # per-shard fold-in. Fresh every step via the state.step fold above.
        sr_rng = (
            jax.random.fold_in(rng, 17)
            if cfg.teacher_dtype == jnp.bfloat16 else None
        )
        if multi:
            # independent per-data-shard randomness (aug/jitter/dropout);
            # the stored state.rng stays replicated — only local keys fold
            from ..parallel.mesh import fold_in_shard

            rng = fold_in_shard(rng, "data")
        k_land, k_student, k_rest = jax.random.split(rng, 3)
        if cfg.fused_device_aug:
            # glob_clean carries the RAW uint8 batch (B, H, W, 3); the other
            # three crop inputs are ignored
            if vanilla:
                from ..ops.augment_device import vanilla_multicrop_device

                glob_clean, loc_clean = vanilla_multicrop_device(
                    jax.random.fold_in(rng, 11),
                    glob_clean,
                    local_crops_number=cfg.local_crops_number,
                    out_size=cfg.model.image_size,
                    local_size=cfg.local_crop_size,
                    global_crops_scale=tuple(cfg.global_crops_scale),
                    local_crops_scale=tuple(cfg.local_crops_scale),
                )
            else:
                from ..ops.augment_device import lafs_multicrop_device

                (glob_clean, glob_aug,
                 loc_clean, loc_aug) = lafs_multicrop_device(
                    jax.random.fold_in(rng, 11),
                    glob_clean,
                    local_crops_number=cfg.local_crops_number,
                    out_size=cfg.model.image_size,
                    global_crops_scale=tuple(cfg.global_crops_scale),
                )
        t_stats = state.stats["teacher"] if any_bn else None
        s_stats = state.stats["student"] if any_bn else None
        if vanilla:
            # pixel crops straight to the backbone — no landmark branch;
            # glob_aug/loc_aug are unused dummies (the vanilla transform
            # emits single crops, not clean/aug pairs)
            b = glob_clean.shape[1]
            g_in = glob_clean.reshape(2 * b, *glob_clean.shape[2:])
            l_in = loc_clean.reshape(L * b, *loc_clean.shape[2:])
            teacher_out, _ = forward_vanilla(
                state.teacher, t_stats, g_in, None, k_rest, train=False
            )
        else:
            g_in, l_in = make_tokens(
                landmark_vars, glob_clean, glob_aug, loc_clean, loc_aug, k_land
            )
            teacher_out, _ = forward(
                state.teacher, t_stats, g_in, None, k_rest, train=False
            )
        teacher_out = jax.lax.stop_gradient(teacher_out)

        def loss_fn(params):
            fwd = forward_vanilla if vanilla else forward
            student_out, new_sstats = fwd(
                params, s_stats, g_in, l_in, k_student, train=True
            )
            loss, new_center = dino_loss(
                student_out,
                teacher_out,
                state.center,
                teacher_temp,
                cfg.ncrops,
                student_temp=cfg.student_temp,
                center_momentum=cfg.center_momentum,
                axis_name=data_axis,
            )
            return loss, (new_center, new_sstats)

        (loss, (new_center, new_sstats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.student)
        if not zero1:
            # under zero1 the grads stay LOCAL per-shard means — the
            # cross-shard mean folds into the psum_scatter inside the tail
            grads = _pmean(grads)
        loss = _pmean(loss)
        wd_mask = dino_wd_mask(state.student)
        if cfg.fused_tail:
            # one traversal: clip + freeze gating + AdamW + EMA chained per
            # leaf (gate 1 = last-layer leaves scaled by freeze_last,
            # gate 2 = weight-norm g hard-frozen)
            def _gate(path, p):
                name = "/".join(str(getattr(k, "key", k)) for k in path)
                if cfg.norm_last_layer and name.endswith("last_layer_g"):
                    return 2.0
                if "last_layer" in name:
                    return 1.0
                return 0.0

            gate_tree = jax.tree_util.tree_map_with_path(_gate, state.student)
            if zero1:
                new_student, new_opt, new_teacher = zero1_fused_adamw_ema_update(
                    grads, state.opt_state, state.student, state.teacher,
                    lr, wd, momentum, n_shards=n_data,
                    wd_scale_tree=wd_mask,
                    gate_tree=gate_tree, gate_scalar=freeze_last,
                    clip=cfg.clip_grad or 0.0, grad_scale=1.0 / n_data,
                    sr_rng=sr_rng,
                )
            else:
                new_student, new_opt, new_teacher = fused_adamw_ema_update(
                    grads, state.opt_state, state.student, state.teacher,
                    lr, wd, momentum, wd_scale_tree=wd_mask,
                    gate_tree=gate_tree, gate_scalar=freeze_last,
                    clip=cfg.clip_grad or 0.0, sr_rng=sr_rng,
                )
        else:
            if cfg.clip_grad:
                grads = clip_grads_per_param(grads, cfg.clip_grad)
            # freeze_last (0.0/1.0): zero last-layer grads in warmup epochs
            grads = jax.tree_util.tree_map_with_path(
                lambda path, g: g * freeze_last
                if "last_layer" in "/".join(str(getattr(k, "key", k)) for k in path)
                else g,
                grads,
            )
            if cfg.norm_last_layer:
                grads = zero_grads_by_path(
                    grads, lambda n: n.endswith("last_layer_g")
                )
            if cfg.optimizer == "sgd":
                # torch.optim.SGD(momentum=0.9) — lafs_train.py:401-402
                new_student, new_opt = sgd_update(
                    grads, state.opt_state, state.student, lr, wd=wd,
                    wd_scale_tree=wd_mask,
                )
            elif cfg.optimizer == "lars":
                # utils.LARS — lafs_train.py:403-404 (1-D params skip wd +
                # trust-ratio structurally, like DINO's param groups)
                new_student, new_opt = lars_update(
                    grads, state.opt_state, state.student, lr, wd=wd,
                )
            else:
                new_student, new_opt = adamw_update(
                    grads, state.opt_state, state.student, lr,
                    wd_scale_tree=wd_mask, wd=wd,
                )
            new_teacher = ema_update(state.teacher, new_student, momentum,
                                     sr_rng=sr_rng)
        new_stats = state.stats
        if any_bn:
            # teacher BN stats EMA-follow the student's at the param momentum
            new_stats = {
                "student": new_sstats,
                "teacher": jax.tree_util.tree_map(
                    lambda t, s: momentum * t + (1.0 - momentum)
                    * s.astype(t.dtype),
                    state.stats["teacher"], new_sstats,
                ),
            }
        new_state = SSLTrainState(
            student=new_student,
            teacher=new_teacher,
            opt_state=new_opt,
            center=new_center,
            step=state.step + 1,
            rng=state.rng,
            stats=new_stats,
        )
        return new_state, {"loss": loss}

    cache = {}

    def step_fn(state, landmark_vars, glob_clean, glob_aug, loc_clean, loc_aug,
                lr, wd, momentum, teacher_temp, freeze_last):
        if "fn" not in cache:
            dk = dict(donate_argnums=(0,)) if donate else {}
            if not multi:
                cache["fn"] = jax.jit(step_impl, **dk)
            else:
                rep = lambda tree: jax.tree_util.tree_map(lambda _: P(), tree)
                if cfg.fused_device_aug:
                    # arg 2 is the raw (B, H, W, 3) batch; args 3-5 are dummies
                    crop_specs = (P("data"), P(), P(), P())
                elif vanilla:
                    # unpaired crops: glob_clean/loc_clean carry the pixel
                    # crops; the *_aug slots are replicated dummies
                    crop_specs = (P(None, "data"), P(), P(None, "data"), P())
                else:
                    crop_specs = (P(None, "data"),) * 4
                state_spec = rep(state)
                if zero1:
                    # ZeRO-1: moment leaves are flat (n_data·c,) arrays
                    # sharded over 'data'; the rest of the state replicated
                    state_spec = state_spec._replace(
                        opt_state=AdamWState(
                            count=P(),
                            mu=jax.tree_util.tree_map(
                                lambda _: P("data"), state.opt_state.mu
                            ),
                            nu=jax.tree_util.tree_map(
                                lambda _: P("data"), state.opt_state.nu
                            ),
                        )
                    )
                cache["fn"] = jax.jit(
                    jax.shard_map(
                        step_impl,
                        mesh=mesh,
                        in_specs=(
                            state_spec, rep(landmark_vars),
                            *crop_specs,
                            P(), P(), P(), P(), P(),
                        ),
                        out_specs=(state_spec, {"loss": P()}),
                        # check_vma MUST be False here (all trainers):
                        # under check_vma=True, autodiff of the (varying)
                        # local loss wrt the (invariant) replicated params
                        # AUTO-PSUMS the gradient — the explicit pmean
                        # below is then a no-op on an already-replicated
                        # value and the step trains on the grad SUM
                        # (n_data× the DDP mean the reference uses).
                        # With False, grads stay local and pmean is the
                        # true mean. (zero1 additionally needs False: the
                        # checker types the all_gather'd params as
                        # varying though they are replicated.) Regression:
                        # tests/test_ssl.py::test_vma_autopsum_trap.
                        check_vma=False,
                    ),
                    **dk,
                )
        return cache["fn"](state, landmark_vars, glob_clean, glob_aug,
                           loc_clean, loc_aug, lr, wd, momentum, teacher_temp,
                           freeze_last)

    return step_fn


def assemble_vanilla_crop_batches(crops):
    """Host-side: the DataAugmentationDINO output → (glob, loc) stacks.

    crops: list of (B, H, W, 3) arrays ordered [g1, g2, l1, ..., lN]
    (``lafs_train.py:783-788``). Returns ((2, B, S, S, 3), (N, B, s, s, 3)).
    """
    return np.stack(crops[:2]), np.stack(crops[2:])


def assemble_crop_batches(crops):
    """Host-side: the 20-array LAFSMultiCrop output → the 4 stacked inputs.

    crops: list of (B, H, W, 3) arrays ordered
      [g1_clean, g1_aug, g2_clean, g2_aug, l1_clean, l1_aug, ...]
    (``lafs_train.py:506-507``: ori indices 0,2,4,... aug = ori+1).
    """
    glob_clean = np.stack([crops[0], crops[2]])
    glob_aug = np.stack([crops[1], crops[3]])
    loc_clean = np.stack(crops[4::2])
    loc_aug = np.stack(crops[5::2])
    return glob_clean, glob_aug, loc_clean, loc_aug
