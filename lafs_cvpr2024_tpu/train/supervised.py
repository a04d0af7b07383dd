"""Supervised Part-fViT finetuning — ONE jitted SPMD train step over the mesh.

Replaces the reference loop (``train_largescale.py:768-963``): DDP + AMP +
GradScaler + host-side mixup + per-step scheduler mutation become a single
``shard_map``-ped step that fuses forward, device-side mixup, CosFace-CE
(optionally class-sharded over the ``model`` axis), backward, gradient
psum over ``data`` (the DDP allreduce), and the AdamW update with layer-wise
lr decay. bf16 compute via parameter casting (no GradScaler needed on TPU;
master weights stay fp32).

Gradient accumulation (``acc_step=3``, ``supervised_config.py:37``) is a
``lax.scan`` over microbatches inside the same compiled step.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..models.partfvit import PartFViT, PartFViTConfig
from ..ops.augment_device import scale_uint8
from ..ops.mixup import MixupConfig, mixup_cutmix, mixup_cutmix_factors
from ..parallel.partial_fc import (
    block_pos_adamw,
    block_sample,
    block_sample_local,
    sample_classes,
    sparse_row_adamw,
)
from ..parallel.sharded_cosface import (
    local_margin_logits,
    shard_one_hot,
    sharded_softmax_ce,
)
from .losses import softmax_cross_entropy
from .optim import (
    AdamWState,
    adamw_init,
    adamw_update,
    param_groups_lrd,
    zero1_adamw_update,
    zero1_init,
)


@dataclass(frozen=True)
class SupervisedConfig:
    model: PartFViTConfig = field(default_factory=PartFViTConfig)
    network: str = "partfvit"  # backbone family: partfvit (the flagship) or
                               # iresnet{18,34,50,100,200} (the reference's
                               # selectable alternative, face_pre_pro/
                               # iresnet.py). iresnet reuses cfg.model's
                               # dim (= num_features) / dropout /
                               # num_classes / image_size; transformer
                               # geometry fields are ignored.
    iresnet_avg: bool = False  # IResNet_withloss_avg head (bn2 → global avg
                               # pool → features BN, no fc; embedding is
                               # ALWAYS 512-wide — cfg.model.dim must be 512)
    acc_step: int = 3
    weight_decay: float = 0.1
    layer_decay: float = 0.58
    stn_weight_decay: float = 5e-2
    mixup: MixupConfig = field(default_factory=lambda: MixupConfig(prob=0.1))
    compute_dtype: Any = jnp.bfloat16
    shard_classifier: bool = True   # TP the CosFace weight over 'model'
    landmark_distill: bool = False  # add MSE(teacher landmarks, predicted)
                                    # (the reference's pre_land+keep_land path,
                                    # train_largescale.py:807-836)
    fused_device_aug: bool = False  # images arrive RAW uint8; mirror +
                                    # RandAugment + RandomResizedCrop +
                                    # ColorJitter + RandomErasing + normalize
                                    # run INSIDE the step (host-immune input
                                    # pipeline, like the SSL fused-aug path)
    rand_aug: str = "rand-m1-mstd0.5-inc1"  # device RandAugment policy
    flip_only: bool = False  # the reference README's flip-augmentation-only
                             # recipe (README.md:83-84): random mirror is the
                             # ONLY augmentation — no RandAugment, no
                             # crop/jitter/erasing. Device-aug path; the host
                             # path gets the same via SupervisedAugment(
                             # rand_au=False, random_resizecrop=False).
                             # Pair with mixup prob 0.0 per the README.
    input_scale: Any = None  # 'unit' (x/255·2−1) or 'half' (x/255−0.5):
                             # images arrive RAW uint8 and are scaled ON
                             # DEVICE — 4× less host→device transfer than
                             # shipping float32 (host-aug path only;
                             # fused_device_aug already consumes uint8)
    moment_dtype: Any = jnp.float32  # AdamW moment STORAGE dtype (math is
                                     # always fp32); bf16 halves optimizer
                                     # HBM traffic (~1.2 GB on the 205k head)
    factored_head: bool = False  # keep the margin head OUTSIDE the model and
                                 # accumulate its (num_classes, dim) gradient
                                 # in factored (embedding, dlogit) form across
                                 # the microbatch scan — ONE dW GEMM + ONE
                                 # weight-norm chain per step instead of
                                 # per-microbatch 630 MB grad materialization
                                 # + accumulation (the 205,990-class head
                                 # block is HBM-bound, docs/PERF.md
                                 # §factored-head). Composes with the
                                 # class-sharded (TP) head: per-shard factors,
                                 # local dW GEMM.
    pfc_ratio: float = 1.0  # PartialFC-style negative-class sampling
                            # (reference imports-but-comments insightface's
                            # PartialFC, ViT_face.py:645-651): each step the
                            # margin CE runs over all positives + sampled
                            # negatives totalling pfc_ratio·C classes, and
                            # ONLY the sampled weight/moment rows are
                            # touched (sparse-row AdamW). Requires
                            # factored_head; excludes label smoothing (its
                            # off-sample mass would be dropped). Composes
                            # with the TP head (block sampler only): each
                            # model shard block-samples within the class
                            # range it owns — insightface's
                            # PartialFC×model-parallel production layout.
                            # parallel/partial_fc.py
    pfc_sampler: str = "block"  # "block" (TPU-native contiguous-block
                                # negatives + explicit positive columns —
                                # all weight/moment traffic via dynamic
                                # slices) or "uniform" (insightface-
                                # faithful top_k sample; measured SLOWER
                                # than the full head on TPU — XLA scattered
                                # row gather/scatter, docs/PERF.md
                                # §partial-fc)
    zero1: bool = False  # ZeRO-1 optimizer-state sharding over the data
                         # axis: AdamW moments live sharded (1/n_data per
                         # chip instead of a full replica), grads reach
                         # the update via psum_scatter and updated params
                         # return via all_gather — same collective bytes
                         # as the plain grad allreduce, 1/n the moment
                         # storage+traffic. Requires n_data > 1; create
                         # the state with create_state(...,
                         # zero1_shards=n_data). optim.zero1_adamw_update


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: AdamWState
    step: jnp.ndarray
    rng: jnp.ndarray


def _cast(tree, dtype):
    return jax.tree_util.tree_map(
        lambda p: p.astype(dtype) if jnp.issubdtype(p.dtype, jnp.floating) else p,
        tree,
    )


def create_state(
    cfg: SupervisedConfig, rng: jax.Array, sharded_classifier: bool = False,
    zero1_shards: int = 0,
) -> TrainState:
    """Host-side init (run under jit by the caller for speed).

    ``sharded_classifier=True`` (pass ``cfg.shard_classifier and
    mesh.shape['model'] > 1``) skips the in-model margin head: the train step
    uses the separate class-sharded CosFace weight instead, and carrying a
    dead fully-replicated (num_classes, dim) weight + two AdamW moments
    (~1.9 GB/device at 205k classes) would defeat the TP memory saving and
    bloat checkpoints.

    ``zero1_shards`` (pass ``mesh.shape['data']`` when ``cfg.zero1``): store
    the AdamW moments in the ZeRO-1 flat-chunked layout so the train step
    can shard them over the data axis.
    """
    model = _build_backbone(cfg, with_head=not sharded_classifier)
    x = jnp.zeros((2, cfg.model.image_size, cfg.model.image_size, 3))
    labels = jnp.zeros((2,), jnp.int32)
    variables = model.init({"params": rng, "dropout": rng}, x, labels, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    if zero1_shards > 1:
        opt_state = zero1_init(params, zero1_shards, moment_dtype=cfg.moment_dtype)
    else:
        opt_state = adamw_init(params, moment_dtype=cfg.moment_dtype)
    return TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
        step=jnp.zeros((), jnp.int32),
        rng=rng,
    )


_IRESNET_LAYERS = {
    "iresnet18": (2, 2, 2, 2), "iresnet34": (3, 4, 6, 3),
    "iresnet50": (3, 4, 14, 3), "iresnet100": (3, 13, 30, 3),
    "iresnet200": (6, 26, 60, 6),
}


def _build_backbone(cfg: "SupervisedConfig", bn_axis=None, with_head=True,
                    eval_mode=False):
    """The supervised backbone per ``cfg.network`` — construction in ONE
    place (create_state / make_train_step / make_embed_fn all build from
    it so the param trees always agree).

    ``with_head=False`` strips the in-model margin head (external-head
    paths and eval); ``eval_mode`` forces the dense MLP lowering
    (partfvit only — the pallas kernel loses in inference-only graphs,
    docs/PERF.md)."""
    if cfg.network == "partfvit":
        over: dict = {"bn_axis_name": bn_axis}
        if not with_head:
            over["loss_type"] = "None"
        if eval_mode:
            over["mlp_impl"] = "dense"
        return PartFViT(PartFViTConfig(**{**cfg.model.__dict__, **over}))
    layers = _IRESNET_LAYERS.get(cfg.network)
    if layers is None:
        raise ValueError(
            f"unknown network {cfg.network!r}; one of "
            f"{('partfvit', *_IRESNET_LAYERS)}"
        )
    if cfg.iresnet_avg and cfg.model.dim != 512:
        raise ValueError(
            "iresnet_avg's embedding is always 512-wide (bn2 → avg pool → "
            f"features BN, no fc) — set model.dim=512, got {cfg.model.dim}"
        )
    from ..models.iresnet import IResNet

    return IResNet(
        layers=layers, num_features=cfg.model.dim,
        dropout=cfg.model.dropout, with_loss=with_head,
        num_classes=cfg.model.num_classes, avg_pool=cfg.iresnet_avg,
        axis_name=bn_axis,
    )


def land_loss_schedule(epoch: int) -> float:
    """Landmark-distillation weight schedule (``train_largescale.py:826-835``):
    1000 → 100 → 1 → 0.11 → 0 by epoch bands."""
    if epoch <= 7:
        return 1000.0
    if epoch <= 13:
        return 100.0
    if epoch <= 20:
        return 1.0
    if epoch <= 27:
        return 0.11
    return 0.0


def make_train_step(
    cfg: SupervisedConfig,
    mesh: Mesh,
    example_params=None,
    donate: bool = False,
) -> Callable:
    """Build the jitted SPMD train step.

    Returns ``step_fn(state, images, labels, lr) -> (state, metrics)`` where
    ``images`` is (acc_step·B, H, W, 3) float in [-1, 1] (the train-time
    convention ``inputs/255*2-1``, ``train_largescale.py:790``) sharded over
    ``data``, and ``lr`` is the scheduled scalar for this step.
    """
    n_model = mesh.shape["model"]
    n_data = mesh.shape["data"]
    multi = n_model * n_data > 1
    # single-device fast path: plain jit, no collectives (shard_map over a
    # 1-device mesh compiles to a pathologically slow program on some
    # platforms — measured ~2000x on the tunneled TPU backend)
    shard_cls = cfg.shard_classifier and n_model > 1
    factored = cfg.factored_head  # composes with the TP head: per-shard
                                  # factors, local dW GEMM after the scan
    ext_head = shard_cls or factored  # margin weight lives outside the model
    pfc = factored and cfg.pfc_ratio < 1.0
    if cfg.pfc_ratio < 1.0:
        if not cfg.factored_head:
            raise ValueError("pfc_ratio < 1 requires factored_head=True "
                             "(the sampled head rides the factored-dW path)")
        if shard_cls and cfg.pfc_sampler == "uniform":
            raise ValueError("the TP-sharded head composes with the 'block' "
                             "pfc sampler only (per-shard contiguous "
                             "blocks); 'uniform' scatters rows across the "
                             "shard and is a measured wash even unsharded "
                             "(docs/PERF.md §partial-fc)")
        if cfg.mixup.label_smoothing > 0:
            raise ValueError("pfc_ratio < 1 drops the off-sample label-"
                             "smoothing mass; set label_smoothing=0")
        if cfg.pfc_sampler not in ("block", "uniform"):
            raise ValueError(f"unknown pfc_sampler {cfg.pfc_sampler!r}; "
                             "expected 'block' or 'uniform'")
    zero1 = cfg.zero1
    if zero1 and n_data < 2:
        raise ValueError("zero1=True needs a data axis to shard over "
                         f"(n_data={n_data}); the moment layout would not "
                         "match a single-device state")
    # under TP the sample is PER SHARD (each shard samples within the class
    # range it owns — insightface's PartialFC×model-parallel layout), so the
    # ratio applies to the local class count
    num_sample = max(1, int(round(
        cfg.pfc_ratio * (cfg.model.num_classes // (n_model if shard_cls else 1))
    )))
    bn_axis = "data" if (multi and n_data > 1) else None
    if cfg.network != "partfvit":
        if cfg.landmark_distill:
            raise ValueError(
                "landmark_distill is a Part-fViT feature (no landmark "
                f"branch in {cfg.network})"
            )
        if cfg.layer_decay != 1.0:
            raise ValueError(
                "layer_decay is the BEiT ViT policy (train_largescale.py"
                f":122-197) — {cfg.network} has no transformer layers to "
                "map; pass layer_decay=1.0 (uniform, the insightface "
                "recipe)"
            )
    model = _build_backbone(cfg, bn_axis=bn_axis, with_head=not ext_head)
    num_classes = cfg.model.num_classes
    assert num_classes % n_model == 0, "num_classes must divide model axis"
    _pmean_data = (
        (lambda x: jax.lax.pmean(x, "data")) if (multi and n_data > 1) else (lambda x: x)
    )
    if cfg.fused_device_aug:
        # import OUTSIDE the traced step (in-trace module import would stage
        # the module's constants into the trace and leak tracers)
        from ..ops.randaugment_device import (
            RandAugmentDeviceConfig,
            supervised_augment_device,
        )

        ra_cfg = RandAugmentDeviceConfig.from_config_str(cfg.rand_aug)
    if cfg.landmark_distill:
        assert cfg.model.with_land, "landmark_distill needs with_land=True"
        from ..models.partfvit import LandmarkProvider

        land_teacher = LandmarkProvider(
            num_landmarks=cfg.model.num_patches,
            patch_size=cfg.model.patch_size,
            stn_mode=cfg.model.stn_mode,
            coord_scale=float(cfg.model.image_size - 1),
        )

    def loss_fn(params, batch_stats, images, soft_targets, rng, cls_weight,
                land_vars=None, land_weight=0.0, wn=None, col_mask=None):
        cparams = _cast(params, cfg.compute_dtype)
        # external-head paths (sharded TP / factored): model emits embeddings,
        # margin head applied manually; unsharded in-model: the model's own
        # margin head consumes the (soft) targets
        out, mutated = model.apply(
            {"params": cparams, "batch_stats": batch_stats},
            images.astype(cfg.compute_dtype),
            None if ext_head else soft_targets,
            train=True,
            # partfvit-only kwarg (IResNet's __call__ has no token path)
            **({"return_tokens": ext_head and cfg.landmark_distill}
               if cfg.network == "partfvit" else {}),
            rngs={"dropout": rng, "augment": jax.random.fold_in(rng, 7)},
            mutable=["batch_stats"] if batch_stats else [],
        )
        theta = out[-1] if isinstance(out, tuple) else None
        head_aux = None
        if factored:
            # head math written out from the embedding so autodiff only flows
            # d loss/d emb; the weight cotangent is emitted in FACTORED form
            # (stop-gradient aux) — dW = Σ_micro dcosᵀ·nemb is assembled ONCE
            # after the scan. wn is the bf16 row-normalized weight (this
            # shard's class rows under TP) computed once per step, not per
            # microbatch. soft_targets arrive class-sharded when shard_cls.
            emb = (out[0] if isinstance(out, tuple) else out).astype(jnp.float32)
            nemb = emb / jnp.maximum(
                jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12
            )
            cos = jnp.matmul(
                nemb.astype(cfg.compute_dtype), wn.T,
                preferred_element_type=jnp.float32,
            )
            logits = cfg.model.cosface_s * (
                cos - cfg.model.cosface_m * soft_targets
            )
            if col_mask is not None:
                # dead pfc columns (duplicate class slots): out of the
                # softmax entirely — exp(-1e9 - rowmax) underflows to
                # exactly 0, so p and dcos are exact zeros there
                logits = jnp.where(col_mask[None, :], logits, -1e9)
            if shard_cls:
                # stable CE over the sharded class dim (same reductions as
                # sharded_softmax_ce) with the softmax kept for the factors
                local_max = jax.lax.stop_gradient(jnp.max(logits, axis=-1))
                row_max = jnp.max(
                    jax.lax.all_gather(local_max, "model", axis=0), axis=0
                )
                shifted = logits - row_max[:, None]
                denom = jax.lax.psum(
                    jnp.sum(jnp.exp(shifted), axis=-1), "model"
                )
                log_z = jnp.log(denom) + row_max
                tl = jax.lax.psum(
                    jnp.sum(soft_targets * logits, axis=-1), "model"
                )
                loss = jnp.mean(log_z - tl)
                p = jnp.exp(shifted) / denom[:, None]
            else:
                logsm = jax.nn.log_softmax(logits, axis=-1)
                loss = jnp.mean(jnp.sum(-soft_targets * logsm, axis=-1))
                p = jnp.exp(logsm)
            # d loss/d cos for mean CE over this microbatch: s·(p − t)/b
            dcos = (cfg.model.cosface_s / emb.shape[0]) * (p - soft_targets)
            head_aux = (
                jax.lax.stop_gradient(nemb).astype(cfg.compute_dtype),
                jax.lax.stop_gradient(dcos).astype(cfg.compute_dtype),
            )
        elif shard_cls:
            emb = (out[0] if isinstance(out, tuple) else out).astype(jnp.float32)
            # soft_targets arrive class-sharded (B, C/n_model)
            logits = local_margin_logits(
                emb,
                cls_weight.astype(jnp.float32),
                soft_targets,
                cfg.model.cosface_s,
                cfg.model.cosface_m,
            )
            loss = sharded_softmax_ce(logits, soft_targets, "model")
        else:
            logits = out[0] if isinstance(out, tuple) else out
            loss = softmax_cross_entropy(logits.astype(jnp.float32), soft_targets)
        if cfg.landmark_distill and land_vars is not None:
            # MSE against the frozen landmark teacher on the SAME (mixed)
            # inputs, coords normalized by image_size-1
            # (train_largescale.py:822-836)
            t_theta, _ = land_teacher.apply(
                land_vars, images.astype(jnp.float32), return_land=True
            )
            t_theta = jax.lax.stop_gradient(t_theta)
            s = float(cfg.model.image_size - 1)
            land_loss = jnp.mean(
                ((t_theta / s) - (theta.astype(jnp.float32) / s)) ** 2
            )
            loss = loss + land_weight * land_loss
        new_stats = mutated.get("batch_stats", batch_stats) if batch_stats else batch_stats
        return loss, (new_stats, head_aux)

    # layer-wise lr decay + wd trees are built lazily from the first params;
    # land_vars/land_weight precede the partial-bound kwargs so the optional
    # distillation args bind positionally
    def step_impl(state: TrainState, cls_weight, cls_opt, images, labels, lr,
                  land_vars=None, land_weight=0.0, *, lr_scale_tree, wd_tree):
        b = images.shape[0] // cfg.acc_step
        images = images.reshape(cfg.acc_step, b, *images.shape[1:])
        labels = labels.reshape(cfg.acc_step, b)
        rng, step_rng = jax.random.split(jax.random.fold_in(state.rng, state.step))
        pfc_idx = pfc_blk = col_mask = pfc_pos = pfc_block_ids = None
        if pfc:
            # the class sample is drawn from the PRE-fold rng and from the
            # all-gathered step labels, so every data shard holds the SAME
            # sample — the sparse update stays replicated and the dW
            # allreduce shrinks to the sampled rows. Under TP each MODEL
            # shard draws its own block within the class range it owns
            # (a fold on axis_index — still identical across data shards).
            pos = labels.reshape(-1)
            if multi and n_data > 1:
                pos = jax.lax.all_gather(pos, "data").reshape(-1)
            pfc_pos = pos
            pfc_rng = jax.random.fold_in(step_rng, 23)
            if cfg.pfc_sampler == "uniform":
                if num_sample < pos.size:
                    raise ValueError(
                        f"pfc_ratio {cfg.pfc_ratio} gives {num_sample} "
                        f"sampled classes but the step carries {pos.size} "
                        "labels; every positive must fit in the sample — "
                        "raise pfc_ratio")
                pfc_idx = sample_classes(
                    pfc_rng, pos, cfg.model.num_classes, num_sample
                )
            elif shard_cls:
                c_loc = num_classes // n_model
                shard_idx = jax.lax.axis_index("model")
                start, row_idx, u_pos = block_sample_local(
                    jax.random.fold_in(pfc_rng, shard_idx), pos, c_loc,
                    num_sample, shard_idx,
                )
                pfc_blk = (start, row_idx, u_pos)
                pfc_block_ids = shard_idx * c_loc + start + jnp.arange(num_sample)
                col_mask = jnp.concatenate(
                    [jnp.ones((num_sample,), bool), u_pos]
                )
            else:
                start, u_pos = block_sample(
                    pfc_rng, pos, cfg.model.num_classes, num_sample
                )
                pfc_blk = (start, pos, u_pos)
                pfc_block_ids = start + jnp.arange(num_sample)
                col_mask = jnp.concatenate(
                    [jnp.ones((num_sample,), bool), u_pos]
                )
        if factored:
            # row-normalize the margin weight ONCE per step — the in-model
            # head re-normalizes (2×630 MB of HBM traffic) every microbatch;
            # norms are kept for the post-scan gradient chain. Under pfc
            # only the sampled rows are gathered/normalized.
            if pfc_blk is not None:
                start, row_idx, u_pos = pfc_blk
                w_rows = jnp.concatenate([
                    jax.lax.dynamic_slice(
                        cls_weight, (start, 0),
                        (num_sample, cls_weight.shape[1]),
                    ),
                    cls_weight[row_idx],
                ])
            elif pfc:
                w_rows = cls_weight[pfc_idx]
            else:
                w_rows = cls_weight
            norms = jnp.maximum(
                jnp.linalg.norm(w_rows, axis=1, keepdims=True), 1e-12
            )
            wn = (w_rows / norms).astype(cfg.compute_dtype)
        else:
            wn = None
        if multi and n_data > 1:
            # independent per-data-shard mixup/dropout draws; the stored
            # state.rng (``rng``) stays replicated, and the 'model' axis is
            # NOT folded (class shards must see identical draws)
            from ..parallel.mesh import fold_in_shard

            step_rng = fold_in_shard(step_rng, "data")

        def micro(carry, xs):
            if factored:
                grads_acc, stats, loss_acc, mrng = carry
            else:
                grads_acc, wgrads_acc, stats, loss_acc, mrng = carry
            imgs, labs = xs
            mrng, krng, drng, arng = jax.random.split(mrng, 4)
            if cfg.fused_device_aug:
                imgs = supervised_augment_device(
                    arng, imgs, out_size=cfg.model.image_size, ra=ra_cfg,
                    rand_au=not cfg.flip_only,
                    resize_crop=not cfg.flip_only,
                )
            elif cfg.input_scale is not None:
                imgs = scale_uint8(imgs, cfg.input_scale)
            if pfc:
                # factored mixup: targets are built per sampled column from
                # (labels, flip(labels), lam) — the dense (B, num_classes)
                # soft-target row never materializes. All ids are GLOBAL
                # (under TP, pfc_block_ids carry the shard's class offset)
                imgs, lam_eff = mixup_cutmix_factors(krng, imgs, labs,
                                                     cfg.mixup)
                la = lam_eff[:, None]
                y2 = jnp.flip(labs, axis=0)
                col_t = lambda ids: (
                    la * (labs[:, None] == ids[None, :])
                    + (1 - la) * (y2[:, None] == ids[None, :])
                )
                if pfc_blk is not None:
                    _, _, u_pos = pfc_blk
                    targets = jnp.concatenate([
                        col_t(pfc_block_ids),
                        col_t(pfc_pos) * u_pos[None, :],
                    ], axis=1)
                else:
                    targets = col_t(pfc_idx)
            else:
                imgs, targets = mixup_cutmix(krng, imgs, labs, cfg.mixup)
            if shard_cls and not pfc:
                if cfg.mixup.enabled:
                    # soft rows: slice this shard's class block
                    idx = jax.lax.axis_index("model")
                    c_loc = num_classes // n_model
                    targets = jax.lax.dynamic_slice_in_dim(
                        targets, idx * c_loc, c_loc, axis=1
                    )
                else:
                    targets = shard_one_hot(labs, num_classes, "model")
            if factored:
                # no weight cotangent through autodiff: the head factors come
                # out as stop-gradient aux and dW is ONE GEMM after the scan
                (loss, (new_stats, head_aux)), g_params = jax.value_and_grad(
                    lambda p: loss_fn(p, stats, imgs, targets, drng, cls_weight,
                                      land_vars, land_weight, wn, col_mask),
                    has_aux=True,
                )(state.params)
                acc = jax.tree_util.tree_map(jnp.add, grads_acc, g_params)
                return (acc, new_stats, loss_acc + loss, mrng), head_aux
            (loss, (new_stats, _)), grads = jax.value_and_grad(
                lambda p, w: loss_fn(p, stats, imgs, targets, drng, w,
                                     land_vars, land_weight),
                argnums=(0, 1),
                has_aux=True,
            )(state.params, cls_weight)
            g_params, g_w = grads
            acc = jax.tree_util.tree_map(jnp.add, grads_acc, g_params)
            wacc = jnp.add(wgrads_acc, g_w)
            return (acc, wacc, new_stats, loss_acc + loss, mrng), None

        zero_g = jax.tree_util.tree_map(jnp.zeros_like, state.params)
        # loss carry must enter the scan already device-varying (vma rules)
        zero_loss = jnp.zeros(())
        if multi:
            zero_loss = jax.lax.pcast(zero_loss, ("data", "model"), to="varying")
        if factored:
            (grads, new_stats, loss_sum, _), (nembs, dcoss) = jax.lax.scan(
                micro,
                (zero_g, state.batch_stats, zero_loss, step_rng),
                (images, labels),
            )
            # dW over ALL microbatch rows in one MXU-shaped GEMM:
            # (C, acc·b) @ (acc·b, D) — the concatenation IS the accumulation
            dwn = jnp.matmul(
                dcoss.reshape(-1, dcoss.shape[-1]).T,
                nembs.reshape(-1, nembs.shape[-1]),
                preferred_element_type=jnp.float32,
            )
            # chain once through wn_r = w_r/||w_r||:
            # dw_r = (dwn_r − (wn_r·dwn_r)·wn_r)/||w_r||
            wnf = wn.astype(jnp.float32)
            rowdot = jnp.sum(dwn * wnf, axis=1, keepdims=True)
            wgrads = (dwn - rowdot * wnf) / norms
        else:
            zero_w = jnp.zeros_like(cls_weight)
            (grads, wgrads, new_stats, loss_sum, _), _ = jax.lax.scan(
                micro,
                (zero_g, zero_w, state.batch_stats, zero_loss, step_rng),
                (images, labels),
            )
        # mean over microbatches, then over data shards (DDP allreduce);
        # under zero1 the model grads stay LOCAL SUMS — the mean folds into
        # the psum_scatter inside zero1_adamw_update (half an allreduce;
        # the updated-param all_gather is the other half)
        inv = 1.0 / cfg.acc_step
        if not zero1:
            grads = jax.tree_util.tree_map(lambda g: g * inv, grads)
            grads = _pmean_data(grads)
        wgrads = wgrads * inv
        wgrads = _pmean_data(wgrads)
        loss = _pmean_data(loss_sum * inv)

        # non-finite guard: the reference band-aids a NaN loss by clipping
        # the (already poisoned) grads and stepping anyway
        # (train_largescale.py:877-878). TPU-native: zero grads AND lr for
        # that step — params stay untouched (moments decay one b1/b2 tick,
        # immaterial), training continues, the skip surfaces as a metric.
        finite = jnp.isfinite(loss)
        scale = jnp.where(finite, 1.0, 0.0)
        # jnp.where, not g*scale: NaN*0 is NaN — the poisoned grads must be
        # REPLACED, and the lr zeroed so weight decay doesn't step either
        zero = lambda g: jnp.where(finite, g, jnp.zeros_like(g))
        grads = jax.tree_util.tree_map(zero, grads)
        wgrads = zero(wgrads)
        new_stats = jax.tree_util.tree_map(
            lambda n, o: jnp.where(finite, n, o), new_stats, state.batch_stats
        )

        if zero1:
            new_params, new_opt = zero1_adamw_update(
                grads, state.opt_state, state.params, lr * scale,
                n_shards=n_data, wd_scale_tree=wd_tree,
                lr_scale_tree=lr_scale_tree, wd=1.0,
                grad_scale=inv / n_data,
            )
        else:
            new_params, new_opt = adamw_update(
                grads, state.opt_state, state.params, lr * scale,
                wd_scale_tree=wd_tree, lr_scale_tree=lr_scale_tree, wd=1.0,
            )
        if pfc_blk is not None:
            # block rows via dynamic slices + tiny positive-row delta
            # scatter; under TP everything here is in LOCAL row space and
            # dead (unowned) positive slots are gated off
            start, row_idx, u_pos = pfc_blk
            new_w_arr, new_cls_opt = block_pos_adamw(
                wgrads, cls_opt, cls_weight, start, num_sample, row_idx, u_pos,
                lr * scale, wd=cfg.weight_decay,
            )
            new_w = {"w": new_w_arr}
        elif pfc:
            # sparse-row AdamW: only the sampled (num_sample, D) rows of the
            # weight and its moments are read/updated/written
            new_w_arr, new_cls_opt = sparse_row_adamw(
                wgrads, cls_opt, cls_weight, pfc_idx, lr * scale,
                wd=cfg.weight_decay,
            )
            new_w = {"w": new_w_arr}
        else:
            new_w, new_cls_opt = adamw_update(
                {"w": wgrads}, cls_opt, {"w": cls_weight}, lr * scale,
                wd=cfg.weight_decay,
            )
        new_state = TrainState(
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt,
            step=state.step + 1,
            rng=rng,
        )
        return new_state, new_w["w"], new_cls_opt, {
            "loss": loss,
            "skipped_nonfinite": 1.0 - scale,
        }

    # shard_map in/out spec trees must match the state pytree structure, so
    # the jitted wrapper is built (and cached) on first call from the
    # concrete state.
    cache = {}

    def step_fn(state, cls_weight, cls_opt, images, labels, lr,
                land_vars=None, land_weight=0.0):
        distill_args = (
            (land_vars, jnp.float32(land_weight)) if cfg.landmark_distill else ()
        )
        if "fn" not in cache:
            lr_scale_tree, wd_tree = param_groups_lrd(
                state.params, cfg.model.depth, cfg.weight_decay,
                cfg.layer_decay, cfg.stn_weight_decay,
            )
            impl = functools.partial(
                step_impl, lr_scale_tree=lr_scale_tree, wd_tree=wd_tree
            )
            dk = dict(donate_argnums=(0, 1, 2)) if donate else {}
            if not multi:
                cache["fn"] = jax.jit(impl, **dk)
                return cache["fn"](state, cls_weight, cls_opt, images, labels,
                                   lr, *distill_args)
            replicate = lambda tree: jax.tree_util.tree_map(lambda _: P(), tree)
            # classifier opt-state moments are (C, D) like the weight →
            # sharded over 'model'; the scalar step count stays replicated
            cls_opt_spec = jax.tree_util.tree_map(
                lambda x: P("model", None) if getattr(x, "ndim", 0) == 2 else P(),
                cls_opt,
            )
            state_spec = replicate(state)
            if zero1:
                # ZeRO-1: moment leaves are flat (n_data·c,) arrays sharded
                # over 'data'; everything else in the state stays replicated
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
            extra_specs = (
                (replicate(land_vars), P()) if cfg.landmark_distill else ()
            )
            cache["fn"] = jax.jit(
                jax.shard_map(
                    impl,
                    mesh=mesh,
                    in_specs=(
                        state_spec,
                        P("model", None),
                        cls_opt_spec,
                        P("data"),
                        P("data"),
                        P(),
                    ) + extra_specs,
                    out_specs=(
                        state_spec,
                        P("model", None),
                        cls_opt_spec,
                        {"loss": P(), "skipped_nonfinite": P()},
                    ),
                    # state/loss ARE replicated over 'model' (every model
                    # shard sees identical inputs and a psum'd loss) but the
                    # static vma check can't infer it through value_and_grad
                    check_vma=False,
                ),
                **dk,
            )
        return cache["fn"](state, cls_weight, cls_opt, images, labels, lr,
                           *distill_args)

    return step_fn


def create_classifier(
    cfg: SupervisedConfig, rng, enabled: bool = True
) -> Tuple[jnp.ndarray, AdamWState]:
    """Sharded CosFace weight (C, D) + its optimizer state.

    ``enabled=False`` (the in-model head is in use) returns a zero-row weight
    so the step signature stays uniform without carrying an unused
    (num_classes, dim) replica."""
    if not enabled:
        w = jnp.zeros((0, cfg.model.dim), jnp.float32)
        return w, adamw_init({"w": w}, moment_dtype=cfg.moment_dtype)
    w = jax.nn.initializers.xavier_uniform()(
        rng, (cfg.model.num_classes, cfg.model.dim), jnp.float32
    )
    return w, adamw_init({"w": w}, moment_dtype=cfg.moment_dtype)


def make_landmark_viz_fn(cfg: SupervisedConfig, input_scale: str = "half"):
    """Jitted eval-time landmark/patch extractor for visualization.

    (variables, uint8 images) → (theta (B, N, 2) pixel coords,
    patches (B, N, P, P, 3) in the input scale) — feeds
    ``utils.visualize.plot_landmarks`` / ``save_patch_grid``, replacing the
    reference's per-eval overlay dumps (``util/utils.py:1141-1251``)."""
    from ..models.partfvit import LandmarkRegressor
    from ..ops.patch_gather import patch_gather

    reg = LandmarkRegressor(
        cfg.model.num_patches, None, cfg.model.stn_mode,
        float(cfg.model.image_size - 1),
    )
    p = cfg.model.patch_size

    @jax.jit
    def viz(variables, images):
        x = scale_uint8(images, input_scale)
        lvars = {"params": variables["params"]["landmark"]}
        bs = variables.get("batch_stats", {})
        if "landmark" in bs:
            lvars["batch_stats"] = bs["landmark"]
        theta, _ = reg.apply(lvars, x, False)
        tokens = patch_gather(x, theta, p, impl=cfg.model.gather_impl)
        b, n = tokens.shape[:2]
        # tokens flatten (x_off, y_off, c); display wants (y, x, c)
        patches = tokens.reshape(b, n, p, p, -1).transpose(0, 1, 3, 2, 4)
        return theta, patches

    return viz


def make_embed_fn(
    cfg: SupervisedConfig,
    mesh: Optional[Mesh] = None,
    input_scale: Optional[str] = None,
    compute_dtype: Any = None,
):
    """Jitted eval-time embedding fn for perform_val / IJB sweeps.

    With a multi-device mesh the batch is padded to a multiple of the data
    axis and sharded over it, so in-training verification and IJB extraction
    scale across the pod slice instead of running single-device.

    ``input_scale`` ('half' = x/255−0.5, 'unit' = x/255·2−1): accept RAW
    uint8 batches and normalize ON DEVICE — 4× less host→device transfer
    (pair with ``perform_val(..., device_scale=True)``).

    Always uses the DENSE MLP path: the fused pallas kernel is a training
    win but measured slower in inference-only graphs (custom-call layout
    constraints, docs/PERF.md); the param trees are identical so the same
    weights apply.

    ``compute_dtype`` (e.g. ``jnp.bfloat16``): cast params + inputs for
    the forward and return fp32 — ~2× MXU throughput on eval sweeps (the
    documented 1,328 faces/s IJB ceiling is the bf16 number; embeddings
    agree with fp32 to cosine ≳ 1−1e-3). ``None`` keeps fp32 — the
    in-training `perform_val`/need_save gate default, so checkpoint
    selection stays bit-stable."""
    model = _build_backbone(cfg, with_head=False, eval_mode=True)

    @jax.jit
    def embed(variables, images):
        if input_scale is not None:
            images = scale_uint8(images, input_scale)
        if compute_dtype is not None:
            variables = jax.tree_util.tree_map(
                lambda p: p.astype(compute_dtype)
                if jnp.issubdtype(p.dtype, jnp.floating) else p,
                variables,
            )
            images = images.astype(compute_dtype)
        return model.apply(variables, images, train=False).astype(
            jnp.float32
        )

    if mesh is not None and mesh.size > 1:
        from ..parallel.mesh import sharded_batch_apply

        return sharded_batch_apply(embed, mesh)
    return embed
