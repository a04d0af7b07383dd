"""Supervised Part-fViT finetuning CLI.

TPU-native equivalent of ``train_largescale.py`` + ``supervised_config.py``:
one process drives the whole mesh (no torch.distributed.launch); hard-coded
reference booleans (webface/with_land/NUM_CLASS override,
``train_largescale.py:431-437,513``) are real flags here.

Example:
  python -m lafs_cvpr2024_tpu.cli.train_supervised \
      --data-root /data/webface4m --eval-path /data/val \
      --ssl-checkpoint /ckpt/ssl --work-path /out
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import jax

# hardware-accelerated PRNG (dropout mask generation is ~30% of a step with
# the default threefry implementation on TPU)
jax.config.update("jax_default_prng_impl", "rbg")

import jax.numpy as jnp
import numpy as np


def get_args():
    p = argparse.ArgumentParser("lafs-tpu supervised finetune")
    p.add_argument("--data-root", required=True, help="dir with train.rec/.idx/property")
    p.add_argument("--eval-path", default=None, help="dir with {lfw,cfp_fp,agedb_30}.bin")
    p.add_argument("--targets", nargs="+", default=["lfw", "cfp_fp", "agedb_30"])
    p.add_argument("--work-path", required=True)
    p.add_argument("--ssl-checkpoint", default=None, help="torch .pth or orbax dir to init from")
    p.add_argument("--landmark-checkpoint", default=None, help="stage-1 stn+output weights (.pth)")
    p.add_argument("--batch-size", type=int, default=200)
    p.add_argument("--acc-step", type=int, default=3)
    p.add_argument("--epochs", type=int, default=34)
    p.add_argument("--warmup-epochs", type=int, default=5)
    p.add_argument("--lr", type=float, default=3e-4, help="base lr before the scaling rule")
    p.add_argument("--num-classes", type=int, default=None, help="override property file")
    p.add_argument("--network", default="partfvit",
                   choices=["partfvit", "iresnet18", "iresnet34",
                            "iresnet50", "iresnet100", "iresnet200"],
                   help="backbone: partfvit (the flagship) or the "
                        "reference's selectable iResNet alternative "
                        "(face_pre_pro/iresnet.py). iresnet uses "
                        "--embedding-size (set 512 for the insightface "
                        "layout) and uniform lr (no ViT layer decay); "
                        "transformer-geometry/landmark flags don't apply")
    p.add_argument("--iresnet-avg", action="store_true",
                   help="IResNet_withloss_avg head (bn2 → avg pool → "
                        "features BN, no fc; embedding is always 512 — "
                        "pass --embedding-size 512)")
    p.add_argument("--embedding-size", type=int, default=768)
    p.add_argument("--depth", type=int, default=12)
    p.add_argument("--heads", type=int, default=11)
    p.add_argument("--dim-head", type=int, default=64)
    p.add_argument("--moment-dtype", default="bfloat16",
                   choices=["float32", "bfloat16"],
                   help="AdamW moment STORAGE dtype (update math is always "
                        "fp32); bf16 halves optimizer HBM traffic — "
                        "loss-trajectory A/B identical (docs/PERF.md)")
    p.add_argument("--mlp-dim", type=int, default=2048)
    p.add_argument("--num-patches", type=int, default=196)
    p.add_argument("--patch-size", type=int, default=8)
    p.add_argument("--image-size", type=int, default=112)
    p.add_argument("--stn-mode", default="large", choices=["large", "small"])
    p.add_argument("--with-land", action="store_true", default=True)
    p.add_argument("--no-land", dest="with_land", action="store_false")
    p.add_argument("--head-name", default="CosFace",
                   choices=["CosFace", "ArcFace", "SFace", "Softmax"])
    p.add_argument("--bgr", action="store_true", help="keep packed BGR order (ms1m-style recs)")
    p.add_argument("--rand-aug", default="rand-m1-mstd0.5-inc1")
    p.add_argument("--syn-aug", action="store_true",
                   help="FaceDataset_syn_aug preset (image_iter.py:584-604): "
                        "random JPEG-compress/blur/down-up/grayscale "
                        "degradations composed into the host augmentation")
    p.add_argument("--flip-only", action="store_true",
                   help="flip augmentation ONLY (reference README.md:83-84: "
                        "random_resizecrop=False, rand_au=False): random "
                        "mirror is the sole augmentation, host or "
                        "--device-aug path alike. The README's recipe also "
                        "sets mixup off — pass --mixup-prob 0.0 with it")
    p.add_argument("--mixup", type=float, default=0.2,
                   help="mixup alpha (train_largescale.py:528-531)")
    p.add_argument("--mixup-prob", type=float, default=0.1)
    p.add_argument("--cutmix", type=float, default=0.0,
                   help="cutmix alpha (reference --cutmix; 0 = off)")
    p.add_argument("--cutmix-minmax", type=float, nargs=2, default=None,
                   metavar=("MIN", "MAX"),
                   help="min/max cutmix box ratios (timm rand_bbox_minmax, "
                        "util/mixup_my.py:50-68) — overrides the alpha-"
                        "based box; enables cutmix even at --cutmix 0")
    p.add_argument("--mixup-switch-prob", type=float, default=0.5,
                   help="P(cutmix | both alphas > 0) per batch/sample")
    p.add_argument("--mixup-mode", default="batch",
                   choices=["batch", "elem", "pair"],
                   help="mixup_my.py lam granularity")
    p.add_argument("--smoothing", type=float, default=0.0,
                   help="label smoothing folded into the mixup soft "
                        "targets (reference --smoothing)")
    p.add_argument("--partition", type=float, default=None, help="few-shot fraction")
    p.add_argument("--kshot", type=int, default=None,
                   help="k images per identity (few-shot protocol, README.md:52-56)")
    p.add_argument("--landmark-distill", action="store_true",
                   help="add MSE against the frozen landmark teacher "
                        "(pre_land+keep_land, train_largescale.py:807-836; "
                        "requires --landmark-checkpoint)")
    p.add_argument("--attn-impl", default="einsum",
                   choices=["einsum", "fused", "flash"],
                   help="attention impl; einsum is fastest at this "
                        "architecture's d_head=64 on every measured "
                        "workload (docs/PERF.md) — the pallas kernels "
                        "are for long-sequence configs")
    p.add_argument("--mlp-impl", default="auto",
                   choices=["auto", "dense", "fused", "fused_ln"],
                   help="transformer MLP impl; 'fused_ln' = pallas LN+fc1+"
                        "gelu+dropout+fc2 kernel (auto: fused_ln on TPU — "
                        "measured fastest, docs/PERF.md)")
    p.add_argument("--device-aug", action="store_true",
                   help="run mirror+RandAugment+crop+jitter+erasing ON DEVICE "
                        "inside the train step (host ships raw uint8; "
                        "host-immune input pipeline)")
    p.add_argument("--model-axis", type=int, default=1, help="classifier TP shards")
    p.add_argument("--factored-head", action="store_true",
                   help="margin head outside the model with factored dW "
                        "accumulation across the microbatch scan (one dW GEMM"
                        " + one weight-norm pass per step; docs/PERF.md "
                        "§factored-head); composes with the TP head "
                        "(--model-axis>1): per-shard factors")
    p.add_argument("--pfc-ratio", type=float, default=1.0,
                   help="PartialFC-style sampled margin head: each step the "
                        "CE runs over all positives + uniform negatives "
                        "totalling ratio*C classes, and only those weight/"
                        "moment rows are updated (sparse-row AdamW). "
                        "Implies --factored-head; excludes label smoothing. "
                        "Composes with --model-axis>1 (block sampler: each "
                        "shard samples within its own class range)")
    p.add_argument("--pfc-sampler", choices=["block", "uniform"],
                   default="block",
                   help="PartialFC negative sampler: 'block' (TPU-native "
                        "contiguous-block negatives + explicit positive "
                        "columns; weight/moment rows move via dynamic "
                        "slices) or 'uniform' (insightface-faithful "
                        "scattered sample; measured slower on TPU — "
                        "docs/PERF.md §partial-fc)")
    p.add_argument("--zero1", action="store_true",
                   help="ZeRO-1 optimizer-state sharding: AdamW moments "
                        "live 1/n_data per chip (psum_scatter grads, "
                        "all_gather updated params — same collective bytes "
                        "as the plain grad allreduce); needs data axis > 1")
    p.add_argument("--slices", type=int, default=None,
                   help="multi-slice topology: lay the data axis out "
                        "slice-major so grad psums reduce ICI-first with one "
                        "partial per slice over DCN (auto-detected from "
                        "device slice metadata when omitted)")
    p.add_argument("--profile-steps", type=int, default=0,
                   help="capture a jax.profiler device trace of N steps "
                        "(starting at global step 2) into "
                        "<work-path>/profile — view in TensorBoard/Perfetto")
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--seed", type=int, default=1335)
    p.add_argument("--disp-freq", type=int, default=2000)
    p.add_argument("--resume", action="store_true")
    from ..utils.config import apply_toml_defaults

    return apply_toml_defaults(p, table='train')


def main():
    args = get_args()
    from ..utils.config import resolve_mlp_impl
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from ..data import (
        DataPipeline,
        EpochSampler,
        FaceRecordDataset,
        SupervisedAugment,
        read_property,
    )
    from ..eval.verification import get_val_data, perform_val
    from ..models.partfvit import PartFViTConfig
    from ..ops.mixup import MixupConfig
    from ..ops.schedules import supervised_lr_scaling, warmup_cosine_lr
    from ..parallel.mesh import create_multislice_mesh, is_main_process
    from ..train.checkpoint import (
        import_torch_state_dict,
        load_torch_file,
        merge_params,
        strip_prefixes,
    )
    from ..train.supervised import (
        SupervisedConfig,
        create_classifier,
        create_state,
        make_embed_fn,
        make_train_step,
    )
    from ..utils import JSONLLogger, MetricLogger, TensorBoardWriter, need_save

    from ..utils.logging import dump_config

    os.makedirs(args.work_path, exist_ok=True)
    dump_config(os.path.join(args.work_path, "config.txt"), args)
    mesh = create_multislice_mesh(model=args.model_axis, slices=args.slices)
    n_dev = len(jax.devices())

    # --data-root is either a packed rec dir (train.rec + property) or a raw
    # class-per-subdirectory ImageFolder (FaceDataset_webface path — trains
    # directly, no packing; the file list is JSON-cached on first scan)
    rec_file = os.path.join(args.data_root, "train.rec")
    # --device-aug: the host ships raw uint8 images; the whole augmentation
    # pipeline runs inside the compiled step
    if args.syn_aug and args.device_aug:
        raise SystemExit("--syn-aug is a host pipeline; drop --device-aug")
    if args.flip_only and args.syn_aug:
        raise SystemExit("--flip-only removes the augmentations --syn-aug "
                         "adds; pick one")
    if args.flip_only:
        aug = None if args.device_aug else SupervisedAugment(
            rand_au=False, random_resizecrop=False, size=args.image_size
        )
    else:
        aug = None if args.device_aug else (
            SupervisedAugment.syn(size=args.image_size)
            if args.syn_aug
            else SupervisedAugment(config_str=args.rand_aug,
                                   size=args.image_size)
        )
    if args.flip_only and args.mixup_prob > 0:
        print("[train_supervised] NOTE: --flip-only with mixup prob "
              f"{args.mixup_prob} — the reference's flip-only recipe also "
              "disables mixup (--mixup-prob 0.0)", file=sys.stderr)
    if os.path.isfile(rec_file):
        num_classes, h, w = read_property(args.data_root)
        dataset = FaceRecordDataset(
            rec_file, transform=aug, bgr=args.bgr, partition=args.partition
        )
    else:
        from ..data import FaceFolderDataset

        dataset = FaceFolderDataset(
            args.data_root, transform=aug, bgr=args.bgr, partition=args.partition
        )
        num_classes = dataset.num_identities
    if args.num_classes:
        num_classes = args.num_classes
    # round classes up to a multiple of the model axis for even sharding
    if num_classes % args.model_axis:
        num_classes += args.model_axis - num_classes % args.model_axis
    if args.kshot:
        dataset.restrict_to_keys(dataset.kshot_keys(args.kshot, seed=args.seed))
    # --batch-size is PER data shard per microbatch (the reference's per-GPU
    # batch); one step consumes batch * acc_step * data_shards rows GLOBALLY,
    # of which each process contributes rows/process_count (the sampler is
    # process-local; global assembly happens in DataPipeline via global_batch)
    n_data = mesh.shape["data"]
    n_proc = jax.process_count()
    rows_per_step = args.batch_size * args.acc_step * n_data
    assert rows_per_step % n_proc == 0, (
        f"global rows/step {rows_per_step} must divide process count {n_proc}"
    )
    sampler = EpochSampler(len(dataset), rows_per_step // n_proc, seed=args.seed)
    # images ship RAW uint8 (4× less host→device transfer) on every path:
    # the step scales on device (input_scale='unit', the train convention)
    # or augments on device (--device-aug)
    pipe = DataPipeline(
        dataset, sampler, num_workers=args.workers,
        mesh=mesh, spec=P("data"),
    )

    iresnet = args.network != "partfvit"
    if iresnet:
        # no landmark branch / no transformer: the checkpoint-surgery and
        # distillation flags are Part-fViT features — fail, don't ignore
        for flag, val in (("--ssl-checkpoint", args.ssl_checkpoint),
                          ("--landmark-checkpoint", args.landmark_checkpoint),
                          ("--landmark-distill", args.landmark_distill)):
            if val:
                raise SystemExit(f"{flag} is a Part-fViT feature; "
                                 f"--network {args.network} has no "
                                 "landmark branch")
        if args.head_name != "CosFace":
            raise SystemExit("--network iresnet* ships the reference's "
                             "in-model CosFace head only "
                             "(iresnet.py:60-132); use --model-axis/"
                             "--factored-head for the external variants")
    cfg = SupervisedConfig(
        model=PartFViTConfig(
            dim=args.embedding_size, depth=args.depth, heads=args.heads,
            dim_head=args.dim_head, mlp_dim=args.mlp_dim,
            num_patches=args.num_patches,
            patch_size=args.patch_size, num_classes=num_classes,
            with_land=args.with_land and not iresnet,
            loss_type=args.head_name,
            image_size=args.image_size, stn_mode=args.stn_mode,
            mlp_impl=resolve_mlp_impl(args.mlp_impl),
            attn_impl=args.attn_impl,
        ),
        network=args.network,
        iresnet_avg=args.iresnet_avg,
        # BEiT layer decay is a ViT policy; insightface trains uniform
        layer_decay=1.0 if iresnet else 0.58,
        acc_step=args.acc_step,
        mixup=MixupConfig(
            mixup_alpha=args.mixup, cutmix_alpha=args.cutmix,
            cutmix_minmax=(tuple(args.cutmix_minmax)
                           if args.cutmix_minmax else None),
            prob=args.mixup_prob, switch_prob=args.mixup_switch_prob,
            label_smoothing=args.smoothing, mode=args.mixup_mode,
            num_classes=num_classes,
        ),
        shard_classifier=args.model_axis > 1,
        factored_head=args.factored_head or args.pfc_ratio < 1.0,
        pfc_ratio=args.pfc_ratio,
        pfc_sampler=args.pfc_sampler,
        fused_device_aug=args.device_aug,
        input_scale=None if args.device_aug else "unit",
        rand_aug=args.rand_aug,
        flip_only=args.flip_only,
        landmark_distill=args.landmark_distill,
        moment_dtype=jnp.bfloat16 if args.moment_dtype == "bfloat16" else jnp.float32,
        zero1=args.zero1,
    )

    rng = jax.random.PRNGKey(args.seed)
    # with the class-sharded head active, skip the in-model margin head (its
    # replicated (C, D) weight + moments would be dead state) and vice versa
    shard_cls = cfg.shard_classifier and mesh.shape["model"] > 1
    ext_head = shard_cls or cfg.factored_head
    state = jax.jit(lambda r: create_state(
        cfg, r, sharded_classifier=ext_head,
        zero1_shards=mesh.shape["data"] if cfg.zero1 else 0,
    ))(rng)
    cls_w, cls_opt = create_classifier(cfg, jax.random.fold_in(rng, 1), enabled=ext_head)
    land_vars = None
    if args.landmark_distill:
        from ..train.ssl import SSLConfig, create_landmark_provider

        land_vars = create_landmark_provider(
            SSLConfig(model=cfg.model), jax.random.fold_in(rng, 2)
        )

    # checkpoint surgery: SSL teacher init + landmark stem
    if args.ssl_checkpoint and args.ssl_checkpoint.endswith(".pth"):
        ckpt = load_torch_file(args.ssl_checkpoint)
        sd = ckpt.get("teacher", ckpt)
        imp = import_torch_state_dict(sd)
        print(f"[import ssl ckpt] {imp.summary()}")
        missing = []
        state = state._replace(
            params=merge_params(state.params, imp.params, unmatched=missing)
        )
        if missing:
            print(f"[import ssl ckpt] not in model ({len(missing)}): {missing[:8]}")
    elif args.ssl_checkpoint:
        # orbax dir written by cli/train_ssl — the pretrain→finetune handoff
        # (reference: load the SSL TEACHER backbone, train_largescale.py:
        # 639-657; the DINO head is dropped)
        from ..train.checkpoint import restore_eval_variables

        variables, ssl_step = restore_eval_variables(args.ssl_checkpoint)
        missing = []
        state = state._replace(
            params=merge_params(
                state.params, variables["params"], unmatched=missing
            )
        )
        n_leaves = len(jax.tree_util.tree_leaves(variables["params"]))
        print(f"[import ssl ckpt] orbax step {ssl_step}: merged teacher "
              f"backbone ({n_leaves} tensors)")
        if missing:
            print(f"[import ssl ckpt] not in model ({len(missing)}): {missing[:8]}")
    if args.landmark_checkpoint:
        sd = load_torch_file(args.landmark_checkpoint)
        imp = import_torch_state_dict(sd)
        print(f"[import landmark ckpt] {imp.summary()}")
        params, stats = imp
        state = state._replace(
            params=merge_params(state.params, params, ["stn", "output"]),
            batch_stats=merge_params(state.batch_stats, stats, ["stn"]),
        )
        if land_vars is not None:
            land_vars = {
                "params": merge_params(land_vars["params"], params, ["stn", "output"]),
                "batch_stats": merge_params(
                    land_vars.get("batch_stats", {}), stats, ["stn"]
                ),
            }

    steps_per_epoch = sampler.steps_per_epoch()
    total_steps = args.epochs * steps_per_epoch
    base_lr = supervised_lr_scaling(args.lr, args.acc_step, args.batch_size, n_dev)
    lr_sched = warmup_cosine_lr(
        base_lr, total_steps, args.warmup_epochs * steps_per_epoch
    )

    # the disabled (zero-row) classifier is excluded from checkpoints
    # (orbax rejects zero-size arrays, and there is nothing to persist)
    def ckpt_payload():
        payload = {"state": state}
        if ext_head:
            payload["cls_w"], payload["cls_opt"] = cls_w, cls_opt
        return payload

    # restore (tolerating a --zero1 layout flip), async writer (ALL ranks),
    # SIGTERM preemption guard — one shared wiring (train/checkpoint.py)
    from ..train.checkpoint import make_training_checkpointer
    from ..train.optim import adapt_moment_layout

    cur_shards = mesh.shape["data"] if cfg.zero1 else 0

    def _alt_abstract():
        # the OTHER moment layout's template (dense <-> ZeRO-1 flat-
        # chunked), built only when the primary restore fails
        abstract = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), ckpt_payload()
        )
        alt_state = jax.eval_shape(
            lambda r: create_state(
                cfg, r, sharded_classifier=ext_head,
                zero1_shards=0 if cfg.zero1 else mesh.shape["data"],
            ),
            rng,
        )
        return {**abstract, "state": alt_state}

    def adapt(payload):
        st = payload["state"]
        st = st._replace(opt_state=adapt_moment_layout(
            st.opt_state, st.params, cur_shards))
        return {**payload, "state": st}

    restored, start_step, writer, guard = make_training_checkpointer(
        os.path.join(args.work_path, "ckpt"), ckpt_payload(),
        _alt_abstract, adapt, resume=args.resume,
    )
    if restored is not None:
        state = restored["state"]
        if ext_head:
            cls_w, cls_opt = restored["cls_w"], restored["cls_opt"]
    else:
        start_step = 0

    step_fn = make_train_step(cfg, mesh, donate=True)
    embed_fn = make_embed_fn(cfg, mesh, input_scale="half")
    # eval-time landmark/patch visualization (with_land models only)
    from ..train.supervised import make_landmark_viz_fn

    viz_fn = make_landmark_viz_fn(cfg) if cfg.model.with_land else None
    vers = get_val_data(args.eval_path, args.targets) if args.eval_path else []
    highest_acc = [0.0 for _ in args.targets]

    tracing = False
    logger = MetricLogger()
    tb = TensorBoardWriter(args.work_path, enabled=is_main_process())
    jsonl = JSONLLogger(os.path.join(args.work_path, "log.txt"), enabled=is_main_process())
    ver_freq = max(len(dataset) // (n_dev * args.batch_size * 2), 1)

    # Deferred loss fetch (see cli/train_ssl.py): per-step float() on the
    # device loss is a host sync; buffer and fetch at disp_freq boundaries.
    # nan_exit=False (non-finite steps are SKIPPED atomically in-step and
    # surfaced as a metric), so the extra main-only disp_freq flush below
    # is safe; the unconditional 100-step cadence bounds the buffer on
    # every process.
    from ..utils.logging import DeferredLossFetcher

    losses = DeferredLossFetcher(logger, nan_exit=False)

    gstep = start_step
    resume_epoch = start_step // max(steps_per_epoch, 1)
    resume_skip = start_step % max(steps_per_epoch, 1)
    if resume_skip:
        print(f"[resume] mid-epoch: epoch {resume_epoch} step {resume_skip}")
    for epoch in range(resume_epoch, args.epochs):
        t_epoch = time.time()
        skip = resume_skip if epoch == resume_epoch else 0
        for images, labels in pipe.epoch(epoch, start_step=skip):
            lr = float(lr_sched[min(gstep, total_steps - 1)])
            if args.landmark_distill:
                from ..train.supervised import land_loss_schedule

                state, cls_w, cls_opt, metrics = step_fn(
                    state, cls_w, cls_opt, images, labels.astype(jnp.int32),
                    lr, land_vars=land_vars,
                    land_weight=land_loss_schedule(epoch),
                )
            else:
                state, cls_w, cls_opt, metrics = step_fn(
                    state, cls_w, cls_opt, images, labels.astype(jnp.int32), lr
                )
            if args.profile_steps and is_main_process():
                if gstep == start_step + 2:
                    jax.profiler.start_trace(
                        os.path.join(args.work_path, "profile")
                    )
                    tracing = True
                elif tracing and gstep >= start_step + 2 + args.profile_steps:
                    jax.profiler.stop_trace()
                    tracing = False
            losses.append(gstep, metrics["loss"])
            logger.update(lr=lr)
            losses.maybe_flush(gstep)
            if guard.should_exit(gstep):
                losses.flush()
                if tracing:
                    jax.profiler.stop_trace()
                writer.save(gstep + 1, ckpt_payload())
                writer.close()
                if is_main_process():
                    print(f"[preempt] SIGTERM: saved step {gstep + 1}; "
                          "exiting cleanly — rerun with --resume to "
                          "continue exactly")
                return
            if gstep % args.disp_freq == 0 and is_main_process():
                losses.flush()
                print(f"epoch {epoch} step {gstep}: {logger}")
                tb.add_scalar(
                    "Training/Training_Loss", logger.meters["loss"].median, gstep
                )
                tb.add_scalar("LR", lr, gstep)
            if vers and gstep and gstep % ver_freq == 0:
                # EVERY process runs the sweep: embed_fn is collective on
                # multi-host meshes (sharded_batch_apply all-gathers over
                # the mesh — a rank-0-only call would deadlock the pod) and
                # the eval data is host-replicated, so each process computes
                # identical accs and the need_save/writer.save decision
                # below agrees across processes (orbax saves are collective
                # too). Only prints/TB/viz stay rank-0 (tb self-gates).
                variables = {"params": state.params}
                if state.batch_stats:
                    variables["batch_stats"] = state.batch_stats
                accs = []
                for name, data, issame in vers:
                    res = perform_val(
                        lambda b: embed_fn(variables, jnp.asarray(b)),
                        data, issame, device_scale=True,
                    )
                    accs.append(res.accuracy)
                    if is_main_process():
                        print(f"[{name}][{gstep}] acc {res.accuracy:.5f}±{res.accuracy_std:.5f} "
                              f"xnorm {res.xnorm:.3f} thr {res.best_threshold:.3f}")
                    tb.add_scalar(f"{name}_Accuracy", res.accuracy, gstep)
                    # eval-time observability (reference buffer_val +
                    # save_patch/plot_landmark, util/utils.py:1038-1043,
                    # 1141-1251): ROC image per target; landmark overlay +
                    # patch grid for the first eval face
                    if is_main_process():
                        from ..utils.visualize import gen_roc_plot

                        tb.add_image(
                            f"{name}_roc_curve",
                            gen_roc_plot(res.fpr, res.tpr), gstep,
                        )
                    if viz_fn is not None:
                        # viz_fn is a jit over the GLOBAL params — like the
                        # sweep above, every process must dispatch it; only
                        # the rendering/IO below stays rank-0
                        face = np.asarray(data[0, :1])  # first orig face
                        theta, patches = viz_fn(variables, jnp.asarray(face))
                    if viz_fn is not None and is_main_process():
                        from ..utils.visualize import (
                            plot_landmarks,
                            save_patch_grid,
                        )

                        viz_dir = os.path.join(args.work_path, "viz")
                        os.makedirs(viz_dir, exist_ok=True)
                        png = plot_landmarks(
                            face[0], np.asarray(theta[0]), denorm=False
                        )
                        tb.add_image(f"{name}_landmarks", png, gstep)
                        with open(
                            os.path.join(
                                viz_dir, f"{name}_landmarks_{gstep}.png"
                            ), "wb",
                        ) as f:
                            f.write(png)
                        save_patch_grid(
                            (np.asarray(patches[0]) + 0.5).clip(0, 1),
                            os.path.join(viz_dir, f"{name}_patches_{gstep}.png"),
                            denorm=False,
                        )
                if need_save(accs, highest_acc):
                    # gstep's update is already in the state -> exact
                    # resume restarts at gstep + 1 (same convention as the
                    # preempt/periodic saves; gstep would re-apply a step)
                    writer.save(gstep + 1, ckpt_payload())
            gstep += 1
        losses.flush()
        jsonl.write({"epoch": epoch, "loss": logger.meters["loss"].global_avg,
                     "epoch_time_s": time.time() - t_epoch})
    if tracing:  # run shorter than 2 + profile_steps: still flush the trace
        jax.profiler.stop_trace()
    writer.save(gstep, ckpt_payload())
    writer.close()  # drain pending async writes before exit


if __name__ == "__main__":
    main()
