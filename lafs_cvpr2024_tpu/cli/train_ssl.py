"""LAFS SSL pretraining CLI — TPU-native equivalent of ``lafs_train.py``.

Example:
  python -m lafs_cvpr2024_tpu.cli.train_ssl \
      --data-path /data/ms1m --landmark-path /ckpt/landmark.pth \
      --output-dir /out/ssl
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
    p = argparse.ArgumentParser("lafs-tpu SSL pretrain")
    p.add_argument("--arch", default="partfvit",
                   choices=["partfvit", "vit_tiny", "vit_small", "vit_base",
                            "overlap", "mobile_dino"],
                   help="SSL backbone (reference --arch, lafs_train.py:34-37"
                        ",198-209). 'partfvit' = the LAFS landmark-token "
                        "path; the others train on pixel crops with the "
                        "vanilla DataAugmentationDINO transform (2 global + "
                        "N local 48px crops, lafs_train.py:743-788). vit_* "
                        "dims are fixed by the arch (192/384/768); --dim "
                        "sets the embed width for overlap/mobile_dino")
    p.add_argument("--local-crop-size", type=int, default=48,
                   help="vanilla-arch local crop resolution "
                        "(lafs_train.py:775)")
    p.add_argument("--data-path", required=True, help="dir with train.rec")
    p.add_argument("--landmark-path", default=None, help="pretrained landmark CNN (.pth or orbax)")
    p.add_argument("--output-dir", required=True)
    p.add_argument("--batch-size-per-chip", type=int, default=82)
    p.add_argument("--epochs", type=int, default=41)
    p.add_argument("--warmup-epochs", type=int, default=10)
    p.add_argument("--lr", type=float, default=5e-4)
    p.add_argument("--min-lr", type=float, default=1e-6)
    p.add_argument("--weight-decay", type=float, default=0.04)
    p.add_argument("--weight-decay-end", type=float, default=0.4)
    p.add_argument("--momentum-teacher", type=float, default=0.996)
    p.add_argument("--warmup-teacher-temp", type=float, default=0.07)
    p.add_argument("--teacher-temp", type=float, default=0.04)
    p.add_argument("--warmup-teacher-temp-epochs", type=int, default=30)
    p.add_argument("--out-dim", type=int, default=100000)
    p.add_argument("--local-crops-number", type=int, default=8)
    p.add_argument("--global-crops-scale", type=float, nargs=2, default=(0.4, 1.0))
    p.add_argument("--local-crops-scale", type=float, nargs=2, default=(0.05, 0.4))
    p.add_argument("--clip-grad", type=float, default=3.0)
    p.add_argument("--freeze-last-layer", type=int, default=1,
                   help="epochs to freeze the DINO head's last layer "
                        "(cancel_gradients_last_layer, utils.py:144-149)")
    p.add_argument("--landmark-jitter-std", type=float, default=5.0,
                   help="N(0, std^2) px jitter on predicted landmarks "
                        "(ViT_face.py:1359-1362)")
    p.add_argument("--local-keep-landmarks", type=int, default=36,
                   help="landmarks kept per local crop (ran_sample, "
                        "ViT_face.py:1365-1367)")
    p.add_argument("--glo-diff", action="store_true",
                   help="differentiated global-crop landmarks: crop 1 keeps "
                        "the clean landmarks, only crop 2 gets jitter + "
                        "resample (utils.py:646, ViT_face.py:474-516); "
                        "token path (partfvit arch) only")
    p.add_argument("--random-coor", action="store_true",
                   help="uniform-random landmark coordinates instead of the "
                        "CNN's (ViT_face.py:1391-1400; the reference "
                        "hard-codes random_coor=False at "
                        "lafs_train.py:535-565); token path only")
    p.add_argument("--head-hidden-dim", type=int, default=2048,
                   help="DINO head MLP hidden width (vision_transformer.py:265)")
    p.add_argument("--head-bottleneck-dim", type=int, default=256)
    p.add_argument("--use-bn-in-head", action="store_true",
                   help="BatchNorm between the DINO head's MLP layers "
                        "(lafs_train.py:53,350); syncs over the data axis "
                        "like every other BN (lafs_train.py:362-365)")
    p.add_argument("--no-norm-last-layer", dest="norm_last_layer",
                   action="store_false", default=True,
                   help="train the weight-norm g of the head's last layer "
                        "(norm_last_layer=False, vision_transformer.py:284-287)")
    p.add_argument("--dim", type=int, default=768)
    p.add_argument("--depth", type=int, default=12)
    p.add_argument("--heads", type=int, default=11)
    p.add_argument("--dim-head", type=int, default=64)
    p.add_argument("--moment-dtype", default="bfloat16",
                   choices=["float32", "bfloat16"],
                   help="AdamW moment STORAGE dtype (update math is always "
                        "fp32); bf16 halves optimizer HBM traffic — "
                        "loss-trajectory A/B identical (docs/PERF.md)")
    p.add_argument("--teacher-dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="EMA teacher STORAGE dtype; bf16 halves the "
                        "teacher's HBM traffic and switches the storage "
                        "cast to stochastic rounding (RNE would freeze "
                        "the EMA — optim.stochastic_round)")
    p.add_argument("--mlp-dim", type=int, default=2048)
    p.add_argument("--num-patches", type=int, default=196)
    p.add_argument("--patch-size", type=int, default=8,
                   help="patch size in px (lafs_train.py:39-44): landmark "
                        "window for the token path, ViT patch for vit_*, "
                        "unfold stride for overlap")
    p.add_argument("--drop-path-rate", type=float, default=0.1,
                   help="stochastic depth rate (lafs_train.py:94)")
    p.add_argument("--image-size", type=int, default=112)
    p.add_argument("--stn-mode", default="large", choices=["large", "small"])
    p.add_argument("--random-subset", type=float, default=0.4,
                   help="'sifenzhiyi' random subset fraction (dataloader_web.py:291)")
    p.add_argument("--saveckp-freq", type=int, default=10)
    p.add_argument("--saveckp-steps", type=int, default=0,
                   help="also checkpoint every N global steps (0 = per-epoch "
                        "only); resume is EXACT mid-epoch (sampler order is "
                        "a pure function of seed+epoch)")
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--optimizer", default="adamw",
                   choices=["adamw", "sgd", "lars"],
                   help="lafs_train.py:92-93: 'adamw with ViTs'; SGD "
                        "momentum 0.9; 'lars ... with convnet and large "
                        "batches' (e.g. --arch mobile_dino). sgd/lars run "
                        "the separate-pass update tail (fused AdamW tail "
                        "and --zero1 are AdamW-only)")
    p.add_argument("--zero1", action="store_true",
                   help="ZeRO-1 optimizer-state sharding: AdamW moments "
                        "live 1/n_data per chip (psum_scatter grads, "
                        "all_gather updated student params); needs data "
                        "axis > 1")
    p.add_argument("--slices", type=int, default=None,
                   help="multi-slice topology: slice-major data axis "
                        "(auto-detected from device metadata when omitted)")
    p.add_argument("--seed", type=int, default=0)
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
                   help="run the 20-crop LAFS augmentation ON DEVICE (host "
                        "ships one uint8 image/sample; frees host CPU)")
    p.add_argument("--profile-steps", type=int, default=0,
                   help="capture a jax.profiler device trace of N steps "
                        "(starting at global step 2) into "
                        "<output-dir>/profile — view in TensorBoard/Perfetto")
    from ..utils.config import apply_toml_defaults

    return apply_toml_defaults(p, table='ssl')


def main():
    args = get_args()
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from ..data import DataPipeline, EpochSampler, FaceRecordDataset, LAFSMultiCrop
    from ..models.partfvit import PartFViTConfig
    from ..ops.schedules import cosine_scheduler, dino_lr_scaling, teacher_temp_schedule
    from ..parallel.mesh import create_multislice_mesh, is_main_process
    from ..utils.config import resolve_mlp_impl
    from ..train.checkpoint import load_landmark_variables
    from ..train.ssl import (
        SSLConfig,
        assemble_crop_batches,
        assemble_vanilla_crop_batches,
        create_landmark_provider,
        create_ssl_state,
        make_ssl_train_step,
    )
    from ..utils import JSONLLogger, MetricLogger

    from ..utils.logging import dump_config

    os.makedirs(args.output_dir, exist_ok=True)
    dump_config(os.path.join(args.output_dir, "config.txt"), args)
    mesh = create_multislice_mesh(model=1, slices=args.slices)
    n_dev = len(jax.devices())

    vanilla = args.arch != "partfvit"
    if vanilla:
        if args.landmark_path:
            raise SystemExit(f"--landmark-path has no effect for --arch "
                             f"{args.arch} (no landmark branch runs)")
        # no silently-ignored argument: each arch's geometry is fixed by
        # its factory (train/ssl._backbone) — a transformer-geometry flag
        # that cannot reach the model must fail, not train a different
        # model than requested. (--dim is documented as fixed for vit_*;
        # mobile_dino consumes dim/stn-mode only.)
        _ignored = {
            "depth": 12, "heads": 11, "dim_head": 64, "mlp_dim": 2048,
            "num_patches": 196,
        }
        if args.arch == "overlap":
            _ignored = {}  # OverlapViT consumes the full model config
        elif args.arch == "mobile_dino":  # no transformer: patch/droppath too
            _ignored["patch_size"] = 8
            _ignored["drop_path_rate"] = 0.1
        else:  # vit_*: stn-mode is meaningless too
            _ignored["stn_mode"] = "large"
        for name, default in _ignored.items():
            if getattr(args, name, default) != default:
                raise SystemExit(
                    f"--{name.replace('_', '-')} has no effect for --arch "
                    f"{args.arch} (the arch factory fixes this geometry — "
                    "train/ssl._backbone)"
                )
        if args.device_aug:
            # the vanilla recipe runs INSIDE the step too
            # (ops.augment_device.vanilla_multicrop_device): ship raw uint8
            transform = None
        else:
            from ..data.augment import DataAugmentationDINO

            transform = DataAugmentationDINO(
                global_crops_scale=tuple(args.global_crops_scale),
                local_crops_scale=tuple(args.local_crops_scale),
                local_crops_number=args.local_crops_number,
                size=args.image_size,
                local_size=args.local_crop_size,
            )
    else:
        transform = None if args.device_aug else LAFSMultiCrop(
            global_crops_scale=tuple(args.global_crops_scale),
            local_crops_scale=tuple(args.local_crops_scale),
            local_crops_number=args.local_crops_number,
            size=args.image_size,
        )
    dataset = FaceRecordDataset(
        os.path.join(args.data_path, "train.rec"),
        transform=transform,
        random_subset=args.random_subset,
        subset_cache_path=os.path.join(args.output_dir, "random_index.json"),
        seed=args.seed,
    )
    # global rows/step = per-chip batch × chips; each process's sampler
    # contributes rows/process_count (global assembly via global_batch below)
    batch = args.batch_size_per_chip * n_dev
    n_proc = jax.process_count()
    assert batch % n_proc == 0, (
        f"global batch {batch} must divide process count {n_proc}"
    )
    sampler = EpochSampler(len(dataset), batch // n_proc, seed=args.seed)
    # --device-aug ships ONE uint8 array per batch: let the producer thread
    # device_put it over the mesh so the transfer overlaps the device step
    # (host-aug emits a 20-crop python list that is assembled per step below)
    pipe = DataPipeline(
        dataset, sampler, num_workers=args.workers,
        **({"mesh": mesh, "spec": P("data")} if args.device_aug else {}),
    )

    # vit_* dims are fixed by the arch (the factory ignores cfg.model's
    # dim/depth/heads — see train/ssl._backbone); cfg.model.dim still feeds
    # the DINO head width bookkeeping, so pin it to the arch's embed dim
    _vit_dims = {"vit_tiny": 192, "vit_small": 384, "vit_base": 768}
    model_dim = _vit_dims.get(args.arch, args.dim)
    # BN archs need SyncBN on a multi-device mesh (stats must stay
    # replicated under shard_map — train/ssl raises otherwise)
    bn_axis = ("data" if (args.arch in ("overlap", "mobile_dino")
               or args.use_bn_in_head) and mesh.size > 1 else None)
    cfg = SSLConfig(
        model=PartFViTConfig(
            dim=model_dim, depth=args.depth, heads=args.heads,
            dim_head=args.dim_head, mlp_dim=args.mlp_dim,
            num_patches=args.num_patches, with_land=False, loss_type="None",
            num_classes=0, image_size=args.image_size, stn_mode=args.stn_mode,
            patch_size=args.patch_size, drop_path_rate=args.drop_path_rate,
            mlp_impl=resolve_mlp_impl(args.mlp_impl),
            attn_impl=args.attn_impl, bn_axis_name=bn_axis,
        ),
        arch=args.arch,
        local_crop_size=args.local_crop_size,
        out_dim=args.out_dim,
        head_hidden_dim=args.head_hidden_dim,
        head_bottleneck_dim=args.head_bottleneck_dim,
        use_bn_in_head=args.use_bn_in_head,
        norm_last_layer=args.norm_last_layer,
        local_crops_number=args.local_crops_number,
        local_keep_landmarks=args.local_keep_landmarks,
        landmark_jitter_std=args.landmark_jitter_std,
        glo_diff=args.glo_diff,
        random_coor=args.random_coor,
        global_crops_scale=tuple(args.global_crops_scale),
        local_crops_scale=tuple(args.local_crops_scale),
        clip_grad=args.clip_grad,
        freeze_last_layer_epochs=args.freeze_last_layer,
        fused_device_aug=args.device_aug,
        moment_dtype=jnp.bfloat16 if args.moment_dtype == "bfloat16" else jnp.float32,
        teacher_dtype=jnp.bfloat16 if args.teacher_dtype == "bfloat16" else jnp.float32,
        zero1=args.zero1,
        optimizer=args.optimizer,
        # the fused clip+AdamW+EMA tail ships AdamW math only; sgd/lars
        # take the separate-pass tail (make_ssl_train_step refuses the
        # combination, so flip it here instead of at the user)
        fused_tail=args.optimizer == "adamw",
    )
    if args.optimizer != "adamw":
        if args.zero1:
            raise SystemExit("--zero1 shards AdamW moments; drop it or use "
                             "--optimizer adamw")
        print(f"[train_ssl] --optimizer {args.optimizer}: separate-pass "
              "update tail (the fused tail is AdamW-only)", file=sys.stderr)
    if not vanilla and tuple(args.local_crops_scale) != (0.05, 0.4):
        # no silently-ignored argument: LAFS draws LOCAL crops from the
        # GLOBAL scale on every path (lafs_train.py:852-858) — the flag
        # exists for config parity with the reference parser only
        raise SystemExit(
            "--local-crops-scale has no effect in the LAFS recipe (local "
            "crops draw the GLOBAL scale, lafs_train.py:852-858); set "
            "--global-crops-scale instead"
        )

    rng = jax.random.PRNGKey(args.seed)
    state = jax.jit(lambda r: create_ssl_state(
        cfg, r, zero1_shards=mesh.shape["data"] if cfg.zero1 else 0
    ))(rng)
    landmark_vars = ({} if vanilla else
                     create_landmark_provider(cfg, jax.random.fold_in(rng, 1)))
    if args.landmark_path:
        # .pth OR any of our orbax layouts; an unloadable path RAISES — a
        # silently random landmark CNN would poison the whole recipe
        landmark_vars = load_landmark_variables(
            args.landmark_path, landmark_vars
        )

    steps_per_epoch = sampler.steps_per_epoch()
    lr_sched = cosine_scheduler(
        dino_lr_scaling(args.lr, args.batch_size_per_chip, n_dev),
        args.min_lr, args.epochs, steps_per_epoch, args.warmup_epochs,
    )
    wd_sched = cosine_scheduler(
        args.weight_decay, args.weight_decay_end, args.epochs, steps_per_epoch
    )
    mom_sched = cosine_scheduler(
        args.momentum_teacher, 1.0, args.epochs, steps_per_epoch
    )
    temp_sched = teacher_temp_schedule(
        args.warmup_teacher_temp, args.teacher_temp,
        args.warmup_teacher_temp_epochs, args.epochs,
    )

    # restore (tolerating a --zero1 layout flip), async writer (ALL ranks —
    # orbax multi-process saves need every rank), SIGTERM guard: one shared
    # wiring (train/checkpoint.py::make_training_checkpointer)
    from ..train.checkpoint import make_training_checkpointer
    from ..train.optim import adapt_moment_layout

    _cur_shards = mesh.shape["data"] if cfg.zero1 else 0
    restored, restored_step, writer, guard = make_training_checkpointer(
        os.path.join(args.output_dir, "ckpt"), state,
        # the OTHER moment layout (dense <-> ZeRO-1 flat-chunked): lets a
        # checkpoint saved with --zero1 flipped restore, then convert
        lambda: jax.eval_shape(
            lambda r: create_ssl_state(
                cfg, r,
                zero1_shards=0 if cfg.zero1 else mesh.shape["data"],
            ),
            rng,
        ),
        lambda st: st._replace(opt_state=adapt_moment_layout(
            st.opt_state, st.student, _cur_shards)),
        # permanent snapshot every saveckp_freq epochs (the reference's
        # checkpoint{epoch:04}.pth, lafs_train.py:459-463) on top of the
        # rolling latest-3 retention
        keep_period=(args.saveckp_freq * steps_per_epoch
                     if args.saveckp_freq else None),
    )
    start_epoch = 0
    start_it = 0
    if restored is not None:
        state = restored
        start_epoch = restored_step // max(steps_per_epoch, 1)
        start_it = restored_step % max(steps_per_epoch, 1)
        if start_it:
            print(f"[resume] mid-epoch: epoch {start_epoch} step {start_it}")

    from ..parallel.mesh import global_batch

    step_fn = make_ssl_train_step(cfg, mesh, donate=True)
    crop_spec = P(None, "data")
    # the unused crop slots (vanilla aug-twins / device-aug placeholders)
    # share ONE replicated dummy for the whole run — rebuilding it per step
    # is a fresh device_put every step
    run_dummy = (
        global_batch(mesh, np.zeros((1,), np.float32), P())
        if (vanilla or args.device_aug) else None
    )
    logger = MetricLogger()
    jsonl = JSONLLogger(os.path.join(args.output_dir, "log.txt"), enabled=is_main_process())

    # Deferred loss fetch (utils.logging.DeferredLossFetcher): per-step
    # float(metrics["loss"]) is a host sync that serializes device step →
    # host read → next dispatch. The NaN guard runs on the fetched values
    # (parity with lafs_train.py:585 at log granularity); nan_exit=True, so
    # EVERY flush boundary below runs on every process (same-step abort).
    from ..utils.logging import DeferredLossFetcher

    losses = DeferredLossFetcher(logger, nan_exit=True)

    tracing = False
    for epoch in range(start_epoch, args.epochs):
        t_epoch = time.time()
        skip = start_it if epoch == start_epoch else 0
        for it, (crops, _) in enumerate(
            logger.log_every(pipe.epoch(epoch, start_step=skip), 100,
                             f"Epoch [{epoch}/{args.epochs}]",
                             total=steps_per_epoch - skip)
        ):
            gstep = epoch * steps_per_epoch + skip + it
            if args.device_aug:
                # fused path: the step does the 20-crop augmentation itself
                # (measured FREE — XLA overlaps it with the step's compute);
                # the pipeline already device_put the raw uint8 batch over
                # the mesh in its producer thread
                gc = crops
                ga = lc = la = run_dummy
            elif vanilla:
                gc, lc = assemble_vanilla_crop_batches(crops)
                gc = global_batch(mesh, gc, crop_spec)
                lc = global_batch(mesh, lc, crop_spec)
                ga = la = run_dummy
            else:
                gc, ga, lc, la = assemble_crop_batches(crops)
                gc, ga, lc, la = (
                    global_batch(mesh, x, crop_spec) for x in (gc, ga, lc, la)
                )
            state, metrics = step_fn(
                state, landmark_vars, gc, ga, lc, la,
                lr=jnp.float32(lr_sched[gstep]),
                wd=jnp.float32(wd_sched[gstep]),
                momentum=jnp.float32(mom_sched[gstep]),
                teacher_temp=jnp.float32(temp_sched[epoch]),
                freeze_last=jnp.float32(
                    0.0 if epoch < cfg.freeze_last_layer_epochs else 1.0
                ),
            )
            if args.profile_steps and is_main_process():
                # anchor to the first step of THIS run (resume-safe; the
                # supervised CLI does the same via start_step + 2)
                start_gstep = start_epoch * steps_per_epoch + start_it
                if gstep == start_gstep + 2:
                    jax.profiler.start_trace(
                        os.path.join(args.output_dir, "profile")
                    )
                    tracing = True
                elif tracing and gstep >= start_gstep + 2 + args.profile_steps:
                    jax.profiler.stop_trace()
                    tracing = False
            losses.append(gstep, metrics["loss"])
            logger.update(lr=lr_sched[gstep], wd=wd_sched[gstep])
            losses.maybe_flush(it)
            if args.saveckp_steps and (gstep + 1) % args.saveckp_steps == 0:
                # flush on EVERY process (nan_exit must abort all ranks at
                # the same step); the save also runs on every process
                # (orbax multi-process saves need all ranks)
                losses.flush()
                writer.save(gstep + 1, state)
            if guard.should_exit(gstep):
                losses.flush()
                writer.save(gstep + 1, state)
                writer.close()
                if tracing:
                    jax.profiler.stop_trace()
                if is_main_process():
                    print(f"[preempt] SIGTERM: saved step {gstep + 1}; "
                          "exiting cleanly — rerun the same command to "
                          "resume exactly")
                return
        losses.flush()
        logger.synchronize_between_processes()
        writer.save((epoch + 1) * steps_per_epoch, state)
        if is_main_process():
            jsonl.write({
                "epoch": epoch,
                "train_loss": logger.meters["loss"].global_avg,
                "epoch_time_s": time.time() - t_epoch,
            })
    if tracing:  # run shorter than 2 + profile_steps: still flush the trace
        jax.profiler.stop_trace()
    writer.close()  # drain pending async writes before exit


if __name__ == "__main__":
    main()
