"""SimMIM masked-image-modeling pretraining CLI.

The reference ships SimMIM MODEL variants (``ViT_face.py:797-1202``) and
importers for their checkpoints but trains them with the external SimMIM
repo; this CLI completes the workflow natively: RecordIO (or folder) faces
→ frozen-landmark (or grid) patches → masked-token forward → L1 on masked
patches, as one jitted SPMD step (``train/simmim.py``).

Example:
  python -m lafs_cvpr2024_tpu.cli.train_simmim \
      --data-path /data/rec --output-dir out/simmim --epochs 20
"""

from __future__ import annotations

import argparse
import os
import time


def get_args(argv=None):
    p = argparse.ArgumentParser("lafs-tpu SimMIM pretraining")
    p.add_argument("--data-path", required=True, help="dir with train.rec (or an image folder)")
    p.add_argument("--landmark-path", default=None,
                   help="pretrained landmark CNN (.pth or orbax dir); "
                        "omit for grid patches")
    p.add_argument("--output-dir", required=True)
    p.add_argument("--batch-size-per-chip", type=int, default=128)
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--warmup-epochs", type=int, default=2)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--min-lr", type=float, default=1e-6)
    p.add_argument("--weight-decay", type=float, default=0.05)
    p.add_argument("--mask-ratio", type=float, default=0.6)
    p.add_argument("--grid-patches", action="store_true",
                   help="fixed-grid patchify instead of landmark gather")
    p.add_argument("--dim", type=int, default=768)
    p.add_argument("--depth", type=int, default=12)
    p.add_argument("--heads", type=int, default=11)
    p.add_argument("--dim-head", type=int, default=64)
    p.add_argument("--moment-dtype", default="bfloat16",
                   choices=["float32", "bfloat16"],
                   help="AdamW moment STORAGE dtype (update math is always "
                        "fp32); bf16 halves optimizer HBM traffic — "
                        "loss-trajectory A/B identical (docs/PERF.md)")
    p.add_argument("--zero1", action="store_true",
                   help="ZeRO-1 optimizer-state sharding: AdamW moments "
                        "live 1/n_data per chip; needs data axis > 1")
    p.add_argument("--mlp-dim", type=int, default=2048)
    p.add_argument("--num-patches", type=int, default=196)
    p.add_argument("--image-size", type=int, default=112)
    p.add_argument("--stn-mode", default="large", choices=["large", "small"])
    p.add_argument("--attn-impl", default="einsum",
                   choices=["einsum", "fused", "flash"],
                   help="attention impl; einsum is fastest at this "
                        "architecture's d_head=64 on every measured "
                        "workload (docs/PERF.md) — the pallas kernels "
                        "are for long-sequence configs")
    p.add_argument("--mlp-impl", default="auto",
                   choices=["auto", "dense", "fused", "fused_ln"])
    p.add_argument("--bgr", action="store_true")
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--slices", type=int, default=None,
                   help="multi-slice topology: slice-major data axis "
                        "(auto-detected from device metadata when omitted)")
    p.add_argument("--seed", type=int, default=0)
    from ..utils.config import apply_toml_defaults

    return apply_toml_defaults(p, argv, table="simmim")


def main(argv=None):
    args = get_args(argv)
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import PartitionSpec as P

    from ..data import DataPipeline, EpochSampler, FaceRecordDataset
    from ..data.dataset import FaceFolderDataset
    from ..models.partfvit import PartFViTConfig
    from ..ops.schedules import cosine_scheduler
    from ..parallel.mesh import create_multislice_mesh, is_main_process
    from ..train.checkpoint import load_landmark_variables
    from ..train.simmim import (
        SimMIMConfig,
        create_simmim_state,
        make_simmim_train_step,
    )
    from ..train.ssl import create_landmark_provider
    from ..utils.config import resolve_mlp_impl
    from ..utils.logging import JSONLLogger, MetricLogger, dump_config

    os.makedirs(args.output_dir, exist_ok=True)
    dump_config(os.path.join(args.output_dir, "config.txt"), args)
    mesh = create_multislice_mesh(model=1, slices=args.slices)
    n_dev = mesh.shape["data"]

    rec = os.path.join(args.data_path, "train.rec")
    if os.path.exists(rec):
        dataset = FaceRecordDataset(rec, bgr=args.bgr)
    else:
        dataset = FaceFolderDataset(args.data_path)
    batch = args.batch_size_per_chip * n_dev
    n_proc = jax.process_count()
    assert batch % n_proc == 0, (
        f"global batch {batch} must divide process count {n_proc}"
    )
    sampler = EpochSampler(
        len(dataset), batch // n_proc, seed=args.seed
    )
    pipe = DataPipeline(
        dataset, sampler, num_workers=args.workers, mesh=mesh, spec=P("data"),
    )

    cfg = SimMIMConfig(
        model=PartFViTConfig(
            dim=args.dim, depth=args.depth, heads=args.heads,
            dim_head=args.dim_head, mlp_dim=args.mlp_dim,
            num_patches=args.num_patches, image_size=args.image_size,
            stn_mode=args.stn_mode, with_land=False, loss_type="None",
            num_classes=0, simmim=True,
            mlp_impl=resolve_mlp_impl(args.mlp_impl),
            attn_impl=args.attn_impl,
        ),
        mask_ratio=args.mask_ratio,
        use_landmarks=not args.grid_patches,
        input_scale="unit",  # uint8 ships; scaling happens on device
        moment_dtype=jnp.bfloat16 if args.moment_dtype == "bfloat16" else jnp.float32,
        zero1=args.zero1,
    )

    rng = jax.random.PRNGKey(args.seed)
    state = jax.jit(lambda r: create_simmim_state(
        cfg, r, zero1_shards=mesh.shape["data"] if cfg.zero1 else 0
    ))(rng)
    land_vars = create_landmark_provider(
        _ssl_cfg_for_provider(cfg), jax.random.fold_in(rng, 1)
    )
    if args.landmark_path:
        # .pth OR any of our orbax layouts; an unloadable path RAISES — a
        # silently random landmark CNN would poison the masked-patch recipe
        land_vars = load_landmark_variables(args.landmark_path, land_vars)

    steps_per_epoch = sampler.steps_per_epoch()
    lr_sched = cosine_scheduler(
        args.lr, args.min_lr, args.epochs, steps_per_epoch, args.warmup_epochs
    )

    # restore (tolerating a --zero1 layout flip), async writer (ALL ranks —
    # orbax multi-process saves need every rank), SIGTERM guard: one shared
    # wiring (train/checkpoint.py::make_training_checkpointer)
    from ..train.checkpoint import make_training_checkpointer
    from ..train.optim import adapt_moment_layout

    _cur_shards = mesh.shape["data"] if cfg.zero1 else 0
    restored, restored_step, writer, guard = make_training_checkpointer(
        os.path.join(args.output_dir, "ckpt"), state,
        # the OTHER moment layout (dense <-> ZeRO-1 flat-chunked)
        lambda: jax.eval_shape(
            lambda r: create_simmim_state(
                cfg, r,
                zero1_shards=0 if cfg.zero1 else mesh.shape["data"],
            ),
            rng,
        ),
        lambda st: st._replace(opt_state=adapt_moment_layout(
            st.opt_state, st.params, _cur_shards)),
    )
    start_epoch = 0
    start_it = 0
    if restored is not None:
        state = restored
        start_epoch = restored_step // max(steps_per_epoch, 1)
        start_it = restored_step % max(steps_per_epoch, 1)
        if start_it:
            # EXACT mid-epoch resume (like the SSL CLI): batches are
            # skipped before decode, so a preemption save mid-epoch does
            # not rewind — checkpoint steps stay monotone (orbax skips
            # saves at steps <= the latest existing one)
            print(f"[resume] mid-epoch: epoch {start_epoch} step {start_it}")

    step_fn = make_simmim_train_step(cfg, mesh, donate=True)
    logger = MetricLogger()
    jsonl = JSONLLogger(
        os.path.join(args.output_dir, "log.txt"), enabled=is_main_process()
    )

    # Deferred loss fetch (see cli/train_ssl.py): per-step float() is a host
    # sync; buffer device scalars, fetch in one device_get at boundaries.
    # nan_exit=True ⇒ identical flush cadence on every process.
    from ..utils.logging import DeferredLossFetcher

    losses = DeferredLossFetcher(logger, nan_exit=True)

    for epoch in range(start_epoch, args.epochs):
        t0 = time.time()
        skip = start_it if epoch == start_epoch else 0
        for it, (images, _) in enumerate(
            logger.log_every(
                pipe.epoch(epoch, start_step=skip), 100,
                f"Epoch [{epoch}/{args.epochs}]",
                total=steps_per_epoch - skip,
            )
        ):
            gstep = epoch * steps_per_epoch + skip + it
            state, metrics = step_fn(
                state, land_vars, images,
                jnp.float32(lr_sched[gstep]), jnp.float32(args.weight_decay),
            )
            losses.append(gstep, metrics["loss"])
            logger.update(lr=lr_sched[gstep])
            losses.maybe_flush(it)
            if guard.should_exit(gstep):
                losses.flush()
                writer.save(gstep + 1, state)
                writer.close()
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
                "epoch_time_s": time.time() - t0,
            })
    writer.close()  # drain pending async writes before exit


def _ssl_cfg_for_provider(cfg):
    """create_landmark_provider takes an SSLConfig-shaped object; adapt."""
    from ..train.ssl import SSLConfig

    return SSLConfig(model=cfg.model)


if __name__ == "__main__":
    main()
