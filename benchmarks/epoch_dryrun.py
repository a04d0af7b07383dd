"""Real-data wall-clock dry-run: pack synthetic faces → full SSL epoch with
the host pipeline (+ C++ data plane) → supervised finetune epoch →
perform_val — on the real chip, flagship config.

Answers: does the 1-core host input pipeline sustain the device step rate?
Prints JSONL records with wall-clock vs pure-device step time and the
host-pipeline stall fraction.

Usage: python benchmarks/epoch_dryrun.py [n_images] [out_dir]
"""

import io
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
jax.config.update("jax_default_prng_impl", "rbg")

import jax.numpy as jnp
import numpy as np


def make_dataset(out_dir: str, n: int, n_ids: int, size: int = 112) -> str:
    """Pack n synthetic face-ish JPEGs (structured noise, ~real JPEG decode
    cost) into an indexed rec."""
    from PIL import Image

    from lafs_cvpr2024_tpu.data.recordio import RecBuilder

    rec = os.path.join(out_dir, "train.rec")
    idx = os.path.join(out_dir, "train.idx")
    if os.path.exists(rec):
        with open(idx) as f:
            existing = sum(1 for _ in f)
        if existing == n:
            return out_dir
        print(f"[make_dataset] cached rec has {existing} images, "
              f"requested {n} — rebuilding")
        for f_ in (rec, idx, os.path.join(out_dir, "property")):
            if os.path.exists(f_):
                os.remove(f_)
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    b = RecBuilder(out_dir, image_size=(size, size))
    per = n // n_ids
    base = rng.integers(0, 255, (n_ids, size, size, 3), np.uint8)
    for ident in range(n_ids):
        for _ in range(per):
            noise = rng.integers(-30, 30, (size, size, 3), np.int16)
            img = np.clip(base[ident].astype(np.int16) + noise, 0, 255).astype(np.uint8)
            buf = io.BytesIO()
            Image.fromarray(img).save(buf, format="JPEG", quality=95)
            b.add_image(buf.getvalue(), float(ident))
    b.close()
    return out_dir


def ssl_epoch(data_dir: str, n_workers: int = 4):
    from lafs_cvpr2024_tpu.data import DataPipeline, EpochSampler, FaceRecordDataset
    from lafs_cvpr2024_tpu.models.partfvit import PartFViTConfig
    from lafs_cvpr2024_tpu.train.ssl import (
        SSLConfig,
        create_landmark_provider,
        create_ssl_state,
        make_ssl_train_step,
    )
    from jax.sharding import Mesh

    n_dev = len(jax.devices())
    mesh = Mesh(np.array(jax.devices()).reshape(n_dev, 1), ("data", "model"))
    cfg = SSLConfig(
        model=PartFViTConfig(
            dim=768, depth=12, heads=11, dim_head=64, mlp_dim=2048,
            num_patches=196, with_land=False, loss_type="None", num_classes=0,
            mlp_impl="fused_ln",
        ),
        out_dim=100000, local_crops_number=8,
        landmark_dtype=jnp.bfloat16, head_dtype=jnp.bfloat16,
        fused_device_aug=True,  # host ships ONE uint8 image per sample
    )
    dataset = FaceRecordDataset(os.path.join(data_dir, "train.rec"))
    batch = 32 * n_dev
    sampler = EpochSampler(len(dataset), batch, seed=0)
    from jax.sharding import PartitionSpec as P

    # producer-thread device_put (mesh=) overlaps the uint8 transfer
    pipe = DataPipeline(dataset, sampler, num_workers=n_workers,
                        mesh=mesh, spec=P("data"))

    state = jax.jit(lambda r: create_ssl_state(cfg, r))(jax.random.PRNGKey(0))
    land = create_landmark_provider(cfg, jax.random.PRNGKey(1))
    step = make_ssl_train_step(cfg, mesh, donate=True)
    dummy = jnp.zeros((1,), jnp.float32)
    args = dict(lr=jnp.float32(5e-4), wd=jnp.float32(0.04),
                momentum=jnp.float32(0.996), teacher_temp=jnp.float32(0.04),
                freeze_last=jnp.float32(1.0))

    # compile with the first batch; fused aug consumes the RAW uint8 batch
    it = pipe.epoch(0)
    imgs, _ = next(it)
    t_c = time.time()
    state, m = step(state, land, jnp.asarray(imgs), dummy, dummy, dummy, **args)
    loss = float(m["loss"])
    compile_s = time.time() - t_c

    # host wait measured at the ITERATOR (where the pipeline actually
    # stalls — the producer thread device_puts, so jnp.asarray is a no-op)
    steps, host_wait = 1, 0.0
    t0 = time.time()
    last = None
    while True:
        t_w = time.perf_counter()
        nxt = next(it, None)
        host_wait += time.perf_counter() - t_w
        if nxt is None:
            break
        gc = jnp.asarray(nxt[0])
        last = gc
        state, m = step(state, land, gc, dummy, dummy, dummy, **args)
        steps += 1
    loss = float(m["loss"])
    wall = time.time() - t0
    per_step = wall / max(steps - 1, 1)

    # MEASURED device-only baseline: 10 chained steps on the last
    # (device-resident) batch — same program, no host pipeline, no upload
    for _ in range(2):
        state, m = step(state, land, last, dummy, dummy, dummy, **args)
    float(m["loss"])
    t_d = time.perf_counter()
    for _ in range(10):
        state, m = step(state, land, last, dummy, dummy, dummy, **args)
    float(m["loss"])
    device_only = (time.perf_counter() - t_d) / 10

    print(json.dumps({
        "phase": "ssl_epoch", "steps": steps, "imgs": steps * batch,
        "wall_s": round(wall, 2), "ms_per_step": round(per_step * 1e3, 1),
        "imgs_per_sec": round(batch / per_step, 1),
        "device_only_ms": round(device_only * 1e3, 1),
        "host_wait_ms_per_step": round(host_wait / max(steps - 1, 1) * 1e3, 1),
        "transfer_dispatch_ms_per_step": round(
            max(per_step - device_only, 0.0) * 1e3
            - host_wait / max(steps - 1, 1) * 1e3, 1),
        "compile_s": round(compile_s, 1), "loss": round(loss, 3),
    }))


def finetune_and_val(data_dir: str, n_workers: int = 4, device_aug: bool = False):
    from lafs_cvpr2024_tpu.data import DataPipeline, EpochSampler, FaceRecordDataset, SupervisedAugment, read_property
    from lafs_cvpr2024_tpu.eval.verification import perform_val
    from lafs_cvpr2024_tpu.models.partfvit import PartFViTConfig
    from lafs_cvpr2024_tpu.ops.mixup import MixupConfig
    from lafs_cvpr2024_tpu.train.supervised import (
        SupervisedConfig, create_classifier, create_state, make_embed_fn,
        make_train_step,
    )
    from jax.sharding import Mesh

    n_dev = len(jax.devices())
    mesh = Mesh(np.array(jax.devices()).reshape(n_dev, 1), ("data", "model"))
    num_classes, _, _ = read_property(data_dir)
    cfg = SupervisedConfig(
        model=PartFViTConfig(
            dim=768, depth=12, heads=11, dim_head=64, mlp_dim=2048,
            num_patches=196, num_classes=num_classes, with_land=True,
            loss_type="CosFace", mlp_impl="fused_ln",
        ),
        acc_step=3,
        mixup=MixupConfig(mixup_alpha=0.2, prob=0.1, num_classes=num_classes),
        fused_device_aug=device_aug,
        input_scale=None if device_aug else "unit",
    )
    dataset = FaceRecordDataset(
        os.path.join(data_dir, "train.rec"),
        transform=None if device_aug else SupervisedAugment(
            config_str="rand-m1-mstd0.5-inc1", size=112
        ),
    )
    batch = 64  # per microbatch; 3 microbatches/step
    sampler = EpochSampler(len(dataset), batch * cfg.acc_step, seed=0)
    # mirror the real CLI: uint8 ships (scaling happens on device) and the
    # producer thread device_puts via the mesh, overlapping the host→device
    # transfer with the previous step's compute
    from jax.sharding import PartitionSpec as P

    pipe = DataPipeline(
        dataset, sampler, num_workers=n_workers, mesh=mesh, spec=P("data"),
    )
    state = jax.jit(lambda r: create_state(cfg, r))(jax.random.PRNGKey(0))
    w, wopt = create_classifier(cfg, jax.random.PRNGKey(1))
    step = make_train_step(cfg, mesh, donate=True)

    it = pipe.epoch(0)
    imgs, labels = next(it)
    t_c = time.time()
    state, w, wopt, m = step(state, w, wopt, jnp.asarray(imgs),
                             jnp.asarray(labels, jnp.int32), 1e-4)
    loss = float(m["loss"])
    compile_s = time.time() - t_c
    steps = 1
    t0 = time.time()
    for imgs, labels in it:
        state, w, wopt, m = step(state, w, wopt, jnp.asarray(imgs),
                                 jnp.asarray(labels, jnp.int32), 1e-4)
        steps += 1
    loss = float(m["loss"])
    wall = time.time() - t0
    per_step = wall / max(steps - 1, 1)
    print(json.dumps({
        "phase": "finetune_epoch", "device_aug": device_aug, "steps": steps,
        "imgs": steps * batch * cfg.acc_step,
        "wall_s": round(wall, 2), "ms_per_step": round(per_step * 1e3, 1),
        "imgs_per_sec": round(batch * cfg.acc_step / per_step, 1),
        "compile_s": round(compile_s, 1), "loss": round(loss, 3),
    }))

    # perform_val on synthetic pairs (uses the trained weights)
    rng = np.random.default_rng(0)
    n_pairs = 128
    data = rng.integers(0, 255, (2, n_pairs * 2, 112, 112, 3)).astype(np.uint8)
    issame = np.asarray([i % 2 == 0 for i in range(n_pairs)])
    embed = make_embed_fn(cfg, mesh, input_scale="half")
    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    # warm the embed compile so the sweep time is steady-state
    np.asarray(embed(variables, jnp.zeros((256, 112, 112, 3), jnp.uint8)))
    t0 = time.time()
    res = perform_val(lambda b: embed(variables, jnp.asarray(b)), data, issame,
                      batch_size=256, device_scale=True)
    wall = time.time() - t0
    print(json.dumps({
        "phase": "perform_val", "faces": int(data.shape[1] * 2),
        "wall_s": round(wall, 2),
        "faces_per_sec": round(data.shape[1] * 2 / wall, 1),
        "accuracy": round(res.accuracy, 4),
    }))


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/lafs_dryrun_data"
    make_dataset(out, n, n_ids=64)
    which = sys.argv[3] if len(sys.argv) > 3 else "all"
    if which in ("all", "ssl"):
        ssl_epoch(out)
    if which in ("all", "finetune"):
        finetune_and_val(out)
    if which == "finetune-devaug":
        finetune_and_val(out, device_aug=True)
