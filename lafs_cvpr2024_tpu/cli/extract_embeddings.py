"""Batch embedding extraction — folder or RecordIO → ``embeddings.npy``.

A production utility the reference only ships embedded inside its IJB
script (``IJB_evaluation.py:408-495``): load a checkpoint, sweep a
directory of face crops (or a packed ``train.rec``) through the jitted
embedding function — optionally flip-fused and L2-normalized, sharded over
every local device — and write ``embeddings.npy`` + ``names.json``.

Example:
  python -m lafs_cvpr2024_tpu.cli.extract_embeddings \
      --checkpoint ckpt.pth --input /data/crops --output out/
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def get_args(argv=None):
    p = argparse.ArgumentParser("lafs-tpu embedding extraction")
    p.add_argument("--checkpoint", required=True, help=".pth or orbax dir")
    p.add_argument("--input", required=True,
                   help="image folder (recursive) or dir with train.rec")
    p.add_argument("--output", required=True, help="output directory")
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--prefetch", type=int, default=2,
                   help="decode-ahead depth: host decode of the next "
                        "batches overlaps the device embed (0 = serial)")
    p.add_argument("--eval-dtype", default="bfloat16",
                   choices=["float32", "bfloat16"],
                   help="forward compute dtype; bf16 ≈ 2x MXU throughput "
                        "(embeddings agree with fp32 to cosine >~ 1-1e-3); "
                        "the documented 1,328 faces/s IJB ceiling is bf16")
    p.add_argument("--no-flip", dest="flip", action="store_false",
                   default=True, help="disable flip-test fusion")
    p.add_argument("--no-normalize", dest="normalize", action="store_false",
                   default=True, help="skip final L2 normalization")
    p.add_argument("--bgr", action="store_true",
                   help="packed recs keep BGR order (ms1m-style)")
    p.add_argument("--workers", type=int, default=8)
    from ..eval.loading import add_arch_flags, add_input_scale_flag

    add_arch_flags(p)
    add_input_scale_flag(p)
    return p.parse_args(argv)


def _iter_batches(args):
    """Yield (names, uint8 (B, S, S, 3)) batches from a folder or a .rec."""
    from concurrent.futures import ThreadPoolExecutor

    from PIL import Image

    size = args.image_size
    rec = os.path.join(args.input, "train.rec")
    if os.path.exists(rec):
        from ..data import FaceRecordDataset

        ds = FaceRecordDataset(rec, bgr=args.bgr)
        for start in range(0, len(ds), args.batch_size):
            idxs = range(start, min(start + args.batch_size, len(ds)))
            imgs = np.stack([np.asarray(ds[i][0], np.uint8) for i in idxs])
            yield [str(i) for i in idxs], imgs
        return

    exts = (".jpg", ".jpeg", ".png", ".bmp")
    files = sorted(
        os.path.join(r, f)
        for r, _, fs in os.walk(args.input)
        for f in fs
        if f.lower().endswith(exts)
    )
    if not files:
        raise FileNotFoundError(f"no images or train.rec under {args.input}")

    def load(path):
        img = Image.open(path).convert("RGB")
        if img.size != (size, size):
            img = img.resize((size, size), Image.BILINEAR)
        return np.asarray(img, np.uint8)

    with ThreadPoolExecutor(args.workers) as pool:
        for start in range(0, len(files), args.batch_size):
            chunk = files[start:start + args.batch_size]
            imgs = np.stack(list(pool.map(load, chunk)))
            rel = [os.path.relpath(f, args.input) for f in chunk]
            yield rel, imgs


def main(argv=None):
    args = get_args(argv)
    import jax
    import jax.numpy as jnp

    from ..eval.loading import (
        arch_overrides_from_args,
        load_eval_model,
        resolve_input_scale,
    )
    from ..parallel.mesh import create_mesh, sharded_batch_apply

    loaded = load_eval_model(args.checkpoint, arch_overrides_from_args(args))
    args.input_scale = resolve_input_scale(args.input_scale, loaded.family)
    model, variables = loaded.model, loaded.variables

    cdtype = jnp.bfloat16 if args.eval_dtype == "bfloat16" else jnp.float32

    from ..ops.augment_device import scale_uint8

    @jax.jit
    def _embed(v, batch):
        v = jax.tree_util.tree_map(
            lambda q: q.astype(cdtype)
            if jnp.issubdtype(q.dtype, jnp.floating) else q, v)
        x = scale_uint8(batch, args.input_scale).astype(cdtype)
        return model.apply(v, x, train=False).astype(jnp.float32)

    mesh = create_mesh(model=1)
    embed = sharded_batch_apply(_embed, mesh) if mesh.size > 1 else _embed

    os.makedirs(args.output, exist_ok=True)
    from ..data.pipeline import prefetch_iter

    all_names, chunks = [], []
    # host decode of batch i+1 overlaps the device embed of batch i
    for names, imgs in prefetch_iter(_iter_batches(args),
                                     depth=args.prefetch):
        batch = jnp.asarray(imgs)
        if args.flip:
            batch = jnp.concatenate([batch, batch[:, :, ::-1]], axis=0)
        emb = np.asarray(embed(variables, batch), np.float32)
        if args.flip:
            emb = emb[: len(names)] + emb[len(names):]  # flip fusion (add)
        if args.normalize:
            emb = emb / np.maximum(
                np.linalg.norm(emb, axis=1, keepdims=True), 1e-12
            )
        all_names.extend(names)
        chunks.append(emb)

    out = np.concatenate(chunks)
    np.save(os.path.join(args.output, "embeddings.npy"), out)
    with open(os.path.join(args.output, "names.json"), "w") as f:
        json.dump(all_names, f)
    print(f"wrote {out.shape} embeddings to {args.output}")


if __name__ == "__main__":
    main()
