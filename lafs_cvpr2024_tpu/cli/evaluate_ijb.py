"""IJB-B / IJB-C offline evaluation CLI — equivalent of ``IJB_evaluation.py``.

Pipeline: loose-crop images + 5-pt landmarks → Umeyama align to 112×112 →
jitted batched [orig|flip] embedding sweep on TPU → flip fusion →
media/template aggregation → 100k-pair cosine scoring → TPR@FPR table.

Example:
  python -m lafs_cvpr2024_tpu.cli.evaluate_ijb \
      --model-checkpoint ckpt.pth --image-path /data/IJBC/loose_crop \
      --meta-path /data/IJBC/meta --target IJBC
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def get_args(argv=None):
    p = argparse.ArgumentParser("lafs-tpu IJB evaluation")
    p.add_argument("--model-checkpoint", required=True, help=".pth or orbax dir")
    p.add_argument("--image-path", required=True, help="loose_crop dir")
    p.add_argument("--meta-path", required=True)
    p.add_argument("--target", default="IJBC", choices=["IJBB", "IJBC"])
    p.add_argument("--batch-size", type=int, default=512)
    p.add_argument("--prefetch", type=int, default=2,
                   help="decode-ahead depth: host decode+align of the next "
                        "batches overlaps the device embed (0 = serial)")
    p.add_argument("--eval-dtype", default="bfloat16",
                   choices=["float32", "bfloat16"],
                   help="forward compute dtype; bf16 ≈ 2x MXU throughput "
                        "(embeddings agree with fp32 to cosine >~ 1-1e-3); "
                        "the documented 1,328 faces/s IJB ceiling is bf16")
    p.add_argument("--no-norm-score", dest="use_norm_score", action="store_false")
    p.add_argument("--no-detector-score", dest="use_detector_score", action="store_false")
    p.add_argument("--no-flip-test", dest="use_flip_test", action="store_false")
    p.add_argument("--workers", type=int, default=16)
    p.add_argument("--no-native", action="store_true",
                   help="skip the fused C++ decode+align batch path and "
                        "use the PIL + numpy warp per face")
    from ..eval.loading import add_arch_flags, add_input_scale_flag

    add_arch_flags(p)
    add_input_scale_flag(p)
    return p.parse_args(argv)


def load_image_list(meta_path: str, target: str):
    """Parse ``<target>_name_5pts_score.txt``: path + 5 landmarks + faceness
    (reference ``IJB_evaluation.py:408-440``)."""
    path = os.path.join(meta_path, f"{target.lower()}_name_5pts_score.txt")
    names, landmarks, scores = [], [], []
    with open(path) as f:
        for line in f:
            parts = line.strip().split(" ")
            names.append(parts[0])
            landmarks.append(np.array(parts[1:11], np.float32).reshape(5, 2))
            scores.append(float(parts[11]))
    return names, np.stack(landmarks), np.asarray(scores, np.float32)


def main(argv=None):
    args = get_args(argv)
    from concurrent.futures import ThreadPoolExecutor

    from PIL import Image

    from ..eval.ijb import (
        IJBConfig,
        norm_crop,
        read_template_media_list,
        read_template_pair_list,
        run_ijb_protocol,
    )
    from ..eval.loading import (
        arch_overrides_from_args,
        load_eval_model,
        resolve_input_scale,
    )

    target = args.target
    loaded = load_eval_model(
        args.model_checkpoint, arch_overrides_from_args(args)
    )
    args.input_scale = resolve_input_scale(args.input_scale, loaded.family)
    model, variables = loaded.model, loaded.variables

    cdtype = jnp.bfloat16 if args.eval_dtype == "bfloat16" else jnp.float32

    from ..ops.augment_device import scale_uint8

    @jax.jit
    def _embed(v, batch):
        # default convention: x/255 - 0.5 (IJB_evaluation.py:235)
        # params are an argument, not a closure constant (closure constants
        # get baked into the HLO and can exceed remote-compile size limits)
        v = jax.tree_util.tree_map(
            lambda q: q.astype(cdtype)
            if jnp.issubdtype(q.dtype, jnp.floating) else q, v)
        x = scale_uint8(batch, args.input_scale).astype(cdtype)
        return model.apply(v, x, train=False).astype(jnp.float32)

    # scale the extraction sweep over all local devices (data-axis sharding)
    from ..parallel.mesh import create_mesh, sharded_batch_apply

    mesh = create_mesh(model=1)
    _embed_sharded = sharded_batch_apply(_embed, mesh)

    def embed(batch):
        return _embed_sharded(variables, batch)

    templates, medias = read_template_media_list(
        os.path.join(args.meta_path, f"{target.lower()}_face_tid_mid.txt")
    )
    p1, p2, labels = read_template_pair_list(
        os.path.join(args.meta_path, f"{target.lower()}_template_pair_label.txt")
    )
    names, landmarks, faceness = load_image_list(args.meta_path, target)

    t0 = time.time()
    dim = loaded.cfg.dim
    feats = np.zeros((len(names), 2 * dim), np.float32)

    def load_and_align(i):
        img = np.asarray(
            Image.open(os.path.join(args.image_path, names[i])).convert("RGB")
        )
        aligned = norm_crop(img, landmarks[i]).astype(np.float32)
        return aligned

    # fused native decode+align when the C++ plane is available: raw JPEG
    # bytes + Umeyama matrices go down, the aligned uint8 batch comes back —
    # full-resolution pixels never cross into Python (data/native.py)
    from ..data.native import decode_warp_batch, native_available
    from ..eval.ijb import ARCFACE_SRC, umeyama

    use_native = native_available() and not args.no_native

    def read_bytes(i):
        with open(os.path.join(args.image_path, names[i]), "rb") as f:
            return f.read()

    def load_batch(pool, idx):
        if not use_native:
            return np.stack(list(pool.map(load_and_align, idx)))
        jpegs = list(pool.map(read_bytes, idx))  # IO in threads
        mats = np.stack(
            [umeyama(landmarks[i].astype(np.float32), ARCFACE_SRC)[:2]
             for i in idx]
        )
        try:
            return decode_warp_batch(
                jpegs, mats, threads=args.workers
            ).astype(np.float32)
        except RuntimeError as e:
            # libjpeg rejects formats PIL tolerates (CMYK JPEGs, PNGs with
            # a .jpg name — common in web-collected face sets); one bad
            # image must not abort a ~470k-face sweep
            print(f"[ijb] native decode failed for batch at {idx[0]} "
                  f"({e}) — PIL fallback for this batch")
            return np.stack(list(pool.map(load_and_align, idx)))

    from ..data.pipeline import prefetch_iter

    with ThreadPoolExecutor(args.workers) as pool:
        bs = args.batch_size

        def batches():
            for start in range(0, len(names), bs):
                idx = range(start, min(start + bs, len(names)))
                yield start, load_batch(pool, idx)

        # host decode+align of batch i+1 overlaps the device embed of
        # batch i (the sweep is otherwise serial: host + device instead
        # of max(host, device) — on a multi-core host the sweep becomes
        # device-bound at the documented 1,328 faces/s)
        for start, batch in prefetch_iter(batches(), depth=args.prefetch):
            both = np.concatenate([batch, batch[:, :, ::-1]], axis=0)
            emb = np.asarray(embed(jnp.asarray(both)))
            n = len(batch)
            feats[start : start + n, :dim] = emb[:n]
            feats[start : start + n, dim:] = emb[n:]
            if start % (bs * 20) == 0:
                print(f"embedded {start}/{len(names)} "
                      f"({(start + n) / (time.time() - t0):.0f} faces/s)")
    print(f"feature extraction: {time.time() - t0:.1f}s")

    table = run_ijb_protocol(
        feats, templates, medias, p1, p2, labels,
        faceness_scores=faceness,
        cfg=IJBConfig(
            use_norm_score=args.use_norm_score,
            use_detector_score=args.use_detector_score,
            use_flip_test=args.use_flip_test,
        ),
    )
    print(f"\n{target} 1:1 verification TPR@FPR:")
    for fpr_t, tpr in sorted(table.items()):
        print(f"  FPR={fpr_t:.0e}: TPR={tpr * 100:.2f}%")
    return table


if __name__ == "__main__":
    main()
