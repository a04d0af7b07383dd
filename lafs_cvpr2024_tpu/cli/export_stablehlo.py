"""Export a checkpoint's embedding function as portable StableHLO.

The TPU-native analogue of the reference's ONNX export helper
(``IJB_evaluation.py:594-616``): any checkpoint the eval CLIs can load
(family-aware — PartFViT variants, vanilla vit_*, overlap, mobile_dino,
iResNet; ``.pth`` or any orbax layout) serializes to a single artifact
loadable from any JAX/XLA runtime (``utils.export.load_exported``), or
convertible to a TF SavedModel via jax2tf where TF is available.

By default the exported graph takes ALREADY-SCALED float images, like the
reference's ONNX export takes the model's raw input. ``--bake-input-scale``
bakes the checkpoint's uint8→float convention (``--input-scale``, 'auto' =
by family) into the graph instead — one serving artifact, uint8 in.

Every export is self-checked: the blob is deserialized and its output
compared against the live model before the CLI reports success.

Example:
  python -m lafs_cvpr2024_tpu.cli.export_stablehlo \
      --checkpoint out/ft/ckpt --out backbone.stablehlo --batch-size 8
"""

from __future__ import annotations

import argparse


def get_args(argv=None):
    p = argparse.ArgumentParser("lafs-tpu StableHLO export")
    p.add_argument("--checkpoint", required=True,
                   help="orbax checkpoint dir (any layout) or a .pth file")
    p.add_argument("--out", required=True, help="output blob path")
    p.add_argument("--batch-size", type=int, default=1,
                   help="static batch dimension of the exported graph")
    p.add_argument("--bake-input-scale", action="store_true",
                   help="exported graph takes RAW uint8 images and applies "
                        "the --input-scale convention inside (default: "
                        "already-scaled float input, like the reference's "
                        "ONNX export)")
    from ..eval.loading import add_arch_flags, add_input_scale_flag

    add_arch_flags(p)
    add_input_scale_flag(p)
    return p.parse_args(argv)


def main(argv=None):
    args = get_args(argv)
    import jax.numpy as jnp
    import numpy as np

    from ..eval.loading import (
        arch_overrides_from_args,
        load_eval_model,
        resolve_input_scale,
    )
    from ..ops.augment_device import scale_uint8
    from ..utils.export import export_embedding_fn, load_exported

    loaded = load_eval_model(args.checkpoint, arch_overrides_from_args(args))
    scale = resolve_input_scale(args.input_scale, loaded.family)
    model = loaded.model
    size = loaded.input_size

    if args.bake_input_scale:
        def apply_fn(v, x8):
            return model.apply(v, scale_uint8(x8, scale), train=False)
        in_dtype = jnp.uint8
    else:
        def apply_fn(v, x):
            return model.apply(v, x, train=False)
        in_dtype = jnp.float32

    shape = (args.batch_size, size, size, 3)
    blob = export_embedding_fn(
        apply_fn, loaded.variables, input_shape=shape, path=args.out,
        input_dtype=in_dtype,
    )

    # self-check: the serialized graph reproduces the live model
    rng = np.random.default_rng(0)
    if args.bake_input_scale:
        x = rng.integers(0, 256, shape, np.uint8)
    else:
        x = rng.uniform(-1, 1, shape).astype(np.float32)
    got = np.asarray(load_exported(args.out)(x))
    want = np.asarray(apply_fn(loaded.variables, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
    print(f"exported {loaded.family} embedding fn "
          f"({shape}, {'uint8' if args.bake_input_scale else 'float32'} in, "
          f"{want.shape[-1]}-d out, {len(blob)} bytes) -> {args.out} "
          "[self-check OK]")
    return args.out


if __name__ == "__main__":
    main()
