"""Offline attention-map / landmark visualization CLI.

The reference's visualization suite (attention rollout ×4 styles,
``util/utils.py:730-988``; landmark/patch overlays, ``:1141-1251``) can only
run from inside its eval loop with hand-edited paths. This CLI drives the
same renderers standalone, from any checkpoint (torch ``.pth`` or any of our
orbax layouts — architecture inferred from the tree) and any image folder:

  python -m lafs_cvpr2024_tpu.cli.visualize \\
      --checkpoint ckpt.pth --images faces/ --out viz/

Per input image it emits (into ``--out``):

  * ``rollout_<i>.png``   — CLS-attention rollout heatmap over the face;
    landmark models get the landmark-splatted variant (each token's
    attention accumulated AT its predicted landmark — the Part-fViT view,
    ``visualize_attentionmap_DINO_landmark``), grid models the regular-grid
    overlay.
  * ``perhead_<i>.png``   — one panel per head, CLS attention of ``--layer``
    (default: last), the DINO-style view.
  * ``landmarks_<i>.png`` — predicted landmark overlay (landmark/standcoord
    models only).
  * ``patches_<i>.png``   — the gathered 8×8 patch mosaic (landmark/
    standcoord models only).

Attention probabilities are captured via the flax ``intermediates``
collection (``Attention.sow`` — the TPU-native analogue of the reference
storing ``attention_score`` per layer, ``ViT_face.py:177``); capture
requires the default ``attn_impl='einsum'`` eval path, which
``load_eval_model`` always builds.
"""

from __future__ import annotations

import argparse
import os

_EXTS = (".jpg", ".jpeg", ".png", ".bmp", ".webp")


def get_args(argv=None):
    p = argparse.ArgumentParser("lafs-tpu attention/landmark visualization")
    p.add_argument("--checkpoint", required=True, help=".pth or orbax dir")
    p.add_argument("--images", nargs="+", required=True,
                   help="image files and/or directories of images")
    p.add_argument("--out", required=True, help="output directory for PNGs")
    p.add_argument("--num", type=int, default=8,
                   help="max number of images to render")
    p.add_argument("--bgr", action="store_true",
                   help="model expects BGR channel order (ms1m-style "
                        "checkpoints, image_iter.py:320-321)")
    p.add_argument("--head-fusion", default="mean",
                   choices=["mean", "max", "min"],
                   help="head fusion for the rollout (utils.py:730-988)")
    p.add_argument("--discard-ratio", type=float, default=0.0,
                   help="drop this fraction of lowest attentions per layer "
                        "before the rollout")
    p.add_argument("--layer", type=int, default=-1,
                   help="layer index for the per-head maps (default last)")
    p.add_argument("--styles", nargs="+",
                   default=["rollout", "perhead", "landmarks", "patches"],
                   choices=["rollout", "perhead", "landmarks", "patches"])
    from ..eval.loading import add_arch_flags, add_input_scale_flag

    add_arch_flags(p)
    add_input_scale_flag(p)
    return p.parse_args(argv)


def _collect_images(specs, limit):
    paths = []
    for spec in specs:
        if os.path.isdir(spec):
            paths.extend(
                os.path.join(spec, f)
                for f in sorted(os.listdir(spec))
                if f.lower().endswith(_EXTS)
            )
        else:
            paths.append(spec)
    if not paths:
        raise FileNotFoundError(f"no images found under {specs}")
    return paths[:limit]


def main(argv=None):
    args = get_args(argv)
    import jax
    import numpy as np
    from PIL import Image

    from ..eval.loading import (
        arch_overrides_from_args,
        load_eval_model,
        resolve_input_scale,
    )
    from ..ops.augment_device import scale_uint8, unscale_to_uint8
    from ..ops.patch_gather import patch_gather
    from ..utils.visualize import (
        attention_heatmap,
        attention_heatmap_landmark,
        attention_rollout,
        per_head_cls_attention,
        plot_landmarks,
        save_head_grid,
        save_patch_grid,
    )

    loaded = load_eval_model(args.checkpoint, arch_overrides_from_args(args))
    args.input_scale = resolve_input_scale(args.input_scale, loaded.family)
    model, variables, cfg = loaded.model, loaded.variables, loaded.cfg

    if loaded.family in ("mobile_dino", "iresnet"):
        raise SystemExit(
            f"error: {loaded.family} checkpoints have no transformer — "
            "there is no attention to visualize (the reference's maps are "
            "all attention-based, util/utils.py:730-988)"
        )
    depth = getattr(cfg, "depth", None)
    if not (-depth <= args.layer < depth):
        raise SystemExit(
            f"error: --layer {args.layer} is out of range for this "
            f"checkpoint: depth={depth} (valid: "
            f"{-depth}..{depth - 1})"
        )

    paths = _collect_images(args.images, args.num)
    size = loaded.input_size
    imgs = []
    for pth in paths:
        im = Image.open(pth).convert("RGB").resize((size, size))
        imgs.append(np.asarray(im, np.uint8))
    uint8 = np.stack(imgs)  # display copy, always RGB
    batch = uint8[..., ::-1] if args.bgr else uint8

    @jax.jit
    def forward(v, x8):
        x = scale_uint8(x8, args.input_scale)
        theta = None
        if loaded.family == "partfvit":
            (emb, _, theta), inter = model.apply(
                v, x, train=False, return_tokens=True,
                mutable=["intermediates"],
            )
        else:  # overlap / dino_vit: plain embedding forward, no landmarks
            _, inter = model.apply(
                v, x, train=False, mutable=["intermediates"]
            )
        patches = None
        if theta is not None:
            tok = patch_gather(x, theta, cfg.patch_size, impl=cfg.gather_impl)
            b, n = tok.shape[:2]
            p = cfg.patch_size
            # tokens flatten (x_off, y_off, c); display wants (y, x, c)
            patches = tok.reshape(b, n, p, p, -1).transpose(0, 1, 3, 2, 4)
        return theta, patches, inter["intermediates"]

    theta, patches, inter = forward(variables, batch)
    if loaded.family == "dino_vit":
        # VisionTransformer scopes: block_<i>/attn/attn_probs
        attns = [
            np.asarray(inter[f"block_{i}"]["attn"]["attn_probs"][0],
                       np.float32)
            for i in range(depth)
        ]
    else:
        layers = inter["transformer"]
        attns = [
            np.asarray(layers[f"layers_{i}"]["attn"]["attn_probs"][0],
                       np.float32)
            for i in range(depth)
        ]
    theta = None if theta is None else np.asarray(theta)
    patches = None if patches is None else np.asarray(patches)

    os.makedirs(args.out, exist_ok=True)
    roll = attention_rollout(
        attns, head_fusion=args.head_fusion, discard_ratio=args.discard_ratio
    )
    layer_attn = attns[args.layer]
    written = []
    has_land = theta is not None
    for i in range(len(paths)):
        img = uint8[i]
        if "rollout" in args.styles:
            dst = os.path.join(args.out, f"rollout_{i}.png")
            if has_land:
                attention_heatmap_landmark(
                    img, roll[i], theta[i], patch_size=cfg.patch_size,
                    save_path=dst, denorm=False,
                )
            else:
                attention_heatmap(img, roll[i], save_path=dst, denorm=False)
            written.append(dst)
        if "perhead" in args.styles:
            maps = per_head_cls_attention(layer_attn[i], out_size=size)
            dst = os.path.join(args.out, f"perhead_{i}.png")
            save_head_grid(maps, dst, image=img)
            written.append(dst)
        if "landmarks" in args.styles and has_land:
            dst = os.path.join(args.out, f"landmarks_{i}.png")
            plot_landmarks(img, theta[i], save_path=dst, denorm=False)
            written.append(dst)
        if "patches" in args.styles and has_land:
            dst = os.path.join(args.out, f"patches_{i}.png")
            # undo whichever input convention fed the gather
            p8 = unscale_to_uint8(patches[i], args.input_scale)
            save_patch_grid(p8, dst, denorm=False)
            written.append(dst)
        print(f"[viz] {paths[i]} -> {args.out}/*_{i}.png")
    if not has_land and (
        "landmarks" in args.styles or "patches" in args.styles
    ):
        print("[viz] note: no landmark branch in this checkpoint — "
              "landmark/patch overlays skipped")
    print(f"[viz] wrote {len(written)} files to {args.out}")
    return written


if __name__ == "__main__":
    main()
