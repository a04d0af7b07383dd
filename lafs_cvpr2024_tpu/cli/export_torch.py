"""Export a framework checkpoint back to a reference torch state_dict.

Reverse interop: the importers (``train/checkpoint.py``) bring the
reference's PyTorch checkpoints into this framework; this CLI goes the
other way — any of our orbax layouts (train-CLI payloads, bare train
states, raw variables) or an already-torch ``.pth`` becomes a
``state_dict`` the reference classes (``ViT_face_landmark_patch8``,
``face_pre_pro/ViT_face.py:560-795``) load with ``strict=True``. Use it to
cross-check a TPU-trained model with the reference's own tooling
(``IJB_evaluation.py`` builds its model from exactly this dialect,
``IJB_evaluation.py:77-141``) or to hand checkpoints to torch users.

SSL checkpoints export the TEACHER backbone (the reference's convention:
the teacher is the model that graduates to finetuning,
``lafs_train.py:451``); SimMIM checkpoints export the encoder backbone.

Example:
  python -m lafs_cvpr2024_tpu.cli.export_torch \
      --checkpoint out/ft/ckpt --out backbone.pth
"""

from __future__ import annotations

import argparse
import os


def get_args(argv=None):
    p = argparse.ArgumentParser("lafs-tpu torch state_dict export")
    p.add_argument("--checkpoint", required=True,
                   help="orbax checkpoint dir (any layout) or a .pth file")
    p.add_argument("--out", required=True,
                   help="output path (.pth with torch installed; "
                        "falls back to .npz of the same key→array mapping)")
    p.add_argument("--step", type=int, default=None,
                   help="orbax step to export (default: latest)")
    p.add_argument("--landmark-scope", default="landmark",
                   help="scope holding the stn/output_layer in the tree")
    p.add_argument("--module-prefix", action="store_true",
                   help="prefix every key with 'module.' (the raw DDP "
                        "dialect; reference loaders strip it anyway)")
    return p.parse_args(argv)


def main(argv=None):
    args = get_args(argv)
    from ..eval.loading import tree_family
    from ..train.checkpoint import (
        export_dino_vit_state_dict,
        export_iresnet_state_dict,
        export_torch_state_dict,
        import_dino_vit_state_dict,
        import_iresnet_state_dict,
        import_torch_state_dict,
        load_torch_file,
        restore_eval_variables,
        save_torch_state_dict,
    )

    if os.path.isfile(args.checkpoint):
        # already-torch input: normalize through import→export so the output
        # is the canonical prefix-stripped dialect (useful for re-keying
        # module./backbone. wrapped files)
        raw = load_torch_file(args.checkpoint)
        sd_in = raw
        if isinstance(raw, dict):
            # SSL dict dialect {student, teacher, optimizer, epoch, ...}
            # (lafs_train.py:451-460): export the teacher, the reference's
            # graduate-to-finetune model
            if isinstance(raw.get("teacher"), dict):
                sd_in = raw["teacher"]
            elif isinstance(raw.get("state_dict"), dict):
                sd_in = raw["state_dict"]
        def _stripped(k):
            return k.split("module.", 1)[-1].split("backbone.", 1)[-1]

        is_dino = any(_stripped(k).startswith("blocks.") for k in sd_in)
        is_ires = not is_dino and any(
            _stripped(k).startswith("layer1.") for k in sd_in
        )
        if is_dino:
            # a FULL DINO teacher carries the MultiCropWrapper projection
            # head (head.mlp.* / head.last_layer.*) — pretraining-only;
            # export the backbone, like the orbax SSL path does
            head = [k for k in sd_in if _stripped(k).startswith("head.")]
            if head:
                print(f"dropping {len(head)} projection-head tensors "
                      "(pretraining-only; the backbone is the export)")
                sd_in = {k: v for k, v in sd_in.items() if k not in head}
            imp = import_dino_vit_state_dict(sd_in, strict=True)
        elif is_ires:
            imp = import_iresnet_state_dict(sd_in, strict=True)
        else:
            imp = import_torch_state_dict(sd_in, strict=True)
        variables = {"params": imp.params}
        if imp.stats:
            variables["batch_stats"] = imp.stats
        step = None
    else:
        variables, step = restore_eval_variables(args.checkpoint, args.step)

    family = tree_family(variables["params"], variables.get("batch_stats"))
    if family == "dino_vit":
        # vanilla --arch vit_* teacher → the official DINO torch dialect
        sd = export_dino_vit_state_dict(variables["params"])
    elif family == "iresnet":
        sd = export_iresnet_state_dict(
            variables["params"], variables.get("batch_stats")
        )
    else:
        sd = export_torch_state_dict(
            variables["params"],
            variables.get("batch_stats"),
            landmark_scope=args.landmark_scope,
        )
    if args.module_prefix:
        sd = {f"module.{k}": v for k, v in sd.items()}
    save_torch_state_dict(sd, args.out)
    src = f"step {step}" if step is not None else "torch file"
    print(f"exported {len(sd)} tensors ({src}) -> {args.out}")


if __name__ == "__main__":
    main()
