"""One checkpoint-loading path for every eval/serving CLI.

The reference requires the user to re-state the full architecture on every
evaluation invocation (its IJB script hard-codes
``ViT_face_landmark_patch8(...)`` with ~10 constructor args that must match
the checkpoint — ``IJB_evaluation.py:200-230``); passing a wrong ``--depth``
there fails deep inside ``load_state_dict``. Here the architecture is
INFERRED from the checkpoint's parameter tree itself — every eval CLI works
with just ``--checkpoint``, for any PartFViT variant we can build, from any
supported payload:

  * torch ``.pth`` state dicts (reference training output),
  * raw orbax variables,
  * any of our train CLIs' payloads (TrainState / SSLTrainState / SimMIM —
    via :func:`~lafs_cvpr2024_tpu.train.checkpoint.restore_eval_variables`).

Explicit CLI flags still win over inference (pass ``--depth 6`` to force a
layout); only genuinely non-inferable fields (``image_size``, ``pool`` —
they leave no trace in the parameter shapes) rely on defaults.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, fields
from typing import Any, Callable, Dict, Optional

__all__ = [
    "add_arch_flags",
    "add_input_scale_flag",
    "arch_overrides_from_args",
    "infer_partfvit_config",
    "load_eval_model",
    "LoadedEvalModel",
    "resolve_input_scale",
    "tree_family",
]

# PartFViTConfig fields a CLI may force explicitly. Everything else the
# inference either derives from the tree or leaves at the config default.
_OVERRIDABLE = (
    "dim", "depth", "heads", "dim_head", "mlp_dim", "num_patches",
    "image_size", "patch_size", "stn_mode", "with_land", "pool",
    "use_standcoord",
)


def add_arch_flags(parser) -> None:
    """Attach the standard architecture flag set (shared by all eval CLIs).

    Every flag defaults to ``None`` = "infer from the checkpoint"; passing a
    value forces it. ``--image-size`` keeps a real default (112, the
    reference's fixed input size) because no parameter shape records it.
    """
    g = parser.add_argument_group(
        "architecture (inferred from the checkpoint; flags force a value)"
    )
    g.add_argument("--embedding-size", type=int, default=None, dest="dim")
    g.add_argument("--depth", type=int, default=None)
    g.add_argument("--heads", type=int, default=None,
                   help="the qkv shape only fixes heads*dim_head; with "
                        "neither flag, inference assumes the reference's "
                        "64-wide heads — a checkpoint trained with a "
                        "different head width NEEDS --heads or --dim-head "
                        "(check the printed '[load] architecture' line)")
    g.add_argument("--dim-head", type=int, default=None)
    g.add_argument("--mlp-dim", type=int, default=None)
    g.add_argument("--num-patches", type=int, default=None)
    g.add_argument("--patch-size", type=int, default=None,
                   help="normally inferred from patch_to_embedding's input "
                        "dim (p*p*3); needed only for non-RGB trees")
    g.add_argument("--image-size", type=int, default=112)
    g.add_argument("--stn-mode", default=None, choices=["large", "small"])
    g.add_argument("--pool", default=None, choices=["cls", "mean"])
    g.add_argument("--no-land", dest="with_land", action="store_false",
                   default=None,
                   help="force the no-landmark (raw-patchify) forward; "
                        "normally inferred from the tree")
    g.add_argument("--standcoord", dest="use_standcoord",
                   action="store_true", default=None,
                   help="fixed-grid landmark variant (use_standcoord): "
                        "NOT inferable — its tree is identical to a "
                        "no-landmark checkpoint's, but the forward gathers "
                        "a transposed grid mosaic instead of raw patchify")


def add_input_scale_flag(parser, default: str = "auto") -> None:
    """The shared ``--input-scale`` flag (every eval/serving CLI).

    The input-scaling convention is a property of the CHECKPOINT, not of
    the tool, and leaves no trace in the parameter tree — a mismatch
    silently degrades accuracy (inputs at half the trained dynamic range).
    Default ``auto``: resolved per checkpoint FAMILY after loading
    (:func:`resolve_input_scale`) — vanilla ``vit_*`` trees always train
    with the ImageNet convention, everything else gets the reference's
    eval convention ('half').
    """
    from ..ops.augment_device import INPUT_SCALES

    parser.add_argument(
        "--input-scale", default=default,
        choices=["auto", *INPUT_SCALES],
        help="input convention the checkpoint was trained/evaluated with: "
             "'half' = x/255-0.5 (reference eval, IJB_evaluation.py:444), "
             "'unit' = x/255*2-1 (train convention, "
             "train_largescale.py:790), 'imagenet' = per-channel "
             "(x/255-mean)/std (vanilla-DINO --arch vit_* checkpoints, "
             "lafs_train.py:751-753); 'auto' picks by checkpoint family "
             "(imagenet for dino_vit trees, half otherwise)",
    )


#: families whose ONLY training path is the vanilla DINO transform
#: (DataAugmentationDINO / vanilla_multicrop_device — ImageNet-normalized,
#: lafs_train.py:751-753): vit_* teachers AND the overlap/mobile_dino SSL
#: archs. PartFViT/iResNet keep the reference eval convention ('half',
#: IJB_evaluation.py:444).
_IMAGENET_FAMILIES = ("dino_vit", "overlap", "mobile_dino")


def resolve_input_scale(value: str, family: str,
                        log: Callable[[str], None] = print) -> str:
    """Resolve the ``--input-scale`` flag against the loaded family.

    ``auto`` → 'imagenet' for the vanilla-DINO families (the only
    convention they train with), 'half' otherwise (the reference eval
    convention). An explicit value always wins, but a family/convention
    mismatch gets a loud warning — it silently degrades accuracy and
    leaves no other trace."""
    if value == "auto":
        scale = "imagenet" if family in _IMAGENET_FAMILIES else "half"
        log(f"[load] input-scale auto -> {scale!r} (family {family})")
        return scale
    if family in _IMAGENET_FAMILIES and value != "imagenet":
        log(f"[load] WARNING: --input-scale {value!r} on a {family} "
            "checkpoint — that family trains with the ImageNet convention "
            "(lafs_train.py:751-753); accuracy will silently degrade "
            "unless this checkpoint was finetuned under a different one")
    return value


def arch_overrides_from_args(args) -> Dict[str, Any]:
    """Collect the non-``None`` architecture overrides from parsed args."""
    out = {}
    for name in _OVERRIDABLE:
        if hasattr(args, name) and getattr(args, name) is not None:
            out[name] = getattr(args, name)
    return out


def _infer_heads(inner: int, heads, dim_head):
    """Resolve (heads, dim_head) from the qkv inner width + optional flags.

    The tree only fixes their PRODUCT; without a flag, assume the
    reference's 64-wide heads and refuse loudly when that doesn't divide —
    shared by every transformer family's inference (a silent heads=0 or a
    mismatched product must never reach the model)."""
    if heads and dim_head:
        if heads * dim_head != inner:
            raise ValueError(
                f"--heads {heads} x --dim-head {dim_head} != checkpoint's "
                f"qkv inner dim {inner}"
            )
    elif heads:
        if inner % heads:
            raise ValueError(
                f"checkpoint qkv inner dim {inner} not divisible by "
                f"--heads {heads}"
            )
        dim_head = inner // heads
    else:
        dim_head = dim_head or 64  # the reference's only head width
        if inner % dim_head:
            raise ValueError(
                f"checkpoint qkv inner dim {inner} not divisible by head "
                f"width {dim_head}; pass --heads/--dim-head explicitly"
            )
        heads = inner // dim_head
    return int(heads), int(dim_head)


def infer_partfvit_config(params, **overrides):
    """Derive a :class:`PartFViTConfig` from a flax param tree.

    ``params`` is the ``variables["params"]`` dict of any PartFViT variant
    (native init, orbax restore, or a torch import — the importers emit the
    same tree names). Keyword overrides win over inference. Raises
    ``ValueError`` with an actionable message when a field is ambiguous.
    """
    from ..models.mobilenet import LARGE_SETTING, SMALL_SETTING
    from ..models.partfvit import PartFViTConfig

    def need(*path):
        node = params
        for k in path:
            if not isinstance(node, dict) or k not in node:
                raise ValueError(
                    "infer_partfvit_config: checkpoint tree has no "
                    f"'{'/'.join(path)}' — not a PartFViT-family payload? "
                    "Pass the architecture flags explicitly."
                )
            node = node[k]
        return node

    ov = dict(overrides)
    cfg: Dict[str, Any] = {}

    cfg["dim"] = ov.pop("dim", None) or int(need("cls_token").shape[-1])
    cfg["num_patches"] = (
        ov.pop("num_patches", None)
        or int(need("pos_embedding").shape[1]) - 1
    )

    patch_in = int(need("patch_to_embedding", "kernel").shape[0])
    if "patch_size" in ov:
        cfg["patch_size"] = ov.pop("patch_size")
    else:
        ps = math.isqrt(patch_in // 3)
        if ps * ps * 3 != patch_in:
            raise ValueError(
                f"infer_partfvit_config: patch_to_embedding input dim "
                f"{patch_in} is not (p*p*3) — non-RGB input? Pass "
                "patch_size explicitly."
            )
        cfg["patch_size"] = ps

    layers = [k for k in need("transformer") if k.startswith("layers_")]
    cfg["depth"] = ov.pop("depth", None) or len(layers)

    inner = int(
        need("transformer", "layers_0", "attn", "to_qkv", "kernel").shape[1]
    ) // 3
    cfg["heads"], cfg["dim_head"] = _infer_heads(
        inner, ov.pop("heads", None), ov.pop("dim_head", None)
    )

    cfg["mlp_dim"] = (
        ov.pop("mlp_dim", None)
        or int(need("transformer", "layers_0", "mlp", "fc1", "kernel").shape[1])
    )

    with_land = ov.pop("with_land", None)
    if with_land is None:
        with_land = "landmark" in params
    cfg["with_land"] = bool(with_land)

    stn_mode = ov.pop("stn_mode", None)
    if cfg["with_land"] and stn_mode is None:
        nblocks = len(
            [k for k in need("landmark", "stn") if k.startswith("block_")]
        )
        if nblocks == len(LARGE_SETTING):
            stn_mode = "large"
        elif nblocks == len(SMALL_SETTING):
            stn_mode = "small"
        else:
            raise ValueError(
                f"landmark stem has {nblocks} blocks — neither MobileNetV3-"
                f"large ({len(LARGE_SETTING)}) nor -small "
                f"({len(SMALL_SETTING)}); pass --stn-mode"
            )
    cfg["stn_mode"] = stn_mode or "large"

    cfg["use_global_token"] = "global_token" in params
    cfg["simmim"] = "mask_token" in params
    if ov.pop("use_standcoord", None):
        # not inferable (same tree as with_land=False); PartFViT itself
        # rejects the with_land+standcoord combination loudly
        cfg["use_standcoord"] = True
    for key in ("image_size", "pool"):
        if key in ov and ov[key] is not None:
            cfg[key] = ov.pop(key)
        else:
            ov.pop(key, None)
    if ov:
        raise TypeError(f"unknown config overrides: {sorted(ov)}")

    return PartFViTConfig(loss_type="None", num_classes=0, **cfg)


def tree_family(params, batch_stats=None) -> str:
    """Classify a checkpoint tree into the backbone family that produced it.

    Every SSL ``--arch`` (train/ssl.SSL_ARCHS) leaves a distinct signature:

    - ``dino_vit``:    ``patch_embed`` conv + ``block_N`` (vision_transformer
                       naming) — vit_tiny/small/base teachers;
    - ``mobile_dino``: ``stn`` MobileNetV3 + ``output_layer`` projector, no
                       transformer;
    - ``overlap``:     PartFViT-style PARAM tree (OverlapViT shares every
                       top-level param name with ``PartFViT(with_land=
                       False)``) — told apart by its BatchNorm1d ``mlp_head``
                       (ViT_face.py:1530), whose running stats land in
                       ``batch_stats`` in both the orbax layouts
                       (SSLTrainState.stats) and the torch importer
                       (checkpoint.py ``mlp_head.0.running_*``); PartFViT's
                       LayerNorm head never carries stats;
    - ``iresnet``:     insightface ResNet (``layer1_0`` stage blocks + the
                       ``features`` BN head — models/iresnet.py), the
                       reference's selectable alternative backbone;
    - ``partfvit``:    everything else (the flagship family — includes
                       global-token/SimMIM/standcoord variants).
    """
    if "block_0" in params and "patch_embed" in params:
        return "dino_vit"
    if ("stn" in params and "output_layer" in params
            and "transformer" not in params):
        return "mobile_dino"
    if "layer1_0" in params and "features" in params:
        return "iresnet"
    if "mlp_head" in (batch_stats or {}) and "landmark" not in params:
        return "overlap"
    return "partfvit"


def _infer_dino_vit(params, ov: Dict[str, Any]):
    """VisionTransformer from a dino_vit tree. heads is not recorded in any
    shape (qkv inner == dim); default to the published vit_* head counts by
    embed dim, overridable with --heads."""
    from ..models.dino_vit import VisionTransformer

    dim = ov.pop("dim", None) or int(params["cls_token"].shape[-1])
    depth = ov.pop("depth", None) or len(
        [k for k in params if k.startswith("block_")]
    )
    patch = ov.pop("patch_size", None) or int(
        params["patch_embed"]["kernel"].shape[0]
    )
    # the module geometry ALWAYS follows the tree: pos_embed records the
    # trained token grid (unlike PartFViT, image size IS inferable here),
    # and apply-time bicubic interpolation handles any INPUT resolution
    # (vision_transformer.py:174-194) — so the CLI --image-size default
    # (112, a PartFViT necessity) must not distort the template's pos_embed
    n_tok = int(params["pos_embed"].shape[1]) - 1
    side = math.isqrt(n_tok)
    img = side * patch
    mlp_ratio = (
        int(params["block_0"]["fc1"]["kernel"].shape[1]) / dim
        if "fc1" in params.get("block_0", {})
        else 4.0
    )
    heads = ov.pop("heads", None) or {192: 3, 384: 6, 768: 12}.get(dim)
    if heads is None:
        raise ValueError(
            f"dino_vit tree with embed dim {dim} is not a published vit_* "
            "width — pass --heads explicitly (head count leaves no trace "
            "in the parameter shapes)"
        )
    for k in ("mlp_dim", "num_patches", "dim_head", "stn_mode", "pool",
              "with_land", "use_standcoord", "image_size"):
        ov.pop(k, None)  # PartFViT-only flags: meaningless here
    if ov:
        raise TypeError(f"unknown config overrides: {sorted(ov)}")
    return VisionTransformer(
        img_size=img, patch_size=patch, embed_dim=dim, depth=depth,
        num_heads=int(heads), mlp_ratio=mlp_ratio, num_classes=0,
    )


def _infer_mobile_dino(params, ov: Dict[str, Any]):
    from ..models.mobilenet import LARGE_SETTING, SMALL_SETTING, MobileDINO

    embd = ov.pop("dim", None) or int(
        params["output_layer"]["kernel"].shape[-1]
    )
    mode = ov.pop("stn_mode", None)
    if mode is None:
        nblocks = len([k for k in params["stn"] if k.startswith("block_")])
        mode = "large" if nblocks == len(LARGE_SETTING) else "small"
        if nblocks not in (len(LARGE_SETTING), len(SMALL_SETTING)):
            raise ValueError(
                f"mobile_dino stem has {nblocks} blocks — pass --stn-mode"
            )
    for k in ("depth", "heads", "dim_head", "mlp_dim", "num_patches",
              "patch_size", "image_size", "pool", "with_land",
              "use_standcoord"):
        ov.pop(k, None)
    if ov:
        raise TypeError(f"unknown config overrides: {sorted(ov)}")
    return MobileDINO(embd_dim=embd, mode=mode)


def _infer_iresnet(params, ov: Dict[str, Any]):
    """IResNet from its tree — everything is recorded in the shapes/names:
    per-stage block counts from the ``layer{s}_{b}`` names, head variant
    from the presence of ``fc`` (absent = the avg-pool factory variant),
    embedding width from the fc kernel (or 512), features-BN scale from
    the param itself, input size from the fc flatten width (512·(s/16)²;
    avg-pool leaves no trace → the reference's 112)."""
    from ..models.iresnet import IResNet

    layers = tuple(
        len([k for k in params if k.startswith(f"layer{s}_")])
        for s in range(1, 5)
    )
    if not all(layers):
        raise ValueError(f"iresnet tree with empty stages: {layers}")
    avg_pool = "fc" not in params
    if avg_pool:
        num_features = 512
    else:
        num_features = ov.pop("dim", None) or int(
            params["fc"]["kernel"].shape[-1]
        )
        fc_in = int(params["fc"]["kernel"].shape[0])
        if math.isqrt(fc_in // 512) ** 2 * 512 != fc_in:
            raise ValueError(
                f"iresnet fc input {fc_in} is not 512·(size/16)²"
            )
    features_scale = "scale" in params.get("features", {})
    for k in ("dim", "depth", "heads", "dim_head", "mlp_dim", "num_patches",
              "patch_size", "image_size", "stn_mode", "pool", "with_land",
              "use_standcoord"):
        ov.pop(k, None)  # transformer-family flags: meaningless here
    if ov:
        raise TypeError(f"unknown config overrides: {sorted(ov)}")
    return IResNet(
        layers=layers, num_features=num_features, avg_pool=avg_pool,
        features_scale=features_scale, with_loss=False, num_classes=0,
    )


def _infer_overlap(params, ov: Dict[str, Any]):
    """OverlapViT from its tree. The unfold STRIDE (cfg.patch_size) leaves
    no trace in the shapes — default 8 (the reference's, ViT_face.py:1516),
    force with --patch-size; ac_patch_size comes from the embedding input
    width (3·ac²)."""
    from ..models.partfvit import OverlapViT, PartFViTConfig

    patch_in = int(params["patch_to_embedding"]["kernel"].shape[0])
    ac = math.isqrt(patch_in // 3)
    if ac * ac * 3 != patch_in:
        raise ValueError(
            f"overlap tree: patch_to_embedding input {patch_in} != 3·ac²"
        )
    dim = ov.pop("dim", None) or int(params["cls_token"].shape[-1])
    num_patches = (ov.pop("num_patches", None)
                   or int(params["pos_embedding"].shape[1]) - 1)
    layers = [k for k in params["transformer"] if k.startswith("layers_")]
    depth = ov.pop("depth", None) or len(layers)
    inner = int(
        params["transformer"]["layers_0"]["attn"]["to_qkv"]["kernel"].shape[1]
    ) // 3
    heads, dim_head = _infer_heads(
        inner, ov.pop("heads", None), ov.pop("dim_head", None)
    )
    mlp_dim = ov.pop("mlp_dim", None) or int(
        params["transformer"]["layers_0"]["mlp"]["fc1"]["kernel"].shape[1]
    )
    cfg = PartFViTConfig(
        dim=dim, depth=depth, heads=int(heads), dim_head=int(dim_head),
        mlp_dim=mlp_dim, num_patches=num_patches, with_land=False,
        loss_type="None", num_classes=0,
        patch_size=ov.pop("patch_size", None) or 8,
        image_size=ov.pop("image_size", None) or 112,
        pool=ov.pop("pool", None) or "cls",
    )
    for k in ("stn_mode", "with_land", "use_standcoord"):
        ov.pop(k, None)
    if ov:
        raise TypeError(f"unknown config overrides: {sorted(ov)}")
    return OverlapViT(cfg, ac_patch_size=ac)


@dataclass
class LoadedEvalModel:
    model: Any          # flax module (PartFViT / VisionTransformer / ...)
    variables: dict     # ready for model.apply
    cfg: Any            # the config actually built (family-specific)
    step: Optional[int]  # train step for orbax payloads, None for .pth
    family: str = "partfvit"  # tree_family() of the checkpoint
    input_size: int = 112  # resolved input resolution (cfg.image_size /
                           # vit img_size / the iresnet fc flatten width) —
                           # the ONE place consumers should read it from


def _describe(cfg) -> str:
    from ..models.partfvit import PartFViTConfig

    if not isinstance(cfg, PartFViTConfig):
        return repr(cfg)  # flax modules self-describe their fields
    defaults = PartFViTConfig(loss_type="None", num_classes=0)
    # core geometry is ALWAYS printed — in particular heads×dim_head, which
    # inference can only assume (the tree fixes just their product): a user
    # who trained a non-64 head width must be able to SEE the wrong split
    bits = [
        f"{name}={getattr(cfg, name)}"
        for name in ("dim", "depth", "heads", "dim_head", "mlp_dim")
    ]
    for f in fields(cfg):
        if f.name in ("loss_type", "num_classes", "dim", "depth", "heads",
                      "dim_head", "mlp_dim"):
            continue
        v = getattr(cfg, f.name)
        if v != getattr(defaults, f.name):
            bits.append(f"{f.name}={v}")
    return ", ".join(bits)


def load_eval_model(
    checkpoint: str,
    overrides: Optional[Dict[str, Any]] = None,
    log: Callable[[str], None] = print,
) -> LoadedEvalModel:
    """Load ``checkpoint`` (torch ``.pth`` or any orbax layout), infer the
    architecture — INCLUDING the backbone family (PartFViT variants, DINO
    vit_*, OverlapViT, MobileDINO, iResNet: every SSL ``--arch`` teacher
    plus the insightface alternative backbone is
    evaluable) — from its tree, build the model, and return apply-ready
    variables. The single loading path behind all eval/serving CLIs."""
    import jax
    import jax.numpy as jnp

    from ..models.partfvit import PartFViT
    from ..train.checkpoint import (
        import_dino_vit_state_dict,
        import_iresnet_state_dict,
        import_torch_state_dict,
        load_torch_file,
        merge_params,
        restore_eval_variables,
    )

    if checkpoint.endswith(".pth"):
        sd = load_torch_file(checkpoint)
        # the DINO VisionTransformer torch dialect announces itself by its
        # block naming (vision_transformer.py: "blocks.N...")
        is_dino = any(
            k.split("module.", 1)[-1].split("backbone.", 1)[-1]
            .startswith("blocks.")
            for k in sd
        )
        # the insightface iResNet dialect by its stage naming ("layer1.0...")
        is_ires = not is_dino and any(
            k.split("module.", 1)[-1].split("backbone.", 1)[-1]
            .startswith("layer1.")
            for k in sd
        )
        imp = (import_dino_vit_state_dict(sd) if is_dino
               else import_iresnet_state_dict(sd) if is_ires
               else import_torch_state_dict(sd))
        log(f"[load] import {imp.summary()}")
        params, stats = imp
        if set(params) == {"landmark"} and "output_layer" in params["landmark"]:
            # a bare mobile_dino .pth: the partfvit torch dialect nests the
            # stem under `landmark`, but the flax MobileDINO names stn/
            # output_layer at the top — unwrap so tree_family can see it
            params = params["landmark"]
            stats = stats.get("landmark", {}) if stats else stats
        variables, step = {"params": params}, None
        if stats:
            variables["batch_stats"] = stats
    else:
        variables, step = restore_eval_variables(checkpoint)
        log(f"[load] restored step {step} from {checkpoint}")

    params = variables["params"]
    family = tree_family(params, variables.get("batch_stats"))
    ov = dict(overrides or {})
    if family == "partfvit":
        cfg = infer_partfvit_config(params, **ov)
        model = PartFViT(cfg)
    elif family == "dino_vit":
        model = cfg = _infer_dino_vit(params, ov)
    elif family == "mobile_dino":
        model = cfg = _infer_mobile_dino(params, ov)
    elif family == "iresnet":
        model = cfg = _infer_iresnet(params, ov)
    else:
        model = _infer_overlap(params, ov)
        cfg = model.cfg

    size = getattr(cfg, "image_size", None) or getattr(model, "img_size", 112)
    if family == "iresnet" and "fc" in params:
        # the fc flatten width fixes the input size (512·(s/16)²)
        size = 16 * math.isqrt(int(params["fc"]["kernel"].shape[0]) // 512)

    if checkpoint.endswith(".pth"):
        # graft the imported tree onto a native template so any leaves the
        # dialect doesn't carry keep their initialized values (and shape
        # mismatches fail loudly inside merge_params)
        imported_stats = variables.get("batch_stats", {})
        template = jax.jit(model.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3))
        )
        variables = {
            "params": merge_params(template["params"], params),
        }
        stats = merge_params(template.get("batch_stats", {}), imported_stats)
        if stats:
            variables["batch_stats"] = stats
    log(f"[load] family: {family}; architecture: {_describe(cfg)}")
    return LoadedEvalModel(model=model, variables=variables, cfg=cfg,
                           step=step, family=family, input_size=int(size))
