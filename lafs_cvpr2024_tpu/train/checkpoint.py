"""Checkpointing: orbax for native state, plus importers for the reference's
three PyTorch checkpoint dialects.

Reference dialects (SURVEY §5 / ``lafs_train.py:451-463``,
``train_largescale.py:198-315,638-661``):
  1. SSL dict {student, teacher, optimizer, epoch, args, dino_loss, ...} —
     module keys wrapped in ``module.`` (DDP) and ``backbone./head.``
     (MultiCropWrapper).
  2. bare backbone state_dict from the supervised stage.
  3. partial loads filtered to ['stn', 'output'] with prefix stripping
     (``module.`` / ``backbone.`` / ``encoder.``) and optional freezing.

``import_torch_state_dict`` maps torch parameter names/layouts onto our flax
trees: Conv OIHW→HWIO, Linear (out,in)→(in,out), BatchNorm
weight/bias/running_* → scale/bias/batch_stats, weight-norm
``weight_g``/``weight_v`` → ``last_layer_g``/``last_layer_v``.
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# orbax-native save/restore
# ---------------------------------------------------------------------------

def save_checkpoint(path: str, state: Any, step: int, keep: int = 3) -> None:
    """Save a pytree checkpoint with orbax (per-step directories)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.CheckpointManager(
        path, options=ocp.CheckpointManagerOptions(max_to_keep=keep)
    ) as mgr:
        mgr.save(step, args=ocp.args.StandardSave(state))


def restore_checkpoint(path: str, abstract_state: Any, step: Optional[int] = None):
    """Restore latest (or given) step; returns None if no checkpoint exists.

    Equivalent of ``restart_from_checkpoint`` (``utils.py:152-184``)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    if not os.path.isdir(path):
        return None, None
    with ocp.CheckpointManager(path) as mgr:
        step = step if step is not None else mgr.latest_step()
        if step is None:
            return None, None
        restored = mgr.restore(step, args=ocp.args.StandardRestore(abstract_state))
        return restored, step


# ---------------------------------------------------------------------------
# torch state_dict import
# ---------------------------------------------------------------------------

def strip_prefixes(state_dict: Dict[str, Any], prefixes=("module.", "backbone.", "encoder.")):
    """Reference prefix surgery (``train_largescale.py:639-648``)."""
    out = {}
    for k, v in state_dict.items():
        if "dummy_orthogonal_classifier" in k:
            continue
        for p in prefixes:
            k = k.replace(p, "")
        out[k] = v
    return out


def _t(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def _set(tree: dict, path: Tuple[str, ...], value: np.ndarray):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = jnp.asarray(value)


# torch Sequential indices inside MobileBottleneck.conv
# (reference mobilenet.py:96-109): 0 pw conv, 1 bn, 3 dw conv, 4 bn,
# 5 SE (fc.0 / fc.2), 7 pw-linear conv, 8 bn.
_BOTTLENECK_MAP = {
    "0": ("pw", "conv"),
    "1": ("pw_norm", "bn"),
    "3": ("dw", "conv"),
    "4": ("dw_norm", "bn"),
    "7": ("pw_linear", "conv"),
    "8": ("pw_linear_norm", "bn"),
}


def _convert_stn(key: str, val: np.ndarray, params: dict, stats: dict, prefix: Tuple[str, ...]):
    """Map ``stn.features.*`` (torch MobileNetV3_backbone) keys."""
    parts = key.split(".")
    # stn.features.<block>.<...>
    block = int(parts[2])
    rest = parts[3:]
    if block == 0:
        # conv_bn stem: features.0.0 conv, features.0.1 bn
        sub = {"0": ("conv", "conv"), "1": ("norm", "bn")}[rest[0]]
        _emit(params, stats, prefix + ("stn", "stem"), sub, rest[1], val)
    else:
        name = f"block_{block - 1}"
        if rest[0] == "conv":
            idx = rest[1]
            if idx == "5" and rest[2] == "fc":
                fc = {"0": "fc1", "2": "fc2"}[rest[3]]
                _set(params, prefix + ("stn", name, "se", fc, "kernel"), _t(val).T)
            else:
                sub = _BOTTLENECK_MAP[idx]
                _emit(params, stats, prefix + ("stn", name), sub, rest[2], val)


def _emit(params, stats, base, sub, leaf, val):
    mod, kind = sub
    v = _t(val)
    if kind == "conv":
        if leaf == "weight":
            if v.ndim == 4:
                o, i, kh, kw = v.shape
                if i == 1 and mod == "dw":
                    # torch depthwise (O,1,H,W) → flax (H,W,1,O)
                    v = v.transpose(2, 3, 1, 0)
                else:
                    v = v.transpose(2, 3, 1, 0)
            _set(params, base + (mod, "kernel"), v)
        else:
            _set(params, base + (mod, "bias"), v)
    else:  # bn — flax _BN wraps nn.BatchNorm under a 'bn' scope
        if leaf == "weight":
            _set(params, base + (mod, "bn", "scale"), v)
        elif leaf == "bias":
            _set(params, base + (mod, "bn", "bias"), v)
        elif leaf == "running_mean":
            _set(stats, base + (mod, "bn", "mean"), v)
        elif leaf == "running_var":
            _set(stats, base + (mod, "bn", "var"), v)


def import_torch_state_dict(
    state_dict: Dict[str, Any],
    landmark_scope: str = "landmark",
) -> Tuple[dict, dict]:
    """Convert a reference Part-fViT state_dict → (params, batch_stats).

    Handles: stn (MobileNetV3), output_layer, patch_to_embedding, cls/pos
    tokens, transformer layers, mlp_head LayerNorm, CosFace loss weight,
    DINOHead mlp + weight-norm last layer, global_token.
    """
    sd = strip_prefixes(state_dict)
    params: dict = {}
    stats: dict = {}
    for k, v in sd.items():
        arr = _t(v)
        if k.startswith("stn."):
            _convert_stn(k, v, params, stats, (landmark_scope,))
        elif k.startswith("output_layer."):
            leaf = "kernel" if k.endswith("weight") else "bias"
            val = arr.T if leaf == "kernel" else arr
            _set(params, (landmark_scope, "output_layer", leaf), val)
        elif k.startswith("global_token."):
            leaf = "kernel" if k.endswith("weight") else "bias"
            val = arr.T if leaf == "kernel" else arr
            _set(params, ("global_token", leaf), val)
        elif k == "cls_token":
            _set(params, ("cls_token",), arr)
        elif k == "pos_embedding":
            _set(params, ("pos_embedding",), arr)
        elif k == "mask_token":
            _set(params, ("mask_token",), arr)
        elif k.startswith("patch_to_embedding."):
            leaf = "kernel" if k.endswith("weight") else "bias"
            _set(params, ("patch_to_embedding", leaf), arr.T if leaf == "kernel" else arr)
        elif k.startswith("transformer.layers."):
            _convert_transformer(k, arr, params)
        elif k.startswith("mlp_head.0."):
            leaf = "scale" if k.endswith("weight") else "bias"
            _set(params, ("mlp_head", leaf), arr)
        elif k.startswith("loss.weight"):
            _set(params, ("loss", "weight"), arr)
        elif k.startswith("mlp.") or k.startswith("last_layer."):
            _convert_dino_head(k, arr, params)
        # silently skip anything else (buffers, num_batches_tracked, etc.)
    return params, stats


def _convert_transformer(key: str, arr: np.ndarray, params: dict):
    # transformer.layers.{i}.{0|1}.fn.{norm|fn}.<rest>
    m = re.match(r"transformer\.layers\.(\d+)\.(\d)\.fn\.(.*)", key)
    if not m:
        return
    i, half, rest = int(m.group(1)), m.group(2), m.group(3)
    layer = ("transformer", f"layers_{i}")
    if half == "0":  # attention block
        if rest.startswith("norm."):
            leaf = "scale" if rest.endswith("weight") else "bias"
            _set(params, layer + ("norm1", leaf), arr)
        elif rest == "fn.to_qkv.weight":
            _set(params, layer + ("attn", "to_qkv", "kernel"), arr.T)
        elif rest == "fn.to_out.0.weight":
            _set(params, layer + ("attn", "to_out", "kernel"), arr.T)
        elif rest == "fn.to_out.0.bias":
            _set(params, layer + ("attn", "to_out", "bias"), arr)
    else:  # feedforward block
        if rest.startswith("norm."):
            leaf = "scale" if rest.endswith("weight") else "bias"
            _set(params, layer + ("norm2", leaf), arr)
        elif rest == "fn.net.0.weight":
            _set(params, layer + ("mlp", "fc1", "kernel"), arr.T)
        elif rest == "fn.net.0.bias":
            _set(params, layer + ("mlp", "fc1", "bias"), arr)
        elif rest == "fn.net.3.weight":
            _set(params, layer + ("mlp", "fc2", "kernel"), arr.T)
        elif rest == "fn.net.3.bias":
            _set(params, layer + ("mlp", "fc2", "bias"), arr)


def _convert_dino_head(key: str, arr: np.ndarray, params: dict):
    """DINOHead: mlp.{0,2,4}.{weight,bias} + last_layer.weight_{g,v}
    (``vision_transformer.py:265-301``; torch Sequential Linear/GELU)."""
    m = re.match(r"mlp\.(\d+)\.(weight|bias)", key)
    if m:
        idx = int(m.group(1))
        mlp_i = idx // 2  # Linear at 0, 2, 4 with GELUs between
        leaf = "kernel" if m.group(2) == "weight" else "bias"
        _set(params, (f"mlp_{mlp_i}", leaf), arr.T if leaf == "kernel" else arr)
        return
    if key == "last_layer.weight_g":
        _set(params, ("last_layer_g",), arr.reshape(-1, 1))
    elif key == "last_layer.weight_v":
        _set(params, ("last_layer_v",), arr)


def merge_params(base: dict, update: dict, filter_substrings=None) -> dict:
    """Overlay ``update`` onto ``base``, optionally only for paths containing
    any of ``filter_substrings`` (the ['stn','output'] partial load of
    ``load_part_checkpoint_landmark``, ``lafs_train.py:124-154``)."""
    flat_u = _flatten(update)
    flat_b = _flatten(base)
    for path, val in flat_u.items():
        if filter_substrings is not None and not any(
            s in "/".join(path) for s in filter_substrings
        ):
            continue
        if path in flat_b:
            assert flat_b[path].shape == val.shape, (
                f"shape mismatch at {'/'.join(path)}: "
                f"{flat_b[path].shape} vs {val.shape}"
            )
            flat_b[path] = val
    return _unflatten(flat_b)


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def _unflatten(flat):
    tree: dict = {}
    for path, v in flat.items():
        _set(tree, path, v)
    return tree


def load_torch_file(path: str):
    """Load a .pth file (torch is a test/interop dependency only)."""
    import torch

    return torch.load(path, map_location="cpu", weights_only=False)
