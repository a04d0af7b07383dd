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

import math
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
    """Save a pytree checkpoint with orbax (per-step directories).

    BLOCKING one-shot form (constructs and drains a manager per call) —
    fine for tests and final saves; the training CLIs use
    :class:`CheckpointWriter` so serialization/IO overlap training."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.CheckpointManager(
        path, options=ocp.CheckpointManagerOptions(max_to_keep=keep)
    ) as mgr:
        mgr.save(step, args=ocp.args.StandardSave(state))


class CheckpointWriter:
    """Long-lived ASYNC orbax writer for the training loops.

    ``save()`` returns once the device state is snapshotted to host;
    serialization + disk IO run in orbax's background thread while the
    next train steps dispatch (the reference blocks the loop in
    ``torch.save`` for the full write, ``lafs_train.py:598-607`` — on the
    flagship the SSL payload is ~1.4 GB, several seconds of IO per save).
    Ordering, retention (``max_to_keep``) and atomic per-step directories
    are orbax's; a still-running previous save is drained automatically
    before the next one starts. ``close()`` (or context exit) blocks
    until everything pending is durably on disk — always close before
    reading the directory back or exiting the process."""

    def __init__(self, path: str, keep: int = 3,
                 keep_period: Optional[int] = None):
        """``keep``: rolling retention (latest N checkpoints).
        ``keep_period``: additionally preserve every checkpoint whose step
        is a multiple of this FOREVER — the reference's permanent
        ``checkpoint{epoch:04}.pth`` snapshots every ``saveckp_freq``
        epochs (``lafs_train.py:459-463``); pass
        ``saveckp_freq * steps_per_epoch``."""
        import orbax.checkpoint as ocp

        self._ocp = ocp
        if keep_period:
            from orbax.checkpoint import checkpoint_managers as cms

            opts = ocp.CheckpointManagerOptions(
                enable_async_checkpointing=True,
                preservation_policy=cms.AnyPreservationPolicy([
                    cms.LatestN(n=keep),
                    cms.EveryNSteps(interval_steps=keep_period),
                ]),
            )
        else:
            opts = ocp.CheckpointManagerOptions(
                max_to_keep=keep, enable_async_checkpointing=True,
            )
        self._mgr = ocp.CheckpointManager(os.path.abspath(path), options=opts)

    def save(self, step: int, state: Any, force: bool = False) -> bool:
        """Queue an async save. Returns orbax's saved-flag: ``False`` means
        the manager SKIPPED the save (its ``should_save`` declines steps ≤
        the latest existing one) — callers must not report a skipped save
        as saved. ``force=True`` overrides the skip logic."""
        saved = self._mgr.save(
            step, args=self._ocp.args.StandardSave(state), force=force
        )
        if saved is False:
            print(f"[ckpt] save({step}) SKIPPED by orbax (a checkpoint at "
                  f"step ≥ {step} already exists)")
        return bool(saved) if saved is not None else True

    def wait(self) -> None:
        """Block until all pending async saves are committed."""
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class PreemptionGuard:
    """SIGTERM-aware training for preemptible TPU VMs.

    Cloud TPU maintenance/preemption delivers SIGTERM with a grace window;
    the reference has no handling (a mid-``torch.save`` kill corrupts the
    checkpoint). The guard flips a flag the train loops poll at step
    boundaries, so the run writes one final exact-resume checkpoint and
    exits cleanly — the signal handler itself does nothing unsafe. The
    previous handler is chained (systemd/test runners keep their
    semantics) and restored by ``uninstall()``."""

    def __init__(self, signals=None):
        import signal as _signal

        self._signal = _signal
        self._requested = False
        self._prev = {}
        for s in signals or (_signal.SIGTERM,):
            self._prev[s] = _signal.signal(s, self._handler)

    def _handler(self, signum, frame):
        self._requested = True
        prev = self._prev.get(signum)
        if callable(prev):
            prev(signum, frame)

    @property
    def requested(self) -> bool:
        return self._requested

    def should_exit(self, step: int, every: int = 8) -> bool:
        """Cross-process-SAFE exit poll for the train loops.

        Single-process: the local flag. Multi-process: ranks receive
        SIGTERM milliseconds apart, so acting on the local flag alone
        would strand the other ranks in the next step's collectives
        (the hazard ``DeferredLossFetcher`` documents). Every ``every``
        steps — an identical cadence on every rank since ``step`` is the
        global step — ALL ranks enter one tiny host allgather and exit
        together iff any rank was signaled. Between sync points the
        answer is False even if locally signaled (bounded by
        ``every × step_time``, well inside the preemption grace window).
        """
        if jax.process_count() <= 1:
            return self._requested
        if step % every:
            return False
        import numpy as _np
        from jax.experimental import multihost_utils

        flags = multihost_utils.process_allgather(
            _np.asarray([self._requested])
        )
        return bool(_np.any(flags))

    def uninstall(self) -> None:
        for s, prev in self._prev.items():
            self._signal.signal(s, prev)
        self._prev = {}


def make_training_checkpointer(path: str, payload: Any, alt_abstract_thunk,
                               adapt, keep: int = 3, resume: bool = True,
                               keep_period: Optional[int] = None):
    """One-stop training-checkpoint wiring shared by the three train CLIs
    (one definition so the policy cannot diverge between them):

    - restore the latest checkpoint, tolerating a ``--zero1`` moment-layout
      flip (``alt_abstract_thunk`` builds the alternate template ONLY in
      that rare path — no eager second model trace at startup);
    - construct the ASYNC :class:`CheckpointWriter` on EVERY process —
      orbax multi-process saves require all ranks to participate (each
      writes its addressable shards); rank-gating the writer deadlocks
      multi-host saves. Gate PRINTS on the main process, never the save;
    - install the SIGTERM :class:`PreemptionGuard` (poll
      ``guard.should_exit(gstep)`` at step boundaries).

    Returns ``(restored, step, writer, guard)``; ``resume=False`` skips the
    restore (fresh run) but still builds the writer + guard.
    """
    restored, step = None, None
    if resume:
        abstract = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), payload
        )
        restored, step = restore_checkpoint_flex(
            path, abstract, alt_abstract_thunk, adapt
        )
    return (restored, step,
            CheckpointWriter(path, keep=keep, keep_period=keep_period),
            PreemptionGuard())


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
        try:
            restored = mgr.restore(
                step, args=ocp.args.StandardRestore(abstract_state)
            )
        except ValueError as e:
            # SSL checkpoints written before SSLTrainState grew the `stats`
            # field restore into the new state when stats is LEAFLESS (the
            # stat-less archs — stats=()): drop the empty field from the
            # template and re-attach after the restore. A BN arch (stats
            # carries leaves) must NOT silently lose its running stats, so
            # that case still raises.
            stats_empty = (
                hasattr(abstract_state, "_asdict")
                and hasattr(abstract_state, "stats")
                and not jax.tree_util.tree_leaves(abstract_state.stats)
            )
            if not (stats_empty and "stats" in str(e)):
                raise
            reduced = {k: v for k, v in abstract_state._asdict().items()
                       if k != "stats"}
            got = mgr.restore(step, args=ocp.args.StandardRestore(reduced))
            restored = type(abstract_state)(**got, stats=())
        return restored, step


def restore_checkpoint_flex(path: str, abstract_state: Any,
                            alt_abstract_state: Any, adapt,
                            step: Optional[int] = None):
    """:func:`restore_checkpoint` that tolerates a dense ↔ ZeRO-1 optimizer
    moment-layout difference between the checkpoint and the current run
    (``--zero1`` flipped between save and resume): on a template mismatch
    it retries with ``alt_abstract_state`` (the other layout's template —
    pass a zero-arg CALLABLE to defer building it to this rare path) and
    runs ``adapt`` — typically ``optim.adapt_moment_layout`` glue — on
    the restored payload. Layout conversion across DIFFERENT mesh
    data-axis sizes only round-trips when the alternate template's chunk
    count matches the checkpoint's; otherwise resume once without
    ``--zero1`` to densify, then re-shard.

    ``adapt`` runs on EVERY successful restore (it must be a no-op for a
    matching layout): orbax restores same-element-count leaves in their
    SAVED shape without raising, so a layout flip is only an exception
    when chunk padding changes the element count."""
    try:
        restored, st = restore_checkpoint(path, abstract_state, step)
    except Exception as e:  # orbax raises backend-specific mismatch types
        print(f"[restore] primary template failed ({type(e).__name__}) — "
              "retrying with the alternate optimizer-moment layout")
        alt = alt_abstract_state() if callable(alt_abstract_state) \
            else alt_abstract_state
        try:
            restored, st = restore_checkpoint(path, alt, step)
        except Exception as e2:
            # BOTH layouts failed: the checkpoint is likely corrupt or
            # structurally different — surface the ORIGINAL error (the
            # alternate's shape noise would mask the real cause)
            raise e from e2
        if restored is None:
            raise e
    if restored is None:
        return None, st
    return adapt(restored), st


def restore_eval_variables(path: str, step: Optional[int] = None):
    """Template-free restore of model variables from ANY of this framework's
    orbax layouts, for eval CLIs that shouldn't need to reconstruct the
    training state's exact pytree:

    - raw flax variables ``{"params": ..., ["batch_stats": ...]}``
    - a train-CLI payload ``{"state": TrainState, ["cls_w"/"cls_opt"]}``
    - a bare supervised ``TrainState`` (restores as a 5-list:
      [params, batch_stats, opt_state, step, rng])
    - a bare ``SSLTrainState`` (6-list: [student, teacher, opt_state,
      center, step, rng]) — returns the TEACHER backbone (the SSL eval
      convention, ``lafs_train.py:451``: the teacher is the export model).
    - a bare ``SimMIMTrainState`` (4-list: [params, opt_state, step, rng])
      — returns the BACKBONE (the decoder is pretraining-only; the
      reference likewise exports only the encoder from its external SimMIM
      stage, ``train_largescale.py:198-315``).
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    if not os.path.isdir(path):
        raise FileNotFoundError(path)
    with ocp.CheckpointManager(path) as mgr:
        st = step if step is not None else mgr.latest_step()
        if st is None:
            raise FileNotFoundError(f"no checkpoint steps under {path}")
        raw = mgr.restore(st)

    def extract(tree):
        if isinstance(tree, dict):
            if "params" in tree:
                p = tree["params"]
                if isinstance(p, dict) and "backbone" in p and "decoder" in p:
                    # SimMIMTrainState (NamedTuples restore as field-name
                    # dicts): export the ENCODER backbone; the decoder is
                    # pretraining-only, matching the reference's
                    # encoder-only export from its SimMIM stage
                    return {"params": p["backbone"]}
                out = {"params": p}
                if tree.get("batch_stats"):
                    out["batch_stats"] = tree["batch_stats"]
                return out
            if "state" in tree:
                return extract(tree["state"])
            if "student" in tree and "teacher" in tree:
                out = {"params": tree["teacher"]["backbone"]}
                # BN archs (overlap/mobile_dino) carry running stats; the
                # teacher's are the eval stats (train/ssl.py::SSLTrainState).
                # use_bn_in_head runs may carry HEAD-only stats — the head is
                # dropped with the rest of the projection head at eval
                stats = tree.get("stats")
                if isinstance(stats, dict) and isinstance(
                    stats.get("teacher"), dict
                ) and stats["teacher"].get("backbone"):
                    out["batch_stats"] = stats["teacher"]["backbone"]
                return out
        def _scalar(x):
            return np.ndim(x) == 0 or (hasattr(x, "shape") and x.shape == ())

        if isinstance(tree, (list, tuple)):
            # arity alone is ambiguous — confirm the field layout before
            # trusting the guess, and reject look-alikes loudly
            if (
                len(tree) == 5  # TrainState: params/batch_stats/opt/step/rng
                and isinstance(tree[0], dict)
                and isinstance(tree[1], (dict, type(None)))
                and _scalar(tree[3])
            ):
                out = {"params": tree[0]}
                if tree[1]:
                    out["batch_stats"] = tree[1]
                return out
            if (
                len(tree) in (6, 7)  # SSLTrainState — teacher backbone
                # (7 adds the round-4 BN `stats` field)
                and isinstance(tree[1], dict)
                and "backbone" in tree[1]
                and _scalar(tree[4])
            ):
                out = {"params": tree[1]["backbone"]}
                if (len(tree) == 7 and isinstance(tree[6], dict)
                        and isinstance(tree[6].get("teacher"), dict)
                        and tree[6]["teacher"].get("backbone")):
                    out["batch_stats"] = tree[6]["teacher"]["backbone"]
                return out
            if (
                len(tree) == 4  # SimMIMTrainState — encoder backbone
                and isinstance(tree[0], dict)
                and "backbone" in tree[0]
                and "decoder" in tree[0]
                and _scalar(tree[2])
            ):
                return {"params": tree[0]["backbone"]}
        raise ValueError(
            f"unrecognized checkpoint layout under {path}: {type(tree)}"
        )

    return extract(raw), st


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


def _convert_stn(key: str, val: np.ndarray, params: dict, stats: dict, prefix: Tuple[str, ...]) -> bool:
    """Map ``stn.features.*`` (torch MobileNetV3_backbone) keys."""
    parts = key.split(".")
    if parts[1] != "features":
        return False
    # stn.features.<block>.<...>
    block = int(parts[2])
    rest = parts[3:]
    if block == 0:
        # conv_bn stem: features.0.0 conv, features.0.1 bn
        sub = {"0": ("conv", "conv"), "1": ("norm", "bn")}.get(rest[0])
        if sub is None:
            return False
        return _emit(params, stats, prefix + ("stn", "stem"), sub, rest[1], val)
    name = f"block_{block - 1}"
    if rest[0] == "conv":
        idx = rest[1]
        if idx == "5" and rest[2] == "fc":
            fc = {"0": "fc1", "2": "fc2"}.get(rest[3])
            if fc is None or not key.endswith("weight"):
                return False
            _set(params, prefix + ("stn", name, "se", fc, "kernel"), _t(val).T)
            return True
        sub = _BOTTLENECK_MAP.get(idx)
        if sub is None:
            return False
        return _emit(params, stats, prefix + ("stn", name), sub, rest[2], val)
    return False


def _emit(params, stats, base, sub, leaf, val) -> bool:
    mod, kind = sub
    v = _t(val)
    if kind == "conv":
        if leaf == "weight":
            if v.ndim == 4:
                # torch (O,I,H,W) → flax (H,W,I,O); depthwise (O,1,H,W)
                # lands on (H,W,1,O) the same way
                v = v.transpose(2, 3, 1, 0)
            _set(params, base + (mod, "kernel"), v)
        elif leaf == "bias":
            _set(params, base + (mod, "bias"), v)
        else:
            return False
    else:  # bn — flax _BN wraps nn.BatchNorm under a 'bn' scope
        if leaf == "weight":
            _set(params, base + (mod, "bn", "scale"), v)
        elif leaf == "bias":
            _set(params, base + (mod, "bn", "bias"), v)
        elif leaf == "running_mean":
            _set(stats, base + (mod, "bn", "mean"), v)
        elif leaf == "running_var":
            _set(stats, base + (mod, "bn", "var"), v)
        else:
            return False
    return True


class TorchImport:
    """Result of ``import_torch_state_dict``.

    Unpacks as ``params, stats = import_torch_state_dict(sd)`` (back-compat)
    while carrying the key-accounting sets for diagnostics:
      consumed — stripped keys that landed in params/batch_stats
      skipped  — keys the mapper did NOT place (excluding known buffers)
      buffers  — known non-parameter buffers (num_batches_tracked, …)
    """

    def __init__(self, params, stats, consumed, skipped, buffers):
        self.params = params
        self.stats = stats
        self.consumed = consumed
        self.skipped = skipped
        self.buffers = buffers

    def __iter__(self):
        return iter((self.params, self.stats))

    def summary(self) -> str:
        return (
            f"imported {len(self.consumed)} tensors, "
            f"skipped {len(self.skipped)} "
            f"({sorted(self.skipped)[:8]}{'…' if len(self.skipped) > 8 else ''}), "
            f"{len(self.buffers)} buffers ignored"
        )


_IGNORED_BUFFER_SUFFIXES = ("num_batches_tracked",)


def import_torch_state_dict(
    state_dict: Dict[str, Any],
    landmark_scope: str = "landmark",
    strict: bool = False,
) -> TorchImport:
    """Convert a reference Part-fViT state_dict → TorchImport(params, stats).

    Handles: stn (MobileNetV3), output_layer, patch_to_embedding, cls/pos
    tokens, transformer layers, mlp_head LayerNorm, CosFace loss weight,
    DINOHead mlp + weight-norm last layer (bare or under a ``head.`` scope —
    the MultiCropWrapper layout), global_token.

    ``strict=True`` raises if any non-buffer key was not mapped — a typo'd
    or novel dialect must fail loudly, not yield a half-initialized model.
    """
    sd = strip_prefixes(state_dict)
    params: dict = {}
    stats: dict = {}
    consumed: set = set()
    buffers: set = set()
    for k, v in sd.items():
        if k.endswith(_IGNORED_BUFFER_SUFFIXES):
            buffers.add(k)
            continue
        arr = _t(v)
        ok = True
        if k.startswith("stn."):
            ok = _convert_stn(k, v, params, stats, (landmark_scope,))
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
            ok = _convert_transformer(k, arr, params)
        elif k.startswith("mlp_head.0."):
            # Part-fViT: LayerNorm (weight/bias); overlap variant:
            # BatchNorm1d — same scale/bias naming in flax, running stats
            # land in batch_stats (ViT_face.py:1530 vs :630)
            if k.endswith("running_mean"):
                _set(stats, ("mlp_head", "mean"), arr)
            elif k.endswith("running_var"):
                _set(stats, ("mlp_head", "var"), arr)
            elif k.endswith("num_batches_tracked"):
                pass
            else:
                leaf = "scale" if k.endswith("weight") else "bias"
                _set(params, ("mlp_head", leaf), arr)
        elif k.startswith("loss.weight"):
            _set(params, ("loss", "weight"), arr)
        elif k.startswith("mlp.") or k.startswith("last_layer."):
            ok = _convert_dino_head(k, arr, params)
        elif k.startswith("head."):
            # MultiCropWrapper student/teacher: DINOHead under 'head.'
            ok = _convert_dino_head(k[len("head."):], arr, params, scope=("head",))
        else:
            ok = False
        if ok:
            consumed.add(k)
    skipped = set(sd) - consumed - buffers
    if strict and skipped:
        raise ValueError(
            f"import_torch_state_dict(strict): {len(skipped)} unmapped "
            f"non-buffer keys: {sorted(skipped)}"
        )
    return TorchImport(params, stats, consumed, skipped, buffers)


def import_dino_vit_state_dict(
    state_dict: Dict[str, Any], strict: bool = False
) -> TorchImport:
    """DINO VisionTransformer dialect → ``models/dino_vit.py`` tree.

    Covers the reference's ``vision_transformer.py:27-262`` and the official
    DINO checkpoints (``--arch vit_*``): cls_token/pos_embed,
    ``patch_embed.proj`` conv, ``blocks.N.{norm1,attn.qkv,attn.proj,norm2,
    mlp.fc1,mlp.fc2}``, the final ``norm`` and optional ``head`` Dense.
    """
    sd = strip_prefixes(state_dict)
    params: dict = {}
    consumed: set = set()
    buffers: set = set()
    for k, v in sd.items():
        if k.endswith(_IGNORED_BUFFER_SUFFIXES):
            buffers.add(k)
            continue
        arr = _t(v)
        ok = True
        m = re.match(r"blocks\.(\d+)\.(.*)", k)
        if k == "cls_token":
            _set(params, ("cls_token",), arr)
        elif k == "pos_embed":
            _set(params, ("pos_embed",), arr)
        elif k == "patch_embed.proj.weight":
            _set(params, ("patch_embed", "kernel"), arr.transpose(2, 3, 1, 0))
        elif k == "patch_embed.proj.bias":
            _set(params, ("patch_embed", "bias"), arr)
        elif k.startswith("norm."):
            _set(params, ("norm", "scale" if k.endswith("weight") else "bias"), arr)
        elif k in ("head.weight", "head.bias"):
            # EXACT keys only: the flax head is one Dense. A multi-layer
            # 'head.*' (a full DINO teacher's MultiCropWrapper projection
            # head — head.mlp.N / head.last_layer.weight_{g,v}) must stay
            # unmapped so strict mode raises instead of silently collapsing
            # those tensors into one kernel/bias pair
            leaf = "kernel" if k.endswith("weight") else "bias"
            _set(params, ("head", leaf), arr.T if leaf == "kernel" else arr)
        elif m:
            i, rest = int(m.group(1)), m.group(2)
            base = (f"block_{i}",)
            if rest.startswith(("norm1.", "norm2.")):
                mod = rest.split(".")[0]
                leaf = "scale" if rest.endswith("weight") else "bias"
                _set(params, base + (mod, leaf), arr)
            elif rest.startswith(("attn.qkv.", "attn.proj.")):
                mod = rest.split(".")[1]
                leaf = "kernel" if rest.endswith("weight") else "bias"
                _set(params, base + ("attn", mod, leaf),
                     arr.T if leaf == "kernel" else arr)
            elif rest.startswith(("mlp.fc1.", "mlp.fc2.")):
                mod = rest.split(".")[1]
                leaf = "kernel" if rest.endswith("weight") else "bias"
                _set(params, base + (mod, leaf),
                     arr.T if leaf == "kernel" else arr)
            else:
                ok = False
        else:
            ok = False
        if ok:
            consumed.add(k)
    skipped = set(sd) - consumed - buffers
    if strict and skipped:
        raise ValueError(
            f"import_dino_vit_state_dict(strict): {len(skipped)} unmapped "
            f"non-buffer keys: {sorted(skipped)}"
        )
    return TorchImport(params, {}, consumed, skipped, buffers)


def import_iresnet_state_dict(
    state_dict: Dict[str, Any], strict: bool = False,
    features_scale: bool | None = None,
) -> TorchImport:
    """insightface iResNet dialect (``face_pre_pro/iresnet.py``) →
    ``models/iresnet.py`` tree.

    Quirks handled: NCHW→NHWC flatten before ``fc`` (the (D, 512·7·7)
    weight is permuted channel-major → HWC-major), the ``features`` BN
    scale, ``downsample`` Sequential → conv/bn pair.

    ``features_scale`` mirrors the model flag: whether the target model's
    ``features`` BN has a scale param. Default ``None`` infers it from the
    checkpoint DIALECT, never from values: the avg-pool variant
    (``IResNet_withloss_avg``, no ``fc`` layer) trains its scale
    (``requires_grad=False`` is commented out, reference
    ``iresnet.py:385-386``) and matches our ``avg_pool=True`` default of
    ``use_scale=True`` — mapped even when still all-ones; the fc variant
    freezes it at 1.0 and matches ``use_scale=False`` — dropped, with a
    loud error if it unexpectedly drifted.
    """
    sd = strip_prefixes(state_dict)
    if features_scale is None:
        # avg-variant checkpoints have no fc layer (pool → features BN)
        features_scale = "fc.weight" not in sd
    params: dict = {}
    stats: dict = {}
    consumed: set = set()
    buffers: set = set()

    def bn(scope, rest, arr):
        if rest == "weight":
            _set(params, scope + ("scale",), arr)
        elif rest == "bias":
            _set(params, scope + ("bias",), arr)
        elif rest == "running_mean":
            _set(stats, scope + ("mean",), arr)
        elif rest == "running_var":
            _set(stats, scope + ("var",), arr)
        else:
            return False
        return True

    for k, v in sd.items():
        if k.endswith(_IGNORED_BUFFER_SUFFIXES):
            buffers.add(k)
            continue
        arr = _t(v)
        ok = True
        m = re.match(r"layer(\d+)\.(\d+)\.(.*)", k)
        if k == "conv1.weight":
            _set(params, ("conv1", "kernel"), arr.transpose(2, 3, 1, 0))
        elif k.startswith("bn1.") or k.startswith("bn2."):
            ok = bn((k.split(".")[0], "bn"), k.split(".", 1)[1], arr)
        elif k == "prelu.weight":
            _set(params, ("prelu", "alpha"), arr)
        elif k == "fc.weight":
            d, flat = arr.shape
            hw = flat // 512
            side = int(round(hw ** 0.5))
            # torch flattens NCHW (c, h, w); ours flattens NHWC (h, w, c)
            w = arr.reshape(d, 512, side, side).transpose(0, 2, 3, 1)
            _set(params, ("fc", "kernel"), w.reshape(d, flat).T)
        elif k == "fc.bias":
            _set(params, ("fc", "bias"), arr)
        elif k.startswith("features."):
            rest = k.split(".", 1)[1]
            if rest == "weight":
                if features_scale:
                    _set(params, ("features", "scale"), arr)
                elif not np.allclose(arr, 1.0):
                    raise ValueError(
                        "import_iresnet_state_dict: checkpoint has a "
                        "trained features-BN scale but the target layout "
                        "has use_scale=False; build the model with "
                        "features_scale=True (or pass features_scale=True "
                        "here) to consume it"
                    )
            elif rest == "bias":
                _set(params, ("features", "bias"), arr)
            elif rest == "running_mean":
                _set(stats, ("features", "mean"), arr)
            elif rest == "running_var":
                _set(stats, ("features", "var"), arr)
            else:
                ok = False
        elif m:
            stage, blk, rest = m.group(1), m.group(2), m.group(3)
            base = (f"layer{stage}_{blk}",)
            if rest.startswith(("bn1.", "bn2.", "bn3.")):
                mod, leaf = rest.split(".", 1)
                ok = bn(base + (mod, "bn"), leaf, arr)
            elif rest in ("conv1.weight", "conv2.weight"):
                _set(params, base + (rest.split(".")[0], "kernel"),
                     arr.transpose(2, 3, 1, 0))
            elif rest == "prelu.weight":
                _set(params, base + ("prelu", "alpha"), arr)
            elif rest == "downsample.0.weight":
                _set(params, base + ("downsample_conv", "kernel"),
                     arr.transpose(2, 3, 1, 0))
            elif rest.startswith("downsample.1."):
                ok = bn(base + ("downsample_bn", "bn"),
                        rest[len("downsample.1."):], arr)
            else:
                ok = False
        else:
            ok = False
        if ok:
            consumed.add(k)
    skipped = set(sd) - consumed - buffers
    if strict and skipped:
        raise ValueError(
            f"import_iresnet_state_dict(strict): {len(skipped)} unmapped "
            f"non-buffer keys: {sorted(skipped)}"
        )
    return TorchImport(params, stats, consumed, skipped, buffers)


def _convert_transformer(key: str, arr: np.ndarray, params: dict) -> bool:
    # transformer.layers.{i}.{0|1}.fn.{norm|fn}.<rest>
    m = re.match(r"transformer\.layers\.(\d+)\.(\d)\.fn\.(.*)", key)
    if not m:
        return False
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
        else:
            return False
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
        else:
            return False
    return True


def _convert_dino_head(key: str, arr: np.ndarray, params: dict, scope=()) -> bool:
    """DINOHead: mlp.{0,2,4}.{weight,bias} + last_layer.weight_{g,v}
    (``vision_transformer.py:265-301``; torch Sequential Linear/GELU).
    ``scope`` prefixes the target path (e.g. ('head',) for the
    MultiCropWrapper layout)."""
    m = re.match(r"mlp\.(\d+)\.(weight|bias)", key)
    if m:
        idx = int(m.group(1))
        mlp_i = idx // 2  # Linear at 0, 2, 4 with GELUs between
        leaf = "kernel" if m.group(2) == "weight" else "bias"
        _set(params, scope + (f"mlp_{mlp_i}", leaf), arr.T if leaf == "kernel" else arr)
        return True
    if key == "last_layer.weight_g":
        _set(params, scope + ("last_layer_g",), arr.reshape(-1, 1))
        return True
    if key == "last_layer.weight_v":
        _set(params, scope + ("last_layer_v",), arr)
        return True
    # torch >=2 parametrized weight_norm dialect
    if key == "last_layer.parametrizations.weight.original0":
        _set(params, scope + ("last_layer_g",), arr.reshape(-1, 1))
        return True
    if key == "last_layer.parametrizations.weight.original1":
        _set(params, scope + ("last_layer_v",), arr)
        return True
    return False


def load_landmark_variables(path: str, landmark_vars: dict, log=print) -> dict:
    """Load pretrained landmark-CNN weights into the frozen provider tree
    (the SSL/SimMIM ``--landmark-path`` flag — reference
    ``load_part_checkpoint_landmark``, ``lafs_train.py:124-154``).

    ``.pth``: torch dialect, partial-loaded to the stn/output_layer scopes.
    Orbax directory: any of our layouts via :func:`restore_eval_variables`;
    the checkpoint's params must carry a ``landmark`` subtree (i.e. a
    ``with_land`` Part-fViT training run — the reference's stage-1 model).
    Anything else RAISES: a silently random-init landmark CNN poisons the
    whole SSL recipe (patch positions jump chaotically between crops), so
    an unloadable path must never be skipped quietly.
    """
    if path.endswith(".pth"):
        sd = load_torch_file(path)
        imp = import_torch_state_dict(sd)
        log(f"[import landmark ckpt] {imp.summary()}")
        params, stats = imp
        merged = {
            "params": merge_params(
                landmark_vars["params"], params, ["stn", "output"]
            ),
            "batch_stats": merge_params(
                landmark_vars.get("batch_stats", {}), stats, ["stn"]
            ),
        }
        _check_landmark_coverage(
            landmark_vars, merged, path,
            # partial load: only the stn/output_layer scopes must be covered
            keep=lambda p: any(s in "/".join(p) for s in ("stn", "output")),
        )
        return merged
    if os.path.isdir(path):
        variables, step = restore_eval_variables(path)
        if "landmark" not in variables.get("params", {}):
            raise ValueError(
                f"checkpoint {path} has no 'landmark' subtree — the frozen "
                "landmark provider needs a with_land Part-fViT checkpoint "
                "(train the supervised stage-1 model first, or pass the "
                "reference's .pth)"
            )
        log(f"[import landmark ckpt] orbax step {step}: landmark subtree "
            f"from {path}")
        unmatched: list = []
        merged = {
            "params": merge_params(
                landmark_vars["params"],
                {"landmark": variables["params"]["landmark"]},
                unmatched=unmatched,
            ),
            "batch_stats": merge_params(
                landmark_vars.get("batch_stats", {}),
                {"landmark": variables.get("batch_stats", {}).get(
                    "landmark", {})},
                unmatched=unmatched,
            ),
        }
        if unmatched:
            raise ValueError(
                f"checkpoint {path}: {len(unmatched)} landmark leaves have "
                "no counterpart in the provider tree (structural mismatch — "
                "e.g. the checkpoint's stn_mode differs from the SSL "
                f"config's). First few: {unmatched[:5]}"
            )
        _check_landmark_coverage(landmark_vars, merged, path)
        return merged
    raise ValueError(
        f"--landmark-path {path!r}: expected a torch .pth file or an orbax "
        "checkpoint directory"
    )


def _check_landmark_coverage(provider_vars: dict, merged: dict, path: str,
                             keep=None) -> None:
    """Verify every provider landmark leaf was OVERWRITTEN by the merge.

    ``merge_params`` silently skips update paths absent from the base tree,
    so a structurally mismatched checkpoint (different stn_mode, missing
    batch_stats) could merge as a partial/total no-op and leave the frozen
    provider at random init — the silent failure the reference avoids with
    ``load_state_dict(strict=True)`` (``lafs_train.py:124-154``). We compare
    merged values against the provider's inits: an unchanged leaf means the
    checkpoint never supplied it. ``keep`` optionally restricts which
    provider paths must be covered (the .pth partial load only promises the
    stn/output_layer scopes)."""
    stale = []
    for col in ("params", "batch_stats"):
        base = _flatten(provider_vars.get(col, {}) or {})
        new = _flatten(merged.get(col, {}) or {})
        for p, old in base.items():
            if keep is not None and not keep(p):
                continue
            v = new.get(p)
            if v is old:  # merge_params keeps the identical object on skip
                stale.append(f"{col}/" + "/".join(p))
    if stale:
        raise ValueError(
            f"checkpoint {path}: {len(stale)} provider landmark leaves were "
            "NOT overwritten (checkpoint structurally incomplete for this "
            "config — stn_mode mismatch or missing batch_stats?). The frozen "
            "landmark CNN would keep random init, silently poisoning the SSL "
            f"recipe. First few: {stale[:5]}"
        )


def merge_params(base: dict, update: dict, filter_substrings=None,
                 unmatched: Optional[list] = None) -> dict:
    """Overlay ``update`` onto ``base``, optionally only for paths containing
    any of ``filter_substrings`` (the ['stn','output'] partial load of
    ``load_part_checkpoint_landmark``, ``lafs_train.py:124-154``).

    ``unmatched``: optional list; update paths that exist nowhere in ``base``
    (missing-in-model) are appended as '/'-joined strings for diagnostics.
    """
    flat_u = _flatten(update)
    flat_b = _flatten(base)
    for path, val in flat_u.items():
        if filter_substrings is not None and not any(
            s in "/".join(path) for s in filter_substrings
        ):
            continue
        if path in flat_b:
            if flat_b[path].shape != val.shape:
                raise ValueError(
                    f"shape mismatch at {'/'.join(path)}: model has "
                    f"{flat_b[path].shape}, checkpoint has {val.shape}"
                )
            flat_b[path] = val
        elif unmatched is not None:
            unmatched.append("/".join(path))
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


# ---------------------------------------------------------------------------
# Reverse interop: flax → reference torch state_dict
# ---------------------------------------------------------------------------

# inverse of _BOTTLENECK_MAP: our module name → torch Sequential index inside
# MobileBottleneck.conv (reference mobilenet.py:96-109)
_BOTTLENECK_INV = {
    "pw": ("0", "conv"),
    "pw_norm": ("1", "bn"),
    "dw": ("3", "conv"),
    "dw_norm": ("4", "bn"),
    "pw_linear": ("7", "conv"),
    "pw_linear_norm": ("8", "bn"),
}


def _np32(x) -> np.ndarray:
    v = np.asarray(x)
    # torch has no numpy-bfloat16 bridge; normalize all non-f32 floats
    if v.dtype.name in ("bfloat16", "float16", "float64"):
        v = v.astype(np.float32)
    return v


def _export_conv_kernel(arr: np.ndarray) -> np.ndarray:
    # flax (H,W,I,O) → torch (O,I,H,W); depthwise (H,W,1,O) lands on
    # (O,1,H,W) the same way — the exact inverse of _emit's transpose
    return arr.transpose(3, 2, 0, 1)


def _export_stn(path: Tuple[str, ...], arr: np.ndarray, out: Dict[str, np.ndarray]) -> bool:
    """Inverse of ``_convert_stn``: (stn, stem/block_i, …) → stn.features.*"""
    if path[0] != "stn":
        return False
    rest = path[1:]
    if rest[0] == "stem":
        # stem: features.0.0 conv / features.0.1 bn
        if rest[1] == "conv" and rest[2] == "kernel":
            out["stn.features.0.0.weight"] = _export_conv_kernel(arr)
            return True
        if rest[1] == "norm" and rest[2] == "bn":
            leaf = {"scale": "weight", "bias": "bias",
                    "mean": "running_mean", "var": "running_var"}.get(rest[3])
            if leaf is None:
                return False
            out[f"stn.features.0.1.{leaf}"] = arr
            return True
        return False
    m = re.match(r"block_(\d+)$", rest[0])
    if not m:
        return False
    base = f"stn.features.{int(m.group(1)) + 1}.conv"
    if rest[1] == "se":
        # SEModule fc: Linear(bias=False) at fc.0 / fc.2 (mobilenet.py:47-53)
        fc = {"fc1": "0", "fc2": "2"}.get(rest[2])
        if fc is None or rest[3] != "kernel":
            return False
        out[f"{base}.5.fc.{fc}.weight"] = arr.T
        return True
    sub = _BOTTLENECK_INV.get(rest[1])
    if sub is None:
        return False
    idx, kind = sub
    if kind == "conv":
        if rest[2] == "kernel":
            out[f"{base}.{idx}.weight"] = _export_conv_kernel(arr)
            return True
        if rest[2] == "bias":
            out[f"{base}.{idx}.bias"] = arr
            return True
        return False
    if rest[2] != "bn":
        return False
    leaf = {"scale": "weight", "bias": "bias",
            "mean": "running_mean", "var": "running_var"}.get(rest[3])
    if leaf is None:
        return False
    out[f"{base}.{idx}.{leaf}"] = arr
    return True


def _export_transformer(path: Tuple[str, ...], arr: np.ndarray, out: Dict[str, np.ndarray]) -> bool:
    """Inverse of ``_convert_transformer``: (transformer, layers_i, …) →
    transformer.layers.{i}.{0|1}.fn.… (reference ViT_face.py:100-213
    Residual(PreNorm(fn)) Sequential layout)."""
    m = re.match(r"layers_(\d+)$", path[1])
    if not m:
        return False
    i, rest = int(m.group(1)), path[2:]
    pre = f"transformer.layers.{i}"
    if rest[0] == "norm1" and rest[1] in ("scale", "bias"):
        out[f"{pre}.0.fn.norm.{'weight' if rest[1] == 'scale' else 'bias'}"] = arr
        return True
    if rest[0] == "norm2" and rest[1] in ("scale", "bias"):
        out[f"{pre}.1.fn.norm.{'weight' if rest[1] == 'scale' else 'bias'}"] = arr
        return True
    if rest[0] == "attn":
        if rest[1] == "to_qkv" and rest[2] == "kernel":
            out[f"{pre}.0.fn.fn.to_qkv.weight"] = arr.T
            return True
        if rest[1] == "to_out":
            if rest[2] == "kernel":
                out[f"{pre}.0.fn.fn.to_out.0.weight"] = arr.T
                return True
            if rest[2] == "bias":
                out[f"{pre}.0.fn.fn.to_out.0.bias"] = arr
                return True
        return False
    if rest[0] == "mlp":
        idx = {"fc1": "0", "fc2": "3"}.get(rest[1])
        if idx is None:
            return False
        if rest[2] == "kernel":
            out[f"{pre}.1.fn.fn.net.{idx}.weight"] = arr.T
            return True
        if rest[2] == "bias":
            out[f"{pre}.1.fn.fn.net.{idx}.bias"] = arr
            return True
    return False


def _export_dino_head(path: Tuple[str, ...], arr: np.ndarray,
                      out: Dict[str, np.ndarray], prefix: str = "") -> bool:
    """Inverse of ``_convert_dino_head``: mlp_i → mlp.{2i} (Linear at 0/2/4
    with GELUs between), last_layer_{g,v} → weight-norm ``weight_{g,v}``."""
    m = re.match(r"mlp_(\d+)$", path[0])
    if m and path[1] in ("kernel", "bias"):
        idx = 2 * int(m.group(1))
        leaf = "weight" if path[1] == "kernel" else "bias"
        out[f"{prefix}mlp.{idx}.{leaf}"] = arr.T if leaf == "weight" else arr
        return True
    if path[0] == "last_layer_g":
        out[f"{prefix}last_layer.weight_g"] = arr.reshape(-1, 1)
        return True
    if path[0] == "last_layer_v":
        out[f"{prefix}last_layer.weight_v"] = arr
        return True
    return False


def export_torch_state_dict(
    params: Dict[str, Any],
    batch_stats: Optional[Dict[str, Any]] = None,
    landmark_scope: str = "landmark",
    strict: bool = True,
) -> Dict[str, np.ndarray]:
    """Convert a Part-fViT-family flax tree → a reference torch state_dict.

    The exact inverse of ``import_torch_state_dict`` (round-trip is
    bit-exact, tested): a user migrating back — or cross-checking with the
    reference's own ``IJB_evaluation.py`` — gets a state_dict the reference
    classes load with ``strict=True``. Emits the prefix-stripped dialect
    (no ``module./backbone.``, the form every reference loader normalizes
    to via its prefix surgery, ``train_largescale.py:639-648``); DINOHead
    params under a ``head`` scope export as ``head.*`` (the
    MultiCropWrapper layout, ``utils.py:594``). ``num_batches_tracked``
    buffers (zeros) accompany every BatchNorm with exported running stats
    so torch's strict load is satisfied.

    Covers what the importer covers: stn (MobileNetV3), output_layer,
    global_token, cls/pos/mask tokens, patch_to_embedding, transformer,
    mlp_head (LayerNorm, or BatchNorm1d when running stats are present),
    CosFace/margin ``loss.weight``, DINOHead. Unknown paths raise
    (``strict=False`` drops them — only for deliberately partial exports).
    """
    out: Dict[str, np.ndarray] = {}
    unmapped: list = []

    def walk(flat, is_stats):
        for path, val in sorted(flat.items()):
            arr = _np32(val)
            ok = False
            if path[0] == landmark_scope and len(path) > 1:
                sub = path[1:]
                if sub[0] == "output_layer" and sub[1] in ("kernel", "bias"):
                    leaf = "weight" if sub[1] == "kernel" else "bias"
                    out[f"output_layer.{leaf}"] = arr.T if leaf == "weight" else arr
                    ok = True
                else:
                    ok = _export_stn(sub, arr, out)
            elif path[0] == "stn":
                ok = _export_stn(path, arr, out)
            elif path == ("cls_token",):
                out["cls_token"] = arr
                ok = True
            elif path == ("pos_embedding",):
                out["pos_embedding"] = arr
                ok = True
            elif path == ("mask_token",):
                out["mask_token"] = arr
                ok = True
            elif path[0] == "global_token" and path[1] in ("kernel", "bias"):
                leaf = "weight" if path[1] == "kernel" else "bias"
                out[f"global_token.{leaf}"] = arr.T if leaf == "weight" else arr
                ok = True
            elif path[0] == "output_layer" and path[1] in ("kernel", "bias"):
                # mobile_dino trees keep stn/output_layer at the TOP level
                # (ViT_face.py:1203-1217), not under the landmark scope
                leaf = "weight" if path[1] == "kernel" else "bias"
                out[f"output_layer.{leaf}"] = arr.T if leaf == "weight" else arr
                ok = True
            elif path[0] == "patch_to_embedding" and path[1] in ("kernel", "bias"):
                leaf = "weight" if path[1] == "kernel" else "bias"
                out[f"patch_to_embedding.{leaf}"] = arr.T if leaf == "weight" else arr
                ok = True
            elif path[0] == "transformer" and len(path) >= 3:
                ok = _export_transformer(path, arr, out)
            elif path[0] == "mlp_head":
                leaf = {"scale": "weight", "bias": "bias",
                        "mean": "running_mean", "var": "running_var"}.get(path[1])
                if leaf is not None:
                    out[f"mlp_head.0.{leaf}"] = arr
                    ok = True
            elif path == ("loss", "weight"):
                out["loss.weight"] = arr
                ok = True
            elif path[0] == "head" and len(path) > 1:
                ok = _export_dino_head(path[1:], arr, out, prefix="head.")
            else:
                ok = _export_dino_head(path, arr, out)
            if not ok:
                unmapped.append(("batch_stats/" if is_stats else "params/")
                                + "/".join(path))

    walk(_flatten(params), False)
    if batch_stats:
        walk(_flatten(batch_stats), True)
    if unmapped and strict:
        raise ValueError(
            f"export_torch_state_dict: {len(unmapped)} paths have no "
            f"reference mapping: {sorted(unmapped)[:12]}"
            f"{'…' if len(unmapped) > 12 else ''}"
        )
    # torch strict loads require the num_batches_tracked buffer beside every
    # BatchNorm that tracks running stats
    for k in [k for k in out if k.endswith("running_mean")]:
        out[k[: -len("running_mean")] + "num_batches_tracked"] = np.array(0, np.int64)
    return out


def export_dino_vit_state_dict(
    params: Dict[str, Any], strict: bool = True
) -> Dict[str, np.ndarray]:
    """``models/dino_vit.py`` tree → the DINO VisionTransformer torch
    dialect (inverse of :func:`import_dino_vit_state_dict`) — so a vanilla
    ``--arch vit_*`` SSL teacher trained here loads into the reference's
    ``vision_transformer.py:135-262`` classes (and the official DINO
    tooling) with ``strict=True``.

    Covers cls_token/pos_embed, the ``patch_embed.proj`` conv (NHWC kernel
    → OIHW), ``blocks.N.{norm1,attn.qkv,attn.proj,norm2,mlp.fc1,mlp.fc2}``,
    the final ``norm`` and the optional ``head`` Dense. Unknown paths raise
    under ``strict`` (``False`` drops them)."""
    out: Dict[str, np.ndarray] = {}
    unmapped: list = []
    for path, val in sorted(_flatten(params).items()):
        arr = _np32(val)
        ok = False
        if path == ("cls_token",):
            out["cls_token"] = arr
            ok = True
        elif path == ("pos_embed",):
            out["pos_embed"] = arr
            ok = True
        elif path[0] == "patch_embed" and path[1] in ("kernel", "bias"):
            if path[1] == "kernel":
                out["patch_embed.proj.weight"] = arr.transpose(3, 2, 0, 1)
            else:
                out["patch_embed.proj.bias"] = arr
            ok = True
        elif path[0] == "norm" and path[1] in ("scale", "bias"):
            leaf = "weight" if path[1] == "scale" else "bias"
            out[f"norm.{leaf}"] = arr
            ok = True
        elif path[0] == "head" and path[1] in ("kernel", "bias"):
            leaf = "weight" if path[1] == "kernel" else "bias"
            out[f"head.{leaf}"] = arr.T if leaf == "weight" else arr
            ok = True
        elif path[0].startswith("block_") and len(path) >= 3:
            base = f"blocks.{int(path[0].split('_', 1)[1])}"
            sub = path[1:]
            if sub[0] in ("norm1", "norm2") and sub[1] in ("scale", "bias"):
                leaf = "weight" if sub[1] == "scale" else "bias"
                out[f"{base}.{sub[0]}.{leaf}"] = arr
                ok = True
            elif (sub[0] == "attn" and sub[1] in ("qkv", "proj")
                    and sub[2] in ("kernel", "bias")):
                leaf = "weight" if sub[2] == "kernel" else "bias"
                out[f"{base}.attn.{sub[1]}.{leaf}"] = (
                    arr.T if leaf == "weight" else arr
                )
                ok = True
            elif sub[0] in ("fc1", "fc2") and sub[1] in ("kernel", "bias"):
                leaf = "weight" if sub[1] == "kernel" else "bias"
                out[f"{base}.mlp.{sub[0]}.{leaf}"] = (
                    arr.T if leaf == "weight" else arr
                )
                ok = True
        if not ok:
            unmapped.append("params/" + "/".join(path))
    if unmapped and strict:
        raise ValueError(
            f"export_dino_vit_state_dict: {len(unmapped)} paths have no "
            f"reference mapping: {sorted(unmapped)[:12]}"
            f"{'…' if len(unmapped) > 12 else ''}"
        )
    return out


def export_iresnet_state_dict(
    params: Dict[str, Any], batch_stats: Optional[Dict[str, Any]] = None,
    strict: bool = True,
) -> Dict[str, np.ndarray]:
    """``models/iresnet.py`` tree → the insightface iResNet torch dialect
    (inverse of :func:`import_iresnet_state_dict`) — a TPU-held iResNet
    loads into ``face_pre_pro/iresnet.py`` / insightface tooling with
    ``strict=True``.

    Inversions: NHWC conv kernels → OIHW; the fc weight's NHWC-major
    flatten → torch's NCHW-major; ``layerS_B`` scopes → ``layerS.B``;
    ``downsample_{conv,bn}`` → the ``downsample.{0,1}`` Sequential. A
    scale-less ``features`` BN (the canonical frozen-at-1 fc head) emits
    ``features.weight`` = ones so torch's strict load is satisfied;
    ``num_batches_tracked`` zeros accompany every exported running stat."""
    out: Dict[str, np.ndarray] = {}
    unmapped: list = []

    def bn_leaf(leaf):
        return {"scale": "weight", "bias": "bias",
                "mean": "running_mean", "var": "running_var"}.get(leaf)

    def walk(flat, is_stats):
        for path, val in sorted(flat.items()):
            arr = _np32(val)
            ok = False
            m = re.match(r"layer(\d+)_(\d+)$", path[0])
            if path == ("conv1", "kernel"):
                out["conv1.weight"] = arr.transpose(3, 2, 0, 1)
                ok = True
            elif path[0] in ("bn1", "bn2") and path[1] == "bn":
                leaf = bn_leaf(path[2])
                if leaf:
                    out[f"{path[0]}.{leaf}"] = arr
                    ok = True
            elif path == ("prelu", "alpha"):
                out["prelu.weight"] = arr
                ok = True
            elif path == ("fc", "kernel"):
                flat_in, d = arr.shape
                side = math.isqrt(flat_in // 512)
                # ours flattens NHWC (h, w, c); torch flattens NCHW
                w = arr.T.reshape(d, side, side, 512).transpose(0, 3, 1, 2)
                out["fc.weight"] = np.ascontiguousarray(w.reshape(d, flat_in))
                ok = True
            elif path == ("fc", "bias"):
                out["fc.bias"] = arr
                ok = True
            elif path[0] == "features":
                leaf = bn_leaf(path[1])
                if leaf:
                    out[f"features.{leaf}"] = arr
                    ok = True
            elif m and len(path) >= 3:
                base = f"layer{m.group(1)}.{m.group(2)}"
                sub = path[1:]
                if sub[0] in ("bn1", "bn2", "bn3") and sub[1] == "bn":
                    leaf = bn_leaf(sub[2])
                    if leaf:
                        out[f"{base}.{sub[0]}.{leaf}"] = arr
                        ok = True
                elif sub[0] in ("conv1", "conv2") and sub[1] == "kernel":
                    out[f"{base}.{sub[0]}.weight"] = arr.transpose(3, 2, 0, 1)
                    ok = True
                elif sub == ("prelu", "alpha"):
                    out[f"{base}.prelu.weight"] = arr
                    ok = True
                elif sub == ("downsample_conv", "kernel"):
                    out[f"{base}.downsample.0.weight"] = arr.transpose(
                        3, 2, 0, 1)
                    ok = True
                elif sub[0] == "downsample_bn" and sub[1] == "bn":
                    leaf = bn_leaf(sub[2])
                    if leaf:
                        out[f"{base}.downsample.1.{leaf}"] = arr
                        ok = True
            if not ok:
                unmapped.append(("batch_stats/" if is_stats else "params/")
                                + "/".join(path))

    walk(_flatten(params), False)
    if batch_stats:
        walk(_flatten(batch_stats), True)
    if unmapped and strict:
        raise ValueError(
            f"export_iresnet_state_dict: {len(unmapped)} paths have no "
            f"reference mapping: {sorted(unmapped)[:12]}"
            f"{'…' if len(unmapped) > 12 else ''}"
        )
    if "features.weight" not in out and "features.bias" in out:
        # use_scale=False layout: the torch BN still owns a weight —
        # frozen at 1 in the reference (iresnet.py:171-173)
        out["features.weight"] = np.ones_like(out["features.bias"])
    for k in [k for k in out if k.endswith("running_mean")]:
        out[k[: -len("running_mean")] + "num_batches_tracked"] = np.array(
            0, np.int64)
    return out


def save_torch_state_dict(sd: Dict[str, np.ndarray], path: str) -> None:
    """Write an exported state_dict as a ``.pth`` (torch available) or
    ``.npz`` (fallback) file. The ``.pth`` form loads directly into the
    reference classes; the ``.npz`` form holds the same key→array mapping."""
    try:
        import torch

        torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                    for k, v in sd.items()}, path)
    except ImportError:
        np.savez(path if path.endswith(".npz") else path + ".npz", **sd)
