"""SimMIM masked-image-modeling pretraining for Part-fViT.

The reference ships SimMIM MODEL variants (``ViT_face_landmark_patch8_4simmin``
etc., ``ViT_face.py:797-1202``) and checkpoint importers for their
``encoder.``-prefixed weights (``load_part_checkpoint_landmark_fromsimmim``,
``train_largescale.py:274-315``) but trains them with the external SimMIM
repo. This module completes the capability TPU-natively: random patch
masking, mask-token blending in the backbone (``PartFViTConfig(simmim=True)``),
a linear reconstruction head, and L1 loss on masked patches only — the
SimMIM objective (arXiv 2111.09886) — as one jitted SPMD step.

Patches come from the frozen landmark provider (landmark-conditioned MIM,
the reference's `4simmin_glo_loc` setup) or a fixed grid.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..models.partfvit import LandmarkProvider, PartFViT, PartFViTConfig
from .optim import (
    AdamWState,
    adamw_init,
    adamw_update,
    clip_grads_global,
    dino_wd_mask,
    zero1_adamw_update,
    zero1_init,
)


@dataclass(frozen=True)
class SimMIMConfig:
    model: PartFViTConfig = field(
        default_factory=lambda: PartFViTConfig(
            with_land=False, loss_type="None", num_classes=0, simmim=True
        )
    )
    mask_ratio: float = 0.6
    clip_grad: float = 5.0
    input_scale: Any = None  # 'unit'/'half': images arrive RAW uint8 and
                             # are scaled ON DEVICE (4× less host→device
                             # transfer than shipping float32)
    compute_dtype: Any = jnp.bfloat16
    moment_dtype: Any = jnp.float32  # AdamW moment storage (math stays fp32)
    use_landmarks: bool = True  # gather patches at predicted landmarks
    zero1: bool = False  # ZeRO-1 moment sharding over the data axis (see
                         # train/supervised.py); the global grad clip is
                         # assembled as one scalar psum of chunk sq-sums.
                         # Requires n_data > 1 and create_simmim_state(...,
                         # zero1_shards=n_data)


class SimMIMTrainState(NamedTuple):
    params: Any          # {"backbone": ..., "decoder": ...}
    opt_state: Any
    step: jnp.ndarray
    rng: jnp.ndarray


def _cast(tree, dtype):
    return jax.tree_util.tree_map(
        lambda p: p.astype(dtype) if jnp.issubdtype(p.dtype, jnp.floating) else p,
        tree,
    )


def _backbone(cfg: SimMIMConfig) -> PartFViT:
    return PartFViT(
        PartFViTConfig(
            **{**cfg.model.__dict__, "with_land": False, "loss_type": "None",
               "simmim": True}
        )
    )


def create_simmim_state(
    cfg: SimMIMConfig, rng: jax.Array, zero1_shards: int = 0
) -> SimMIMTrainState:
    backbone = _backbone(cfg)
    patch_dim = 3 * cfg.model.patch_size ** 2
    k1, k2, k3 = jax.random.split(rng, 3)
    tokens = jnp.zeros((2, cfg.model.num_patches, patch_dim))
    bb = backbone.init(
        {"params": k1, "dropout": k1}, tokens, return_tokens=True
    )["params"]
    # linear reconstruction head token → patch pixels (SimMIM's 1-layer head)
    dec = {
        "kernel": jax.nn.initializers.truncated_normal(0.02)(
            k2, (cfg.model.dim, patch_dim), jnp.float32
        ),
        "bias": jnp.zeros((patch_dim,), jnp.float32),
    }
    params = {"backbone": bb, "decoder": dec}
    if zero1_shards > 1:
        opt_state = zero1_init(params, zero1_shards, moment_dtype=cfg.moment_dtype)
    else:
        opt_state = adamw_init(params, moment_dtype=cfg.moment_dtype)
    return SimMIMTrainState(
        params=params,
        opt_state=opt_state,
        step=jnp.zeros((), jnp.int32),
        rng=k3,
    )


def make_simmim_train_step(cfg: SimMIMConfig, mesh: Mesh, donate: bool = False) -> Callable:
    """Returns ``step_fn(state, landmark_vars, images, lr, wd) ->
    (state, metrics)``; images (B, H, W, 3) in [-1, 1], batch sharded over
    ``data``. ``landmark_vars`` are frozen provider variables (ignored when
    ``use_landmarks=False``)."""
    backbone = _backbone(cfg)
    provider = LandmarkProvider(
        num_landmarks=cfg.model.num_patches, patch_size=cfg.model.patch_size,
        gather_impl=cfg.model.gather_impl, stn_mode=cfg.model.stn_mode,
        coord_scale=float(cfg.model.image_size - 1),
    )
    multi = int(np.prod(list(mesh.shape.values()))) > 1
    _pmean = (lambda x: jax.lax.pmean(x, "data")) if multi else (lambda x: x)
    n_data = mesh.shape["data"]
    zero1 = cfg.zero1
    if zero1 and n_data < 2:
        raise ValueError("zero1=True needs a data axis to shard over "
                         f"(n_data={n_data})")

    def step_impl(state, landmark_vars, images, lr, wd):
        rng = jax.random.fold_in(state.rng, state.step)
        if multi:
            # independent per-data-shard masks/dropout (stored rng unchanged)
            from ..parallel.mesh import fold_in_shard

            rng = fold_in_shard(rng, "data")
        k_land, k_mask, k_drop = jax.random.split(rng, 3)
        if cfg.input_scale is not None:
            from ..ops.augment_device import scale_uint8

            images = scale_uint8(images, cfg.input_scale)
        b = images.shape[0]
        n = cfg.model.num_patches

        if cfg.use_landmarks:
            _, tokens = provider.apply(landmark_vars, images, rng=k_land)
        else:
            from ..ops.patchify import patchify

            tokens = patchify(images, cfg.model.patch_size)
        tokens = jax.lax.stop_gradient(tokens)
        mask = jax.random.bernoulli(k_mask, cfg.mask_ratio, (b, n)).astype(
            jnp.float32
        )

        def loss_fn(params):
            cp = _cast(params["backbone"], cfg.compute_dtype)
            _, out_tokens, _ = backbone.apply(
                {"params": cp},
                tokens.astype(cfg.compute_dtype),
                train=True,
                return_tokens=True,
                mask=mask,
                rngs={"dropout": k_drop},
            )
            rec = (
                out_tokens.astype(jnp.float32) @ params["decoder"]["kernel"]
                + params["decoder"]["bias"]
            )
            # L1 on masked patches only, normalized by mask count (SimMIM)
            err = jnp.abs(rec - tokens.astype(jnp.float32)).mean(axis=-1)
            return jnp.sum(err * mask) / jnp.maximum(jnp.sum(mask), 1.0)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        loss = _pmean(loss)
        if zero1:
            # grads stay LOCAL means; cross-shard mean folds into the
            # psum_scatter, the global clip norm into one scalar psum
            new_params, new_opt = zero1_adamw_update(
                grads, state.opt_state, state.params, lr,
                n_shards=n_data, wd_scale_tree=dino_wd_mask(state.params),
                wd=wd, grad_scale=1.0 / n_data,
                global_clip=cfg.clip_grad or 0.0,
            )
        else:
            grads = _pmean(grads)
            if cfg.clip_grad:
                grads = clip_grads_global(grads, cfg.clip_grad)
            new_params, new_opt = adamw_update(
                grads, state.opt_state, state.params, lr,
                wd_scale_tree=dino_wd_mask(state.params), wd=wd,
            )
        return (
            SimMIMTrainState(new_params, new_opt, state.step + 1, state.rng),
            {"loss": loss},
        )

    cache = {}

    def step_fn(state, landmark_vars, images, lr, wd):
        if "fn" not in cache:
            dk = dict(donate_argnums=(0,)) if donate else {}
            if not multi:
                cache["fn"] = jax.jit(step_impl, **dk)
            else:
                rep = lambda t: jax.tree_util.tree_map(lambda _: P(), t)
                state_spec = rep(state)
                if zero1:
                    state_spec = state_spec._replace(
                        opt_state=AdamWState(
                            count=P(),
                            mu=jax.tree_util.tree_map(
                                lambda _: P("data"), state.opt_state.mu
                            ),
                            nu=jax.tree_util.tree_map(
                                lambda _: P("data"), state.opt_state.nu
                            ),
                        )
                    )
                cache["fn"] = jax.jit(
                    jax.shard_map(
                        step_impl,
                        mesh=mesh,
                        in_specs=(state_spec, rep(landmark_vars),
                                  P("data"), P(), P()),
                        out_specs=(state_spec, {"loss": P()}),
                        # MUST be False: check_vma=True auto-psums grads
                        # wrt the replicated params, turning the explicit
                        # pmean into a no-op — the step would train on the
                        # grad SUM (n_data× the DDP mean). See the ssl.py
                        # shard_map comment + test_vma_autopsum_trap.
                        check_vma=False,
                    ),
                    **dk,
                )
        return cache["fn"](state, landmark_vars, images, lr, wd)

    return step_fn
