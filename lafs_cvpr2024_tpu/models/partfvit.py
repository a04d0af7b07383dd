"""Part-fViT: landmark-conditioned face Vision Transformer (the flagship).

TPU-native re-design of ``ViT_face_landmark_patch8`` and friends
(``face_pre_pro/ViT_face.py:336-1409``): the MobileNetV3 stem regresses 196
landmark coordinates; an 8×8 patch is bilinearly gathered at each landmark
(ONE fused batched op — the reference loops ``grid_sample`` 196 times); the
patch tokens feed a 12-layer pre-norm transformer with CLS pooling; training
attaches a margin head.

Pipeline (reference line refs):
  stn (MobileNetV3_backbone)           ViT_face.py:578,680-684
  mean-pool → Dropout(0.5)+Dense(392)  ViT_face.py:599-602,683-684
  min-max rescale to [0,111]           ViT_face.py:694-698
  patch gather (grid_sample semantics) ViT_face.py:711 / :1615-1656
  Dense(192→dim) patch embed           ViT_face.py:612,761
  CLS + pos-emb + dropout              ViT_face.py:611-614,764-768
  Transformer(depth 12, heads 11)      ViT_face.py:616,769
  LayerNorm → CLS token = embedding    ViT_face.py:621-625,772-775
  CosFace(label) when training         ViT_face.py:653,786

Variants folded into config instead of duplicated classes:
``with_land`` off = pre-tokenized inputs (the SSL path);
``use_standcoord`` = fixed grid (+ optional jitter/shuffle,
ViT_face.py:717-758); ``pool='mean'``; mask-token SimMIM path.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.patch_gather import patch_gather, patch_gather_mosaic
from ..ops.patchify import patchify, standard_grid_landmarks, unfold_overlap
from .heads import ArcFace, CosFace, SFace, SoftmaxHead
from .layers import FastDropout, Transformer
from .mobilenet import MobileNetV3Backbone


@dataclass(frozen=True)
class PartFViTConfig:
    image_size: int = 112
    patch_size: int = 8
    num_patches: int = 196
    dim: int = 768
    depth: int = 12
    heads: int = 11
    dim_head: int = 64
    mlp_dim: int = 2048
    channels: int = 3
    dropout: float = 0.1
    emb_dropout: float = 0.1
    drop_path_rate: float = 0.1
    pool: str = "cls"                  # 'cls' | 'mean'
    with_land: bool = True             # landmark CNN drives patch positions
    use_standcoord: bool = False       # fixed-grid landmark variant
    random_prob: bool = False          # ±N(0,3²) px jitter on standcoord grid
    shuffle: bool = False              # random landmark shuffle (standcoord)
    loss_type: str = "CosFace"         # 'CosFace'|'ArcFace'|'SFace'|'Softmax'|'None'
    num_classes: int = 205990
    cosface_m: float = 0.4
    cosface_s: float = 64.0
    gather_impl: str = "mxu"
    attn_impl: str = "einsum"       # 'einsum' | 'fused' (whole-seq pallas,
                                    # fp32 softmax) | 'flash' (long-seq;
                                    # TPU-only, numerics match to ~1e-3;
                                    # measured SLOWER at 197/37-token seqs)
    mlp_impl: str = "dense"         # 'dense' | 'fused' | 'fused_ln' (pallas
                                    # fc1+gelu+dropout+fc2 kernel, 'fused_ln'
                                    # folds the pre-MLP LayerNorm in too;
                                    # needs dim/mlp_dim % 128; measured
                                    # FASTER — ops/fused_mlp)
    remat_policy: str = "none"      # transformer remat: 'none'|'dots'|'all'
    bn_axis_name: Optional[str] = None  # set to mesh axis for SyncBN
    stn_mode: str = "large"            # MobileNetV3 variant for the stem
    simmim: bool = False               # masked-image-modeling forward
    use_global_token: bool = False     # CLS := projection of stn features
                                       # (ViT_face_landmark_patch8_global,
                                       # ViT_face.py:372-379,441,530)


def minmax_rescale_landmarks(theta: jnp.ndarray, num_landmarks: int, scale: float = 111.0):
    """Min-max rescale of the raw regressor output to [0, scale] pixel coords.

    Matches reference ``ViT_face.py:694-698``: min/max over the WHOLE
    2·N-vector (not per coordinate), then reshape to (B, N, 2) with
    ``[..., 0]=x``.
    """
    t_max = jnp.max(theta, axis=1, keepdims=True)
    t_min = jnp.min(theta, axis=1, keepdims=True)
    theta = (theta - t_min) / (t_max - t_min + 1e-12) * scale
    return theta.reshape(-1, num_landmarks, 2)


class LandmarkRegressor(nn.Module):
    """MobileNetV3 stem + landmark head: image → (B, N, 2) pixel coords.

    Reference: ``stn`` + ``output_layer`` (ViT_face.py:578,599-602,680-698).
    ``coord_scale`` is the reference's hard-coded 111 (= image_size - 1).
    """

    num_landmarks: int = 196
    bn_axis_name: Optional[str] = None
    stn_mode: str = "large"
    coord_scale: float = 111.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        feat = MobileNetV3Backbone(self.stn_mode, self.bn_axis_name, name="stn")(x, train)
        pooled = jnp.mean(feat, axis=(1, 2))  # (B, 160)
        h = nn.Dropout(0.5)(pooled, deterministic=not train)
        theta = nn.Dense(self.num_landmarks * 2, name="output_layer")(h)
        return (
            minmax_rescale_landmarks(theta, self.num_landmarks, self.coord_scale),
            pooled,
        )


class PartFViT(nn.Module):
    """The flagship model. Accepts images (B,H,W,C) or pre-gathered tokens
    (B,N,patch_dim) — the latter is the SSL path (``with_land=False``)."""

    cfg: PartFViTConfig

    @nn.compact
    def __call__(
        self,
        x,
        labels=None,
        train: bool = False,
        return_tokens: bool = False,
        mask=None,
        x_noaug=None,
        random_prob: bool = False,
        ran_sample: bool = False,
        glo_diff: bool = False,
    ):
        """``mask``: optional (B, N) 0/1 array for the SimMIM masked-image-
        modeling path — masked patch embeddings are replaced by a learned
        ``mask_token`` (reference ``ViT_face.py:947-951,1152-1156``).

        Global-token-variant call options (``ViT_face.py:421-518``, usable
        on any ``with_land`` config):

        - ``x_noaug``: landmarks AND the global token are predicted from
          this clean view while patches are gathered from ``x`` (the
          augmented view) — reference ``image_noaug`` (:429-431,515-518).
        - ``random_prob``: ±N(0,2²)-px landmark jitter followed by a
          random resample WITH replacement (:474-495); keeps 36 landmarks
          when ``ran_sample`` else all ``num_patches`` (:487-492).
        - ``glo_diff``: the batch is two global crops stacked along batch;
          the FIRST half keeps the clean landmarks and only the second
          half gets the ``random_prob`` treatment (:474-477,515-516).
          ``glo_diff + ran_sample`` is refused: the reference's
          ``torch.cat([theta0, theta])`` is shape-invalid there (196 vs
          36 landmarks, :515).
        """
        cfg = self.cfg
        if (x_noaug is not None or random_prob or glo_diff) and not (
            cfg.with_land and x.ndim == 4
        ):
            raise ValueError(
                "x_noaug/random_prob/glo_diff require the with_land image "
                "path (ViT_face.py:421 forward options)"
            )
        if glo_diff and ran_sample:
            raise ValueError(
                "glo_diff + ran_sample is shape-invalid in the reference "
                "(ViT_face.py:515 torch.cat of 196- vs 36-landmark halves)"
            )
        if cfg.with_land and cfg.use_standcoord:
            # in the reference these flags run SEQUENTIALLY — the standcoord
            # block re-gathers from the landmark block's already-gathered
            # patch tensor (ViT_face.py:680-760), which is shape-invalid for
            # grid_sample; standcoord configs there always set with_land off.
            # Refuse loudly instead of silently preferring one branch.
            raise ValueError(
                "PartFViTConfig: with_land and use_standcoord are mutually "
                "exclusive (set with_land=False for the fixed-grid variant)"
            )
        p = cfg.patch_size
        theta = None

        global_tok = None
        if x.ndim == 4 and cfg.with_land:
            theta, pooled = LandmarkRegressor(
                cfg.num_patches, cfg.bn_axis_name, cfg.stn_mode,
                float(cfg.image_size - 1), name="landmark"
            )(x if x_noaug is None else x_noaug, train)
            if random_prob:
                b_img = theta.shape[0]
                if glo_diff:
                    if b_img % 2:
                        raise ValueError(
                            "glo_diff expects two global crops stacked "
                            f"along batch (even batch, got {b_img})"
                        )
                    clean, noisy = theta[: b_img // 2], theta[b_img // 2:]
                else:
                    clean, noisy = None, theta
                k_jit, k_idx = jax.random.split(self.make_rng("augment"))
                # reference jitter is torch.randn*2 — std 2 px (:481)
                noisy = noisy + 2.0 * jax.random.normal(k_jit, noisy.shape)
                keep = 36 if ran_sample else cfg.num_patches
                idx = jax.random.randint(
                    k_idx, (noisy.shape[0], keep), 0, noisy.shape[1]
                )
                noisy = jnp.take_along_axis(noisy, idx[..., None], axis=1)
                theta = (
                    jnp.concatenate([clean, noisy], axis=0)
                    if glo_diff
                    else noisy
                )
            tokens = patch_gather(x, theta, p, impl=cfg.gather_impl)
            if cfg.use_global_token:
                h = nn.Dropout(0.5)(pooled, deterministic=not train)
                global_tok = nn.Dense(cfg.dim, name="global_token")(h)[:, None, :]
        elif x.ndim == 4 and cfg.use_standcoord:
            b = x.shape[0]
            grid = jnp.asarray(standard_grid_landmarks(cfg.num_patches, p))
            theta = jnp.broadcast_to(grid[None], (b, cfg.num_patches, 2))
            if cfg.random_prob and train:
                theta = theta + 3.0 * jax.random.normal(
                    self.make_rng("augment"), theta.shape
                )
            if cfg.shuffle and train:
                idx = jax.random.randint(
                    self.make_rng("augment"), (b, cfg.num_patches), 0, cfg.num_patches
                )
                theta = jnp.take_along_axis(theta, idx[..., None], axis=1)
            # standcoord path transposes the mosaic (ViT_face.py:748)
            mosaic = patch_gather_mosaic(
                x, theta, p, impl=cfg.gather_impl, transpose=True
            )
            tokens = patchify(mosaic, p)
        elif x.ndim == 4:
            tokens = patchify(x, p)
        else:
            tokens = x  # pre-gathered tokens (SSL multi-crop path)

        tokens = nn.Dense(cfg.dim, name="patch_to_embedding")(tokens)
        if cfg.simmim:
            mask_token = self.param(
                "mask_token", nn.initializers.truncated_normal(0.02), (1, 1, cfg.dim)
            )
            if mask is not None:
                m = mask[..., None].astype(tokens.dtype)
                tokens = tokens * (1 - m) + mask_token * m
        b, n, _ = tokens.shape
        cls = self.param(
            "cls_token", nn.initializers.normal(1.0), (1, 1, cfg.dim)
        )
        pos = self.param(
            "pos_embedding",
            nn.initializers.normal(1.0),
            (1, cfg.num_patches + 1, cfg.dim),
        )
        first = (
            global_tok
            if global_tok is not None
            else jnp.broadcast_to(cls, (b, 1, cfg.dim))
        )
        h = jnp.concatenate([first, tokens], axis=1)
        h = h + pos[:, : n + 1]
        h = FastDropout(cfg.emb_dropout)(h, deterministic=not train)
        h = Transformer(
            cfg.dim,
            cfg.depth,
            cfg.heads,
            cfg.dim_head,
            cfg.mlp_dim,
            cfg.dropout,
            cfg.drop_path_rate,
            cfg.attn_impl,
            cfg.mlp_impl,
            cfg.remat_policy,
            name="transformer",
        )(h, deterministic=not train)
        all_tokens = h
        pooled = h.mean(axis=1) if cfg.pool == "mean" else h[:, 0]
        emb = nn.LayerNorm(epsilon=1e-5, name="mlp_head")(pooled)  # torch LN eps

        if return_tokens:
            return emb, all_tokens[:, 1:], theta
        if labels is not None and cfg.loss_type != "None":
            head = {
                "CosFace": lambda: CosFace(
                    cfg.dim, cfg.num_classes, cfg.cosface_s, cfg.cosface_m, name="loss"
                ),
                "ArcFace": lambda: ArcFace(cfg.dim, cfg.num_classes, name="loss"),
                "SFace": lambda: SFace(cfg.dim, cfg.num_classes, name="loss"),
                "Softmax": lambda: SoftmaxHead(cfg.dim, cfg.num_classes, name="loss"),
            }[cfg.loss_type]()
            logits = head(emb, labels)
            return logits, theta
        return emb


class LandmarkProvider(nn.Module):
    """Frozen landmark CNN for SSL: image → (theta, patch tokens).

    Reference ``face_landmark_4simmin_glo_loc`` (ViT_face.py:1218-1409):
    predicts landmarks on the CLEAN view and gathers patches from the
    AUGMENTED view (landmark-consistent augmentation); options:
    ``random_prob`` adds N(0,5²) px jitter (ViT_face.py:1359-1362),
    ``ran_sample`` keeps 36 random landmarks of 196 with replacement
    (ViT_face.py:1365-1367), ``random_coor`` = uniform random landmarks
    (ViT_face.py:1391-1400).
    """

    num_landmarks: int = 196
    patch_size: int = 8
    gather_impl: str = "mxu"
    attn_impl: str = "einsum"       # 'einsum' | 'fused' (whole-seq pallas,
                                    # fp32 softmax) | 'flash' (long-seq;
                                    # TPU-only, numerics match to ~1e-3;
                                    # measured SLOWER at 197/37-token seqs)
    mlp_impl: str = "dense"         # 'dense'|'fused'|'fused_ln' (see PartFViTConfig)
    remat_policy: str = "none"      # transformer remat: 'none'|'dots'|'all'
    bn_axis_name: Optional[str] = None
    stn_mode: str = "large"
    coord_scale: float = 111.0

    @nn.compact
    def __call__(
        self,
        x,
        x_aug=None,
        rng=None,
        jitter_std: float = 0.0,
        ran_sample: int = 0,
        random_coor: bool = False,
        train: bool = False,
        return_land: bool = False,
    ):
        if random_coor:
            assert rng is not None
            n = ran_sample or self.num_landmarks
            theta = jax.random.uniform(rng, (x.shape[0], n, 2)) * self.coord_scale
        else:
            theta, _ = LandmarkRegressor(
                self.num_landmarks, self.bn_axis_name, self.stn_mode,
                self.coord_scale, name="landmark"
            )(x, train)
            if jitter_std > 0:
                assert rng is not None
                rng, k = jax.random.split(rng)
                theta = theta + jitter_std * jax.random.normal(k, theta.shape)
            if ran_sample:
                assert rng is not None
                rng, k = jax.random.split(rng)
                idx = jax.random.randint(
                    k, (x.shape[0], ran_sample), 0, theta.shape[1]
                )
                theta = jnp.take_along_axis(theta, idx[..., None], axis=1)
        if return_land:  # landmarks only (reference ViT_face.py:1402-1403)
            return theta, x
        src = x if x_aug is None else x_aug
        tokens = patch_gather(src, theta, self.patch_size, impl=self.gather_impl)
        return theta, tokens


class OverlapViT(nn.Module):
    """Overlapping-patch ViT (reference ``ViTs_face_overlap``,
    ViT_face.py:1506-1613): ``Unfold(ac_patch, stride=patch, pad)`` soft-split
    instead of landmarks. Kept for SSL-arch completeness."""

    cfg: PartFViTConfig
    ac_patch_size: int = 12
    pad: int = 4

    @nn.compact
    def __call__(self, x, labels=None, train: bool = False):
        cfg = self.cfg
        if x.ndim == 4:
            tokens = unfold_overlap(x, self.ac_patch_size, cfg.patch_size, self.pad)
        else:
            tokens = x
        tokens = nn.Dense(cfg.dim, name="patch_to_embedding")(tokens)
        b, n, _ = tokens.shape
        cls = self.param("cls_token", nn.initializers.normal(1.0), (1, 1, cfg.dim))
        pos = self.param(
            "pos_embedding", nn.initializers.normal(1.0), (1, cfg.num_patches + 1, cfg.dim)
        )
        h = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, cfg.dim)), tokens], axis=1)
        h = h + pos[:, : n + 1]
        h = FastDropout(cfg.emb_dropout)(h, deterministic=not train)
        h = Transformer(
            cfg.dim, cfg.depth, cfg.heads, cfg.dim_head, cfg.mlp_dim,
            cfg.dropout, cfg.drop_path_rate, cfg.attn_impl, cfg.mlp_impl,
            cfg.remat_policy,
            name="transformer",
        )(h, deterministic=not train)
        pooled = h.mean(axis=1) if cfg.pool == "mean" else h[:, 0]
        # the overlap variant's head is BatchNorm1d, NOT LayerNorm
        # (ViT_face.py:1530-1532) — running stats matter for interop.
        # bn_axis_name → SyncBN (stats stay replicated under shard_map)
        emb = nn.BatchNorm(
            use_running_average=not train, epsilon=1e-5, momentum=0.9,
            axis_name=cfg.bn_axis_name, name="mlp_head",
        )(pooled)
        if labels is not None and cfg.loss_type != "None":
            logits = CosFace(
                cfg.dim, cfg.num_classes, cfg.cosface_s, cfg.cosface_m, name="loss"
            )(emb, labels)
            return logits, None
        return emb
