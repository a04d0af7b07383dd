"""Compiled-collective regression tests (SURVEY §2.2).

On a 1-chip bench environment the only cheap way to catch a
collective-layout regression before real pods is to assert on the
lowered/compiled program text of the SPMD train steps:

- the ZeRO-1 SSL tail must lower to per-leaf ``reduce_scatter`` +
  ``all_gather`` with NO per-leaf gradient all_reduce chatter (the only
  all_reduces are the handful of scalars: loss pmean, DINO center psum,
  the stacked clip-norm psum);
- the TP-sharded CosFace-CE supervised step must keep every cross-shard
  (model-axis) reduction scalar-per-sample — re-replicating the logits
  would show up as a model-axis all_reduce carrying a (B, C/shard)-sized
  tensor;
- XLA must still be able to COMBINE the per-leaf data-axis grad
  all_reduces of the supervised step (a tail rewrite that threads a
  dependency between leaf updates would block the combiner and explode
  the compiled collective count).

Mesh layout here is (data=4, model=2) over the 8-device CPU backend, so
data-axis replica groups are [[0,2,4,6],[1,3,5,7]] and model-axis groups
[[0,1],...] — group shape identifies the axis in the lowered text.
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from lafs_cvpr2024_tpu.models.partfvit import PartFViTConfig
from lafs_cvpr2024_tpu.train.ssl import (
    SSLConfig,
    create_landmark_provider,
    create_ssl_state,
    make_ssl_train_step,
)
from lafs_cvpr2024_tpu.train.supervised import (
    SupervisedConfig,
    create_classifier,
    create_state,
    make_train_step,
)


def _collective_counts(txt):
    return {
        op: len(re.findall(rf"stablehlo\.{op}\"?\(", txt))
        for op in ("all_reduce", "reduce_scatter", "all_gather",
                   "collective_permute", "all_to_all")
    }


def _all_reduce_groups_and_shapes(txt):
    """[(replica_groups_str, operand_tensor_str)] for every all_reduce."""
    out = []
    for m in re.finditer(r'"stablehlo\.all_reduce"', txt):
        seg = txt[m.start():m.start() + 4000]
        g = re.search(r"replica_groups = dense<(\[\[.*?\]\])>", seg, re.S)
        ty = re.search(r"\}\) : \(tensor<([^>]*)>", seg)
        out.append((
            g.group(1).replace("\n", "") if g else "?",
            ty.group(1) if ty else "?",
        ))
    return out


def _tensor_elems(t):
    """'2xf32' -> 2, 'f32' -> 1, '4x8xf32' -> 32."""
    dims = [int(d) for d in re.findall(r"(\d+)x", t)]
    n = 1
    for d in dims:
        n *= d
    return n


@pytest.fixture(scope="module")
def ssl_zero1_lowering():
    cfg = SSLConfig(
        model=PartFViTConfig(
            dim=32, depth=1, heads=2, dim_head=16, mlp_dim=64,
            num_patches=36, with_land=False, loss_type="None",
            num_classes=0, image_size=48, stn_mode="small",
        ),
        out_dim=64, head_hidden_dim=32, head_bottleneck_dim=16,
        local_crops_number=2, compute_dtype=jnp.float32, zero1=True,
    )
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8, 1), ("data", "model"))
    state = jax.jit(lambda r: create_ssl_state(cfg, r, zero1_shards=8))(
        jax.random.PRNGKey(0)
    )
    land = create_landmark_provider(cfg, jax.random.PRNGKey(1))
    step = make_ssl_train_step(cfg, mesh)
    g = jnp.zeros((2, 8, 48, 48, 3), jnp.float32)
    loc = jnp.zeros((cfg.local_crops_number, 8, 48, 48, 3), jnp.float32)
    lowered = jax.jit(step).lower(
        state, land, g, g, loc, loc, jnp.float32(1e-3), jnp.float32(0.04),
        jnp.float32(0.996), jnp.float32(0.04), jnp.float32(1.0),
    )
    n_leaves = len(jax.tree_util.tree_leaves(state.student))
    return lowered.as_text(), n_leaves


def test_ssl_zero1_lowers_to_scatter_gather(ssl_zero1_lowering):
    txt, n_leaves = ssl_zero1_lowering
    c = _collective_counts(txt)
    # every student leaf reaches the optimizer via ONE psum_scatter and
    # returns via ONE all_gather (optim.py:572,599). The hard-frozen
    # weight-norm g leaf (norm_last_layer=True) zeroes its grad right
    # after the scatter, so jaxpr DCE drops that ONE scatter; its param
    # is still gathered (weight-decay path), hence the -1.
    assert c["reduce_scatter"] == n_leaves - 1, c
    assert c["all_gather"] == n_leaves, c
    # NO per-leaf gradient all_reduce chatter: only the fixed scalar set
    # (loss pmean, teacher-center psum, clip-norm stack) may all_reduce
    assert c["all_reduce"] <= 6, c
    assert c["collective_permute"] == 0 and c["all_to_all"] == 0, c


def test_ssl_zero1_all_reduces_are_small(ssl_zero1_lowering):
    txt, n_leaves = ssl_zero1_lowering
    for groups, tensor in _all_reduce_groups_and_shapes(txt):
        # the largest legitimate all_reduce is the DINO-center psum
        # (out_dim=64 here) / the stacked clip-norm vector (n_leaves)
        assert _tensor_elems(tensor) <= max(64, n_leaves + 8), (
            f"oversized all_reduce {tensor} (groups {groups}) — a gradient "
            "leaf is being all_reduced instead of psum_scattered"
        )


@pytest.fixture(scope="module")
def supervised_tp_lowered():
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2), ("data", "model"))
    cfg = SupervisedConfig(
        model=PartFViTConfig(
            image_size=48, dim=32, depth=1, heads=2, dim_head=16, mlp_dim=64,
            num_patches=36, num_classes=32, with_land=True, stn_mode="small",
        ),
        acc_step=1, compute_dtype=jnp.float32,
    )
    state = jax.jit(lambda r: create_state(cfg, r, sharded_classifier=True))(
        jax.random.PRNGKey(0)
    )
    w, w_opt = create_classifier(cfg, jax.random.PRNGKey(1))
    step = make_train_step(cfg, mesh)
    images = jnp.zeros((8, 48, 48, 3), jnp.float32)
    labels = jnp.zeros((8,), jnp.int32)
    lowered = jax.jit(step).lower(state, w, w_opt, images, labels, 1e-3)
    n_leaves = len(jax.tree_util.tree_leaves(state.params))
    return lowered, n_leaves


def test_supervised_tp_model_axis_reductions_are_scalar(supervised_tp_lowered):
    """Sharded CosFace-CE (parallel/sharded_cosface.py): the class axis
    stays sharded end-to-end; only per-sample SCALARS (max-logit,
    exp-sum, label-logit) cross the model axis."""
    lowered, _ = supervised_tp_lowered
    txt = lowered.as_text()
    model_axis = [
        (g, t) for g, t in _all_reduce_groups_and_shapes(txt)
        if g.startswith("[[0, 1]")
    ]
    assert 1 <= len(model_axis) <= 8, model_axis
    per_shard_batch = 2  # global batch 8 over data=4
    for groups, tensor in model_axis:
        assert _tensor_elems(tensor) <= per_shard_batch, (
            f"model-axis all_reduce carries {tensor} — logits are being "
            "re-replicated instead of reduced as per-sample scalars"
        )


def test_supervised_tp_per_leaf_grads_present(supervised_tp_lowered):
    """Every backbone param leaf's grad pmean exists at trace level (no
    silently-unreduced leaf), all on DATA-axis groups."""
    lowered, n_leaves = supervised_tp_lowered
    txt = lowered.as_text()
    data_axis = [
        (g, t) for g, t in _all_reduce_groups_and_shapes(txt)
        if g.startswith("[[0, 2, 4, 6]")
    ]
    assert len(data_axis) >= n_leaves, (len(data_axis), n_leaves)


@pytest.mark.slow
def test_supervised_tp_grad_allreduces_combine(supervised_tp_lowered):
    """XLA's collective combiner must stay unblocked: the compiled step
    carries far fewer all-reduce ops than the per-leaf traced count (a
    tail rewrite that chains leaf updates would serialize them)."""
    lowered, n_leaves = supervised_tp_lowered
    traced = _collective_counts(lowered.as_text())["all_reduce"]
    compiled = lowered.compile().as_text()
    n_compiled = len(re.findall(r" all-reduce\(", compiled))
    assert traced >= n_leaves  # per-leaf at trace level…
    assert n_compiled <= traced // 2, (n_compiled, traced)
