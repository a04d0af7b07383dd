"""Orbax round-trip of the actual trainer states (NamedTuples with nested
param trees) — the resume path of both CLIs."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from lafs_cvpr2024_tpu.models.partfvit import PartFViTConfig
from lafs_cvpr2024_tpu.ops.mixup import MixupConfig
from lafs_cvpr2024_tpu.train.checkpoint import restore_checkpoint, save_checkpoint
from lafs_cvpr2024_tpu.train.ssl import SSLConfig, create_ssl_state
from lafs_cvpr2024_tpu.train.supervised import (
    SupervisedConfig,
    create_classifier,
    create_state,
)

TINY = PartFViTConfig(
    image_size=48, dim=32, depth=1, heads=2, dim_head=16, mlp_dim=64,
    num_patches=36, num_classes=8, with_land=True, stn_mode="small",
)


def _abstract(tree):
    return jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), tree
    )


def test_supervised_state_roundtrip(tmp_path):
    cfg = SupervisedConfig(
        model=TINY, acc_step=1, mixup=MixupConfig(num_classes=8),
        compute_dtype=jnp.float32,
    )
    state = jax.jit(lambda r: create_state(cfg, r))(jax.random.PRNGKey(0))
    w, w_opt = create_classifier(cfg, jax.random.PRNGKey(1))
    blob = {"state": state, "cls_w": w, "cls_opt": w_opt}
    save_checkpoint(str(tmp_path / "ck"), blob, step=3)
    restored, step = restore_checkpoint(str(tmp_path / "ck"), _abstract(blob))
    assert step == 3
    np.testing.assert_array_equal(
        np.asarray(restored["cls_w"]), np.asarray(w)
    )
    a = jax.tree_util.tree_leaves(restored["state"].params)
    b = jax.tree_util.tree_leaves(state.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_ssl_state_roundtrip(tmp_path):
    cfg = SSLConfig(
        model=PartFViTConfig(
            image_size=48, dim=32, depth=1, heads=2, dim_head=16, mlp_dim=64,
            num_patches=36, with_land=False, loss_type="None", num_classes=0,
        ),
        out_dim=16, head_hidden_dim=32, head_bottleneck_dim=8,
        compute_dtype=jnp.float32,
    )
    state = jax.jit(lambda r: create_ssl_state(cfg, r))(jax.random.PRNGKey(0))
    save_checkpoint(str(tmp_path / "ck"), state, step=10)
    restored, step = restore_checkpoint(str(tmp_path / "ck"), _abstract(state))
    assert step == 10
    np.testing.assert_array_equal(
        np.asarray(restored.center), np.asarray(state.center)
    )
    # NamedTuple structure survives
    assert type(restored).__name__ == "SSLTrainState"
    np.testing.assert_array_equal(
        np.asarray(restored.teacher["head"]["last_layer_v"]),
        np.asarray(state.teacher["head"]["last_layer_v"]),
    )


def test_ssl_legacy_checkpoint_without_stats_restores(tmp_path):
    """SSL checkpoints written before SSLTrainState grew the `stats` field
    (round ≤3) must resume into the new state for stat-less archs —
    stats=() re-attaches after the restore. A BN arch template (stats with
    leaves) must still raise rather than silently lose running stats."""
    from typing import Any, NamedTuple

    import pytest

    from lafs_cvpr2024_tpu.train.ssl import SSLTrainState

    class LegacySSLTrainState(NamedTuple):  # the round-3 field set
        student: Any
        teacher: Any
        opt_state: Any
        center: Any
        step: Any
        rng: Any

    tree = {"backbone": {"w": jnp.ones((2, 2))}, "head": {"k": jnp.zeros(3)}}
    legacy = LegacySSLTrainState(
        student=tree,
        teacher=jax.tree_util.tree_map(lambda x: x * 2, tree),
        opt_state={"mu": tree},
        center=jnp.zeros((1, 4)),
        step=jnp.zeros((), jnp.int32),
        rng=jax.random.PRNGKey(0),
    )
    save_checkpoint(str(tmp_path / "ck"), legacy, step=7)

    new = SSLTrainState(
        student=legacy.student, teacher=legacy.teacher,
        opt_state=legacy.opt_state, center=legacy.center,
        step=legacy.step, rng=legacy.rng, stats=(),
    )
    restored, step = restore_checkpoint(str(tmp_path / "ck"), _abstract(new))
    assert step == 7 and isinstance(restored, SSLTrainState)
    assert restored.stats == ()
    np.testing.assert_array_equal(
        np.asarray(restored.teacher["backbone"]["w"]),
        np.asarray(legacy.teacher["backbone"]["w"]),
    )

    # BN template: running stats absent from the checkpoint must RAISE
    bn = new._replace(stats={"student": {"m": jnp.zeros(2)},
                             "teacher": {"m": jnp.zeros(2)}})
    with pytest.raises(ValueError):
        restore_checkpoint(str(tmp_path / "ck"), _abstract(bn))


def test_restore_eval_variables_rejects_lookalike_arity(tmp_path):
    """Template-free restore classifies 5/6-field sequences by layout, not
    arity alone — a look-alike payload must raise, not be silently
    misread as a TrainState (ADVICE r2 #4)."""
    import numpy as np
    import pytest

    from lafs_cvpr2024_tpu.train.checkpoint import (
        restore_eval_variables,
        save_checkpoint,
    )

    # 5 fields but tree[0] is not a params dict and tree[3] is not a scalar
    bogus = [np.zeros(3), {"x": np.zeros(2)}, None, np.zeros((2, 2)), np.zeros(4)]
    save_checkpoint(str(tmp_path / "ck"), bogus, step=1)
    with pytest.raises(ValueError, match="unrecognized checkpoint layout"):
        restore_eval_variables(str(tmp_path / "ck"))


def test_adapt_moment_layout_roundtrips():
    from lafs_cvpr2024_tpu.train.optim import (
        adamw_init, adapt_moment_layout, zero1_init)

    params = {"a": jnp.arange(10.0).reshape(2, 5), "b": jnp.arange(3.0)}
    dense = adamw_init(params)
    dense = dense._replace(
        mu=jax.tree_util.tree_map(lambda p: p + 1.0, params),
        nu=jax.tree_util.tree_map(lambda p: p * 2.0, params),
    )
    # dense -> zero1(4): shapes match zero1_init's and values survive
    z4 = adapt_moment_layout(dense, params, 4)
    tmpl = zero1_init(params, 4)
    for m, t in zip(jax.tree_util.tree_leaves(z4.mu),
                    jax.tree_util.tree_leaves(tmpl.mu)):
        assert m.shape == t.shape
    # already in the target layout: no-op (identity tree)
    z4b = adapt_moment_layout(z4, params, 4)
    assert z4b.mu is z4.mu
    # zero1(4) -> zero1(2): re-chunked via the dense intermediate
    z2 = adapt_moment_layout(z4, params, 2)
    for m, t in zip(jax.tree_util.tree_leaves(z2.mu),
                    jax.tree_util.tree_leaves(zero1_init(params, 2).mu)):
        assert m.shape == t.shape
    # back to dense: exact values
    back = adapt_moment_layout(z2, params, 0)
    for x, y in zip(jax.tree_util.tree_leaves(back.mu),
                    jax.tree_util.tree_leaves(dense.mu)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    for x, y in zip(jax.tree_util.tree_leaves(back.nu),
                    jax.tree_util.tree_leaves(dense.nu)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    dense2 = adapt_moment_layout(dense, params, 0)
    assert dense2.mu is dense.mu


def test_restore_flex_converts_zero1_layouts(tmp_path):
    """The --zero1 flag can flip between save and resume: a dense
    checkpoint restores into a ZeRO-1 run (and vice versa) through the
    alternate-template retry + adapt_moment_layout glue the CLIs use."""
    from lafs_cvpr2024_tpu.train.checkpoint import restore_checkpoint_flex
    from lafs_cvpr2024_tpu.train.optim import adapt_moment_layout

    cfg = SSLConfig(
        model=PartFViTConfig(
            image_size=48, dim=32, depth=1, heads=2, dim_head=16, mlp_dim=64,
            num_patches=36, with_land=False, loss_type="None", num_classes=0,
        ),
        out_dim=16, head_hidden_dim=32, head_bottleneck_dim=8,
        compute_dtype=jnp.float32,
    )
    rng = jax.random.PRNGKey(0)
    dense_state = jax.jit(lambda r: create_ssl_state(cfg, r))(rng)
    save_checkpoint(str(tmp_path / "ck"), dense_state, step=5)

    # resume with --zero1 over a 4-way data axis
    z_state = jax.eval_shape(
        lambda r: create_ssl_state(cfg, r, zero1_shards=4), rng
    )
    restored, step = restore_checkpoint_flex(
        str(tmp_path / "ck"), _abstract(z_state), _abstract(dense_state),
        lambda st: st._replace(opt_state=adapt_moment_layout(
            st.opt_state, st.student, 4)),
    )
    assert step == 5
    for m, t in zip(jax.tree_util.tree_leaves(restored.opt_state.mu),
                    jax.tree_util.tree_leaves(z_state.opt_state.mu)):
        assert m.shape == t.shape
    # student params came through untouched
    for x, y in zip(jax.tree_util.tree_leaves(restored.student),
                    jax.tree_util.tree_leaves(dense_state.student)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    # and the reverse: a zero1 checkpoint resumes into a dense run
    z_restored = restored
    save_checkpoint(str(tmp_path / "ck2"), z_restored, step=7)
    back, step2 = restore_checkpoint_flex(
        str(tmp_path / "ck2"), _abstract(dense_state), _abstract(z_state),
        lambda st: st._replace(opt_state=adapt_moment_layout(
            st.opt_state, st.student, 0)),
    )
    assert step2 == 7
    for x, y in zip(jax.tree_util.tree_leaves(back.opt_state.mu),
                    jax.tree_util.tree_leaves(dense_state.opt_state.mu)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_checkpoint_writer_async_roundtrip(tmp_path):
    """CheckpointWriter: async saves commit durably by close(), retention
    keeps max_to_keep, the caller may drop its reference right after
    save() (the loop rebinds `state` every step), and the result is
    readable by the plain restore path."""
    import gc

    from lafs_cvpr2024_tpu.train.checkpoint import CheckpointWriter

    trees = []
    with CheckpointWriter(str(tmp_path / "ck"), keep=2) as w:
        for step in (1, 2, 3):
            tree = {
                "a": jnp.full((4, 3), float(step)),
                "b": {"c": jnp.arange(6.0) * step},
            }
            trees.append(jax.tree_util.tree_map(np.asarray, tree))
            w.save(step, tree)
            del tree  # the train loop rebinds state immediately
            gc.collect()
    abstract = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, jnp.asarray(x).dtype),
        trees[-1],
    )
    restored, step = restore_checkpoint(str(tmp_path / "ck"), abstract)
    assert step == 3
    np.testing.assert_array_equal(np.asarray(restored["a"]), trees[-1]["a"])
    np.testing.assert_array_equal(
        np.asarray(restored["b"]["c"]), trees[-1]["b"]["c"]
    )
    # retention: only the last 2 steps survive
    restored2, _ = restore_checkpoint(str(tmp_path / "ck"), abstract, step=2)
    np.testing.assert_array_equal(np.asarray(restored2["a"]), trees[1]["a"])
    import pytest

    with pytest.raises(Exception):
        restore_checkpoint(str(tmp_path / "ck"), abstract, step=1)


def test_checkpoint_writer_keep_period(tmp_path):
    """keep_period: steps on the period survive FOREVER alongside the
    rolling latest-N retention (the reference's permanent
    checkpoint{epoch:04}.pth every saveckp_freq epochs,
    lafs_train.py:459-463 — wired as --saveckp-freq in cli/train_ssl)."""
    from lafs_cvpr2024_tpu.train.checkpoint import CheckpointWriter

    with CheckpointWriter(str(tmp_path / "ck"), keep=2, keep_period=10) as w:
        for step in (5, 10, 15, 20, 25, 30):
            w.save(step, {"a": jnp.full((2,), float(step))})
    abstract = {"a": jax.ShapeDtypeStruct((2,), jnp.float32)}
    surviving = sorted(
        int(d) for d in os.listdir(tmp_path / "ck") if d.isdigit()
    )
    # 10, 20, 30 are on the period (permanent); 25, 30 are the latest 2
    assert surviving == [10, 20, 25, 30], surviving
    restored, _ = restore_checkpoint(str(tmp_path / "ck"), abstract, step=10)
    np.testing.assert_array_equal(np.asarray(restored["a"]), [10.0, 10.0])


def test_preemption_guard_chains_and_restores():
    import signal

    from lafs_cvpr2024_tpu.train.checkpoint import PreemptionGuard

    seen = []
    prev = signal.signal(signal.SIGUSR1, lambda s, f: seen.append(s))
    try:
        g = PreemptionGuard(signals=(signal.SIGUSR1,))
        assert not g.requested
        os.kill(os.getpid(), signal.SIGUSR1)
        assert g.requested
        assert seen == [signal.SIGUSR1]  # previous handler chained
        g.uninstall()
        os.kill(os.getpid(), signal.SIGUSR1)
        assert seen == [signal.SIGUSR1, signal.SIGUSR1]  # restored
    finally:
        signal.signal(signal.SIGUSR1, prev)
