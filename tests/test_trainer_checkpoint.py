"""Orbax round-trip of the actual trainer states (NamedTuples with nested
param trees) — the resume path of both CLIs."""

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
