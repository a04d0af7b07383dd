"""Checkpoint round-trip (orbax), torch state_dict import mapping, logging
utilities, need_save gate."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lafs_cvpr2024_tpu.train.checkpoint import (
    import_torch_state_dict,
    merge_params,
    restore_checkpoint,
    save_checkpoint,
    strip_prefixes,
)
from lafs_cvpr2024_tpu.utils import (
    AverageMeter,
    JSONLLogger,
    MetricLogger,
    SmoothedValue,
    TensorBoardWriter,
    count_params,
    need_save,
)


def test_orbax_roundtrip(tmp_path):
    state = {
        "params": {"w": jnp.arange(6.0).reshape(2, 3)},
        "step": jnp.asarray(7, jnp.int32),
    }
    save_checkpoint(str(tmp_path / "ckpt"), state, step=7)
    abstract = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state
    )
    restored, step = restore_checkpoint(str(tmp_path / "ckpt"), abstract)
    assert step == 7
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["w"]), np.arange(6.0).reshape(2, 3)
    )


def test_restore_missing_returns_none(tmp_path):
    restored, step = restore_checkpoint(str(tmp_path / "nope"), None)
    assert restored is None and step is None


def test_strip_prefixes():
    sd = {
        "module.backbone.stn.w": 1,
        "encoder.cls_token": 2,
        "module.dummy_orthogonal_classifier.w": 3,
    }
    out = strip_prefixes(sd)
    assert out == {"stn.w": 1, "cls_token": 2}


def test_import_torch_transformer_and_head():
    import torch

    rng = np.random.default_rng(0)
    sd = {
        "cls_token": torch.from_numpy(rng.standard_normal((1, 1, 8)).astype(np.float32)),
        "pos_embedding": torch.from_numpy(rng.standard_normal((1, 197, 8)).astype(np.float32)),
        "patch_to_embedding.weight": torch.from_numpy(rng.standard_normal((8, 192)).astype(np.float32)),
        "patch_to_embedding.bias": torch.zeros(8),
        "transformer.layers.0.0.fn.norm.weight": torch.ones(8),
        "transformer.layers.0.0.fn.norm.bias": torch.zeros(8),
        "transformer.layers.0.0.fn.fn.to_qkv.weight": torch.from_numpy(
            rng.standard_normal((48, 8)).astype(np.float32)
        ),
        "transformer.layers.0.0.fn.fn.to_out.0.weight": torch.from_numpy(
            rng.standard_normal((8, 16)).astype(np.float32)
        ),
        "transformer.layers.0.0.fn.fn.to_out.0.bias": torch.zeros(8),
        "transformer.layers.0.1.fn.norm.weight": torch.ones(8),
        "transformer.layers.0.1.fn.norm.bias": torch.zeros(8),
        "transformer.layers.0.1.fn.fn.net.0.weight": torch.from_numpy(
            rng.standard_normal((16, 8)).astype(np.float32)
        ),
        "transformer.layers.0.1.fn.fn.net.0.bias": torch.zeros(16),
        "transformer.layers.0.1.fn.fn.net.3.weight": torch.from_numpy(
            rng.standard_normal((8, 16)).astype(np.float32)
        ),
        "transformer.layers.0.1.fn.fn.net.3.bias": torch.zeros(8),
        "mlp_head.0.weight": torch.ones(8),
        "mlp_head.0.bias": torch.zeros(8),
        "loss.weight": torch.from_numpy(rng.standard_normal((10, 8)).astype(np.float32)),
        "output_layer.1.weight": torch.from_numpy(rng.standard_normal((392, 160)).astype(np.float32)),
        "output_layer.1.bias": torch.zeros(392),
    }
    params, stats = import_torch_state_dict(sd)
    assert params["transformer"]["layers_0"]["attn"]["to_qkv"]["kernel"].shape == (8, 48)
    assert params["transformer"]["layers_0"]["mlp"]["fc1"]["kernel"].shape == (8, 16)
    assert params["patch_to_embedding"]["kernel"].shape == (192, 8)
    assert params["loss"]["weight"].shape == (10, 8)
    assert params["landmark"]["output_layer"]["kernel"].shape == (160, 392)
    # transposes preserve values
    np.testing.assert_allclose(
        np.asarray(params["patch_to_embedding"]["kernel"]),
        sd["patch_to_embedding.weight"].numpy().T,
    )


def test_import_torch_mobilenet_stem_matches_flax_shapes():
    """The stn import must produce keys/shapes matching the flax model."""
    import torch

    from lafs_cvpr2024_tpu.models.partfvit import LandmarkRegressor

    reg = LandmarkRegressor(196)
    variables = jax.jit(reg.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 112, 112, 3))
    )
    flax_params = variables["params"]

    sd = {
        "stn.features.0.0.weight": torch.zeros(16, 3, 3, 3),
        "stn.features.0.1.weight": torch.ones(16),
        "stn.features.0.1.bias": torch.zeros(16),
        "stn.features.0.1.running_mean": torch.zeros(16),
        "stn.features.0.1.running_var": torch.ones(16),
        # block 1 (features.1) = bottleneck 0: pw 16->16, dw k3, se=False
        "stn.features.1.conv.0.weight": torch.zeros(16, 16, 1, 1),
        "stn.features.1.conv.1.weight": torch.ones(16),
        "stn.features.1.conv.1.bias": torch.zeros(16),
        "stn.features.1.conv.1.running_mean": torch.zeros(16),
        "stn.features.1.conv.1.running_var": torch.ones(16),
        "stn.features.1.conv.3.weight": torch.zeros(16, 1, 3, 3),
        "stn.features.1.conv.4.weight": torch.ones(16),
        "stn.features.1.conv.4.bias": torch.zeros(16),
        "stn.features.1.conv.4.running_mean": torch.zeros(16),
        "stn.features.1.conv.4.running_var": torch.ones(16),
        "stn.features.1.conv.7.weight": torch.zeros(16, 16, 1, 1),
        "stn.features.1.conv.8.weight": torch.ones(16),
        "stn.features.1.conv.8.bias": torch.zeros(16),
        "stn.features.1.conv.8.running_mean": torch.zeros(16),
        "stn.features.1.conv.8.running_var": torch.ones(16),
        # SE example: block 4 (features.4) has se=True with exp 72
        "stn.features.4.conv.5.fc.0.weight": torch.zeros(18, 72),
        "stn.features.4.conv.5.fc.2.weight": torch.zeros(72, 18),
    }
    params, stats = import_torch_state_dict(sd)
    lm = params["landmark"]
    assert (
        lm["stn"]["stem"]["conv"]["kernel"].shape
        == flax_params["stn"]["stem"]["conv"]["kernel"].shape
    )
    assert (
        lm["stn"]["block_0"]["dw"]["kernel"].shape
        == flax_params["stn"]["block_0"]["dw"]["kernel"].shape
    )
    assert (
        lm["stn"]["block_3"]["se"]["fc1"]["kernel"].shape
        == flax_params["stn"]["block_3"]["se"]["fc1"]["kernel"].shape
    )
    assert (
        stats["landmark"]["stn"]["stem"]["norm"]["bn"]["mean"].shape
        == variables["batch_stats"]["stn"]["stem"]["norm"]["bn"]["mean"].shape
    )


def test_merge_params_filtered():
    base = {"stn": {"w": jnp.zeros(3)}, "head": {"w": jnp.zeros(3)}}
    update = {"stn": {"w": jnp.ones(3)}, "head": {"w": jnp.ones(3)}}
    out = merge_params(base, update, filter_substrings=["stn"])
    assert float(out["stn"]["w"].sum()) == 3.0
    assert float(out["head"]["w"].sum()) == 0.0


def test_dino_head_import():
    import torch

    sd = {
        "mlp.0.weight": torch.zeros(32, 8),
        "mlp.0.bias": torch.zeros(32),
        "mlp.2.weight": torch.zeros(32, 32),
        "mlp.2.bias": torch.zeros(32),
        "mlp.4.weight": torch.zeros(16, 32),
        "mlp.4.bias": torch.zeros(16),
        "last_layer.weight_g": torch.ones(64, 1),
        "last_layer.weight_v": torch.zeros(64, 16),
    }
    params, _ = import_torch_state_dict(sd)
    assert params["mlp_0"]["kernel"].shape == (8, 32)
    assert params["mlp_2"]["kernel"].shape == (16, 32)[::-1]
    assert params["last_layer_g"].shape == (64, 1)
    assert params["last_layer_v"].shape == (64, 16)


def test_meters_and_loggers(tmp_path):
    m = SmoothedValue(window_size=3)
    for v in (1, 2, 3, 4):
        m.update(v)
    assert m.median == 3 and m.global_avg == 2.5
    a = AverageMeter()
    a.update(2, n=2)
    a.update(4)
    assert a.avg == pytest.approx(8 / 3)

    logger = MetricLogger()
    logger.update(loss=1.0)
    assert "loss" in str(logger)

    j = JSONLLogger(str(tmp_path / "log.txt"))
    j.write({"epoch": 0, "loss": 1.0})
    import json

    rec = json.loads(open(tmp_path / "log.txt").read())
    assert rec["epoch"] == 0

    tb = TensorBoardWriter(str(tmp_path / "tb"))
    tb.add_scalar("loss", 0.5, 1)
    tb.close()
    import os

    files = os.listdir(tmp_path / "tb")
    assert len(files) == 1 and os.path.getsize(tmp_path / "tb" / files[0]) > 0


def test_need_save_semantics():
    highest = [0.0, 0.0, 0.0]
    assert need_save([0.99, 0.5, 0.5], highest)  # first: improves + >0.98
    assert not need_save([0.97, 0.4, 0.4], highest)  # worse everywhere


def test_count_params():
    assert count_params({"a": jnp.zeros((2, 3)), "b": jnp.zeros(5)}) == 11


def test_import_strict_raises_on_unknown_key():
    """A typo'd or novel-dialect key must fail LOUDLY in strict mode, and be
    reported in .skipped otherwise — never a silent half-import."""
    import numpy as np
    import pytest

    from lafs_cvpr2024_tpu.train.checkpoint import import_torch_state_dict

    sd = {
        "cls_token": np.zeros((1, 1, 8), np.float32),
        "transfromer.layers.0.0.fn.norm.weight": np.ones(8, np.float32),  # typo
        "stn.features.0.0.num_batches_tracked": np.zeros((), np.int64),  # buffer
    }
    imp = import_torch_state_dict(sd)
    assert imp.consumed == {"cls_token"}
    assert imp.skipped == {"transfromer.layers.0.0.fn.norm.weight"}
    assert imp.buffers == {"stn.features.0.0.num_batches_tracked"}
    assert "skipped 1" in imp.summary()
    with pytest.raises(ValueError, match="unmapped"):
        import_torch_state_dict(sd, strict=True)


def test_import_head_scope_and_merge_unmatched():
    """MultiCropWrapper 'head.' keys route into a ('head', …) subtree; merge
    reports update paths missing from the model."""
    import numpy as np

    from lafs_cvpr2024_tpu.train.checkpoint import (
        import_torch_state_dict,
        merge_params,
    )

    sd = {
        "module.head.mlp.0.weight": np.ones((4, 8), np.float32),
        "module.head.last_layer.weight_g": np.ones(16, np.float32),
    }
    imp = import_torch_state_dict(sd, strict=True)
    assert imp.params["head"]["mlp_0"]["kernel"].shape == (8, 4)
    assert imp.params["head"]["last_layer_g"].shape == (16, 1)

    base = {"head": {"mlp_0": {"kernel": np.zeros((8, 4), np.float32)}}}
    missing = []
    merged = merge_params(base, imp.params, unmatched=missing)
    assert missing == ["head/last_layer_g"]
    assert float(merged["head"]["mlp_0"]["kernel"].sum()) == 32.0


def test_load_landmark_variables_orbax(tmp_path):
    """--landmark-path with an orbax with_land checkpoint: the landmark
    subtree (params + BN stats) lands in the frozen provider; a no-landmark
    checkpoint and a bogus path RAISE (a silently random landmark CNN would
    poison the SSL recipe — previously non-.pth paths were skipped quietly)."""
    from lafs_cvpr2024_tpu.models.partfvit import PartFViT, PartFViTConfig
    from lafs_cvpr2024_tpu.train.checkpoint import load_landmark_variables
    from lafs_cvpr2024_tpu.train.ssl import (
        SSLConfig,
        create_landmark_provider,
    )

    mcfg = PartFViTConfig(
        dim=64, depth=1, heads=1, dim_head=64, mlp_dim=128, num_patches=16,
        image_size=32, patch_size=8, stn_mode="small", with_land=True,
        loss_type="None", num_classes=0,
    )
    model = PartFViT(mcfg)
    variables = model.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 3))
    )
    ckpt = tmp_path / "stage1"
    save_checkpoint(str(ckpt), dict(variables), step=5)

    scfg = SSLConfig(model=PartFViTConfig(
        **{**mcfg.__dict__, "with_land": False}
    ))
    provider_vars = create_landmark_provider(scfg, jax.random.PRNGKey(2))
    loaded = load_landmark_variables(str(ckpt), provider_vars, log=lambda s: None)
    # every landmark leaf (params AND batch_stats) equals the checkpoint's
    src_p = variables["params"]["landmark"]
    dst_p = loaded["params"]["landmark"]
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        src_p, dst_p,
    )
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        variables["batch_stats"]["landmark"],
        loaded["batch_stats"]["landmark"],
    )
    # and it actually CHANGED the provider (random init != trained tree)
    assert not np.allclose(
        np.asarray(provider_vars["params"]["landmark"]["output_layer"]["kernel"]),
        np.asarray(dst_p["output_layer"]["kernel"]),
    )

    # no-landmark checkpoint: loud error
    nl_cfg = PartFViTConfig(**{**mcfg.__dict__, "with_land": False})
    nl_vars = PartFViT(nl_cfg).init(
        jax.random.PRNGKey(3), jnp.zeros((1, 32, 32, 3))
    )
    nl_ckpt = tmp_path / "ssl_only"
    save_checkpoint(str(nl_ckpt), dict(nl_vars), step=1)
    with pytest.raises(ValueError, match="no 'landmark' subtree"):
        load_landmark_variables(str(nl_ckpt), provider_vars, log=lambda s: None)

    # neither .pth nor a directory: loud error
    with pytest.raises(ValueError, match="expected a torch .pth"):
        load_landmark_variables(
            str(tmp_path / "nope.ckpt"), provider_vars, log=lambda s: None
        )

    # structurally mismatched landmark subtree (checkpoint stn_mode differs
    # from the SSL config's): merge_params would silently skip every
    # mismatched path, leaving the frozen provider at random init — the
    # strict(=True)-style coverage check must raise instead.
    mm_cfg = PartFViTConfig(**{**mcfg.__dict__, "stn_mode": "large"})
    mm_vars = PartFViT(mm_cfg).init(
        jax.random.PRNGKey(4), jnp.zeros((1, 32, 32, 3))
    )
    mm_ckpt = tmp_path / "stn_large"
    save_checkpoint(str(mm_ckpt), dict(mm_vars), step=2)
    with pytest.raises(ValueError, match="landmark leaves|shape mismatch"):
        load_landmark_variables(str(mm_ckpt), provider_vars, log=lambda s: None)

    # checkpoint missing landmark batch_stats entirely: also loud
    nb_vars = {"params": dict(variables["params"])}
    nb_ckpt = tmp_path / "no_bn_stats"
    save_checkpoint(str(nb_ckpt), nb_vars, step=3)
    with pytest.raises(ValueError, match="NOT overwritten"):
        load_landmark_variables(str(nb_ckpt), provider_vars, log=lambda s: None)
