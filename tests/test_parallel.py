"""Sharded-classifier CE and mesh tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from lafs_cvpr2024_tpu.models.heads import cosface_logits
from lafs_cvpr2024_tpu.parallel.mesh import create_mesh, data_sharding
from lafs_cvpr2024_tpu.parallel.sharded_cosface import (
    cosface_ce_sharded,
    local_margin_logits,
    sharded_softmax_ce,
)
from lafs_cvpr2024_tpu.train.losses import softmax_cross_entropy


def _reference_cosface_ce(emb, w, labels, num_classes, s=64.0, m=0.4):
    logits = cosface_logits(emb, w, labels, s, m, num_classes)
    onehot = jax.nn.one_hot(labels, num_classes)
    return softmax_cross_entropy(logits, onehot)


def test_sharded_cosface_matches_unsharded():
    rng = np.random.default_rng(0)
    B, D, C = 16, 32, 64
    emb = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((C, D)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, C, B))

    mesh = Mesh(np.array(jax.devices()).reshape(2, 4), ("data", "model"))

    def f(emb, w_shard, labels):
        return cosface_ce_sharded(emb, w_shard, labels, num_classes_global=C)

    sharded = jax.jit(
        jax.shard_map(
            f, mesh=mesh,
            in_specs=(P(), P("model", None), P()),
            out_specs=P(),
            check_vma=False,  # loss IS replicated (psum over both axes);
                              # the static check can't infer it
        )
    )
    got = float(sharded(emb, w, labels))
    want = float(_reference_cosface_ce(emb, w, labels, C))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_sharded_cosface_dp_tp_combined():
    """data axis shards the batch, model axis shards the classes; per-shard
    loss mean must be psum'd over data for the global mean."""
    rng = np.random.default_rng(1)
    B, D, C = 8, 16, 32
    emb = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((C, D)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, C, B))
    mesh = Mesh(np.array(jax.devices()).reshape(2, 4), ("data", "model"))

    def f(emb, w_shard, labels):
        loss = cosface_ce_sharded(emb, w_shard, labels, num_classes_global=C)
        return jax.lax.pmean(loss, "data")

    sharded = jax.jit(
        jax.shard_map(
            f, mesh=mesh,
            in_specs=(P("data"), P("model", None), P("data")),
            out_specs=P(),
            check_vma=False,  # loss IS replicated (psum over both axes);
                              # the static check can't infer it
        )
    )
    got = float(sharded(emb, w, labels))
    want = float(_reference_cosface_ce(emb, w, labels, C))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_sharded_soft_labels():
    rng = np.random.default_rng(2)
    B, D, C = 4, 8, 16
    emb = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((C, D)).astype(np.float32))
    soft = jax.nn.softmax(jnp.asarray(rng.standard_normal((B, C)).astype(np.float32)))
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(1, 4), ("data", "model"))

    def f(emb, w_shard, soft_shard):
        return cosface_ce_sharded(emb, w_shard, soft_shard)

    sharded = jax.jit(
        jax.shard_map(
            f, mesh=mesh,
            in_specs=(P(), P("model", None), P(None, "model")),
            out_specs=P(),
            check_vma=False,  # loss IS replicated (psum over both axes);
                              # the static check can't infer it
        )
    )
    got = float(sharded(emb, w, soft))
    logits = cosface_logits(emb, w, soft)
    want = float(softmax_cross_entropy(logits, soft))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_create_mesh():
    mesh = create_mesh(data=4, model=2)
    assert mesh.shape == {"data": 4, "model": 2}
    mesh = create_mesh(model=2)
    assert mesh.shape["data"] == len(jax.devices()) // 2
    sh = data_sharding(mesh)
    assert sh.spec == P("data")


def test_sharded_eval_matches_single_device():
    """make_embed_fn(cfg, mesh) pads + shards eval batches over the data
    axis; accuracy and embeddings must be identical to the single-device
    sweep (VERDICT: eval sweeps must scale with the mesh)."""
    import numpy as np

    from lafs_cvpr2024_tpu.eval.verification import perform_val
    from lafs_cvpr2024_tpu.models.partfvit import PartFViTConfig
    from lafs_cvpr2024_tpu.parallel.mesh import create_mesh
    from lafs_cvpr2024_tpu.train.supervised import (
        SupervisedConfig,
        create_state,
        make_embed_fn,
    )

    cfg = SupervisedConfig(
        model=PartFViTConfig(
            image_size=32, dim=16, depth=1, heads=2, dim_head=8, mlp_dim=32,
            num_patches=16, patch_size=8, num_classes=8, with_land=False,
            use_standcoord=True, stn_mode="small",
        ),
        compute_dtype=jnp.float32,
    )
    state = jax.jit(lambda r: create_state(cfg, r))(jax.random.PRNGKey(0))
    variables = {"params": state.params}

    rng = np.random.default_rng(0)
    n_pairs = 9  # odd chunks → exercises the pad path (18 % 8 != 0)
    data = rng.integers(0, 255, (2, n_pairs * 2, 32, 32, 3)).astype(np.uint8)
    issame = np.asarray([i % 2 == 0 for i in range(n_pairs)])

    single = make_embed_fn(cfg)
    sharded = make_embed_fn(cfg, create_mesh(model=1))
    batch = np.zeros((6, 32, 32, 3), np.float32)
    np.testing.assert_allclose(
        np.asarray(sharded(variables, batch)),
        np.asarray(single(variables, jnp.asarray(batch))),
        atol=1e-5,
    )
    res_1 = perform_val(
        lambda b: single(variables, jnp.asarray(b)), data, issame, batch_size=4
    )
    res_n = perform_val(
        lambda b: sharded(variables, b), data, issame, batch_size=4
    )
    assert res_1.accuracy == res_n.accuracy
    np.testing.assert_allclose(res_1.xnorm, res_n.xnorm, rtol=1e-5)


def test_device_scale_eval_matches_host_scale():
    """perform_val(device_scale=True) + make_embed_fn(input_scale=...) must
    reproduce the host-scaled sweep exactly (uint8 ships, scaling on device
    — 4x less transfer)."""
    import numpy as np

    from lafs_cvpr2024_tpu.eval.verification import perform_val
    from lafs_cvpr2024_tpu.models.partfvit import PartFViTConfig
    from lafs_cvpr2024_tpu.train.supervised import (
        SupervisedConfig,
        create_state,
        make_embed_fn,
    )

    cfg = SupervisedConfig(
        model=PartFViTConfig(
            image_size=32, dim=16, depth=1, heads=2, dim_head=8, mlp_dim=32,
            num_patches=16, patch_size=8, num_classes=8, with_land=False,
            use_standcoord=True, stn_mode="small",
        ),
        compute_dtype=jnp.float32,
    )
    state = jax.jit(lambda r: create_state(cfg, r))(jax.random.PRNGKey(0))
    variables = {"params": state.params}
    rng = np.random.default_rng(1)
    data = rng.integers(0, 255, (2, 8, 32, 32, 3)).astype(np.uint8)
    issame = np.asarray([True, False, True, False])

    host = make_embed_fn(cfg)
    dev = make_embed_fn(cfg, input_scale="half")
    res_h = perform_val(
        lambda b: host(variables, jnp.asarray(b)), data, issame, batch_size=4
    )
    res_d = perform_val(
        lambda b: dev(variables, jnp.asarray(b)), data, issame, batch_size=4,
        device_scale=True,
    )
    assert res_h.accuracy == res_d.accuracy
    np.testing.assert_allclose(res_h.xnorm, res_d.xnorm, rtol=1e-5)


def test_sharded_batch_apply_identity_cache():
    """The replicated-variables cache must key on object IDENTITY with a
    strong reference held — a recycled id() for a different tree must not
    serve the stale replicated copy (ADVICE r2 #3)."""
    from lafs_cvpr2024_tpu.parallel.mesh import create_mesh, sharded_batch_apply

    mesh = create_mesh(model=1)

    def fn(variables, batch):
        return batch * variables["scale"]

    wrapped = sharded_batch_apply(jax.jit(fn), mesh)
    batch = np.ones((8, 4), np.float32)
    v1 = {"scale": jnp.float32(2.0)}
    np.testing.assert_allclose(np.asarray(wrapped(v1, batch)), 2.0)
    del v1  # allow CPython to recycle the id
    for scale in (3.0, 5.0):
        v = {"scale": jnp.float32(scale)}
        np.testing.assert_allclose(np.asarray(wrapped(v, batch)), scale)
        del v


def test_create_multislice_mesh_layout_and_semantics():
    """Multi-slice mesh: same axis names as create_mesh, slice-major data
    axis (each slice's devices contiguous along 'data' so intra-slice
    psum partials ride ICI), model axis inside a slice; a psum over 'data'
    still sums ALL shards (DCN is a layout concern, not a semantics one)."""
    from lafs_cvpr2024_tpu.parallel.mesh import create_multislice_mesh

    mesh = create_multislice_mesh(model=2, slices=2)
    assert mesh.axis_names == ("data", "model")
    assert mesh.shape == {"data": 4, "model": 2}
    devs = list(jax.devices())
    arr = mesh.devices
    # simulation fallback groups contiguously: rows 0-1 = slice 0 devices
    assert {d.id for d in arr[:2].ravel()} == {d.id for d in devs[:4]}
    assert {d.id for d in arr[2:].ravel()} == {d.id for d in devs[4:]}

    # semantics identical to the flat mesh: grad-style psum over 'data'
    # sums the per-shard partials from EVERY shard, both slices included
    @jax.jit
    def psum_step(x):
        f = jax.shard_map(
            lambda v: jax.lax.psum(v.sum(), "data"),
            mesh=mesh, in_specs=P("data"), out_specs=P(),
        )
        return f(x)

    x = jnp.arange(8, dtype=jnp.float32).reshape(8, 1)
    np.testing.assert_allclose(np.asarray(psum_step(x)), float(x.sum()))

    # no-slice-metadata path without explicit slices: plain create_mesh
    flat = create_multislice_mesh(model=1)
    assert flat.shape == {"data": len(devs), "model": 1}


def test_multislice_mesh_runs_supervised_step():
    """The supervised shard_map train step runs unchanged on a multislice
    (2x2x2) mesh — the whole point of keeping the axis names stable."""
    from lafs_cvpr2024_tpu.models.partfvit import PartFViTConfig
    from lafs_cvpr2024_tpu.ops.mixup import MixupConfig
    from lafs_cvpr2024_tpu.parallel.mesh import create_multislice_mesh
    from lafs_cvpr2024_tpu.train.supervised import (
        SupervisedConfig, create_classifier, create_state, make_train_step,
    )

    mesh = create_multislice_mesh(model=2, slices=2)
    cfg = SupervisedConfig(
        model=PartFViTConfig(
            dim=32, depth=1, heads=2, dim_head=16, mlp_dim=64,
            num_patches=36, image_size=48, num_classes=16,
            loss_type="CosFace", stn_mode="small",
        ),
        mixup=MixupConfig(num_classes=16),
        compute_dtype=jnp.float32,
        acc_step=1,
    )
    state = jax.jit(lambda r: create_state(cfg, r))(jax.random.PRNGKey(0))
    cls_w, cls_opt = create_classifier(cfg, jax.random.PRNGKey(1))
    step = make_train_step(cfg, mesh)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(-1, 1, (8, 48, 48, 3)).astype(np.float32))
    labels = jnp.arange(8, dtype=jnp.int32) % 16
    state, cls_w, cls_opt, metrics = step(
        state, cls_w, cls_opt, imgs, labels, 1e-3
    )
    assert np.isfinite(float(metrics["loss"]))
