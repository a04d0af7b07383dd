"""Device mesh construction and sharding helpers.

TPU-native replacement for the reference's NCCL process-group runtime
(``utils.py:423-499``): instead of one process per GPU with DDP allreduce,
a single jitted train step runs SPMD over an explicit ``jax.sharding.Mesh``.

Axes:
- ``data``  — batch (data parallelism; grad psum rides ICI)
- ``model`` — classifier classes (tensor parallelism for the margin head,
  the TP-shaped component of the reference — ``ViT_face.py:54-64``)

Multi-host: ``jax.distributed.initialize()`` + the same mesh over all
processes; per-host data feeding assembles each process's local rows into a
global array via ``global_batch`` (host_local_array_to_global_array).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    data: int = -1,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Create a (data, model) mesh. ``data=-1`` uses all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def create_multislice_mesh(
    model: int = 1,
    slices: Optional[int] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Pod-scale mesh for MULTI-SLICE topologies (several ICI-connected
    slices joined by DCN): same ``("data", "model")`` axes as
    :func:`create_mesh`, so every train step / sharding helper works
    unchanged — only the DEVICE ORDER differs.

    The data axis is laid out slice-major (slice index is the
    slowest-varying coordinate), which is what lets XLA lower the step's
    ``psum('data')`` into a hierarchical reduce: intra-slice partial sums
    ride ICI, and only one partial per slice crosses DCN — the TPU-native
    analogue of NCCL's rack-aware allreduce trees (reference runtime:
    ``utils.py:423-499``). The ``model`` axis (class-sharded CosFace,
    per-example activation psums) is kept INSIDE a slice — its softmax
    statistics exchange on every step and must never cross DCN.

    On real multi-slice TPU the layout comes from
    ``mesh_utils.create_hybrid_device_mesh`` (reads each device's
    ``slice_index``); ``slices`` overrides/enables the grouping on
    backends without slice metadata (CPU simulation: contiguous groups).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if slices is None:
        idx = {getattr(d, "slice_index", None) for d in devices}
        if None in idx or len(idx) <= 1:
            return create_mesh(model=model, devices=devices)
        slices = len(idx)
    assert n % slices == 0, f"{n} devices not divisible by {slices} slices"
    per_slice = n // slices
    assert per_slice % model == 0, (
        f"model={model} must divide the {per_slice} devices of one slice "
        "(the class-sharded head's psums must stay on ICI)"
    )
    if all(getattr(d, "slice_index", None) is not None for d in devices):
        from jax.experimental import mesh_utils

        arr = mesh_utils.create_hybrid_device_mesh(
            (per_slice // model, model), (slices, 1), devices=devices
        )
    else:
        # simulation fallback: contiguous device groups are "slices". For a
        # flat device list the slice-major data-axis layout IS the plain
        # row-major reshape (rows [s*per_slice/model, (s+1)*...) belong to
        # slice s), so this is create_mesh's array — the asserts above are
        # what this branch adds.
        arr = np.asarray(devices).reshape(n // model, model)
    return Mesh(arr, ("data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding for input arrays."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def classifier_sharding(mesh: Mesh) -> NamedSharding:
    """Margin-head weight (C, D): classes sharded over the model axis."""
    return NamedSharding(mesh, P("model", None))


def shard_batch(mesh: Mesh, batch):
    """Place a host batch onto the mesh, sharded along the data axis."""
    return jax.device_put(batch, data_sharding(mesh))


def global_batch(mesh: Mesh, local_batch, spec: P = P("data")):
    """Multi-host batch assembly: each process contributes its LOCAL rows and
    receives a global jax.Array sharded per ``spec`` (the per-host feeding
    that replaces DistributedSampler + DDP's implicit global batch).

    Single-process: plain device_put."""
    if jax.process_count() == 1:
        return jax.device_put(local_batch, NamedSharding(mesh, spec))
    from jax.experimental import multihost_utils

    return multihost_utils.host_local_array_to_global_array(
        local_batch, mesh, spec
    )


def sharded_batch_apply(fn, mesh: Mesh):
    """Scale a jitted eval fn ``fn(variables, batch) -> out`` across the
    mesh's data axis: the host batch is padded to a multiple of the axis,
    sharded over it (GSPMD data parallelism — no shard_map needed for a pure
    forward), and the output unpadded. Replaces the reference's
    single-process eval loop for pod-slice sweeps (perform_val / the 227k-
    image IJB extraction, ``IJB_evaluation.py:408-495``). Single-device
    meshes pass through unchanged.

    Multi-process: EVERY process must call ``wrapped`` with the SAME full
    batch (eval data is host-replicated — each rank reads the same bin/
    protocol files). Each device computes only its global row slice, and the
    output is all-gathered so every host returns the full result — the
    collective rides the same mesh the train step uses."""
    n_data = int(mesh.shape.get("data", 1))
    if mesh.size == 1:
        return fn
    multi = jax.process_count() > 1
    sharding = NamedSharding(mesh, P("data"))
    replicated = NamedSharding(mesh, P())
    # (original tree, mesh-replicated copy) — keyed by identity with a
    # strong reference held, so a recycled id() can never alias a new tree
    cache = [None, None, None]

    def wrapped(variables, batch):
        # variables committed to a single device (e.g. an orbax restore)
        # conflict with the mesh-sharded batch — replicate them once
        if cache[0] is not variables:
            cache[0] = variables
            if multi:
                # host values are identical per process (checkpoint restore):
                # reinterpret them as replicated GLOBAL arrays (no transfer
                # beyond the local device_put)
                from jax.experimental import multihost_utils

                cache[1] = multihost_utils.host_local_array_to_global_array(
                    variables, mesh, P()
                )
            else:
                cache[1] = jax.device_put(variables, replicated)
        variables = cache[1]
        batch = np.asarray(batch)
        n = batch.shape[0]
        pad = (-n) % n_data
        if pad:
            batch = np.concatenate([batch, np.repeat(batch[-1:], pad, axis=0)])
        if not multi:
            out = fn(variables, jax.device_put(batch, sharding))
            return np.asarray(out)[:n] if pad else out
        # each device materializes ONLY its global row slice (the callback
        # runs for addressable shards; `idx` is the device's global index
        # into the padded batch — no cross-process concat-order pitfalls)
        garr = jax.make_array_from_callback(
            batch.shape, sharding, lambda idx: batch[idx]
        )
        out = fn(variables, garr)
        if cache[2] is None:
            # compiled all-gather to fully-replicated (so np.asarray works
            # on every host); cached once — eval calls this per batch
            cache[2] = jax.jit(
                lambda t: t,
                out_shardings=jax.tree_util.tree_map(lambda _: replicated, out),
            )
        out = jax.tree_util.tree_map(np.asarray, cache[2](out))
        return jax.tree_util.tree_map(lambda o: o[:n], out) if pad else out

    return wrapped


def fold_in_shard(rng: jax.Array, axis_name: str = "data") -> jax.Array:
    """Decorrelate per-shard randomness inside a shard_map'd step.

    Folds the shard's axis index into the key so each data shard draws
    independent augmentation / dropout / jitter / mask randomness — the
    analogue of the reference's independent per-DDP-worker torch RNG
    (``lafs_train.py:186-193``). Without this, sample i on every shard gets
    identical crops/jitter, silently cutting randomness diversity by the
    data-parallel factor. Only valid under shard_map/pmap; do NOT fold the
    'model' axis (class shards must see identical mixup/dropout draws).
    """
    return jax.random.fold_in(rng, jax.lax.axis_index(axis_name))


def is_main_process() -> bool:
    """rank-0 gating (reference ``utils.py:443-449``)."""
    return jax.process_index() == 0


def maybe_initialize_distributed():
    """Multi-host init (reference ``init_distributed_mode``). No-op when the
    runtime is single-process or already initialized.

    ORDER MATTERS: the env check runs FIRST — ``jax.process_count()``
    initializes the XLA backend, after which ``jax.distributed.initialize``
    raises ("must be called before any JAX calls"). So probing
    process_count to decide whether to initialize would always crash the
    one launch this function exists for; instead initialize straight off
    the env var and treat orbax/launcher double-init as a no-op."""
    import os

    if "COORDINATOR_ADDRESS" not in os.environ:
        return
    try:
        jax.distributed.initialize()
    except RuntimeError as e:
        # already initialized (by the launcher or an earlier call): fine.
        # Anything else (rendezvous failure, bad address) must surface.
        if "already" not in str(e) and "before any JAX" not in str(e):
            raise
        if "before any JAX" in str(e) and jax.process_count() <= 1:
            # backend got initialized single-process BEFORE this call —
            # the pod join is impossible now; tell the user loudly
            raise RuntimeError(
                "COORDINATOR_ADDRESS is set but the XLA backend was "
                "already initialized single-process — call "
                "maybe_initialize_distributed() (or jax.distributed."
                "initialize()) before ANY other jax API use"
            ) from e
