"""Model export — the TPU-native analogue of the reference's ONNX helper
(``IJB_evaluation.py:594-616``): serialize the jitted embedding function as
portable StableHLO via ``jax.export`` (loadable from any JAX/XLA runtime, or
convertible to TF SavedModel via jax2tf where TF is available)."""

from __future__ import annotations

import os
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp


def export_embedding_fn(
    apply_fn: Callable,
    variables,
    input_shape: Tuple[int, ...] = (1, 112, 112, 3),
    path: Optional[str] = None,
    input_dtype=jnp.float32,
) -> bytes:
    """Serialize ``apply_fn(variables, images) -> embeddings`` to StableHLO.

    Variables are baked in as constants (inference export). Returns the
    serialized bytes; also writes them to ``path`` when given.
    ``input_dtype=jnp.uint8`` for exports that bake the uint8→float input
    convention into the graph (serving-friendly single artifact).
    """
    from jax import export as jex

    def infer(images):
        return apply_fn(variables, images)

    exported = jex.export(jax.jit(infer))(
        jax.ShapeDtypeStruct(input_shape, input_dtype)
    )
    blob = exported.serialize()
    if path:
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        with open(path, "wb") as f:
            f.write(blob)
    return blob


def load_exported(path_or_bytes):
    """Deserialize an exported embedding fn; returns a callable."""
    from jax import export as jex

    blob = path_or_bytes
    if isinstance(path_or_bytes, str):
        with open(path_or_bytes, "rb") as f:
            blob = f.read()
    exported = jex.deserialize(blob)
    return lambda images: exported.call(images)
