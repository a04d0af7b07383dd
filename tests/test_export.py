"""StableHLO export round-trip."""

import jax
import jax.numpy as jnp
import numpy as np

from lafs_cvpr2024_tpu.models import PartFViT, PartFViTConfig
from lafs_cvpr2024_tpu.utils.export import export_embedding_fn, load_exported


def test_export_roundtrip(tmp_path):
    cfg = PartFViTConfig(
        image_size=48, dim=32, depth=1, heads=2, dim_head=16, mlp_dim=64,
        num_patches=36, with_land=False, use_standcoord=True,
        loss_type="None", num_classes=0,
    )
    model = PartFViT(cfg)
    x = jnp.ones((1, 48, 48, 3))
    var = jax.jit(model.init)(jax.random.PRNGKey(0), x)

    path = str(tmp_path / "model.stablehlo")
    blob = export_embedding_fn(
        lambda v, imgs: model.apply(v, imgs), var, (1, 48, 48, 3), path
    )
    assert len(blob) > 1000

    fn = load_exported(path)
    out = np.asarray(fn(x))
    ref = np.asarray(model.apply(var, x))
    np.testing.assert_allclose(out, ref, atol=1e-5)
