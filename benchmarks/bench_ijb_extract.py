"""IJB feature-extraction throughput: flip-test double embedding, flagship
Part-fViT (with_land). Reported as faces/sec/chip (each face = 2 forwards)."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
import jax.numpy as jnp
import numpy as np

from lafs_cvpr2024_tpu.models.partfvit import PartFViT, PartFViTConfig

B = 256  # faces per batch → 512 forwards with flips

def main():
    cfg = PartFViTConfig(
        dim=768, depth=12, heads=11, dim_head=64, mlp_dim=2048,
        num_patches=196, with_land=True, loss_type="None", num_classes=0,
        # NOT mlp_impl="fused": measured SLOWER here (212 vs 193 ms/batch) —
        # in the inference-only with_land graph the custom-call layout
        # constraints cost more than the fused kernel saves (docs/PERF.md)
    )
    model = PartFViT(cfg)
    x = jnp.zeros((2 * B, 112, 112, 3), jnp.bfloat16)
    var = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.zeros((2, 112, 112, 3)))
    cvar = jax.tree.map(
        lambda p: p.astype(jnp.bfloat16) if jnp.issubdtype(p.dtype, jnp.floating) else p,
        var,
    )

    @jax.jit
    def embed(batch):
        return model.apply(cvar, batch / 255.0 - 0.5, train=False)

    batch = jax.random.uniform(jax.random.PRNGKey(1), (2 * B, 112, 112, 3),
                               jnp.bfloat16, 0, 255)
    t0 = time.perf_counter()
    out = embed(batch)
    _ = np.asarray(out)[0, 0]
    print("compile+1st:", round(time.perf_counter() - t0, 1), "s")
    t0 = time.perf_counter()
    for _ in range(20):
        out = embed(batch)
    _ = np.asarray(out)[0, 0]
    dt = (time.perf_counter() - t0) / 20
    print(f"IJB extract: {dt*1000:.1f} ms / {B} faces (flip-test) -> "
          f"{B/dt:.0f} faces/s/chip")

if __name__ == "__main__":
    main()
