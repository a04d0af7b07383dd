"""SSL step perf bisection on the real chip: one variant per process.

Usage: python benchmarks/bench_ssl_variants.py <variant> [batch]

Variants stack (each includes the previous unless noted):
  base      — round-1 configuration (no donation)
  donate    — donate the state buffers to the step
  land16    — + landmark CNN in bf16
  head16    — + DINOHead projection in bf16
  mom16     — + AdamW moments stored bf16 (fp32 math)
  fusedmlp  — + pallas fused-MLP kernel (ops/fused_mlp.py)
  fm_nodrop — fusedmlp + dropout/drop_path 0 (DIAGNOSTIC)
  fm_depth6 — fusedmlp + depth 6 (DIAGNOSTIC)
  nodrop    — head16 + dropout/drop_path 0 (DIAGNOSTIC: quantifies mask cost)
  depth6    — head16 + depth 6 (DIAGNOSTIC: per-layer vs fixed cost split)
  flash     — head16 + pallas flash attention (padded 197→256, segment mask)
  fusedattn — fusedmlp + whole-seq pallas attention (ops/fused_attention.py)
  fa_depth6 — fusedattn + depth 6 (DIAGNOSTIC: per-layer split w/ both kernels)
  fusedtail — fusedmlp + single-traversal clip+AdamW+EMA tail
  teacher16 — fusedtail + EMA teacher stored bf16 (stochastic-rounded cast)
  packedav  — fusedtail + head-pair-packed AV contraction (d_head geometry)
  packedqk  — fusedtail + head-pair-packed 128-wide QK^T (d_head geometry)
  fusedln   — fusedtail + pre-MLP LayerNorm fused INTO the pallas MLP kernel
  teachdense — fusedln + teacher forward on the DENSE MLP lowering (the
             teacher graph is inference-only, where pallas measured slower)
  lnqkv     — fusedln + pre-ATTENTION LayerNorm fused into the QKV
             projection kernel (ops/fused_ln_linear.py)
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
jax.config.update("jax_default_prng_impl", "rbg")

import jax.numpy as jnp
import numpy as np


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "base"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from jax.sharding import Mesh

    from lafs_cvpr2024_tpu.models.partfvit import PartFViTConfig
    from lafs_cvpr2024_tpu.train.ssl import (
        SSLConfig,
        create_landmark_provider,
        create_ssl_state,
        make_ssl_train_step,
    )

    n_dev = len(jax.devices())
    mesh = Mesh(np.array(jax.devices()).reshape(n_dev, 1), ("data", "model"))

    donate = variant != "base"
    depth = 6 if variant in ("depth6", "fm_depth6", "fa_depth6") else 12
    dropout = 0.0 if variant in ("nodrop", "fm_nodrop") else 0.1
    land_dtype = jnp.float32 if variant in ("base", "donate") else jnp.bfloat16
    head_dtype = (
        jnp.float32 if variant in ("base", "donate", "land16") else jnp.bfloat16
    )

    cfg = SSLConfig(
        model=PartFViTConfig(
            dim=768, depth=depth, heads=11, dim_head=64, mlp_dim=2048,
            num_patches=196, with_land=False, loss_type="None", num_classes=0,
            dropout=dropout, emb_dropout=dropout,
            drop_path_rate=0.0 if variant in ("nodrop", "fm_nodrop") else 0.1,
            attn_impl=(
                "flash" if variant == "flash"
                else "fused" if variant.startswith(("fusedattn", "fa_"))
                else "packed_av" if variant == "packedav"
                else "packed_qk" if variant == "packedqk"
                else "lnqkv" if variant == "lnqkv"
                else "einsum"
            ),
            mlp_impl=(
                "fused_ln" if variant in ("fusedln", "teachdense", "lnqkv")
                else "fused"
                if variant.startswith(
                    ("fusedmlp", "fm_", "fusedattn", "fa_", "fusedtail",
                     "teacher16", "packed")
                )
                else "dense"
            ),
            gather_impl={"gxla": "gather", "gpallas": "pallas"}.get(variant, "mxu"),
            remat_policy={"rematdots": "dots", "rematall": "all"}.get(variant, "none"),
        ),
        out_dim=100000,
        local_crops_number=8,
        compute_dtype=jnp.bfloat16,
        landmark_dtype=land_dtype,
        head_dtype=head_dtype,
        moment_dtype=jnp.bfloat16
        if variant in ("mom16", "fusedmlp", "fusedtail", "teacher16",
                       "packedav", "packedqk", "fusedln", "teachdense",
                       "lnqkv")
        or variant.startswith(("fm_", "fusedattn", "fa_"))
        else jnp.float32,
        fused_tail=variant in ("fusedtail", "teacher16", "packedav",
                               "packedqk", "fusedln", "teachdense", "lnqkv"),
        teacher_mlp_impl="dense" if variant == "teachdense" else "same",
        teacher_dtype=jnp.bfloat16 if variant == "teacher16" else jnp.float32,
    )

    rng = jax.random.PRNGKey(0)
    state = jax.jit(lambda r: create_ssl_state(cfg, r))(rng)
    land = create_landmark_provider(cfg, jax.random.PRNGKey(1))
    step = make_ssl_train_step(cfg, mesh, donate=donate)

    b = batch * n_dev
    shape = (b, 112, 112, 3)
    k = jax.random.PRNGKey(2)
    gc = jax.random.uniform(k, (2, *shape), jnp.float32) * 2 - 1
    ga = jax.random.uniform(k, (2, *shape), jnp.float32) * 2 - 1
    lc = jax.random.uniform(k, (8, *shape), jnp.float32) * 2 - 1
    la = jax.random.uniform(k, (8, *shape), jnp.float32) * 2 - 1
    args = dict(
        lr=jnp.float32(5e-4), wd=jnp.float32(0.04), momentum=jnp.float32(0.996),
        teacher_temp=jnp.float32(0.04), freeze_last=jnp.float32(1.0),
    )

    state, m = step(state, land, gc, ga, lc, la, **args)
    loss0 = float(m["loss"])

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, land, gc, ga, lc, la, **args)
    loss = float(m["loss"])
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({
        "variant": variant, "batch": batch, "ms_per_step": round(dt * 1e3, 2),
        "imgs_per_sec_chip": round(b / dt / n_dev, 1),
        "loss0": round(loss0, 3), "loss": round(loss, 3),
    }))


if __name__ == "__main__":
    main()
