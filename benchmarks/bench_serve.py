"""Serving-path throughput on the real chip: flagship Part-fViT behind
cli/serve_embeddings' unix-socket protocol, client pumping uint8 batches.

Measures end-to-end faces/s INCLUDING socket framing + host↔device
transfer (the deployment number), vs the raw jitted sweep (the device
ceiling, cf. IJB extraction in docs/PARITY.md).

Usage: python benchmarks/bench_serve.py [batch=256] [rounds=20]
"""

import json
import os
import sys
import threading
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

import jax.numpy as jnp
import numpy as np


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    dtype = sys.argv[3] if len(sys.argv) > 3 else "bfloat16"

    from lafs_cvpr2024_tpu.cli.serve_embeddings import (
        EmbeddingClient,
        main as serve_main,
    )
    from lafs_cvpr2024_tpu.models.partfvit import PartFViT, PartFViTConfig
    from lafs_cvpr2024_tpu.train.checkpoint import save_checkpoint

    cfg = PartFViTConfig(num_classes=0, loss_type="None", with_land=True)
    model = PartFViT(cfg)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 112, 112, 3))
    )
    ckpt = "/tmp/lafs_serve_bench_ckpt"
    save_checkpoint(ckpt, variables, step=0)

    sock = "/tmp/lafs_serve_bench.sock"
    argv = ["--checkpoint", ckpt, "--socket", sock,
            "--batch-size", str(batch), "--max-requests", "1",
            "--eval-dtype", dtype]
    t = threading.Thread(target=serve_main, args=(argv,), daemon=True)
    t.start()
    deadline = time.time() + 900
    while not os.path.exists(sock):
        assert time.time() < deadline, "server did not come up"
        time.sleep(0.5)

    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, (batch, 112, 112, 3), dtype=np.uint8)
    client = EmbeddingClient(sock)
    # ONE connection streams all requests (the steady-state deployment
    # shape); hand-roll the streaming instead of client.embed's
    # connection-per-call
    import socket as socklib
    import struct

    from lafs_cvpr2024_tpu.cli.serve_embeddings import MAGIC, _recv_exact

    with socklib.socket(socklib.AF_UNIX, socklib.SOCK_STREAM) as s:
        s.connect(sock)

        def one():
            s.sendall(struct.pack("<IIII", MAGIC, batch, 112, 112)
                      + imgs.tobytes())
            n, d = struct.unpack("<II", _recv_exact(s, 8))
            return np.frombuffer(_recv_exact(s, n * d * 4), np.float32)

        one()  # steady-state warmup over the wire
        t0 = time.perf_counter()
        for _ in range(rounds):
            emb = one()
        dt = (time.perf_counter() - t0) / rounds
    assert np.isfinite(emb).all()
    print(json.dumps({
        "metric": "serving faces/s (unix socket, flip-fused, incl. framing)",
        "batch": batch, "dtype": dtype,
        "ms_per_request": round(dt * 1e3, 1),
        "faces_per_sec": round(batch / dt, 1),
    }))
    t.join(timeout=30)


if __name__ == "__main__":
    main()
