"""Serving-path throughput on the real chip: flagship Part-fViT behind
cli/serve_embeddings' unix-socket protocol, client pumping uint8 batches.

Measures end-to-end faces/s INCLUDING socket framing + host↔device
transfer (the deployment number), vs the raw jitted sweep (the device
ceiling, cf. IJB extraction in docs/PARITY.md).

Usage: python benchmarks/bench_serve.py [batch=256] [rounds=20]
       [dtype=bfloat16] [mode=raw|jpeg] [pipeline=1|0]

``mode=jpeg`` pumps JPEG crops + 5-pt landmarks (the production
detector→embedder request shape): the server Umeyama-aligns and decodes
through the native C++ thread pool; the wire carries ~10× fewer bytes.
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
    mode = sys.argv[4] if len(sys.argv) > 4 else "raw"
    assert mode in ("raw", "jpeg"), mode
    pipe = int(sys.argv[5]) if len(sys.argv) > 5 else 1

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
    client = EmbeddingClient(sock)  # noqa: F841 — import sanity
    # ONE connection streams all requests (the steady-state deployment
    # shape); hand-roll the streaming instead of client.embed's
    # connection-per-call
    import socket as socklib
    import struct

    from lafs_cvpr2024_tpu.cli.serve_embeddings import (
        MAGIC,
        MAGIC_JPEG,
        _recv_exact,
    )

    if mode == "jpeg":
        import io

        from PIL import Image

        from lafs_cvpr2024_tpu.eval.ijb import ARCFACE_SRC

        # production-like compressibility: faces are smooth, noise is the
        # JPEG worst case — low-frequency fields, not raw noise
        low = rng.integers(0, 255, (batch, 14, 14, 3), dtype=np.uint8)
        smooth = np.kron(
            low, np.ones((1, 8, 8, 1), np.uint8)
        )[:, :112, :112]
        jpegs = []
        for im in smooth:
            buf = io.BytesIO()
            Image.fromarray(im).save(buf, "JPEG", quality=90)
            jpegs.append(buf.getvalue())
        blob = b"".join(jpegs)
        lens = np.asarray([len(j) for j in jpegs], np.uint32)
        lms = np.tile(ARCFACE_SRC, (batch, 1, 1)).astype(np.float32)
        payload = (
            struct.pack("<III", MAGIC_JPEG, batch, len(blob))
            + lens.tobytes() + lms.tobytes() + blob
        )
        wire_mb = len(payload) / 1e6
    else:
        payload = (
            struct.pack("<IIII", MAGIC, batch, 112, 112) + imgs.tobytes()
        )
        wire_mb = len(payload) / 1e6

    with socklib.socket(socklib.AF_UNIX, socklib.SOCK_STREAM) as s:
        s.connect(sock)

        def read():
            n, d = struct.unpack("<II", _recv_exact(s, 8))
            return np.frombuffer(_recv_exact(s, n * d * 4), np.float32)

        s.sendall(payload)
        read()  # steady-state warmup over the wire
        t0 = time.perf_counter()
        if pipe:
            # ONE request in flight ahead of the reads: the server decodes
            # request i+1 while the chip embeds request i (handle()'s
            # overlap path). This is the steady-state deployment shape.
            s.sendall(payload)
            for _ in range(rounds - 1):
                s.sendall(payload)
                emb = read()
            emb = read()
        else:
            for _ in range(rounds):
                s.sendall(payload)
                emb = read()
        dt = (time.perf_counter() - t0) / rounds
    assert np.isfinite(emb).all()
    print(json.dumps({
        "metric": "serving faces/s (unix socket, flip-fused, incl. framing)",
        "batch": batch, "dtype": dtype, "mode": mode,
        "pipelined": bool(pipe),
        "wire_mb_per_request": round(wire_mb, 2),
        "ms_per_request": round(dt * 1e3, 1),
        "faces_per_sec": round(batch / dt, 1),
    }))
    t.join(timeout=30)


if __name__ == "__main__":
    main()
