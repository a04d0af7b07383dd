"""Embedding SERVER — a long-lived warm-compiled face-embedding service.

The reference has no serving story (its IJB script re-loads the model per
run); deployments re-embed probes continuously. This CLI loads a checkpoint
once, AOT-warms the jitted embed function at a FIXED batch shape (no
recompiles in steady state — partial batches are padded up), and serves
requests over a unix-domain socket with a minimal length-prefixed protocol:

  request:  header ``<u32 magic=0x4C414653> <u32 n> <u32 h> <u32 w>``
            followed by ``n*h*w*3`` bytes of uint8 RGB
  response: ``<u32 n> <u32 d>`` followed by ``n*d`` float32 embeddings
            (flip-fused + L2-normalized, same convention as
            ``cli/extract_embeddings``)
  error:    ``<u32 0xFFFFFFFF> <u32 len> <utf-8 message>``

One connection may stream many requests; the server handles connections
sequentially (the chip is the serial resource — queueing happens in the
socket backlog). ``serve_once``/``EmbeddingServer`` are importable for
tests and embedding into other processes.

Client example:
    from lafs_cvpr2024_tpu.cli.serve_embeddings import EmbeddingClient
    emb = EmbeddingClient("/tmp/lafs.sock").embed(uint8_batch)
"""

from __future__ import annotations

import argparse
import os
import socket
import struct

import numpy as np

MAGIC = 0x4C414653  # "LAFS"
ERR = 0xFFFFFFFF


def get_args(argv=None):
    p = argparse.ArgumentParser("lafs-tpu embedding server")
    p.add_argument("--checkpoint", required=True, help=".pth or orbax dir")
    p.add_argument("--socket", required=True, help="unix socket path")
    p.add_argument("--batch-size", type=int, default=256,
                   help="compiled batch shape; requests are padded up and "
                        "chunked down to it (no steady-state recompiles)")
    p.add_argument("--eval-dtype", default="bfloat16",
                   choices=["float32", "bfloat16"],
                   help="forward compute dtype; bf16 ≈ 2x MXU throughput "
                        "(embeddings agree with fp32 to cosine >~ 1-1e-3); "
                        "the documented 1,328 faces/s IJB ceiling is bf16")
    p.add_argument("--embedding-size", type=int, default=768)
    p.add_argument("--depth", type=int, default=12)
    p.add_argument("--heads", type=int, default=11)
    p.add_argument("--dim-head", type=int, default=64)
    p.add_argument("--mlp-dim", type=int, default=2048)
    p.add_argument("--num-patches", type=int, default=196)
    p.add_argument("--image-size", type=int, default=112)
    p.add_argument("--stn-mode", default="large", choices=["large", "small"])
    p.add_argument("--no-land", dest="with_land", action="store_false",
                   default=True)
    p.add_argument("--no-flip", dest="flip", action="store_false",
                   default=True)
    p.add_argument("--max-requests", type=int, default=0,
                   help="exit after N requests (0 = run forever); for tests")
    return p.parse_args(argv)


def _recv_exact(conn, n: int) -> bytes:
    buf = bytearray()
    while len(buf) < n:
        chunk = conn.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("peer closed mid-message")
        buf.extend(chunk)
    return bytes(buf)


class EmbeddingServer:
    """Warm-compiled embedding function behind a fixed batch shape."""

    def __init__(self, args):
        import jax
        import jax.numpy as jnp

        from ..models.partfvit import PartFViT, PartFViTConfig
        from ..parallel.mesh import create_mesh, sharded_batch_apply
        from ..train.checkpoint import (
            import_torch_state_dict,
            load_torch_file,
            merge_params,
            restore_eval_variables,
        )

        self.args = args
        cfg = PartFViTConfig(
            dim=args.embedding_size, depth=args.depth, heads=args.heads,
            dim_head=args.dim_head, mlp_dim=args.mlp_dim,
            num_patches=args.num_patches, image_size=args.image_size,
            stn_mode=args.stn_mode, with_land=args.with_land,
            loss_type="None", num_classes=0,
        )
        model = PartFViT(cfg)
        variables = jax.jit(model.init)(
            jax.random.PRNGKey(0),
            jnp.zeros((1, args.image_size, args.image_size, 3)),
        )
        if args.checkpoint.endswith(".pth"):
            sd = load_torch_file(args.checkpoint)
            imp = import_torch_state_dict(sd)
            print(f"[serve] import {imp.summary()}")
            params, stats = imp
            variables = {
                "params": merge_params(variables["params"], params),
                "batch_stats": merge_params(
                    variables.get("batch_stats", {}), stats
                ),
            }
        else:
            variables, step = restore_eval_variables(args.checkpoint)
            print(f"[serve] restored step {step}")
        self._variables = variables

        cdtype = (jnp.bfloat16 if args.eval_dtype == "bfloat16"
                  else jnp.float32)

        @jax.jit
        def _embed(v, batch):
            v = jax.tree_util.tree_map(
                lambda q: q.astype(cdtype)
                if jnp.issubdtype(q.dtype, jnp.floating) else q, v)
            x = (batch.astype(jnp.float32) / 255.0 - 0.5).astype(cdtype)
            return model.apply(v, x, train=False).astype(jnp.float32)

        mesh = create_mesh(model=1)
        self._fn = (
            sharded_batch_apply(_embed, mesh) if mesh.size > 1 else _embed
        )
        self._jnp = jnp
        # AOT warm: compile the fixed shape BEFORE accepting traffic
        b = args.batch_size * (2 if args.flip else 1)
        warm = jnp.zeros((b, args.image_size, args.image_size, 3), jnp.uint8)
        np.asarray(self._fn(self._variables, warm))
        print(f"[serve] warm-compiled batch {args.batch_size} "
              f"(flip={'on' if args.flip else 'off'})")

    def embed(self, imgs: np.ndarray) -> np.ndarray:
        """uint8 (N, S, S, 3) → L2-normalized float32 (N, D); any N (chunked
        + padded to the compiled batch shape)."""
        jnp = self._jnp
        bs = self.args.batch_size
        out = []
        for s in range(0, len(imgs), bs):
            chunk = imgs[s:s + bs]
            n = len(chunk)
            if n < bs:  # pad up to the compiled shape
                chunk = np.concatenate(
                    [chunk, np.zeros((bs - n, *chunk.shape[1:]), np.uint8)]
                )
            batch = jnp.asarray(chunk)
            if self.args.flip:
                batch = jnp.concatenate([batch, batch[:, :, ::-1]], axis=0)
            emb = np.asarray(self._fn(self._variables, batch), np.float32)
            if self.args.flip:
                emb = emb[:bs] + emb[bs:]
            out.append(emb[:n])
        e = np.concatenate(out)
        return e / np.maximum(np.linalg.norm(e, axis=1, keepdims=True), 1e-12)

    def handle(self, conn) -> None:
        """Serve one connection (many requests) until the peer closes."""
        size = self.args.image_size
        while True:
            try:
                hdr = _recv_exact(conn, 16)
            except ConnectionError:
                return
            magic, n, h, w = struct.unpack("<IIII", hdr)
            try:
                if magic != MAGIC:
                    raise ValueError(f"bad magic 0x{magic:08x}")
                if h != size or w != size:
                    raise ValueError(
                        f"expected {size}x{size} images, got {h}x{w}"
                    )
                if not 0 < n <= 65536:
                    raise ValueError(f"bad batch size {n}")
                raw = _recv_exact(conn, n * h * w * 3)
                imgs = np.frombuffer(raw, np.uint8).reshape(n, h, w, 3)
                emb = self.embed(imgs)
                conn.sendall(struct.pack("<II", *emb.shape))
                conn.sendall(emb.tobytes())
            except (ValueError, ConnectionError) as e:
                msg = str(e).encode()
                try:
                    conn.sendall(struct.pack("<II", ERR, len(msg)) + msg)
                except OSError:
                    pass
                return


class EmbeddingClient:
    """Minimal client for the unix-socket protocol above."""

    def __init__(self, path: str):
        self._path = path

    def embed(self, imgs: np.ndarray) -> np.ndarray:
        imgs = np.ascontiguousarray(imgs, np.uint8)
        n, h, w, c = imgs.shape
        assert c == 3
        with socket.socket(socket.AF_UNIX, socket.SOCK_STREAM) as s:
            s.connect(self._path)
            s.sendall(struct.pack("<IIII", MAGIC, n, h, w) + imgs.tobytes())
            hdr = _recv_exact(s, 8)
            a, b = struct.unpack("<II", hdr)
            if a == ERR:
                raise RuntimeError(_recv_exact(s, b).decode())
            return np.frombuffer(
                _recv_exact(s, a * b * 4), np.float32
            ).reshape(a, b)


def main(argv=None):
    args = get_args(argv)
    server = EmbeddingServer(args)
    if os.path.exists(args.socket):
        os.remove(args.socket)
    sock = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    sock.bind(args.socket)
    sock.listen(16)
    print(f"[serve] listening on {args.socket}")
    served = 0
    try:
        while True:
            conn, _ = sock.accept()
            with conn:
                server.handle(conn)
            served += 1
            if args.max_requests and served >= args.max_requests:
                print(f"[serve] served {served} connections, exiting")
                return
    finally:
        sock.close()
        if os.path.exists(args.socket):
            os.remove(args.socket)


if __name__ == "__main__":
    main()
