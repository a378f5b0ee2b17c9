"""Serve a trained SpectreViT: native C++ daemon or the JAX/TPU backend.

Deployment entry point. Two backends, one wire protocol (clients are
interchangeable):

- ``--backend native`` (default): exports the config's model (optionally
  from a checkpoint) to the .stw container, builds the native runtime if
  needed, and launches ``spectre_serve`` (native/serving/spectre_serve.cc)
  — the no-JAX CPU deployment story; the serving half of the capability the
  reference ghost-ships as a Rust inference crate (.gitignore:24,
  vit_spectre_cifar100.py:251).
- ``--backend jax``: serves the jitted model in-process on whatever backend
  JAX has — the TPU chip on a TPU host (serving/jax_server.py; dynamic
  cross-request batching, power-of-two batch buckets so XLA compiles a
  handful of static shapes).

    python -m spectre_tpu.repl.serve --config spectre_tpu/configs/spectre_vit_cifar100.py \
        [--backend native|jax] [--ckpt runs/exp/ckpt] \\
        [--port 7788 | --uds /tmp/spectre.sock] [--max-batch 256] [--export-dir DIR]

Clients: ``spectre_tpu.serving.SpectreClient`` (protocol documented there).
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

_REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default="spectre_tpu/configs/spectre_vit_cifar100.py")
    p.add_argument("--ckpt", default=None,
                   help="orbax checkpoint dir (serves the best-metric step, falling back to latest)")
    p.add_argument("--port", type=int, default=7788)
    p.add_argument("--uds", default=None,
                   help="serve on a unix-domain socket path instead of TCP")
    p.add_argument("--host", default=None,
                   help="bind a specific interface (default loopback); a "
                        "non-loopback host requires --token-file or "
                        "$SPECTRE_SERVE_TOKEN (plaintext stream — front "
                        "with TLS across untrusted networks)")
    p.add_argument("--token-file", default=None,
                   help="file holding the shared-secret auth token")
    p.add_argument("--max-batch", type=int, default=256)
    p.add_argument("--backend", choices=("native", "jax"), default="native",
                   help="native = C++ CPU daemon (no-JAX deployment); "
                        "jax = in-process jitted model on the JAX backend "
                        "(the TPU chip on a TPU host)")
    p.add_argument("--export-dir", default=None,
                   help="reuse/keep the export dir (default: runs/serve_export)")
    p.add_argument("--set", nargs="*", default=[])
    args = p.parse_args(argv)

    from spectre_tpu.configs import parse_config
    from spectre_tpu.repl.train import apply_overrides

    cfg = apply_overrides(parse_config(args.config), args.set)

    if args.backend == "jax":
        from spectre_tpu.serving import jax_server

        token = None
        if args.token_file:
            with open(args.token_file) as f:
                token = f.readline().strip()
        elif os.environ.get("SPECTRE_SERVE_TOKEN"):
            token = os.environ["SPECTRE_SERVE_TOKEN"]
        import jax as _jax

        # multi-chip host: shard every bucket over a data mesh spanning all
        # local chips — one SPMD forward per request batch
        mesh = None
        if _jax.device_count() > 1:
            from spectre_tpu.parallel import create_mesh

            mesh = create_mesh()
            if args.max_batch % mesh.devices.shape[0]:
                sys.exit(f"--max-batch {args.max_batch} must divide over "
                         f"{mesh.devices.shape[0]} chips")
        srv = jax_server.from_config(cfg, checkpoint=args.ckpt,
                                     max_batch=args.max_batch, token=token,
                                     mesh=mesh)
        if args.uds:
            addr = srv.listen_uds(args.uds)
            where = addr
        else:
            port = srv.listen_tcp(host=args.host or "127.0.0.1",
                                  port=args.port)
            where = f"{args.host or '127.0.0.1'}:{port}"

        print(f"serving {getattr(cfg, 'model', 'spectre_vit')} on {where} "
              f"(backend {_jax.default_backend()}, ctrl-c to stop)")
        try:
            while True:
                time.sleep(3600)
        except KeyboardInterrupt:
            srv.close()
        return

    from spectre_tpu.repl.export import export_from_config
    from spectre_tpu.serving import start_server

    r = subprocess.run(["make", "-C", os.path.join(_REPO, "native")],
                       capture_output=True, text=True)
    if r.returncode != 0:
        sys.exit(f"native build failed:\n{r.stderr}")

    outdir = args.export_dir or os.path.join("runs", "serve_export")
    export_from_config(cfg, checkpoint=args.ckpt, outdir=outdir, batch=1)
    proc, addr = start_server(outdir, port=args.port, max_batch=args.max_batch,
                              uds=args.uds, host=args.host,
                              token_file=args.token_file)
    where = addr if args.uds else f"{args.host or '127.0.0.1'}:{addr}"
    print(f"serving {getattr(cfg, 'model', 'spectre_vit')} from {outdir} "
          f"on {where} (ctrl-c to stop)")
    try:
        proc.wait()
    except KeyboardInterrupt:
        proc.kill()


if __name__ == "__main__":
    main()
