"""Serving throughput/latency: JAX backend (TPU) vs native C++ daemon (CPU).

End-to-end through the real socket path — request serialization, dynamic
batcher, model execution, response — the number a deployment actually sees,
not a bare model.apply. Flagship CIFAR-100 SpectreViT geometry, random
weights (throughput is architecture-dependent, not weight-dependent).

Run: PYTHONPATH=/root/.axon_site:. python benchmarks/serving_bench.py
     [--skip-native] [--skip-jax] [--int8] [--batch 1024] [--iters 20]

--skip-jax measures the native daemon alone (no accelerator needed — pin
JAX_PLATFORMS=cpu); --int8 adds a VNNI-quantized native leg.
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def _pctl(xs, p):
    return float(np.percentile(np.asarray(xs) * 1e3, p))


def bench_backend(label, client, img_shape, batch, iters, lat_iters=50,
                  pipeline_clients=None):
    rng = np.random.default_rng(0)
    x1u = rng.integers(0, 256, (1, *img_shape)).astype(np.uint8)
    xbu = rng.integers(0, 256, (batch, *img_shape)).astype(np.uint8)
    x1 = x1u.astype(np.float32) / 255.0
    xb = xbu.astype(np.float32) / 255.0

    client.infer(x1)  # warm the B=1 bucket (compile)
    lats = []
    for _ in range(lat_iters):
        t0 = time.perf_counter()
        client.infer(x1)
        lats.append(time.perf_counter() - t0)
    print(f"{label}: B=1 p50 {_pctl(lats, 50):.2f} ms, "
          f"p99 {_pctl(lats, 99):.2f} ms")

    for wire, x in (("f32", xb), ("u8", xbu)):
        call = client.infer if wire == "f32" else client.infer_u8
        call(x)  # warm the batch bucket
        t0 = time.perf_counter()
        for _ in range(iters):
            call(x)
        dt = time.perf_counter() - t0
        print(f"{label}: B={batch} {wire} wire, 1 conn: "
              f"{batch * iters / dt:,.0f} img/s "
              f"({dt / iters * 1e3:.1f} ms/request)")

    if pipeline_clients:
        # two connections keep the server's one-deep pipeline full: request
        # k+1's transfer+forward overlaps request k's fetch
        import threading

        def drive(c):
            for _ in range(iters):
                c.infer_u8(xbu)

        for c in pipeline_clients:
            c.infer_u8(xbu)  # warm
        t0 = time.perf_counter()
        ts = [threading.Thread(target=drive, args=(c,))
              for c in pipeline_clients]
        [t.start() for t in ts]
        [t.join() for t in ts]
        dt = time.perf_counter() - t0
        n = len(pipeline_clients)
        print(f"{label}: B={batch} u8 wire, {n} concurrent conns "
              f"(pipelined): {batch * iters * n / dt:,.0f} img/s")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--skip-native", action="store_true")
    ap.add_argument("--skip-jax", action="store_true",
                    help="native daemon only; no accelerator required "
                         "(pin JAX_PLATFORMS=cpu for the export)")
    ap.add_argument("--int8", action="store_true",
                    help="add a VNNI-quantized native leg")
    args = ap.parse_args()

    import os

    if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")  # see step_accounting.py

    from spectre_tpu.configs import parse_config
    from spectre_tpu.serving import SpectreClient
    from spectre_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    cfg = parse_config("spectre_tpu/configs/spectre_vit_cifar100.py")
    shape = (cfg.in_channels, cfg.img_size, cfg.img_size)

    if not args.skip_jax:
        import jax

        from spectre_tpu.serving.jax_server import from_config

        srv = from_config(cfg, max_batch=args.batch)
        port = srv.listen_tcp()
        print(f"jax backend: {jax.default_backend()} "
              f"({jax.devices()[0].device_kind})")
        with SpectreClient(port=port) as c, \
                SpectreClient(port=port) as p1, SpectreClient(port=port) as p2:
            bench_backend("jax", c, shape, args.batch, args.iters,
                          pipeline_clients=[p1, p2])
        srv.close()

    if not args.skip_native:
        import tempfile

        from spectre_tpu.repl.export import export_from_config
        from spectre_tpu.serving import start_server

        with tempfile.TemporaryDirectory() as outdir:
            export_from_config(cfg, outdir=outdir, batch=1)
            legs = [("native-cpu", False)]
            if args.int8:
                legs.append(("native-cpu-int8", True))
            for label, int8 in legs:
                proc, nport = start_server(outdir, max_batch=args.batch,
                                           int8=int8)
                try:
                    with SpectreClient(port=nport) as c:
                        # the C++ runtime is single-core CPU: keep iters small
                        bench_backend(label, c, shape,
                                      batch=min(args.batch, 64),
                                      iters=max(2, args.iters // 10),
                                      lat_iters=10)
                finally:
                    proc.kill()


if __name__ == "__main__":
    main()
