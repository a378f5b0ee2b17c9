"""Orthogonal-permutation mixing study (reference repl/orthogonal_permut.py).

Benchmarks the MHPermutMix mixing transform (gather + structured + Pallas
variants) against 2D-FFT mixing across dims 2^6..2^13 (reference :76-134),
profiles one mixing pass (reference :62-64), and writes the timing plot the
reference saved as plots/pytorch_spectremix_h{H}.png. The reference's ONNX
passes map to the StableHLO export path (repl/export.py).

    python -m spectre_tpu.repl.orthogonal_permut [--heads 4] [--out plots]
"""

from __future__ import annotations

import argparse
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from spectre_tpu.ops import (
    fft2_real_matmul,
    make_mix_tables,
    make_structured_tables,
    permut_mix,
    structured_mix,
)
from spectre_tpu.profile import ProfilerParser, trace_step
from spectre_tpu.repl.perf import _time_fn


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--heads", type=int, default=4)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--max-pow", type=int, default=13)
    p.add_argument("--out", default="plots")
    args = p.parse_args(argv)
    os.makedirs(args.out, exist_ok=True)

    dims, t_gather, t_struct, t_fft = [], [], [], []
    n = 8
    for pw in range(6, args.max_pow + 1):
        d = 2 ** pw
        if d // n < 8:
            continue
        x = jnp.asarray(np.random.default_rng(0).standard_normal(
            (args.batch, n, d // n)).astype(np.float32))
        perms, signs = make_mix_tables(jax.random.key(0), args.heads, d)
        tperms, ssigns = make_structured_tables(jax.random.key(0), args.heads, d)
        dims.append(d)
        t_gather.append(_time_fn(jax.jit(partial(permut_mix, token_dim=n)),
                                 x, perms, signs) * 1e3)
        t_struct.append(_time_fn(jax.jit(partial(structured_mix, token_dim=n)),
                                 x, tperms, ssigns) * 1e3)
        t_fft.append(_time_fn(jax.jit(fft2_real_matmul), x) * 1e3)
        print(f"  d={d}: gather {t_gather[-1]:.3f} | structured "
              f"{t_struct[-1]:.3f} | fft2 {t_fft[-1]:.3f} (ms)")

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7, 4))
    ax.loglog(dims, t_gather, "o-", label="permut-mix (gather)")
    ax.loglog(dims, t_struct, "s-", label="permut-mix (structured)")
    ax.loglog(dims, t_fft, "^-", label="fft2 (DFT matmul)")
    ax.set_xlabel("flattened dim d"); ax.set_ylabel("ms / iter")
    ax.set_title(f"mixing transforms, H={args.heads}, B={args.batch}")
    ax.legend(); ax.grid(True, which="both", alpha=0.3)
    path = f"{args.out}/spectremix_h{args.heads}.png"
    fig.tight_layout(); fig.savefig(path, dpi=100)
    print(f"wrote {path}")

    # profile one mixing pass (reference :62-64)
    d = 2 ** 12
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (args.batch, n, d // n)).astype(np.float32))
    perms, signs = make_mix_tables(jax.random.key(0), args.heads, d)
    fn = jax.jit(partial(permut_mix, token_dim=n))
    jax.block_until_ready(fn(x, perms, signs))
    with trace_step(f"{args.out}/mix_trace") as t:
        jax.block_until_ready(fn(x, perms, signs))
    (ProfilerParser(t.path).remove_idle().add_percentages().round()
     .sort_by_device().head(10).show())


if __name__ == "__main__":
    main()
