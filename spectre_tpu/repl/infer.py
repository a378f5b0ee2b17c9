"""Serve/run an exported StableHLO artifact (AOT inference path).

The JAX-side counterpart of the native C++ runner: load the serialized
forward (weights baked in) produced by repl/export.py and execute it on the
local device without any model code — the deployment story for the exported
artifact.

    python -m spectre_tpu.repl.infer --artifact export/model.stablehlo \
        --input export/example_input.f32 --batch 2 --channels 3 --size 32
"""

from __future__ import annotations

import argparse

import numpy as np

from spectre_tpu.export import load_exported


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--artifact", required=True)
    p.add_argument("--input", required=True, help="raw float32 NCHW file")
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--channels", type=int, default=3)
    p.add_argument("--size", type=int, default=32)
    p.add_argument("--expect", default=None,
                   help="optional raw float32 logits file to parity-check")
    args = p.parse_args(argv)

    exported = load_exported(args.artifact)
    x = np.fromfile(args.input, np.float32).reshape(
        args.batch, args.channels, args.size, args.size)
    logits = np.asarray(exported.call(x))
    for i, row in enumerate(logits):
        print(f"sample {i} argmax {int(row.argmax())} "
              f"top logit {row.max():.4f}")
    if args.expect:
        want = np.fromfile(args.expect, np.float32).reshape(logits.shape)
        err = float(np.max(np.abs(logits - want)))
        print(f"parity vs {args.expect}: max|delta|={err:.2e}")
        assert err < 1e-4
    return logits


if __name__ == "__main__":
    main()
