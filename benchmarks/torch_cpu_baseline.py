"""Measure the REFERENCE's own PyTorch training step on this host's CPU.

Round-1's ``vs_baseline`` divided by a guessed A100 number (retracted —
BASELINE.md). No GPU exists in this environment, so the only like-for-like
measurement obtainable is the reference recipe on the same host CPU:

- model: the reference's actual ``SpectreViT`` imported from
  ``/root/reference/spectre_vit`` (torch CPU) — not a reimplementation;
- recipe: CE loss + AdamW step, eager, float32 (AMP is CUDA-only in the
  reference, train.py:219-238), flagship CIFAR-100 config values
  (configs/spectre_vit_cifar100.py);
- measurement: warmup + timed steps, wall clock.

Usage:  python benchmarks/torch_cpu_baseline.py [--batch 32] [--iters 3]

The resulting images/sec lands in BASELINE.md and as the documented
``TORCH_CPU_IMG_PER_SEC`` constant in bench.py. The A100 target framing
(>= 3x A100) remains UNMEASURED and is labeled as such.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

REFERENCE_ROOT = "/root/reference"


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--warmup", type=int, default=1)
    args = p.parse_args(argv)

    sys.path.insert(0, REFERENCE_ROOT)
    import torch
    from spectre_vit.models.spectre.spectre import SpectreViT  # reference code

    torch.manual_seed(0)
    # flagship config values (reference configs/spectre_vit_cifar100.py)
    model = SpectreViT(
        img_size=32, patch_size=4, in_channels=3, embed_dim=512,
        hidden_dim=768, num_heads=16, num_encoders=4, num_classes=100,
        dropout=0.001, activation="gelu",
    )
    model.train()
    opt = torch.optim.AdamW(model.parameters(), lr=1e-3, weight_decay=0.01,
                            betas=(0.9, 0.999))
    loss_fn = torch.nn.CrossEntropyLoss()

    b = args.batch
    x = torch.rand(b, 3, 32, 32)
    y = torch.randint(0, 100, (b,))

    def step():
        opt.zero_grad(set_to_none=True)
        loss = loss_fn(model(x), y)
        loss.backward()
        opt.step()
        return float(loss)

    for _ in range(args.warmup):
        step()
    t0 = time.perf_counter()
    for _ in range(args.iters):
        step()
    dt = (time.perf_counter() - t0) / args.iters

    print(json.dumps({
        "metric": "reference_torch_cpu_train_images_per_sec",
        "value": round(b / dt, 2),
        "unit": "images/sec",
        "ms_per_step": round(dt * 1e3, 1),
        "batch": b,
        "host": "1-core CPU (this build host)",
    }))


if __name__ == "__main__":
    main()
