"""Real-data reproduction harness: reference torch recipe vs spectre_tpu.

The accuracy north star (BASELINE.md) is CIFAR-100/MNIST top-1 within 0.2%
of the PyTorch reference — unprovable in this environment (no datasets on
the image), so this harness exists READY: the day ``$SPECTRE_DATA_DIR``
holds the data, ONE command runs the full both-sides comparison and emits
the parity table.

    python -m spectre_tpu.repl.reproduce --config spectre_tpu/configs/spectre_vit_cifar100.py
    python -m spectre_tpu.repl.reproduce --config ... --synthetic --steps 3   # CI smoke

Side A — the reference recipe (train.py:194-290 semantics): the ACTUAL
``SpectreViT`` imported from /root/reference, eager torch (AMP+GradScaler
when CUDA is available, exactly as train.py:219-238; eager f32 on CPU),
CE loss, AdamW(betas, lr, wd) + CosineAnnealingLR over total steps, the
reference augmentation pipeline (train.py:102-114 via torchvision when
installed; a documented plain-torch subset — hflip/rotation/normalize/
erasing — otherwise, recorded in the report), per-epoch top-1 on the val
split, best-epoch accuracy reported.

Side B — spectre_tpu: ``train_from_config`` on the given config unchanged
(device-side augmentation, jitted step, orbax best checkpoint), reporting
best val top-1 and images/sec/chip.

Output: a human table + one JSON line with both top-1s, the delta, the
within-0.2% verdict, and the throughput ratio. Augmentation pipelines
differ stochastically between stacks by design (SURVEY.md §7 "hard parts")
— parity is defined at converged-accuracy level, not per-sample.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

REFERENCE_ROOT = "/root/reference"


def _torch_augment_factory(dataset: str, mean, std, report: dict):
    """Per-batch train augmentation for the torch side.

    CIFAR-100 reference list (train.py:102-114): RandomHorizontalFlip,
    ColorJitter, RandomGrayscale, RandomAffine(30), GaussianBlur, Normalize,
    RandomErasing. With torchvision installed the exact transforms run; the
    fallback covers hflip/rotate/normalize/erasing in plain torch and the
    report records the reduced fidelity. MNIST (vit_spectre_mnist.py:117-184)
    is RandomRotation(15) + normalize only — exact either way.
    """
    import torch

    try:
        import torchvision.transforms.v2 as T  # noqa: F401
        have_tv = True
    except Exception:
        have_tv = False
    report["torch_aug"] = ("torchvision" if have_tv else
                           "plain-torch subset (hflip/rotate/normalize/"
                           "erasing; no jitter/grayscale/blur)")

    mean_t = torch.tensor(mean).view(1, -1, 1, 1)
    std_t = torch.tensor(std).view(1, -1, 1, 1)
    degrees = 15.0 if dataset == "mnist" else 30.0

    if have_tv:
        import torchvision.transforms.v2 as T

        if dataset == "mnist":
            tf = T.Compose([T.RandomRotation(degrees),
                            T.Normalize(list(mean), list(std))])
        else:
            tf = T.Compose([
                T.RandomHorizontalFlip(),
                T.ColorJitter(0.4, 0.4, 0.4, 0.1),
                T.RandomGrayscale(p=0.2),
                T.RandomAffine(degrees),
                T.GaussianBlur(3),
                T.Normalize(list(mean), list(std)),
                T.RandomErasing(p=0.25),
            ])

        def augment(x):
            return tf(x)

        return augment

    def _rotate(x, gen):
        # bilinear rotation via affine_grid (RandomAffine/RandomRotation core)
        b = x.shape[0]
        ang = ((torch.rand(b, generator=gen, device=x.device) * 2 - 1)
               * np.deg2rad(degrees))
        cos, sin = torch.cos(ang), torch.sin(ang)
        theta = torch.zeros(b, 2, 3, device=x.device)
        theta[:, 0, 0], theta[:, 0, 1] = cos, -sin
        theta[:, 1, 0], theta[:, 1, 1] = sin, cos
        grid = torch.nn.functional.affine_grid(theta, list(x.shape),
                                               align_corners=False)
        return torch.nn.functional.grid_sample(x, grid, align_corners=False)

    def augment(x):
        # every random tensor lives on x.device — the reference recipe runs
        # this on CUDA when available, and CPU-born masks/grids would raise
        gen = None
        if dataset != "mnist":
            flip = torch.rand(x.shape[0], device=x.device) < 0.5
            x = torch.where(flip.view(-1, 1, 1, 1), torch.flip(x, [-1]), x)
        x = _rotate(x, gen)
        x = (x - mean_t.to(x.device)) / std_t.to(x.device)
        if dataset != "mnist":
            erase = torch.rand(x.shape[0]) < 0.25
            h, w = x.shape[-2:]
            eh, ew = max(1, h // 4), max(1, w // 4)
            for i in torch.nonzero(erase).flatten().tolist():
                y0 = int(torch.randint(0, h - eh + 1, (1,)))
                x0 = int(torch.randint(0, w - ew + 1, (1,)))
                x[i, :, y0:y0 + eh, x0:x0 + ew] = 0.0
        return x

    return augment


def run_torch_reference(config, data, *, max_steps=None, report=None):
    """Train the /root/reference SpectreViT with the reference recipe; return
    (best_top1, images_per_sec)."""
    sys.path.insert(0, REFERENCE_ROOT)
    import torch
    from spectre_vit.models.spectre.spectre import SpectreViT as RefSpectreViT

    from spectre_tpu.train.loop import _dataset_stats

    (xtr, ytr), (xva, yva) = data
    dataset = getattr(config, "dataset", "cifar100")
    report = report if report is not None else {}

    device = "cuda" if torch.cuda.is_available() else "cpu"
    use_amp = device == "cuda"  # the reference's AMP is CUDA-only
    torch.manual_seed(getattr(config, "random_seed", 42))
    model = RefSpectreViT(
        img_size=int(config.img_size), patch_size=int(config.patch_size),
        in_channels=int(config.in_channels),
        num_classes=int(config.num_classes),
        embed_dim=int(config.embed_dim),
        num_encoders=int(config.num_encoders),
        num_heads=int(config.num_heads), hidden_dim=int(config.hidden_dim),
        dropout=float(config.dropout), activation="gelu").to(device)

    batch = int(config.batch_size)
    epochs = int(config.epochs)
    steps_per_epoch = max(1, len(xtr) // batch)
    opt = torch.optim.AdamW(
        model.parameters(), lr=float(config.learning_rate),
        betas=tuple(getattr(config, "adam_betas", (0.9, 0.999))),
        weight_decay=float(getattr(config, "adam_weight_decay", 0.01)))
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(
        opt, T_max=steps_per_epoch * epochs)
    scaler = torch.amp.GradScaler(enabled=use_amp)
    crit = torch.nn.CrossEntropyLoss()
    mean, std = _dataset_stats(dataset)
    augment = _torch_augment_factory(dataset, mean, std, report)

    rng = np.random.default_rng(getattr(config, "random_seed", 42))
    best = -1.0
    total_steps = 0
    n_images = 0
    t0 = time.perf_counter()
    done = False
    for epoch in range(epochs):
        if done:
            break
        model.train()
        idx = rng.permutation(len(xtr))
        for i in range(0, len(xtr) - batch + 1, batch):
            sel = idx[i:i + batch]
            img = augment(torch.from_numpy(xtr[sel]).to(device))
            label = torch.from_numpy(ytr[sel].astype(np.int64)).to(device)
            with torch.autocast(device_type=device, enabled=use_amp):
                loss = crit(model(img), label)
            opt.zero_grad(set_to_none=True)
            scaler.scale(loss).backward()
            scaler.step(opt)
            scaler.update()
            sched.step()
            total_steps += 1
            n_images += batch
            if max_steps is not None and total_steps >= max_steps:
                done = True
                break
        # per-epoch top-1 on the val split (train.py:254-286)
        model.eval()
        correct = 0
        mean_t = torch.tensor(mean).view(1, -1, 1, 1).to(device)
        std_t = torch.tensor(std).view(1, -1, 1, 1).to(device)
        vb = int(getattr(config, "val_batch_size", batch))
        with torch.no_grad():
            for i in range(0, len(xva), vb):
                img = torch.from_numpy(xva[i:i + vb]).to(device)
                img = (img - mean_t) / std_t
                pred = model(img).argmax(1).cpu().numpy()
                correct += int((pred == yva[i:i + vb]).sum())
        best = max(best, correct / len(xva))
    dt = time.perf_counter() - t0
    return best, n_images / dt if dt > 0 else 0.0


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config",
                   default="spectre_tpu/configs/spectre_vit_cifar100.py")
    p.add_argument("--synthetic", action="store_true",
                   help="hermetic synthetic data (CI smoke; the real run "
                        "needs $SPECTRE_DATA_DIR)")
    p.add_argument("--steps", type=int, default=None,
                   help="cap steps on BOTH sides (smoke mode)")
    p.add_argument("--skip-torch", action="store_true")
    p.add_argument("--skip-tpu", action="store_true")
    p.add_argument("--no-uniform-leg", action="store_true",
                   help="skip the second spectre_tpu run with mix_block=0. "
                        "By default, when the config ships block-structured "
                        "mix tables (mix_block>0 — a DIFFERENT permutation "
                        "distribution than the reference samples, "
                        "layers.py:61-65), the harness trains BOTH "
                        "distributions so the parity table reports each "
                        "against the torch baseline")
    p.add_argument("--out", default=None, help="write the JSON report here")
    p.add_argument("--set", nargs="*", default=[])
    args = p.parse_args(argv)

    from spectre_tpu.configs import parse_config
    from spectre_tpu.repl.train import apply_overrides
    from spectre_tpu.train.loop import load_sized_dataset, train_from_config

    config = apply_overrides(parse_config(args.config), args.set)
    report = {"config": args.config, "dataset": getattr(config, "dataset", "?"),
              "synthetic": bool(args.synthetic)}

    # one dataset load feeds both sides identically
    xtr, ytr = load_sized_dataset(config, "train", args.synthetic)
    xva, yva = load_sized_dataset(config, "test", args.synthetic)
    data = ((np.asarray(xtr), np.asarray(ytr)),
            (np.asarray(xva), np.asarray(yva)))

    if not args.skip_torch:
        t_top1, t_ips = run_torch_reference(config, data,
                                            max_steps=args.steps,
                                            report=report)
        report["torch_top1"] = round(t_top1, 4)
        report["torch_img_per_sec"] = round(t_ips, 2)
        print(f"reference torch: best top-1 {t_top1:.4f} ({t_ips:.1f} img/s)")

    if not args.skip_tpu:
        result = train_from_config(config, max_steps=args.steps,
                                   synthetic=args.synthetic,
                                   write_metrics=False, checkpoint=False)
        report["tpu_mix_block"] = int(getattr(config, "mix_block", 0))
        report["tpu_top1"] = round(result.best_val_accuracy, 4)
        report["tpu_img_per_sec_chip"] = round(result.images_per_sec_per_chip, 2)
        print(f"spectre_tpu (mix_block={report['tpu_mix_block']}): "
              f"best top-1 {result.best_val_accuracy:.4f} "
              f"({result.images_per_sec_per_chip:.1f} img/s/chip)")

        # uniform leg: the shipped flagship config samples BLOCK-structured
        # mix permutations (mix_block=64) — a different distribution than
        # the reference's torch.randperm (layers.py:61-65). The parity
        # verdict must be reportable for BOTH, so train the identical
        # config with mix_block=0 as a second leg (VERDICT r3 #1).
        if report["tpu_mix_block"] and not args.no_uniform_leg:
            import copy

            cfg_u = copy.deepcopy(config)
            cfg_u.mix_block = 0
            result_u = train_from_config(cfg_u, max_steps=args.steps,
                                         synthetic=args.synthetic,
                                         write_metrics=False,
                                         checkpoint=False)
            report["tpu_top1_uniform"] = round(result_u.best_val_accuracy, 4)
            report["tpu_img_per_sec_chip_uniform"] = round(
                result_u.images_per_sec_per_chip, 2)
            print(f"spectre_tpu (mix_block=0, uniform): best top-1 "
                  f"{result_u.best_val_accuracy:.4f} "
                  f"({result_u.images_per_sec_per_chip:.1f} img/s/chip)")

    if "torch_top1" in report and "tpu_top1" in report:
        delta = report["tpu_top1"] - report["torch_top1"]
        report["top1_delta"] = round(delta, 4)
        report["within_0.2pct"] = bool(abs(delta) <= 0.002)
        if report["torch_img_per_sec"] > 0:
            report["throughput_ratio"] = round(
                report["tpu_img_per_sec_chip"] / report["torch_img_per_sec"], 2)
        print(f"top-1 delta {delta:+.4f} "
              f"({'WITHIN' if report['within_0.2pct'] else 'OUTSIDE'} 0.2%) | "
              f"throughput ratio {report.get('throughput_ratio', 'n/a')}x")
        if "tpu_top1_uniform" in report:
            du = report["tpu_top1_uniform"] - report["torch_top1"]
            report["top1_delta_uniform"] = round(du, 4)
            report["within_0.2pct_uniform"] = bool(abs(du) <= 0.002)
            print(f"top-1 delta (uniform leg) {du:+.4f} "
                  f"({'WITHIN' if report['within_0.2pct_uniform'] else 'OUTSIDE'}"
                  f" 0.2%)")
    print(json.dumps(report))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)
    return report


if __name__ == "__main__":
    main()
