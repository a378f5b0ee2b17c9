"""MNIST Kaggle-style pipeline: train, predict the submission split, write
submission.csv and a prediction-grid figure (reference repl/
vit_spectre_mnist.py:85-87 Kaggle CSVs, :302-330 submission inference + grid).

    python -m spectre_tpu.repl.mnist_submission --config spectre_tpu/configs/spectre_vit_mnist.py \
        [--data-dir data] [--steps N] [--out submission.csv]
"""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np

from spectre_tpu.configs import parse_config
from spectre_tpu.data import BatchIterator, make_eval_transform
from spectre_tpu.data.datasets import MNIST_MEAN, MNIST_STD
from spectre_tpu.models import build_model
from spectre_tpu.repl.train import apply_overrides
from spectre_tpu.train.loop import train_from_config


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default="spectre_tpu/configs/spectre_vit_mnist.py")
    p.add_argument("--data-dir", default=None)
    p.add_argument("--steps", type=int, default=None)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--out", default="submission.csv")
    p.add_argument("--grid", default="plots/mnist_predictions.png")
    p.add_argument("--set", nargs="*", default=[])
    args = p.parse_args(argv)

    config = apply_overrides(parse_config(args.config), args.set)
    if args.data_dir:
        config.data_dir = args.data_dir
    result = train_from_config(config, max_steps=args.steps,
                               synthetic=args.synthetic, checkpoint=False)
    state = result.state
    model = build_model(config)

    # submission split: Kaggle test.csv when present, synthetic otherwise
    from spectre_tpu.train.loop import load_sized_dataset

    # "submission" = the UNLABELED Kaggle test.csv (the labeled "test"
    # split is a train.csv holdout used for validation — datasets.py)
    test_x, _ = load_sized_dataset(config, "submission", synthetic=args.synthetic)
    transform = make_eval_transform(MNIST_MEAN, MNIST_STD)

    @jax.jit
    def predict(images):
        logits = model.apply(state.variables(), transform(images))
        return logits.argmax(-1)

    preds = []
    for batch in BatchIterator(test_x, np.zeros(len(test_x), np.int32),
                               int(getattr(config, "val_batch_size", 256)),
                               shuffle=False):
        out = np.asarray(predict(batch["image"]))
        preds.append(out[: int(batch["valid"])])
    preds = np.concatenate(preds)

    with open(args.out, "w") as f:
        f.write("ImageId,Label\n")
        for i, label in enumerate(preds, start=1):
            f.write(f"{i},{int(label)}\n")
    print(f"wrote {args.out} ({len(preds)} rows)")

    # prediction grid (reference vit_spectre_mnist.py:321-330)
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(os.path.dirname(args.grid) or ".", exist_ok=True)
    fig, axes = plt.subplots(4, 8, figsize=(12, 6))
    for i, ax in enumerate(axes.ravel()):
        ax.imshow(test_x[i, 0], cmap="gray")
        ax.set_title(str(int(preds[i])), fontsize=9)
        ax.axis("off")
    fig.tight_layout()
    fig.savefig(args.grid, dpi=100)
    print(f"wrote {args.grid}")


if __name__ == "__main__":
    main()
