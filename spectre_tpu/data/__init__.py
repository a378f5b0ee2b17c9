from spectre_tpu.data.augment import (
    make_eval_transform,
    make_train_augment,
    normalize,
)
from spectre_tpu.data.datasets import (
    CIFAR100_MEAN,
    CIFAR100_STD,
    MNIST_MEAN,
    MNIST_STD,
    load_dataset,
)
from spectre_tpu.data.pipeline import BatchIterator, prefetch_to_mesh

__all__ = [
    "make_train_augment", "make_eval_transform", "normalize",
    "load_dataset", "CIFAR100_MEAN", "CIFAR100_STD", "MNIST_MEAN", "MNIST_STD",
    "BatchIterator", "prefetch_to_mesh",
]
