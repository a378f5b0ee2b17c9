"""Input pipeline: shuffled batching + double-buffered device prefetch.

Replaces the reference's 16-process DataLoader(pin_memory, prefetch_factor=4)
(train.py:147-155). On TPU the host's only job is to hand raw pixel batches to
the chip ahead of time: ``prefetch_to_mesh`` keeps ``prefetch`` batches in
flight (device_put is async in JAX), sharded over the mesh's data axis, while
augmentation runs on device inside the step. Static batch shapes only — the
last partial batch is dropped in training (DataLoader drop_last equivalent)
and padded in eval so jit never retraces.
"""

from __future__ import annotations

import collections
from typing import Iterator

import jax
import numpy as np

from spectre_tpu.parallel.mesh import batch_sharding


class BatchIterator:
    """Epoch iterator over in-memory numpy arrays.

    train mode: reshuffle every epoch from a seeded Generator, drop remainder.
    eval mode: sequential, final batch zero-padded to full size (callers get
    ``valid`` counts so metrics stay exact).
    """

    def __init__(self, images: np.ndarray, labels: np.ndarray, batch_size: int,
                 *, shuffle: bool, seed: int = 0, drop_last: bool | None = None):
        self.images, self.labels = images, labels
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = shuffle if drop_last is None else drop_last
        self._rng = np.random.default_rng(seed)
        self.num_examples = images.shape[0]

    def __len__(self) -> int:
        n, b = self.num_examples, self.batch_size
        return n // b if self.drop_last else -(-n // b)

    def skip_epoch(self):
        """Advance the shuffle RNG exactly one epoch WITHOUT materializing
        batches (consumes the same stream __iter__ would) — resume paths
        fast-forward data order this way."""
        if self.shuffle:
            self._rng.shuffle(np.arange(self.num_examples))

    def __iter__(self) -> Iterator[dict]:
        idx = np.arange(self.num_examples)
        if self.shuffle:
            self._rng.shuffle(idx)
        b = self.batch_size
        for start in range(0, self.num_examples, b):
            sel = idx[start : start + b]
            if len(sel) < b:
                if self.drop_last:
                    return
                pad = np.zeros(b - len(sel), dtype=sel.dtype)
                valid = len(sel)
                sel = np.concatenate([sel, pad])
            else:
                valid = b
            mask = np.zeros(b, np.bool_)
            mask[:valid] = True
            yield {
                "image": self.images[sel],
                "label": self.labels[sel],
                # per-sample mask (shards with the batch — a scalar count
                # cannot describe padding once batches span processes)
                "mask": mask,
                # dataset indices of the selected samples: lets callers join
                # per-sample side tables (e.g. the cached frozen-teacher
                # logits in distill/loop.py) against the shuffled batch
                "index": sel,
                "valid": np.int32(valid),
            }


def prefetch_to_mesh(iterator, mesh, prefetch: int = 2):
    """Asynchronously stage host batches onto the mesh, data-axis sharded.

    device_put returns immediately (transfers overlap compute); holding a
    ``prefetch``-deep deque of in-flight batches double-buffers H2D against
    the running step, the role cuFFT-era pin_memory+prefetch_factor played.
    """
    sharding = batch_sharding(mesh)
    queue = collections.deque()

    if jax.process_count() > 1:
        # multi-host: each process stages ITS slice of the global batch; the
        # assembled jax.Array spans the whole mesh (global batch = local * P)
        def place(x):
            return jax.make_array_from_process_local_data(sharding, np.asarray(x))
    else:
        def place(x):
            return jax.device_put(x, sharding)

    def stage(batch):
        # every ndarray value is staged (extra per-sample side-channels like
        # "teacher_logits" ride along, sharded like the batch); host scalars
        # ("valid") pass through untouched
        return {k: place(v) if isinstance(v, np.ndarray) else v
                for k, v in batch.items()}

    it = iter(iterator)
    try:
        for _ in range(prefetch):
            queue.append(stage(next(it)))
    except StopIteration:
        pass
    while queue:
        out = queue.popleft()
        try:
            queue.append(stage(next(it)))
        except StopIteration:
            pass
        yield out
