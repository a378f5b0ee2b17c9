"""Tracing hooks around jitted steps.

Reference mechanism (SURVEY.md §5.1): ``torch.profiler.profile`` wrapped
around one encoder-layer forward (test.py:166-176). TPU equivalent:
``jax.profiler.trace`` around the compiled step — the trace captures XLA/
Mosaic kernel timings on device, which ProfilerParser post-processes into the
same chainable table the reference's parser produced.
"""

from __future__ import annotations

import contextlib
import glob
import os

import jax


@contextlib.contextmanager
def trace_step(logdir: str):
    """Context manager: profile everything inside, yield the trace dir.

    Usage::

        with trace_step("plots/trace") as t:
            jax.block_until_ready(step_fn(*args))
        ProfilerParser(t.path).remove_idle().sort_by_device().show()
    """

    class _Handle:
        path = os.path.abspath(logdir)
        trace_file: str | None = None

    handle = _Handle()
    os.makedirs(logdir, exist_ok=True)
    with jax.profiler.trace(logdir):
        yield handle
    matches = sorted(
        glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime,
    )
    handle.trace_file = matches[-1] if matches else None
