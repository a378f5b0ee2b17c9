"""Profiler trace post-processor.

Capability parity with the reference ProfilerParser (profile/parser.py:4-73),
which turned ``torch.profiler`` key averages into a chainable polars table
(cpu/cuda self-ms, memory, percentage, sorting, CSV dump). Here the input is a
JAX profiler trace (chrome-trace JSON emitted under the TensorBoard plugin
directory) and the table is pandas; the chainable API is the same shape:

    ProfilerParser(trace_dir)
        .remove_idle()
        .filter_name("fusion|dot")
        .add_percentages()
        .round()
        .sort_by_device()
        .show()
        .to_csv("plots/encoder_layer.csv")

Events are aggregated per op name with host/device split (device = TPU/XLA
executor lanes; host = python/runtime threads).
"""

from __future__ import annotations

import glob
import gzip
import json
import os

import pandas as pd

_DEVICE_HINTS = ("/device:", "TPU", "XLA Ops", "Steps", "TensorFlow Ops", "Axon")


def _find_trace_file(path: str) -> str:
    if os.path.isfile(path):
        return path
    matches = sorted(
        glob.glob(os.path.join(path, "**", "*.trace.json.gz"), recursive=True)
        + glob.glob(os.path.join(path, "**", "*.trace.json"), recursive=True),
        key=os.path.getmtime,
    )
    if not matches:
        raise FileNotFoundError(f"no *.trace.json(.gz) under {path}")
    return matches[-1]


def _load_events(trace_file: str) -> dict:
    opener = gzip.open if trace_file.endswith(".gz") else open
    with opener(trace_file, "rt") as f:
        return json.load(f)


class ProfilerParser:
    """Aggregate a JAX trace into a per-op table (pandas).

    Columns: name, calls, host_total_ms, device_total_ms, avg_device_ms.
    """

    def __init__(self, trace: str | pd.DataFrame):
        if isinstance(trace, pd.DataFrame):
            self._df = trace
            return
        data = _load_events(_find_trace_file(trace))
        events = data.get("traceEvents", [])

        # map pid -> process name to split host vs device lanes
        pid_names: dict = {}
        for e in events:
            if e.get("ph") == "M" and e.get("name") == "process_name":
                pid_names[e.get("pid")] = e.get("args", {}).get("name", "")

        rows: dict[tuple[str, bool], list[float]] = {}
        for e in events:
            if e.get("ph") != "X" or "dur" not in e:
                continue
            pname = pid_names.get(e.get("pid"), "")
            on_device = any(h in pname for h in _DEVICE_HINTS)
            key = (e.get("name", "?"), on_device)
            rows.setdefault(key, []).append(e["dur"] / 1000.0)  # us -> ms

        names = sorted({n for (n, _) in rows})
        table = []
        for n in names:
            host = rows.get((n, False), [])
            dev = rows.get((n, True), [])
            calls = max(len(host), len(dev))
            table.append({
                "name": n,
                "calls": calls,
                "host_total_ms": sum(host),
                "device_total_ms": sum(dev),
                "avg_device_ms": (sum(dev) / len(dev)) if dev else 0.0,
            })
        self._df = pd.DataFrame(
            table, columns=["name", "calls", "host_total_ms",
                            "device_total_ms", "avg_device_ms"])

    # -- chainable transforms (same surface as the reference parser) --------

    def remove_idle(self) -> "ProfilerParser":
        df = self._df
        mask = ~df["name"].str.contains("idle|Idle|unknown", regex=True)
        return ProfilerParser(df[mask].reset_index(drop=True))

    def filter_name(self, pattern: str) -> "ProfilerParser":
        df = self._df
        return ProfilerParser(
            df[df["name"].str.contains(pattern, regex=True)].reset_index(drop=True))

    def add_percentages(self) -> "ProfilerParser":
        df = self._df.copy()
        total = df["device_total_ms"].sum()
        df["device_pct"] = 100.0 * df["device_total_ms"] / total if total else 0.0
        return ProfilerParser(df)

    def round(self, digits: int = 3) -> "ProfilerParser":
        df = self._df.copy()
        for c in df.columns:
            if df[c].dtype.kind == "f":
                df[c] = df[c].round(digits)
        return ProfilerParser(df)

    def sort_by_device(self) -> "ProfilerParser":
        return ProfilerParser(
            self._df.sort_values("device_total_ms", ascending=False)
            .reset_index(drop=True))

    def sort_by_host(self) -> "ProfilerParser":
        return ProfilerParser(
            self._df.sort_values("host_total_ms", ascending=False)
            .reset_index(drop=True))

    def head(self, n: int = 20) -> "ProfilerParser":
        return ProfilerParser(self._df.head(n).reset_index(drop=True))

    # -- sinks ---------------------------------------------------------------

    def show(self) -> "ProfilerParser":
        with pd.option_context("display.max_rows", 50, "display.width", 160,
                               "display.max_colwidth", 60):
            print(self._df)
        return self

    def to_pandas(self) -> pd.DataFrame:
        return self._df.copy()

    def to_csv(self, path: str) -> "ProfilerParser":
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._df.to_csv(path, index=False)
        return self
