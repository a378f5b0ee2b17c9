"""ProfilerParser over a REAL recorded TPU trace (committed fixture).

Round-1's parser was validated only against synthetic/CPU traces (VERDICT
weak #8). The fixture is an actual `jax.profiler` capture of 3 flagship
SpectreViT train steps on a TPU v5e chip (round 2, the same capture whose
per-op table is committed as benchmarks/v5e_train_step_ops_r2start.csv's
successor in BASELINE.md). The real device layout — TensorCore op lanes,
jit_train_step wrapper events, fusion names — must roundtrip through the
full chainable API.
"""

import os

import pytest

from spectre_tpu.profile import ProfilerParser

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "v5e_train_step.trace.json.gz")


@pytest.fixture(scope="module")
def parser():
    return ProfilerParser(FIXTURE)


def test_real_trace_loads_and_has_device_time(parser):
    df = parser._df
    assert len(df) > 100
    assert df["device_total_ms"].sum() > 100.0  # 3 steps x ~236 ms


def test_real_trace_contains_the_train_step(parser):
    df = parser._df
    jit_rows = df[df["name"].str.startswith("jit_train_step")]
    assert len(jit_rows) >= 1
    # 3 profiled steps at roughly the bench-measured per-step time
    per_step = float(jit_rows["device_total_ms"].sum()) / float(jit_rows["calls"].sum())
    assert 100.0 < per_step < 1000.0


def test_real_trace_chainable_api_and_csv(parser, tmp_path):
    out = tmp_path / "ops.csv"
    (parser.remove_idle().filter_name("fusion").add_percentages().round()
     .sort_by_device().head(10).to_csv(str(out)))
    text = out.read_text()
    assert "fusion" in text
    assert len(text.splitlines()) == 11  # header + 10 rows
