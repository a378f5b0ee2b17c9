import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest

from spectre_tpu.profile import ProfilerParser, trace_step


@pytest.fixture(scope="module")
def traced_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("trace")

    @jax.jit
    def f(x):
        return jnp.sin(x @ x.T).sum()

    x = jnp.ones((128, 128))
    jax.block_until_ready(f(x))  # compile outside the trace
    with trace_step(str(d)) as t:
        jax.block_until_ready(f(x))
    return d, t


def test_trace_produces_file(traced_dir):
    _, t = traced_dir
    assert t.trace_file is not None and t.trace_file.endswith(".trace.json.gz")


def test_parser_builds_table(traced_dir):
    d, _ = traced_dir
    df = ProfilerParser(str(d)).to_pandas()
    assert set(df.columns) >= {"name", "calls", "host_total_ms", "device_total_ms"}
    assert len(df) > 0
    assert (df["host_total_ms"] + df["device_total_ms"]).sum() > 0


def test_parser_chainable_api(traced_dir):
    d, _ = traced_dir
    p = (ProfilerParser(str(d)).remove_idle().add_percentages()
         .round().sort_by_device().head(5))
    df = p.to_pandas()
    assert "device_pct" in df.columns
    assert len(df) <= 5
    # sorted descending
    dev = df["device_total_ms"].to_numpy()
    assert (np.diff(dev) <= 1e-9).all()


def test_parser_filter_and_csv(traced_dir, tmp_path):
    d, _ = traced_dir
    out = tmp_path / "ops.csv"
    ProfilerParser(str(d)).filter_name(".*").to_csv(str(out))
    assert pd.read_csv(out).shape[0] > 0


def test_model_summary():
    import jax.numpy as jnp

    from spectre_tpu.models import SpectreViT
    from spectre_tpu.utils import format_summary, model_summary

    model = SpectreViT(img_size=8, patch_size=4, in_channels=1, num_classes=10,
                       embed_dim=16, num_encoders=1, num_heads=2, hidden_dim=32,
                       dropout=0.0)
    s = model_summary(model, jnp.zeros((2, 1, 8, 8)))
    assert s["params"] > 1000
    assert s["buffer_elems"] > 0
    text = format_summary("tiny", s)
    assert "params" in text
