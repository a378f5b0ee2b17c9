"""Driver-contract tests for __graft_entry__ (entry + dryrun_multichip)."""

import sys
import os

import jax
import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import __graft_entry__ as graft  # noqa: E402


def test_entry_compiles_and_runs():
    fn, (variables, x) = graft.entry()
    out = jax.jit(fn)(variables, x)
    assert np.asarray(out).shape == (x.shape[0], 100)
    assert np.isfinite(np.asarray(out)).all()


def test_dryrun_multichip_8(capsys):
    graft.dryrun_multichip(8)
    assert "dryrun_multichip ok" in capsys.readouterr().out
