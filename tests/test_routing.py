"""Clos-routing decomposition of the mix permutations (ops/routing.py).

The 3-stage factorization must reproduce the inverse-permutation gather-sum
(the folded-mix backward, ops/fused_mix.py::_bwd_rows) exactly: one-hot
contractions pass values through bit-identically, so the take-form is
bitwise equal and the MXU form differs only in head-sum accumulation order.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from spectre_tpu.ops.routing import (build_route_tables, edge_color,
                                     pick_factor, route_gather_sum,
                                     route_gather_sum_mxu, route_onehots)


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _reference(g, inv):
    h, d = inv.shape
    gh = np.asarray(g).reshape(h, d, -1)
    return sum(gh[i][inv[i]] for i in range(h))


def test_edge_color_is_proper(rng):
    """Each (vertex, colour) pair occurs exactly once on both sides."""
    r, c = 13, 8
    d = r * c
    for _ in range(3):
        sig = rng.permutation(d)
        src, dst = sig // c, np.arange(d) // c
        col = edge_color(src, dst, c)
        left = np.zeros((r, c), np.int32)
        right = np.zeros((r, c), np.int32)
        np.add.at(left, (src, col), 1)
        np.add.at(right, (dst, col), 1)
        assert (left == 1).all() and (right == 1).all()


def test_pick_factor():
    assert pick_factor(33280) == 128  # flagship: 260 x 128
    assert pick_factor(64) == 64
    assert pick_factor(1040) == 16
    assert pick_factor(33) == 0  # odd: no usable factor
    assert pick_factor(4) == 0  # below the 8-sublane floor


@pytest.mark.parametrize("h,d,b", [(4, 64, 16), (3, 256, 8), (16, 1040, 4),
                                   (2, 520, 32)])
def test_route_matches_gather_sum(rng, h, d, b):
    perms = np.stack([rng.permutation(d) for _ in range(h)]).astype(np.int32)
    inv = np.argsort(perms, -1).astype(np.int32)
    g = rng.standard_normal((h * d, b)).astype(np.float32)
    ref = _reference(g, inv)
    rt = build_route_tables(inv)
    np.testing.assert_array_equal(
        np.asarray(route_gather_sum(jnp.asarray(g), rt)), ref)
    oh = route_onehots(rt, dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(route_gather_sum_mxu(jnp.asarray(g), *oh)), ref,
        rtol=1e-6, atol=1e-5)


def test_route_bf16_passthrough(rng):
    """One-hot matmuls must pass bf16 values through bit-exactly per head;
    only the head-sum accumulation (f32 on MXU vs sequential bf16) differs."""
    h, d, b = 1, 256, 16  # single head: no sum-order ambiguity at all
    perms = rng.permutation(d)[None].astype(np.int32)
    inv = np.argsort(perms, -1).astype(np.int32)
    g = jnp.asarray(rng.standard_normal((h * d, b)), jnp.bfloat16)
    ref = np.asarray(_reference(np.asarray(g, np.float32), inv))
    rt = build_route_tables(inv)
    got = np.asarray(route_gather_sum_mxu(g, *route_onehots(rt)), np.float32)
    np.testing.assert_array_equal(got, ref)
    np.testing.assert_array_equal(
        np.asarray(route_gather_sum(g, rt), np.float32), ref)


def test_route_rejects_unfactorable():
    inv = np.argsort(np.stack([np.random.default_rng(0).permutation(33)]), -1)
    with pytest.raises(ValueError):
        build_route_tables(inv.astype(np.int32))
