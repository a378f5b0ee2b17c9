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


@pytest.mark.parametrize("t_chunk", [8, 128])
def test_routed_pallas_kernel(rng, t_chunk):
    """Fused 3-stage kernel (ops/pallas/routed_gather.py, interpret mode)
    is bit-exact against the gather-sum, including the bf16 path."""
    from spectre_tpu.ops.pallas.routed_gather import routed_gather_sum_pallas

    h, d, b = 4, 256, 16
    perms = np.stack([rng.permutation(d) for _ in range(h)]).astype(np.int32)
    inv = np.argsort(perms, -1).astype(np.int32)
    rt = build_route_tables(inv)
    g = rng.standard_normal((h * d, b)).astype(np.float32)
    got = routed_gather_sum_pallas(jnp.asarray(g), rt, block_b=8,
                                   t_chunk=t_chunk, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), _reference(g, inv))

    gb = jnp.asarray(g, jnp.bfloat16)
    got = routed_gather_sum_pallas(gb, rt, block_b=8, t_chunk=t_chunk,
                                   interpret=True)
    gbh = np.asarray(gb).reshape(h, d, -1)
    ref = gbh[0][inv[0]]
    for i in range(1, h):  # bf16 add chain, matching the kernel's head accum
        ref = (ref + gbh[i][inv[i]]).astype(jnp.bfloat16)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_registered_routes_give_bitwise_equal_grads(rng, monkeypatch):
    """End-to-end: register_mix_routes from a folded-mix model's buffers,
    and the routed backward (take-form route) must match the per-head
    gather chain BITWISE — per-head pass-through is exact and the head
    accumulation runs in the same order and dtype.

    A call counter on the route application asserts the routed path was
    actually TAKEN (round-3 review: a falsy "" route_key for a top-level
    mix module silently fell back to the gather chain, making this test
    compare the fallback against itself)."""
    import jax
    from spectre_tpu.models.layers import MHPermutMix
    from spectre_tpu.ops.fused_mix import (clear_mix_routes,
                                           register_mix_routes)
    from spectre_tpu.ops import routing as routing_mod

    calls = {"takes": 0}
    real_route = routing_mod.route_gather_sum

    def counting_route(g, rt):
        calls["takes"] += 1
        return real_route(g, rt)

    monkeypatch.setattr(routing_mod, "route_gather_sum", counting_route)

    e, n, h, b = 32, 17, 3, 8  # d = 544 = 17 x 32 (pick_factor -> 32)
    model = MHPermutMix(embed_dim=e, token_dim=n, num_heads=h,
                        out_channels=e, impl="folded")
    x = jnp.asarray(rng.standard_normal((b, n, e)).astype(np.float32))
    variables = model.init(jax.random.key(0), x)

    params = variables["params"]
    buffers = variables["buffers"]

    def loss(p, x):
        return (model.apply({"params": p, "buffers": buffers}, x) ** 2).sum()

    clear_mix_routes()
    g_plain = jax.grad(loss, argnums=(0, 1))(params, x)
    assert calls["takes"] == 0
    keys = register_mix_routes(variables, impl="takes")
    assert keys, "walker found no mix tables"
    try:
        g_routed = jax.grad(loss, argnums=(0, 1))(params, x)
    finally:
        clear_mix_routes()
    assert calls["takes"] > 0, "routed backward was never taken (vacuous test)"
    flat_p, _ = jax.tree.flatten(g_plain)
    flat_r, _ = jax.tree.flatten(g_routed)
    for a, c in zip(flat_p, flat_r):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))

    # pallas impl (interpret on CPU) matches too
    keys = register_mix_routes(variables, impl="pallas")
    try:
        g_pl = jax.grad(loss, argnums=(0, 1))(params, x)
    finally:
        clear_mix_routes()
    for a, c in zip(flat_p, jax.tree.flatten(g_pl)[0]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


def test_route_rejects_unfactorable():
    inv = np.argsort(np.stack([np.random.default_rng(0).permutation(33)]), -1)
    with pytest.raises(ValueError):
        build_route_tables(inv.astype(np.int32))
