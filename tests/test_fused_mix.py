"""Custom-VJP permut-mix (ops/fused_mix.py) vs the autodiff reference.

``permut_mix_fused`` must be numerically identical to ``permut_mix`` in both
forward and gradients — only the autodiff schedule differs (inverse-perm
gather backward instead of scatter-add).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spectre_tpu.models.layers import MHPermutMix
from spectre_tpu.ops import make_mix_tables, permut_mix, permut_mix_fused


@pytest.mark.parametrize("n,e,h", [(8, 16, 4), (5, 12, 3)])
def test_fused_forward_and_grads_match_reference(n, e, h):
    d = n * e
    perms, signs = make_mix_tables(jax.random.key(0), h, d)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((3, d)).astype(np.float32))

    ref = permut_mix(x, perms, signs, n).reshape(3, h, d)
    fused = permut_mix_fused(x, perms, signs[0])
    np.testing.assert_array_equal(np.asarray(fused), np.asarray(ref))

    # arbitrary downstream scalar so the cotangent is non-trivial
    coeff = jnp.asarray(rng.standard_normal((h, d)).astype(np.float32))

    def loss_ref(x):
        m = permut_mix(x, perms, signs, n).reshape(3, h, d)
        return jnp.sum(jnp.sin(m) * coeff)

    def loss_fused(x):
        return jnp.sum(jnp.sin(permut_mix_fused(x, perms, signs[0])) * coeff)

    g_ref = jax.grad(loss_ref)(x)
    g_fused = jax.grad(loss_fused)(x)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               atol=1e-5, rtol=1e-5)


def test_no_scatter_in_gradient_hlo():
    """The whole point: the backward lowers to gathers, never scatter."""
    n, e, h = 8, 16, 4
    d = n * e
    perms, signs = make_mix_tables(jax.random.key(0), h, d)
    x = jnp.zeros((2, d), jnp.float32)

    def loss(x):
        return jnp.sum(permut_mix_fused(x, perms, signs[0]) ** 2)

    hlo = jax.jit(jax.grad(loss)).lower(x).as_text()
    assert "scatter" not in hlo


def test_module_fused_vs_unfused_identical_tree_and_numerics():
    """MHPermutMix(fused=True) and (fused=False) share params/buffers layout
    and produce the same outputs and parameter gradients."""
    kw = dict(embed_dim=16, token_dim=8, num_heads=4, out_channels=16,
              impl="gather")
    m_f = MHPermutMix(fused=True, **kw)
    m_u = MHPermutMix(fused=False, **kw)
    x = jnp.asarray(np.random.default_rng(1).standard_normal(
        (2, 8, 16)).astype(np.float32))
    v_f = m_f.init(jax.random.key(7), x)
    v_u = m_u.init(jax.random.key(7), x)

    # identical variable trees (checkpoint/export interchangeability)
    assert jax.tree.structure(v_f) == jax.tree.structure(v_u)
    for a, b in zip(jax.tree.leaves(v_f), jax.tree.leaves(v_u)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    y_f = m_f.apply(v_f, x)
    y_u = m_u.apply(v_u, x)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_u), atol=1e-6)

    def loss(mod, v):
        return jnp.sum(mod.apply(v, x) ** 2)

    g_f = jax.grad(lambda p: loss(m_f, {**v_f, "params": p}))(v_f["params"])
    g_u = jax.grad(lambda p: loss(m_u, {**v_u, "params": p}))(v_u["params"])
    for a, b in zip(jax.tree.leaves(g_f), jax.tree.leaves(g_u)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=1e-5)


def test_token_major_variant_matches_batch_major():
    """TokenMajorMixLinear (transposed-layout formulation): identical param
    tree, outputs and grads as the batch-major path. Measured a wash at
    flagship scale (238.4 vs 236.6 ms/step — XLA re-inserts equivalent
    relayouts at the layer boundaries; BASELINE.md), kept as a parity-tested
    alternative formulation."""
    kw = dict(embed_dim=16, token_dim=8, num_heads=4, out_channels=16,
              impl="gather")
    m_a = MHPermutMix(**kw)
    m_t = MHPermutMix(token_major=True, **kw)
    x = jnp.asarray(np.random.default_rng(1).standard_normal(
        (3, 8, 16)).astype(np.float32))
    v = m_a.init(jax.random.key(7), x)
    assert jax.tree.structure(v) == jax.tree.structure(m_t.init(jax.random.key(7), x))
    np.testing.assert_allclose(np.asarray(m_a.apply(v, x)),
                               np.asarray(m_t.apply(v, x)), atol=1e-6)
    ga = jax.grad(lambda p: jnp.sum(m_a.apply({**v, "params": p}, x) ** 2))(v["params"])
    gt = jax.grad(lambda p: jnp.sum(m_t.apply({**v, "params": p}, x) ** 2))(v["params"])
    for a, b in zip(jax.tree.leaves(ga), jax.tree.leaves(gt)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)
