"""Folded mix+linear (mix_impl="folded") vs the reference gather path.

The fold reassociates the (linear) sign-flip and pool residual onto the
projection weights (models/layers.py::FoldedMixLinear) — same math, params,
buffers and checkpoints as impl="gather"; only the schedule differs. These
tests pin: bit-level forward parity in f32, gradient parity, variable-tree
interchangeability, scatter-free backward HLO, and the sign-free row-gather
op itself (ops/fused_mix.py::perm_rows_t).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spectre_tpu.models.layers import MHPermutMix
from spectre_tpu.ops import make_mix_tables, perm_rows_t


@pytest.mark.parametrize("n,e,h", [(8, 16, 4), (5, 12, 3)])
def test_perm_rows_matches_take_and_grads(n, e, h):
    d = n * e
    perms, _ = make_mix_tables(jax.random.key(0), h, d)
    rng = np.random.default_rng(0)
    xt = jnp.asarray(rng.standard_normal((d, 3)).astype(np.float32))

    ref = jnp.take(xt, perms.reshape(-1), axis=0)
    np.testing.assert_array_equal(np.asarray(perm_rows_t(xt, perms)),
                                  np.asarray(ref))

    coeff = jnp.asarray(rng.standard_normal((h * d, 3)).astype(np.float32))
    g_ref = jax.grad(lambda x: jnp.sum(
        jnp.sin(jnp.take(x, perms.reshape(-1), axis=0)) * coeff))(xt)
    g_new = jax.grad(lambda x: jnp.sum(
        jnp.sin(perm_rows_t(x, perms)) * coeff))(xt)
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                               atol=1e-5, rtol=1e-5)


def test_perm_rows_backward_is_scatter_free():
    n, e, h = 8, 16, 4
    d = n * e
    perms, _ = make_mix_tables(jax.random.key(0), h, d)
    xt = jnp.zeros((d, 2), jnp.float32)
    hlo = jax.jit(jax.grad(
        lambda x: jnp.sum(perm_rows_t(x, perms) ** 2))).lower(xt).as_text()
    assert "scatter" not in hlo


# out_channels chosen to hit each pool-residual branch: grouped mean
# (in % out == 0), torch-adaptive matrix (non-divisible), identity-group
# (in == out via grp == 1 is impossible for H > 1, so grp > 1 covers it).
# Batch MUST be >= 8: below that MHPermutMix reroutes folded->gather at
# trace time (layers.py — tiny-batch compile pathology), and the test would
# compare the gather path against itself (round-2 advisor finding).
@pytest.mark.parametrize("out_channels", [16, 24, 27, 64])
def test_folded_matches_gather_forward_and_grads(out_channels):
    kw = dict(embed_dim=16, token_dim=8, num_heads=4,
              out_channels=out_channels)
    m_ref = MHPermutMix(impl="gather", **kw)
    m_fold = MHPermutMix(impl="folded", **kw)
    x = jnp.asarray(np.random.default_rng(1).standard_normal(
        (16, 8, 16)).astype(np.float32))
    v = m_ref.init(jax.random.key(7), x)

    # the folded branch must actually be TAKEN at this batch: its lowered
    # program differs from the gather path's (at B < 8 they are identical
    # by design — the reroute)
    hlo_fold = jax.jit(m_fold.apply).lower(v, x).as_text()
    hlo_gather = jax.jit(m_ref.apply).lower(v, x).as_text()
    assert hlo_fold != hlo_gather, "folded impl silently rerouted to gather"
    x_small = x[:3]
    assert (jax.jit(m_fold.apply).lower(v, x_small).as_text()
            == jax.jit(m_ref.apply).lower(v, x_small).as_text()), \
        "sub-8 batch should reroute folded->gather"

    # identical variable tree: checkpoints interchange between impls
    v2 = m_fold.init(jax.random.key(7), x)
    assert jax.tree.structure(v) == jax.tree.structure(v2)
    for a, b in zip(jax.tree.leaves(v), jax.tree.leaves(v2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    np.testing.assert_allclose(np.asarray(m_ref.apply(v, x)),
                               np.asarray(m_fold.apply(v, x)),
                               atol=1e-5, rtol=1e-5)

    def loss(mod, p):
        return jnp.sum(mod.apply({**v, "params": p}, x) ** 2)

    g_ref = jax.grad(lambda p: loss(m_ref, p))(v["params"])
    g_fold = jax.grad(lambda p: loss(m_fold, p))(v["params"])
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_fold)):
        # measured param-grad divergence up to ~6e-5 at B=16 (different but
        # equivalent reduction orders in the reassociated dW GEMM)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)

    gx_ref = jax.grad(lambda xx: jnp.sum(m_ref.apply(v, xx) ** 2))(x)
    gx_fold = jax.grad(lambda xx: jnp.sum(m_fold.apply(v, xx) ** 2))(x)
    np.testing.assert_allclose(np.asarray(gx_fold), np.asarray(gx_ref),
                               atol=1e-4, rtol=1e-4)


def test_folded_full_model_matches_gather():
    """End-to-end SpectreViT: same checkpoint, same logits under both impls.
    Batch 16 keeps the folded branch live (see reroute note above)."""
    from spectre_tpu.models import SpectreViT

    kw = dict(img_size=16, patch_size=4, in_channels=3, num_classes=10,
              embed_dim=32, num_encoders=2, num_heads=4, hidden_dim=48,
              dropout=0.0)
    x = jnp.asarray(np.random.default_rng(2).uniform(
        0, 1, (16, 3, 16, 16)).astype(np.float32))
    m_ref = SpectreViT(mix_impl="gather", **kw)
    m_fold = SpectreViT(mix_impl="folded", **kw)
    v = m_ref.init(jax.random.key(3), x)
    assert (jax.tree.structure(v)
            == jax.tree.structure(m_fold.init(jax.random.key(3), x)))
    assert (jax.jit(m_fold.apply).lower(v, x).as_text()
            != jax.jit(m_ref.apply).lower(v, x).as_text()), \
        "folded impl silently rerouted to gather"
    np.testing.assert_allclose(np.asarray(m_ref.apply(v, x)),
                               np.asarray(m_fold.apply(v, x)),
                               atol=1e-5, rtol=1e-5)


def test_folded_proj_pool_combined_vjp_matches_autodiff():
    """folded_proj_pool (projection + grouped sign-mean pool in ONE custom
    VJP — a measured flagship dead end kept for other geometries, see its
    docstring) must match the plain autodiff composition in primals and in
    the g4/w gradients. s4 is a non-differentiable ±1 sign buffer (its
    cotangent is deliberately zero, same convention as folded_proj) so it
    is excluded here."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from spectre_tpu.ops import folded_proj_pool

    rng = np.random.default_rng(11)
    n, e, b, o = 5, 24, 16, 6  # grp = 4
    grp = e // o
    g4 = jnp.asarray(rng.standard_normal((n, e, b)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((e, o)).astype(np.float32))
    s4 = jnp.asarray(rng.choice([-1.0, 1.0], (n, e)).astype(np.float32))

    def ref(g4, w):
        y = jnp.einsum("neb,neo->nbo", g4, s4[:, :, None] * w[None])
        pool = jnp.einsum("nuvb,nuv->nbu", g4.reshape(n, o, grp, b),
                          s4.reshape(n, o, grp) / grp)
        return y, pool

    def loss(f, g4, w):
        y, pool = f(g4, w)
        return jnp.sum(y ** 2) + jnp.sum(jnp.sin(pool))

    fused = lambda g4, w: folded_proj_pool(g4, w, s4, grp)
    y1, p1 = fused(g4, w)
    y2, p2 = ref(g4, w)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
    got = jax.grad(lambda a, c: loss(fused, a, c), argnums=(0, 1))(g4, w)
    want = jax.grad(lambda a, c: loss(ref, a, c), argnums=(0, 1))(g4, w)
    for a, c in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   atol=1e-5, rtol=1e-5)
