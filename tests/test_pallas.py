"""Pallas kernel vs jnp-reference parity (interpret mode on the CPU mesh;
the same kernels compile with Mosaic on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spectre_tpu.ops import fwht
from spectre_tpu.ops.pallas import (
    flash_attention,
    fused_spectre_linear,
    fwht_pallas,
    structured_mix_pallas,
)
from spectre_tpu.ops.linear import spectre_linear_apply
from spectre_tpu.ops.permute import (
    make_structured_tables,
    structured_mix,
)


@pytest.mark.parametrize("m,k,n", [(16, 32, 32), (10, 48, 24), (64, 16, 40)])
def test_fused_spectre_linear_matches_reference(rng, m, k, n):
    x = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((k, n)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.standard_normal((n,)).astype(np.float32) * 0.1)
    gamma = jnp.asarray(rng.uniform(0.5, 1.5, (n,)).astype(np.float32))
    beta = jnp.asarray(rng.standard_normal((n,)).astype(np.float32) * 0.1)
    ref = spectre_linear_apply(x, w, b, gamma, beta)
    out = fused_spectre_linear(x, w, b, gamma, beta, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_fused_spectre_linear_3d_batch(rng):
    x = jnp.asarray(rng.standard_normal((2, 5, 16)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((16, 16)).astype(np.float32) * 0.1)
    b = jnp.zeros(16)
    gamma, beta = jnp.ones(16), jnp.zeros(16)
    ref = spectre_linear_apply(x, w, b, gamma, beta)
    out = fused_spectre_linear(x, w, b, gamma, beta, interpret=True)
    assert out.shape == (2, 5, 16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("n", [8, 64, 256, 1024])
def test_fwht_pallas_matches_reference(rng, n):
    x = jnp.asarray(rng.standard_normal((6, n)).astype(np.float32))
    ref = fwht(x, normalize=True)
    out = fwht_pallas(x, normalize=True, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_fwht_pallas_unnormalized(rng):
    x = jnp.asarray(rng.standard_normal((3, 128)).astype(np.float32))
    ref = fwht(x, normalize=False)
    out = fwht_pallas(x, normalize=False, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-3)


@pytest.mark.parametrize("b,n,e,h", [(4, 5, 64, 2), (2, 5, 16, 3)])
def test_structured_mix_pallas_matches_reference(rng, b, n, e, h):
    d = n * e
    tile_perms, signs = make_structured_tables(jax.random.key(0), h, d)
    x = jnp.asarray(rng.standard_normal((b, n, e)).astype(np.float32))
    ref = structured_mix(x, tile_perms, signs, token_dim=n)
    out = structured_mix_pallas(x, tile_perms, signs, token_dim=n, interpret=True)
    assert out.shape == ref.shape == (b, n, e * h)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_structured_mix_is_orthogonal(rng):
    """The structured mixer must preserve norms per head (orthogonal map) —
    the property that makes it a drop-in for sign+permutation mixing."""
    d, h = 256, 2
    tile_perms, signs = make_structured_tables(jax.random.key(1), h, d)
    x = jnp.asarray(rng.standard_normal((3, d)).astype(np.float32))
    out = structured_mix(x, tile_perms, signs, token_dim=1).reshape(3, h, d)
    in_norm = np.linalg.norm(np.asarray(x), axis=-1)
    for head in range(h):
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(out)[:, head], axis=-1), in_norm, rtol=1e-4)


def test_flash_attention_matches_reference(rng):
    b, h, n, dd = 2, 3, 17, 8
    q = jnp.asarray(rng.standard_normal((b, h, n, dd)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, n, dd)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, n, dd)).astype(np.float32))
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(dd)
    ref = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(s, axis=-1), v)
    out = flash_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_fused_linear_gradients(rng):
    """Kernels must be differentiable (the reference's fwht_fast in-place write
    broke autograd, hadamar.py:76 — a bug not to port)."""
    x = jnp.asarray(rng.standard_normal((4, 16)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((16, 16)).astype(np.float32) * 0.1)
    b, gamma, beta = jnp.zeros(16), jnp.ones(16), jnp.zeros(16)

    g_kernel = jax.grad(lambda w_: jnp.sum(
        fused_spectre_linear(x, w_, b, gamma, beta, interpret=True) ** 2))(w)
    g_ref = jax.grad(lambda w_: jnp.sum(
        spectre_linear_apply(x, w_, b, gamma, beta) ** 2))(w)
    np.testing.assert_allclose(np.asarray(g_kernel), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-4)


def test_fused_linear_all_grads_nonidentity(rng):
    """The explicit backward (saved pre-LN residual, no forward recompute)
    must match autodiff of the reference for EVERY argument, including the
    K != N pool-residual path."""
    x = jnp.asarray(rng.standard_normal((3, 5, 24)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((24, 8)).astype(np.float32) * 0.2)
    b = jnp.asarray(rng.standard_normal(8).astype(np.float32) * 0.1)
    gamma = jnp.asarray(1 + 0.1 * rng.standard_normal(8).astype(np.float32))
    beta = jnp.asarray(0.1 * rng.standard_normal(8).astype(np.float32))

    def loss(fn):
        return lambda *a: jnp.sum(jnp.sin(fn(*a)))

    gk = jax.grad(loss(lambda *a: fused_spectre_linear(*a, interpret=True)),
                  argnums=(0, 1, 2, 3, 4))(x, w, b, gamma, beta)
    gr = jax.grad(loss(spectre_linear_apply), argnums=(0, 1, 2, 3, 4))(
        x, w, b, gamma, beta)
    for a, r in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=1e-4, atol=1e-4)


def test_fused_linear_bwd_has_no_forward_gemm_recompute():
    """The backward must contain exactly the two backward GEMMs (dW, dx) —
    a regression that re-runs the forward x@w (round-1's jax.vjp-based
    backward) would add a third dot_general (or a second pallas_call)."""
    x = jnp.zeros((4, 16), jnp.float32)
    w = jnp.zeros((16, 16), jnp.float32)
    b = g = jnp.zeros(16, jnp.float32)

    def loss(x, w):
        return jnp.sum(fused_spectre_linear(x, w, b, jnp.ones(16), g,
                                            interpret=True) ** 2)

    jaxpr = str(jax.make_jaxpr(jax.grad(loss, argnums=(0, 1)))(x, w))
    # one forward pallas_call whose interpret-mode body contributes the
    # single in-kernel forward GEMM, plus exactly dW and dx in the backward
    # = 3 dot_generals total; a forward-recompute regression adds a fourth
    assert jaxpr.count("pallas_call") == 1
    assert jaxpr.count("dot_general") == 3, jaxpr.count("dot_general")


def test_fwht_pallas_gradients(rng):
    x = jnp.asarray(rng.standard_normal((2, 64)).astype(np.float32))
    g = jax.grad(lambda x_: jnp.sum(fwht_pallas(x_, interpret=True) ** 3))(x)
    g_ref = jax.grad(lambda x_: jnp.sum(fwht(x_) ** 3))(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=1e-4, atol=1e-4)


def test_structured_mix_gradients(rng):
    d, h, n = 128, 2, 4
    tile_perms, signs = make_structured_tables(jax.random.key(0), h, n * (d // n))
    x = jnp.asarray(rng.standard_normal((2, n, d // n)).astype(np.float32))

    def loss_k(x_):
        return jnp.sum(structured_mix_pallas(x_, tile_perms, signs, n, interpret=True) ** 2)

    def loss_r(x_):
        return jnp.sum(structured_mix(x_, tile_perms, signs, n) ** 2)

    np.testing.assert_allclose(
        np.asarray(jax.grad(loss_k)(x)), np.asarray(jax.grad(loss_r)(x)),
        rtol=1e-4, atol=1e-4)


def test_flash_attention_gradients(rng):
    """dQ/dK/dV from the fused flash-backward kernel (saved LSE + rowsum
    trick, ops/pallas/attention.py::_bwd_kernel) must match jnp autodiff of
    the einsum reference — the backward never re-runs the forward."""
    b, h, n, dd = 2, 2, 17, 8
    q = jnp.asarray(rng.standard_normal((b, h, n, dd)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, n, dd)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, n, dd)).astype(np.float32))
    # a shifted cotangent (not symmetric in q/k) to catch transposed-operand
    # mistakes in the five backward matmuls
    w = jnp.asarray(rng.standard_normal((b, h, n, dd)).astype(np.float32))

    def ref(q_, k_, v_):
        s = jnp.einsum("bhqd,bhkd->bhqk", q_, k_) / np.sqrt(dd)
        return jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(s, -1), v_)

    gk = jax.grad(
        lambda q_, k_, v_: jnp.sum(w * flash_attention(q_, k_, v_, True)),
        argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(lambda q_, k_, v_: jnp.sum(w * ref(q_, k_, v_)),
                  argnums=(0, 1, 2))(q, k, v)
    for name, a, b_ in zip("qkv", gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-4, err_msg=f"d{name}")


def test_flash_attention_lse_residuals(rng):
    """The forward must emit LSE statistics usable by the backward: check
    exp(s - lse) reproduces the softmax rows exactly."""
    from spectre_tpu.ops.pallas.attention import _forward

    b, h, n, dd = 1, 2, 9, 8
    q = jnp.asarray(rng.standard_normal((b, h, n, dd)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, n, dd)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, n, dd)).astype(np.float32))
    out, lse = _forward(q, k, v, True)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(dd)
    p = jnp.exp(s - lse.reshape(b, h, n, 1))
    np.testing.assert_allclose(np.asarray(jnp.sum(p, -1)),
                               np.ones((b, h, n)), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(jnp.einsum("bhqk,bhkd->bhqd", p, v)),
                               np.asarray(out), rtol=1e-5, atol=1e-5)


def test_bwd_gather_kernel_matches_reference(rng):
    """Scalar-prefetch inverse-permutation gather kernel (the mix-backward
    experiment, ops/pallas/bwd_gather.py) vs the per-head jnp chain that
    production ships (fused_mix._bwd_rows math)."""
    from spectre_tpu.ops.pallas.bwd_gather import (
        inverse_gather_sum_pallas, inverse_gather_sum_reference)

    for h, d, b, r in [(4, 64, 16, 16), (3, 40, 8, 8)]:
        perms = np.stack([rng.permutation(d) for _ in range(h)]).astype(np.int32)
        inv = jnp.asarray(np.argsort(perms, -1).astype(np.int32))
        g = jnp.asarray(rng.standard_normal((h * d, b)).astype(np.float32))
        out = inverse_gather_sum_pallas(g, inv, rows_per_program=r,
                                        interpret=True)
        ref = inverse_gather_sum_reference(g, inv)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-6, atol=1e-6)

    # d not divisible by 8 falls back to the reference path (documented)
    perms = np.stack([rng.permutation(12) for _ in range(2)]).astype(np.int32)
    inv = jnp.asarray(np.argsort(perms, -1).astype(np.int32))
    g = jnp.asarray(rng.standard_normal((24, 8)).astype(np.float32))
    out = inverse_gather_sum_pallas(g, inv, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(inverse_gather_sum_reference(g, inv)),
        rtol=1e-6)
