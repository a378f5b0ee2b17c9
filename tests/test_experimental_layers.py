"""The experimental layer zoo (SURVEY.md §2 'experimental layers' row):
library modules defining the reference's research surface."""

import jax
import jax.numpy as jnp
import numpy as np

from spectre_tpu.models import (
    BinaryLinear,
    FFTApproximator,
    FFTLayer,
    LearnableHadamard,
    LearnedSigmoid,
    NormalMask,
)
from spectre_tpu.ops import fwht_interleaved, next_pow2, rfft_real


def test_binary_linear_weights_are_signs(rng):
    x = jnp.asarray(rng.standard_normal((4, 8)).astype(np.float32))
    mod = BinaryLinear(6)
    v = mod.init(jax.random.key(0), x)
    y = mod.apply(v, x)
    assert y.shape == (4, 6)
    # output equals scale * x @ sign(W)^T
    w = np.asarray(v["params"]["weight"])
    scale = float(np.asarray(v["params"]["scale"])[0])
    expected = scale * np.asarray(x) @ np.sign(w).T
    np.testing.assert_allclose(np.asarray(y), expected, rtol=1e-5, atol=1e-6)


def test_binary_linear_gradient_flows_through_scale(rng):
    x = jnp.asarray(rng.standard_normal((4, 8)).astype(np.float32))
    mod = BinaryLinear(6)
    v = mod.init(jax.random.key(0), x)

    def loss(p):
        return jnp.sum(mod.apply({"params": p}, x) ** 2)

    g = jax.grad(loss)(v["params"])
    assert float(jnp.abs(g["scale"]).sum()) > 0


def test_fft_approximator_shape_and_learnability(rng):
    dim = 32
    mod = FFTApproximator(dim=dim)
    x = jnp.asarray(rng.standard_normal((16, dim)).astype(np.float32))
    v = mod.init(jax.random.key(0), x)
    y = mod.apply(v, x)
    assert y.shape == (16, dim // 2 + 1)  # rfft output size
    # one grad step against rfft targets reduces the loss (the fft_approx study)
    target = rfft_real(x)

    def loss(p):
        return jnp.mean((mod.apply(p, x) - target) ** 2)

    l0 = float(loss(v))
    g = jax.grad(loss)(v)
    v1 = jax.tree.map(lambda a, b: a - 0.01 * b, v, g)
    assert float(loss(v1)) < l0


def test_learned_sigmoid_gates_sharply():
    mod = LearnedSigmoid(threshold=0.5)
    x = jnp.asarray([-2.0, -0.6, -0.4, 1.0])
    v = mod.init(jax.random.key(0), x)
    y = np.asarray(mod.apply(v, x))
    # sharp gate around -threshold: below ~ 1, above ~ 0
    assert y[0] > 0.99 and y[3] < 0.01
    assert y[1] > 0.5 > y[2]


def test_normal_mask_peaks_at_mean(rng):
    n = 16
    mod = NormalMask(n_bins=n)
    x = jnp.ones((2, n))
    v = mod.init(jax.random.key(0), x)
    y = np.asarray(mod.apply(v, x))
    assert y.shape == (2, n)
    assert np.argmax(y[0]) == n // 2  # gaussian centered at n/2
    assert y.max() <= 1.0 + 1e-6


def test_learnable_hadamard_residual_and_scales(rng):
    dim = 20  # non-pow2: exercises the pad-to-32 + crop path
    mod = LearnableHadamard(dim=dim, num_blocks=2)
    x = jnp.asarray(rng.standard_normal((3, dim)).astype(np.float32))
    v = mod.init(jax.random.key(0), x)
    y = mod.apply(v, x)
    assert y.shape == x.shape
    # with unit scales, output == fwht passes + residual
    pdim = next_pow2(dim)
    xp = np.zeros((3, pdim), np.float32)
    xp[:, :dim] = np.asarray(x)
    h = np.asarray(fwht_interleaved(fwht_interleaved(jnp.asarray(xp))))
    np.testing.assert_allclose(np.asarray(y), h[:, :dim] + np.asarray(x),
                               rtol=1e-4, atol=1e-4)
    # scales receive gradient (active, unlike the reference's commented-out
    # multiply at hadamar.py:135-136)
    g = jax.grad(lambda p: jnp.sum(mod.apply(p, x) ** 2))(v)
    assert float(jnp.abs(g["params"]["scale_0"]).sum()) > 0


def test_fft_layer_matches_rfft_real(rng):
    x = jnp.asarray(rng.standard_normal((2, 5, 16)).astype(np.float32))
    mod = FFTLayer()
    y = mod.apply({}, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(rfft_real(x)),
                               rtol=1e-5, atol=1e-5)
    assert y.shape == (2, 5, 9)
