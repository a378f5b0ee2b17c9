import jax.numpy as jnp
import numpy as np
import pytest

from spectre_tpu.ops import (
    haar_dwt1d,
    haar_dwt2d,
    haar_dwt2d_multilevel,
    haar_dwt_mix,
    haar_idwt1d,
    haar_idwt2d,
)


def test_haar_dwt1d_known_values():
    x = jnp.asarray([1.0, 1.0, 2.0, 4.0])
    a, d = haar_dwt1d(x)
    s2 = np.sqrt(2.0)
    np.testing.assert_allclose(np.asarray(a), [2 / s2, 6 / s2], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(d), [0.0, -2 / s2], atol=1e-6)


def test_haar_dwt1d_perfect_reconstruction(rng):
    x = jnp.asarray(rng.standard_normal((3, 4, 32)).astype(np.float32))
    a, d = haar_dwt1d(x)
    np.testing.assert_allclose(np.asarray(haar_idwt1d(a, d)), np.asarray(x), rtol=1e-5, atol=1e-6)


def test_haar_dwt1d_energy_preserving(rng):
    x = jnp.asarray(rng.standard_normal((2, 64)).astype(np.float32))
    a, d = haar_dwt1d(x)
    e_in = np.sum(np.asarray(x) ** 2)
    e_out = np.sum(np.asarray(a) ** 2) + np.sum(np.asarray(d) ** 2)
    np.testing.assert_allclose(e_in, e_out, rtol=1e-5)


def test_haar_dwt1d_odd_length_raises():
    with pytest.raises(ValueError, match="even"):
        haar_dwt1d(jnp.zeros((2, 7)))


@pytest.mark.parametrize("n", [64, 65])  # 65 = CLS+64 tokens: the real seq length
def test_haar_dwt_mix_shape_preserving(n, rng):
    x = jnp.asarray(rng.standard_normal((2, n, 16)).astype(np.float32))
    out = haar_dwt_mix(x, axis=-2)
    assert out.shape == x.shape
    # orthogonal up to the passthrough element: energy preserved
    np.testing.assert_allclose(
        np.sum(np.asarray(out) ** 2), np.sum(np.asarray(x) ** 2), rtol=1e-4
    )


def test_haar_dwt2d_reconstruction_and_subbands(rng):
    x = jnp.asarray(rng.standard_normal((2, 3, 16, 16)).astype(np.float32))
    ll, highs = haar_dwt2d(x)
    assert ll.shape == (2, 3, 8, 8)
    assert all(h.shape == (2, 3, 8, 8) for h in highs)
    np.testing.assert_allclose(np.asarray(haar_idwt2d(ll, highs)), np.asarray(x), rtol=1e-4, atol=1e-5)
    # constant image: all detail subbands vanish, LL carries 2x the value
    const = jnp.ones((1, 1, 4, 4))
    ll_c, highs_c = haar_dwt2d(const)
    np.testing.assert_allclose(np.asarray(ll_c), 2.0, rtol=1e-6)
    for h in highs_c:
        np.testing.assert_allclose(np.asarray(h), 0.0, atol=1e-7)


def test_haar_dwt2d_multilevel_shapes(rng):
    x = jnp.asarray(rng.standard_normal((1, 3, 32, 32)).astype(np.float32))
    ll, highs = haar_dwt2d_multilevel(x, levels=3)  # DWTForward(J=3) equivalent
    assert ll.shape == (1, 3, 4, 4)
    assert [h[0].shape[-1] for h in highs] == [16, 8, 4]
