import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.linalg import hadamard as scipy_hadamard

from spectre_tpu.ops import (
    fwht,
    fwht_interleaved,
    hadamard_transform,
    learnable_hadamard,
    next_pow2,
)


def test_next_pow2():
    assert [next_pow2(n) for n in (1, 2, 3, 5, 8, 9, 33)] == [1, 2, 4, 8, 8, 16, 64]


@pytest.mark.parametrize("n", [2, 8, 64, 256])
def test_fwht_matches_sylvester_hadamard(n, rng):
    x = rng.standard_normal((4, n)).astype(np.float32)
    h = scipy_hadamard(n).astype(np.float32)
    expected = x @ h  # Sylvester (natural) ordering
    got = fwht(jnp.asarray(x), normalize=False)
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-5, atol=1e-4)


def test_fwht_normalized_is_orthogonal(rng):
    n = 128
    x = rng.standard_normal((3, n)).astype(np.float32)
    y = fwht(jnp.asarray(x), normalize=True)
    # orthonormal transform preserves the L2 norm and is self-inverse
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(y), axis=-1), np.linalg.norm(x, axis=-1), rtol=1e-5
    )
    np.testing.assert_allclose(np.asarray(fwht(y)), x, rtol=1e-4, atol=1e-4)


def test_fwht_arbitrary_axis(rng):
    x = rng.standard_normal((8, 5, 3)).astype(np.float32)
    got = fwht(jnp.asarray(x), axis=0, normalize=False)
    expected = np.moveaxis(
        np.asarray(fwht(jnp.asarray(np.moveaxis(x, 0, -1)), normalize=False)), -1, 0
    )
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-5)


def _numpy_interleaved_fwht(x):
    """Textbook decimation-in-time FWHT with interleaved butterfly output
    (spec for the reference's fwht_fast, hadamar.py:58-80)."""
    orig = x.shape
    n = orig[-1]
    x = x.reshape(-1, n).copy()
    h = 1
    while h < n:
        x = x.reshape(x.shape[0], -1, 2 * h)
        a, b = x[..., :h], x[..., h : 2 * h]
        out = np.empty_like(x)
        out[..., 0::2] = a + b
        out[..., 1::2] = a - b
        x = out
        h *= 2
    return x.reshape(orig)


@pytest.mark.parametrize("n", [2, 16, 128])
def test_fwht_interleaved_matches_spec(n, rng):
    x = rng.standard_normal((5, n)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(fwht_interleaved(jnp.asarray(x))),
        _numpy_interleaved_fwht(x),
        rtol=1e-5,
        atol=1e-4,
    )


def test_fwht_interleaved_is_hadamard_up_to_permutation():
    n = 16
    # rows of the transform applied to the identity must be +-1 Walsh rows
    f = np.asarray(fwht_interleaved(jnp.eye(n, dtype=jnp.float32)))
    h = scipy_hadamard(n)
    # F^T F = n I (orthogonality, unnormalized)
    np.testing.assert_allclose(f.T @ f, n * np.eye(n), atol=1e-4)
    # every column of f equals some row of the Hadamard matrix
    for col in f.T:
        assert any(np.array_equal(col, row) for row in h)


def test_fwht_interleaved_is_differentiable(rng):
    # the reference's in-place write (hadamar.py:76) broke autograd; ours must not
    x = jnp.asarray(rng.standard_normal((2, 8)).astype(np.float32))
    g = jax.grad(lambda v: jnp.sum(fwht_interleaved(v) ** 2))(x)
    assert np.isfinite(np.asarray(g)).all()


def test_hadamard_transform_equals_normalized_fwht(rng):
    x = jnp.asarray(rng.standard_normal((4, 64)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(hadamard_transform(x)), np.asarray(fwht(x)), rtol=1e-6
    )
    with pytest.raises(ValueError):
        hadamard_transform(jnp.zeros((2, 2, 2)))


def test_fwht_rejects_non_pow2():
    with pytest.raises(ValueError, match="power of 2"):
        fwht(jnp.zeros((2, 6)))


def test_learnable_hadamard_residual_and_pad(rng):
    # non-pow2 dim 10 -> padded to 16 internally, cropped back, residual added
    x = jnp.asarray(rng.standard_normal((3, 10)).astype(np.float32))
    ones = [jnp.ones(16), jnp.ones(16)]
    out = learnable_hadamard(x, ones)
    assert out.shape == x.shape
    # with unit scales: out = crop(fwht_i(fwht_i(pad(x)))) + x = crop(16*pad(x)) + x
    np.testing.assert_allclose(np.asarray(out), np.asarray(16 * x + x), rtol=1e-4)
    # scales actually participate (unlike the reference where the multiply was
    # commented out, hadamar.py:135-136)
    out2 = learnable_hadamard(x, [2 * s for s in ones])
    assert not np.allclose(np.asarray(out), np.asarray(out2))
