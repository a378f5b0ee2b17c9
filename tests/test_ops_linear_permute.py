import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from spectre_tpu.ops import (
    adaptive_avg_pool1d,
    gelu_exact,
    invert_permutation,
    layer_norm,
    make_mix_tables,
    permut_mix,
    spectre_linear_apply,
)


def test_gelu_exact_matches_torch(rng):
    x = rng.standard_normal(1000).astype(np.float32) * 3
    expected = torch.nn.functional.gelu(torch.from_numpy(x)).numpy()  # erf form
    np.testing.assert_allclose(np.asarray(gelu_exact(jnp.asarray(x))), expected, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("lin,lout", [(512, 100), (768, 512), (100, 7), (64, 64)])
def test_adaptive_avg_pool1d_matches_torch(lin, lout, rng):
    x = rng.standard_normal((2, 5, lin)).astype(np.float32)
    expected = torch.nn.AdaptiveAvgPool1d(lout)(torch.from_numpy(x)).numpy()
    got = np.asarray(adaptive_avg_pool1d(jnp.asarray(x), lout))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)


def test_layer_norm_matches_torch(rng):
    d = 64
    x = rng.standard_normal((3, 7, d)).astype(np.float32)
    g = rng.standard_normal(d).astype(np.float32)
    b = rng.standard_normal(d).astype(np.float32)
    ln = torch.nn.LayerNorm(d, eps=1e-5)
    with torch.no_grad():
        ln.weight.copy_(torch.from_numpy(g))
        ln.bias.copy_(torch.from_numpy(b))
    expected = ln(torch.from_numpy(x)).detach().numpy()
    got = np.asarray(layer_norm(jnp.asarray(x), jnp.asarray(g), jnp.asarray(b)))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("din,dout", [(48, 48), (48, 32)])
def test_spectre_linear_matches_torch_composition(din, dout, rng):
    """SpectreLinear = GELU(LN(Linear(x))) + adaptive-pool residual
    (reference layers.py:85-101), rebuilt from torch primitives as the spec."""
    B, N = 2, 5
    x = rng.standard_normal((B, N, din)).astype(np.float32)
    w = (rng.standard_normal((din, dout)) * 0.1).astype(np.float32)
    b = rng.standard_normal(dout).astype(np.float32)
    g = rng.standard_normal(dout).astype(np.float32)
    beta = rng.standard_normal(dout).astype(np.float32)

    xt = torch.from_numpy(x)
    h = xt @ torch.from_numpy(w) + torch.from_numpy(b)
    h = torch.nn.functional.layer_norm(h, (dout,), torch.from_numpy(g), torch.from_numpy(beta), 1e-5)
    h = torch.nn.functional.gelu(h)
    res = xt if din == dout else torch.nn.AdaptiveAvgPool1d(dout)(xt)
    expected = (h + res).numpy()

    got = np.asarray(
        spectre_linear_apply(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), jnp.asarray(g), jnp.asarray(beta))
    )
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_permut_mix_matches_torch_view_gather(rng):
    """Exact reference MHPermutMix pre-projection semantics (layers.py:68-72):
    flatten -> x[:, perms] * signs -> view(B, N, E*H)."""
    B, N, E, H = 3, 5, 8, 4
    d = N * E
    x = rng.standard_normal((B, N, E)).astype(np.float32)
    perms = np.stack([rng.permutation(d) for _ in range(H)]).astype(np.int64)
    signs = (rng.integers(0, 2, (1, H, d)).astype(np.float32) * 2 - 1)

    xt = torch.from_numpy(x).view(B, -1)
    mixed = xt[:, torch.from_numpy(perms)] * torch.from_numpy(signs)
    expected = mixed.view(B, N, E * H).numpy()

    got = np.asarray(
        permut_mix(jnp.asarray(x), jnp.asarray(perms.astype(np.int32)), jnp.asarray(signs), N)
    )
    np.testing.assert_array_equal(got, expected)


def test_make_mix_tables_properties():
    H, d = 4, 160
    perms, signs = make_mix_tables(jax.random.key(0), H, d)
    assert perms.shape == (H, d) and signs.shape == (1, H, d)
    p = np.asarray(perms)
    for h in range(H):
        assert sorted(p[h].tolist()) == list(range(d))  # valid permutations
    s = np.asarray(signs)
    assert set(np.unique(s)) <= {-1.0, 1.0}
    # reproducible from the same key
    p2, s2 = make_mix_tables(jax.random.key(0), H, d)
    np.testing.assert_array_equal(p, np.asarray(p2))
    np.testing.assert_array_equal(s, np.asarray(s2))


def test_invert_permutation_roundtrip(rng):
    d = 97
    perm = jnp.asarray(rng.permutation(d).astype(np.int32))
    inv = invert_permutation(perm)
    np.testing.assert_array_equal(np.asarray(inv[perm]), np.arange(d))
    batched = jnp.stack([perm, invert_permutation(perm)])
    invb = invert_permutation(batched)
    np.testing.assert_array_equal(np.asarray(invb[0]), np.asarray(inv))
