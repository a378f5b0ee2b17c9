"""Per-layer numerical parity vs PyTorch semantics (BASELINE.md requirement).

torch (CPU) is available in this image as a test oracle only — NOT a
framework dependency. Each test builds the torch formulation of a reference
building block from its documented semantics and checks our op/layer against
it on random inputs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from spectre_tpu.ops import (  # noqa: E402
    adaptive_avg_pool1d,
    gelu_exact,
    layer_norm,
    patch_rfft2_real,
    permut_mix,
    rfft_real,
    spectre_linear_apply,
)


def _np(t):
    return t.detach().cpu().numpy()


def test_gelu_matches_torch_exact(rng):
    x = rng.standard_normal((64,)).astype(np.float32) * 3
    ours = np.asarray(gelu_exact(jnp.asarray(x)))
    theirs = _np(torch.nn.GELU()(torch.from_numpy(x)))  # erf form default
    np.testing.assert_allclose(ours, theirs, rtol=1e-6, atol=1e-6)


def test_layer_norm_matches_torch(rng):
    x = rng.standard_normal((4, 7, 16)).astype(np.float32)
    gamma = rng.uniform(0.5, 1.5, 16).astype(np.float32)
    beta = rng.standard_normal(16).astype(np.float32)
    ours = np.asarray(layer_norm(jnp.asarray(x), jnp.asarray(gamma),
                                 jnp.asarray(beta)))
    ln = torch.nn.LayerNorm(16, eps=1e-5)
    with torch.no_grad():
        ln.weight.copy_(torch.from_numpy(gamma))
        ln.bias.copy_(torch.from_numpy(beta))
    theirs = _np(ln(torch.from_numpy(x)))
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("in_len,out_len", [(16, 16), (32, 8), (20, 7), (8, 3)])
def test_adaptive_avg_pool_matches_torch(rng, in_len, out_len):
    """Both the divisible grouped-mean fast path and the general matrix path
    must match torch.nn.AdaptiveAvgPool1d exactly (reference layers.py:90-93)."""
    x = rng.standard_normal((3, 5, in_len)).astype(np.float32)
    ours = np.asarray(adaptive_avg_pool1d(jnp.asarray(x), out_len))
    theirs = _np(torch.nn.AdaptiveAvgPool1d(out_len)(torch.from_numpy(x)))
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


def test_rfft_real_matches_torch(rng):
    x = rng.standard_normal((4, 32)).astype(np.float32)
    ours = np.asarray(rfft_real(jnp.asarray(x)))
    theirs = _np(torch.fft.rfft(torch.from_numpy(x), dim=-1).real)
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("patch", [4, 8])
def test_patch_rfft2_matches_torch_unfold_pipeline(rng, patch):
    """The SpectralPatchEmbed front half: torch unfold(2,P,P).unfold(3,P,P)
    -> rfft2(norm='ortho').real (reference spectre.py:130-136)."""
    B, C, H = 2, 3, 16
    x = rng.standard_normal((B, C, H, H)).astype(np.float32)
    ours = np.asarray(patch_rfft2_real(jnp.asarray(x), patch))
    xt = torch.from_numpy(x)
    patches = (xt.unfold(2, patch, patch).unfold(3, patch, patch)
               .contiguous().view(B, C, -1, patch, patch))
    theirs = _np(torch.fft.rfft2(patches, norm="ortho").real)
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_spectre_linear_matches_torch_composition(rng):
    """Full SpectreLinear block vs torch Linear->LayerNorm->GELU + adaptive
    pool residual (reference layers.py:85-101)."""
    m, k, n = 6, 24, 10
    x = rng.standard_normal((m, k)).astype(np.float32)
    w = (rng.standard_normal((k, n)) * 0.2).astype(np.float32)
    b = rng.standard_normal(n).astype(np.float32)
    gamma = rng.uniform(0.5, 1.5, n).astype(np.float32)
    beta = rng.standard_normal(n).astype(np.float32)

    ours = np.asarray(spectre_linear_apply(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
        jnp.asarray(gamma), jnp.asarray(beta)))

    lin = torch.nn.Linear(k, n)
    ln = torch.nn.LayerNorm(n, eps=1e-5)
    with torch.no_grad():
        lin.weight.copy_(torch.from_numpy(w.T))
        lin.bias.copy_(torch.from_numpy(b))
        ln.weight.copy_(torch.from_numpy(gamma))
        ln.bias.copy_(torch.from_numpy(beta))
    xt = torch.from_numpy(x)
    h = torch.nn.GELU()(ln(lin(xt)))
    res = torch.nn.AdaptiveAvgPool1d(n)(xt.unsqueeze(1)).squeeze(1)
    theirs = _np(h + res)
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_permut_mix_matches_torch_gather(rng):
    """Exact reference mixing semantics: flatten -> x[:, perms] * signs ->
    view [N, E*H] (reference layers.py:56-73)."""
    B, N, E, H = 3, 5, 8, 2
    d = N * E
    x = rng.standard_normal((B, N, E)).astype(np.float32)
    perms = np.stack([rng.permutation(d) for _ in range(H)]).astype(np.int64)
    signs = (rng.integers(0, 2, (1, H, d)) * 2 - 1).astype(np.float32)

    ours = np.asarray(permut_mix(
        jnp.asarray(x), jnp.asarray(perms.astype(np.int32)),
        jnp.asarray(signs), token_dim=N))

    xt = torch.from_numpy(x).view(B, -1)
    mixed = xt[:, torch.from_numpy(perms)] * torch.from_numpy(signs)
    theirs = _np(mixed.view(B, N, E * H))
    np.testing.assert_allclose(ours, theirs, rtol=1e-6, atol=1e-6)


def test_fnet_fft2_matches_torch(rng):
    from spectre_tpu.ops import fft2_real_matmul

    x = rng.standard_normal((2, 9, 16)).astype(np.float32)
    ours = np.asarray(fft2_real_matmul(jnp.asarray(x)))
    theirs = _np(torch.fft.fft2(torch.from_numpy(x), dim=(-2, -1)).real)
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-3)


def test_cross_entropy_matches_torch(rng):
    from spectre_tpu.train import cross_entropy_loss

    logits = rng.standard_normal((8, 10)).astype(np.float32)
    labels = rng.integers(0, 10, 8).astype(np.int64)
    ours = float(cross_entropy_loss(jnp.asarray(logits),
                                    jnp.asarray(labels.astype(np.int32))))
    theirs = float(torch.nn.CrossEntropyLoss()(
        torch.from_numpy(logits), torch.from_numpy(labels)))
    np.testing.assert_allclose(ours, theirs, rtol=1e-6)


def test_distill_loss_matches_torch_formulation(rng):
    """Soft-target KL at T=2 + CE mix, the reference loss (train.py:334-348)."""
    from spectre_tpu.train import distill_loss

    s = rng.standard_normal((4, 10)).astype(np.float32)
    t = rng.standard_normal((4, 10)).astype(np.float32)
    y = rng.integers(0, 10, 4).astype(np.int64)
    T = 2.0
    ours, _ = distill_loss(jnp.asarray(s), jnp.asarray(t),
                           jnp.asarray(y.astype(np.int32)),
                           temperature=T, kd_weight=0.25, ce_weight=0.75)
    st, tt = torch.from_numpy(s), torch.from_numpy(t)
    p_t = torch.softmax(tt / T, -1)
    kd = (T * T) * (p_t * (torch.log_softmax(tt / T, -1)
                           - torch.log_softmax(st / T, -1))).sum(-1).mean()
    ce = torch.nn.CrossEntropyLoss()(st, torch.from_numpy(y))
    theirs = float(0.25 * kd + 0.75 * ce)
    np.testing.assert_allclose(float(ours), theirs, rtol=1e-5)
