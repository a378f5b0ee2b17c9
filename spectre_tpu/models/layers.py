"""Flax layer library — parity surface of the reference layer zoo
(``/root/reference/spectre_vit/models/spectre/layers.py`` and
``modules/spectre.py``), rebuilt as linen modules over the ops layer.

Numerics contracts (verified in tests/test_models.py and
tests/test_ops_linear_permute.py):
- GELU is the exact erf form (torch ``nn.GELU()`` default).
- LayerNorm eps = 1e-5 (torch default; reference spectre.py:46).
- SpectreLinear = GELU(LN(Dense(x))) + adaptive-avg-pool residual
  (layers.py:85-101); identity residual when in==out.
- MHPermutMix buffers (perms/signs) are non-trainable variables in the
  "buffers" collection, generated from the module init PRNG — reproducible
  and checkpointed (SURVEY.md §7 "deterministic fixed random tables").
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from spectre_tpu.models.init import torch_bias_init, torch_kernel_init
from spectre_tpu.ops import (
    learnable_hadamard,
    folded_proj,
    make_mix_tables,
    make_structured_tables,
    next_pow2,
    permut_mix,
    permut_mix_fused,
    permut_mix_fused_t,
    rfft_real,
    spectre_linear_apply,
    structured_mix,
)
from spectre_tpu.ops.pallas import fused_spectre_linear

Dtype = Any


class SpectreLinear(nn.Module):
    """Linear replacement block (reference ``SpectreLinear``, layers.py:76-101).

    out = GELU(LayerNorm(Dense(x))) + pool_residual(x). The reference's
    vestigial sparsity machinery (sparsity=1, unused local_idx buffer,
    layers.py:81-84) is intentionally dropped — it was the identity.

    ``use_pallas`` routes through the fused kernel
    (ops/pallas/fused_linear.py): one VMEM-resident GEMM+LN+GELU+residual
    program instead of separate HLO ops.
    """

    features: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_features = x.shape[-1]
        w = self.param("kernel", torch_kernel_init,
                       (in_features, self.features), self.param_dtype)
        b = self.param("bias", torch_bias_init(in_features), (self.features,),
                       self.param_dtype)
        gamma = self.param("ln_scale", nn.initializers.ones, (self.features,), self.param_dtype)
        beta = self.param("ln_bias", nn.initializers.zeros, (self.features,), self.param_dtype)
        args = (x.astype(self.dtype), w.astype(self.dtype), b.astype(self.dtype),
                gamma.astype(self.dtype), beta.astype(self.dtype))
        if self.use_pallas:
            return fused_spectre_linear(*args)
        return spectre_linear_apply(*args)


class TokenMajorMixLinear(nn.Module):
    """Mix + projection in token-major [.., B] layout (ops/fused_mix.py
    ``permut_mix_fused_t``): the gather's natural B-minor output feeds a
    batched-over-tokens projection GEMM directly, skipping the [B,N,E*H]
    relayout copies of the batch-major path. Identical math and param tree
    (kernel/bias/ln_scale/ln_bias) — selected by MHPermutMix(token_major=True).
    """

    features: int
    token_dim: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, perms: jnp.ndarray,
                 signs2: jnp.ndarray) -> jnp.ndarray:
        B, N, E = x.shape
        H = perms.shape[0]
        in_features = E * H
        w = self.param("kernel", torch_kernel_init,
                       (in_features, self.features), self.param_dtype)
        b = self.param("bias", torch_bias_init(in_features), (self.features,),
                       self.param_dtype)
        gamma = self.param("ln_scale", nn.initializers.ones, (self.features,),
                           self.param_dtype)
        beta = self.param("ln_bias", nn.initializers.zeros, (self.features,),
                          self.param_dtype)
        dt = self.dtype
        xt = x.astype(dt).transpose(1, 2, 0).reshape(N * E, B)  # [d, B]
        mixedT = permut_mix_fused_t(xt, perms, signs2.astype(dt))  # [H*d, B]
        m3 = mixedT.reshape(N, in_features, B)  # identity reinterpretation
        y = jnp.einsum("neb,eo->nbo", m3, w.astype(dt))  # [N, B, O]
        o = self.features
        if in_features == o:
            pool = m3.transpose(0, 2, 1)
        elif in_features % o == 0:
            g = in_features // o
            pool = jnp.mean(m3.reshape(N, o, g, B), axis=2,
                            dtype=dt).transpose(0, 2, 1)
        else:
            from spectre_tpu.ops import adaptive_pool_matrix
            pool = jnp.einsum("neb,eo->nbo", m3,
                              adaptive_pool_matrix(in_features, o, dt))
        from spectre_tpu.ops import gelu_exact, layer_norm
        h = gelu_exact(layer_norm(y + b.astype(dt), gamma.astype(dt),
                                  beta.astype(dt))) + pool
        return h.transpose(1, 0, 2)  # [B, N, O]


class FoldedMixLinear(nn.Module):
    """Exact-semantics mix + projection with the signs and pool residual
    FOLDED into per-token weights (the round-3 fast path; mix_impl="folded").

    The reference hot path (layers.py:68-73 then 85-101) is
        mixed = (x.flat[perms] * signs).view(B, N, E*H)
        out   = GELU(LN(mixed @ W + b)) + grouped_mean(mixed)
    Everything between the gather and the GEMM is LINEAR and depends only on
    the (fixed) tables, so it reassociates onto the weights at trace time:

        Wp[n] = diag(signs_n) @ W          (per-token projection weights)
        pool  = einsum(gathered, signs/g)  (per-token grouped sign-mean)

    which leaves the activation path as: one token-major flat row gather
    (measured ~970 GiB/s — benchmarks/mix_decompose.py) + one batched GEMM.
    The two [B, H, d] sign-multiply passes (~3.3 ms/layer each at the
    flagship config) and their backward twins vanish; the backward gather is
    the per-head inverse formulation (ops/fused_mix.py::perm_rows_t — HBM
    row-buffer locality, benchmarks/bwd_gather_variants.py) and the
    projection differentiates through ops/fused_mix.py::folded_proj
    (reassociated dW — no [N, in, O] cotangent).

    Identical math, params (kernel/bias/ln_scale/ln_bias) and buffers
    (mix_tables) as the other gather impls — checkpoints interchange
    (asserted in tests/test_folded_mix.py).
    """

    features: int
    token_dim: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    route_key: str | None = None  # Clos-routed backward (ops/fused_mix.py)

    @nn.compact
    def __call__(self, x: jnp.ndarray, perms: jnp.ndarray,
                 signs2: jnp.ndarray) -> jnp.ndarray:
        B, N, E = x.shape
        H = perms.shape[0]
        in_features = E * H
        o = self.features
        w = self.param("kernel", torch_kernel_init,
                       (in_features, o), self.param_dtype)
        b = self.param("bias", torch_bias_init(in_features), (o,),
                       self.param_dtype)
        gamma = self.param("ln_scale", nn.initializers.ones, (o,),
                           self.param_dtype)
        beta = self.param("ln_bias", nn.initializers.zeros, (o,),
                          self.param_dtype)
        dt = self.dtype
        xt = x.astype(dt).transpose(1, 2, 0).reshape(N * E, B)  # [d, B]
        from spectre_tpu.ops.fused_mix import perm_rows_t_keyed

        # [H*d, B] == [N*in_features, B] stream; the backward resolves the
        # registered Clos route for this module (bitwise-equal fallback to
        # the per-head gather chain when none is registered)
        g = perm_rows_t_keyed(xt, perms, self.route_key)
        g4 = g.reshape(N, in_features, B)
        s4 = signs2.astype(dt).reshape(N, in_features)  # same stream order
        # folded-weight batched GEMM through the custom-VJP op: autodiff of
        # the naive einsum builds a [N, in, O] cotangent whose schedule
        # search is compile-time-pathological at some batches (B=256: 963 s
        # for ONE layer backward on v5e) — ops/fused_mix.py::folded_proj.
        # (Differentiating the pool TOGETHER with the projection so its
        # cotangent broadcast rides the GEMM epilogue — folded_proj_pool —
        # was tried and MEASURED SLOWER: 131.6 vs 130.5 ms flagship step;
        # XLA's default schedule already fuses the separate add well.)
        y = folded_proj(g4, w.astype(dt), s4) + b.astype(dt)
        if in_features % o == 0:
            grp = in_features // o
            # pool residual with the signs folded into the averaging weights
            pool = jnp.einsum("nuvb,nuv->nbu",
                              g4.reshape(N, o, grp, B),
                              s4.reshape(N, o, grp) / grp)
        else:
            from spectre_tpu.ops import adaptive_pool_matrix
            pm = adaptive_pool_matrix(in_features, o, dt)  # [in, O]
            pool = jnp.einsum("neb,neo->nbo", g4, s4[:, :, None] * pm[None])
        from spectre_tpu.ops import gelu_exact, layer_norm
        h = gelu_exact(layer_norm(y, gamma.astype(dt), beta.astype(dt))) + pool
        return h.transpose(1, 0, 2)  # [B, N, O]


class MHPermutMix(nn.Module):
    """Multi-head sign-flip + permutation mixing (reference layers.py:53-73).

    Flattens [B, N, E] -> [B, N*E], applies H fixed random permutations and
    sign patterns, reinterprets as [B, N, E*H], projects back with
    SpectreLinear. ``token_dim`` must equal N (the reference requires the
    sequence length at construction; SURVEY.md §5.7).

    ``impl`` (the config's ``mix_impl`` knob — all gather variants share one
    param/buffer tree and identical numerics, so checkpoints interchange):
    - "folded":          exact reference semantics, fastest schedule:
                         token-major flat row gather with the signs and pool
                         residual folded into per-token projection weights
                         (FoldedMixLinear above). Config DEFAULT — 214.5 vs
                         250.4 ms/step gather on the flagship train step
                         (repl/perf train sweep, B=1024, v5e; the bench.py
                         slope-timed equivalents are in BASELINE.md).
    - "gather":          exact reference semantics through the custom-VJP op
                         (inverse-permutation backward; the XLA autodiff
                         backward is a 20 ms/layer scatter-add). Module-level
                         default (simplest exact impl).
    - "gather_unfused":  plain XLA autodiff path (the parity baseline).
    - "gather_tm":       token-major transposed formulation
                         (TokenMajorMixLinear; measured a wash at flagship
                         scale — BASELINE.md).
    - "structured":      tile-structured random orthogonal mix (signs +
                         128-lane tile permutation + intra-tile Hadamard;
                         ops/permute.py) with the same mixing statistics,
                         MXU/DMA-native. With ``use_pallas`` it runs as the
                         scalar-prefetch Pallas kernel
                         (ops/pallas/structured_mix.py).
    """

    embed_dim: int
    token_dim: int
    num_heads: int
    out_channels: int
    impl: str = "gather"
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    use_pallas: bool = False
    fused: bool = True
    token_major: bool = False
    # mix_block > 0: sample BLOCK-structured permutations (whole mix_block-
    # element blocks move; signs stay element-wise — ops/permute.py::
    # make_block_mix_tables). Same buffer format; with
    # register_block_mix_routes the folded backward runs the full-bandwidth
    # Pallas block gather instead of 8x-tile-amplified row takes.
    mix_block: int = 0

    def _make_tables(self, d):
        blk = self.mix_block
        if blk:
            if d % blk == 0 and blk & (blk - 1) == 0:
                from spectre_tpu.ops.permute import make_block_mix_tables

                return make_block_mix_tables(self.make_rng("params"),
                                             self.num_heads, d, blk)
            # configs carry mix_block as a sampling default tuned for the
            # flagship d; shrunken geometries (tests, studies, dry runs) fall
            # back to the reference's uniform distribution — LOUDLY, so a
            # benchmark never silently measures the wrong backward
            import warnings

            warnings.warn(
                f"mix_block={blk} does not divide d={d} (or is not a power "
                "of two); sampling UNIFORM permutation tables instead — the "
                "block-DMA backward will not apply", stacklevel=2)
        return make_mix_tables(self.make_rng("params"), self.num_heads, d)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d = self.embed_dim * self.token_dim
        x = x.astype(self.dtype)
        impl = self.impl
        fused = self.fused and impl != "gather_unfused"
        token_major = self.token_major or impl == "gather_tm"
        if impl in ("gather_unfused", "gather_tm"):
            impl = "gather"

        # Trace-time schedule selection: at tiny batch the folded batched
        # GEMM's remote-XLA compile is pathological (measured fwd-only
        # compiles on v5e: B=1 265 s vs 4.5 s through the gather schedule;
        # B>=8 is normal — BASELINE.md). The gather route is the SAME
        # computation over the SAME param/buffer tree (SpectreLinear and
        # FoldedMixLinear share kernel/bias/ln_scale/ln_bias names and
        # shapes), so checkpoints and exports are unaffected; tiny batches
        # are dispatch-bound anyway, making the schedule difference moot.
        if impl == "folded" and x.shape[0] < 8:
            impl = "gather"

        if impl == "folded":
            def init_tables():
                return self._make_tables(d)

            tables = self.variable("buffers", "mix_tables", init_tables)
            perms, signs = tables.value
            signs2 = signs[0] if signs.ndim == 3 else signs
            try:  # static identity for the Clos-route registry: the scope
                route_key = "/".join(self.scope.path)  # path OWNING mix_tables
            except Exception:
                route_key = None
            return FoldedMixLinear(self.out_channels, self.token_dim,
                                   dtype=self.dtype,
                                   param_dtype=self.param_dtype,
                                   route_key=route_key,
                                   name="linear")(
                x.reshape(x.shape[0], self.token_dim, self.embed_dim),
                perms, signs2)

        if impl == "gather" and token_major:
            def init_tables():
                return self._make_tables(d)

            tables = self.variable("buffers", "mix_tables", init_tables)
            perms, signs = tables.value
            signs2 = signs[0] if signs.ndim == 3 else signs
            return TokenMajorMixLinear(self.out_channels, self.token_dim,
                                       dtype=self.dtype,
                                       param_dtype=self.param_dtype,
                                       name="linear")(
                x.reshape(x.shape[0], self.token_dim, self.embed_dim),
                perms, signs2)

        if impl == "structured":
            def init_tables():
                return make_structured_tables(self.make_rng("params"), self.num_heads, d)

            tables = self.variable("buffers", "mix_tables", init_tables)
            tile_perms, signs = tables.value
            # measured on v5e (repl/perf.py train): XLA lowers the tile-take +
            # Hadamard einsum better than the per-tile Pallas grid (4160 tiny
            # programs is launch-bound), so the model path always uses the
            # XLA formulation; structured_mix_pallas stays for direct use.
            mixed = structured_mix(x, tile_perms, signs.astype(self.dtype),
                                   self.token_dim)
        elif impl == "gather":
            def init_tables():
                return self._make_tables(d)

            tables = self.variable("buffers", "mix_tables", init_tables)
            perms, signs = tables.value
            if fused:
                # custom-VJP mix: inverse-permutation backward instead of
                # the 20 ms/layer scatter-add (ops/fused_mix.py). Identical
                # numerics and param/buffer tree; composes with either the
                # XLA or the Pallas SpectreLinear below.
                # (rematerializing mix+linear via jax.checkpoint was tried
                # and MEASURED SLOWER, 283.9 vs 258.8 ms/step — BASELINE.md)
                x2d = x.reshape(x.shape[0], -1)
                signs2 = (signs[0] if signs.ndim == 3 else signs).astype(self.dtype)
                mixed = permut_mix_fused(x2d, perms, signs2)
                mixed = mixed.reshape(x.shape[0], self.token_dim, -1)
            else:
                mixed = permut_mix(x, perms, signs.astype(self.dtype),
                                   self.token_dim)
        else:
            raise ValueError(f"unknown MHPermutMix impl {self.impl!r}")
        return SpectreLinear(self.out_channels, dtype=self.dtype,
                             param_dtype=self.param_dtype,
                             use_pallas=self.use_pallas, name="linear")(mixed)


class SignPermuteMix(nn.Module):
    """Single-permutation sign mixing (reference layers.py:26-50, shipped
    commented-out; part of the documented research surface — SURVEY.md §2
    'experimental layers'). One fixed random permutation + sign pattern over
    the flattened sequence, no multi-head expansion, identity-shaped."""

    embed_dim: int
    token_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d = self.embed_dim * self.token_dim

        def init_tables():
            return make_mix_tables(self.make_rng("params"), 1, d)

        perms, signs = self.variable("buffers", "mix_tables", init_tables).value
        B = x.shape[0]
        flat = x.astype(self.dtype).reshape(B, d)
        mixed = jnp.take(flat, perms[0], axis=1,
                         mode="clip") * signs[0, 0]
        return mixed.reshape(x.shape)


class BinaryLinear(nn.Module):
    """Sign-binarized linear with learnable scale (reference layers.py:10-23)."""

    features: int
    trainable: bool = True
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_features = x.shape[-1]
        if self.trainable:
            w = self.param("weight", nn.initializers.normal(1.0),
                           (self.features, in_features), self.param_dtype)
        else:
            w = self.variable("buffers", "weight",
                              lambda: jnp.ones((self.features, in_features),
                                               self.param_dtype)).value
        scale = self.param("scale", nn.initializers.ones, (1,), self.param_dtype)
        w_bin = jnp.sign(w.astype(self.dtype))
        return scale.astype(self.dtype) * (x.astype(self.dtype) @ w_bin.T)


class FFTApproximator(nn.Module):
    """Learned dense approximation of rfft (reference layers.py:104-121):
    a single unconstrained [D, D//2+1] projection trained against rfft targets
    (fft_approx.py study)."""

    dim: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        out_dim = self.dim // 2 + 1
        w = self.param("weight", nn.initializers.normal(1.0),
                       (out_dim, self.dim), self.param_dtype)
        return x.astype(self.dtype) @ w.astype(self.dtype).T


class LearnedSigmoid(nn.Module):
    """Sharp learned threshold gate (reference layers.py:124-133)."""

    threshold: float
    sharpness: float = 5000.0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        t = self.param("threshold", nn.initializers.constant(self.threshold), ())
        return 1.0 / (1.0 + jnp.exp((x + t) / jnp.sqrt(t**2 / self.sharpness)))


class NormalMask(nn.Module):
    """Learnable-Gaussian frequency mask (reference spectre.py:17-26)."""

    n_bins: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        mean = self.param("mean", nn.initializers.constant(self.n_bins / 2.0), ())
        std = self.param("std", nn.initializers.constant(self.n_bins / 8.0), ())
        freqs = jnp.linspace(0.0, self.n_bins - 1, self.n_bins)
        gauss = jnp.exp(-0.5 * ((freqs - mean) / (std + 1e-8)) ** 2)
        return x * gauss


class FFTLayer(nn.Module):
    """Re(rfft(x, dim=-1)) module (reference modules/spectre.py:5-14).

    Note: output last dim is n//2+1 (NOT shape-preserving); the FNet-style
    shape-preserving mixer is ``mixers.FNetMixer``.
    """

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return rfft_real(x, axis=-1)


class LearnableHadamard(nn.Module):
    """Residual Hadamard block with per-pass learnable scales
    (reference hadamar.py:115-141; the scales are active here — the reference
    left the multiply commented out)."""

    dim: int
    num_blocks: int = 2
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        pdim = next_pow2(self.dim)
        scales = [
            self.param(f"scale_{i}", nn.initializers.ones, (pdim,), self.param_dtype)
            for i in range(self.num_blocks)
        ]
        return learnable_hadamard(x, scales)
