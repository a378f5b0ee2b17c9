"""Spectral op library (L1 of SURVEY.md §1).

jnp reference implementations live in the flat modules; Pallas TPU kernels in
``spectre_tpu.ops.pallas`` expose the same signatures and are selected by the
models via config (``use_pallas``). Every kernel is gated by a
kernel-vs-reference parity test in tests/.
"""

from spectre_tpu.ops.dwt import (
    haar_dwt1d,
    haar_dwt2d,
    haar_dwt2d_multilevel,
    haar_dwt_mix,
    haar_idwt1d,
    haar_idwt2d,
)
from spectre_tpu.ops.fft import (
    dft_matrices,
    extract_patches,
    fft2_real,
    fft2_real_matmul,
    flatten_patches_cjk,
    log_magnitude_rfft2,
    patch_rfft2_real,
    rfft2_real_matrix,
    rfft_real,
    spectral_patch_matrix,
)
from spectre_tpu.ops.hadamard import (
    fwht,
    fwht_interleaved,
    hadamard_transform,
    learnable_hadamard,
    next_pow2,
)
from spectre_tpu.ops.fused_mix import (folded_proj, folded_proj_pool, perm_rows_t, permut_mix_fused,
                                        permut_mix_fused_t)
from spectre_tpu.ops.linear import (
    adaptive_avg_pool1d,
    adaptive_pool_matrix,
    gelu_exact,
    layer_norm,
    spectre_linear_apply,
)
from spectre_tpu.ops.permute import (
    hadamard_matrix,
    invert_permutation,
    detect_block_size,
    make_block_mix_tables,
    make_mix_tables,
    make_structured_tables,
    permut_mix,
    pick_tile,
    structured_mix,
)

__all__ = [
    "haar_dwt1d", "haar_dwt2d", "haar_dwt2d_multilevel", "haar_dwt_mix",
    "haar_idwt1d", "haar_idwt2d",
    "dft_matrices", "extract_patches", "fft2_real", "fft2_real_matmul",
    "flatten_patches_cjk", "log_magnitude_rfft2",
    "patch_rfft2_real", "rfft2_real_matrix", "rfft_real", "spectral_patch_matrix",
    "fwht", "fwht_interleaved", "hadamard_transform", "learnable_hadamard", "next_pow2",
    "adaptive_avg_pool1d", "adaptive_pool_matrix", "gelu_exact", "layer_norm",
    "folded_proj", "folded_proj_pool", "perm_rows_t", "permut_mix_fused", "permut_mix_fused_t",
    "spectre_linear_apply",
    "invert_permutation", "make_mix_tables", "make_block_mix_tables",
    "detect_block_size", "permut_mix",
    "hadamard_matrix", "make_structured_tables", "pick_tile", "structured_mix",
]
