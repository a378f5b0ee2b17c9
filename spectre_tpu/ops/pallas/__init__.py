"""Pallas TPU kernels for the hot ops (SURVEY.md §7 step 6).

Each kernel exposes the same signature as its jnp reference in
``spectre_tpu.ops`` and is gated by a kernel-vs-reference parity test
(tests/test_pallas.py, interpret mode on CPU; compiled on TPU). Models select
kernels via the ``use_pallas`` config knob.
"""

from spectre_tpu.ops.pallas.attention import flash_attention
from spectre_tpu.ops.pallas.common import use_interpret
from spectre_tpu.ops.pallas.fused_linear import fused_spectre_linear
from spectre_tpu.ops.pallas.fwht import fwht_pallas
from spectre_tpu.ops.pallas.structured_mix import (pallas_path_taken,
                                                   structured_mix_pallas)

__all__ = [
    "use_interpret",
    "fused_spectre_linear",
    "fwht_pallas",
    "pallas_path_taken",
    "structured_mix_pallas",
    "flash_attention",
]
