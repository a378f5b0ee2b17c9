from spectre_tpu.export.stablehlo import (
    export_forward,
    load_exported,
    save_exported,
    verify_export,
)
from spectre_tpu.export.weights import load_weights_bin, save_weights_bin

__all__ = [
    "export_forward", "save_exported", "load_exported", "verify_export",
    "save_weights_bin", "load_weights_bin",
]
