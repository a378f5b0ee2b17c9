from spectre_tpu.distill.teacher import (
    DinoClassifier,
    DinoVisionTransformer,
    import_torch_state_dict,
    load_teacher,
)

__all__ = [
    "DinoVisionTransformer",
    "DinoClassifier",
    "import_torch_state_dict",
    "load_teacher",
]
