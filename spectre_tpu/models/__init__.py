from spectre_tpu.models.layers import (
    BinaryLinear,
    FFTApproximator,
    FFTLayer,
    LearnableHadamard,
    LearnedSigmoid,
    MHPermutMix,
    NormalMask,
    SignPermuteMix,
    SpectreLinear,
)
from spectre_tpu.models.mixers import (
    MIXERS,
    AttentionMixer,
    DWTMixer,
    FNetMixer,
    MHFFTMixer,
    make_mixer,
)
from spectre_tpu.models.patch_embed import PatchEmbedding, SpectralPatchEmbed
from spectre_tpu.models.registry import build_model, example_input
from spectre_tpu.models.spectre import SpectreEncoder, SpectreEncoderLayer, SpectreViT
from spectre_tpu.models.spectre_branch import (
    SpectreBranch,
    SpectreBranchEncoder,
    SpectreBranchEncoderLayer,
    SpectreFeatExtractor,
)
from spectre_tpu.models.torch_import import (
    import_spectre_branch,
    import_spectre_vit,
    import_vit,
)
from spectre_tpu.models.vit import TransformerEncoderLayer, ViT

__all__ = [
    "import_spectre_branch", "import_spectre_vit", "import_vit",
    "BinaryLinear", "FFTApproximator", "FFTLayer", "LearnableHadamard",
    "LearnedSigmoid", "MHPermutMix", "NormalMask", "SignPermuteMix", "SpectreLinear",
    "MIXERS", "AttentionMixer", "DWTMixer", "FNetMixer", "MHFFTMixer", "make_mixer",
    "PatchEmbedding", "SpectralPatchEmbed",
    "build_model", "example_input",
    "SpectreEncoder", "SpectreEncoderLayer", "SpectreViT",
    "SpectreBranch", "SpectreBranchEncoder", "SpectreBranchEncoderLayer",
    "SpectreFeatExtractor",
    "TransformerEncoderLayer", "ViT",
]
