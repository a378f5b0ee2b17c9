"""spectre_tpu — TPU-native spectral vision-transformer framework.

A ground-up JAX/Flax/Pallas rebuild of the capability surface of the
PyTorch research repo ``Biblbrox/ViT-Spectre-Experiments`` (reference layout
documented in SURVEY.md): lightweight ViT variants whose self-attention is
replaced by cheap spectral / pseudo-spectral token mixing (FFT, Haar DWT,
Walsh-Hadamard, random sign-flip + permutation), trained on image
classification with optional DINOv3 distillation.

Layering (bottom-up, mirrors SURVEY.md §1):

- ``spectre_tpu.ops``       spectral op library: jnp reference impls + Pallas TPU kernels
- ``spectre_tpu.models``    Flax linen model zoo (ViT / SpectreViT / SpectreBranch)
- ``spectre_tpu.configs``   python-module config system (``parse_config``)
- ``spectre_tpu.data``      datasets + device-side augmentation + prefetch pipeline
- ``spectre_tpu.parallel``  jax.sharding Mesh helpers, data-parallel pjit plumbing
- ``spectre_tpu.train``     train state / steps / loops, optax + orbax
- ``spectre_tpu.distill``   teacher models + KD losses
- ``spectre_tpu.profile``   jax.profiler harnesses + chainable trace report API
- ``spectre_tpu.export``    StableHLO export + parity checking
- ``spectre_tpu.repl``      experiment entry-point scripts (the reference's repl/ surface)
"""

__version__ = "0.1.0"

# Persistent XLA compilation cache, on by default: cold compiles through a
# remote-compile TPU runtime take minutes, and every python process starts
# cold without it. Opt out with SPECTRE_NO_COMPILE_CACHE=1.
try:  # pragma: no cover - trivial plumbing
    from spectre_tpu.utils.cache import enable_compilation_cache as _ecc

    _ecc()
    del _ecc
except Exception:  # never block import on cache setup
    pass
