"""whisper_medusa_tpu — TPU-native Whisper-Medusa speculative decoding framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of aiola-lab/whisper-medusa
(speculative multi-head decoding for Whisper ASR), designed for TPU: static shapes,
on-device decode loops, fused kernels, and mesh parallelism.
"""

__version__ = "0.1.0"

from whisper_medusa_tpu.config import (  # noqa: F401
    GenerationConfig,
    MedusaConfig,
    ModelConfig,
    WhisperDims,
    language_token_id,
    tiny_test_config,
)


def __getattr__(name):
    # Lazy heavyweight exports (avoid importing jax-compiled modules on package
    # import): WhisperMedusaModel and WhisperMedusaProcessor.
    if name == "WhisperMedusaModel":
        from whisper_medusa_tpu.models.api import WhisperMedusaModel

        return WhisperMedusaModel
    if name == "WhisperMedusaProcessor":
        from whisper_medusa_tpu.processor import WhisperMedusaProcessor

        return WhisperMedusaProcessor
    raise AttributeError(name)
