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
