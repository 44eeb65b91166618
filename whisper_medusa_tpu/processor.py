"""WhisperProcessor-equivalent: audio -> features, ids -> text.

Mirrors the reference's use of HF ``WhisperProcessor`` (reference:
eval_whisper_medusa.py:27-29, 46-50; README.md:104-141) without requiring
downloaded assets: feature extraction is this framework's own log-mel frontend;
tokenization wraps the HF tokenizer when its files are available locally.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Union

import numpy as np

from whisper_medusa_tpu.data.tokenizer import CharTokenizer, load_tokenizer
from whisper_medusa_tpu.ops import mel as mel_mod


class WhisperMedusaProcessor:
    def __init__(self, tokenizer=None, n_mels: int = 80, use_pallas: bool = False):
        self.tokenizer = tokenizer
        self.n_mels = n_mels
        self.use_pallas = use_pallas

    @classmethod
    def from_pretrained(cls, name_or_path: str, language: Optional[str] = None,
                        n_mels: int = 80) -> "WhisperMedusaProcessor":
        try:
            tok = load_tokenizer(name_or_path, language=language)
        except Exception:
            tok = CharTokenizer()
        return cls(tokenizer=tok, n_mels=n_mels)

    def __call__(self, audio: Union[np.ndarray, Sequence[np.ndarray]],
                 sampling_rate: int = 16000):
        """Waveform(s) at 16 kHz -> (B, n_mels, 3000) log-mel features."""
        import jax.numpy as jnp

        if sampling_rate != 16000:
            from whisper_medusa_tpu.data.dataset import resample

            if isinstance(audio, np.ndarray) and audio.ndim == 1:
                audio = resample(audio, sampling_rate)
            else:
                audio = [resample(a, sampling_rate) for a in audio]
        if isinstance(audio, np.ndarray) and audio.ndim == 1:
            audio = [audio]
        batch = np.stack([mel_mod.pad_or_trim(np.asarray(a))[0] for a in audio])
        if self.use_pallas:
            from whisper_medusa_tpu.ops.mel_pallas import log_mel_spectrogram_pallas

            return log_mel_spectrogram_pallas(jnp.asarray(batch), n_mels=self.n_mels)
        return mel_mod.log_mel_spectrogram(jnp.asarray(batch), n_mels=self.n_mels)

    def decode(self, ids, skip_special_tokens: bool = True) -> str:
        return self.tokenizer.decode(np.asarray(ids).tolist(),
                                     skip_special_tokens=skip_special_tokens)

    def batch_decode(self, ids_batch, skip_special_tokens: bool = True) -> List[str]:
        return [self.decode(ids, skip_special_tokens) for ids in ids_batch]
