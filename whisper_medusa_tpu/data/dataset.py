"""CSV-driven ASR dataset + collator (host-side IO, device-side features).

Mirrors the reference data pipeline (reference: whisper_medusa/dataset/
dataset.py:15-161): a CSV with ``audio``, ``sentence``, ``language`` columns; each
item is loaded, resampled to 16 kHz, featurized to log-mel, and tokenized with a
per-sample language prefix; the collator pads features and labels, masks label
padding with -100, and strips the leading start token.

TPU-native differences: audio decode/resample stay on host (stdlib ``wave`` +
polyphase resampling — torchaudio's libsox role), while log-mel runs through this
framework's own frontend; label padding goes to a *fixed* ``max_label_length`` so
every training step has static shapes (XLA recompiles on shape changes).
"""

from __future__ import annotations

import dataclasses
import wave
from typing import Dict, List, Sequence

import numpy as np

from whisper_medusa_tpu.config import (
    EOS_TOKEN_ID,
    NO_TIMESTAMPS_ID,
    TASK_TRANSCRIBE_ID,
    language_token_id,
)
from whisper_medusa_tpu.ops import mel as mel_mod

IGNORE_INDEX = -100


def load_audio(path: str) -> tuple[np.ndarray, int]:
    """Read a WAV or FLAC file to float32 mono (format sniffed by magic bytes).

    Uses the native C++ decoder (data/native.py -> native/audio_io.cpp) when the
    toolchain is available — the role torchaudio's libsox plays for the reference
    (dataset.py:67; LibriSpeech ships .flac) — with pure-Python fallbacks."""
    from whisper_medusa_tpu.data import native

    if native.available():
        try:
            return native.load_audio(path)
        except Exception:
            pass
    with open(path, "rb") as f:
        magic = f.read(4)
    if magic == b"fLaC":
        from whisper_medusa_tpu.data import flac_py

        with open(path, "rb") as f:
            return flac_py.decode_flac(f.read())
    return _load_wav_py(path)


def load_wav(path: str) -> tuple[np.ndarray, int]:
    """Back-compat alias for :func:`load_audio`."""
    return load_audio(path)


def _load_wav_py(path: str) -> tuple[np.ndarray, int]:
    """Stdlib WAV decode fallback."""
    with wave.open(path, "rb") as w:
        sr = w.getframerate()
        n = w.getnframes()
        ch = w.getnchannels()
        width = w.getsampwidth()
        raw = w.readframes(n)
    if width == 2:
        x = np.frombuffer(raw, np.int16).astype(np.float32) / 32768.0
    elif width == 4:
        x = np.frombuffer(raw, np.int32).astype(np.float32) / 2147483648.0
    elif width == 1:
        x = (np.frombuffer(raw, np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported WAV sample width {width} in {path}")
    if ch > 1:
        x = x.reshape(-1, ch).mean(axis=1)
    return x, sr


def resample(audio: np.ndarray, sr: int, target_sr: int = 16000) -> np.ndarray:
    """Polyphase resampling (scipy) — replaces torchaudio.functional.resample
    (reference: dataset.py:67-69)."""
    if sr == target_sr:
        return audio.astype(np.float32)
    from math import gcd

    from scipy.signal import resample_poly

    g = gcd(target_sr, sr)
    return resample_poly(audio, target_sr // g, sr // g).astype(np.float32)


def build_label_ids(
    sentence: str,
    language: str,
    tokenizer,
    task_id: int = TASK_TRANSCRIBE_ID,
) -> List[int]:
    """Tokenize with the Whisper special prefix, minus the leading <|sot|>.

    Matches the reference collator behavior of stripping the decoder-start token
    from the labels (reference: dataset.py:117-122): labels begin at the language
    token and end with <|eos|>.
    """
    text_ids = tokenizer.encode(sentence, add_special_tokens=False)
    return [language_token_id(language), task_id, NO_TIMESTAMPS_ID, *text_ids,
            EOS_TOKEN_ID]


@dataclasses.dataclass
class ASRExample:
    audio_path: str
    sentence: str
    language: str


class ASRDataSet:
    """CSV-backed dataset (reference: dataset.py:15-104)."""

    def __init__(self, csv_path: str, tokenizer, language_fallback: str = "en"):
        import pandas as pd

        df = pd.read_csv(csv_path).fillna("")
        self.examples = [
            ASRExample(r["audio"], str(r["sentence"]),
                       str(r.get("language") or language_fallback))
            for r in df.to_dict("records")
        ]
        self.tokenizer = tokenizer

    def __len__(self):
        return len(self.examples)

    def __getitem__(self, idx: int) -> Dict:
        ex = self.examples[idx]
        audio, sr = load_audio(ex.audio_path)
        audio = resample(audio, sr)
        return {
            "audio": mel_mod.pad_or_trim(audio)[0],
            "labels": build_label_ids(ex.sentence, ex.language, self.tokenizer),
        }


@dataclasses.dataclass
class SpeechCollator:
    """Batch features + fixed-length label padding (reference: dataset.py:106-134).

    Returns numpy arrays: ``input_features`` (B, n_mels, 3000) and ``labels``
    (B, max_label_length) with -100 padding.
    """

    max_label_length: int = 224
    n_mels: int = 80

    def __call__(self, items: Sequence[Dict]) -> Dict[str, np.ndarray]:
        import jax.numpy as jnp

        audio = np.stack([it["audio"] for it in items])
        feats = np.asarray(mel_mod.log_mel_spectrogram(
            jnp.asarray(audio), n_mels=self.n_mels))
        labels = np.full((len(items), self.max_label_length), IGNORE_INDEX,
                         np.int32)
        for i, it in enumerate(items):
            ids = it["labels"][: self.max_label_length]
            labels[i, : len(ids)] = ids
        return {"input_features": feats, "labels": labels}


def get_dataset(csv_path: str, tokenizer) -> ASRDataSet:
    """Reference: dataset.py:137-161 builds train/val/test ASRDataSet triples;
    call this per split."""
    return ASRDataSet(csv_path, tokenizer)


def batches(dataset: ASRDataSet, collator: SpeechCollator, batch_size: int,
            shuffle: bool = True, seed: int = 0, drop_last: bool = True):
    """Minimal epoch iterator (static batch size for XLA)."""
    idx = np.arange(len(dataset))
    rng = np.random.default_rng(seed)
    while True:
        if shuffle:
            rng.shuffle(idx)
        for lo in range(0, len(idx) - (batch_size - 1 if drop_last else 0),
                        batch_size):
            chunk = idx[lo: lo + batch_size]
            if drop_last and len(chunk) < batch_size:
                continue
            yield collator([dataset[int(i)] for i in chunk])
