"""Tokenizer access — HF Whisper tokenizer when local files exist, else a
character-level stand-in for tests/smoke runs.

The reference uses ``WhisperProcessor.from_pretrained`` (reference: trainer.py:21-23,
eval_whisper_medusa.py:27-29), which needs downloaded vocab files; this environment
has no network, so loading is gated and tests use :class:`CharTokenizer`.
"""

from __future__ import annotations

from typing import List, Optional, Sequence


def load_tokenizer(name_or_path: str, language: Optional[str] = None,
                   task: str = "transcribe"):
    """Load the HF Whisper tokenizer from a local path/cache (no network)."""
    from transformers import WhisperTokenizer

    return WhisperTokenizer.from_pretrained(
        name_or_path, language=language, task=task, local_files_only=True)


class CharTokenizer:
    """Deterministic char-level tokenizer over printable ASCII, mapped clear of the
    Whisper special-token id range.  decode(encode(s)) == s."""

    def __init__(self, offset: int = 100):
        self.offset = offset

    def encode(self, text: str, add_special_tokens: bool = False) -> List[int]:
        return [self.offset + (ord(c) - 32) for c in text if 32 <= ord(c) < 127]

    def decode(self, ids: Sequence[int], skip_special_tokens: bool = True) -> str:
        out = []
        for i in ids:
            i = int(i)
            if self.offset <= i < self.offset + 95:
                out.append(chr(32 + (i - self.offset)))
        return "".join(out)

    def batch_decode(self, batch, skip_special_tokens: bool = True) -> List[str]:
        return [self.decode(ids, skip_special_tokens) for ids in batch]
