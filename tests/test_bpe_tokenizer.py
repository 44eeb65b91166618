"""First-party byte-level BPE tokenizer tests.

Parity is pinned against ``transformers.WhisperTokenizer`` instantiated from
the SAME vocab/merges files (constructed offline by a tiny BPE trainer below —
the real Whisper vocab is not fetchable in this environment, but the machinery
is identical at any vocab size).  The reference depends on the HF tokenizer at
runtime (reference: whisper_medusa/trainer.py:21-23, eval_whisper_medusa.py:
27-29); this framework's product path must not.
"""

import collections
import json
import os

import pytest
import regex

from whisper_medusa_tpu.config import SpecialTokens
from whisper_medusa_tpu.data.bpe import (
    WhisperBPETokenizer, bytes_to_unicode, _PAT)

CORPUS = (
    "The quick brown fox jumps over the lazy dog. "
    "Speech recognition converts audio into text, and speculative decoding "
    "makes it faster.  Whisper was trained on 680,000 hours of audio!\n"
    "I'm sure we'll see it's working — l'état, c'est moi; naïve café über "
    "alles.  Prices rose 12.5% in 2023, from $3.99 to $4.49.\n"
    "日本語のテキストもバイト単位で扱える。 Привет, мир! 🤖🎙️\n"
)

TEST_STRINGS = [
    "Hello, world!",
    "  leading and trailing spaces  ",
    "I'm sure we'll manage; it's fine (really).",
    "Numbers 1234567890 and 12.5% mixed with text.",
    "naïve café — em-dash and accents",
    "日本語 mixed with English and 🤖 emoji",
    "tabs\tand\nnewlines\r\n",
    "",
    "a",
    "ALL CAPS SHOUTING WITH PUNCTUATION!!!",
]


def _train_bpe(corpus: str, n_merges: int = 150):
    """Tiny byte-level BPE trainer: greedy most-frequent-pair merges over the
    pre-tokenized corpus — the same construction (at toy scale) that produced
    the real Whisper vocab."""
    byte_enc = bytes_to_unicode()
    words = collections.Counter()
    for tok in regex.findall(_PAT, corpus):
        sym = tuple(byte_enc[b] for b in tok.encode("utf-8"))
        words[sym] += 1
    merges = []
    for _ in range(n_merges):
        pairs = collections.Counter()
        for word, cnt in words.items():
            for i in range(len(word) - 1):
                pairs[(word[i], word[i + 1])] += cnt
        if not pairs:
            break
        (a, b), cnt = pairs.most_common(1)[0]
        if cnt < 2:
            break
        merges.append((a, b))
        new_words = collections.Counter()
        for word, c in words.items():
            out, i = [], 0
            while i < len(word):
                if i < len(word) - 1 and word[i] == a and word[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            new_words[tuple(out)] += c
        words = new_words
    vocab = {c: i for i, c in enumerate(byte_enc.values())}
    for (a, b) in merges:
        vocab[a + b] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    return vocab, merges


@pytest.fixture(scope="module")
def bpe_dir(tmp_path_factory):
    path = tmp_path_factory.mktemp("bpe_assets")
    vocab, merges = _train_bpe(CORPUS)
    with open(os.path.join(path, "vocab.json"), "w", encoding="utf-8") as f:
        json.dump(vocab, f, ensure_ascii=False)
    with open(os.path.join(path, "merges.txt"), "w", encoding="utf-8") as f:
        f.write("#version: 0.2\n")
        for a, b in merges:
            f.write(f"{a} {b}\n")
    return str(path)


@pytest.fixture(scope="module")
def ours(bpe_dir):
    return WhisperBPETokenizer.from_pretrained(bpe_dir)


@pytest.fixture(scope="module")
def hf(bpe_dir):
    from transformers import WhisperTokenizer

    return WhisperTokenizer(os.path.join(bpe_dir, "vocab.json"),
                            os.path.join(bpe_dir, "merges.txt"))


def test_encode_parity_vs_hf(ours, hf):
    for s in TEST_STRINGS + [CORPUS]:
        assert ours.encode(s) == hf.encode(s, add_special_tokens=False), s


def test_decode_parity_vs_hf(ours, hf):
    for s in TEST_STRINGS + [CORPUS]:
        ids = hf.encode(s, add_special_tokens=False)
        assert ours.decode(ids) == hf.decode(ids, skip_special_tokens=True), s


def test_roundtrip(ours):
    for s in TEST_STRINGS + [CORPUS]:
        assert ours.decode(ours.encode(s)) == s


def test_byte_fallback_covers_unseen_unicode(ours):
    s = "Ωμέγα ᚱᚢᚾᛖᛋ 한국어 \x00\x07 byte soup"
    assert ours.decode(ours.encode(s)) == s


def test_special_token_rendering(bpe_dir):
    tok = WhisperBPETokenizer.from_pretrained(bpe_dir)
    st = tok.special
    # <|endoftext|> sits in vocab.json; its true id wins over the v2 constant.
    with open(os.path.join(bpe_dir, "vocab.json")) as f:
        assert st.eos == json.load(f)["<|endoftext|>"]
    text_ids = tok.encode("hello")
    ids = [st.sot, st.first_language, st.transcribe, st.no_timestamps,
           *text_ids, st.eos]
    full = tok.decode(ids, skip_special_tokens=False)
    assert full.startswith(
        "<|startoftranscript|><|en|><|transcribe|><|notimestamps|>")
    assert full.endswith("<|endoftext|>")
    assert tok.decode(ids, skip_special_tokens=True) == "hello"


def test_timestamp_rendering(ours):
    st = ours.special
    ids = [st.timestamp_begin, *ours.encode(" hi"), st.timestamp_begin + 25]
    assert ours.decode(ids, skip_special_tokens=True) == " hi"
    with_ts = ours.decode(ids, skip_special_tokens=True,
                          decode_with_timestamps=True)
    assert with_ts == "<|0.00|> hi<|0.50|>"


def test_encode_splits_on_special_strings(ours):
    st = ours.special
    ids = ours.encode("<|startoftranscript|><|en|> hello")
    assert ids[:2] == [st.sot, st.first_language]
    assert ids[2:] == ours.encode(" hello")


def test_load_tokenizer_prefers_first_party(bpe_dir):
    from whisper_medusa_tpu.data.tokenizer import load_tokenizer

    tok = load_tokenizer(bpe_dir)
    assert isinstance(tok, WhisperBPETokenizer)


def test_save_pretrained_roundtrip(ours, tmp_path):
    out = str(tmp_path / "resaved")
    ours.save_pretrained(out)
    re = WhisperBPETokenizer.from_pretrained(out)
    for s in TEST_STRINGS:
        assert re.encode(s) == ours.encode(s)


def test_v3_layout_from_added_tokens(bpe_dir, tmp_path):
    """added_tokens.json naming <|yue|> (large-v3) shifts every id after the
    language block by one; the derived layout must follow the file, not the
    v2 constants."""
    import shutil

    from whisper_medusa_tpu.config import SpecialTokens

    d = str(tmp_path / "v3")
    os.makedirs(d)
    shutil.copy(os.path.join(bpe_dir, "vocab.json"), d)
    shutil.copy(os.path.join(bpe_dir, "merges.txt"), d)
    langs = SpecialTokens(num_languages=100).languages
    added = {"<|startoftranscript|>": 50258}
    for i, lang in enumerate(langs):
        added[f"<|{lang}|>"] = 50259 + i
    base = 50259 + 100
    for name, off in (("<|translate|>", 0), ("<|transcribe|>", 1),
                      ("<|startoflm|>", 2), ("<|startofprev|>", 3),
                      ("<|nospeech|>", 4), ("<|notimestamps|>", 5)):
        added[name] = base + off
    with open(os.path.join(d, "added_tokens.json"), "w") as f:
        json.dump(added, f)
    tok = WhisperBPETokenizer.from_pretrained(d)
    st = tok.special
    assert st.num_languages == 100
    assert st.transcribe == 50360 and st.no_timestamps == 50364
    assert st.timestamp_begin == 50365
    assert tok.special_id_to_str[50259 + 99] == "<|yue|>"
    assert tok.decode([50365], skip_special_tokens=True,
                      decode_with_timestamps=True) == "<|0.00|>"
