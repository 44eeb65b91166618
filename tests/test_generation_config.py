"""Checkpoint generation-config ingestion, vocabulary-derived special tokens,
HF-exact compression ratio, and sampled temperature fallback.

Covers the reference's load-time generation-config plumbing
(reference: whisper_medusa/models/model.py:279-290 ``update_generation_config``,
1177-1186 processor-id retrieval, 1878-1886 do_sample at fallback temperatures,
1961-1969 HF ``_need_fallback`` delegation)."""

import json
import os

import numpy as np
import pytest

from whisper_medusa_tpu.config import (
    GenerationConfig,
    SpecialTokens,
    default_begin_suppress_tokens,
    default_suppress_tokens,
    tiny_test_config,
)
from whisper_medusa_tpu.models.api import (
    WhisperMedusaModel,
    _compression_ratio,
    _needs_fallback,
)


# ----------------------------------------------------------- special tokens

def test_special_tokens_v2_layout():
    st = SpecialTokens.for_vocab(51865)
    assert (st.translate, st.transcribe, st.start_of_lm, st.start_of_prev,
            st.no_speech, st.no_timestamps, st.timestamp_begin) == (
        50358, 50359, 50360, 50361, 50362, 50363, 50364)
    assert st.num_languages == 99


def test_special_tokens_v3_layout():
    """large-v3 adds <|yue|> to the language block, shifting later ids by one."""
    st = SpecialTokens.for_vocab(51866)
    assert st.num_languages == 100
    assert st.languages[-1] == "yue"
    assert st.language_token_id("yue") == 50259 + 99
    assert (st.translate, st.transcribe, st.no_speech, st.no_timestamps,
            st.timestamp_begin) == (50359, 50360, 50363, 50364, 50365)


def test_default_suppress_tokens_tracks_layout():
    v2 = SpecialTokens.for_vocab(51865)
    v3 = SpecialTokens.for_vocab(51866)
    from whisper_medusa_tpu.config import DEFAULT_SUPPRESS_TOKENS
    assert default_suppress_tokens(v2) == DEFAULT_SUPPRESS_TOKENS
    s3 = default_suppress_tokens(v3)
    text = tuple(t for t in DEFAULT_SUPPRESS_TOKENS if t < 50258)
    # v3 tail: sot unchanged, every other special id shifted by one vs v2.
    assert s3 == text + (50258, 50359, 50360, 50361, 50362, 50363)
    assert default_begin_suppress_tokens(v3) == (220, 50257)


def test_v3_model_uses_shifted_ids():
    """A v3-vocab model builds its prompt with the shifted task/notimestamps ids."""
    cfg = tiny_test_config(vocab_size=51866, medusa_num_heads=2)
    model = WhisperMedusaModel.from_random(cfg, seed=3)
    rng = np.random.default_rng(0)
    f = rng.normal(size=(1, cfg.dims.num_mel_bins,
                         cfg.dims.num_frames)).astype(np.float32)
    out = model.generate(f, language="en", max_length=12)
    assert out.sequences[0, 0] == 50258          # sot unchanged
    assert out.sequences[0, 2] == 50360          # transcribe shifted (+1 vs v2)
    assert out.sequences[0, 3] == 50364          # notimestamps shifted


# ------------------------------------------------ generation-config ingestion

def test_hf_generation_config_ingested(tmp_path):
    """An HF-style generation_config.json in the checkpoint overrides the baked
    defaults (reference: model.py:279-290, 1177-1186)."""
    cfg = tiny_test_config(vocab_size=51865, medusa_num_heads=2)
    model = WhisperMedusaModel.from_random(cfg, seed=0)
    path = str(tmp_path / "ckpt")
    model.save_pretrained(path)
    hf_gen = {
        "eos_token_id": 50257,
        "pad_token_id": 50257,
        "decoder_start_token_id": 50258,
        "suppress_tokens": [5, 6, 7],
        "begin_suppress_tokens": [220, 50257],
        "no_timestamps_token_id": 50363,
        "prev_sot_token_id": 50361,
        "max_initial_timestamp_index": 37,
        "lang_to_id": {"<|en|>": 50259, "<|zh|>": 50260},
        "task_to_id": {"transcribe": 50359, "translate": 50358},
        "posterior_threshold": 0.22,
        "posterior_alpha": 0.11,
        "max_length": 40,
    }
    with open(os.path.join(path, "generation_config.json"), "w") as f:
        json.dump(hf_gen, f)
    loaded = WhisperMedusaModel.from_pretrained(path)
    g = loaded.generation_config
    assert g.suppress_tokens == (5, 6, 7)
    assert g.begin_suppress_tokens == (220, 50257)
    assert g.max_initial_timestamp_index == 37
    assert g.posterior_threshold == pytest.approx(0.22)
    assert g.posterior_alpha == pytest.approx(0.11)
    assert g.max_length == 40
    st = loaded.special
    assert st.no_timestamps == 50363 and st.timestamp_begin == 50364
    assert st.start_of_prev == 50361 and st.num_languages == 2

    # The decode actually consumes the ingested list: token 5/6/7 never appear
    # even though the tiny random model would otherwise emit small ids often.
    rng = np.random.default_rng(1)
    feats = rng.normal(size=(2, cfg.dims.num_mel_bins,
                             cfg.dims.num_frames)).astype(np.float32)
    out = loaded.generate(feats, language="en", max_length=24)
    gen_part = [out.sequences[i, 4:out.lengths[i]] for i in range(2)]
    for seq in gen_part:
        assert not np.isin(seq, [5, 6, 7]).any()


def test_generation_config_round_trip(tmp_path):
    cfg = tiny_test_config(vocab_size=51866, medusa_num_heads=2)
    gen = GenerationConfig(max_length=33, suppress_tokens=(9, 10),
                           begin_suppress_tokens=(220,),
                           posterior_threshold=0.5,
                           max_initial_timestamp_index=12)
    model = WhisperMedusaModel.from_random(cfg, seed=0)
    model.generation_config = gen
    path = str(tmp_path / "ckpt")
    model.save_pretrained(path)
    loaded = WhisperMedusaModel.from_pretrained(path)
    assert loaded.generation_config == gen
    assert loaded.special == cfg.dims.special


# ------------------------------------------------------- compression ratio

def test_compression_ratio_matches_hf():
    """Byte-exact parity with transformers' _retrieve_compression_ratio
    (the reference's fallback criterion, model.py:1961-1969)."""
    import torch
    from transformers.models.whisper.generation_whisper import (
        WhisperGenerationMixin,
    )

    rng = np.random.default_rng(0)
    cases = [
        rng.integers(0, 51865, size=60),
        np.full((50,), 123),                       # degenerate repetition
        np.tile(np.arange(17), 5),
        rng.integers(0, 51866, size=3),
    ]
    for vocab in (51865, 51866):
        for toks in cases:
            ours = _compression_ratio(toks, vocab)
            theirs = WhisperGenerationMixin._retrieve_compression_ratio(
                torch.as_tensor(toks), vocab)
            assert ours == pytest.approx(float(theirs), rel=1e-9), (vocab, toks[:5])


def test_needs_fallback_repetition_detected():
    """A degenerate repetition loop compresses far better than 2.4x; normal text
    doesn't (the int32-byte bug inflated every ratio ~2x — ADVICE round 1)."""
    rep = np.tile(np.array([[0, 0, 0, 7, 7]]), (1, 20)).astype(np.int32)
    lengths = np.array([rep.shape[1]])
    assert _needs_fallback(rep, lengths, 0, 2.4, vocab_size=51865)[0]
    rng = np.random.default_rng(0)
    normal = rng.integers(0, 51865, size=(1, 100)).astype(np.int32)
    assert not _needs_fallback(normal, np.array([100]), 0, 2.4,
                               vocab_size=51865)[0]


# ------------------------------------------------------- sampled fallback

@pytest.fixture(scope="module")
def tiny_model():
    cfg = tiny_test_config(vocab_size=51865, medusa_num_heads=3)
    return WhisperMedusaModel.from_random(cfg, seed=0)


def _feats(cfg, b=2, seed=0):
    rng = np.random.default_rng(seed)
    return rng.normal(
        size=(b, cfg.dims.num_mel_bins, cfg.dims.num_frames)).astype(np.float32)


def test_sampled_retries_differ(tiny_model):
    """temp>0 retries are true multinomial samples: different seeds produce
    different sequences, same seed reproduces (reference sets do_sample=True at
    fallback temps, model.py:1878-1886 — without sampling a retry can't escape
    the failure that triggered it)."""
    f = _feats(tiny_model.config, seed=5)
    a = tiny_model.generate(f, language="en", max_length=32, temperature=0.9,
                            seed=0)
    b = tiny_model.generate(f, language="en", max_length=32, temperature=0.9,
                            seed=1)
    c = tiny_model.generate(f, language="en", max_length=32, temperature=0.9,
                            seed=0)
    np.testing.assert_array_equal(a.sequences, c.sequences)  # deterministic
    assert not np.array_equal(a.sequences, b.sequences)      # stochastic

    # temp==0 ignores the seed entirely.
    g0 = tiny_model.generate(f, language="en", max_length=32, seed=0)
    g1 = tiny_model.generate(f, language="en", max_length=32, seed=99)
    np.testing.assert_array_equal(g0.sequences, g1.sequences)


def test_ladder_steps_use_distinct_randomness(tiny_model):
    """Each rung of the temperature ladder folds the ladder index into the key, so
    a retry at the same temperature explores a different sample path."""
    f = _feats(tiny_model.config, b=1, seed=9)
    one = tiny_model.generate(f, language="en", max_length=32,
                              temperature=(0.7,), seed=0)
    # Force every rung to run: impossible compression threshold.
    two = tiny_model.generate(f, language="en", max_length=32,
                              temperature=(0.7, 0.7), seed=0,
                              compression_ratio_threshold=1e-9)
    assert not np.array_equal(one.sequences, two.sequences)


# ---------------------------------------------------------- beam kwarg guard

def test_beam_rejects_fallback_kwargs(tiny_model):
    f = _feats(tiny_model.config, seed=11)
    with pytest.raises(ValueError, match="logprob_threshold"):
        tiny_model.generate(f, language="en", num_beams=2,
                            logprob_threshold=-1.0)
    with pytest.raises(ValueError, match="temperature fallback"):
        tiny_model.generate(f, language="en", num_beams=2,
                            temperature=(0.0, 0.2))


def test_beam_honors_length_penalty_and_prompt(tiny_model):
    """exponential_decay_length_penalty + prompt_ids are plumbed into beams
    instead of silently ignored (ADVICE round 1)."""
    f = _feats(tiny_model.config, b=1, seed=13)
    plain = tiny_model.generate(f, language="en", num_beams=2, max_length=32)
    decayed = tiny_model.generate(
        f, language="en", num_beams=2, max_length=32,
        exponential_decay_length_penalty=(1, 4.0))
    assert decayed.lengths[0] <= plain.lengths[0]
    prompted = tiny_model.generate(f, language="en", num_beams=2, max_length=32,
                                   prompt_ids=[50361, 42, 43])
    assert prompted.sequences[0, 0] == 50361
    assert prompted.sequences[0, 3] == 50258
