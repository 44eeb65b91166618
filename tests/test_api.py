"""Public API tests: from_random / generate / save / load round-trips.

Covers the reference surface of WhisperMedusaModel.from_pretrained/.generate
(reference: whisper_medusa/models/model.py:213-291, 1419-1451, README.md:102-141)
including batched generation (the reference asserts batch 1 — we don't)."""

import numpy as np
import pytest

import jax.numpy as jnp

from whisper_medusa_tpu.config import tiny_test_config
from whisper_medusa_tpu.models.api import WhisperMedusaModel


@pytest.fixture(scope="module")
def tiny_model():
    cfg = tiny_test_config(vocab_size=51865, medusa_num_heads=3)
    return WhisperMedusaModel.from_random(cfg, seed=0)


def _feats(cfg, b=2, seed=0):
    rng = np.random.default_rng(seed)
    return rng.normal(
        size=(b, cfg.dims.num_mel_bins, cfg.dims.num_frames)).astype(np.float32)


def test_generate_batched(tiny_model):
    out = tiny_model.generate(_feats(tiny_model.config), language="en",
                              max_length=24)
    assert out.sequences.shape[0] == 2
    # Prompt is [sot, lang, task, notimestamps].
    assert (out.sequences[:, 0] == 50258).all()
    assert (out.sequences[:, 1] == 50259).all()
    assert (out.sequences[:, 2] == 50359).all()
    assert out.steps > 0


def test_generate_language_detection(tiny_model):
    out = tiny_model.generate(_feats(tiny_model.config), language=None,
                              max_length=16)
    assert out.detected_language is not None
    assert len(out.detected_language) == 2


def test_disable_medusa_matches_medusa_tokens(tiny_model):
    """disable_medusa (reference forward kwarg, model.py:1241) -> vanilla loop;
    for the block variant the base model is identical so tokens must agree.
    For base_head the base is head0 so vanilla-whisper differs by design."""
    cfg = tiny_test_config(vocab_size=51865, medusa_num_heads=3,
                           medusa_heads_type="medusa_block")
    model = WhisperMedusaModel.from_random(cfg, seed=1)
    f = _feats(cfg, seed=1)
    a = model.generate(f, language="en", max_length=24)
    b = model.generate(f, language="en", max_length=24, disable_medusa=True)
    for i in range(2):
        n = int(min(a.lengths[i], b.lengths[i]))
        np.testing.assert_array_equal(a.sequences[i, :n], b.sequences[i, :n])


def test_save_load_roundtrip(tiny_model, tmp_path):
    path = str(tmp_path / "ckpt")
    tiny_model.save_pretrained(path)
    loaded = WhisperMedusaModel.from_pretrained(path)
    f = _feats(tiny_model.config, seed=3)
    a = tiny_model.generate(f, language="en", max_length=16)
    b = loaded.generate(f, language="en", max_length=16)
    np.testing.assert_array_equal(a.sequences, b.sequences)


def test_validation_errors(tiny_model):
    """Every reference NotImplementedError surface (timestamps, longform,
    no-speech, beams) is now functional; remaining errors are input validation."""
    f = _feats(tiny_model.config)
    with pytest.raises(ValueError):
        tiny_model.generate(f, language="klingon")
    with pytest.raises(ValueError):
        tiny_model.generate(f[:, :4], language="en")  # wrong mel-bin count


def test_timestamp_generation(tiny_model):
    """return_timestamps works (beyond the reference, which raises): outputs obey
    the Whisper timestamp grammar and segments are extracted."""
    f = _feats(tiny_model.config, seed=9)
    out = tiny_model.generate(f, language="en", max_length=32,
                              return_timestamps=True)
    TS = 50364
    for i in range(out.sequences.shape[0]):
        seq = out.sequences[i, 3: out.lengths[i]]  # after [sot, lang, task]
        seq = [t for t in seq.tolist() if t != 50257]
        assert 50363 not in seq  # notimestamps suppressed
        ts = [t for t in seq if t >= TS]
        assert ts == sorted(ts), "timestamps must be non-decreasing"
        if seq:
            assert seq[0] >= TS, "first generated token must be a timestamp"
    assert out.segments is not None and len(out.segments) == 2


def test_timestamp_medusa_vanilla_parity(tiny_model):
    """Token parity must survive timestamp rules (history-dependent processors)."""
    cfg = tiny_test_config(vocab_size=51865, medusa_num_heads=3,
                           medusa_heads_type="medusa_block")
    model = WhisperMedusaModel.from_random(cfg, seed=3)
    f = _feats(cfg, seed=3)
    a = model.generate(f, language="en", max_length=28, return_timestamps=True)
    b = model.generate(f, language="en", max_length=28, return_timestamps=True,
                       disable_medusa=True)
    for i in range(2):
        n = int(min(a.lengths[i], b.lengths[i]))
        np.testing.assert_array_equal(a.sequences[i, :n], b.sequences[i, :n])


def test_logprob_threshold_fallback_scoring(tiny_model):
    """avg-logprob scoring pass + fallback gate (reference _need_fallback path)."""
    f = _feats(tiny_model.config, seed=5)
    out = tiny_model.generate(f, language="en", max_length=20,
                              temperature=(0.0, 0.5),
                              logprob_threshold=-1e9)  # never triggers
    assert out.sequences.shape[0] == 2
    out2 = tiny_model.generate(f, language="en", max_length=20,
                               temperature=(0.0, 0.5),
                               logprob_threshold=1e9)  # always triggers -> ladder
    assert out2.sequences.shape[0] == 2


def test_prompt_ids_conditioning(tiny_model):
    """Prompt conditioning prepends context tokens (reference model.py:1794-1801)."""
    f = _feats(tiny_model.config, seed=6)
    out = tiny_model.generate(f, language="en", max_length=24,
                              prompt_ids=[50361, 1000, 1001])
    assert (out.sequences[:, 0] == 50361).all()
    assert (out.sequences[:, 3] == 50258).all()  # sot after the prompt
    with pytest.raises(ValueError):
        tiny_model.generate(f, language="en", max_length=6,
                            prompt_ids=list(range(50361, 50361 + 1)) * 8)


def test_longform_generation(tiny_model):
    """>30s inputs run through the seek loop (reference raises, model.py:1214)."""
    from whisper_medusa_tpu.ops.mel import log_mel_spectrogram_np

    rng = np.random.default_rng(11)
    # 75s of audio -> 7500 mel frames -> at least 3 windows.
    wav = (0.1 * rng.normal(size=(1, 16000 * 75))).astype(np.float32)
    feats = log_mel_spectrogram_np(wav, n_mels=tiny_model.config.dims.num_mel_bins)
    assert feats.shape[-1] == 7500
    out = tiny_model.generate(feats, language="en", max_length=20)
    assert out.sequences.shape[0] == 1
    assert (out.sequences[0, : out.lengths[0]] < 50364).all()  # ts stripped
    out_ts = tiny_model.generate(feats, language="en", max_length=20,
                                 return_timestamps=True)
    assert out_ts.segments is not None


def test_no_speech_detection(tiny_model):
    """no_speech_threshold marks silent segments (reference raises,
    model.py:1201-1205)."""
    f = _feats(tiny_model.config, seed=13)
    out = tiny_model.generate(f, language="en", max_length=16)
    assert out.no_speech_probs is not None and out.no_speech_probs.shape == (2,)
    # threshold 0 -> everything silent -> sequences truncated to the prompt
    out2 = tiny_model.generate(f, language="en", max_length=16,
                               no_speech_threshold=0.0)
    assert (out2.lengths == 4).all()


def test_captured_token_logprobs(tiny_model):
    """In-loop score capture (output_scores equivalent): finite logprobs on
    generated positions, zeros elsewhere; avg matches a manual recompute."""
    f = _feats(tiny_model.config, seed=15)
    out = tiny_model.generate(f, language="en", max_length=20)
    lp = out.token_logprobs
    assert lp.shape == out.sequences.shape
    for i in range(2):
        gen = lp[i, 4: out.lengths[i]]
        assert (gen <= 0).all() and np.isfinite(gen).all()
        assert (lp[i, out.lengths[i]:] == 0).all()
        manual = gen.mean() if gen.size else 0.0
        np.testing.assert_allclose(out.avg_logprobs[i], manual, rtol=1e-5)


def test_medusa_choices_override_tree(tiny_model):
    """generate(medusa_choices=...) overrides the config chain with a tree."""
    f = _feats(tiny_model.config, seed=17)
    out = tiny_model.generate(f, language="en", max_length=20,
                              medusa_choices=[1, 2, 2, 1])
    base = tiny_model.generate(f, language="en", max_length=20)
    for i in range(2):
        n = int(min(out.lengths[i], base.lengths[i]))
        np.testing.assert_array_equal(out.sequences[i, :n], base.sequences[i, :n])


def test_typical_acceptance_temperature(tiny_model):
    """temperature>0 switches to typical acceptance; decode still terminates and
    commits only greedy-base-consistent chains."""
    f = _feats(tiny_model.config, seed=19)
    out = tiny_model.generate(f, language="en", max_length=20, temperature=0.7)
    assert out.sequences.shape[0] == 2
    assert (out.lengths > 4).all()


def test_generate_stream_matches_generate(tiny_model):
    """Segmented streaming decode == single-shot decode, token for token."""
    f = _feats(tiny_model.config, seed=23)
    ref = tiny_model.generate(f, language="en", max_length=28)
    chunks = list(tiny_model.generate_stream(f, language="en", max_length=28,
                                             chunk_tokens=6))
    assert len(chunks) >= 2, "expected multiple streamed segments"
    toks, lengths, finished = chunks[-1]
    assert finished
    for i in range(2):
        n = int(min(lengths[i], ref.lengths[i]))
        np.testing.assert_array_equal(toks[i, :n], ref.sequences[i, :n])
    # Progressive reveal: lengths non-decreasing across chunks.
    prev = None
    for t, l, _ in chunks:
        if prev is not None:
            assert (l >= prev).all()
        prev = l


def test_single_choice_medusa_equals_vanilla_cost_path(tiny_model):
    """medusa_choices=[1] degenerates to the vanilla loop through the API."""
    f = _feats(tiny_model.config, seed=29)
    out = tiny_model.generate(f, language="en", max_length=16,
                              medusa_choices=[1])
    assert out.sequences.shape[0] == 2 and (out.accepted == 0).all()


def test_max_new_tokens(tiny_model):
    """max_new_tokens bounds GENERATED tokens and takes precedence over
    max_length (HF semantics; the reference resolves it through
    GenerationConfig, model.py:1014-1084)."""
    f = _feats(tiny_model.config)
    prompt_len = 4  # [sot, lang, task, notimestamps]
    out = tiny_model.generate(f, language="en", max_new_tokens=5)
    assert (out.lengths <= prompt_len + 5).all()
    out2 = tiny_model.generate(f, language="en", max_length=40,
                               max_new_tokens=3)
    assert (out2.lengths <= prompt_len + 3).all()
    out3 = tiny_model.generate(f, language="en", num_beams=2,
                               max_new_tokens=4)
    assert (out3.lengths <= prompt_len + 4).all()


def test_custom_logits_processor(tiny_model):
    """logits_processor (the reference's HF kwarg in TPU-native form): a PURE
    (logits, pred_pos) -> logits jax function compiled into the decode loop,
    applied after the built-ins at every scored position — greedy (it also
    routes verification off the fused kernel) and beams."""
    import jax.numpy as jnp

    TOK = 1234

    def force_tok(logits, pred_pos):
        mask = jnp.arange(logits.shape[-1]) == TOK
        return jnp.where(mask, jnp.zeros_like(logits),
                         jnp.full_like(logits, -1e9))

    f = _feats(tiny_model.config)
    prompt_len = 4
    out = tiny_model.generate(f, language="en", max_length=12,
                              logits_processor=force_tok)
    for i in range(2):
        gen = np.asarray(out.sequences[i, prompt_len:int(out.lengths[i])])
        assert len(gen) > 0 and (gen == TOK).all()
    outb = tiny_model.generate(f, language="en", max_length=10, num_beams=2,
                               logits_processor=force_tok)
    for i in range(2):
        gen = np.asarray(outb.sequences[i, prompt_len:int(outb.lengths[i])])
        assert len(gen) > 0 and (gen == TOK).all()


def test_max_new_tokens_and_prompt_guards(tiny_model):
    """Input-validation edges: max_new_tokens must be positive; an oversized
    prompt raises the same clear ValueError on the beam path as on greedy
    (not an opaque shape error)."""
    f = _feats(tiny_model.config)
    with pytest.raises(ValueError, match="max_new_tokens"):
        tiny_model.generate(f, language="en", max_new_tokens=0)
    long_prompt = [50361] + list(range(100, 110))
    with pytest.raises(ValueError, match="prompt length"):
        tiny_model.generate(f, language="en", max_length=5,
                            prompt_ids=long_prompt)
    with pytest.raises(ValueError, match="prompt length"):
        tiny_model.generate(f, language="en", max_length=5, num_beams=2,
                            prompt_ids=long_prompt)


def test_longform_attention_mask_bounds_each_example(tiny_model):
    """attention_mask (HF kwarg) carries per-example REAL audio lengths in a
    right-padded batch: each example's seek loop stops at its own length, so
    a short example in a long batch emits no segments for padding audio."""
    from whisper_medusa_tpu.ops.mel import log_mel_spectrogram_np

    cfg = tiny_model.config
    rng = np.random.default_rng(51)
    wav = (0.1 * rng.normal(size=(2, 16000 * 20))).astype(np.float32)
    feats = log_mel_spectrogram_np(wav, n_mels=cfg.dims.num_mel_bins)
    tl = feats.shape[-1]
    ts = int(tl * 0.45)                    # example 1 "really" ends here
    mask = np.ones((2, tl), np.int32)
    mask[1, ts:] = 0
    # The capture surface records each decoded window's time_offset — the
    # direct observable for where each example's seek loop stopped.
    out = tiny_model.generate(feats, language="en", max_length=20,
                              attention_mask=mask, return_timestamps=True,
                              return_hidden_states=True)
    offs = [[c["time_offset"] for c in caps]
            for caps in out.cross_attentions]  # capture entries ride this field
    # Example 1 decodes no window at/after its cutoff; example 0 does.
    assert max(offs[1]) < ts * 0.01
    assert max(offs[0]) >= ts * 0.01
    # Shape validation.
    with pytest.raises(ValueError, match="attention_mask"):
        tiny_model.generate(feats, language="en",
                            attention_mask=np.ones((2, 7)))


def test_longform_all_segments_fits_small_max_length(tiny_model):
    """'all-segments' conditioning shrinks the rolling context (down to none)
    so a later window's longer prompt can never exceed a user max_length and
    raise mid-seek-loop, discarding decoded windows."""
    from whisper_medusa_tpu.ops.mel import log_mel_spectrogram_np

    rng = np.random.default_rng(41)
    wav = (0.1 * rng.normal(size=(1, 16000 * 65))).astype(np.float32)
    feats = log_mel_spectrogram_np(
        wav, n_mels=tiny_model.config.dims.num_mel_bins)
    pids = [tiny_model.special.start_of_prev, 11, 12, 13]
    out = tiny_model.generate(feats, language="en", max_length=24,
                              prompt_ids=pids,
                              condition_on_prev_tokens=True,
                              prompt_condition_type="all-segments")
    assert out.sequences.shape[0] == 1 and out.lengths[0] > 0


def test_longform_prompt_condition_types(tiny_model, monkeypatch):
    """prompt_ids across longform windows (HF ``prompt_condition_type``
    semantics; the reference inherits both kwargs but raises on ANY longform
    input, model.py:1214): 'first-segment' conditions the first window only,
    'all-segments' keeps the prompt at the front of every window's
    previous-context block."""
    from whisper_medusa_tpu.ops.mel import log_mel_spectrogram_np

    rng = np.random.default_rng(23)
    wav = (0.1 * rng.normal(size=(1, 16000 * 65))).astype(np.float32)
    feats = log_mel_spectrogram_np(
        wav, n_mels=tiny_model.config.dims.num_mel_bins)
    st = tiny_model.special
    pids = [st.start_of_prev, 11, 12, 13]

    captured = []
    real = WhisperMedusaModel.generate

    def spy(self, input_features, **kw):
        if np.asarray(input_features).shape[-1] == self.config.dims.num_frames:
            captured.append(kw.get("prompt_ids"))
        return real(self, input_features, **kw)

    monkeypatch.setattr(WhisperMedusaModel, "generate", spy)

    # first-segment (default): prompt reaches exactly the first window.
    tiny_model.generate(feats, language="en", max_length=24, prompt_ids=pids)
    assert len(captured) >= 2 and list(captured[0]) == pids
    assert all(c is None for c in captured[1:])

    # all-segments: every window's context starts [<|startofprev|>, *prompt].
    captured.clear()
    tiny_model.generate(feats, language="en", max_length=24, prompt_ids=pids,
                        condition_on_prev_tokens=True,
                        prompt_condition_type="all-segments")
    assert len(captured) >= 2
    assert all(list(c[:4]) == pids for c in captured)

    # batched longform (b>1, unconditioned): shared prompt on round 1 only.
    captured.clear()
    feats2 = np.concatenate([feats, feats], axis=0)
    tiny_model.generate(feats2, language="en", max_length=24,
                        prompt_ids=pids)
    assert list(captured[0]) == pids
    assert all(c is None for c in captured[1:])


def test_prompt_condition_type_validation(tiny_model):
    f = _feats(tiny_model.config)
    with pytest.raises(ValueError, match="all-segments"):
        tiny_model.generate(f, language="en", prompt_ids=[50361, 1],
                            prompt_condition_type="all-segments")
    with pytest.raises(ValueError, match="prompt_condition_type"):
        tiny_model.generate(f, language="en",
                            prompt_condition_type="per-window")


def test_longform_condition_on_prev(tiny_model):
    """condition_on_prev_tokens threads previous-window text into the next
    window's prompt (bucketed lengths — bounded recompiles)."""
    from whisper_medusa_tpu.ops.mel import log_mel_spectrogram_np

    rng = np.random.default_rng(31)
    wav = (0.1 * rng.normal(size=(1, 16000 * 65))).astype(np.float32)
    feats = log_mel_spectrogram_np(wav, n_mels=tiny_model.config.dims.num_mel_bins)
    out = tiny_model.generate(feats, language="en", max_length=40,
                              condition_on_prev_tokens=True)
    assert out.sequences.shape[0] == 1


def test_large_v3_style_config_decodes():
    """128-mel / 51866-vocab (large-v3 family) flows through frontend + decode."""
    from whisper_medusa_tpu.config import MedusaConfig, ModelConfig, WhisperDims

    dims = WhisperDims(vocab_size=51866, num_mel_bins=128, d_model=32,
                       encoder_layers=2, decoder_layers=2,
                       encoder_attention_heads=2, decoder_attention_heads=2,
                       encoder_ffn_dim=64, decoder_ffn_dim=64,
                       max_source_positions=32, max_target_positions=48)
    cfg = ModelConfig(dims=dims, medusa=MedusaConfig(
        medusa_num_heads=2, medusa_hidden_size=32, medusa_choices=(1, 1, 1)))
    model = WhisperMedusaModel.from_random(cfg, seed=0)
    from whisper_medusa_tpu.ops.mel import log_mel_spectrogram_np

    wav = (0.1 * np.random.default_rng(0).normal(size=(1, 16000))).astype(np.float32)
    feats = log_mel_spectrogram_np(wav, n_mels=128)[..., :dims.num_frames]
    out = model.generate(feats, language="en", max_length=16)
    assert out.sequences.shape[0] == 1


def test_longform_batched_matches_sequential(tiny_model):
    """b>1 longform decodes all examples' windows in one batched call per
    round; tokens/segments must match the sequential per-example loop."""
    from whisper_medusa_tpu.ops.mel import log_mel_spectrogram_np

    rng = np.random.default_rng(17)
    wav = (0.1 * rng.normal(size=(2, 16000 * 65))).astype(np.float32)
    feats = log_mel_spectrogram_np(
        wav, n_mels=tiny_model.config.dims.num_mel_bins)
    out_b = tiny_model.generate(feats, language="en", max_length=20,
                                return_timestamps=True)
    seqs, segs = [], []
    for i in range(2):
        o = tiny_model.generate(feats[i:i + 1], language="en", max_length=20,
                                return_timestamps=True)
        seqs.append(o.sequences[0, :o.lengths[0]])
        segs.append(o.segments[0])
    for i in range(2):
        np.testing.assert_array_equal(
            out_b.sequences[i, :out_b.lengths[i]], seqs[i])
        assert out_b.segments[i] == segs[i]


def test_cut_after_last_complete():
    """The seek loop's anti-duplication cut: tokens after the last CLOSED
    segment are dropped (that audio is re-decoded from the next window —
    OpenAI transcribe.py / HF ``_retrieve_segment`` semantics)."""
    from whisper_medusa_tpu.models.api import _cut_after_last_complete

    TS, EOS = 100, 9  # timestamp_begin, eos
    def cut(toks):
        return _cut_after_last_complete(np.asarray(toks, np.int32), TS, EOS)

    # <t0> a b <t1> <t2> c  -> cut one past <t1> (index 4); trailing
    # incomplete segment (<t2> c) dropped.
    assert cut([TS, 1, 2, TS + 1, TS + 2, 3]) == 4
    # Two closed segments: cut lands after the SECOND close.
    assert cut([TS, 1, TS + 1, TS + 2, 2, TS + 3]) == 6
    # No closing timestamp at all -> None (emit everything).
    assert cut([TS, 1, 2, 3]) is None
    assert cut([1, 2, 3]) is None
    # EOS stops the scan: a 'close' after EOS is padding, not a segment.
    assert cut([TS, 1, EOS, TS + 1]) is None
    assert cut([TS, 1, TS + 2, EOS, TS + 3]) == 3


def test_fallback_subset_retry_and_provenance(tiny_model):
    """Mixed-keep batch: the example kept at rung 0 must return rung-0 tokens,
    logprobs, accepted counts, and steps; the retry decodes ONLY the failing
    subset (reference subset retry, model.py:1991-2005)."""
    f = _feats(tiny_model.config, seed=29)
    base = tiny_model.generate(f, language="en", max_length=20)
    lo, hi = sorted(np.asarray(base.avg_logprobs, np.float64))
    if hi - lo < 1e-5:
        pytest.skip("examples' avg logprobs coincide; cannot split the batch")
    mid = float((lo + hi) / 2)
    pass_i = int(np.argmax(base.avg_logprobs))
    fail_i = 1 - pass_i
    before = set(tiny_model._jit_cache)
    out = tiny_model.generate(f, language="en", max_length=20,
                              temperature=(0.0, 0.5), logprob_threshold=mid,
                              seed=7)
    # Rung-0 provenance for the kept example: identical to the single-rung run.
    np.testing.assert_array_equal(out.sequences[pass_i], base.sequences[pass_i])
    np.testing.assert_array_equal(out.token_logprobs[pass_i],
                                  base.token_logprobs[pass_i])
    assert out.accepted[pass_i] == base.accepted[pass_i]
    assert out.steps_per_example[pass_i] == base.steps
    # Total steps spans both rungs; per-example steps come from each own rung.
    assert out.steps >= int(out.steps_per_example.max())
    # avg_logprobs must be recomputed from each example's OWN rung logprobs.
    for i in (pass_i, fail_i):
        gen_lp = out.token_logprobs[i, 4: out.lengths[i]]
        manual = gen_lp.mean() if gen_lp.size else 0.0
        np.testing.assert_allclose(out.avg_logprobs[i], manual, rtol=1e-5)
    # The retry rung decoded a batch-1 (sampled) subset, not the full batch.
    new = set(tiny_model._jit_cache) - before
    assert any(isinstance(k, tuple) and k and k[0] == "decode"
               and k[5][0] == 1 and k[-1] is True for k in new), new


def test_longform_no_speech_threshold(tiny_model):
    """no_speech_threshold composes with the >30s seek loop: silent windows are
    skipped (full-window advance, no tokens, no segments)."""
    from whisper_medusa_tpu.ops.mel import log_mel_spectrogram_np

    rng = np.random.default_rng(31)
    wav = (0.1 * rng.normal(size=(1, 16000 * 90))).astype(np.float32)
    feats = log_mel_spectrogram_np(
        wav, n_mels=tiny_model.config.dims.num_mel_bins)
    assert feats.shape[-1] == 9000
    voiced = tiny_model.generate(feats, language="en", max_length=20)
    assert voiced.lengths[0] > 0
    # Threshold below every probability -> every window silent -> empty output.
    silent = tiny_model.generate(feats, language="en", max_length=20,
                                 no_speech_threshold=-1.0)
    assert silent.lengths[0] == 0
    silent_ts = tiny_model.generate(feats, language="en", max_length=20,
                                    no_speech_threshold=-1.0,
                                    return_timestamps=True)
    assert silent_ts.segments == [[]]
