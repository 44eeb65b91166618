"""Beam search tests (beyond the reference, which raises for num_beams > 1).

Properties verified:
  * beam width 1 with length_penalty 0 emits exactly the greedy sequence
    (log-probs are non-positive, so the first greedy EOS hypothesis dominates);
  * wider beams never find a worse model score than beam 1 (penalty 0);
  * the returned hypothesis ends with EOS and respects max_length.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisper_medusa_tpu.config import GenerationConfig, tiny_test_config
from whisper_medusa_tpu.decoding.beam import beam_search
from whisper_medusa_tpu.decoding.buffers import generate_medusa_buffers
from whisper_medusa_tpu.decoding.processors import ProcessorConfig
from whisper_medusa_tpu.decoding.speculative import speculative_generate
from whisper_medusa_tpu.models import whisper

EOS = 5
PAD = 5


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_test_config()
    params = whisper.init_whisper_params(jax.random.PRNGKey(0), cfg.dims)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(
        rng.normal(size=(2, cfg.dims.num_mel_bins, cfg.dims.num_frames)),
        jnp.float32)
    enc = whisper.encode(params, cfg.dims, mel)
    prompt = jnp.asarray(np.tile(rng.integers(6, 250, (1, 3)), (2, 1)), jnp.int32)
    pcfg = ProcessorConfig(vocab_size=cfg.dims.vocab_size, begin_index=3,
                           eos_token_id=EOS)
    gen = GenerationConfig(max_length=32, eos_token_id=EOS, pad_token_id=PAD,
                           suppress_tokens=None, begin_suppress_tokens=None)
    return cfg, params, enc, prompt, pcfg, gen


def test_beam1_penalty0_equals_greedy(setup):
    cfg, params, enc, prompt, pcfg, gen = setup
    beam = beam_search(params, cfg.dims, pcfg, gen, enc, prompt,
                       num_beams=1, length_penalty=0.0)
    greedy = speculative_generate(
        params, None, cfg.dims, generate_medusa_buffers([1]), pcfg, gen,
        enc, prompt, variant="vanilla")
    for i in range(2):
        n = int(min(beam.lengths[i], greedy.lengths[i]))
        np.testing.assert_array_equal(
            np.asarray(beam.tokens)[i, :n], np.asarray(greedy.tokens)[i, :n])


def test_wider_beam_never_worse(setup):
    cfg, params, enc, prompt, pcfg, gen = setup
    b1 = beam_search(params, cfg.dims, pcfg, gen, enc, prompt,
                     num_beams=1, length_penalty=0.0)
    b4 = beam_search(params, cfg.dims, pcfg, gen, enc, prompt,
                     num_beams=4, length_penalty=0.0)
    assert (np.asarray(b4.scores) >= np.asarray(b1.scores) - 1e-4).all(), (
        np.asarray(b4.scores), np.asarray(b1.scores))


def test_beam_output_structure(setup):
    cfg, params, enc, prompt, pcfg, gen = setup
    res = beam_search(params, cfg.dims, pcfg, gen, enc, prompt, num_beams=3)
    toks = np.asarray(res.tokens)
    lens = np.asarray(res.lengths)
    for i in range(2):
        assert lens[i] <= gen.max_length
        assert (toks[i, lens[i]:] == PAD).all()
        assert toks[i, lens[i] - 1] == EOS or lens[i] == gen.max_length


def test_beam_via_api():
    from whisper_medusa_tpu.models.api import WhisperMedusaModel

    cfg = tiny_test_config(vocab_size=51865, medusa_num_heads=2)
    model = WhisperMedusaModel.from_random(cfg, seed=1)
    rng = np.random.default_rng(1)
    f = rng.normal(size=(2, cfg.dims.num_mel_bins, cfg.dims.num_frames)).astype(
        np.float32)
    out = model.generate(f, language="en", max_length=20, num_beams=3)
    assert out.sequences.shape[0] == 2
    assert out.avg_logprobs is not None


def test_nbest_outputs(setup):
    cfg, params, enc, prompt, pcfg, gen = setup
    res = beam_search(params, cfg.dims, pcfg, gen, enc, prompt, num_beams=3)
    assert res.nbest_tokens.shape[:2] == (2, 3)
    s = np.asarray(res.nbest_scores)
    assert (np.diff(s, axis=1) <= 1e-6).all(), "n-best must be sorted best-first"


def test_beam_with_timestamps():
    """Timestamps under beam search obey the grammar (beyond the reference;
    even timestamps-alone raise there)."""
    from whisper_medusa_tpu.models.api import WhisperMedusaModel

    cfg = tiny_test_config(vocab_size=51865, medusa_num_heads=2)
    model = WhisperMedusaModel.from_random(cfg, seed=2)
    rng = np.random.default_rng(2)
    f = rng.normal(size=(2, cfg.dims.num_mel_bins, cfg.dims.num_frames)).astype(
        np.float32)
    out = model.generate(f, language="en", max_length=24, num_beams=3,
                         return_timestamps=True)
    TS = 50364
    for i in range(2):
        seq = [t for t in out.sequences[i, 3: out.lengths[i]].tolist()
               if t != 50257]
        assert 50363 not in seq
        ts = [t for t in seq if t >= TS]
        assert ts == sorted(ts)
        if seq:
            assert seq[0] >= TS
    assert out.segments is not None


def test_cross_kv_deduped_across_beams():
    """Cross K/V live once per example (B rows), not per beam (B*K) — the
    K-fold cache-memory reduction with unchanged outputs (ROADMAP r1 #7)."""
    from whisper_medusa_tpu.models import whisper as w

    cfg = tiny_test_config()
    params = w.init_whisper_params(jax.random.PRNGKey(0), cfg.dims)
    b, k = 2, 4
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(
        size=(b, cfg.dims.num_mel_bins, cfg.dims.num_frames)), jnp.float32)
    enc = w.encode(params, cfg.dims, feats)
    cache = w.init_cache(params, cfg.dims, enc, 16, self_batch=b * k)
    assert cache.cross_k.shape[1] == b          # shared, not replicated
    assert cache.self_k.shape[1] == b * k

    # cross_beam-folded step == per-beam replicated step, bit for bit.
    toks = jnp.asarray(rng.integers(6, 60, size=(b * k, 3)), jnp.int32)
    off = jnp.zeros((b * k,), jnp.int32)
    out_fold, _ = w.decode_step(params, cfg.dims, toks, cache, off, cross_beam=k)

    enc_rep = jnp.repeat(enc, k, axis=0)
    cache_rep = w.init_cache(params, cfg.dims, enc_rep, 16)
    out_rep, _ = w.decode_step(params, cfg.dims, toks, cache_rep, off)
    np.testing.assert_allclose(np.asarray(out_fold.hidden),
                               np.asarray(out_rep.hidden), atol=1e-5)


def test_beam_per_example_language():
    """A per-example language list reaches each beam row's init tokens
    (the greedy path has handled this all along; beams must match)."""
    from whisper_medusa_tpu.config import language_token_id
    from whisper_medusa_tpu.models.api import WhisperMedusaModel

    cfg = tiny_test_config(vocab_size=51865, medusa_num_heads=2)
    model = WhisperMedusaModel.from_random(cfg, seed=2)
    rng = np.random.default_rng(2)
    f = rng.normal(size=(2, cfg.dims.num_mel_bins, cfg.dims.num_frames)).astype(
        np.float32)
    out = model.generate(f, language=["en", "fr"], max_length=16, num_beams=2)
    st = model.special
    assert out.sequences[0, 1] == language_token_id("en", st)
    assert out.sequences[1, 1] == language_token_id("fr", st)
    with pytest.raises(ValueError):
        model.generate(f, language=["en"], max_length=16, num_beams=2)


def test_length_penalty_reaches_beam_from_api():
    """VERDICT r4 #6: length_penalty is reachable from generate() — the beam
    jit-cache key embeds the penalty the search was compiled with, so the
    public kwarg provably reaches decoding/beam.py (a random tiny model's
    beams often collapse to one hypothesis, so output-diff assertions are
    flaky; the numeric effect is pinned at beam level below)."""
    from whisper_medusa_tpu.models.api import WhisperMedusaModel

    cfg = tiny_test_config(vocab_size=51865, medusa_num_heads=2)
    model = WhisperMedusaModel.from_random(cfg, seed=1)
    rng = np.random.default_rng(3)
    f = rng.normal(size=(1, cfg.dims.num_mel_bins, cfg.dims.num_frames)).astype(
        np.float32)
    out = model.generate(f, language="en", max_length=16, num_beams=2,
                         length_penalty=0.7)
    assert out.sequences.shape[0] == 1
    assert any(k[0] == "beam" and k[2] == 0.7 for k in model._jit_cache), \
        "beam jit cache has no entry compiled with length_penalty=0.7"


def test_length_penalty_changes_nbest_ordering(setup, monkeypatch):
    """GNMT normalization re-ranks the n-best list: with CONSTANT logits where
    p(EOS) == p(A), the finished set holds hypotheses of every length with raw
    log-prob n*log(p) — so penalty 0 must rank shortest-first while a large
    positive penalty (norm ratio (L2/L1)^pen outgrowing the lp ratio) must
    promote a longer hypothesis to the top."""
    cfg, params, enc, prompt, pcfg, gen = setup
    v = cfg.dims.vocab_size

    def const_logits(p, hidden):
        rows = hidden.shape[0]
        row = jnp.zeros((v,), jnp.float32).at[EOS].set(2.0).at[10].set(2.0)
        return jnp.broadcast_to(row, (rows, v))

    monkeypatch.setattr(whisper, "project_logits", const_logits)
    res = {}
    for lp in (0.0, 10.0):
        res[lp] = beam_search(params, cfg.dims, pcfg, gen, enc, prompt,
                              num_beams=4, length_penalty=lp)
        s = np.asarray(res[lp].nbest_scores)
        assert (np.diff(s, axis=1) <= 1e-6).all(), \
            "n-best must stay sorted best-first under any penalty"
    len0 = np.asarray(res[0.0].nbest_lengths)
    len10 = np.asarray(res[10.0].nbest_lengths)
    # Penalty 0: raw lp decreases with length -> shortest hypothesis wins.
    assert (len0[:, 0] <= len0[:, 1:].min(1)).all()
    # Penalty 10: the top hypothesis is strictly longer than penalty-0's.
    assert (len10[:, 0] > len0[:, 0]).all(), \
        "a +10 length penalty failed to promote a longer hypothesis"
    assert not np.array_equal(np.asarray(res[0.0].nbest_tokens),
                              np.asarray(res[10.0].nbest_tokens))


def _longform_feats2(cfg, windows=2.5, seed=7):
    rng = np.random.default_rng(seed)
    frames = int(cfg.dims.num_frames * windows)
    return rng.normal(
        size=(1, cfg.dims.num_mel_bins, frames)).astype(np.float32)


def test_beam_longform():
    """Beam x longform: >30 s input + num_beams>1 runs the seek loop with
    beam-decoded windows (the former NotImplementedError surface; the
    reference supports neither side, model.py:1153-1156, 1214)."""
    from whisper_medusa_tpu.models.api import WhisperMedusaModel

    cfg = tiny_test_config(vocab_size=51865, medusa_num_heads=2)
    model = WhisperMedusaModel.from_random(cfg, seed=3)
    rng = np.random.default_rng(3)
    frames = int(cfg.dims.num_frames * 2.5)  # ~3 seek windows
    feats = rng.normal(
        size=(1, cfg.dims.num_mel_bins, frames)).astype(np.float32)
    assert feats.shape[-1] > cfg.dims.num_frames

    out = model.generate(feats, language="en", max_length=20, num_beams=3)
    assert out.sequences.shape[0] == 1
    assert out.lengths[0] > 0
    assert (out.sequences[0, : out.lengths[0]] < 50364).all()  # ts stripped
    assert out.token_logprobs is None  # beams report n-best scores, not per-token

    # Batched: both examples' windows beam-decode in one call per round.
    feats2 = np.concatenate([feats, _longform_feats2(cfg)], axis=0)
    out2 = model.generate(feats2, language="en", max_length=20, num_beams=3)
    assert out2.sequences.shape[0] == 2
    np.testing.assert_array_equal(
        out2.sequences[0, : out2.lengths[0]],
        out.sequences[0, : out.lengths[0]])

    out_ts = model.generate(feats, language="en", max_length=20, num_beams=3,
                            return_timestamps=True)
    assert out_ts.segments is not None
    segs = out_ts.segments[0]
    assert len(segs) > 0
    # Window seek offsets are applied and compose: the transcript begins in
    # the first window and later windows carry offsets past it.  (Exact
    # cross-window monotonicity of starts is not assertable with a random
    # tiny model: it emits timestamp tokens beyond its sub-second window, so
    # the seek advance clamps at the window size — same as the greedy
    # longform tests.)
    win_s = model.config.dims.num_frames * 0.01
    assert segs[0]["start"] < win_s
    ends = [s["end"] for s in segs if s["end"] is not None]
    assert ends and max(ends) > win_s

    # length_penalty reaches the per-window beam search (plumbing check).
    out_lp = model.generate(feats, language="en", max_length=20, num_beams=3,
                            length_penalty=2.0)
    assert out_lp.sequences.shape[0] == 1

    # Thresholds/temperature fallback stay rejected with beams on longform too.
    with pytest.raises(ValueError):
        model.generate(feats, language="en", max_length=20, num_beams=3,
                       logprob_threshold=-1.0)
