"""Full score stacks, cross-attention capture, and DTW word timestamps.

Pins the opt-in post-hoc output surfaces (decoding/scores.py,
decoding/word_timestamps.py) against the in-loop captures and against
synthetic alignments with known answers.  Reference parity target:
``_update_medusa_outputs`` (reference: whisper_medusa/models/model.py:317-377)
reassembles scores/attentions from the loop; here one teacher-forced replay
reproduces them exactly (processors are pure functions of position + history).
"""

import numpy as np
import pytest

from whisper_medusa_tpu.config import tiny_test_config
from whisper_medusa_tpu.decoding import word_timestamps as wt
from whisper_medusa_tpu.models.api import WhisperMedusaModel


@pytest.fixture(scope="module")
def tiny_model():
    cfg = tiny_test_config(vocab_size=51865, medusa_num_heads=3)
    return WhisperMedusaModel.from_random(cfg, seed=0)


def _feats(cfg, b=2, seed=0):
    rng = np.random.default_rng(seed)
    return rng.normal(
        size=(b, cfg.dims.num_mel_bins, cfg.dims.num_frames)).astype(np.float32)


# ---------------------------------------------------------------- full scores

def _check_scores_match_inloop(out, prompt_len, max_length, vocab):
    b = out.sequences.shape[0]
    assert out.scores.shape == (b, max_length - prompt_len, vocab)
    for i in range(b):
        li = int(out.lengths[i])
        for p in range(prompt_len, li):
            row = out.scores[i, p - prompt_len]
            # Rows are log-probs over the processed distribution.
            lse = np.log(np.sum(np.exp(row[np.isfinite(row)])))
            assert abs(lse) < 1e-3
            tok = int(out.sequences[i, p])
            assert row[tok] == pytest.approx(
                float(out.token_logprobs[i, p]), abs=2e-2)
        # Rows past the committed length are zeroed.
        if li - prompt_len < out.scores.shape[1]:
            assert np.all(out.scores[i, li - prompt_len:] == 0.0)


def test_full_scores_match_inloop_capture(tiny_model):
    f = _feats(tiny_model.config)
    out = tiny_model.generate(f, language="en", max_length=20,
                              return_scores="full")
    _check_scores_match_inloop(out, 4, 20, 51865)


def test_full_scores_with_timestamp_rules(tiny_model):
    f = _feats(tiny_model.config, seed=7)
    out = tiny_model.generate(f, language="en", max_length=24,
                              return_timestamps=True, return_scores="full")
    # prompt is [sot, lang, task] when timestamps are on
    _check_scores_match_inloop(out, 3, 24, 51865)


def test_full_scores_off_by_default(tiny_model):
    out = tiny_model.generate(_feats(tiny_model.config), language="en",
                              max_length=12)
    assert out.scores is None and out.cross_attentions is None
    assert out.words is None


def test_return_scores_validation(tiny_model):
    with pytest.raises(ValueError, match="return_scores"):
        tiny_model.generate(_feats(tiny_model.config), language="en",
                            max_length=8, return_scores="all")


# ------------------------------------------------------- cross-attention maps

def test_cross_attentions_full_and_selected(tiny_model):
    cfg = tiny_model.config
    f = _feats(cfg)
    out = tiny_model.generate(f, language="en", max_length=16,
                              return_cross_attentions=True)
    L, H = cfg.dims.decoder_layers, cfg.dims.decoder_attention_heads
    S = cfg.dims.max_source_positions
    assert out.cross_attentions.shape == (L, 2, H, 16, S)
    # Rows are softmax distributions over the audio frames.
    sums = out.cross_attentions.sum(-1)
    assert np.allclose(sums, 1.0, atol=1e-3)

    sel = ((0, 1), (1, 0))
    out_sel = tiny_model.generate(f, language="en", max_length=16,
                                  return_cross_attentions=sel)
    assert out_sel.cross_attentions.shape == (2, 2, 16, S)
    for k, (l, h) in enumerate(sel):
        np.testing.assert_allclose(out_sel.cross_attentions[k],
                                   out.cross_attentions[l][:, h],
                                   rtol=0, atol=1e-5)


# ------------------------------------------------------------------- DTW core

def test_dtw_diagonal():
    n = 6
    cost = np.ones((n, n)) - np.eye(n)
    ti, si = wt.dtw_path(cost)
    np.testing.assert_array_equal(ti, np.arange(n))
    np.testing.assert_array_equal(si, np.arange(n))


def test_dtw_monotonic_and_complete():
    rng = np.random.default_rng(0)
    cost = rng.random((5, 12))
    ti, si = wt.dtw_path(cost)
    assert ti[0] == 0 and si[0] == 0
    assert ti[-1] == 4 and si[-1] == 11
    assert np.all(np.diff(ti) >= 0) and np.all(np.diff(si) >= 0)
    assert np.all((np.diff(ti) + np.diff(si)) >= 1)


def test_dtw_block_alignment():
    # Token i strongly attends to frame block [4i, 4i+4) -> each token's span
    # starts at its block.
    t, frames = 4, 16
    att = np.full((t, frames), 1.0)
    for i in range(t):
        att[i, 4 * i: 4 * i + 4] = 0.0     # low cost on the diagonal blocks
    ti, si = wt.dtw_path(att)
    starts = {int(i): int(si[np.argmax(ti == i)]) for i in range(t)}
    for i in range(t):
        assert 4 * i <= starts[i] < 4 * i + 4


def test_median_filter_known_values():
    x = np.array([[1.0, 9.0, 1.0, 1.0, 8.0, 1.0, 1.0]])
    y = wt.median_filter(x, 3)
    # Reflect padding (OpenAI's choice): the first window is [9, 1, 9].
    np.testing.assert_allclose(y[0], [9, 1, 1, 1, 1, 1, 1])
    assert wt.median_filter(x, 1) is x


def test_token_times_monotonic_from_synthetic_maps():
    t, s = 5, 20
    rng = np.random.default_rng(1)
    maps = rng.random((2, t, s)) * 0.05
    for i in range(t):
        maps[:, i, 4 * i: 4 * i + 4] += 1.0
    maps /= maps.sum(-1, keepdims=True)
    starts, ends = wt.token_times(maps, num_frames=s)
    assert np.all(np.diff(starts) >= 0)
    assert np.all(ends >= starts)
    assert ends[-1] == pytest.approx(s * wt.SECONDS_PER_ENC_FRAME)


# ------------------------------------------------------------- word splitting

class _StubTokenizer:
    """decode() renders each id as a space-separated pseudo-word."""

    def decode(self, ids, skip_special_tokens=True, **kw):
        return "".join(f" t{int(i)}" for i in ids)


def test_words_with_times_synthetic():
    tokens = [11, 12, 13]
    t, s = 3, 12
    maps = np.full((1, t, s), 0.01)
    for i in range(t):
        maps[:, i, 4 * i: 4 * i + 4] = 1.0
    words = wt.words_with_times(
        tokens, maps, _StubTokenizer(), num_frames=s,
        eos_id=50257, timestamp_begin=50364)
    assert [w["word"].strip() for w in words] == ["t11", "t12", "t13"]
    for a, b in zip(words, words[1:]):
        assert a["end"] <= b["start"] + 1e-9
    assert words[0]["start"] >= 0.0
    assert words[-1]["end"] == pytest.approx(s * wt.SECONDS_PER_ENC_FRAME)


def test_words_skip_specials_and_offset():
    # Timestamp + EOS rows are excluded from words but alignment still works.
    tokens = [50364, 11, 12, 50380, 50257]
    t, s = 5, 10
    maps = np.full((1, t, s), 0.01)
    blocks = [(0, 2), (2, 5), (5, 8), (8, 10), (8, 10)]
    for i, (a, b) in enumerate(blocks):
        maps[:, i, a:b] = 1.0
    words = wt.words_with_times(
        tokens, maps, _StubTokenizer(), num_frames=s,
        eos_id=50257, timestamp_begin=50364, time_offset=10.0)
    assert [w["word"].strip() for w in words] == ["t11", "t12"]
    assert all(w["start"] >= 10.0 for w in words)


def test_split_tokens_on_spaces_real_bpe(tmp_path):
    # A miniature byte-level BPE (same machinery as the real vocab) round-trips
    # words through split_tokens_on_spaces.
    from whisper_medusa_tpu.data.bpe import WhisperBPETokenizer, bytes_to_unicode

    byte_enc = bytes_to_unicode()
    vocab = {c: i for i, c in enumerate(byte_enc.values())}
    vocab["<|endoftext|>"] = len(vocab)
    tok = WhisperBPETokenizer(vocab, [])
    text = " the quick brown fox, naïve café 日本"
    ids = tok.encode(text)
    words, word_tokens = wt.split_tokens_on_spaces(ids, tok)
    assert "".join(words) == text
    assert sum(len(g) for g in word_tokens) == len(ids)
    # Each word starts with a space or is punctuation glued onto its neighbor.
    rejoined = [w for w in words if w.strip()]
    assert rejoined[0].strip() == "the"
    assert any("fox," == w.strip() for w in rejoined)  # comma glued to fox


# ------------------------------------------------------------- end-to-end API

def test_word_timestamps_end_to_end(tiny_model):
    f = _feats(tiny_model.config, seed=9)
    out = tiny_model.generate(
        f, language="en", max_length=24, return_timestamps=True,
        word_timestamps=True, tokenizer=_StubTokenizer())
    assert out.words is not None and len(out.words) == 2
    dur = tiny_model.config.dims.max_source_positions * \
        wt.SECONDS_PER_ENC_FRAME
    for ws in out.words:
        for w in ws:
            assert 0.0 <= w["start"] <= w["end"] <= dur + 1e-6
        for a, b in zip(ws, ws[1:]):
            assert a["start"] <= b["start"] + 1e-9
    # Words attach to segments.
    if out.segments is not None:
        for segs in out.segments:
            for seg in segs:
                assert "words" in seg


def test_word_timestamps_validation(tiny_model):
    f = _feats(tiny_model.config)
    with pytest.raises(ValueError, match="return_timestamps"):
        tiny_model.generate(f, language="en", word_timestamps=True,
                            tokenizer=_StubTokenizer())
    with pytest.raises(ValueError, match="tokenizer"):
        tiny_model.generate(f, language="en", return_timestamps=True,
                            word_timestamps=True)


def test_default_alignment_heads():
    heads = wt.default_alignment_heads(4, 2)
    assert heads == ((2, 0), (2, 1), (3, 0), (3, 1))


# ---------------------- decoder self-attentions / hidden states (VERDICT r4 #6)

def test_decoder_attentions_and_hidden_states(tiny_model):
    cfg = tiny_model.config
    f = _feats(cfg, seed=3)
    max_length = 16
    out = tiny_model.generate(f, language="en", max_length=max_length,
                              return_decoder_attentions=True,
                              return_hidden_states=True)
    L = cfg.dims.decoder_layers
    H = cfg.dims.decoder_attention_heads
    D = cfg.dims.d_model
    b = f.shape[0]
    assert out.decoder_attentions.shape == (L, b, H, max_length, max_length)
    # Rows are causal softmax distributions.
    att = out.decoder_attentions
    assert np.allclose(att.sum(-1), 1.0, atol=1e-3)
    iu = np.triu_indices(max_length, k=1)
    assert np.all(att[..., iu[0], iu[1]] < 1e-6)
    assert out.decoder_hidden_states.shape == (L + 1, b, max_length, D)
    # Row 0 is the embedding output, later rows differ from it.
    assert not np.allclose(out.decoder_hidden_states[0],
                           out.decoder_hidden_states[-1])


def test_decoder_attentions_selection(tiny_model):
    cfg = tiny_model.config
    f = _feats(cfg, seed=3)
    sel = ((1, 0), (0, 1))
    out_full = tiny_model.generate(f, language="en", max_length=12,
                                   return_decoder_attentions=True)
    out_sel = tiny_model.generate(f, language="en", max_length=12,
                                  return_decoder_attentions=sel)
    assert out_sel.decoder_attentions.shape == (2, f.shape[0], 12, 12)
    for i, (l, h) in enumerate(sel):
        np.testing.assert_allclose(out_sel.decoder_attentions[i],
                                   out_full.decoder_attentions[l][:, h],
                                   rtol=1e-5, atol=1e-6)


# ------------------------------- longform capture composition (VERDICT r4 #4)

def _longform_feats(cfg, b=1, windows=2.5, seed=11):
    rng = np.random.default_rng(seed)
    frames = int(cfg.dims.num_frames * windows)
    return rng.normal(
        size=(b, cfg.dims.num_mel_bins, frames)).astype(np.float32)


def test_longform_word_timestamps_monotonic(tiny_model):
    """>1-window input: word times are absolute and non-decreasing across
    windows (VERDICT r4 #4 'done' criterion)."""
    cfg = tiny_model.config
    f = _longform_feats(cfg, b=1, windows=2.5)
    out = tiny_model.generate(
        f, language="en", max_length=24, return_timestamps=True,
        word_timestamps=True, tokenizer=_StubTokenizer())
    assert out.words is not None and len(out.words) == 1
    ws = out.words[0]
    assert len(ws) > 0
    for a, b_ in zip(ws, ws[1:]):
        assert a["start"] <= b_["start"] + 1e-9
    # The seek loop advances at least one full window, so some words must
    # carry offsets beyond the first 30s-equivalent window.
    win_seconds = cfg.dims.max_source_positions * wt.SECONDS_PER_ENC_FRAME
    assert ws[-1]["end"] > win_seconds - 1e-6
    # Words attach to the offset segments.
    assert out.segments is not None
    assert any("words" in seg for segs in out.segments for seg in segs)


def test_token_timestamps_shortform(tiny_model):
    """return_token_timestamps: per-token DTW (start, end) seconds for the
    generated region, no tokenizer needed (HF's return_token_timestamps
    surface; the reference consumes it only in its unreachable shortform
    tail, model.py:1781-1840)."""
    cfg = tiny_model.config
    st = tiny_model.special
    f = _feats(cfg, b=2, seed=9)
    out = tiny_model.generate(f, language="en", max_length=20,
                              return_token_timestamps=True)
    prompt_len = 4
    assert out.token_timestamps is not None and len(out.token_timestamps) == 2
    for i in range(2):
        tt = out.token_timestamps[i]
        gen = out.sequences[i, prompt_len:int(out.lengths[i])]
        assert tt.shape == (len(gen), 2)
        text = np.asarray(gen) < st.eos
        # Text rows: finite, ordered spans inside the live window.
        assert np.isfinite(tt[text]).all()
        starts = tt[text, 0]
        assert (np.diff(starts) >= -1e-9).all()
        assert (tt[text, 1] >= tt[text, 0]).all()
        # Non-text rows (EOS/timestamps) are NaN.
        assert np.isnan(tt[~text]).all()


def test_words_identical_with_shared_token_spans(tiny_model):
    """Requesting words + token timestamps together runs ONE DTW: the shared
    token_spans path must produce the identical word list."""
    f = _feats(tiny_model.config, b=1, seed=21)
    kw = dict(language="en", max_length=24, return_timestamps=True,
              word_timestamps=True, tokenizer=_StubTokenizer())
    solo = tiny_model.generate(f, **kw)
    both = tiny_model.generate(f, return_token_timestamps=True, **kw)
    assert both.words == solo.words
    # And the token spans cover the word spans.
    tt = both.token_timestamps[0]
    for w in both.words[0]:
        assert np.nanmin(tt[:, 0]) <= w["start"] <= np.nanmax(tt[:, 1])


def test_token_timestamps_longform_monotonic(tiny_model):
    """Longform composition: times carry each window's absolute offset."""
    cfg = tiny_model.config
    f = _longform_feats(cfg, b=1, windows=2.5, seed=13)
    out = tiny_model.generate(f, language="en", max_length=24,
                              return_token_timestamps=True)
    tt = out.token_timestamps[0]
    assert tt.shape[0] == int(out.lengths[0])
    starts = tt[np.isfinite(tt[:, 0]), 0]
    assert len(starts) > 0 and (np.diff(starts) >= -1e-9).all()
    win_seconds = cfg.dims.max_source_positions * wt.SECONDS_PER_ENC_FRAME
    assert starts[-1] > win_seconds - 1e-6


def test_longform_scores_and_attention_capture(tiny_model):
    cfg = tiny_model.config
    f = _longform_feats(cfg, b=2, windows=2.2, seed=5)
    sel = ((1, 0),)
    out = tiny_model.generate(
        f, language="en", max_length=20, return_scores="full",
        return_cross_attentions=sel)
    b = 2
    # scores: one row per emitted token, rows are processed log-prob dists.
    assert out.scores.shape[0] == b
    assert out.scores.shape[2] == cfg.dims.vocab_size
    for i in range(b):
        li = int(out.lengths[i])
        for j in range(li):
            row = out.scores[i, j]
            lse = np.log(np.sum(np.exp(row[np.isfinite(row)])))
            assert abs(lse) < 1e-3
            tok = int(out.sequences[i, j])
            assert row[tok] == pytest.approx(
                float(out.token_logprobs[i, j]), abs=2e-2)
        assert np.all(out.scores[i, li:] == 0.0)
    # cross_attentions: per-example list of per-window dicts with increasing
    # time offsets and (N_sel, T_w, S) maps.
    assert isinstance(out.cross_attentions, list) and \
        len(out.cross_attentions) == b
    for caps in out.cross_attentions:
        assert len(caps) >= 2
        offs = [c["time_offset"] for c in caps]
        assert offs == sorted(offs) and offs[0] == 0.0
        for c in caps:
            m = c["cross_attentions"]
            assert m.shape[0] == 1 and \
                m.shape[-1] == cfg.dims.max_source_positions


def test_longform_hidden_state_capture(tiny_model):
    cfg = tiny_model.config
    f = _longform_feats(cfg, b=1, windows=2.2, seed=6)
    out = tiny_model.generate(f, language="en", max_length=16,
                              return_hidden_states=True)
    caps = out.cross_attentions[0]   # capture entries ride this field longform
    assert len(caps) >= 2
    L, D = cfg.dims.decoder_layers, cfg.dims.d_model
    for c in caps:
        assert c["decoder_hidden_states"].shape[0] == L + 1
        assert c["decoder_hidden_states"].shape[-1] == D


# ------------------------------ DTW oracle pins (VERDICT r4 #8)

def _brute_force_min_path(cost):
    """Exhaustive min path sum (0,0)->(n-1,m-1), moves (+1,0),(0,+1),(+1,+1);
    cost counted at every visited cell — the oracle for dtw_path."""
    import functools

    n, m = cost.shape

    @functools.lru_cache(maxsize=None)
    def best(i, j):
        if i == 0 and j == 0:
            return float(cost[0, 0])
        cands = []
        if i > 0 and j > 0:
            cands.append(best(i - 1, j - 1))
        if i > 0:
            cands.append(best(i - 1, j))
        if j > 0:
            cands.append(best(i, j - 1))
        return float(cost[i, j]) + min(cands)

    return best(n - 1, m - 1)


def _path_cost(cost, ti, si):
    # A valid DTW path visits each (text, time) cell once in monotone order.
    cells = list(zip(ti.tolist(), si.tolist()))
    assert cells[0] == (0, 0) and cells[-1] == (cost.shape[0] - 1,
                                                cost.shape[1] - 1)
    for (a, b), (c, d) in zip(cells, cells[1:]):
        assert (c - a, d - b) in ((1, 0), (0, 1), (1, 1))
    return sum(float(cost[i, j]) for i, j in cells)


def test_dtw_fuzz_vs_bruteforce():
    rng = np.random.default_rng(0)
    for trial in range(40):
        n = int(rng.integers(1, 7))
        m = int(rng.integers(1, 8))
        cost = rng.normal(size=(n, m))
        ti, si = wt.dtw_path(cost)
        got = _path_cost(cost, ti, si)
        want = _brute_force_min_path(cost)
        assert got == pytest.approx(want, abs=1e-9), (trial, n, m)


def test_word_times_hand_derived_golden():
    """Hand-derived end-to-end golden: a synthetic block-diagonal attention
    map with a known monotone path + a real byte-level BPE (same machinery as
    the production vocab) pins exact words AND exact start/end times."""
    from whisper_medusa_tpu.data.bpe import WhisperBPETokenizer, bytes_to_unicode

    byte_enc = bytes_to_unicode()
    vocab = {c: i for i, c in enumerate(byte_enc.values())}
    vocab["<|endoftext|>"] = len(vocab)
    tok = WhisperBPETokenizer(vocab, [])
    eos = vocab["<|endoftext|>"]
    # " hi yo" -> byte-level ids; every byte is one token here.
    ids = tok.encode(" hi yo")
    assert len(ids) == 6        # " ", "h", "i", " ", "y", "o"
    num_frames = 12
    # Token t owns exactly frames [2t, 2t+2): maps put all mass there, so
    # after z-normalization + median filter (width 1 disables it) the DTW
    # diagonal runs through the blocks and token t starts at frame 2t.
    t_gen = len(ids) + 1        # + EOS row (dropped by words_with_times)
    maps = np.full((2, t_gen, num_frames), 0.01)
    for t in range(len(ids)):
        maps[:, t, 2 * t: 2 * t + 2] = 5.0
    maps[:, -1, -2:] = 5.0      # EOS row attends to the tail
    words = wt.words_with_times(
        list(ids) + [eos], maps, tok, num_frames=num_frames, eos_id=eos,
        timestamp_begin=eos + 1, filter_width=1)
    assert [w["word"] for w in words] == [" hi", " yo"]
    # " hi" = tokens 0..2 -> frames [0, 6); " yo" = tokens 3..5 -> [6, 12).
    # 0.02 s per frame (SECONDS_PER_ENC_FRAME).
    assert words[0]["start"] == pytest.approx(0.00, abs=1e-9)
    assert words[0]["end"] == pytest.approx(0.12, abs=1e-9)
    assert words[1]["start"] == pytest.approx(0.12, abs=1e-9)
    assert words[1]["end"] == pytest.approx(0.24, abs=1e-9)
