"""Unit tests for the Whisper timestamp grammar (decoding/processors.py),
rule by rule.  Uses a small synthetic vocab layout mirroring the real one:
text tokens < EOS < specials < timestamp region."""

import numpy as np

import jax.numpy as jnp

from whisper_medusa_tpu.decoding.processors import (ProcessorConfig,
                                                    apply_timestamp_rules)

V = 64
EOS = 40
NOTS = 45
TS = 48          # timestamp_begin; tokens 48..63 are timestamps

CFG = ProcessorConfig(vocab_size=V, begin_index=3, eos_token_id=EOS,
                      timestamp_rules=True, timestamp_begin=TS,
                      no_timestamps_id=NOTS, max_initial_timestamp_index=4)


def run(logits, pred_pos, last, penult, max_ts):
    return np.asarray(apply_timestamp_rules(
        jnp.asarray(logits, jnp.float32),
        jnp.asarray([pred_pos]), jnp.asarray([last]), jnp.asarray([penult]),
        jnp.asarray([max_ts]), CFG))[0]


def flat_logits():
    return np.zeros((1, V), np.float32)


def test_notimestamps_always_suppressed():
    out = run(flat_logits(), 5, 1, 2, 0)
    assert out[NOTS] == -np.inf


def test_pair_rule_single_timestamp_forces_ts_or_eos():
    # last token is a timestamp, the one before is text -> text suppressed
    # (and with text gone the sum-prob rule also removes EOS, matching HF).
    out = run(flat_logits(), 6, TS + 2, 1, TS + 2)
    assert (out[:EOS] == -np.inf).all()
    assert out[TS + 2] > -np.inf  # same timestamp may repeat (closing the pair)


def test_pair_rule_double_timestamp_forces_text():
    # last two tokens are timestamps -> further timestamps suppressed.
    out = run(flat_logits(), 7, TS + 3, TS + 2, TS + 3)
    assert (out[TS:] == -np.inf).all()
    assert out[0] > -np.inf


def test_monotonicity_floor():
    # After a closed pair (penult ts, last text...): construct: last text token,
    # running max TS+5 -> timestamps below TS+6... floor = max_ts+1 when the
    # last token did not open a pair.
    out = run(flat_logits(), 9, 1, TS + 5, TS + 5)
    assert (out[TS: TS + 6] == -np.inf).all()
    assert out[TS + 6] > -np.inf


def test_initial_timestamp_cap():
    out = run(flat_logits(), CFG.begin_index, 2, 1, 0)
    assert out[TS + CFG.max_initial_timestamp_index] > -np.inf
    assert (out[TS + CFG.max_initial_timestamp_index + 1:] == -np.inf).all()


def test_sum_probability_forces_timestamp():
    logits = flat_logits()
    logits[0, TS:] = 3.0   # timestamp mass dominates any single text token
    out = run(logits, 8, 1, 2, 0)
    assert (out[:TS] == -np.inf).all()
    assert np.isfinite(out[TS:]).any()


def test_no_constraints_at_begin():
    # No generated history yet: a clearly-dominant text token stays available
    # (flat logits would trip the sum-probability rule, as in HF).
    logits = flat_logits()
    logits[0, 0] = 10.0
    out = run(logits, CFG.begin_index, 2, 1, 0)
    assert out[0] > -np.inf
