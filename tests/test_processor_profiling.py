"""Processor wrapper + profiling utility smoke tests."""

import numpy as np

from whisper_medusa_tpu.processor import WhisperMedusaProcessor
from whisper_medusa_tpu.utils.profiling import StageTimer, decode_report


def test_processor_features_and_decode():
    proc = WhisperMedusaProcessor.from_pretrained("nonexistent-uses-fallback")
    wav = (0.1 * np.random.default_rng(0).normal(size=16000 * 2)).astype(np.float32)
    feats = np.asarray(proc(wav))
    assert feats.shape == (1, 80, 3000)
    # resampling path
    wav8k = wav[::2]
    feats2 = np.asarray(proc(wav8k, sampling_rate=8000))
    assert feats2.shape == (1, 80, 3000)
    # char tokenizer fallback decode
    ids = proc.tokenizer.encode("hi there")
    assert proc.decode(ids) == "hi there"


def test_stage_timer_and_decode_report():
    t = StageTimer()
    with t.stage("a"):
        sum(range(1000))
    with t.stage("a"):
        pass
    rep = t.report()
    assert rep["a"]["count"] == 2 and rep["a"]["total_s"] >= 0
    r = decode_report(new_tokens=100, steps=25, accepted=75, wall_s=0.5)
    assert r["tokens_per_second"] == 200
    assert r["mean_accept_length"] == 3.0
