"""Metrics, dataset/collator, and trainer-loop tests."""

import os
import wave

import numpy as np
import pytest

from whisper_medusa_tpu.data import dataset as ds_mod
from whisper_medusa_tpu.data.tokenizer import CharTokenizer
from whisper_medusa_tpu.utils import metrics


def test_wer_known_values():
    wer, per = metrics.compute_wer(["the cat sat"], ["the cat sat"])
    assert wer == 0.0 and per == [0.0]
    # 1 sub out of 3 words.
    wer, _ = metrics.compute_wer(["the dog sat"], ["the cat sat"])
    assert abs(wer - 1 / 3) < 1e-9
    # insertion + deletion accounting.
    wer, _ = metrics.compute_wer(["the cat"], ["the cat sat"])
    assert abs(wer - 1 / 3) < 1e-9
    wer, _ = metrics.compute_wer(["the big cat sat"], ["the cat sat"])
    assert abs(wer - 1 / 3) < 1e-9


def test_wer_normalization():
    # Case, punctuation, contractions, bracketed non-words.
    wer, _ = metrics.compute_wer(["He won't go! [noise]"], ["he will not go"])
    assert wer == 0.0
    # Empty strings -> EMPTY sentinel (reference metrics.py:23-26).
    wer, _ = metrics.compute_wer([""], [""])
    assert wer == 0.0


def test_cer_known_values():
    cer, _ = metrics.compute_cer(["abcd"], ["abcf"])
    assert abs(cer - 0.25) < 1e-9


def test_edit_ops_counts():
    h, s, d, i = metrics.edit_ops(list("kitten"), list("sitting"))
    assert (s, d, i) == (2, 0, 1)  # classic kitten->sitting distance 3


def _write_wav(path, sr=8000, secs=1.0, stereo=False):
    t = np.arange(int(sr * secs)) / sr
    x = (0.3 * np.sin(2 * np.pi * 440 * t) * 32767).astype(np.int16)
    if stereo:
        x = np.stack([x, x], -1)
    with wave.open(str(path), "wb") as w:
        w.setnchannels(2 if stereo else 1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(x.tobytes())


def test_wav_load_resample(tmp_path):
    p = tmp_path / "a.wav"
    _write_wav(p, sr=8000, stereo=True)
    x, sr = ds_mod.load_wav(str(p))
    assert sr == 8000 and x.ndim == 1
    y = ds_mod.resample(x, sr, 16000)
    assert abs(len(y) - 2 * len(x)) <= 2
    assert np.abs(y).max() < 1.0


def test_dataset_and_collator(tmp_path):
    import pandas as pd

    wavs = []
    for i in range(3):
        p = tmp_path / f"{i}.wav"
        _write_wav(p, sr=16000, secs=0.5)
        wavs.append(str(p))
    csv = tmp_path / "data.csv"
    pd.DataFrame({
        "audio": wavs,
        "sentence": ["hello world", "foo bar", "baz"],
        "language": ["en", "en", "de"],
    }).to_csv(csv, index=False)

    tok = CharTokenizer()
    ds = ds_mod.get_dataset(str(csv), tok)
    assert len(ds) == 3
    item = ds[0]
    assert item["audio"].shape == (480000,)
    # label structure: [lang, task, notimestamps, ...text, eos]
    assert item["labels"][0] == 50259 and item["labels"][-1] == 50257

    coll = ds_mod.SpeechCollator(max_label_length=32)
    batch = coll([ds[i] for i in range(3)])
    assert batch["input_features"].shape == (3, 80, 3000)
    assert batch["labels"].shape == (3, 32)
    assert (batch["labels"] == -100).any()


def test_char_tokenizer_roundtrip():
    tok = CharTokenizer()
    s = "Hello, World 123!"
    assert tok.decode(tok.encode(s)) == s


def test_trainer_loop_with_checkpoint_resume(tmp_path):
    """End-to-end trainer: loss logging, eval, orbax save, resume."""
    import jax

    from whisper_medusa_tpu.config import tiny_test_config
    from whisper_medusa_tpu.models import medusa as medusa_mod
    from whisper_medusa_tpu.models import whisper
    from whisper_medusa_tpu.training.trainer import MedusaTrainer, TrainingArgs

    cfg = tiny_test_config(medusa_num_heads=2)
    r1, r2 = jax.random.split(jax.random.PRNGKey(0))
    wp = whisper.init_whisper_params(r1, cfg.dims)
    mp = medusa_mod.init_medusa_params(r2, cfg.dims, cfg.medusa, wp)
    params = {"whisper": wp, "medusa": mp}

    rng = np.random.default_rng(0)

    def batch_iter():
        while True:
            yield {
                "input_features": rng.normal(
                    size=(2, cfg.dims.num_mel_bins, cfg.dims.num_frames)
                ).astype(np.float32),
                "labels": rng.integers(6, cfg.dims.vocab_size, size=(2, 8)),
            }

    args = TrainingArgs(output_dir=str(tmp_path), max_steps=4, eval_steps=2,
                        save_steps=2, eval_batches=1, lr=1e-3, optim="adamw",
                        warmup_steps=0, load_best_model_at_end=False,
                        parts_to_freeze="whisper")
    tr = MedusaTrainer(cfg, params, args, batch_iter(), eval_iter_fn=batch_iter)
    out = tr.train()
    assert out["final_step"] == 4
    assert any("MedusaHead_0_loss" in s for _, s in tr.history)
    assert any("eval_validation_loss" in s for _, s in tr.history)

    # Resume continues from the saved step.
    tr2 = MedusaTrainer(cfg, params, args, batch_iter(), eval_iter_fn=batch_iter)
    assert tr2.restore_checkpoint()
    assert int(tr2.state.step) == 4


def test_native_audio_matches_python(tmp_path):
    """C++ decoder/resampler vs stdlib/scipy path."""
    from whisper_medusa_tpu.data import native

    if not native.available():
        pytest.skip("no native toolchain")
    p = tmp_path / "n.wav"
    _write_wav(p, sr=22050, secs=0.7)
    nat, sr_n = native.load_wav(str(p))
    ref, sr_p = ds_mod._load_wav_py(str(p))
    assert sr_n == sr_p == 22050
    np.testing.assert_allclose(nat, ref, atol=1e-6)

    got = native.resample(nat, 22050, 16000)
    want = ds_mod.resample(ref, 22050, 16000)
    assert abs(len(got) - len(want)) <= 2
    n = min(len(got), len(want))
    # Different windowed-sinc implementations; compare energy + coarse waveform.
    err = np.abs(got[200:n-200] - want[200:n-200]).mean()
    assert err < 0.02, err
