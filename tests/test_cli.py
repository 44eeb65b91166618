"""End-to-end CLI smoke tests: train a tiny model from a synthetic CSV, save,
then evaluate the checkpoint (reference workflow: README.md:152-232)."""

import wave

import numpy as np
import pytest


def _write_wav(path, secs=0.4, sr=16000):
    t = np.arange(int(sr * secs)) / sr
    x = (0.25 * np.sin(2 * np.pi * 330 * t) * 32767).astype(np.int16)
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(x.tobytes())


@pytest.fixture(scope="module")
def data_csv(tmp_path_factory):
    import pandas as pd

    d = tmp_path_factory.mktemp("data")
    paths = []
    for i in range(4):
        p = d / f"{i}.wav"
        _write_wav(p)
        paths.append(str(p))
    csv = d / "data.csv"
    pd.DataFrame({
        "audio": paths,
        "sentence": ["hello there", "test one", "two", "three four"],
        "language": ["en"] * 4,
    }).to_csv(csv, index=False)
    return str(csv)


def test_train_then_eval_cli(data_csv, tmp_path):
    from whisper_medusa_tpu.cli import evaluate as eval_cli
    from whisper_medusa_tpu.cli import train as train_cli

    out = str(tmp_path / "run")
    train_cli.main([
        "--train-data-path", data_csv,
        "--validation-data-path", data_csv,
        "--output-path", out,
        "--whisper-model-name", "test-from-scratch",
        "--whisper-size", "tiny",
        "--medusa-num-heads", "3",
        "--medusa-choices", "1,1,1,1",
        "--batch-size", "2",
        "--max-steps", "2",
        "--eval-steps", "2",
        "--save-steps", "2",
        "--max-label-length", "24",
        "--optim", "adamw",
        "--parts-to-freeze", "whisper",
    ])

    results = str(tmp_path / "results.csv")
    summary = eval_cli.evaluate_model(type("A", (), dict(
        model_name=f"{out}/model_components",
        data_path=data_csv,
        out_file_path=results,
        language="en",
        batch_size=2,
        max_length=12,
        disable_medusa=False,
        regulation_start=140,
        regulation_factor=1.0,
        tokenizer_path=None,
        param_dtype="float32",
    )))
    assert 0 <= summary["wer"]
    assert summary["tokens_per_second"] > 0
    import pandas as pd

    df = pd.read_csv(results)
    assert set(df.columns) >= {"audio", "label", "prediction", "wer", "cer"}
    assert len(df) == 4

    # int8 serving mode through the same CLI surface.
    results8 = str(tmp_path / "results_int8.csv")
    summary8 = eval_cli.evaluate_model(type("A", (), dict(
        model_name=f"{out}/model_components",
        data_path=data_csv,
        out_file_path=results8,
        language="en",
        batch_size=2,
        max_length=12,
        disable_medusa=False,
        regulation_start=140,
        regulation_factor=1.0,
        tokenizer_path=None,
        param_dtype="float32",
        int8=True,
    )))
    assert summary8["tokens_per_second"] > 0
