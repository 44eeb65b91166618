"""Evaluation CLI — WER/CER + the timing the reference lacks.

Mirror of ``python whisper_medusa/eval_whisper_medusa.py --...``
(reference: whisper_medusa/eval_whisper_medusa.py:21-139) with TPU-native upgrades:
batched generation (the reference loops batch-1), tokens/sec, wall-clock speedup vs
the vanilla loop, and mean accept length (collected but never reported in the
reference, model.py:633,705 — SURVEY §5).
"""

from __future__ import annotations

import argparse
import logging
import time

import numpy as np

from whisper_medusa_tpu.cli.args import add_eval_args
from whisper_medusa_tpu.data import dataset as ds_mod
from whisper_medusa_tpu.data.tokenizer import CharTokenizer, load_tokenizer
from whisper_medusa_tpu.models.api import WhisperMedusaModel
from whisper_medusa_tpu.utils import metrics
from whisper_medusa_tpu.utils.logging_utils import set_logger


def evaluate_model(args) -> dict:
    import pandas as pd

    logger = logging.getLogger("whisper_medusa_tpu")
    df = pd.read_csv(args.data_path).fillna("")
    model = WhisperMedusaModel.from_pretrained(args.model_name,
                                               dtype=args.param_dtype)
    if getattr(args, "int8", False):
        model = model.quantize()
        logger.info("int8 weight-only serving mode")
    from whisper_medusa_tpu.cli.args import make_mesh_from_args

    mesh = make_mesh_from_args(args)
    if mesh is not None:
        model.shard(mesh)
        logger.info("sharded over mesh (dp=%d, tp=%d)",
                    mesh.devices.shape[0], mesh.devices.shape[1])
    try:
        tokenizer = load_tokenizer(args.tokenizer_path or args.model_name,
                                   language=args.language)
    except Exception:
        logger.warning("HF tokenizer unavailable; decoding with CharTokenizer")
        tokenizer = CharTokenizer()

    penalty = None
    if args.regulation_factor != 1.0:
        # reference: eval_whisper_medusa.py:53-65
        penalty = (args.regulation_start, args.regulation_factor)

    rows = []
    preds, refs = [], []
    total_tokens = 0
    total_time = 0.0
    total_steps = 0
    total_accept = 0
    records = df.to_dict("records")
    for lo in range(0, len(records), args.batch_size):
        chunk = records[lo: lo + args.batch_size]
        audios = []
        for r in chunk:
            wav, sr = ds_mod.load_wav(r["audio"])
            audios.append(ds_mod.resample(wav, sr))
        from whisper_medusa_tpu.ops import mel as mel_mod
        import jax.numpy as jnp

        batch = np.stack([mel_mod.pad_or_trim(a)[0] for a in audios])
        feats = mel_mod.log_mel_spectrogram(
            jnp.asarray(batch), n_mels=model.config.dims.num_mel_bins)
        langs = [str(r.get("language") or args.language) for r in chunk]
        t0 = time.perf_counter()
        out = model.generate(
            feats, language=langs, max_length=args.max_length,
            disable_medusa=args.disable_medusa,
            exponential_decay_length_penalty=penalty,
            num_beams=getattr(args, "num_beams", 1))
        dt = time.perf_counter() - t0
        total_time += dt
        total_tokens += int(out.lengths.sum()) - 4 * len(chunk)
        total_steps += out.steps
        total_accept += int(out.accepted.sum())

        texts = tokenizer.batch_decode(out.sequences, skip_special_tokens=True)
        for r, text in zip(chunk, texts):
            preds.append(text)
            refs.append(str(r["sentence"]))
            rows.append({"audio": r["audio"], "label": r["sentence"],
                         "prediction": text, "language": r.get("language", "")})
        logger.info("processed %d/%d (%.2fs)", lo + len(chunk), len(records), dt)

    wer, wers = metrics.compute_wer(preds, refs)
    cer, cers = metrics.compute_cer(preds, refs)
    for row, w, c in zip(rows, wers, cers):
        row["wer"], row["cer"] = w, c
    pd.DataFrame(rows).to_csv(args.out_file_path, index=False)

    summary = {
        "wer": wer,
        "cer": cer,
        "tokens_per_second": total_tokens / max(total_time, 1e-9),
        "mean_accept_length": total_accept / max(total_steps, 1),
        "total_wall_clock_s": total_time,
        "utterances": len(records),
    }
    logger.info("eval summary: %s", summary)
    return summary


def main(argv=None):
    parser = argparse.ArgumentParser()
    add_eval_args(parser)
    args = parser.parse_args(argv)
    from whisper_medusa_tpu.cli.args import maybe_init_distributed
    maybe_init_distributed(args)
    set_logger()
    evaluate_model(args)


if __name__ == "__main__":
    main()
