"""Minimal end-to-end example: load (or create) a model and transcribe audio.

With a real checkpoint:
    python examples/transcribe.py --model /path/to/aiola-whisper-medusa-ckpt audio.wav

Without one (smoke test on random weights):
    python examples/transcribe.py --demo
"""

import argparse
import sys

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("audio", nargs="?", help="16 kHz WAV file")
    p.add_argument("--model", help="checkpoint dir (ours or reference format)")
    p.add_argument("--language", default="en")
    p.add_argument("--demo", action="store_true",
                   help="random tiny model + synthetic audio")
    p.add_argument("--timestamps", action="store_true")
    p.add_argument("--stream", action="store_true")
    p.add_argument("--int8", action="store_true",
                   help="int8 weight-only serving mode (halves decode HBM "
                        "traffic; see model.quantize())")
    args = p.parse_args()

    from whisper_medusa_tpu import WhisperMedusaModel, WhisperMedusaProcessor, tiny_test_config

    if args.demo:
        model = WhisperMedusaModel.from_random(
            tiny_test_config(vocab_size=51865, medusa_num_heads=3))
        processor = WhisperMedusaProcessor.from_pretrained(
            "demo", n_mels=model.config.dims.num_mel_bins)
        wav = 0.1 * np.random.default_rng(0).normal(size=16000 * 5).astype(np.float32)
    else:
        if not args.model or not args.audio:
            p.error("--model and audio required (or use --demo)")
        model = WhisperMedusaModel.from_pretrained(args.model, dtype="bfloat16")
        processor = WhisperMedusaProcessor.from_pretrained(args.model,
                                                           language=args.language)
        from whisper_medusa_tpu.data.dataset import load_wav, resample

        wav, sr = load_wav(args.audio)
        wav = resample(wav, sr)

    if args.int8:
        model = model.quantize()

    feats = processor(wav)
    if args.demo:
        # the tiny demo model has a 64-frame window; keep the demo shortform
        feats = np.asarray(feats)[..., : model.config.dims.num_frames]

    if args.stream:
        for tokens, lengths, finished in model.generate_stream(
                feats, language=args.language):
            text = processor.decode(tokens[0, : lengths[0]])
            sys.stdout.write(f"\r{text[:120]}")
            sys.stdout.flush()
        print()
        return

    out = model.generate(feats, language=args.language,
                         return_timestamps=args.timestamps)
    print("tokens:", out.sequences[0, : out.lengths[0]].tolist()[:40], "...")
    print("text:", processor.decode(out.sequences[0, : out.lengths[0]]))
    print(f"mean accept length: {out.mean_accept_length:.2f} "
          f"({out.steps} decoder steps)")
    if args.timestamps:
        for seg in out.segments[0]:
            print(f"  [{seg['start']:.2f} -> {seg['end']}] "
                  f"{processor.decode(seg['tokens'])}")


if __name__ == "__main__":
    main()
