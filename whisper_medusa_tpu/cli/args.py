"""Shared argparse surface mirroring the reference CLI flags
(reference: whisper_medusa/utils/utils.py:100-352 — ~30 flags; the live subset)."""

from __future__ import annotations

import argparse
import os


def str2bool(v: str) -> bool:
    # reference: utils.py str2bool arg type
    if isinstance(v, bool):
        return v
    if v.lower() in ("yes", "true", "t", "y", "1"):
        return True
    if v.lower() in ("no", "false", "f", "n", "0"):
        return False
    raise argparse.ArgumentTypeError("Boolean value expected.")


def str_int_list(v: str):
    # reference: utils.py str_int_list arg type ("1,1,1" or "1 1 1")
    return [int(x) for x in v.replace(",", " ").split()]


def add_model_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--whisper-model-name", default="openai/whisper-large-v2")
    p.add_argument("--whisper-size", default="large-v2",
                   help="preset when training from scratch (tiny/base/.../large-v2)")
    p.add_argument("--medusa-num-heads", type=int, default=10)
    p.add_argument("--medusa-num-layers", type=int, default=1)
    p.add_argument("--medusa-hidden-size", type=int, default=1280)
    p.add_argument("--medusa-heads-type", default="base_head",
                   choices=["base_head", "medusa_block"])
    p.add_argument("--medusa-choices", type=str_int_list, default=[1] * 11)
    p.add_argument("--medusa-loss-on-original", type=str2bool, default=False)
    p.add_argument("--medusa-kl-loss", type=str2bool, default=False)
    p.add_argument("--medusa-kl-weight", type=float, default=0.01)
    p.add_argument("--output-whisper-original", type=str2bool, default=False)
    p.add_argument("--param-dtype", default="float32",
                   choices=["float32", "bfloat16"])


def add_mesh_args(p: argparse.ArgumentParser) -> None:
    """DP/TP device-mesh flags (parallel/mesh.py) — the reference's accelerate DP
    equivalent, surfaced explicitly — plus the multi-process bootstrap
    (parallel/distributed.py; the reference's `accelerate launch` role)."""
    p.add_argument("--dp", type=int, default=0,
                   help="data-parallel mesh size (0 = single device)")
    p.add_argument("--tp", type=int, default=0,
                   help="tensor-parallel mesh size (0 = single device)")
    p.add_argument("--coordinator-address", default=None,
                   help="host:port of process 0 for multi-host runs "
                        "(omit on TPU pods: auto-discovered)")
    p.add_argument("--num-processes", type=int, default=None,
                   help="total process count for multi-host runs")
    p.add_argument("--process-id", type=int, default=None,
                   help="this process's index for multi-host runs")


def maybe_init_distributed(args) -> None:
    """Join the jax.distributed runtime when multi-process flags (or JAX_* env
    vars) are present.  Must run before any JAX backend use."""
    from whisper_medusa_tpu.parallel import distributed

    if (getattr(args, "coordinator_address", None)
            or getattr(args, "num_processes", None)
            or os.environ.get("JAX_COORDINATOR_ADDRESS")):
        distributed.initialize(
            coordinator_address=args.coordinator_address,
            num_processes=args.num_processes,
            process_id=args.process_id)


def make_mesh_from_args(args):
    """Build the (dp, tp) mesh requested by --dp/--tp, or None when unset.

    Multi-process runs get the global mesh (data axis across processes/DCN,
    model axis within each process/ICI)."""
    dp = getattr(args, "dp", 0) or 0
    tp = getattr(args, "tp", 0) or 0
    if dp <= 0 and tp <= 0:
        return None
    import jax

    if jax.process_count() > 1:
        from whisper_medusa_tpu.parallel import distributed

        return distributed.global_mesh(dp=dp or None, tp=tp or None)
    from whisper_medusa_tpu.parallel import mesh as mesh_mod

    return mesh_mod.make_mesh((dp or 1) * (tp or 1), dp=dp or 1, tp=tp or 1)


def add_training_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--train-data-path", required=True)
    p.add_argument("--validation-data-path", required=True)
    p.add_argument("--test-data-path", default=None)
    p.add_argument("--output-path", required=True)
    p.add_argument("--batch-size", type=int, default=2)
    p.add_argument("--gradient-accumulation-steps", type=int, default=1)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--warmup-steps", type=int, default=100)
    p.add_argument("--max-steps", type=int, default=1000)
    p.add_argument("--eval-steps", type=int, default=100)
    p.add_argument("--save-steps", type=int, default=100)
    p.add_argument("--optim", default="adafactor", choices=["adafactor", "adamw"])
    p.add_argument("--lr-scheduler-type", default="linear",
                   choices=["linear", "constant"])
    p.add_argument("--parts-to-freeze", default="whisper",
                   choices=["whisper", "all_but_last", "none"])
    p.add_argument("--max-label-length", type=int, default=224)
    p.add_argument("--resume-from-checkpoint", type=str2bool, default=False)
    p.add_argument("--language", default="en")
    p.add_argument("--tokenizer-path", default=None,
                   help="local HF tokenizer dir; defaults to whisper-model-name")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--wandb-logging", type=str2bool, default=False)
    p.add_argument("--wandb-project", default="whisper-medusa-tpu")
    p.add_argument("--wandb-run-name", default=None)
    p.add_argument("--wandb-resume-id", default=None)
    add_mesh_args(p)


def add_eval_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--model-name", required=True,
                   help="checkpoint directory (ours or reference torch format)")
    p.add_argument("--data-path", required=True)
    p.add_argument("--out-file-path", required=True)
    p.add_argument("--language", default="en")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--max-length", type=int, default=448)
    p.add_argument("--disable-medusa", type=str2bool, default=False,
                   help="vanilla greedy baseline (for speedup measurement)")
    p.add_argument("--regulation-start", type=int, default=140)
    p.add_argument("--regulation-factor", type=float, default=1.0)
    p.add_argument("--tokenizer-path", default=None)
    p.add_argument("--param-dtype", default="bfloat16")
    p.add_argument("--num-beams", type=int, default=1,
                   help=">1 switches to vanilla beam search (beyond reference)")
    p.add_argument("--int8", type=str2bool, default=False,
                   help="int8 weight-only serving mode (model.quantize(): "
                        "decoder weights, tied embedding, and cross-KV cache "
                        "stream from HBM as int8)")
    add_mesh_args(p)
