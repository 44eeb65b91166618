"""Training CLI — mirror of reference ``python whisper_medusa/trainer.py --...``
(reference: whisper_medusa/trainer.py:16-71).

Example:
  python -m whisper_medusa_tpu.cli.train \
      --train-data-path train.csv --validation-data-path val.csv \
      --output-path out --whisper-size tiny --parts-to-freeze whisper
"""

from __future__ import annotations

import argparse
import logging
import os

from whisper_medusa_tpu.cli.args import add_model_args, add_training_args
from whisper_medusa_tpu.config import (MedusaConfig, ModelConfig,
                                       WHISPER_PRESETS)
from whisper_medusa_tpu.data import dataset as ds_mod
from whisper_medusa_tpu.data.tokenizer import CharTokenizer, load_tokenizer
from whisper_medusa_tpu.models.api import WhisperMedusaModel
from whisper_medusa_tpu.training.trainer import MedusaTrainer, TrainingArgs
from whisper_medusa_tpu.utils.logging_utils import (make_wandb_logger, set_logger,
                                                    set_seed)


def get_model(args) -> WhisperMedusaModel:
    """Fresh model unless --whisper-model-name is a local checkpoint dir
    (reference: model.py:2079-2097)."""
    if os.path.exists(args.whisper_model_name):
        return WhisperMedusaModel.from_pretrained(args.whisper_model_name,
                                                  dtype=args.param_dtype)
    dims = WHISPER_PRESETS[args.whisper_size]
    medusa = MedusaConfig(
        medusa_num_heads=args.medusa_num_heads,
        medusa_num_layers=args.medusa_num_layers,
        medusa_hidden_size=dims.d_model,
        medusa_choices=tuple(args.medusa_choices),
        medusa_heads_type=args.medusa_heads_type,
        medusa_loss_on_original=args.medusa_loss_on_original,
        medusa_kl_loss=args.medusa_kl_loss,
        medusa_kl_weight=args.medusa_kl_weight,
        output_whisper_original=args.output_whisper_original,
    )
    config = ModelConfig(dims=dims, medusa=medusa, param_dtype=args.param_dtype,
                         whisper_model_name=args.whisper_model_name)
    return WhisperMedusaModel.from_random(config, seed=args.seed)


def main(argv=None):
    parser = argparse.ArgumentParser()
    add_model_args(parser)
    add_training_args(parser)
    args = parser.parse_args(argv)

    from whisper_medusa_tpu.cli.args import maybe_init_distributed
    maybe_init_distributed(args)
    set_logger()
    set_seed(args.seed)
    model = get_model(args)

    try:
        tokenizer = load_tokenizer(args.tokenizer_path or args.whisper_model_name,
                                   language=args.language)
    except Exception:
        logging.getLogger("whisper_medusa_tpu").warning(
            "HF tokenizer unavailable locally; using CharTokenizer stand-in")
        tokenizer = CharTokenizer()

    collator = ds_mod.SpeechCollator(
        max_label_length=args.max_label_length,
        n_mels=model.config.dims.num_mel_bins)
    train_ds = ds_mod.get_dataset(args.train_data_path, tokenizer)
    val_ds = ds_mod.get_dataset(args.validation_data_path, tokenizer)
    train_iter = ds_mod.batches(train_ds, collator, args.batch_size, seed=args.seed)

    def eval_iter():
        return ds_mod.batches(val_ds, collator, args.batch_size, shuffle=False,
                              drop_last=False)

    targs = TrainingArgs(
        output_dir=args.output_path,
        batch_size=args.batch_size,
        gradient_accumulation_steps=args.gradient_accumulation_steps,
        lr=args.lr, warmup_steps=args.warmup_steps, max_steps=args.max_steps,
        eval_steps=args.eval_steps, save_steps=args.save_steps,
        optim=args.optim, lr_scheduler_type=args.lr_scheduler_type,
        parts_to_freeze=None if args.parts_to_freeze == "none"
        else args.parts_to_freeze,
    )
    log_fn = None
    if args.wandb_logging:
        # reference: utils.py:331-351 wandb init/resume
        log_fn = make_wandb_logger(args.wandb_project, args.wandb_run_name,
                                   config=vars(args),
                                   resume_id=args.wandb_resume_id)
    from whisper_medusa_tpu.cli.args import make_mesh_from_args

    trainer = MedusaTrainer(model.config, model.params, targs, train_iter,
                            eval_iter_fn=eval_iter, log_fn=log_fn,
                            mesh=make_mesh_from_args(args))
    summary = trainer.train(resume_from_checkpoint=args.resume_from_checkpoint)

    # Final artifacts (reference: trainer.py:45-51 model_components dir).
    model.params = trainer.state.params
    out_dir = os.path.join(args.output_path, "model_components")
    model.save_pretrained(out_dir)
    logging.getLogger("whisper_medusa_tpu").info(
        "training done: %s; saved to %s", summary, out_dir)

    if args.test_data_path:
        test_ds = ds_mod.get_dataset(args.test_data_path, tokenizer)
        trainer.eval_iter_fn = lambda: ds_mod.batches(
            test_ds, collator, args.batch_size, shuffle=False, drop_last=False)
        test_loss = trainer.evaluate()
        logging.getLogger("whisper_medusa_tpu").info("test loss: %.4f", test_loss)


if __name__ == "__main__":
    main()
