"""Reference-checkpoint ingestion: build a torch state dict with the reference's
exact key layout (whisper_medusa checkpoint format), save to disk, load via
from_pretrained, and decode.

This is the migration path for users bringing ``aiola/whisper-medusa-*``
checkpoints (reference: models/model.py:236-246 head keys, 265-291 from_pretrained).
"""

import json

import numpy as np
import pytest

import jax.numpy as jnp


@pytest.fixture(scope="module")
def reference_style_checkpoint(tmp_path_factory):
    torch = pytest.importorskip("torch")
    from transformers import WhisperConfig, WhisperForConditionalGeneration

    d = tmp_path_factory.mktemp("refckpt")
    dims = dict(
        vocab_size=51865, num_mel_bins=16, d_model=48, encoder_layers=2,
        decoder_layers=2, encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=96, decoder_ffn_dim=96, max_source_positions=32,
        max_target_positions=64,
    )
    hf_cfg = WhisperConfig(**dims, attn_implementation="eager")
    torch.manual_seed(0)
    hf = WhisperForConditionalGeneration(hf_cfg).eval()

    n_heads, n_layers = 3, 1
    sd = {}
    for k, v in hf.state_dict().items():
        if k == "proj_out.weight":
            continue  # tied to embed_tokens; real checkpoints omit it too
        sd[f"whisper_model.{k}"] = v.clone()
    for h in range(n_heads + 1):  # base_head variant: heads + time-0 head
        for l in range(n_layers):
            w = torch.zeros(dims["d_model"], dims["d_model"])
            if h == 2:
                w = torch.randn(dims["d_model"], dims["d_model"]) * 0.02
            sd[f"medusa_heads.{h}.{l}.linear.weight"] = w
            sd[f"medusa_heads.{h}.{l}.linear.bias"] = (
                torch.randn(dims["d_model"]) * 0.01)

    from safetensors.torch import save_file

    save_file(sd, str(d / "model.safetensors"))
    config = dict(
        dims,
        medusa_num_heads=n_heads,
        medusa_num_layers=n_layers,
        medusa_hidden_size=dims["d_model"],
        medusa_choices=[1] * (n_heads + 1),
        medusa_heads_type="base_head",
        whisper_model_name="openai/whisper-large-v2",
    )
    with open(d / "config.json", "w") as f:
        json.dump(config, f)
    return str(d), hf, dims


def test_from_pretrained_reference_format(reference_style_checkpoint):
    import torch

    from whisper_medusa_tpu.models.api import WhisperMedusaModel

    path, hf, dims = reference_style_checkpoint
    model = WhisperMedusaModel.from_pretrained(path)
    assert model.config.medusa.medusa_num_heads == 3
    assert model.config.dims.d_model == 48

    # Backbone numerics survive the conversion.
    rng = np.random.default_rng(0)
    mel = rng.normal(size=(1, dims["num_mel_bins"],
                           2 * dims["max_source_positions"])).astype(np.float32)
    with torch.no_grad():
        ref_enc = hf.model.encoder(torch.from_numpy(mel)).last_hidden_state.numpy()
    enc = np.asarray(model.encode(jnp.asarray(mel)))
    np.testing.assert_allclose(enc, ref_enc, atol=2e-3, rtol=2e-2)

    # End-to-end generate runs on the converted checkpoint.
    out = model.generate(jnp.asarray(mel), language="en", max_length=16)
    assert out.sequences.shape[0] == 1


def test_from_pretrained_reference_block_variant(tmp_path):
    """medusa_block-variant reference checkpoints (block layer + frozen teacher
    keys) convert and decode (reference: model.py:248-256, 2018-2029)."""
    torch = pytest.importorskip("torch")
    from transformers import WhisperConfig, WhisperForConditionalGeneration
    from safetensors.torch import save_file

    dims = dict(
        vocab_size=51865, num_mel_bins=16, d_model=48, encoder_layers=2,
        decoder_layers=2, encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=96, decoder_ffn_dim=96, max_source_positions=32,
        max_target_positions=64,
    )
    torch.manual_seed(1)
    hf = WhisperForConditionalGeneration(
        WhisperConfig(**dims, attn_implementation="eager")).eval()
    sd = {}
    for k, v in hf.state_dict().items():
        if k == "proj_out.weight":
            continue
        sd[f"whisper_model.{k}"] = v.clone()
    # Block layer + frozen teacher = copies of the last decoder layer.
    for prefix in ("medusa_block", "whisper_layer"):
        for k, v in hf.model.decoder.layers[-1].state_dict().items():
            sd[f"{prefix}.{k}"] = v.clone()
    n_heads = 2
    for h in range(n_heads):   # block variant: no extra base head
        sd[f"medusa_heads.{h}.0.linear.weight"] = torch.zeros(48, 48)
        sd[f"medusa_heads.{h}.0.linear.bias"] = torch.randn(48) * 0.01

    d = tmp_path / "blockckpt"
    d.mkdir()
    save_file(sd, str(d / "model.safetensors"))
    config = dict(dims, medusa_num_heads=n_heads, medusa_num_layers=1,
                  medusa_hidden_size=48, medusa_choices=[1] * (n_heads + 1),
                  medusa_heads_type="medusa_block",
                  output_whisper_original=True,
                  whisper_model_name="openai/whisper-large-v2")
    with open(d / "config.json", "w") as f:
        json.dump(config, f)

    from whisper_medusa_tpu.models.api import WhisperMedusaModel

    model = WhisperMedusaModel.from_pretrained(str(d))
    assert "block" in model.params["medusa"]
    assert "teacher_layer" in model.params["medusa"]
    rng = np.random.default_rng(0)
    mel = rng.normal(size=(1, 16, 64)).astype(np.float32)
    out = model.generate(jnp.asarray(mel), language="en", max_length=16)
    assert out.sequences.shape[0] == 1
