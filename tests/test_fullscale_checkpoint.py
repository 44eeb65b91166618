"""Full-size large-v2 checkpoint load + decode smoke (VERDICT r1 #9).

Builds a random full-size HF whisper-large-v2 + 10-head Medusa state dict with
the reference's exact key layout (reference: model.py:236-246 heads,
265-291 from_pretrained), writes it as a real checkpoint directory
(safetensors + HF-format config.json + generation_config.json), loads it
through ``WhisperMedusaModel.from_pretrained``, and greedy-decodes one segment
— catching memory/layout issues tiny shapes can't (full 51865x1280 embedding,
32 stacked layers, 1500-frame cross cache).

Heavy (~6 GB RAM, minutes of single-core CPU encoder time) — opt-in via
``WM_RUN_SLOW=1``.
"""

import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("WM_RUN_SLOW", "0") != "1",
    reason="full-scale smoke is opt-in: set WM_RUN_SLOW=1")


def _make_large_v2_state_dict(rng, n_medusa_heads=10):
    d, ffn, le, ld, v = 1280, 5120, 32, 32, 51865
    sd = {}

    def t(*shape, scale=0.02):
        return (rng.standard_normal(shape) * scale).astype(np.float16)

    def attn(prefix, k_bias=False):
        sd[f"{prefix}.q_proj.weight"] = t(d, d)
        sd[f"{prefix}.q_proj.bias"] = t(d)
        sd[f"{prefix}.k_proj.weight"] = t(d, d)
        sd[f"{prefix}.v_proj.weight"] = t(d, d)
        sd[f"{prefix}.v_proj.bias"] = t(d)
        sd[f"{prefix}.out_proj.weight"] = t(d, d)
        sd[f"{prefix}.out_proj.bias"] = t(d)

    def ln(prefix):
        sd[f"{prefix}.weight"] = np.ones((d,), np.float16)
        sd[f"{prefix}.bias"] = np.zeros((d,), np.float16)

    p = "whisper_model."
    sd[p + "model.encoder.conv1.weight"] = t(d, 80, 3)
    sd[p + "model.encoder.conv1.bias"] = t(d)
    sd[p + "model.encoder.conv2.weight"] = t(d, d, 3)
    sd[p + "model.encoder.conv2.bias"] = t(d)
    sd[p + "model.encoder.embed_positions.weight"] = t(1500, d)
    for i in range(le):
        lp = p + f"model.encoder.layers.{i}"
        attn(f"{lp}.self_attn")
        ln(f"{lp}.self_attn_layer_norm")
        sd[f"{lp}.fc1.weight"] = t(ffn, d)
        sd[f"{lp}.fc1.bias"] = t(ffn)
        sd[f"{lp}.fc2.weight"] = t(d, ffn)
        sd[f"{lp}.fc2.bias"] = t(d)
        ln(f"{lp}.final_layer_norm")
    ln(p + "model.encoder.layer_norm")
    sd[p + "model.decoder.embed_tokens.weight"] = t(v, d)
    sd[p + "model.decoder.embed_positions.weight"] = t(448, d)
    for i in range(ld):
        lp = p + f"model.decoder.layers.{i}"
        attn(f"{lp}.self_attn")
        ln(f"{lp}.self_attn_layer_norm")
        attn(f"{lp}.encoder_attn")
        ln(f"{lp}.encoder_attn_layer_norm")
        sd[f"{lp}.fc1.weight"] = t(ffn, d)
        sd[f"{lp}.fc1.bias"] = t(ffn)
        sd[f"{lp}.fc2.weight"] = t(d, ffn)
        sd[f"{lp}.fc2.bias"] = t(d)
        ln(f"{lp}.final_layer_norm")
    ln(p + "model.decoder.layer_norm")
    for h in range(n_medusa_heads + 1):        # base_head variant: K+1 heads
        sd[f"medusa_heads.{h}.0.linear.weight"] = np.zeros((d, d), np.float16)
        sd[f"medusa_heads.{h}.0.linear.bias"] = t(d)
    return sd


def test_fullscale_large_v2_load_and_decode(tmp_path):
    from safetensors.numpy import save_file

    from whisper_medusa_tpu.models.api import WhisperMedusaModel

    rng = np.random.default_rng(0)
    sd = _make_large_v2_state_dict(rng)
    ckpt = str(tmp_path / "large-v2-medusa")
    os.makedirs(ckpt)
    save_file(sd, os.path.join(ckpt, "model.safetensors"))
    with open(os.path.join(ckpt, "config.json"), "w") as f:
        json.dump({"vocab_size": 51865, "d_model": 1280,
                   "encoder_layers": 32, "decoder_layers": 32,
                   "medusa_num_heads": 10, "medusa_heads_type": "base_head",
                   "whisper_model_name": "openai/whisper-large-v2"}, f)
    with open(os.path.join(ckpt, "generation_config.json"), "w") as f:
        json.dump({"max_initial_timestamp_index": 50,
                   "no_timestamps_token_id": 50363}, f)
    del sd

    model = WhisperMedusaModel.from_pretrained(ckpt, dtype="bfloat16")
    assert model.params["whisper"]["decoder"]["embed_tokens"].shape == (51865, 1280)
    assert model.params["medusa"]["heads"]["w"].shape == (11, 1, 1280, 1280)
    assert model.generation_config.max_initial_timestamp_index == 50

    feats = rng.standard_normal((1, 80, 3000)).astype(np.float32) * 0.1
    out = model.generate(feats, language="en", max_length=10)
    assert out.sequences.shape[0] == 1
    assert int(out.lengths[0]) > 4                  # prompt + >=1 generated
    assert np.isfinite(out.avg_logprobs).all()

    # int8 serving leg: quantize the loaded checkpoint and decode again so the
    # full-size load->quantize->serve path is exercised each round (VERDICT r2
    # #9 asks for bf16 + int8 at real large-v2 shapes).
    q = model.quantize()
    out8 = q.generate(feats, language="en", max_length=10)
    assert out8.sequences.shape[0] == 1
    assert int(out8.lengths[0]) > 4
