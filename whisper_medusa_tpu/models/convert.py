"""HF checkpoint -> JAX pytree weight conversion.

Converts torch state dicts of HF ``WhisperForConditionalGeneration`` and of the
reference's ``WhisperMedusaModel`` checkpoints (reference: whisper_medusa/models/
model.py:213-291 — heads registered as ``medusa_heads.{h}.{l}.linear``, block layer as
``medusa_block.*``, frozen teacher as ``whisper_layer.*``) into this framework's
stacked-layer parameter pytrees.

Works from:
  * an in-memory ``{name: numpy/torch tensor}`` state dict (used by parity tests that
    instantiate a random HF model locally — no network needed), or
  * ``*.safetensors`` / ``pytorch_model.bin`` files in a checkpoint directory.
"""

from __future__ import annotations

import glob
import os
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from whisper_medusa_tpu.config import ModelConfig, WhisperDims

Params = Dict[str, Any]


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().to("cpu")
        if t.dtype.__str__() == "torch.bfloat16":
            t = t.float()
        return t.numpy()
    return np.asarray(t)


def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a checkpoint directory (safetensors preferred, torch .bin fallback)."""
    sd: Dict[str, np.ndarray] = {}
    st_files = sorted(glob.glob(os.path.join(path, "*.safetensors")))
    if st_files:
        from safetensors.numpy import load_file

        for f in st_files:
            sd.update(load_file(f))
        return sd
    bin_files = sorted(glob.glob(os.path.join(path, "*.bin")))
    if bin_files:
        import torch

        for f in bin_files:
            sd.update({k: _np(v) for k, v in torch.load(f, map_location="cpu",
                                                        weights_only=True).items()})
        return sd
    raise FileNotFoundError(f"No .safetensors or .bin checkpoint files in {path}")


def _lin(sd, name):
    """torch Linear weight (out, in) -> (in, out)."""
    return _np(sd[name]).T


def _stack_layers(sd: Dict, prefix: str, n: int, attn_prefixes) -> Params:
    """Stack per-layer HF weights along a leading layer axis."""

    def attn(p):
        return {
            "q_w": np.stack([_lin(sd, f"{prefix}.{i}.{p}.q_proj.weight") for i in range(n)]),
            "q_b": np.stack([_np(sd[f"{prefix}.{i}.{p}.q_proj.bias"]) for i in range(n)]),
            "k_w": np.stack([_lin(sd, f"{prefix}.{i}.{p}.k_proj.weight") for i in range(n)]),
            "v_w": np.stack([_lin(sd, f"{prefix}.{i}.{p}.v_proj.weight") for i in range(n)]),
            "v_b": np.stack([_np(sd[f"{prefix}.{i}.{p}.v_proj.bias"]) for i in range(n)]),
            "o_w": np.stack([_lin(sd, f"{prefix}.{i}.{p}.out_proj.weight") for i in range(n)]),
            "o_b": np.stack([_np(sd[f"{prefix}.{i}.{p}.out_proj.bias"]) for i in range(n)]),
        }

    def ln(p):
        return {
            "scale": np.stack([_np(sd[f"{prefix}.{i}.{p}.weight"]) for i in range(n)]),
            "bias": np.stack([_np(sd[f"{prefix}.{i}.{p}.bias"]) for i in range(n)]),
        }

    out = {
        "self_ln": ln("self_attn_layer_norm"),
        "self": attn("self_attn"),
        "ffn_ln": ln("final_layer_norm"),
        "fc1_w": np.stack([_lin(sd, f"{prefix}.{i}.fc1.weight") for i in range(n)]),
        "fc1_b": np.stack([_np(sd[f"{prefix}.{i}.fc1.bias"]) for i in range(n)]),
        "fc2_w": np.stack([_lin(sd, f"{prefix}.{i}.fc2.weight") for i in range(n)]),
        "fc2_b": np.stack([_np(sd[f"{prefix}.{i}.fc2.bias"]) for i in range(n)]),
    }
    if "cross" in attn_prefixes:
        out["cross_ln"] = ln("encoder_attn_layer_norm")
        out["cross"] = attn("encoder_attn")
    return out


def _single_decoder_layer(sd: Dict, prefix: str) -> Params:
    """Convert one unstacked HF WhisperDecoderLayer (e.g. ``medusa_block``)."""

    def attn(p):
        return {
            "q_w": _lin(sd, f"{prefix}.{p}.q_proj.weight"),
            "q_b": _np(sd[f"{prefix}.{p}.q_proj.bias"]),
            "k_w": _lin(sd, f"{prefix}.{p}.k_proj.weight"),
            "v_w": _lin(sd, f"{prefix}.{p}.v_proj.weight"),
            "v_b": _np(sd[f"{prefix}.{p}.v_proj.bias"]),
            "o_w": _lin(sd, f"{prefix}.{p}.out_proj.weight"),
            "o_b": _np(sd[f"{prefix}.{p}.out_proj.bias"]),
        }

    def ln(p):
        return {"scale": _np(sd[f"{prefix}.{p}.weight"]),
                "bias": _np(sd[f"{prefix}.{p}.bias"])}

    return {
        "self_ln": ln("self_attn_layer_norm"),
        "self": attn("self_attn"),
        "cross_ln": ln("encoder_attn_layer_norm"),
        "cross": attn("encoder_attn"),
        "ffn_ln": ln("final_layer_norm"),
        "fc1_w": _lin(sd, f"{prefix}.fc1.weight"),
        "fc1_b": _np(sd[f"{prefix}.fc1.bias"]),
        "fc2_w": _lin(sd, f"{prefix}.fc2.weight"),
        "fc2_b": _np(sd[f"{prefix}.fc2.bias"]),
    }


def from_hf_whisper(
    state_dict: Dict, dims: WhisperDims, dtype=jnp.float32, prefix: str = ""
) -> Params:
    """Convert an HF WhisperForConditionalGeneration state dict to our pytree."""
    sd = {k[len(prefix):] if prefix and k.startswith(prefix) else k: v
          for k, v in state_dict.items()}
    params = {
        "encoder": {
            # torch Conv1d weight (out, in, k) -> (k, in, out)
            "conv1_w": _np(sd["model.encoder.conv1.weight"]).transpose(2, 1, 0),
            "conv1_b": _np(sd["model.encoder.conv1.bias"]),
            "conv2_w": _np(sd["model.encoder.conv2.weight"]).transpose(2, 1, 0),
            "conv2_b": _np(sd["model.encoder.conv2.bias"]),
            "pos_embed": _np(sd["model.encoder.embed_positions.weight"]),
            "layers": _stack_layers(sd, "model.encoder.layers",
                                    dims.encoder_layers, ()),
            "ln_post": {"scale": _np(sd["model.encoder.layer_norm.weight"]),
                        "bias": _np(sd["model.encoder.layer_norm.bias"])},
        },
        "decoder": {
            "embed_tokens": _np(sd["model.decoder.embed_tokens.weight"]),
            "pos_embed": _np(sd["model.decoder.embed_positions.weight"]),
            "layers": _stack_layers(sd, "model.decoder.layers",
                                    dims.decoder_layers, ("cross",)),
            "ln_post": {"scale": _np(sd["model.decoder.layer_norm.weight"]),
                        "bias": _np(sd["model.decoder.layer_norm.bias"])},
        },
    }
    return jax.tree.map(lambda a: jnp.asarray(a, dtype), params)


def from_medusa_checkpoint(
    state_dict: Dict, config: ModelConfig, dtype=jnp.float32
) -> Params:
    """Convert a reference whisper-medusa checkpoint into ``{whisper, medusa}`` pytrees.

    Reference key layout: backbone under ``whisper_model.``, heads at
    ``medusa_heads.{h}.{l}.linear.{weight,bias}`` (model.py:236-246), block layer at
    ``medusa_block.`` (model.py:248-256), frozen teacher at ``whisper_layer.``
    (model.py:2021-2027).
    """
    whisper = from_hf_whisper(state_dict, config.dims, dtype,
                              prefix="whisper_model.")
    med = config.medusa
    n_heads = med.medusa_num_heads + (1 if med.medusa_heads_type == "base_head" else 0)
    w = np.stack([
        np.stack([
            _lin(state_dict, f"medusa_heads.{h}.{l}.linear.weight")
            for l in range(med.medusa_num_layers)
        ])
        for h in range(n_heads)
    ])
    b = np.stack([
        np.stack([
            _np(state_dict[f"medusa_heads.{h}.{l}.linear.bias"])
            for l in range(med.medusa_num_layers)
        ])
        for h in range(n_heads)
    ])
    medusa: Params = {"heads": {"w": jnp.asarray(w, dtype), "b": jnp.asarray(b, dtype)}}
    if med.medusa_heads_type == "medusa_block":
        medusa["block"] = jax.tree.map(
            lambda a: jnp.asarray(a, dtype),
            _single_decoder_layer(state_dict, "medusa_block"),
        )
    if any(k.startswith("whisper_layer.") for k in state_dict):
        medusa["teacher_layer"] = jax.tree.map(
            lambda a: jnp.asarray(a, dtype),
            _single_decoder_layer(state_dict, "whisper_layer"),
        )
    return {"whisper": whisper, "medusa": medusa}
