"""Medusa draft heads — TPU-native stacked formulation.

Reference semantics (do not port the torch module structure):
  * ``MedusaResBlock``: ``x + SiLU(Linear(x))``, weight zero-initialized so the block
    is (near-)identity at init (reference: whisper_medusa/models/model.py:180-210;
    torch leaves the Linear *bias* at its default uniform init, which we replicate).
  * Linear variant ("base_head"): ``medusa_num_heads + 1`` heads applied to the final
    decoder hidden state; head 0 is a learned re-projection of the *current* position
    and acts as the base head (reference: model.py:235-246, 1274-1284).
  * Block variant ("medusa_block"): one extra decoder layer shared by all heads
    (weights initialized from the last decoder layer), then ``medusa_num_heads`` heads;
    base logits come straight from the frozen Whisper projection
    (reference: model.py:248-256, 1286-1299, 1349-1417).

TPU-first design: all heads live in one stacked tensor ``(n_heads, n_layers, D, D)``
and are applied with a single einsum; the vocab projection over all heads is one
batched matmul against the shared tied embedding (SURVEY §2.2 native-equivalents).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from whisper_medusa_tpu.config import MedusaConfig, WhisperDims

Params = Dict[str, Any]


def init_medusa_params(
    rng: jax.Array,
    dims: WhisperDims,
    medusa: MedusaConfig,
    whisper_params: Optional[Params] = None,
    dtype=jnp.float32,
) -> Params:
    """Initialize medusa head params (and the block layer for the block variant).

    For ``medusa_block``, the extra decoder layer is initialized from the last
    decoder layer of ``whisper_params`` (reference: model.py:253-255).
    """
    d = dims.d_model
    if medusa.medusa_hidden_size != d:
        raise ValueError(
            "medusa_hidden_size must equal d_model for the residual head "
            f"(got {medusa.medusa_hidden_size} vs {d})"
        )
    n_heads = medusa.medusa_num_heads + (1 if medusa.medusa_heads_type == "base_head" else 0)
    nl = medusa.medusa_num_layers
    # Weight zero-init (identity mapping); bias replicates torch.nn.Linear default
    # U(-1/sqrt(d), 1/sqrt(d)) (reference: model.py:194-196).
    bound = 1.0 / (d ** 0.5)
    bias = jax.random.uniform(rng, (n_heads, nl, d), jnp.float32, -bound, bound)
    params: Params = {
        "heads": {
            "w": jnp.zeros((n_heads, nl, d, d), dtype),
            "b": bias.astype(dtype),
        }
    }
    if medusa.medusa_heads_type == "medusa_block":
        if whisper_params is None:
            raise ValueError("medusa_block init requires whisper params")
        last = jax.tree.map(lambda a: a[-1].astype(dtype),
                            whisper_params["decoder"]["layers"])
        params["block"] = last
    if medusa.output_whisper_original:
        # Frozen copy of the last decoder layer for KL-teacher replay
        # (reference: model.py:2018-2029).
        if whisper_params is None:
            raise ValueError("output_whisper_original init requires whisper params")
        params["teacher_layer"] = jax.tree.map(
            lambda a: a[-1].astype(dtype), whisper_params["decoder"]["layers"])
    return params


def apply_heads(medusa_params: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Apply all residual head stacks to ``x``.

    x: (..., D)  ->  (n_heads, ..., D)

    One einsum per res-block layer across every head at once (vs. a Python loop over
    ``nn.Sequential`` heads in the reference, model.py:1275-1280).
    """
    w = medusa_params["heads"]["w"]  # (H, L, D, D) bf16, or the int8 serving
    b = medusa_params["heads"]["b"]  # dict {"q": i8 (H,L,D,D), "s": f32 (H,L,D)}
    quant = isinstance(w, dict)
    wq, ws = (w["q"], w["s"]) if quant else (w, None)
    n_heads, n_layers = wq.shape[:2]
    h = jnp.broadcast_to(x[None], (n_heads,) + x.shape)
    bcast = (n_heads,) + (1,) * (h.ndim - 2) + (-1,)
    for l in range(n_layers):
        wl = wq[:, l].astype(h.dtype) if quant else wq[:, l]
        pre = jnp.einsum("h...d,hde->h...e", h, wl,
                         preferred_element_type=jnp.float32)
        if quant:
            pre = pre * ws[:, l].astype(jnp.float32).reshape(bcast)
        pre = pre + b[:, l].reshape(bcast)
        h = h + jax.nn.silu(pre).astype(h.dtype)
    return h
