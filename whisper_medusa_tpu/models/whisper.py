"""TPU-native Whisper backbone: pure-functional JAX encoder/decoder.

Replaces the reference's dependency on HF ``WhisperForConditionalGeneration``
(reference: whisper_medusa/models/model.py:46-131 wraps it;
the actual torch compute lives in ``transformers.models.whisper.modeling_whisper``).

Design (TPU-first, not a port):
  * Params are plain pytrees (nested dicts of ``jnp`` arrays).  All transformer layers
    are **stacked along a leading layer axis** and executed with ``lax.scan`` — one
    compiled layer body instead of 32 unrolled ones (fast compiles, clean KV-cache
    layout, and a natural axis for pipeline sharding).
  * All shapes are static.  The decoder has two entry points:
      - :func:`decode_train`  — full teacher-forced pass (training / scoring).
      - :func:`decode_step`   — incremental pass over a fixed-size token chunk against
        a pre-allocated KV cache, with **per-example write offsets** so a whole batch
        can sit at different decode lengths (the reference is hard-limited to batch 1,
        model.py:1451; here batching is native).
  * The KV cache is a fixed-size slab updated with ``lax.dynamic_update_slice``
    (replaces HF ``DynamicCache`` concat-per-step, reference model.py:378-402).
  * Cross-attention K/V are computed once per utterance at cache init
    (reference recomputes lazily inside HF's attention each step).
  * Matmuls accumulate in float32 (``preferred_element_type``); layernorm/softmax run
    in float32 regardless of the activation dtype (bf16 on TPU).
"""

from __future__ import annotations

import dataclasses
import functools
import math
import os
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from whisper_medusa_tpu.config import WhisperDims
from whisper_medusa_tpu.ops import gelu as gelu_mod

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Initialization
# ---------------------------------------------------------------------------

def sinusoidal_positions(length: int, channels: int) -> jnp.ndarray:
    """Whisper's fixed sinusoidal encoder positional embedding."""
    log_timescale_increment = math.log(10000.0) / (channels // 2 - 1)
    inv_timescales = jnp.exp(
        -log_timescale_increment * jnp.arange(channels // 2, dtype=jnp.float32)
    )
    scaled_time = (
        jnp.arange(length, dtype=jnp.float32)[:, None] * inv_timescales[None, :]
    )
    return jnp.concatenate([jnp.sin(scaled_time), jnp.cos(scaled_time)], axis=1)


def _dense_init(key, shape, std=0.02, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype) * std


def init_whisper_params(
    rng: jax.Array, dims: WhisperDims, dtype=jnp.float32
) -> Params:
    """Randomly initialize a Whisper parameter pytree (HF-compatible structure)."""
    d, ffn_e, ffn_d = dims.d_model, dims.encoder_ffn_dim, dims.decoder_ffn_dim
    le, ld = dims.encoder_layers, dims.decoder_layers
    keys = iter(jax.random.split(rng, 64))

    def attn_block(nl, d_in=d):
        return {
            "q_w": _dense_init(next(keys), (nl, d_in, d), dtype=dtype),
            "q_b": jnp.zeros((nl, d), dtype),
            "k_w": _dense_init(next(keys), (nl, d_in, d), dtype=dtype),
            "v_w": _dense_init(next(keys), (nl, d_in, d), dtype=dtype),
            "v_b": jnp.zeros((nl, d), dtype),
            "o_w": _dense_init(next(keys), (nl, d, d), dtype=dtype),
            "o_b": jnp.zeros((nl, d), dtype),
        }

    def ln(nl):
        return {"scale": jnp.ones((nl, d), dtype), "bias": jnp.zeros((nl, d), dtype)}

    enc_layers = {
        "self_ln": ln(le),
        "self": attn_block(le),
        "ffn_ln": ln(le),
        "fc1_w": _dense_init(next(keys), (le, d, ffn_e), dtype=dtype),
        "fc1_b": jnp.zeros((le, ffn_e), dtype),
        "fc2_w": _dense_init(next(keys), (le, ffn_e, d), dtype=dtype),
        "fc2_b": jnp.zeros((le, d), dtype),
    }
    dec_layers = {
        "self_ln": ln(ld),
        "self": attn_block(ld),
        "cross_ln": ln(ld),
        "cross": attn_block(ld),
        "ffn_ln": ln(ld),
        "fc1_w": _dense_init(next(keys), (ld, d, ffn_d), dtype=dtype),
        "fc1_b": jnp.zeros((ld, ffn_d), dtype),
        "fc2_w": _dense_init(next(keys), (ld, ffn_d, d), dtype=dtype),
        "fc2_b": jnp.zeros((ld, d), dtype),
    }
    params = {
        "encoder": {
            "conv1_w": _dense_init(next(keys), (3, dims.num_mel_bins, d), dtype=dtype),
            "conv1_b": jnp.zeros((d,), dtype),
            "conv2_w": _dense_init(next(keys), (3, d, d), dtype=dtype),
            "conv2_b": jnp.zeros((d,), dtype),
            "pos_embed": sinusoidal_positions(dims.max_source_positions, d).astype(dtype),
            "layers": enc_layers,
            "ln_post": {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
        },
        "decoder": {
            "embed_tokens": _dense_init(next(keys), (dims.vocab_size, d), dtype=dtype),
            "pos_embed": _dense_init(next(keys), (dims.max_target_positions, d), dtype=dtype),
            "layers": dec_layers,
            "ln_post": {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
        },
    }
    return params


# ---------------------------------------------------------------------------
# Primitive blocks
# ---------------------------------------------------------------------------

def layer_norm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray) -> jnp.ndarray:
    """LayerNorm with float32 statistics (bf16-safe)."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * lax.rsqrt(var + 1e-5)
    return (y * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(dtype)


def dense(x, w, b=None):
    """Dense matmul with f32 accumulation.

    ``w`` may be a plain (K, N) array or a weight-only int8 quantized dict
    ``{"q": int8 (K, N), "s": f32 (N,)}`` (see ops/qmm.py) — the serving mode that
    halves decode HBM traffic."""
    if isinstance(w, dict):
        from whisper_medusa_tpu.ops import qmm as qmm_mod

        k = w["q"].shape[0]
        x2 = x.reshape(-1, k)
        if qmm_mod.use_pallas_qmm():
            y = qmm_mod.qmm(x2, w["q"], w["s"])
        else:
            y = qmm_mod.qmm_ref(x2, w["q"], w["s"])
        y = y.reshape(*x.shape[:-1], y.shape[-1])
    else:
        y = jnp.dot(x, w, preferred_element_type=jnp.float32)
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(x.dtype)


def embed_lookup(embed, tokens: jnp.ndarray) -> jnp.ndarray:
    """Token-embedding gather; supports the int8-quantized tied embedding."""
    if isinstance(embed, dict):
        rows = embed["q"][tokens].astype(jnp.bfloat16)
        return rows * embed["s"][tokens][..., None].astype(jnp.bfloat16)
    return embed[tokens]


def _split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """(..., T, D) -> (..., T, H, Dh)"""
    return x.reshape(*x.shape[:-1], num_heads, x.shape[-1] // num_heads)


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    """(..., T, H, Dh) -> (..., T, D)"""
    return x.reshape(*x.shape[:-2], x.shape[-2] * x.shape[-1])


def attention(
    q: jnp.ndarray,      # (B, Tq, H, Dh), already scaled
    k: jnp.ndarray,      # (B, Tk, H, Dh)
    v: jnp.ndarray,      # (B, Tk, H, Dh)
    mask: Optional[jnp.ndarray] = None,  # broadcastable to (B, H, Tq, Tk); True=keep
) -> jnp.ndarray:
    """Plain XLA attention with float32 softmax.  Returns (B, Tq, H, Dh)."""
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    )
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.float32(-1e30))
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(v.dtype)


def _proj_bhsd(x: jnp.ndarray, w, b, num_heads: int) -> jnp.ndarray:
    """Project (B, S, Din) straight into head-major (B, H, S, Dh).

    The layout change is folded into the projection's dot_general (no standalone
    transpose op) — this is what makes the custom attention kernel a net win
    over XLA where the round-1 stock-flash integration lost (ROADMAP r1 #3)."""
    d_out = w.shape[1]
    hd = d_out // num_heads
    w3 = w.reshape(w.shape[0], num_heads, hd)
    y = jnp.einsum("bsd,dhe->bhse", x, w3, preferred_element_type=jnp.float32)
    if b is not None:
        y = y + b.reshape(num_heads, hd)[None, :, None, :].astype(jnp.float32)
    return y.astype(x.dtype)


def _out_proj_bhsd(out: jnp.ndarray, w, b, num_heads: int) -> jnp.ndarray:
    """(B, H, S, Dh) @ o_w -> (B, S, D), layout folded into the matmul."""
    d = w.shape[1]
    w3 = w.reshape(num_heads, w.shape[0] // num_heads, d)
    y = jnp.einsum("bhse,hed->bsd", out, w3, preferred_element_type=jnp.float32)
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(out.dtype)


def self_attn_full(lp: Params, x: jnp.ndarray, num_heads: int, causal: bool,
                   kv_len: Optional[int] = None) -> jnp.ndarray:
    """Full-sequence self-attention (encoder, or teacher-forced decoder).

    ``kv_len``: number of real (unpadded) positions when ``x`` is padded to a
    kernel-aligned length (see :func:`encode`); None = all positions real.
    """
    from whisper_medusa_tpu.ops import attention as attn_mod

    head_dim = x.shape[-1] // num_heads
    if isinstance(lp["q_w"], dict):
        # int8 serving path (decoder-only): dense() handles quantized weights.
        q = _split_heads(dense(x, lp["q_w"], lp["q_b"]), num_heads) * (head_dim ** -0.5)
        k = _split_heads(dense(x, lp["k_w"]), num_heads)
        v = _split_heads(dense(x, lp["v_w"], lp["v_b"]), num_heads)
        mask = None
        if causal:
            t = q.shape[-3]
            mask = jnp.tril(jnp.ones((t, t), jnp.bool_))[None, None]
        return dense(_merge_heads(attention(q, k, v, mask)),
                     lp["o_w"], lp["o_b"])
    q = _proj_bhsd(x, lp["q_w"], lp["q_b"], num_heads) * (head_dim ** -0.5)
    k = _proj_bhsd(x, lp["k_w"], None, num_heads)
    v = _proj_bhsd(x, lp["v_w"], lp["v_b"], num_heads)
    out = attn_mod.full_attention_bhsd(q, k, v, kv_len=kv_len, causal=causal)
    return _out_proj_bhsd(out, lp["o_w"], lp["o_b"], num_heads)


def cross_attn_full(lp: Params, x: jnp.ndarray, enc: jnp.ndarray,
                    num_heads: int,
                    kv_len: Optional[int] = None) -> jnp.ndarray:
    """Full cross-attention (teacher-forced decoder).

    ``kv_len``: real encoder positions when ``enc`` is pre-padded to the
    Pallas kernel's 256-key alignment (see :func:`pad_enc_for_cross`) — the
    rectangular (T queries x S_pad keys) kernel then keeps the probability
    matrix out of HBM in BOTH directions (round 5; was the last
    probs-in-HBM site in training, VERDICT r4 #2).
    """
    from whisper_medusa_tpu.ops import attention as attn_mod

    head_dim = x.shape[-1] // num_heads
    if isinstance(lp["q_w"], dict):
        q = _split_heads(dense(x, lp["q_w"], lp["q_b"]), num_heads) * (head_dim ** -0.5)
        k = _split_heads(dense(enc, lp["k_w"]), num_heads)
        v = _split_heads(dense(enc, lp["v_w"], lp["v_b"]), num_heads)
        return dense(_merge_heads(attention(q, k, v)), lp["o_w"], lp["o_b"])
    q = _proj_bhsd(x, lp["q_w"], lp["q_b"], num_heads) * (head_dim ** -0.5)
    k = _proj_bhsd(enc, lp["k_w"], None, num_heads)
    v = _proj_bhsd(enc, lp["v_w"], lp["v_b"], num_heads)
    out = attn_mod.full_attention_bhsd(q, k, v, kv_len=kv_len, causal=False)
    return _out_proj_bhsd(out, lp["o_w"], lp["o_b"], num_heads)


def pad_enc_for_cross(enc_out: jnp.ndarray) -> Tuple[jnp.ndarray, Optional[int]]:
    """Pad encoder output once to the cross-attention kernel's 256-key
    alignment (1500 -> 1536 at Whisper dims).  Returns (enc, kv_len) where
    kv_len is None when unpadded (kernel unavailable or already aligned —
    the XLA fallback then masks nothing).  Padding BEFORE the per-layer K/V
    projections costs ~2% extra projection FLOPs and zero copies per layer;
    pad keys are masked via kv_len so real rows never read them."""
    from whisper_medusa_tpu.ops import attention as attn_mod

    s_real = enc_out.shape[1]
    s_pad = attn_mod.pad_to_block(s_real, attn_mod._BLOCK_Q_MIN)
    if s_pad != s_real and attn_mod.kernel_available(s_pad):
        return jnp.pad(enc_out, ((0, 0), (0, s_pad - s_real), (0, 0))), s_real
    return enc_out, None


def cross_attn_probs(lp: Params, x: jnp.ndarray, enc: jnp.ndarray,
                     num_heads: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Cross-attention that also returns the softmax probabilities.

    Returns (out (B, T, D), probs (B, H, T, S) float32).  The probs equal the
    scaled-QK softmax the decode path applies internally — captured for DTW
    word-level alignment (openai-whisper ``find_alignment`` consumes exactly
    these maps; the reference's attention-output plumbing is
    model.py:317-377 ``_update_medusa_outputs``).  Generic dense path so int8
    (dict) weights work too.
    """
    head_dim = x.shape[-1] // num_heads
    q = _split_heads(dense(x, lp["q_w"], lp["q_b"]), num_heads) * (head_dim ** -0.5)
    k = _split_heads(dense(enc, lp["k_w"]), num_heads)
    v = _split_heads(dense(enc, lp["v_w"], lp["v_b"]), num_heads)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    return dense(_merge_heads(out), lp["o_w"], lp["o_b"]), probs


def ffn(lp_prefix: Params, x: jnp.ndarray) -> jnp.ndarray:
    h = dense(x, lp_prefix["fc1_w"], lp_prefix["fc1_b"])
    h = gelu_mod.gelu(h)   # exact erf GELU via cheap polynomial (ops/gelu.py)
    return dense(h, lp_prefix["fc2_w"], lp_prefix["fc2_b"])


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------

def decoder_layer_full(lp: Params, x: jnp.ndarray, enc_out: jnp.ndarray,
                       num_heads: int,
                       enc_kv_len: Optional[int] = None) -> jnp.ndarray:
    """One full-sequence decoder layer (causal self + cross + ffn).

    Used for the medusa-block extra layer and the frozen-teacher replay layer in
    teacher-forced training (reference: model.py:1382-1393, 2062-2073).
    ``enc_kv_len``: real key count when ``enc_out`` is kernel-pad-aligned
    (see :func:`pad_enc_for_cross`)."""
    h = x + self_attn_full(
        lp["self"], layer_norm(x, lp["self_ln"]["scale"], lp["self_ln"]["bias"]),
        num_heads, causal=True)
    h = h + cross_attn_full(
        lp["cross"], layer_norm(h, lp["cross_ln"]["scale"], lp["cross_ln"]["bias"]),
        enc_out, num_heads, kv_len=enc_kv_len)
    h = h + ffn(lp, layer_norm(h, lp["ffn_ln"]["scale"], lp["ffn_ln"]["bias"]))
    return h


def _ckpt_name(x: jnp.ndarray, name: str) -> jnp.ndarray:
    """Tag a value for selective remat policies (no-op outside remat)."""
    from jax.ad_checkpoint import checkpoint_name

    return checkpoint_name(x, name)


def _remat_wrap(layer_fn, remat):
    """Apply a rematerialization policy to a scanned layer body.

    ``remat``: False/None — save everything; True/"full" — recompute the whole
    layer in the backward (min memory, +~1 forward of FLOPs); "dots" — save
    matmul outputs, recompute only the cheap elementwise chain
    (jax.checkpoint_policies.dots_with_no_batch_dims_saveable: the standard
    selective policy — attention score/PV matmuls carry batch dims so they
    recompute, weight projections don't so they're saved); "attn" — save ONLY
    the attention block outputs (tagged ``checkpoint_name("attn_out")`` in
    the layer bodies): the recompute pass then skips re-running the attention
    kernels — the priciest ~40% of an encoder layer's forward — for
    ~32 MB/layer at B=8 (round 5; full-remat's recompute was the train-MFU
    bottleneck, tools/train_profile.py)."""
    if remat in (False, None):
        return layer_fn
    if remat in (True, "full"):
        return jax.checkpoint(layer_fn)
    if remat == "dots":
        return jax.checkpoint(
            layer_fn,
            policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable)
    if remat == "attn":
        return jax.checkpoint(
            layer_fn,
            policy=jax.checkpoint_policies.save_only_these_names("attn_out"))
    raise ValueError(
        f"remat={remat!r}: expected bool, 'full', 'dots' or 'attn'")


def conv1d_stem(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                stride: int) -> jnp.ndarray:
    """k=3, pad=1 1-D convolution as an im2col matmul, followed by GELU.

    ``x``: (B, T, C_in); ``w``: (3, C_in, C_out) in WIO layout (exactly the
    ``lax.conv_general_dilated`` weight this replaces — checkpoints are
    unchanged); ``b``: (C_out,).  Output: (B, ceil(T/stride), C_out).

    Output position t reads padded inputs [stride*t, stride*t+2], i.e. the
    three stride-phased slices of the padded sequence — so the conv is ONE
    (B*T_out, 3*C_in) x (3*C_in, C_out) matmul with f32 accumulation.  XLA's
    TPU conv lowering runs the Whisper stem at 1-6% MFU; this form runs at
    matmul efficiency and is what HF/torch Conv1d computes bit-for-bit (same
    taps, same weights; reference path: model.py:113-129 -> HF
    WhisperEncoder.conv1/conv2).
    """
    t = x.shape[1]
    t_out = -(-t // stride)
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0)))
    taps = [xp[:, w0:w0 + 1 + stride * (t_out - 1) + 1:stride]
            for w0 in range(3)]
    # Slices can overrun by one row when stride=1 (t_out*stride+2 >
    # t_pad for the last tap); jnp slicing clamps, so pad the short tap.
    taps = [jnp.pad(s, ((0, 0), (0, t_out - s.shape[1]), (0, 0)))
            if s.shape[1] < t_out else s[:, :t_out] for s in taps]
    cat = jnp.concatenate(taps, axis=-1)               # (B, T_out, 3*C_in)
    w2 = w.reshape(-1, w.shape[-1])                    # (3*C_in, C_out)
    y = jnp.dot(cat, w2, preferred_element_type=jnp.float32)
    return gelu_mod.gelu((y + b.astype(jnp.float32)).astype(x.dtype))


def encode(params: Params, dims: WhisperDims, mel: jnp.ndarray,
           remat: bool = False) -> jnp.ndarray:
    """Whisper encoder: conv stem + transformer stack.

    mel: (B, num_mel_bins, num_frames)  [HF layout]  ->  (B, max_source_positions, D)

    ``remat=True`` rematerializes each layer in the backward pass (training-time
    memory/FLOPs trade; whisper-large activations otherwise exceed a single chip);
    ``remat="dots"`` saves matmul outputs and recomputes only elementwise ops.

    Replaces the reference's HF ``WhisperEncoder`` call
    (reference: whisper_medusa/models/model.py:113-129 -> HF modeling_whisper).
    """
    enc = params["encoder"]
    x = jnp.swapaxes(mel, 1, 2).astype(enc["conv1_w"].dtype)  # (B, T, mel)
    # Conv stem: k=3 pad=1 stride=1, then k=3 pad=1 stride=2, GELU after each.
    # Expressed as im2col MATMULS, not lax.conv: XLA's TPU conv lowering runs
    # this stem at 1-6% MFU (6.1 ms of the 30 ms B=1 encoder,
    # tools/encoder_profile.py round 5); three shifted slices + one MXU-shaped
    # matmul run the same math at matmul efficiency.
    x = conv1d_stem(x, enc["conv1_w"], enc["conv1_b"], stride=1)
    x = conv1d_stem(x, enc["conv2_w"], enc["conv2_b"], stride=2)
    x = x + enc["pos_embed"][None, : x.shape[1]]

    nh = dims.encoder_attention_heads

    # Pad once to the attention kernel's block alignment (1500 -> 1536) and run
    # the WHOLE stack padded: padded rows are masked as keys inside attention
    # (kv_len) so real rows never read them, and their own garbage is sliced off
    # at the end.  One pad + one slice replaces per-layer segment-id plumbing.
    from whisper_medusa_tpu.ops import attention as attn_mod

    s_real = x.shape[1]
    s_pad = attn_mod.pad_to_block(s_real)
    kv_len = None
    if s_pad != s_real and attn_mod.kernel_available(s_pad):
        x = jnp.pad(x, ((0, 0), (0, s_pad - s_real), (0, 0)))
        kv_len = s_real

    def layer_fn(h, lp):
        a = self_attn_full(lp["self"], layer_norm(h, lp["self_ln"]["scale"], lp["self_ln"]["bias"]), nh, causal=False, kv_len=kv_len)
        h = h + _ckpt_name(a, "attn_out")
        h = h + ffn(lp, layer_norm(h, lp["ffn_ln"]["scale"], lp["ffn_ln"]["bias"]))
        return h, None

    layer_fn = _remat_wrap(layer_fn, remat)
    x, _ = lax.scan(layer_fn, x, enc["layers"])
    if kv_len is not None:
        x = x[:, :s_real]
    x = layer_norm(x, enc["ln_post"]["scale"], enc["ln_post"]["bias"])
    return x


# ---------------------------------------------------------------------------
# Decoder — teacher-forced (training / scoring)
# ---------------------------------------------------------------------------

class DecoderOutput(NamedTuple):
    hidden: jnp.ndarray                 # (B, T, D) after final layer norm
    penultimate: Optional[jnp.ndarray]  # (B, T, D) input to the last decoder layer
    pre_norm: jnp.ndarray               # (B, T, D) before final layer norm
    block_hidden: Optional[jnp.ndarray] = None  # (B, T, D) medusa-block layer output


def decode_train(
    params: Params,
    dims: WhisperDims,
    tokens: jnp.ndarray,            # (B, T) int32
    enc_out: jnp.ndarray,           # (B, S, D)
    collect_penultimate: bool = False,
    remat: bool = False,
    grad_last_only: bool = False,
) -> DecoderOutput:
    """Teacher-forced decoder pass over a full token sequence.

    ``collect_penultimate`` exposes the hidden state entering the last decoder layer,
    needed by the frozen-teacher KL path (reference: model.py:2031-2076 reruns a frozen
    copy of the last decoder layer on ``decoder_hidden_states[-2]``).

    ``grad_last_only`` structurally restricts the backward pass to the LAST
    decoder layer (the reference's ``all_but_last`` freeze policy,
    model.py:148-160): layers 0..L-2 run inside the scan with their output
    stop-gradiented, the last layer runs unscanned on the live slice of the
    stacked params — XLA then never materializes or differentiates the frozen
    prefix.  Emitted gradients are bit-identical to running the full backward
    and masking (frozen-layer grads are exactly zero either way).
    """
    dec = params["decoder"]
    nh = dims.decoder_attention_heads
    t = tokens.shape[1]
    x = embed_lookup(dec["embed_tokens"], tokens) + dec["pos_embed"][None, :t]
    enc_out, enc_kv_len = pad_enc_for_cross(enc_out)

    def layer_body(h, lp):
        a = self_attn_full(lp["self"], layer_norm(h, lp["self_ln"]["scale"], lp["self_ln"]["bias"]), nh, causal=True)
        h = h + _ckpt_name(a, "attn_out")
        c = cross_attn_full(lp["cross"], layer_norm(h, lp["cross_ln"]["scale"], lp["cross_ln"]["bias"]), enc_out, nh, kv_len=enc_kv_len)
        h = h + _ckpt_name(c, "attn_out")
        h = h + ffn(lp, layer_norm(h, lp["ffn_ln"]["scale"], lp["ffn_ln"]["bias"]))
        return h

    if grad_last_only:
        prefix = jax.tree.map(lambda a: a[:-1], dec["layers"])
        last = jax.tree.map(lambda a: a[-1], dec["layers"])
        x, _ = lax.scan(lambda h, lp: (layer_body(h, lp), None), x, prefix)
        penult_h = jax.lax.stop_gradient(x)
        x = layer_body(penult_h, last)
        pre_norm = x
        hidden = layer_norm(x, dec["ln_post"]["scale"], dec["ln_post"]["bias"])
        return DecoderOutput(
            hidden=hidden,
            penultimate=penult_h if collect_penultimate else None,
            pre_norm=pre_norm)

    def layer_fn(h, lp):
        h_in = h
        h = layer_body(h, lp)
        return h, h_in if collect_penultimate else None

    layer_fn = _remat_wrap(layer_fn, remat)
    x, layer_inputs = lax.scan(layer_fn, x, dec["layers"])
    pre_norm = x
    hidden = layer_norm(x, dec["ln_post"]["scale"], dec["ln_post"]["bias"])
    penultimate = None
    if collect_penultimate:
        penultimate = layer_inputs[-1]  # input to last layer == output of layer L-1
    return DecoderOutput(hidden=hidden, penultimate=penultimate, pre_norm=pre_norm)


def self_attn_probs(lp: Params, x: jnp.ndarray,
                    num_heads: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Causal self-attention that also returns the softmax probabilities.

    Returns (out (B, T, D), probs (B, H, T, T) float32) — the decoder
    self-attention maps the reference reassembles into
    ``decoder_attentions`` (model.py:317-377 ``_update_medusa_outputs``).
    Capture-path only (the probs tensor is exactly what the Pallas kernels
    exist to avoid materializing).
    """
    head_dim = x.shape[-1] // num_heads
    q = _split_heads(dense(x, lp["q_w"], lp["q_b"]), num_heads) * (head_dim ** -0.5)
    k = _split_heads(dense(x, lp["k_w"]), num_heads)
    v = _split_heads(dense(x, lp["v_w"], lp["v_b"]), num_heads)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    t = x.shape[1]
    causal = jnp.tril(jnp.ones((t, t), jnp.bool_))[None, None]
    logits = jnp.where(causal, logits, jnp.float32(-1e30))
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    return dense(_merge_heads(out), lp["o_w"], lp["o_b"]), probs


def decode_train_capture(
    params: Params,
    dims: WhisperDims,
    tokens: jnp.ndarray,            # (B, T) int32
    enc_out: jnp.ndarray,           # (B, S, D)
    cross: Optional[Any] = None,    # None | "all" | ((layer, head), ...)
    self_attn: Optional[Any] = None,  # None | "all" | ((layer, head), ...)
    collect_hidden: bool = False,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray], Optional[jnp.ndarray],
           Optional[jnp.ndarray]]:
    """Teacher-forced decoder pass capturing attention maps / hidden states.

    One post-hoc teacher-forced pass over the final sequence reproduces
    exactly the activations the serving loop computed (same weights, same
    inputs), so capture never taxes the decode hot path — the TPU-first
    alternative to the reference hauling per-step attention/hidden-state
    tuples out of generate (model.py:317-377 ``_update_medusa_outputs``,
    which reassembles ``cross_attentions``, ``decoder_attentions`` AND
    ``decoder_hidden_states``).  The layer loop is unrolled (no scan):
    unselected maps die at their layer, selected ones are plain Python list
    entries.

    ``cross`` / ``self_attn``: ``None`` skips capture; ``"all"`` keeps every
    head — (L, B, H, T, S) cross / (L, B, H, T, T) self; a static tuple of
    (layer, head) pairs keeps only those maps — (N_sel, B, T, S) /
    (N_sel, B, T, T) float32 in the given order.  DTW word timestamps consume
    the cross maps (decoding/word_timestamps.py).

    ``collect_hidden``: also return the per-layer hidden-state stack
    (L+1, B, T, D) — row 0 the embedding output, row 1+l layer l's output
    (pre-ln_post, matching HF's ``decoder_hidden_states`` tuple layout).

    Returns (hidden (B, T, D) after ln_post, cross_maps, self_maps, hiddens);
    un-requested captures are None.
    """
    dec = params["decoder"]
    nh = dims.decoder_attention_heads
    t = tokens.shape[1]
    x = embed_lookup(dec["embed_tokens"], tokens) + dec["pos_embed"][None, :t]

    def want_map(sel):
        want: Dict[int, list] = {}
        if sel is not None and sel != "all":
            for i, (l, h) in enumerate(sel):
                want.setdefault(int(l), []).append((i, int(h)))
        return want

    c_want, s_want = want_map(cross), want_map(self_attn)
    c_sel: list = [None] * (0 if cross in (None, "all") else len(cross))
    s_sel: list = [None] * (0 if self_attn in (None, "all") else len(self_attn))
    c_all: list = []
    s_all: list = []
    hiddens: list = [x] if collect_hidden else []

    for l in range(dims.decoder_layers):
        lp = jax.tree.map(lambda a, _l=l: a[_l], dec["layers"])
        ln_x = layer_norm(x, lp["self_ln"]["scale"], lp["self_ln"]["bias"])
        if self_attn == "all" or l in s_want:
            s_out, s_probs = self_attn_probs(lp["self"], ln_x, nh)
            if self_attn == "all":
                s_all.append(s_probs)
            else:
                for i, hd in s_want[l]:
                    s_sel[i] = s_probs[:, hd]
        else:
            s_out = self_attn_full(lp["self"], ln_x, nh, causal=True)
        h = x + s_out
        ln_h = layer_norm(h, lp["cross_ln"]["scale"], lp["cross_ln"]["bias"])
        if cross == "all" or l in c_want:
            c_out, probs = cross_attn_probs(lp["cross"], ln_h, enc_out, nh)
            if cross == "all":
                c_all.append(probs)
            else:
                for i, hd in c_want[l]:
                    c_sel[i] = probs[:, hd]
        else:
            c_out = cross_attn_full(lp["cross"], ln_h, enc_out, nh)
        h = h + c_out
        x = h + ffn(lp, layer_norm(h, lp["ffn_ln"]["scale"],
                                   lp["ffn_ln"]["bias"]))
        if collect_hidden:
            hiddens.append(x)

    hidden = layer_norm(x, dec["ln_post"]["scale"], dec["ln_post"]["bias"])
    cross_maps = (jnp.stack(c_all) if cross == "all"
                  else jnp.stack(c_sel) if c_sel else None)
    self_maps = (jnp.stack(s_all) if self_attn == "all"
                 else jnp.stack(s_sel) if s_sel else None)
    hid = jnp.stack(hiddens) if collect_hidden else None
    return hidden, cross_maps, self_maps, hid


def decode_train_cross_attn(
    params: Params,
    dims: WhisperDims,
    tokens: jnp.ndarray,            # (B, T) int32
    enc_out: jnp.ndarray,           # (B, S, D)
    select: Optional[Tuple[Tuple[int, int], ...]] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Cross-attention-only capture (see :func:`decode_train_capture`).

    ``select``: static tuple of (layer, head) alignment-head pairs — only
    those maps are kept, returned as (N_sel, B, T, S) float32 in the given
    order.  ``None`` keeps every head: (L, B, H, T, S) — debug/tiny-model use
    only at large dims.  Returns (hidden after ln_post, maps).
    """
    hidden, maps, _, _ = decode_train_capture(
        params, dims, tokens, enc_out,
        cross="all" if select is None else select)
    return hidden, maps


def project_logits(params: Params, hidden: jnp.ndarray) -> jnp.ndarray:
    """Vocab projection through the tied embedding matrix, float32 accumulation.

    The reference hits HF ``proj_out`` (tied to the token embedding) per head
    (model.py:1277); here the projection is a single MXU-friendly matmul and callers
    batch heads into the leading dims.
    """
    w = params["decoder"]["embed_tokens"]
    if isinstance(w, dict):
        from whisper_medusa_tpu.ops import qmm as qmm_mod

        h2 = hidden.reshape(-1, hidden.shape[-1])
        if qmm_mod.use_pallas_qmm():
            y = qmm_mod.qmm_nt(h2, w["q"], w["s"])
        else:
            y = qmm_mod.qmm_nt_ref(h2, w["q"], w["s"])
        return y.reshape(*hidden.shape[:-1], y.shape[-1])
    from whisper_medusa_tpu.ops import logits as logits_mod

    m = 1
    for s in hidden.shape[:-1]:
        m *= s
    if logits_mod.kernel_available(m, w.shape[0], w.shape[1]):
        return logits_mod.project_logits_stream(hidden, w)
    return jnp.dot(hidden, w.T, preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# Decoder — incremental with static KV cache
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass
class KVCache:
    """Pre-allocated decoder cache.

    self_k/self_v: (L, B, max_len, D) — written incrementally at per-example
    offsets, stored HEAD-FLAT: the fused decode kernel streams (S, D) slabs
    and slices heads on the lane axis, and a (S, H, Dh) layout would force a
    tiled-layout copy of both slabs EVERY decode step at the kernel boundary
    (profiler-measured ~0.26 ms/step — the reshape between (.., H, Dh) tiles
    padded to (24, 128) and flat (.., 1280) is physical).  The scan path
    splits heads per layer instead (one small per-layer reshape).
    cross_k: (L, B, H, Dh, S_pad) — computed once at init, **head-major** so
    each head's matrix is contiguous and the per-step cross-attention matvec
    streams at full HBM bandwidth (the (S, H, Dh) layout strided across heads
    and ran ~3x off the roofline).  cross_v: (L, B, S_pad, D) **head-flat**:
    a head-major (.., S_pad, Dh=64) V would pad its 64-lane minor dim to 128
    in the tiled HBM layout, doubling the V stream's bytes every decode step
    (~126 MB/step at large-v2 bf16); the flat layout is unpadded and the
    kernels slice each head's 64 lanes from the (S_pad, D) block.
    S may be padded to the decode kernel's lane alignment; the real length is
    ``dims.max_source_positions`` (masked inside attention).

    Replaces HF ``EncoderDecoderCache``/legacy 4-tuples and the per-step concat
    "cache surgery" of the reference (model.py:378-402) with fixed-slot writes.
    """

    self_k: jnp.ndarray
    self_v: jnp.ndarray
    cross_k: jnp.ndarray
    cross_v: jnp.ndarray
    # int8 serving mode: cross K/V stored int8 with per-(head, position) f32
    # scales (L, B, H, S_pad).  Dequant rides the attention math — scores are
    # scaled by k-scales after the QK matmul, probabilities by v-scales before
    # the PV matmul — so the bf16 cross tensors never exist in HBM (the cross
    # cache is the second-largest per-step stream after the weights).
    cross_k_s: Optional[jnp.ndarray] = None
    cross_v_s: Optional[jnp.ndarray] = None
    # int8 self-KV: the self slabs above become int8 and this (L, B, max_len,
    # SHp) bf16 slab holds their per-(position, head) scales POSITION-MAJOR —
    # lane h is head h's k-scale, lane H + h its v-scale (SHp = 2H rounded up
    # to 8).  Position-major is what lets the fused kernel commit scale rows
    # through the same 8-aligned staging DMA as the slabs; the read side pays
    # one tiny (S, SHp) transpose per (layer, example) instead.
    self_s: Optional[jnp.ndarray] = None

    @property
    def max_len(self) -> int:
        return self.self_k.shape[2]


def init_cache(
    params: Params,
    dims: WhisperDims,
    enc_out: jnp.ndarray,   # (B, S, D)
    max_len: int,
    extra_layers: int = 0,  # extra cache slots (e.g. the medusa block layer)
    self_batch: Optional[int] = None,  # self-cache rows (beam-folded B*K); cross stays B
) -> KVCache:
    """Allocate the self-attn cache and precompute cross-attn K/V for all layers.

    ``self_batch`` decouples the two batch axes for beam search: self K/V are
    per-beam (B*K rows) while cross K/V — beam-invariant — are computed and
    stored once per example (B rows), cutting cross-cache HBM K-fold
    (~1 GB/example saved at large-v2 K=5 bf16)."""
    b, s, d = enc_out.shape
    nh = dims.decoder_attention_heads
    hd = d // nh
    nl = dims.decoder_layers + extra_layers
    dtype = enc_out.dtype
    # 16 rows of slack: the fused megastep kernel commits cache rows with a
    # full-staging-buffer DMA (Mosaic requires sublane-aligned VMEM slices),
    # so a chunk written at offset may touch up to 15 rows past its last real
    # token.  Slots past the requested max_len are never read (masked).
    # Rounded up to a sublane multiple: the kernel's prefetch path slices the
    # slab out of HBM manually, and Mosaic requires 8-aligned slice extents.
    max_len = -(-(max_len + 16) // 8) * 8

    layers = params["decoder"]["layers"]
    s_pad = _cross_pad_len(s)

    # int8 serving mode (quantized cross projections) => int8 cross cache:
    # per-(head, position) scales over the Dh axis, computed once per utterance.
    kv_quant = isinstance(layers["cross"]["k_w"], dict)

    def cross_kv(lp_cross):
        k = _split_heads(dense(enc_out, lp_cross["k_w"]), nh)
        k = jnp.transpose(k, (0, 2, 3, 1))      # (B, H, Dh, S)
        v = dense(enc_out, lp_cross["v_w"], lp_cross["v_b"])  # (B, S, D) flat
        if s_pad != s:
            k = jnp.pad(k, ((0, 0), (0, 0), (0, 0), (0, s_pad - s)))
            v = jnp.pad(v, ((0, 0), (0, s_pad - s), (0, 0)))
        if kv_quant:
            k, ks = quantize_kv_rows(k, axis=2)   # scales (B, H, S_pad)
            v, vs = quantize_v_flat(v, nh)        # scales (B, H, S_pad)
            return k, v, ks, vs
        return k, v, None, None

    # lax.map (scan) instead of vmap: the quantized-weight pallas matmul has no
    # batching rule, and this runs once per utterance anyway.
    cross_k, cross_v, ck_s, cv_s = lax.map(cross_kv, layers["cross"])
    if extra_layers:
        cross_k = jnp.pad(cross_k, [(0, extra_layers)] + [(0, 0)] * 4)
        cross_v = jnp.pad(cross_v, [(0, extra_layers)] + [(0, 0)] * 3)
        if kv_quant:
            spad = [(0, extra_layers)] + [(0, 0)] * 3
            ck_s = jnp.pad(ck_s, spad)
            cv_s = jnp.pad(cv_s, spad)
    sb = self_batch if self_batch is not None else b
    # int8 self-KV slabs ride the int8 serving mode (WM_INT8_SELF_KV=0 opts
    # out): the last bf16 decode-time stream disappears — committed rows are
    # quantized per (position, head) by the decode kernels, scales live in
    # the position-major self_s slab.
    skv_quant = kv_quant and os.environ.get("WM_INT8_SELF_KV", "1") != "0"
    if skv_quant:
        # Lanes pad to 128: Mosaic requires 128-aligned lane extents on the
        # staging DMA, and the HBM tiled layout pads the minor dim to 128
        # physically anyway — the logical padding costs nothing extra.
        shp = -(-2 * nh // 128) * 128
        return KVCache(
            self_k=jnp.zeros((nl, sb, max_len, d), jnp.int8),
            self_v=jnp.zeros((nl, sb, max_len, d), jnp.int8),
            cross_k=cross_k,
            cross_v=cross_v,
            cross_k_s=ck_s,
            cross_v_s=cv_s,
            self_s=jnp.ones((nl, sb, max_len, shp), jnp.bfloat16),
        )
    return KVCache(
        self_k=jnp.zeros((nl, sb, max_len, d), dtype),
        self_v=jnp.zeros((nl, sb, max_len, d), dtype),
        cross_k=cross_k,
        cross_v=cross_v,
        cross_k_s=ck_s,
        cross_v_s=cv_s,
    )


def quantize_kv_rows(x: jnp.ndarray, axis: int):
    """Symmetric int8 quantization along ``axis`` (the head-dim axis of a
    cross K/V tensor); returns (int8 tensor, f32 scales with axis removed)."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=axis, keepdims=True)
    scale = jnp.where(amax == 0, 1.0, amax / 127.0)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale),
                 -127, 127).astype(jnp.int8)
    return q, jnp.squeeze(scale, axis=axis)


def quantize_v_flat(v: jnp.ndarray, num_heads: int):
    """int8-quantize a head-flat (B, S, D) cross-V with one scale per
    (position, head) 64-lane chunk; scales returned (B, H, S) to match the
    kernels' prob-scaling interface."""
    b, s, d = v.shape
    dh = d // num_heads
    v32 = v.astype(jnp.float32).reshape(b, s, num_heads, dh)
    amax = jnp.max(jnp.abs(v32), axis=-1, keepdims=True)
    scale = jnp.where(amax == 0, 1.0, amax / 127.0)
    q = jnp.clip(jnp.round(v32 / scale), -127, 127).astype(jnp.int8)
    return (q.reshape(b, s, d),
            jnp.transpose(scale[..., 0], (0, 2, 1)))   # (B, H, S)


def _cross_pad_len(s: int) -> int:
    """Cross-cache sequence length — deliberately UNpadded by default.

    The whole-stack megastep kernel handles the raw 1500-key length directly;
    padding to 1536 was measured slightly *slower* on v5e (the extra 2.4% of
    cross-cache bytes cost more than the lane alignment saved).  Kept as a
    function so the choice is documented at the one place a pad would go.
    Exception: the kernel's cross-prefetch mode slices the cross cache out of
    HBM manually, and Mosaic requires 128-aligned lane extents there — both
    attention paths mask padded keys (cross_len), so the pad is inert."""
    from whisper_medusa_tpu.ops import megastep

    if megastep._prefetch_cross():
        return -(-s // 128) * 128
    return s


def set_block_cross_kv(cache: KVCache, block_params: Params,
                       enc_out: jnp.ndarray, num_heads: int) -> KVCache:
    """Fill the last cache layer's cross K/V from the medusa-block layer params."""
    s = enc_out.shape[1]
    s_pad = cache.cross_k.shape[4]
    k = _split_heads(dense(enc_out, block_params["cross"]["k_w"]), num_heads)
    k = jnp.transpose(k, (0, 2, 3, 1))
    v = dense(enc_out, block_params["cross"]["v_w"],
              block_params["cross"]["v_b"])          # (B, S, D) head-flat
    if s_pad != s:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, 0), (0, s_pad - s)))
        v = jnp.pad(v, ((0, 0), (0, s_pad - s), (0, 0)))
    if cache.cross_k_s is not None:
        k, ks = quantize_kv_rows(k, axis=2)
        v, vs = quantize_v_flat(v, num_heads)
        return dataclasses.replace(
            cache,
            cross_k=cache.cross_k.at[-1].set(k),
            cross_v=cache.cross_v.at[-1].set(v),
            cross_k_s=cache.cross_k_s.at[-1].set(ks),
            cross_v_s=cache.cross_v_s.at[-1].set(vs),
        )
    return dataclasses.replace(
        cache,
        cross_k=cache.cross_k.at[-1].set(k),
        cross_v=cache.cross_v.at[-1].set(v),
    )


def _write_cache_chunk(buf: jnp.ndarray, new: jnp.ndarray,
                       offsets: jnp.ndarray) -> jnp.ndarray:
    """Write (B, T, D) `new` into (B, max_len, D) `buf` at per-example offsets."""
    def write_one(buf_b, new_b, off_b):
        return lax.dynamic_update_slice(
            buf_b, new_b, (off_b,) + (0,) * (buf_b.ndim - 1))
    return jax.vmap(write_one)(buf, new, offsets)


def quantize_self_rows(x: jnp.ndarray, num_heads: int):
    """Per-(position, head) symmetric int8 quantization of head-flat (B, T, D)
    self-K/V rows; returns (int8 rows, f32 scales (B, T, H)).  The exact math
    the fused megastep kernel applies when committing into int8 slabs."""
    b, t, d = x.shape
    dh = d // num_heads
    x32 = x.astype(jnp.float32).reshape(b, t, num_heads, dh)
    amax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
    sc = jnp.maximum(amax, 1e-30) / 127.0
    q = jnp.clip(jnp.round(x32 / sc), -127, 127).astype(jnp.int8)
    return q.reshape(b, t, d), sc[..., 0]


def _dequant_self(buf: jnp.ndarray, scales: jnp.ndarray,
                  num_heads: int) -> jnp.ndarray:
    """(B, S, D) int8 slab x (B, S, H) scales -> bf16 head-flat slab."""
    b, s, d = buf.shape
    dh = d // num_heads
    x = buf.astype(jnp.float32).reshape(b, s, num_heads, dh)
    return (x * scales[..., None].astype(jnp.float32)
            ).reshape(b, s, d).astype(jnp.bfloat16)


def decoder_layer_step(
    lp: Params,
    h: jnp.ndarray,            # (B, T, D) current hidden
    k_buf: jnp.ndarray,        # (B, max_len, D) head-flat cache slab, this layer
    v_buf: jnp.ndarray,
    cross_k: jnp.ndarray,      # (B, H, Dh, S_pad) head-major
    cross_v: jnp.ndarray,      # (B, S_pad, D) head-flat
    offsets: jnp.ndarray,      # (B,) int32 — first cache slot for this chunk
    self_mask: jnp.ndarray,    # (B, 1, T, max_len) bool
    num_heads: int,
    cross_beam: int = 1,       # h rows = cross rows * cross_beam (dedup'd beams)
    cross_len: Optional[int] = None,  # real cross keys (pad masked); None = all
    cross_k_s: Optional[jnp.ndarray] = None,  # (B, H, S_pad) int8-mode scales
    cross_v_s: Optional[jnp.ndarray] = None,
    self_s: Optional[jnp.ndarray] = None,     # (B, S, SHp) int8-self-KV scales
                                              # (position-major; KVCache.self_s)
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray]]:
    """One decoder layer over a chunk of T new tokens with cache update.

    With ``cross_beam=K`` the hidden batch is beam-folded (B*K rows) while
    cross K/V are stored once per example (B rows); queries are reshaped to
    (B, K*T) for the — beam-invariant — cross attention.

    Returns (new_hidden, new_k_buf, new_v_buf, new_self_s | None).
    """
    from whisper_medusa_tpu.ops import decode_ops

    head_dim = h.shape[-1] // num_heads
    # Self attention.  The cache slab is head-flat (B, S, D) — see KVCache —
    # so new rows are written unsplit and heads split per layer for the
    # attention einsum (a small per-layer reshape; the flat layout is what
    # keeps the fused kernel path copy-free at the pallas boundary).
    sx = layer_norm(h, lp["self_ln"]["scale"], lp["self_ln"]["bias"])
    q = _split_heads(dense(sx, lp["self"]["q_w"], lp["self"]["q_b"]), num_heads)
    q = q * (head_dim ** -0.5)
    k_flat = dense(sx, lp["self"]["k_w"])
    v_flat = dense(sx, lp["self"]["v_w"], lp["self"]["v_b"])
    if k_buf.dtype == jnp.int8:
        # int8 self-KV (mirrors the fused kernel's semantics exactly): the
        # slabs store rows quantized per (position, head); attention reads
        # history dequantized but this chunk's own rows fresh bf16 — only
        # PAST rows carry quantization error.
        kq, ksc = quantize_self_rows(k_flat, num_heads)
        vq, vsc = quantize_self_rows(v_flat, num_heads)
        shp = self_s.shape[-1]
        sc_new = jnp.concatenate([ksc, vsc], axis=-1)
        if shp > 2 * num_heads:
            sc_new = jnp.pad(
                sc_new, ((0, 0), (0, 0), (0, shp - 2 * num_heads)))
        k_buf = _write_cache_chunk(k_buf, kq, offsets)
        v_buf = _write_cache_chunk(v_buf, vq, offsets)
        self_s = _write_cache_chunk(self_s, sc_new.astype(self_s.dtype),
                                    offsets)
        k_att = _write_cache_chunk(
            _dequant_self(k_buf, self_s[..., :num_heads], num_heads),
            k_flat.astype(jnp.bfloat16), offsets)
        v_att = _write_cache_chunk(
            _dequant_self(v_buf, self_s[..., num_heads:2 * num_heads],
                          num_heads),
            v_flat.astype(jnp.bfloat16), offsets)
    else:
        k_buf = _write_cache_chunk(k_buf, k_flat, offsets)
        v_buf = _write_cache_chunk(v_buf, v_flat, offsets)
        k_att, v_att = k_buf, v_buf
    attn_out = attention(q, _split_heads(k_att, num_heads),
                         _split_heads(v_att, num_heads), self_mask)
    h = h + dense(_merge_heads(attn_out), lp["self"]["o_w"], lp["self"]["o_b"])
    # Cross attention (K/V precomputed: K head-major, V head-flat).
    cx = layer_norm(h, lp["cross_ln"]["scale"], lp["cross_ln"]["bias"])
    cq = _split_heads(dense(cx, lp["cross"]["q_w"], lp["cross"]["q_b"]), num_heads)
    cq = cq * (head_dim ** -0.5)
    bk, t = cq.shape[0], cq.shape[1]
    if cross_beam > 1:
        cq = cq.reshape(bk // cross_beam, cross_beam * t, *cq.shape[2:])
    cqh = jnp.swapaxes(cq, 1, 2)                       # (B, H, T', Dh)
    kv_len = cross_len if cross_len is not None else cross_k.shape[3]
    out = decode_ops.cross_attention_decode(cqh, cross_k, cross_v, kv_len,
                                            cross_k_s, cross_v_s)
    cross_out = jnp.swapaxes(out, 1, 2)
    if cross_beam > 1:
        cross_out = cross_out.reshape(bk, t, *cross_out.shape[2:])
    h = h + dense(_merge_heads(cross_out), lp["cross"]["o_w"], lp["cross"]["o_b"])
    # FFN.
    fx = layer_norm(h, lp["ffn_ln"]["scale"], lp["ffn_ln"]["bias"])
    if isinstance(lp["fc1_w"], dict):
        h = h + ffn(lp, fx)
    else:
        h = h + decode_ops.ffn_decode(fx, lp["fc1_w"], lp["fc1_b"],
                                      lp["fc2_w"], lp["fc2_b"])
    return h, k_buf, v_buf, self_s


def make_step_mask(
    offsets: jnp.ndarray,        # (B,)
    chunk_len: int,
    max_len: int,
    chunk_mask: Optional[jnp.ndarray] = None,  # (T, T) bool; None -> causal chain
) -> jnp.ndarray:
    """Build the (B, 1, T, max_len) self-attention mask for a decode chunk.

    A key slot j is visible to query i of example b iff:
      * j < offsets[b]                       (committed history), or
      * j - offsets[b] in [0, T) and chunk_mask[i, j - offsets[b]]
        (intra-chunk tree/causal structure).
    Slots at/after offsets[b]+T are stale scratch and always masked.
    """
    if chunk_mask is None:
        chunk_mask = jnp.tril(jnp.ones((chunk_len, chunk_len), jnp.bool_))
    key_pos = lax.broadcasted_iota(jnp.int32, (1, 1, 1, max_len), 3)
    off = offsets[:, None, None, None]
    hist = key_pos < off
    rel = key_pos - off                                    # (B,1,1,max_len)
    in_chunk = (rel >= 0) & (rel < chunk_len)
    rel_c = jnp.clip(rel, 0, chunk_len - 1)
    # chunk_mask lookup: (T, T)[query, rel]  — broadcast query dim.
    q_idx = lax.broadcasted_iota(jnp.int32, (1, 1, chunk_len, 1), 2)
    intra = chunk_mask[q_idx, rel_c] & in_chunk
    return hist | intra


def extend_layers_with_block(dec_layers: Params, block_params: Params) -> Params:
    """Stack the medusa block layer onto the decoder layer stack as layer L.

    Feeds the fused megastep kernel, which runs the block layer as one more
    grid layer (its cache/cross slots already live at index L — init_cache
    extra_layers=1).  One concatenation per tree leaf: callers compute this
    OUTSIDE the decode while_loop (speculative_generate does) so the copies
    happen once per generate call, not per step."""
    return jax.tree.map(
        lambda a, b: jnp.concatenate([a, b[None]], axis=0),
        dec_layers, block_params,
        is_leaf=lambda x: not isinstance(x, dict))


def _serving_mesh_axes() -> Tuple[int, int]:
    """(dp, tp) sizes of the ambient mesh (``jax.set_mesh``, the context
    ``WhisperMedusaModel.shard()`` serves under) using the standard axis
    names; (1, 1) when no mesh is active.  Readable at trace time — this is
    what lets :func:`decode_step` pick the right kernel strategy per mesh."""
    try:
        am = jax.sharding.get_abstract_mesh()
    except Exception:                                    # pragma: no cover
        return 1, 1
    if am is None or am.empty:
        return 1, 1
    from whisper_medusa_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

    shape = dict(am.shape)
    return int(shape.get(DATA_AXIS, 1)), int(shape.get(MODEL_AXIS, 1))


def _shard_fused_over_data(fused_call, dp: int):
    """Wrap a ``fused_decoder_layers`` call in ``shard_map`` over the data
    axis: each device runs the (GSPMD-opaque) pallas kernel on its local
    B/dp examples — weights replicated, batch and cache slabs split.  This
    is serving's natural multi-chip layout (whisper-large fits one chip;
    chips multiply throughput, not capacity)."""
    from jax.sharding import PartitionSpec as P

    from whisper_medusa_tpu.parallel.mesh import DATA_AXIS

    def wrapped(dec_layers, x, self_k, self_v, cross_k, cross_v, offset,
                chunk_bias, cross_k_s=None, cross_v_s=None, self_s=None,
                ln_post=None):
        d = P(DATA_AXIS)                      # batch-leading arrays
        ld = P(None, DATA_AXIS)               # (L, B, ...) cache slabs
        r = P()                               # replicated (weights, bias)
        args = (dec_layers, x, self_k, self_v, cross_k, cross_v, offset,
                chunk_bias, cross_k_s, cross_v_s, self_s, ln_post)
        in_specs = (r, d, ld, ld, ld, ld, d, r,
                    None if cross_k_s is None else ld,
                    None if cross_v_s is None else ld,
                    None if self_s is None else ld,
                    r if ln_post is not None else None)
        has_block = ln_post is not None
        has_ss = self_s is not None
        out_specs = (d, d if has_block else None, ld, ld,
                     ld if has_ss else None)

        def inner(dl, x_, sk, sv, ck, cv, off, cb, cks, cvs, ss, lnp):
            return fused_call(dl, x_, sk, sv, ck, cv, off, cb,
                              cross_k_s=cks, cross_v_s=cvs, self_s=ss,
                              ln_post=lnp)

        return jax.shard_map(inner, in_specs=in_specs, out_specs=out_specs,
                             check_vma=False)(*args)

    return wrapped


def decode_step(
    params: Params,
    dims: WhisperDims,
    tokens: jnp.ndarray,          # (B, T) int32 chunk of new tokens
    cache: KVCache,
    offsets: jnp.ndarray,         # (B,) int32 current committed length per example
    rel_positions: Optional[jnp.ndarray] = None,  # (T,) tree position ids; None=iota
    chunk_mask: Optional[jnp.ndarray] = None,     # (T, T) ancestor mask; None=causal
    block_params: Optional[Params] = None,        # medusa block layer (uses last cache slot)
    cross_beam: int = 1,                          # beams per shared cross-KV row
    fused_block_layers: Optional[Params] = None,  # extend_layers_with_block output
) -> Tuple[DecoderOutput, KVCache]:
    """Incremental decoder pass over T new tokens.

    This one function subsumes the reference's per-step forward *and* tree
    verification forward (reference: model.py:639-648 and medusa_utils.py:461-523):
    the chain/tree structure is expressed through ``rel_positions``/``chunk_mask``.
    """
    dec = params["decoder"]
    nh = dims.decoder_attention_heads
    b, t = tokens.shape

    if rel_positions is None:
        rel_positions = jnp.arange(t, dtype=jnp.int32)
    abs_pos = offsets[:, None] + rel_positions[None, :]             # (B, T)
    abs_pos = jnp.clip(abs_pos, 0, dims.max_target_positions - 1)
    x = embed_lookup(dec["embed_tokens"], tokens) + dec["pos_embed"][abs_pos]

    nl = dims.decoder_layers

    cross_len = min(dims.max_source_positions, cache.cross_k.shape[4])

    from whisper_medusa_tpu.ops import megastep

    # Mesh-aware kernel gating (the fused kernel is a single pallas_call —
    # opaque to GSPMD, so it must either run per-shard or not at all):
    #   * model/TP axis active  -> XLA scan path (GSPMD shards the einsums
    #     and inserts the psums; handing TP-sharded weight slabs to
    #     pallas_call would silently all-gather them every step);
    #   * data/DP axis active   -> shard_map the kernel over the batch so
    #     each device runs it on its local examples (serving's natural
    #     multi-chip layout — weights replicated, batch split);
    #   * no mesh               -> plain single-device call.
    dp, tp = _serving_mesh_axes()
    b_shard = b // dp if (dp > 1 and b % dp == 0) else b
    mesh_ok = tp == 1 and (dp == 1 or b % dp == 0)

    want_block = block_params is not None
    if want_block and fused_block_layers is not None \
            and cache.self_k.shape[0] == nl + 1:
        fused_layers = fused_block_layers
        fused_shape_ok = True
    else:
        fused_layers = dec["layers"]
        fused_shape_ok = not want_block and cache.self_k.shape[0] == nl
    if fused_shape_ok and mesh_ok and megastep.available(
            fused_layers, dims.d_model, nh, b_shard, t, want_block,
            cross_beam):
        cm = chunk_mask if chunk_mask is not None else jnp.tril(
            jnp.ones((t, t), jnp.bool_))
        cbias = jnp.where(cm, jnp.float32(0), jnp.float32(-1e30))
        fused_call = functools.partial(
            megastep.fused_decoder_layers, cross_len=cross_len, num_heads=nh)
        if dp > 1:
            fused_call = _shard_fused_over_data(fused_call, dp)
        pre_norm, block_hidden, self_k, self_v, self_s = fused_call(
            fused_layers, x, cache.self_k, cache.self_v,
            cache.cross_k, cache.cross_v, offsets, cbias,
            cross_k_s=cache.cross_k_s, cross_v_s=cache.cross_v_s,
            self_s=cache.self_s,
            ln_post=dec["ln_post"] if want_block else None)
        hidden = layer_norm(pre_norm, dec["ln_post"]["scale"],
                            dec["ln_post"]["bias"])
        new_cache = dataclasses.replace(
            cache, self_k=self_k, self_v=self_v,
            self_s=self_s if self_s is not None else cache.self_s)
        return DecoderOutput(hidden=hidden, penultimate=None,
                             pre_norm=pre_norm,
                             block_hidden=block_hidden), new_cache

    self_mask = make_step_mask(offsets, t, cache.max_len, chunk_mask)
    kv_quant = cache.cross_k_s is not None
    skv_quant = cache.self_s is not None

    def layer_fn(h, xs):
        lp, k_buf, v_buf, s_buf, ck, cv, ck_s, cv_s = xs
        h, k_buf, v_buf, s_buf = decoder_layer_step(
            lp, h, k_buf, v_buf, ck, cv, offsets, self_mask, nh,
            cross_beam=cross_beam, cross_len=cross_len,
            cross_k_s=ck_s, cross_v_s=cv_s, self_s=s_buf,
        )
        return h, (k_buf, v_buf, s_buf)

    xs = (
        dec["layers"],
        cache.self_k[:nl], cache.self_v[:nl],
        cache.self_s[:nl] if skv_quant else None,
        cache.cross_k[:nl], cache.cross_v[:nl],
        cache.cross_k_s[:nl] if kv_quant else None,
        cache.cross_v_s[:nl] if kv_quant else None,
    )
    x, (new_k, new_v, new_s) = lax.scan(layer_fn, x, xs)
    pre_norm = x
    hidden = layer_norm(x, dec["ln_post"]["scale"], dec["ln_post"]["bias"])

    if cache.self_k.shape[0] > nl:
        self_k = cache.self_k.at[:nl].set(new_k)
        self_v = cache.self_v.at[:nl].set(new_v)
        self_s = cache.self_s.at[:nl].set(new_s) if skv_quant else None
    else:
        self_k, self_v = new_k, new_v
        self_s = new_s
    new_cache = dataclasses.replace(cache, self_k=self_k, self_v=self_v,
                                    self_s=self_s)

    block_hidden = None
    if block_params is not None:
        # Medusa-block extra decoder layer operating on the post-norm hidden state,
        # with its own cache slot (reference: model.py:1349-1417).
        bh, bk, bv, bs = decoder_layer_step(
            block_params, hidden,
            new_cache.self_k[-1], new_cache.self_v[-1],
            new_cache.cross_k[-1], new_cache.cross_v[-1],
            offsets, self_mask, nh, cross_beam=cross_beam,
            cross_len=cross_len,
            cross_k_s=new_cache.cross_k_s[-1] if kv_quant else None,
            cross_v_s=new_cache.cross_v_s[-1] if kv_quant else None,
            self_s=new_cache.self_s[-1] if skv_quant else None,
        )
        new_cache = dataclasses.replace(
            new_cache,
            self_k=new_cache.self_k.at[-1].set(bk),
            self_v=new_cache.self_v.at[-1].set(bv),
            self_s=(new_cache.self_s.at[-1].set(bs)
                    if skv_quant else new_cache.self_s),
        )
        block_hidden = bh

    out = DecoderOutput(hidden=hidden, penultimate=None, pre_norm=pre_norm,
                        block_hidden=block_hidden)
    return out, new_cache
