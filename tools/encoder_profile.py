"""Encoder profiler: decompose the encoder's MFU (bench tracks ~40%).

Times the full encoder plus ablations — conv stem alone, attention-only
stack, FFN-only stack, and the XLA-attention variant — so the limiting
stage is measurable instead of guessed.

  python tools/encoder_profile.py b=1
  python tools/encoder_profile.py b=8 which=full,xla
  python tools/encoder_profile.py b=1 which=full trace=/tmp/enc_trace

which= any of: full, xla (WM_ATTENTION_KERNEL=0 subprocess not needed —
uses the module's private XLA path), conv, attn, ffn.
"""

import os
import sys
import time

kw = dict(a.split("=", 1) for a in sys.argv[1:] if "=" in a)

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

for k, v in (("jax_compilation_cache_dir", "/tmp/jax_comp_cache"),
             ("jax_persistent_cache_min_entry_size_bytes", -1),
             ("jax_persistent_cache_min_compile_time_secs", 0.0)):
    try:
        jax.config.update(k, v)
    except Exception:
        pass

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from whisper_medusa_tpu.config import ModelConfig
from whisper_medusa_tpu.models import whisper
from whisper_medusa_tpu.models.whisper import (ffn, layer_norm,
                                               self_attn_full)
from whisper_medusa_tpu.ops import attention as attn_mod


def fetch(out):
    leaves = jax.tree.leaves(out)
    np.asarray(leaves[-1].ravel()[0])
    return np.asarray(leaves[0].ravel()[0])


def timeit(name, fn, *args, steps=10, flops=None):
    """Time ``fn(*args)`` per call with the loop ON DEVICE.

    The axon tunnel costs ~0.3 ms per dispatch plus ~25 ms per fetch; a
    host-side steps=10 loop therefore inflates every ablation by ~3 ms/call
    (round-5 no-op calibration) — which is how the conv stem 'measured'
    6 ms at 1% MFU regardless of implementation.  Chaining the calls in a
    ``fori_loop`` with a negligible scalar data dependency (out[0]*1e-24
    folded into the input) pays ONE dispatch + fetch per group, like the
    decode-path profilers.
    """
    *consts, x = args

    def run(cs, x0):
        def body(i, carry):
            xc, acc = carry
            out = fn(*cs, xc)
            lead = out.ravel()[0]
            eps = (lead.astype(jnp.float32) * 1e-24).astype(x0.dtype)
            return (x0 + eps, acc + lead.astype(jnp.float32))
        return lax.fori_loop(0, steps, body, (x0, jnp.float32(0)))[1]

    # Weights ride as jit ARGUMENTS (embedding them as closed-over literals
    # 413s the axon remote-compile endpoint on 600 MB HLO bodies).
    chained = jax.jit(run)
    fetch(chained(consts, x))
    dts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = chained(consts, x)
        fetch(out)
        dts.append((time.perf_counter() - t0) / steps)
    dt = min(dts)
    mfu = f", MFU {flops / dt / 197e12 * 100:.0f}%" if flops else ""
    print(f"ABLATION {name}: {dt * 1e3:.2f} ms{mfu}", flush=True)
    return dt


def main():
    b = int(kw.get("b", 1))
    steps = int(kw.get("steps", 10))
    which = kw.get("which", "full,xla,conv,attn,ffn").split(",")
    config = ModelConfig(param_dtype="bfloat16", compute_dtype="bfloat16")
    dims = config.dims
    wp = whisper.init_whisper_params(jax.random.PRNGKey(0), dims, jnp.bfloat16)
    jax.block_until_ready(wp)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.normal(size=(b, dims.num_mel_bins, 3000)),
                      jnp.bfloat16)
    enc = wp["encoder"]
    d, f = dims.d_model, dims.encoder_ffn_dim
    nl, s = dims.encoder_layers, dims.max_source_positions
    nh = dims.encoder_attention_heads
    # Per-call FLOPs (matmuls only, the MFU convention bench.py uses).
    fl_ffn = nl * 2 * 2 * b * s * d * f
    fl_proj = nl * 4 * 2 * b * s * d * d
    fl_attn_mm = nl * 2 * 2 * b * s * s * d
    fl_conv = 2 * b * 3000 * 3 * dims.num_mel_bins * d + 2 * b * 1500 * 3 * d * d
    fl_full = fl_ffn + fl_proj + fl_attn_mm + fl_conv

    if "full" in which:
        fn = jax.jit(lambda p, m: whisper.encode(p, dims, m))
        dt = timeit(f"encoder full b={b}", fn, wp, mel, steps=steps,
                    flops=fl_full)
        if kw.get("trace"):
            with jax.profiler.trace(kw["trace"]):
                fetch(fn(wp, mel))
            print(f"trace -> {kw['trace']}")

    x0 = jnp.asarray(rng.normal(size=(b, s, d)) * 0.1, jnp.bfloat16)
    # Attention ablations must mirror whisper.encode's kernel entry: pad the
    # sequence to the Pallas block alignment (1500 -> 1536) and mask the pad
    # as keys via kv_len — an unpadded 1500 fails full_attention_bhsd's
    # s_pad % 256 gate and silently falls back to XLA attention, which would
    # make the attn ablation non-comparable to the 'full' leg (ADVICE r4).
    s_pad = attn_mod.pad_to_block(s)
    kv_len = s if s_pad != s else None
    x0p = jnp.pad(x0, ((0, 0), (0, s_pad - s), (0, 0)))
    # FLOPs in the padded attention matmuls scale by s_pad (queries) x s_pad
    # (keys); masked columns still burn MXU cycles.
    fl_attn_mm_pad = nl * 2 * 2 * b * s_pad * s_pad * d
    fl_proj_pad = nl * 4 * 2 * b * s_pad * d * d

    if "xla" in which:
        # Same stack, forcing the plain-XLA attention path.  Weights are jit
        # ARGUMENTS, not closed-over constants — the axon remote-compile
        # endpoint 413s on HLO bodies that embed 600 MB of literals.
        def stack_xla(layers, x):
            def layer_fn(h, lp):
                q = layer_norm(h, lp["self_ln"]["scale"], lp["self_ln"]["bias"])
                lps = lp["self"]
                qh = whisper._split_heads(whisper.dense(q, lps["q_w"], lps["q_b"]), nh) \
                    * (d // nh) ** -0.5  # whisper.attention expects pre-scaled q
                kh = whisper._split_heads(whisper.dense(q, lps["k_w"], None), nh)
                vh = whisper._split_heads(whisper.dense(q, lps["v_w"], lps["v_b"]), nh)
                a = whisper.attention(qh, kh, vh, None)
                h = h + whisper.dense(whisper._merge_heads(a), lps["o_w"], lps["o_b"])
                h = h + ffn(lp, layer_norm(h, lp["ffn_ln"]["scale"], lp["ffn_ln"]["bias"]))
                return h, None
            x, _ = lax.scan(layer_fn, x, layers)
            return x
        timeit(f"stack xla-attn b={b}", jax.jit(stack_xla), enc["layers"], x0,
               steps=steps, flops=fl_ffn + fl_proj + fl_attn_mm)

    if "conv" in which:
        def conv_stem(m):
            x = jnp.swapaxes(m, 1, 2).astype(jnp.bfloat16)
            x = whisper.conv1d_stem(x, enc["conv1_w"], enc["conv1_b"], 1)
            return whisper.conv1d_stem(x, enc["conv2_w"], enc["conv2_b"], 2)
        timeit(f"conv stem b={b}", jax.jit(conv_stem), mel, steps=steps,
               flops=fl_conv)
    if "convxla" in which:
        # The lax.conv lowering the im2col stem replaced (round-5 A/B).
        def conv_stem_xla(m):
            x = jnp.swapaxes(m, 1, 2).astype(jnp.bfloat16)
            dn = ("NWC", "WIO", "NWC")
            from whisper_medusa_tpu.ops import gelu as gelu_mod
            x = lax.conv_general_dilated(x, enc["conv1_w"], (1,), [(1, 1)],
                                         dimension_numbers=dn)
            x = gelu_mod.gelu(x + enc["conv1_b"])
            x = lax.conv_general_dilated(x, enc["conv2_w"], (2,), [(1, 1)],
                                         dimension_numbers=dn)
            return gelu_mod.gelu(x + enc["conv2_b"])
        timeit(f"conv stem XLA-conv b={b}", jax.jit(conv_stem_xla), mel,
               steps=steps, flops=fl_conv)

    if "attn" in which:
        def stack_attn(layers, x):
            def layer_fn(h, lp):
                h = h + self_attn_full(
                    lp["self"],
                    layer_norm(h, lp["self_ln"]["scale"], lp["self_ln"]["bias"]),
                    nh, causal=False, kv_len=kv_len)
                return h, None
            x, _ = lax.scan(layer_fn, x, layers)
            return x
        timeit(f"stack attn-only b={b}", jax.jit(stack_attn), enc["layers"],
               x0p, steps=steps, flops=fl_proj_pad + fl_attn_mm_pad)

    if "ffn" in which:
        def stack_ffn(layers, x):
            def layer_fn(h, lp):
                h = h + ffn(lp, layer_norm(h, lp["ffn_ln"]["scale"],
                                           lp["ffn_ln"]["bias"]))
                return h, None
            x, _ = lax.scan(layer_fn, x, layers)
            return x
        timeit(f"stack ffn-only b={b}", jax.jit(stack_ffn), enc["layers"],
               x0, steps=steps, flops=fl_ffn)


if __name__ == "__main__":
    main()
