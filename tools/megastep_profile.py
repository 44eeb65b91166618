"""Megastep kernel profiler: chained-loop ms/step + optional device trace.

Times ops/megastep.py::fused_decoder_layers in a 100-step fori_loop (one
device call — the ~25 ms axon-tunnel fetch amortizes to noise) so kernel
changes can be measured without the full speculative engine around them.

  python tools/megastep_profile.py int8
  python tools/megastep_profile.py bf16 skip=self,cross,ffn   # DMA-only
  python tools/megastep_profile.py int8 w8a8=0 trace=/tmp/out # + jax trace

Phase-stub (skip=...) decomposition is how the round-3 int8 investigation
found the kernel fully DMA-bound, and the trace view is what exposed the
~0.26 ms/step tiled-layout reshape copies at the kernel boundary (fixed by
the head-flat KVCache layout).
"""

import os
import sys
import time

kw = dict(a.split("=", 1) for a in sys.argv[2:] if "=" in a)
if "skip" in kw:
    os.environ["WM_MEGASTEP_SKIP"] = kw["skip"]
if "w8a8" in kw:
    os.environ["WM_MEGASTEP_W8A8"] = kw["w8a8"]
if kw.get("path") == "scan":
    # Time the XLA lax.scan decoder path instead of the fused kernel
    # (whole decode_step incl. embedding lookup — a few % of extra work).
    os.environ["WM_MEGASTEP"] = "0"
os.environ.setdefault("WM_MEGASTEP_MAX_B", "8")

import jax
import jax.numpy as jnp
import numpy as np

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
from whisper_medusa_tpu.ops import megastep


def main():
    int8 = (sys.argv[1:] or ["bf16"])[0] == "int8"
    T = int(kw.get("t", 1))
    B = int(kw.get("b", 1))
    steps = int(kw.get("steps", 100))
    config = ModelConfig(param_dtype="bfloat16", compute_dtype="bfloat16")
    dims = config.dims
    wp = whisper.init_whisper_params(jax.random.PRNGKey(0), dims, jnp.bfloat16)
    if int8:
        from whisper_medusa_tpu.ops.qmm import quantize_decoder

        wp, _ = quantize_decoder(wp)
    jax.block_until_ready(wp)
    rng = np.random.default_rng(0)
    enc = jnp.asarray(rng.normal(size=(B, 1500, dims.d_model)), jnp.bfloat16)
    cache = whisper.init_cache(wp, dims, enc, 260)
    nh = dims.decoder_attention_heads

    if kw.get("path") == "scan":
        import dataclasses

        toks0 = jnp.asarray(rng.integers(0, dims.vocab_size, (B, T)), jnp.int32)

        def run(wp, cache, toks0):
            def body(i, carry):
                toks, sk, sv = carry
                c = dataclasses.replace(cache, self_k=sk, self_v=sv)
                out, c = whisper.decode_step(
                    wp, dims, toks, c,
                    jnp.full((B,), 64, jnp.int32) + (i % 8))
                nxt = jnp.argmax(
                    out.hidden[..., :T].astype(jnp.float32), axis=-1
                ).astype(jnp.int32) + toks0  # cheap data dep, no projection
                return (nxt % dims.vocab_size, c.self_k, c.self_v)

            return jax.lax.fori_loop(0, steps, body,
                                     (toks0, cache.self_k, cache.self_v))

        fn = jax.jit(run)
        fargs = (wp, cache, toks0)
        out = fn(*fargs)
    else:
        def run(dec, cache, x0):
            cb = jnp.zeros((T, T), jnp.float32)

            def body(i, carry):
                x, sk, sv, ss = carry
                pre, _, sk, sv, ss = megastep.fused_decoder_layers(
                    dec["layers"], x, sk, sv, cache.cross_k, cache.cross_v,
                    jnp.full((B,), 64, jnp.int32) + (i % 8), cb, 1500, nh,
                    cross_k_s=cache.cross_k_s, cross_v_s=cache.cross_v_s,
                    self_s=ss)
                return (pre.astype(jnp.bfloat16), sk, sv, ss)

            return jax.lax.fori_loop(
                0, steps, body,
                (x0, cache.self_k, cache.self_v, cache.self_s))

        x0 = jnp.asarray(rng.normal(size=(B, T, dims.d_model)), jnp.bfloat16)
        fn = jax.jit(run)
        fargs = (wp["decoder"], cache, x0)
        out = fn(*fargs)
    np.asarray(jax.tree.leaves(out)[0].ravel()[0])
    if "trace" in kw:
        with jax.profiler.trace(kw["trace"]):
            out = fn(*fargs)
            np.asarray(jax.tree.leaves(out)[0].ravel()[0])
        print(f"trace written to {kw['trace']}")
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*fargs)
        np.asarray(jax.tree.leaves(out)[0].ravel()[0])
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    print(f"RESULT {sys.argv[1:]} {dt / steps * 1e3:.3f} ms/step "
          f"(incl ~25ms/{steps} steps tunnel fetch)")


if __name__ == "__main__":
    main()
