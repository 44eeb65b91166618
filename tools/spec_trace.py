"""Capture a device trace of the full speculative decode loop (bf16 or int8).

  python tools/spec_trace.py int8 trace=/tmp/spec_trace
  python tools/spec_trace.py int8            # timing only

Prints per-iteration wall time; with trace=, writes a TensorBoard/Perfetto
trace whose op table decomposes the iteration (megastep kernel vs verify
kernel vs glue ops).
"""

import os
import sys
import time

kw = dict(a.split("=", 1) for a in sys.argv[2:] if "=" in a)

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

from whisper_medusa_tpu.config import EOS_TOKEN_ID, GenerationConfig, ModelConfig
from whisper_medusa_tpu.decoding.buffers import generate_medusa_buffers
from whisper_medusa_tpu.decoding.processors import ProcessorConfig
from whisper_medusa_tpu.decoding.speculative import speculative_generate
from whisper_medusa_tpu.models import medusa as medusa_mod
from whisper_medusa_tpu.models import whisper


def main():
    int8 = (sys.argv[1:] or ["bf16"])[0] == "int8"
    variant = kw.get("variant", "base_head")
    config = ModelConfig(param_dtype="bfloat16", compute_dtype="bfloat16")
    if variant == "medusa_block":
        import dataclasses as _dc

        config = _dc.replace(
            config, medusa=_dc.replace(config.medusa,
                                       medusa_heads_type="medusa_block"))
    dims = config.dims
    r1, r2 = jax.random.split(jax.random.PRNGKey(0))
    wp = whisper.init_whisper_params(r1, dims, jnp.bfloat16)
    mp = medusa_mod.init_medusa_params(r2, dims, config.medusa, wp, jnp.bfloat16)
    if int8:
        from whisper_medusa_tpu.ops.qmm import quantize_decoder

        wp, mp = quantize_decoder(wp, mp)
    jax.block_until_ready(jax.tree.leaves(wp)[0])
    rng = np.random.default_rng(0)
    enc = jnp.asarray(rng.standard_normal((1, 1500, dims.d_model)) * 0.1,
                      jnp.bfloat16)
    prompt = jnp.asarray([[50258, 50259, 50359, 50363]], jnp.int32)
    buffers = generate_medusa_buffers(config.medusa.medusa_choices)
    max_length = int(kw.get("max_length", "260"))
    pcfg = ProcessorConfig(
        vocab_size=dims.vocab_size,
        suppress_tokens=(EOS_TOKEN_ID,),   # fixed-length run: never stop on EOS
        begin_suppress_tokens=None,
        begin_index=prompt.shape[1],
        eos_token_id=EOS_TOKEN_ID,
    )
    gen = GenerationConfig(max_length=max_length)

    # Weights/encoder output MUST be jit arguments, not closures: closed-over
    # arrays embed as constants in the serialized module (3.6 GB of StableHLO
    # at large-v2!) and the axon tunnel's remote_compile rejects the payload
    # with HTTP 413.
    def run(wp, mp, enc, corruption):
        return speculative_generate(
            wp, mp, dims, buffers, pcfg, gen, enc, prompt,
            variant=variant, draft_corruption=corruption)

    jfn = jax.jit(run)
    fn = lambda c: jfn(wp, mp, enc, c)
    res = fn(jnp.float32(0.3))
    steps = int(np.asarray(res.steps))
    np.asarray(res.lengths)
    t0 = time.perf_counter()
    res = fn(jnp.float32(0.3))
    np.asarray(res.lengths)
    dt = time.perf_counter() - t0
    print(f"RESULT {sys.argv[1:]} {dt * 1e3:.1f} ms, {steps} iters, "
          f"{dt / steps * 1e3:.3f} ms/iter (incl one ~25ms fetch)")
    if "trace" in kw:
        with jax.profiler.trace(kw["trace"]):
            res = fn(jnp.float32(0.3))
            np.asarray(res.lengths)
        print("trace written to", kw["trace"])


if __name__ == "__main__":
    main()
