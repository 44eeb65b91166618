"""Verify-kernel profiler: chained-loop ms/call for ops/verify.py::verify_rows.

Times the fused verification kernel standalone (the same way
tools/megastep_profile.py times the decode kernel): a fori_loop chains N
calls by folding the previous call's outputs into the next call's inputs, so
one device round-trip amortizes the ~25 ms axon-tunnel fetch.

  python tools/verify_profile.py int8 r=12
  python tools/verify_profile.py bf16 r=1 steps=200
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

from whisper_medusa_tpu.ops import verify


def main():
    int8 = (sys.argv[1:] or ["bf16"])[0] == "int8"
    r = int(kw.get("r", 12))
    steps = int(kw.get("steps", 100))
    v, d = 51865, 1280
    rng = np.random.default_rng(0)
    embed = jnp.asarray(rng.standard_normal((v, d)) * 0.02, jnp.bfloat16)
    if int8:
        from whisper_medusa_tpu.ops.qmm import quantize_array

        q, s = quantize_array(embed, axis=-1)
        embed = {"q": q, "s": s}
    hs0 = jnp.asarray(rng.standard_normal((r, d)), jnp.bfloat16)
    pos = jnp.arange(r, dtype=jnp.int32) + 5
    gcol = jnp.asarray(rng.integers(0, v, (r,)), jnp.int32)
    masks = jnp.zeros((2, v), jnp.int8)

    @jax.jit
    def loop(hs):
        def body(i, h):
            am, mx, lse, gth = verify.verify_rows(
                h, embed, pos, gcol, masks,
                begin_index=1, eos_id=50257, decay=None)
            # Fold outputs into the next input so the calls serialize.
            return h + (mx + lse + gth)[:, None].astype(h.dtype) * 1e-6 \
                + am[:, None].astype(h.dtype) * 1e-9

        return jax.lax.fori_loop(0, steps, body, hs)

    out = loop(hs0)
    np.asarray(out[0, 0])
    t0 = time.perf_counter()
    out = loop(hs0)
    np.asarray(out[0, 0])
    dt = time.perf_counter() - t0
    print(f"RESULT {sys.argv[1:]} {dt / steps * 1e3:.3f} ms/call "
          f"(incl ~25ms/{steps} steps tunnel fetch)")


if __name__ == "__main__":
    main()
