"""Forced-phase sweep of the fused decode kernel (VERDICT r4 #1).

Times ops/megastep.py::fused_decoder_layers via megastep_chain_ms for every
requested (dtype, batch, blkdiag, ns, nc, nch) combination in ONE process —
megastep_chain_ms re-jits per call, so per-config env flags are honored and
the persistent compilation cache keeps re-runs cheap.

  python tools/megastep_sweep.py int8 b=2,4,8 t=11
  python tools/megastep_sweep.py bf16 b=2 blkdiag=1 ns=1,2 nc=1,2 nch=1

Prints one CSV-ish line per config:  RESULT dtype b blkdiag ns nc nch ms
(ms = FAIL on compile/VMEM errors).  Roofline minima per batch are printed
once for context (same formula as bench.py's batch sweep).
"""

import itertools
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

from whisper_medusa_tpu.config import ModelConfig
from whisper_medusa_tpu.models import whisper
from whisper_medusa_tpu.utils.profiling import megastep_chain_ms


def ints(s):
    return [int(v) for v in s.split(",")]


def main():
    int8 = (sys.argv[1:] or ["bf16"])[0] == "int8"
    t = int(kw.get("t", 11))
    batches = ints(kw.get("b", "2,4,8"))
    blkdiags = ints(kw.get("blkdiag", "1,0"))
    nss = ints(kw.get("ns", "1,2,5"))
    ncs = ints(kw.get("nc", "1,2,5"))
    nchs = ints(kw.get("nch", "1,2"))
    max_len = int(kw.get("max_len", "260"))
    config = ModelConfig(param_dtype="bfloat16", compute_dtype="bfloat16")
    dims = config.dims
    wp = whisper.init_whisper_params(jax.random.PRNGKey(0), dims, jnp.bfloat16)
    if int8:
        from whisper_medusa_tpu.ops.qmm import quantize_decoder

        wp, _ = quantize_decoder(wp)
    jax.block_until_ready(wp)
    os.environ["WM_MEGASTEP_MAX_B"] = str(max(batches))

    def hbm_bytes(cache_len, b, wb):
        # Same model as bench.py::decode_step_hbm_bytes(with_embed=False).
        d, f = dims.d_model, dims.decoder_ffn_dim
        nl, s = dims.decoder_layers, dims.max_source_positions
        nh = dims.decoder_attention_heads
        weights = nl * (4 * d * d + 2 * d * d + 2 * d * f)
        kv_self = 2 * nl * b * (cache_len + 16) * d * wb
        if wb == 1:
            kv_self += nl * b * (cache_len + 16) * 128 * 2
        kv_cross = (2 * nl * b * s * d * wb
                    + (2 * nl * b * nh * s * 4 if wb == 1 else 0))
        return weights * wb + kv_self + kv_cross

    wb = 1 if int8 else 2
    dt_name = "int8" if int8 else "bf16"
    rng = np.random.default_rng(0)
    for b in batches:
        mn = hbm_bytes(max_len + t + 2, b, wb) / 819e9 * 1e3
        print(f"ROOFLINE {dt_name} b={b}: {mn:.2f} ms", flush=True)
        enc = jnp.asarray(rng.normal(size=(b, 1500, dims.d_model)),
                          jnp.bfloat16)
        for blkdiag, ns, nc, nch in itertools.product(
                blkdiags, nss, ncs, nchs):
            os.environ["WM_MEGASTEP_BLKDIAG"] = str(blkdiag)
            os.environ["WM_MEGASTEP_FORCE_PHASES"] = f"{ns},{nc},{nch}"
            tag = f"{dt_name} b={b} blkdiag={blkdiag} ns={ns} nc={nc} nch={nch}"
            t0 = time.perf_counter()
            try:
                ms = megastep_chain_ms(wp, dims, enc, t=t, max_len=max_len)
                print(f"RESULT {tag}: {ms:.3f} ms "
                      f"(wall {time.perf_counter() - t0:.0f}s)", flush=True)
            except Exception as e:
                msg = str(e).split("\n")[0][:120]
                print(f"RESULT {tag}: FAIL {type(e).__name__}: {msg}",
                      flush=True)


if __name__ == "__main__":
    main()
