"""Profiling / tracing helpers (SURVEY §5: the reference has none — not even
timers for its headline speedup metric; reference eval measures WER only,
eval_whisper_medusa.py).

Provides: jax.profiler trace capture, simple wall-clock stage timers, and a
decode-throughput report used by bench.py and the eval CLI.
"""

from __future__ import annotations

import contextlib
import json
import time
from dataclasses import dataclass, field
from typing import Dict, Iterator

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture an XLA/TPU profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclass
class StageTimer:
    """Accumulating wall-clock stage timer with block_until_ready semantics."""

    totals: Dict[str, float] = field(default_factory=dict)
    counts: Dict[str, int] = field(default_factory=dict)

    @contextlib.contextmanager
    def stage(self, name: str, sync=None) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                jax.block_until_ready(sync)
            self.totals[name] = self.totals.get(name, 0.0) + time.perf_counter() - t0
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> Dict[str, Dict[str, float]]:
        return {
            k: {"total_s": self.totals[k], "count": self.counts[k],
                "mean_ms": 1e3 * self.totals[k] / max(self.counts[k], 1)}
            for k in self.totals
        }

    def dump(self) -> str:
        return json.dumps(self.report(), indent=2)


def decode_report(new_tokens: int, steps: int, accepted: int,
                  wall_s: float) -> Dict[str, float]:
    """Throughput + acceptance stats — mean accept length is *the* speedup driver
    (collected but never surfaced by the reference, model.py:633,705)."""
    return {
        "tokens_per_second": new_tokens / max(wall_s, 1e-9),
        "tokens_per_step": new_tokens / max(steps, 1),
        "mean_accept_length": accepted / max(steps, 1),
        "decoder_steps": steps,
        "wall_clock_s": wall_s,
    }


def megastep_chain_ms(weights, dims, enc, t: int, steps: int = 100,
                      max_len: int = 260) -> float:
    """ms/step of the fused decode kernel in a chained ``fori_loop``.

    One device call runs ``steps`` back-to-back fused_decoder_layers steps
    (ops/megastep.py) over a freshly built cache, so per-call dispatch and
    the remote-tunnel fetch amortize to noise.  Used by bench.py's batch
    sweep and tools/megastep_profile.py.  ``enc`` fixes the batch size.
    Returns raw ms/step including ~1/steps of one tunnel fetch.
    """
    import numpy as np
    import jax.numpy as jnp

    from ..models import whisper
    from ..ops import megastep

    b = enc.shape[0]
    cache = whisper.init_cache(weights, dims, enc, max_len)
    nh = dims.decoder_attention_heads
    cb = jnp.zeros((t, t), jnp.float32)

    def run(dec, cache, x0):
        def body(i, carry):
            x, sk, sv, ss = carry
            pre, _, sk, sv, ss = megastep.fused_decoder_layers(
                dec["layers"], x, sk, sv, cache.cross_k, cache.cross_v,
                jnp.full((b,), 64, jnp.int32) + (i % 8), cb,
                dims.max_source_positions, nh,
                cross_k_s=cache.cross_k_s, cross_v_s=cache.cross_v_s,
                self_s=ss)
            return (pre.astype(jnp.bfloat16), sk, sv, ss)

        return jax.lax.fori_loop(
            0, steps, body, (x0, cache.self_k, cache.self_v, cache.self_s))

    fn = jax.jit(run)
    x0 = (0.1 * jax.random.normal(jax.random.PRNGKey(0),
                                  (b, t, dims.d_model))).astype(jnp.bfloat16)
    dec = weights["decoder"]
    out = fn(dec, cache, x0)
    np.asarray(jax.tree.leaves(out)[0].ravel()[0])
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(dec, cache, x0)
        np.asarray(jax.tree.leaves(out)[0].ravel()[0])
        ts.append(time.perf_counter() - t0)
    return min(ts) / steps * 1e3
