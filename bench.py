"""Benchmark: Medusa speculative decode vs vanilla greedy decode on real TPU.

Prints ONE JSON line:
  {"metric": "decode_speedup_vs_vanilla_greedy", "value": S, "unit": "x",
   "vs_baseline": S / 1.49}

Baseline: the reference's published Medusa-Linear speedup on LibriSpeech test-clean
is 1.49x over vanilla Whisper greedy (BASELINE.md; reference README.md:34-35).

Setup mirrors the reference's headline configuration structurally: whisper-large-v2
dimensions, 10 Medusa heads (chain choices = 11 ones), batch 1, greedy decoding,
bf16 params.  Weights are random and heads are identity-initialized (no trained
checkpoint is reachable from this environment — zero egress), so the measured mean
accept length reflects the identity-head draft behavior on the model's own greedy
trajectory; both paths are full end-to-end decodes through the same engine.
EOS is suppressed so both loops run to the length cap (fixed work).

Secondary diagnostics go to stderr.
"""

from __future__ import annotations

import contextlib as _contextlib
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# Persistent compilation cache: repeat bench runs skip the (multi-minute) XLA
# compiles of the decode loops.
try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
except Exception:
    pass


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def fetch(x):
    """Force completion by fetching one element to the host.

    ``block_until_ready`` is a no-op through this environment's remote-TPU tunnel,
    so timing must round-trip a value."""
    return np.asarray(jax.tree.leaves(x)[0].ravel()[0])


def main(batch: int = 1, int8: bool = False):
    import os as _os

    # Full-scale checkpoint smoke (VERDICT r2 #9): real large-v2 shapes through
    # from_pretrained -> generate (bf16 + int8) on this round's device, BEFORE
    # the parent claims the TPU (the subprocess exits and frees its HBM).
    smoke = None
    if (batch == 1 and not int8
            and _os.environ.get("WM_BENCH_SMOKE", "1") == "1"):
        import subprocess

        t0 = time.perf_counter()
        repo = _os.path.dirname(_os.path.abspath(__file__))
        env = dict(_os.environ)
        env["WM_RUN_SLOW"] = "1"
        try:
            r = subprocess.run(
                [sys.executable, "-m", "pytest", "-x", "-q",
                 "tests/test_fullscale_checkpoint.py"],
                env=env, cwd=repo, capture_output=True, text=True,
                timeout=2400)
            smoke = "ok" if r.returncode == 0 else "fail"
            if r.returncode != 0:
                log("fullscale smoke FAILED:\n" + r.stdout[-1500:])
        except subprocess.TimeoutExpired:
            smoke = "timeout"
        log(f"fullscale checkpoint smoke: {smoke} "
            f"({time.perf_counter() - t0:.0f}s)")

    from whisper_medusa_tpu.config import (EOS_TOKEN_ID, GenerationConfig,
                                           ModelConfig)
    from whisper_medusa_tpu.decoding.buffers import generate_medusa_buffers
    from whisper_medusa_tpu.decoding.processors import ProcessorConfig
    from whisper_medusa_tpu.decoding.speculative import speculative_generate
    from whisper_medusa_tpu.models import medusa as medusa_mod
    from whisper_medusa_tpu.models import whisper
    from whisper_medusa_tpu.ops import mel as mel_mod
    from whisper_medusa_tpu.ops.mel_pallas import log_mel_spectrogram_pallas

    dev = jax.devices()[0]
    log(f"device: {dev} ({dev.platform})")
    on_tpu = dev.platform == "tpu"

    config = ModelConfig(param_dtype="bfloat16", compute_dtype="bfloat16")
    dims = config.dims
    r1, r2 = jax.random.split(jax.random.PRNGKey(0))
    t0 = time.perf_counter()
    wp = whisper.init_whisper_params(r1, dims, jnp.bfloat16)
    mp = medusa_mod.init_medusa_params(r2, dims, config.medusa, wp, jnp.bfloat16)
    jax.block_until_ready((wp, mp))
    log(f"param init: {time.perf_counter() - t0:.1f}s")
    if int8:
        from whisper_medusa_tpu.ops.qmm import quantize_decoder

        t0 = time.perf_counter()
        wp, mp = quantize_decoder(wp, mp)
        jax.block_until_ready((wp, mp))
        log(f"int8 decoder quantization: {time.perf_counter() - t0:.1f}s")

    # ---- audio frontend (pallas kernel) ----
    rng = np.random.default_rng(0)
    wav = jnp.asarray(0.1 * rng.normal(size=(1, mel_mod.N_SAMPLES)), jnp.float32)
    feats = log_mel_spectrogram_pallas(wav)
    fetch(feats)
    rtt0 = time.perf_counter(); fetch(feats); rtt = time.perf_counter() - rtt0
    log(f"tunnel fetch RTT: {rtt * 1e3:.1f} ms")
    t0 = time.perf_counter()
    for _ in range(10):
        feats = log_mel_spectrogram_pallas(wav)
    fetch(feats)
    log(f"mel frontend (pallas): {(time.perf_counter() - t0) / 10 * 1e3:.2f} ms/call (10 calls incl. 1 fetch)")

    # ---- encoder (tracked per-round: VERDICT r3 #6) ----
    def encoder_fwd_flops(d) -> int:
        """Modeled forward FLOPs of one 30 s encoder call (B=1): conv stem +
        per-layer attention projections, attention score/value matmuls and
        FFN, at 2 FLOPs per MAC."""
        s, dm, f = d.max_source_positions, d.d_model, d.encoder_ffn_dim
        conv = (2 * s * 3 * d.num_mel_bins * dm          # conv1 at 2*S frames
                + s * 3 * dm * dm)                       # conv2 stride 2
        per_layer = (s * 4 * dm * dm                     # qkvo projections
                     + 2 * s * s * dm                    # scores + values
                     + s * 2 * dm * f)                   # ffn
        return 2 * (conv + d.encoder_layers * per_layer)

    enc_fn = jax.jit(lambda p, m: whisper.encode(p, dims, m))
    feats = feats.astype(jnp.bfloat16)
    enc = enc_fn(wp, feats)
    fetch(enc)
    # Chain the timing loop ON DEVICE (fori_loop with a negligible scalar
    # data dependency): the axon tunnel costs ~0.3 ms per dispatch + ~25 ms
    # per fetch, which inflated the round-4 host-side 5-call groups by
    # ~5-8 ms/call — encoder_mfu_pct was a measurement artifact, not an
    # encoder property (no-op calibration, round 5).  Same rationale as the
    # decode legs' fori_loop chains.
    enc_steps = 20

    def enc_chain(p, m):
        def body(i, carry):
            mc, acc = carry
            out = whisper.encode(p, dims, mc)
            lead = out.ravel()[0]
            eps = (lead.astype(jnp.float32) * 1e-24).astype(m.dtype)
            return (m + eps, acc + lead.astype(jnp.float32))
        return jax.lax.fori_loop(0, enc_steps, body,
                                 (m, jnp.float32(0)))[1]

    enc_chained = jax.jit(enc_chain)
    fetch(enc_chained(wp, feats))
    enc_dts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = enc_chained(wp, feats)
        fetch(out)
        enc_dts.append((time.perf_counter() - t0) / enc_steps)
    enc_ms = min(enc_dts) * 1e3
    enc_flops = encoder_fwd_flops(dims)
    # v5e bf16 peak 197 TFLOP/s (v4 275, v5p 459).
    peak_tflops = {"v5 lite": 197.0, "v5e": 197.0, "v4": 275.0,
                   "v5p": 459.0, "v6": 918.0}
    peak = next((v for k, v in peak_tflops.items()
                 if k in str(jax.devices()[0]).lower()), 197.0)
    enc_mfu = enc_flops / (enc_ms * 1e-3) / (peak * 1e12) * 100
    log(f"encoder: {enc_ms:.1f} ms/call, {enc_flops / 1e9:.0f} GFLOP "
        f"-> {enc_mfu:.0f}% MFU at {peak:.0f} TF/s peak")

    # ---- decode loops ----
    if batch > 1:
        enc = jnp.tile(enc, (batch, 1, 1))
    prompt = jnp.tile(jnp.asarray([[50258, 50259, 50359, 50363]], jnp.int32),
                      (batch, 1))
    max_length = 260                       # 256 generated tokens from prompt 4
    pcfg = ProcessorConfig(
        vocab_size=dims.vocab_size,
        suppress_tokens=(EOS_TOKEN_ID,),   # fixed-length run: never stop on EOS
        begin_suppress_tokens=None,
        begin_index=prompt.shape[1],
        eos_token_id=EOS_TOKEN_ID,
    )
    gen = GenerationConfig(max_length=max_length)

    jits = {}

    def timed(buffers, variant, medusa_params, label, iters=5, corruption=None,
              weights=None):
        # draft_corruption is a *traced* scalar: one compile serves the whole sweep.
        key = (id(buffers), variant)
        if key not in jits:
            jits[key] = jax.jit(lambda w, m, e, p, c: speculative_generate(
                w, m, dims, buffers, pcfg, gen, e, p, variant=variant,
                draft_corruption=c))
        fn = jits[key]
        w = wp if weights is None else weights
        c = jnp.float32(corruption if corruption is not None else 0.0)
        res = fn(w, medusa_params, enc, prompt, c)
        fetch(res.tokens)
        # Min over calls, not mean: each call rides the axon tunnel and a
        # single dispatch hiccup (~50 ms observed) would otherwise smear
        # +0.5 ms/iter into a 77-step measurement.
        dts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            res = fn(w, medusa_params, enc, prompt, c)
            fetch(res.tokens)
            dts.append(time.perf_counter() - t0)
        dt = min(dts)
        new_tokens = int(np.asarray(res.lengths).sum()) - batch * prompt.shape[1]
        steps = int(res.steps)
        accept = int(res.accepted.sum()) / max(steps * batch, 1)
        log(f"{label}: {dt * 1e3:.1f} ms, {new_tokens} tokens, {steps} steps, "
            f"{new_tokens / dt:.1f} tok/s, accept/step={accept:.2f}")
        return new_tokens / dt, accept, dt, steps, new_tokens

    def decode_step_hbm_bytes(cache_len: int, chunk: int, wbytes: int,
                              b: int = None, with_embed: bool = True) -> int:
        """Modeled HBM bytes one decode step must move (weight + cache reads).

        Per step the decoder reads: all per-step weights (self qkvo + cross q/o
        + ffn per layer, plus — engine path only — the tied embedding for the
        logits matmul), the full self-KV slab, and the precomputed cross-KV
        cache.  Activations and the chunk's cache writes are negligible at
        decode sizes.  ``with_embed=False`` models the bare fused kernel
        (batch sweep), which has no vocab projection inside."""
        b = batch if b is None else b
        d, f = dims.d_model, dims.decoder_ffn_dim
        nl, v, s = dims.decoder_layers, dims.vocab_size, dims.max_source_positions
        nh = dims.decoder_attention_heads
        per_layer = 4 * d * d + 2 * d * d + 2 * d * f
        weights = nl * per_layer + (v * d if with_embed else 0)
        # +16: init_cache over-allocates slab rows for the megastep kernel's
        # aligned cache-commit window; the full slab is streamed per step.
        # int8 mode (round 3): the self slabs stream int8 too, plus the
        # bf16 scale slab whose minor dim tiles to 128 lanes physically.
        kv_self = 2 * nl * b * (cache_len + 16) * d * wbytes
        if wbytes == 1:
            kv_self += nl * b * (cache_len + 16) * 128 * 2
        # int8 mode stores the cross cache int8 + per-(head, pos) f32 scales.
        kv_cross = (2 * nl * b * s * d * wbytes
                    + (2 * nl * b * nh * s * 4 if wbytes == 1 else 0))
        return weights * wbytes + kv_self + kv_cross

    # v5e HBM ~819 GB/s; v4 ~1228; v5p ~2765. Used for the roofline line only.
    hbm_gbps = {"v5 lite": 819.0, "v5e": 819.0, "v4": 1228.0,
                "v5p": 2765.0, "v6": 1638.0}
    bw = next((v for k, v in hbm_gbps.items() if k in str(dev).lower()), 819.0)

    medusa_buffers = generate_medusa_buffers(config.medusa.medusa_choices)
    van_tps_raw, _, van_dt, van_steps, van_toks = timed(
        generate_medusa_buffers([1]), "vanilla", None, "vanilla greedy")

    # Speedup-vs-accept-rate curve: draft corruption pins the acceptance rate
    # (output-invariant — see decoding/speculative.py).  The headline is the point
    # closest to 2.0 accepted drafts/step, the operating point implied by the
    # reference's published 1.49x (its loop commits E[accept]+1(+1) tokens per two
    # forwards; 1.49x at ~equal per-forward cost implies E[accept] ~= 2).
    raw = []
    for corr in (0.0, 0.3, 0.5, 0.8, 1.0):
        tps, accept, dt, steps, toks = timed(medusa_buffers, "base_head", mp,
                                             f"medusa-10-heads corruption={corr}",
                                             corruption=corr)
        raw.append((corr, accept, dt, steps, toks))

    # Every curve point runs the SAME compiled program over identical shapes —
    # only the step count differs — so a linear fit of call time vs steps
    # separates the true per-iteration cost (slope) from the per-call
    # dispatch + tunnel-fetch overhead (intercept, ~25 ms through the remote
    # axon tunnel; real deployments don't pay it per utterance).  The
    # intercept is fitted on the speculative program; applying it to the
    # vanilla run is an approximation (same dispatch machinery, one fetch),
    # so RAW numbers are reported alongside every corrected one.
    xs = np.asarray([s for *_r, s, _t in raw], np.float64)
    ys = np.asarray([dt for *_r, dt, _s, _t in raw], np.float64)
    slope = float(((xs - xs.mean()) * (ys - ys.mean())).sum()
                  / ((xs - xs.mean()) ** 2).sum())
    overhead = max(0.0, float(ys.mean() - slope * xs.mean()))
    spec_ms = slope * 1e3
    log(f"per-call dispatch overhead (fit intercept): {overhead * 1e3:.1f} ms")

    # ---- decode-step roofline (VERDICT r1 #3) ----
    wbytes = 1 if int8 else 2
    van_ms_raw = van_dt / max(van_steps, 1) * 1e3
    van_ms = (van_dt - overhead) / max(van_steps, 1) * 1e3
    van_tps = van_toks / max(van_dt - overhead, 1e-9)
    van_min = decode_step_hbm_bytes(max_length + 2, 1, wbytes) / (bw * 1e9) * 1e3
    van_roof = 100.0 * van_min / van_ms
    log(f"vanilla decode: {van_ms:.2f} ms/step overhead-corrected "
        f"({van_ms_raw:.2f} raw incl. dispatch), HBM-roofline min "
        f"{van_min:.2f} ms -> {van_roof:.0f}% of roofline at {bw:.0f} GB/s")

    curve = []
    for (corr, accept, dt, steps, toks) in raw:
        # Measured committed-token counts (lengths sum), not modeled ones.
        tps = toks / max(dt - overhead, 1e-9)
        curve.append((corr, accept, tps, tps / van_tps))

    spec_min = decode_step_hbm_bytes(max_length + 13, 11, wbytes) / (bw * 1e9) * 1e3
    log(f"speculative decode: {spec_ms:.2f} ms/iter (11-node chunk), "
        f"HBM-roofline min {spec_min:.2f} ms -> {100 * spec_min / spec_ms:.0f}%")
    log("curve (corruption, accept/step, tok/s, speedup): "
        + ", ".join(f"({c:.1f}, {a:.2f}, {t:.0f}, {s:.2f}x)"
                    for c, a, t, s in curve))

    headline = min(curve, key=lambda r: abs(r[1] - 2.0))
    speedup = headline[3]
    log(f"headline: speedup {speedup:.3f}x at accept/step={headline[1]:.2f} "
        f"(vanilla {van_tps:.1f} tok/s); best-case "
        f"{curve[0][3]:.2f}x at accept/step={curve[0][1]:.2f}")
    if not on_tpu:
        log("WARNING: not on TPU — numbers are not meaningful")

    extra = {}

    @_contextlib.contextmanager
    def _leg(name):
        # Optional legs must never take down the headline JSON (an OOM in the
        # B=8 train leg would otherwise leave the driver with no bench at all).
        try:
            yield
        except Exception:
            import traceback
            log(f"bench leg {name!r} FAILED (continuing):\n"
                + traceback.format_exc()[-2000:])
            extra[f"{name}_error"] = True

    if (not int8 and batch == 1 and on_tpu
            and _os.environ.get("WM_BENCH_BLOCK", "1") == "1"):
        with _leg("block"):
            # Medusa-Block variant (the reference's second headline architecture,
            # model.py:1349-1417): the extra decoder layer rides the fused kernel
            # as one more grid layer — target within ~10% of base_head (it runs
            # L+1 layers, ~3% more weight bytes).
            from whisper_medusa_tpu.config import MedusaConfig

            mc_b = MedusaConfig(
                medusa_num_heads=10, medusa_hidden_size=dims.d_model,
                medusa_heads_type="medusa_block",
                medusa_choices=(1,) * 11)
            mp_b = medusa_mod.init_medusa_params(
                jax.random.PRNGKey(2), dims, mc_b, wp, jnp.bfloat16)
            # Zero the block layer's residual-writing projections so the (random-
            # weight) block acts as identity and the identity-initialized heads
            # draft the backbone's own greedy trajectory — the same operating
            # regime as base_head above.  A trained checkpoint needs no such
            # trick; without it drafts are noise and accept pins at 0, which
            # measures ms/iter fine but not the accept-dependent throughput.
            for k in ("o_w", "o_b"):
                mp_b["block"]["self"][k] = jnp.zeros_like(mp_b["block"]["self"][k])
                mp_b["block"]["cross"][k] = jnp.zeros_like(mp_b["block"]["cross"][k])
            mp_b["block"]["fc2_w"] = jnp.zeros_like(mp_b["block"]["fc2_w"])
            mp_b["block"]["fc2_b"] = jnp.zeros_like(mp_b["block"]["fc2_b"])
            jax.block_until_ready(mp_b)
            _, _, b_dt, b_steps, _ = timed(
                medusa_buffers, "medusa_block", mp_b,
                "medusa-block corruption=0.3", corruption=0.3)
            block_ms = (b_dt - overhead) / max(b_steps, 1) * 1e3
            log(f"medusa-block decode: {block_ms:.2f} ms/iter "
                f"({100 * block_ms / spec_ms:.0f}% of base_head's "
                f"{spec_ms:.2f} ms)")
            extra.update({
                "block_ms_per_iter": round(block_ms, 3),
                "block_vs_base_head_pct": round(100 * block_ms / spec_ms, 1),
            })

    if (not int8 and batch == 1 and on_tpu
            and _os.environ.get("WM_BENCH_INT8", "1") == "1"):
        with _leg("int8_mini"):
            # int8 serving mode mini-sweep (full sweep: `bench.py --int8`).
            from whisper_medusa_tpu.ops.qmm import quantize_decoder

            t0 = time.perf_counter()
            wp8, mp8 = quantize_decoder(wp, mp)
            jax.block_until_ready((wp8, mp8))
            log(f"int8 decoder quantization: {time.perf_counter() - t0:.1f}s")
            _, _, q_dt, q_steps, _ = timed(generate_medusa_buffers([1]), "vanilla",
                                           None, "int8 vanilla greedy", weights=wp8)
            _, q_acc, s_dt, s_steps, s_toks = timed(
                medusa_buffers, "base_head", mp8, "int8 medusa corruption=0.3",
                corruption=0.3, weights=wp8)
            q_ms = (q_dt - overhead) / max(q_steps, 1) * 1e3
            q_min = decode_step_hbm_bytes(max_length + 2, 1, 1) / (bw * 1e9) * 1e3
            q_tps = s_toks / max(s_dt - overhead, 1e-9)
            log(f"int8 vanilla decode: {q_ms:.2f} ms/step, roofline min "
                f"{q_min:.2f} ms -> {100 * q_min / q_ms:.0f}%; medusa "
                f"{q_tps:.0f} tok/s at accept {q_acc:.2f}")
            extra.update({
                "int8_decode_ms_per_step": round(q_ms, 3),
                "int8_roofline_pct": round(100 * q_min / q_ms, 1),
                "int8_medusa_tok_s_at_accept2": round(q_tps, 1),
            })

    if (not int8 and batch == 1 and on_tpu
            and _os.environ.get("WM_BENCH_SWEEP", "1") == "1"):
        with _leg("batch_sweep"):
            # Batched-serving sweep (VERDICT r2 #1): chained fused-kernel loop at
            # B = 2/4/8, bf16 + int8, T=11 speculative chunk — ms/step and % of
            # the per-batch HBM roofline (no vocab projection in the bare kernel).
            from whisper_medusa_tpu.utils.profiling import megastep_chain_ms

            if "wp8" not in dir():   # int8 mini-sweep disabled: quantize here
                from whisper_medusa_tpu.ops.qmm import quantize_decoder

                wp8, _ = quantize_decoder(wp, mp)
            sweep = {}
            for wl, weights in (("bf16", wp), ("int8", wp8)):
                wb = 1 if wl == "int8" else 2
                for bsw in (2, 4, 8):
                    enc_b = jnp.tile(enc, (bsw, 1, 1))
                    ms = megastep_chain_ms(weights, dims, enc_b, t=11,
                                           max_len=max_length)
                    mn = decode_step_hbm_bytes(max_length + 13, 11, wb, b=bsw,
                                               with_embed=False) / (bw * 1e9) * 1e3
                    sweep[f"{wl}_b{bsw}_ms"] = round(ms, 3)
                    sweep[f"{wl}_b{bsw}_roofline_pct"] = round(100 * mn / ms, 1)
                    log(f"batch sweep {wl} B={bsw}: {ms:.2f} ms/step "
                        f"(kernel roofline min {mn:.2f} -> {100 * mn / ms:.0f}%)")
            extra["batch_sweep"] = sweep

    if (not int8 and batch == 1 and on_tpu
            and _os.environ.get("WM_BENCH_B4E2E", "1") == "1"):
        with _leg("b4_e2e"):
            # Batched END-TO-END speculative serving (the sweep above times the
            # bare decode kernel; this is the full engine — megastep + fused
            # verify + acceptance — at B=4 int8, corruption 0.3).  Aggregate
            # tok/s across the batch is the serving-throughput headline.
            if "mp8" not in dir():
                from whisper_medusa_tpu.ops.qmm import quantize_decoder

                wp8, mp8 = quantize_decoder(wp, mp)
            b4 = 4
            enc4 = jnp.tile(enc[:1], (b4, 1, 1))
            prompt4 = jnp.tile(prompt[:1], (b4, 1))
            fn4 = jax.jit(lambda w, m, e, p, c: speculative_generate(
                w, m, dims, medusa_buffers, pcfg, gen, e, p,
                variant="base_head", draft_corruption=c))
            c = jnp.float32(0.3)
            res = fn4(wp8, mp8, enc4, prompt4, c)
            fetch(res.tokens)
            dts = []
            for _ in range(3):
                t0 = time.perf_counter()
                res = fn4(wp8, mp8, enc4, prompt4, c)
                fetch(res.tokens)
                dts.append(time.perf_counter() - t0)
            dt = min(dts)
            toks = int(np.asarray(res.lengths).sum()) - b4 * prompt4.shape[1]
            steps4 = int(res.steps)
            acc4 = int(res.accepted.sum()) / max(steps4 * b4, 1)
            tps = toks / max(dt - overhead, 1e-9)
            log(f"batched e2e int8 B={b4}: {dt * 1e3:.1f} ms, {toks} tokens, "
                f"{steps4} steps, {tps:.0f} tok/s aggregate, accept={acc4:.2f}")
            extra["int8_b4_e2e_tok_s"] = round(tps, 1)

    if (not int8 and batch == 1 and on_tpu
            and _os.environ.get("WM_BENCH_TRAIN", "1") == "1"):
        with _leg("train"):
            # Training throughput: the REAL train step (medusa_train_forward with
            # encoder remat + adafactor + freeze mask — what cli/train.py runs)
            # at large-v2 shapes, B=8 (VERDICT r3 #2: measure where it means
            # something).  MFU models fwd+bwd as 3 x 2 x params x tokens, where
            # params INCLUDE the 11 medusa output streams' vocab projections —
            # they are model layers, not loss overhead (the same convention that
            # counts an LM's tied head).  Attention's quadratic FLOPs and the
            # remat recompute pass are real executed work NOT counted, per the
            # standard MFU definition.
            from whisper_medusa_tpu.training import train as train_mod

            bt, lab_len = 8, 224
            opt = train_mod.make_optimizer("adafactor", lr=1e-4)
            # decoder_remat=False needs 42 GB of live decoder activations at
            # B=8 and "dots" still OOMs — remat="attn" (save only the tagged
            # attention outputs, ~1.3 GB at B=8; the recompute pass skips the
            # attention kernels) is the best config that fits a 16 GB v5e at
            # this batch: 1045 ms vs full remat's 1095 (round-5 measurements,
            # /tmp/train_meas harness; decomposition in DESIGN.md).
            step_fn = jax.jit(train_mod.make_train_step(config, opt, None, remat="attn"))
            state = train_mod.init_train_state(
                {"whisper": wp, "medusa": mp}, opt)
            feats_t = jnp.tile(feats[:1], (bt, 1, 1))
            labels = jnp.asarray(
                rng.integers(0, dims.vocab_size, (bt, lab_len)), jnp.int32)
            state, metrics = step_fn(state, feats_t, labels)
            fetch(metrics["loss"])
            dts = []
            for _ in range(3):
                t0 = time.perf_counter()
                state, metrics = step_fn(state, feats_t, labels)
                fetch(metrics["loss"])
                dts.append(time.perf_counter() - t0)
            dt = min(dts)
            p_enc = 0.64e9
            p_dec = 0.91e9
            n_streams = config.medusa.medusa_num_heads + 1
            p_heads = (n_streams * dims.vocab_size * dims.d_model
                       + config.medusa.medusa_num_heads * dims.d_model ** 2)
            flops = 3 * 2 * (p_enc * bt * dims.max_source_positions
                             + (p_dec + p_heads) * bt * lab_len)
            mfu = flops / dt / 197e12
            log(f"train step (B={bt}, T={lab_len}, attn-remat, adafactor): "
                f"{dt * 1e3:.0f} ms, {bt * lab_len / dt:.0f} label-tok/s, "
                f"MFU {100 * mfu:.0f}%")
            extra["train_step_ms"] = round(dt * 1e3, 1)
            extra["train_mfu_pct"] = round(100 * mfu, 1)

    print(json.dumps({
        "metric": "decode_speedup_vs_vanilla_greedy_at_accept2",
        "value": round(speedup, 4),
        "unit": "x",
        "vs_baseline": round(speedup / 1.49, 4),
        "decode_ms_per_step": round(van_ms, 3),
        "decode_ms_per_step_raw": round(van_ms_raw, 3),
        "decode_roofline_pct": round(van_roof, 1),
        "spec_ms_per_iter": round(spec_ms, 3),
        "spec_roofline_pct": round(100 * spec_min / spec_ms, 1),
        "encoder_ms": round(enc_ms, 2),
        "encoder_mfu_pct": round(enc_mfu, 1),
        **({"fullscale_smoke": smoke} if smoke is not None else {}),
        **extra,
    }))


if __name__ == "__main__":
    batch = 1
    if "--batch" in sys.argv:
        batch = int(sys.argv[sys.argv.index("--batch") + 1])
    main(batch=batch, int8="--int8" in sys.argv)
