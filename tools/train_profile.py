"""Train-step ablation profiler: where does the training millisecond go?

Times the REAL train step (training/train.py::make_train_step — what
cli/train.py and bench.py run) and a ladder of ablations beneath it, so MFU
regressions can be attributed to a specific stage instead of guessed at:

  step      full train step (value_and_grad + mask + adafactor update)
  grad      value_and_grad only (no optimizer)
  fwd       loss forward only
  enc       encoder-only fwd+bwd (loss = mean(enc_out^2))
  dec       decoder+heads+loss fwd+bwd on a FIXED encoder output
  heads     head stack + CE fwd+bwd on a FIXED decoder hidden state

  python tools/train_profile.py b=8 t=448 which=step,grad,fwd,enc,dec,heads
  python tools/train_profile.py b=2 t=96 remat=0
  python tools/train_profile.py b=8 t=448 which=step trace=/tmp/tr

Knobs: remat=0|1|dots (default 1=full, as the trainer uses), freeze=whisper|
all_but_last (structural freeze-policy pruning), kl=0|1 (medusa_kl_loss),
heads=N, steps=N (timing loop length, default 10).
"""

import os
import sys
import time

kw = dict(a.split("=", 1) for a in sys.argv[1:] if "=" in a)

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

from whisper_medusa_tpu.config import MedusaConfig, ModelConfig
from whisper_medusa_tpu.models import medusa as medusa_mod
from whisper_medusa_tpu.models import whisper
from whisper_medusa_tpu.training import train as train_mod


def fetch(out):
    """Force completion by round-tripping one element to the host —
    ``block_until_ready`` is a NO-OP through this environment's remote-TPU
    tunnel (same workaround as bench.py::fetch).  First AND last leaf, in
    case the runtime completes output buffers out of order."""
    leaves = jax.tree.leaves(out)
    np.asarray(leaves[-1].ravel()[0])
    return np.asarray(leaves[0].ravel()[0])


def timeit(name, fn, *args, steps=10):
    out = fn(*args)
    fetch(out)
    dts = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fn(*args)
        fetch(out)
        dts.append((time.perf_counter() - t0) / steps)
    print(f"ABLATION {name}: {min(dts) * 1e3:.1f} ms", flush=True)
    return min(dts)


def main():
    b = int(kw.get("b", 2))
    t = int(kw.get("t", 96))
    n_heads = int(kw.get("heads", 10))
    steps = int(kw.get("steps", 10))
    _remats = {"1": True, "0": False, "full": True, "dots": "dots"}
    remat = _remats[kw.get("remat", "1")]
    dec_remat = _remats[kw["dec_remat"]] if "dec_remat" in kw else None
    freeze = kw.get("freeze") or None
    use_kl = kw.get("kl", "0") == "1"
    which = kw.get("which", "step,grad,fwd,enc,dec,heads").split(",")

    config = ModelConfig(
        param_dtype="bfloat16", compute_dtype="bfloat16",
        medusa=MedusaConfig(medusa_num_heads=n_heads,
                            medusa_kl_loss=use_kl,
                            medusa_choices=(1,) * (n_heads + 1)))
    dims = config.dims
    print(f"CONFIG b={b} t={t} heads={n_heads} remat={remat} freeze={freeze} kl={use_kl} "
          f"dims=large-v2 device={jax.devices()[0].platform}", flush=True)
    rng = np.random.default_rng(0)
    wp = whisper.init_whisper_params(jax.random.PRNGKey(0), dims, jnp.bfloat16)
    mp = medusa_mod.init_medusa_params(jax.random.PRNGKey(1), dims,
                                       config.medusa, wp, jnp.bfloat16)
    params = {"whisper": wp, "medusa": mp}
    feats = jnp.asarray(rng.normal(size=(b, dims.num_mel_bins, 3000)),
                        jnp.bfloat16)
    labels = jnp.asarray(rng.integers(0, dims.vocab_size, (b, t)), jnp.int32)

    res = {}
    if "step" in which or "grad" in which:
        opt = train_mod.make_optimizer("adafactor", lr=1e-4)
        state = train_mod.init_train_state(params, opt)
    if "step" in which:
        step_fn = jax.jit(train_mod.make_train_step(config, opt, freeze,
                                                    remat=remat,
                                                    decoder_remat=dec_remat))
        state2, m = step_fn(state, feats, labels)
        if kw.get("trace"):
            with jax.profiler.trace(kw["trace"]):
                state2, m = step_fn(state, feats, labels)
                jax.block_until_ready(m["loss"])
            print(f"trace written to {kw['trace']}", flush=True)
        # Block on the full (state, metrics) tuple: blocking only on the loss
        # returns before the optimizer update finishes (it's computed early).
        res["step"] = timeit(
            "step", lambda s: step_fn(s, feats, labels), state, steps=steps)

    def fwd_loss(p):
        out = train_mod.medusa_train_forward(p, config, feats, labels,
                                             freeze_policy=freeze,
                                             remat=remat)
        return out.loss

    if "grad" in which:
        gfn = jax.jit(jax.grad(fwd_loss))
        res["grad"] = timeit(
            "grad", lambda p: jax.tree.leaves(gfn(p))[0], params, steps=steps)
    if "fwd" in which:
        ffn_ = jax.jit(fwd_loss)
        res["fwd"] = timeit("fwd", ffn_, params, steps=steps)

    if "enc" in which:
        def enc_loss(p):
            e = whisper.encode(p["whisper"], dims, feats, remat=remat)
            return jnp.mean(jnp.square(e.astype(jnp.float32)))
        gfn = jax.jit(jax.grad(enc_loss))
        res["enc"] = timeit(
            "enc", lambda p: jax.tree.leaves(gfn(p))[0], params, steps=steps)

    enc_out = jnp.asarray(
        rng.normal(size=(b, dims.max_source_positions, dims.d_model)),
        jnp.bfloat16)

    from whisper_medusa_tpu.training import losses as losses_mod

    def _stack_ce(p, head_stack):
        if kw.get("dense", "0") == "1":
            stack = whisper.project_logits(p["whisper"], head_stack)
            stack = stack.astype(head_stack.dtype)
            ce, valid = losses_mod.medusa_cross_entropy(stack, labels, True)
        else:
            ce, valid, _ = losses_mod.medusa_losses_streaming(
                lambda h: whisper.project_logits(p["whisper"], h),
                head_stack, labels, True)
        return jnp.sum(jnp.where(valid, ce, 0.0)) / jnp.maximum(
            jnp.sum(valid), 1)

    if "dec" in which:
        def dec_loss(p):
            dids = train_mod.shift_tokens_right(labels, 50257, 50258)
            dec = whisper.decode_train(p["whisper"], dims, dids, enc_out,
                                       remat=remat)
            head_out = medusa_mod.apply_heads(p["medusa"], dec.hidden)
            return _stack_ce(p, head_out)
        gfn = jax.jit(jax.grad(dec_loss))
        res["dec"] = timeit(
            "dec", lambda p: jax.tree.leaves(gfn(p))[0], params, steps=steps)

    if "heads" in which:
        hidden = jnp.asarray(rng.normal(size=(b, t, dims.d_model)),
                             jnp.bfloat16)

        def head_loss(p):
            head_out = medusa_mod.apply_heads(p["medusa"], hidden)
            return _stack_ce(p, head_out)
        gfn = jax.jit(jax.grad(head_loss))
        res["heads"] = timeit(
            "heads", lambda p: jax.tree.leaves(gfn(p))[0], params, steps=steps)

    # FLOPs model matching bench.py:427-434 (2*params*tokens, fwd+bwd = 3x).
    p_enc, p_dec = 0.64e9, 0.91e9
    flops = 3 * 2 * (p_enc * b * dims.max_source_positions + p_dec * b * t)
    for name, dt in res.items():
        print(f"SUMMARY {name}: {dt * 1e3:.1f} ms  "
              f"(full-step-MFU-equiv {100 * flops / dt / 197e12:.1f}%)",
              flush=True)


if __name__ == "__main__":
    main()
