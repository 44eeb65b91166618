"""Speculative-decode engine tests.

The single most valuable test (SURVEY §4): greedy Medusa decoding must be
token-identical to greedy vanilla decoding, for any acceptance pattern, because the
acceptance rule only admits tokens the base model would have emitted greedily
(reference: whisper_medusa/models/medusa_utils.py:546-560).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisper_medusa_tpu.config import GenerationConfig, tiny_test_config
from whisper_medusa_tpu.decoding.buffers import generate_medusa_buffers
from whisper_medusa_tpu.decoding.processors import ProcessorConfig
from whisper_medusa_tpu.decoding.speculative import speculative_generate
from whisper_medusa_tpu.models import medusa as medusa_mod
from whisper_medusa_tpu.models import whisper


EOS = 5
PAD = 5


def make_model(variant="base_head", heads=3, seed=0, perturb_heads=0.0):
    cfg = tiny_test_config(medusa_num_heads=heads, medusa_heads_type=variant)
    rng = jax.random.PRNGKey(seed)
    r1, r2, r3 = jax.random.split(rng, 3)
    params = whisper.init_whisper_params(r1, cfg.dims)
    medusa_params = medusa_mod.init_medusa_params(r2, cfg.dims, cfg.medusa, params)
    if perturb_heads:
        h = medusa_params["heads"]
        medusa_params["heads"] = {
            "w": h["w"] + perturb_heads * jax.random.normal(r3, h["w"].shape),
            "b": h["b"],
        }
    return cfg, params, medusa_params


def gen_cfg(max_length=48, **kw):
    return GenerationConfig(
        max_length=max_length, eos_token_id=EOS, pad_token_id=PAD,
        suppress_tokens=None, begin_suppress_tokens=None, **kw)


def pcfg_for(cfg, prompt_len, **kw):
    return ProcessorConfig(vocab_size=cfg.dims.vocab_size, begin_index=prompt_len,
                           eos_token_id=EOS, **kw)


def run_pair(variant, perturb_heads, gen=None, pconf_kw=None, batch=2, seed=0):
    """Run medusa decode and its single-node (vanilla) twin; return both results."""
    cfg, params, medusa_params = make_model(variant, seed=seed,
                                            perturb_heads=perturb_heads)
    gen = gen or gen_cfg()
    rng = np.random.default_rng(seed)
    mel = jnp.asarray(
        rng.normal(size=(batch, cfg.dims.num_mel_bins, 2 * cfg.dims.max_source_positions)),
        jnp.float32)
    enc = whisper.encode(params, cfg.dims, mel)
    prompt = jnp.asarray(
        np.tile(rng.integers(6, cfg.dims.vocab_size, size=(1, 3)), (batch, 1)),
        jnp.int32)
    pcfg = pcfg_for(cfg, prompt.shape[1], **(pconf_kw or {}))

    buf_med = generate_medusa_buffers(cfg.medusa.medusa_choices)
    res_med = speculative_generate(
        params, medusa_params, cfg.dims, buf_med, pcfg, gen, enc, prompt,
        variant=variant)

    buf_one = generate_medusa_buffers([1])
    if variant == "base_head":
        # The linear variant's base model is head0∘proj (reference model.py:1274-1284)
        # so the parity twin must decode through head0 as well.
        res_van = speculative_generate(
            params, medusa_params, cfg.dims, buf_one, pcfg, gen, enc, prompt,
            variant="base_head")
    else:
        res_van = speculative_generate(
            params, None, cfg.dims, buf_one, pcfg, gen, enc, prompt,
            variant="vanilla")
    return res_med, res_van


@pytest.mark.parametrize("variant", ["base_head", "medusa_block"])
@pytest.mark.parametrize("perturb", [0.0, 0.05])
def test_greedy_token_parity(variant, perturb):
    res_med, res_van = run_pair(variant, perturb)
    toks_m = np.asarray(res_med.tokens)
    toks_v = np.asarray(res_van.tokens)
    len_m = np.asarray(res_med.lengths)
    len_v = np.asarray(res_van.lengths)
    for i in range(toks_m.shape[0]):
        n = int(min(len_m[i], len_v[i]))
        np.testing.assert_array_equal(
            toks_m[i, :n], toks_v[i, :n],
            err_msg=f"medusa/vanilla diverge (variant={variant}, example={i})")
    # Speculation must never take more decoder iterations than vanilla.
    assert int(res_med.steps) <= int(res_van.steps)


def test_parity_with_exponential_decay_penalty():
    """Position-dependent processors must not break the parity invariant."""
    res_med, res_van = run_pair(
        "base_head", 0.05,
        pconf_kw=dict(exponential_decay_length_penalty=(8, 1.5)))
    len_m, len_v = np.asarray(res_med.lengths), np.asarray(res_van.lengths)
    for i in range(len_m.shape[0]):
        n = int(min(len_m[i], len_v[i]))
        np.testing.assert_array_equal(
            np.asarray(res_med.tokens)[i, :n], np.asarray(res_van.tokens)[i, :n])


def test_identity_heads_accept():
    """Zero-init heads propose the current argmax; loops in random models produce
    accepts — exercise the accept>0 path and check stats bookkeeping."""
    found = False
    for seed in range(4):
        res_med, _ = run_pair("base_head", 0.0, seed=seed)
        if int(np.asarray(res_med.accepted).sum()) > 0:
            found = True
            break
    assert found, "no acceptance in any seed — accept path untested"


def test_eos_backfill_and_padding():
    res_med, _ = run_pair("base_head", 0.0)
    toks = np.asarray(res_med.tokens)
    lens = np.asarray(res_med.lengths)
    for i in range(toks.shape[0]):
        row = toks[i]
        if (row == EOS).any():
            j = int(np.argmax(row == EOS))
            assert (row[j + 1:] == EOS).all()
        assert (row[lens[i]:] == PAD).all() or (row == EOS).any()


def test_tree_choices_decode_runs_and_matches_chain():
    """Branching-tree verification (dead code in the reference,
    medusa_utils.py:329-358) must produce the same greedy output as the chain."""
    variant = "base_head"
    cfg, params, medusa_params = make_model(variant, heads=3, perturb_heads=0.05)
    gen = gen_cfg()
    rng = np.random.default_rng(0)
    mel = jnp.asarray(
        rng.normal(size=(2, cfg.dims.num_mel_bins, 2 * cfg.dims.max_source_positions)),
        jnp.float32)
    enc = whisper.encode(params, cfg.dims, mel)
    prompt = jnp.asarray(np.tile(rng.integers(6, cfg.dims.vocab_size, (1, 3)), (2, 1)),
                         jnp.int32)
    pcfg = pcfg_for(cfg, 3)

    res_tree = speculative_generate(
        params, medusa_params, cfg.dims, generate_medusa_buffers([1, 2, 2, 1]),
        pcfg, gen, enc, prompt, variant=variant)
    res_chain = speculative_generate(
        params, medusa_params, cfg.dims, generate_medusa_buffers([1, 1, 1, 1]),
        pcfg, gen, enc, prompt, variant=variant)
    len_t = np.asarray(res_tree.lengths)
    len_c = np.asarray(res_chain.lengths)
    for i in range(2):
        n = int(min(len_t[i], len_c[i]))
        np.testing.assert_array_equal(
            np.asarray(res_tree.tokens)[i, :n], np.asarray(res_chain.tokens)[i, :n])


def _ref_evaluate_posterior(logits, candidates, temperature, thr, alpha):
    """Reference acceptance semantics re-implemented in numpy
    (pinned to medusa_utils.py:526-588)."""
    if temperature == 0:
        mask = (candidates[:, 1:] == logits[:, :-1].argmax(-1)).astype(int)
        acc = np.cumprod(mask, 1).sum(1)
        accept = acc.max()
        best = 0 if accept == 0 else int(acc.argmax())
        return best, int(accept)
    x = logits[:, :-1] / temperature
    e = np.exp(x - x.max(-1, keepdims=True))
    probs = e / e.sum(-1, keepdims=True)
    cand = np.take_along_axis(probs, candidates[:, 1:, None], -1)[..., 0]
    ent = -(probs * np.log(probs + 1e-5)).sum(-1)
    threshold = np.minimum(thr, np.exp(-ent) * alpha)
    mask = (cand > threshold).astype(int)
    acc = np.cumprod(mask, 1).sum(1)
    accept = acc.max()
    if accept == 0:
        return 0, 0
    rows = np.where(acc == accept)[0]
    ll = np.array([np.log(cand[r, :accept] + 1e-30).sum() for r in rows])
    return int(rows[ll.argmax()]), int(accept)


@pytest.mark.parametrize("temperature", [0.0, 0.7])
def test_acceptance_matches_reference_rule(temperature):
    from whisper_medusa_tpu.decoding.speculative import (_greedy_accept,
                                                         _typical_accept)

    buffers = generate_medusa_buffers([1, 2, 2])
    retrieve = jnp.asarray(buffers.retrieve_indices)
    rng = np.random.default_rng(42)
    for trial in range(20):
        chunk = rng.integers(0, 16, size=(1, buffers.num_nodes)).astype(np.int32)
        logits = rng.normal(size=(1, buffers.num_nodes, 16)).astype(np.float32)
        # Plant some matches so accept>0 happens.
        if trial % 2:
            nodes = buffers.retrieve_indices[rng.integers(0, buffers.num_paths)]
            for i in range(len(nodes) - 1):
                logits[0, nodes[i], chunk[0, nodes[i + 1]]] += 8.0

        if temperature == 0.0:
            nxt = jnp.argmax(jnp.asarray(logits), -1).astype(jnp.int32)
            best, accept, _, _ = _greedy_accept(jnp.asarray(chunk), nxt, retrieve)
        else:
            nxt = jnp.argmax(jnp.asarray(logits), -1).astype(jnp.int32)
            best, accept, _, _ = _typical_accept(
                jnp.asarray(chunk), jnp.asarray(logits), nxt, retrieve,
                temperature, 0.09, 0.3)

        # Reference operates on per-path (candidates, path-logits) layout.
        cands = chunk[:, buffers.retrieve_indices][0][None]  # (1,P,Lv) -> paths first
        path_logits = logits[0][buffers.retrieve_indices]    # (P, Lv, V)
        rb, ra = _ref_evaluate_posterior(
            path_logits, cands[0], temperature, 0.09, 0.3)
        assert int(accept[0]) == ra, f"accept mismatch trial {trial}"
        if ra > 0:
            assert int(best[0]) == rb, f"best mismatch trial {trial}"


@pytest.mark.parametrize("corruption", [0.4, 1.0])
def test_output_invariant_under_draft_corruption(corruption):
    """Corrupting drafts changes throughput, never tokens — the acceptance rule
    guarantees it (and this pins the bench.py accept-rate knob as sound)."""
    cfg, params, medusa_params = make_model("base_head", perturb_heads=0.0)
    gen = gen_cfg()
    rng = np.random.default_rng(7)
    mel = jnp.asarray(
        rng.normal(size=(2, cfg.dims.num_mel_bins, 2 * cfg.dims.max_source_positions)),
        jnp.float32)
    enc = whisper.encode(params, cfg.dims, mel)
    prompt = jnp.asarray(np.tile(rng.integers(6, cfg.dims.vocab_size, (1, 3)), (2, 1)),
                         jnp.int32)
    pcfg = pcfg_for(cfg, 3)
    buffers = generate_medusa_buffers(cfg.medusa.medusa_choices)

    clean = speculative_generate(params, medusa_params, cfg.dims, buffers, pcfg,
                                 gen, enc, prompt, variant="base_head")
    noisy = speculative_generate(params, medusa_params, cfg.dims, buffers, pcfg,
                                 gen, enc, prompt, variant="base_head",
                                 draft_corruption=corruption)
    lc, ln = np.asarray(clean.lengths), np.asarray(noisy.lengths)
    for i in range(2):
        n = int(min(lc[i], ln[i]))
        np.testing.assert_array_equal(
            np.asarray(clean.tokens)[i, :n], np.asarray(noisy.tokens)[i, :n])
    if corruption == 1.0:
        assert int(noisy.accepted.sum()) == 0
    assert int(noisy.steps) >= int(clean.steps)


def test_batch_invariance():
    """Decoding an example alone or inside a batch yields identical tokens —
    padding/garbage lanes must not leak across examples."""
    cfg, params, medusa_params = make_model("base_head", perturb_heads=0.05)
    gen = gen_cfg(max_length=40)
    rng = np.random.default_rng(21)
    mel = jnp.asarray(
        rng.normal(size=(3, cfg.dims.num_mel_bins, 2 * cfg.dims.max_source_positions)),
        jnp.float32)
    enc = whisper.encode(params, cfg.dims, mel)
    prompt = jnp.asarray(np.tile(rng.integers(6, cfg.dims.vocab_size, (1, 3)), (3, 1)),
                         jnp.int32)
    pcfg = pcfg_for(cfg, 3)
    buffers = generate_medusa_buffers(cfg.medusa.medusa_choices)

    full = speculative_generate(params, medusa_params, cfg.dims, buffers, pcfg,
                                gen, enc, prompt, variant="base_head")
    for i in range(3):
        solo = speculative_generate(
            params, medusa_params, cfg.dims, buffers, pcfg, gen,
            enc[i:i + 1], prompt[i:i + 1], variant="base_head")
        n = int(min(full.lengths[i], solo.lengths[0]))
        np.testing.assert_array_equal(
            np.asarray(full.tokens)[i, :n], np.asarray(solo.tokens)[0, :n],
            err_msg=f"batch lane {i} differs from solo decode")


@pytest.mark.parametrize("choices,seed", [
    ((1, 2, 1, 3), 3), ((1, 3, 2), 11), ((1, 1, 2, 2, 1), 5),
])
def test_fuzz_tree_parity(choices, seed):
    """Property: ANY branching-tree choices produce the same greedy tokens as the
    vanilla loop (acceptance admits only greedy-consistent paths)."""
    cfg, params, medusa_params = make_model(
        "base_head", heads=len(choices) - 1, seed=seed, perturb_heads=0.08)
    gen = gen_cfg(max_length=36)
    rng = np.random.default_rng(seed)
    mel = jnp.asarray(
        rng.normal(size=(2, cfg.dims.num_mel_bins, 2 * cfg.dims.max_source_positions)),
        jnp.float32)
    enc = whisper.encode(params, cfg.dims, mel)
    prompt = jnp.asarray(np.tile(rng.integers(6, cfg.dims.vocab_size, (1, 3)), (2, 1)),
                         jnp.int32)
    pcfg = pcfg_for(cfg, 3)
    res_t = speculative_generate(
        params, medusa_params, cfg.dims, generate_medusa_buffers(list(choices)),
        pcfg, gen, enc, prompt, variant="base_head")
    res_v = speculative_generate(
        params, medusa_params, cfg.dims, generate_medusa_buffers([1]),
        pcfg, gen, enc, prompt, variant="base_head")
    for i in range(2):
        n = int(min(res_t.lengths[i], res_v.lengths[i]))
        np.testing.assert_array_equal(
            np.asarray(res_t.tokens)[i, :n], np.asarray(res_v.tokens)[i, :n],
            err_msg=f"tree {choices} diverges at lane {i}")


@pytest.mark.parametrize("choices,seed", [((1, 2, 1, 3), 3), ((1, 3, 2), 11)])
def test_tree_timestamps_match_vanilla(choices, seed):
    """Timestamp rules on branching trees: per-node history comes from the
    static parent/ancestor arrays; greedy tokens must equal the vanilla loop
    (which evaluates the same rules one token at a time)."""
    cfg, params, medusa_params = make_model(
        "base_head", heads=len(choices) - 1, seed=seed, perturb_heads=0.08)
    gen = gen_cfg(max_length=40)
    rng = np.random.default_rng(seed)
    mel = jnp.asarray(
        rng.normal(size=(2, cfg.dims.num_mel_bins,
                         2 * cfg.dims.max_source_positions)), jnp.float32)
    enc = whisper.encode(params, cfg.dims, mel)
    prompt = jnp.asarray(
        np.tile(rng.integers(6, 200, (1, 3)), (2, 1)), jnp.int32)
    # Tiny-vocab timestamp layout: treat the top quarter as timestamp tokens.
    ts_begin = int(cfg.dims.vocab_size * 3 // 4)
    pcfg = pcfg_for(cfg, 3, timestamp_rules=True, timestamp_begin=ts_begin,
                    max_initial_timestamp_index=10)
    res_t = speculative_generate(
        params, medusa_params, cfg.dims, generate_medusa_buffers(list(choices)),
        pcfg, gen, enc, prompt, variant="base_head")
    res_v = speculative_generate(
        params, medusa_params, cfg.dims, generate_medusa_buffers([1]),
        pcfg, gen, enc, prompt, variant="base_head")
    for i in range(2):
        n = int(min(res_t.lengths[i], res_v.lengths[i]))
        np.testing.assert_array_equal(
            np.asarray(res_t.tokens)[i, :n], np.asarray(res_v.tokens)[i, :n],
            err_msg=f"tree {choices} + timestamps diverges at lane {i}")
