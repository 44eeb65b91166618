"""Fused on-device speculative (Medusa) decoding — one ``lax.while_loop``.

This replaces the reference's Python-driven hot loop
(reference: whisper_medusa/models/model.py:404-835 ``_medusa_greedy_search`` +
medusa_utils.py:424-671) with a single fixed-shape loop that never syncs to the host.

Key structural improvement over the reference (same emitted tokens, fewer FLOPs):
the reference runs **two** decoder forwards per iteration — (1) base+draft forward on
newly accepted tokens (model.py:639-648), then (2) a tree-verification forward
(medusa_utils.py:461-523).  But forward (1) recomputes hidden states the verification
pass already produced.  Here each iteration runs **one** decoder forward over the
candidate tree; the Medusa heads are applied to the hidden state of the *accepted*
node of that same forward, which yields the drafts (and the base/bonus token) for the
next iteration for free.  Per-iteration commits are ``accept_length + 1`` tokens
(draft prefix + bonus), so at zero acceptance it degrades exactly to vanilla
one-token-per-forward decoding, and at full acceptance it emits K+1 tokens per forward
(vs per *two* forwards in the reference).

Token-parity guarantees (tested):
  * Greedy Medusa decode == greedy vanilla decode, token for token, because the
    acceptance rule only admits tokens equal to the argmax of the processed
    verification logits (reference invariant, medusa_utils.py:546-560), and the
    bonus/base token *is* that argmax.
  * Logits processors are applied per-position (see decoding/processors.py) so the
    invariant holds even with position-dependent processors active.

Cache handling: tree-node K/V are written directly into the cache slots
``[cur_len-1, cur_len-1+num_nodes)``.  For chain choices (the reference default) the
accepted prefix is already contiguous — commit is free.  For branching trees the
accepted path's slots are compacted with a gather (replacing the reference's per-step
host-side concat surgery, model.py:378-402).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from whisper_medusa_tpu.config import GenerationConfig, WhisperDims
from whisper_medusa_tpu.decoding.buffers import MedusaBuffers
from whisper_medusa_tpu.decoding.processors import (ProcessorConfig,
                                                    apply_processors,
                                                    apply_timestamp_rules)
from whisper_medusa_tpu.models import medusa as medusa_mod
from whisper_medusa_tpu.models import whisper
from whisper_medusa_tpu.models.whisper import KVCache

Params = Dict[str, Any]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SpecState:
    tokens: jnp.ndarray    # (B, buf_len) committed tokens incl. the pending root
    cur_len: jnp.ndarray   # (B,) committed length incl. pending root
    finished: jnp.ndarray  # (B,) bool
    cache: KVCache
    chunk: jnp.ndarray     # (B, num_nodes) next candidate tree tokens (node 0 = root)
    steps: jnp.ndarray     # () int32 — loop iterations executed
    accepted: jnp.ndarray  # (B,) int32 — total accepted draft tokens (speedup metric)
    prev2: jnp.ndarray     # (B,) token preceding the pending root (timestamp rules)
    max_ts: jnp.ndarray    # (B,) running max emitted timestamp token (0 = none)
    logprobs: jnp.ndarray  # (B, buf_len) f32 — processed logprob of each token


class SpecResult(NamedTuple):
    tokens: jnp.ndarray    # (B, max_length) padded, EOS-backfilled
    lengths: jnp.ndarray   # (B,) committed lengths (clipped to max_length)
    steps: jnp.ndarray     # () decoder iterations (prefill excluded)
    accepted: jnp.ndarray  # (B,) accepted draft tokens
    # Unprocessed base logits at the first generated position — drives no-speech
    # detection (softmax prob of <|nospeech|>; HF computes this at begin_index).
    first_logits: jnp.ndarray = None  # (B, V) float32
    # Processed log-prob of every emitted token (pad positions 0) — the
    # ``output_scores`` equivalent, captured inside the loop at no extra forward.
    logprobs: jnp.ndarray = None      # (B, max_length) float32


def _head_slice(medusa_params: Params, lo: int, hi: Optional[int]) -> Params:
    h = medusa_params["heads"]
    w = h["w"]
    if isinstance(w, dict):   # int8 serving mode (ops/qmm.py)
        w = {"q": w["q"][lo:hi], "s": w["s"][lo:hi]}
    else:
        w = w[lo:hi]
    return {"heads": {"w": w, "b": h["b"][lo:hi]}}


def _base_logits_fn(variant: str, params: Params,
                    medusa_params: Optional[Params]):
    """Per-variant base (verification) logits from decoder hidden states.

    ``base_head`` (Linear): logits = proj(head0(hidden)) — head 0 is the learned
    re-projection acting as the base head (reference: model.py:1274-1284).
    ``medusa_block`` / vanilla: logits = proj(hidden) (reference: model.py:1287-1288).
    """
    if variant == "base_head":
        head0 = _head_slice(medusa_params, 0, 1)

        def fn(hidden):
            h0 = medusa_mod.apply_heads(head0, hidden)[0]
            return whisper.project_logits(params, h0)
    else:
        def fn(hidden):
            return whisper.project_logits(params, hidden)
    return fn


def _compact_tree_cache(cache: KVCache, offsets: jnp.ndarray,
                        path_nodes: jnp.ndarray) -> KVCache:
    """Gather the accepted path's K/V slots into contiguous positions.

    offsets: (B,) chunk base slot; path_nodes: (B, Lv) node indices of the best path.
    Replaces reference cache surgery (model.py:378-402) with on-device slot copies.
    """
    lv = path_nodes.shape[1]

    def fix(buf):  # (L, B, S, D) head-flat slabs (models/whisper.py::KVCache)
        def per_example(buf_b, off_b, nodes_b):  # (L, S, D)
            src = jnp.take(buf_b, off_b + nodes_b, axis=1)  # (L, Lv, D)
            return lax.dynamic_update_slice(buf_b, src, (0, off_b, 0))
        return jax.vmap(per_example, in_axes=(1, 0, 0), out_axes=1)(
            buf, offsets, path_nodes)

    return dataclasses.replace(
        cache, self_k=fix(cache.self_k), self_v=fix(cache.self_v),
        self_s=fix(cache.self_s) if cache.self_s is not None else None)


def _greedy_accept(chunk, proc_argmax, retrieve):
    """Greedy longest-prefix-match acceptance (reference: medusa_utils.py:546-560)."""
    ptok = chunk[:, retrieve]                       # (B, P, Lv)
    pnxt = proc_argmax[:, retrieve]                 # (B, P, Lv)
    match = (ptok[:, :, 1:] == pnxt[:, :, :-1]).astype(jnp.int32)
    acc_len = jnp.cumprod(match, axis=-1).sum(-1)   # (B, P)
    best = jnp.argmax(acc_len, axis=-1)             # ties -> first (matches torch)
    accept = jnp.max(acc_len, axis=-1)
    return best.astype(jnp.int32), accept.astype(jnp.int32), ptok, pnxt


def _typical_accept(chunk, proc_logits, nxt, retrieve, temperature,
                    posterior_threshold, posterior_alpha):
    """Typical-acceptance rule (reference: medusa_utils.py:561-588).

    Uses processed verification logits; tie-break among max-accept paths by
    accumulated log-likelihood.  ``nxt`` (B, N) supplies the bonus/next token per
    node — argmax when deterministic, multinomially sampled when an rng is carried
    (the reference's do_sample=True role, model.py:1878-1886).
    """
    ptok = chunk[:, retrieve]                       # (B, P, Lv)
    # Log-probs at each path node (all but the leaf predict the next path token).
    plog = proc_logits[
        jnp.arange(chunk.shape[0])[:, None, None], retrieve[None, :, :-1]
    ]                                               # (B, P, Lv-1, V)
    probs = jax.nn.softmax(plog / temperature, axis=-1)
    cand_prob = jnp.take_along_axis(
        probs, ptok[:, :, 1:, None], axis=-1)[..., 0]           # (B, P, Lv-1)
    entropy = -jnp.sum(probs * jnp.log(probs + 1e-5), axis=-1)  # (B, P, Lv-1)
    threshold = jnp.minimum(
        jnp.float32(posterior_threshold),
        jnp.exp(-entropy) * jnp.float32(posterior_alpha),
    )
    mask = (cand_prob > threshold).astype(jnp.int32)
    acc_len = jnp.cumprod(mask, axis=-1).sum(-1)                # (B, P)
    max_acc = jnp.max(acc_len, axis=-1, keepdims=True)
    idx = jnp.arange(cand_prob.shape[-1])
    likelihood = jnp.sum(
        jnp.where(idx[None, None] < acc_len[..., None],
                  jnp.log(cand_prob + 1e-30), 0.0),
        axis=-1,
    )
    score = jnp.where(acc_len == max_acc, likelihood, -jnp.inf)
    best = jnp.argmax(score, axis=-1)
    accept = max_acc[:, 0]
    pnxt = nxt[:, retrieve]
    return best.astype(jnp.int32), accept.astype(jnp.int32), ptok, pnxt


def speculative_generate(
    params: Params,
    medusa_params: Optional[Params],
    dims: WhisperDims,
    buffers: MedusaBuffers,
    pcfg: ProcessorConfig,
    gen: GenerationConfig,
    enc_out: jnp.ndarray,       # (B, S, D)
    prompt: jnp.ndarray,        # (B, T0) int32 init tokens (same for all examples)
    variant: str = "vanilla",   # "vanilla" | "base_head" | "medusa_block"
    draft_corruption: Optional[jnp.ndarray] = None,  # traced scalar in [0, 1]
    resume_state: Optional[SpecState] = None,        # continue a previous segment
    stop_len: Optional[jnp.ndarray] = None,          # pause once cur_len >= stop_len
    return_state: bool = False,
    rng: Optional[jnp.ndarray] = None,  # PRNG key -> multinomial sampling at temp>0
):
    """Run the fused speculative decode loop.  Pure function; jit/pjit-able.

    With ``variant="vanilla"`` (or no medusa params / single-node buffers) this *is*
    the vanilla greedy loop: one token per forward through the identical code path —
    the speedup baseline (SURVEY §7 step 2).

    ``draft_corruption``: probability of randomly corrupting each draft token —
    a benchmarking/robustness knob that pins the acceptance rate without touching
    model quality.  The emitted tokens are provably IDENTICAL for any value (the
    acceptance rule rejects wrong drafts); only throughput changes.  Used by
    bench.py to report speedups at controlled accept rates, and by tests to prove
    output-invariance under arbitrary draft quality.

    Streaming (the reference's ``streamer`` role, model.py:758-759): pass
    ``stop_len``/``return_state=True`` to decode a bounded segment and get the
    resumable on-device state back; pass it as ``resume_state`` to continue.
    Segmented decoding emits exactly the same tokens as a single call.
    """
    b, t0 = prompt.shape
    eos = gen.eos_token_id
    pad = gen.pad_token_id
    max_length = gen.max_length
    num_heads = buffers.num_levels - 1
    n_nodes = buffers.num_nodes
    lv = buffers.num_levels
    greedy = gen.temperature == 0.0
    # Sampled emission (reference sets do_sample=True at fallback temps,
    # model.py:1878-1886 — there the whole point of the ladder is that a
    # stochastic retry can escape a repetition loop; without sampling a retry
    # mostly reproduces itself).  Deterministic per rng key.
    sample = (not greedy) and rng is not None

    tree_idx = jnp.asarray(buffers.tree_indices)
    pos_ids = jnp.asarray(buffers.position_ids)
    retrieve = jnp.asarray(buffers.retrieve_indices)
    chunk_mask = jnp.asarray(buffers.attn_mask) if not buffers.is_chain else None

    block = medusa_params.get("block") if (
        medusa_params is not None and variant == "medusa_block") else None
    base_fn = _base_logits_fn(variant, params, medusa_params)

    # Draft heads: linear variant -> heads 1..K (head 0 is the base);
    # block variant -> all heads, applied to the block layer output.
    if num_heads > 0:
        if variant == "base_head":
            draft_params = _head_slice(medusa_params, 1, None)
        elif variant == "medusa_block":
            draft_params = _head_slice(medusa_params, 0, None)
        else:
            raise ValueError(f"variant {variant!r} has no draft heads")
    else:
        draft_params = None

    buf_len = max_length + lv + 1
    cache_len = max_length + n_nodes + 1

    corrupt_key = jax.random.PRNGKey(0x5eed)

    def chunk_from_draft_logits(root, head_logits, new_len, step):
        """Select per-level candidates from head logits (B, K, V) -> chunk tokens.

        ``new_len`` counts committed tokens *including* the pending root (at index
        new_len - 1), so head k (1-based) predicts the token at absolute index
        new_len - 1 + k — i.e. processors for head k are evaluated at position
        new_len + (k-1)."""
        draft_pos = new_len[:, None] + jnp.arange(0, num_heads)[None, :]
        dproc = apply_processors(head_logits, draft_pos, pcfg)
        flat = [root[:, None]]
        for l in range(1, lv):
            k = buffers.choices[l]
            if k == 1:
                top = jnp.argmax(dproc[:, l - 1], axis=-1)[:, None]
            else:
                _, top = lax.top_k(dproc[:, l - 1], k)
            flat.append(top.astype(jnp.int32))
        flat = jnp.concatenate(flat, axis=1)       # (B, sum(choices))
        if draft_corruption is not None:
            drafts = flat[:, 1:]
            u = jax.random.uniform(jax.random.fold_in(corrupt_key, step),
                                   drafts.shape)
            vocab = dims.vocab_size
            drafts = jnp.where(u < draft_corruption, (drafts + 1) % vocab, drafts)
            flat = jnp.concatenate([flat[:, :1], drafts], axis=1)
        return flat[:, tree_idx]                   # (B, num_nodes)

    def drafts_to_chunk(root, hidden_acc, new_len, step):
        """Prefill drafting: heads on a single position's hidden state."""
        if draft_params is None:
            return root[:, None]
        head_out = medusa_mod.apply_heads(draft_params, hidden_acc)  # (K, B, D)
        head_logits = whisper.project_logits(params, head_out)       # (K, B, V)
        return chunk_from_draft_logits(
            root, jnp.swapaxes(head_logits, 0, 1), new_len, step)

    def stack_rows(hidden, block_hidden):
        """(K+1, B, N, D) hidden rows to score: verification row then drafts."""
        if draft_params is None:
            # base_head with zero draft heads (e.g. chain [1]) still routes
            # verification through head 0 — mirror _base_logits_fn exactly.
            if variant == "base_head" and medusa_params is not None:
                head0 = _head_slice(medusa_params, 0, 1)
                return medusa_mod.apply_heads(head0, hidden)
            return hidden[None]
        hsrc = block_hidden if block is not None else hidden
        heads_out = medusa_mod.apply_heads(draft_params, hsrc)    # (K, B, N, D)
        if variant == "base_head":
            head0 = _head_slice(medusa_params, 0, 1)
            verif_in = medusa_mod.apply_heads(head0, hidden)      # (1, B, N, D)
        else:
            verif_in = hidden[None]
        return jnp.concatenate([verif_in, heads_out], axis=0)

    def fused_verify_and_draft_logits(hidden, block_hidden):
        """One batched vocab projection for verification base logits AND all-node
        draft-head logits — a single read of the tied embedding per iteration.

        Returns (base (B,N,V), draft_all (K,B,N,V) or None)."""
        stacked = stack_rows(hidden, block_hidden)
        logits = whisper.project_logits(params, stacked)          # (K+1, B, N, V)
        if draft_params is None:
            return logits[0], None
        return logits[0], logits[1:]

    use_ts = pcfg.timestamp_rules
    ts_parents = ts_anc = None
    if use_ts and not buffers.is_chain:
        # Per-node history on a branching tree is static tree structure:
        # node n's predecessor token lives at its parent node (the ancestor one
        # level up), and its running-max timestamp folds every ancestor-or-self
        # (attn_mask row n).  Both are numpy at trace time.
        import numpy as _np

        pos_np = _np.asarray(buffers.position_ids)
        mask_np = _np.asarray(buffers.attn_mask)
        par = _np.full((n_nodes,), -1, _np.int32)
        for n in range(1, n_nodes):
            anc = _np.where(mask_np[n] & (pos_np == pos_np[n] - 1))[0]
            par[n] = int(anc[0])
        ts_parents = jnp.asarray(par)
        ts_anc = jnp.asarray(mask_np)

    # Fused verification (ops/verify.py): projection + processors + argmax/
    # logsumexp/gather in one embedding stream — replaces ~30 latency-bound
    # vocab-wide ops per iteration on the chain+greedy path.  Branching trees
    # (per-level top-k), sampling and timestamp rules keep the unfused path.
    from whisper_medusa_tpu.ops import verify as verify_mod

    n_score_rows = (num_heads + 1 if draft_params is not None
                    else 1) * n_nodes * b
    use_fused_verify = (
        greedy and not sample and buffers.is_chain and b <= 8
        and pcfg.custom is None  # user processors can't ride the fused rules
        and verify_mod.available(
            n_score_rows, dims.vocab_size, dims.d_model))
    sup_masks = verify_mod.masks_for(pcfg) if use_fused_verify else None

    # Two-pass verification at batch (round 5).  The single fused pass scores
    # every (head, node, example) row — (K+1) x N x B of them — so the
    # accepted node's drafts fall out of the SAME embedding stream: optimal
    # at B=1, where that stream dominates the cost.  At B >= 2 the projection
    # turns FLOPs/VPU-bound (measured: 0.20 ms at r=121 vs 0.94 ms at r=484
    # on v5e int8) and ~10/11 of the rows are draft rows whose logits are
    # only ever read at ONE node.  Split instead: pass A scores just the
    # B x N verification rows in the kernel; after acceptance, pass B
    # projects the K draft heads at the accepted hidden state only (the
    # prefill drafting path, K x B rows) — ~5x fewer scored rows per
    # iteration for one extra (overlappable) embedding stream.  Emitted
    # tokens are bit-identical: same positions, same processors, same
    # corruption draws (tests/test_verify_kernel.py).
    _tp_env = os.environ.get("WM_VERIFY_TWOPASS", "auto")
    two_pass = (use_fused_verify and draft_params is not None
                and (_tp_env == "1" or (_tp_env == "auto" and b >= 2)))

    # Row construction fused into the verify kernel too (ops/verify.py::
    # verify_hidden): the head matmuls, concat and reshape leave the XLA
    # graph and the (R, D) row matrix never round-trips HBM.  Single-res-
    # block-layer heads only; the stacked-rows path remains the fallback.
    # (Two-pass mode never needs it: pass A's B x N rows cost one small
    # head-0 einsum to build.)
    fuse_rows = False
    fv_heads_w = fv_heads_b = None
    fv_identity0 = False
    if (use_fused_verify and not two_pass and medusa_params is not None
            and os.environ.get("WM_VERIFY_FUSE_ROWS", "1") != "0"
            and variant in ("base_head", "medusa_block")):
        hw_all = medusa_params["heads"]["w"]            # (H, L, D, D)
        hq = isinstance(hw_all, dict)                   # int8 serving mode
        n_hl = (hw_all["q"] if hq else hw_all).shape[1]
        if n_hl == 1:
            if hq:
                fv_heads_w = {"q": hw_all["q"][:, 0], "s": hw_all["s"][:, 0]}
                n_h = hw_all["q"].shape[0]
            else:
                fv_heads_w = hw_all[:, 0]
                n_h = hw_all.shape[0]
            fv_heads_b = medusa_params["heads"]["b"][:, 0]
            # base_head: heads 0..K in one block — row 0 (verification) IS
            # head 0.  Block variant: row 0 is the hidden state itself; all
            # heads draft from the block layer's output.
            fv_identity0 = variant == "medusa_block"
            fuse_rows = verify_mod.hidden_available(
                b, n_nodes, n_h, fv_identity0,
                dims.vocab_size, dims.d_model)

    def ts_val(tok):
        return jnp.where(tok >= pcfg.timestamp_begin, tok, 0)

    # Medusa-block serving: stack the block layer onto the decoder layers ONCE
    # (outside the while_loop — leaf concats must not repeat per step) so the
    # fused megastep kernel can run it as one more grid layer.  Unused traces
    # (scan path) are dead code XLA eliminates.
    fused_block_layers = (
        whisper.extend_layers_with_block(params["decoder"]["layers"], block)
        if block is not None else None)

    # ---------------- prefill (skipped when resuming a streamed segment) ------
    if resume_state is None:
        cache = whisper.init_cache(
            params, dims, enc_out, cache_len,
            extra_layers=1 if block is not None else 0)
        if block is not None:
            cache = whisper.set_block_cross_kv(
                cache, block, enc_out, dims.decoder_attention_heads)
        out, cache = whisper.decode_step(
            params, dims, prompt, cache, jnp.zeros((b,), jnp.int32),
            block_params=block, fused_block_layers=fused_block_layers)

        h_last = out.hidden[:, -1]                                   # (B, D)
        base = base_fn(h_last)                                       # (B, V) f32
        proc = apply_processors(base, jnp.full((b,), t0, jnp.int32), pcfg)
        if use_ts:
            proc = apply_timestamp_rules(
                proc, jnp.full((b,), t0, jnp.int32),
                prompt[:, -1], prompt[:, -2] if t0 >= 2 else prompt[:, -1],
                jnp.zeros((b,), jnp.int32), pcfg)
        if sample:
            root0 = jax.random.categorical(
                jax.random.fold_in(rng, 0),
                proc / jnp.float32(gen.temperature)).astype(jnp.int32)
        else:
            root0 = jnp.argmax(proc, axis=-1).astype(jnp.int32)

        tokens = jnp.full((b, buf_len), pad, jnp.int32)
        tokens = lax.dynamic_update_slice(tokens, prompt, (0, 0))
        tokens = tokens.at[:, t0].set(root0)
        cur_len = jnp.full((b,), t0 + 1, jnp.int32)
        finished = (root0 == eos) | (cur_len + num_heads >= max_length)

        h_draft = out.block_hidden[:, -1] if block is not None else h_last
        chunk0 = drafts_to_chunk(root0, h_draft, cur_len, jnp.int32(0))

        logprobs0 = jnp.zeros((b, buf_len), jnp.float32)
        root0_lp = jnp.take_along_axis(
            jax.nn.log_softmax(proc, axis=-1), root0[:, None], axis=-1)[:, 0]
        logprobs0 = logprobs0.at[:, t0].set(root0_lp)

        state = SpecState(
            tokens=tokens, cur_len=cur_len, finished=finished, cache=cache,
            chunk=chunk0, steps=jnp.int32(0), accepted=jnp.zeros((b,), jnp.int32),
            prev2=prompt[:, -1], max_ts=ts_val(root0), logprobs=logprobs0,
        )
    else:
        state = resume_state
        base = jnp.zeros((b, dims.vocab_size), jnp.float32)  # first_logits n/a

    # ---------------- loop ----------------
    def cond(s: SpecState):
        active = ~s.finished
        if stop_len is not None:
            active = active & (s.cur_len < stop_len)
        return jnp.any(active)

    def body(s: SpecState) -> SpecState:
        offsets = s.cur_len - 1
        out, cache = whisper.decode_step(
            params, dims, s.chunk, s.cache, offsets,
            rel_positions=pos_ids, chunk_mask=chunk_mask, block_params=block,
            fused_block_layers=fused_block_layers)
        hidden = out.hidden                                   # (B, N, D)
        am = mx = lse = gth = draft_all = proc = None
        kp1 = num_heads + 1 if draft_params is not None else 1
        if two_pass:
            kp1 = 1   # pass A: verification rows only; drafts come in pass B
        penult_nodes = node_max_ts = None
        if use_ts:
            if buffers.is_chain:
                # Chain-node history: node l's last token is chunk[l], its
                # predecessor chunk[l-1] (prev2 for the root), and the running
                # max timestamp folds the chain prefix into the committed max.
                penult_nodes = jnp.concatenate(
                    [s.prev2[:, None], s.chunk[:, :-1]], axis=1)
                node_max_ts = jnp.maximum(
                    s.max_ts[:, None], lax.cummax(ts_val(s.chunk), axis=1))
            else:
                # Tree-node history via the static parent / ancestor arrays.
                penult_nodes = jnp.where(
                    ts_parents[None, :] >= 0,
                    jnp.take(s.chunk, jnp.clip(ts_parents, 0), axis=1),
                    s.prev2[:, None])
                ts_chunk = ts_val(s.chunk)                    # (B, N)
                path_max = jnp.max(
                    jnp.where(ts_anc[None], ts_chunk[:, None, :], 0), axis=2)
                node_max_ts = jnp.maximum(s.max_ts[:, None], path_max)
        if use_fused_verify:
            # Row (k, e, n) predicts absolute position cur_len[e] + n + k: the
            # k=0 verification row for node n, and — because on a chain the
            # accepted node IS the accept length — head k's draft lands at
            # new_len + (k-1) = cur_len + n + k when node n is accepted.
            pos_rows = (s.cur_len[None, :, None] + pos_ids[None, None, :]
                        + jnp.arange(kp1, dtype=jnp.int32)[:, None, None]
                        ).reshape(-1)
            gcol_nodes = jnp.concatenate(
                [s.chunk[:, 1:], jnp.zeros((b, 1), jnp.int32)], axis=1)
            zero_tail = jnp.zeros(((kp1 - 1) * b * n_nodes,), jnp.int32)
            gcol_rows = jnp.concatenate([gcol_nodes.reshape(-1), zero_tail])
            ts_kw = {}
            if use_ts:
                # Per-row history for the fused timestamp rules — only the
                # k=0 verification rows read it (n_verif); draft rows mirror
                # the unfused path (base processors only).
                ts_kw = dict(
                    ts_cfg=verify_mod.ts_cfg_for(pcfg),
                    n_verif=b * n_nodes,
                    last=jnp.concatenate([s.chunk.reshape(-1), zero_tail]),
                    penult=jnp.concatenate(
                        [penult_nodes.reshape(-1), zero_tail]),
                    maxts=jnp.concatenate(
                        [node_max_ts.reshape(-1), zero_tail]))
            if fuse_rows:
                hsrc = out.block_hidden if block is not None else hidden
                am, mx, lse, gth = verify_mod.verify_hidden(
                    hidden, hsrc, fv_heads_w, fv_heads_b,
                    params["decoder"]["embed_tokens"], pos_rows, gcol_rows,
                    sup_masks, identity0=fv_identity0,
                    begin_index=pcfg.begin_index, eos_id=pcfg.eos_token_id,
                    decay=pcfg.exponential_decay_length_penalty, **ts_kw)
            else:
                if two_pass:
                    # Pass A rows: verification only — mirror stack_rows'
                    # verif_in construction exactly.
                    if variant == "base_head":
                        head0 = _head_slice(medusa_params, 0, 1)
                        stacked = medusa_mod.apply_heads(head0, hidden)
                    else:
                        stacked = hidden[None]                  # (1,B,N,D)
                else:
                    stacked = stack_rows(hidden, out.block_hidden)
                rows = stacked.reshape(kp1 * b * n_nodes, dims.d_model)
                am, mx, lse, gth = verify_mod.verify_rows(
                    rows, params["decoder"]["embed_tokens"], pos_rows,
                    gcol_rows, sup_masks, begin_index=pcfg.begin_index,
                    eos_id=pcfg.eos_token_id,
                    decay=pcfg.exponential_decay_length_penalty, **ts_kw)
            am = am.reshape(kp1, b, n_nodes)
            mx = mx.reshape(kp1, b, n_nodes)
            lse = lse.reshape(kp1, b, n_nodes)
            gth = gth.reshape(kp1, b, n_nodes)
        else:
            base, draft_all = fused_verify_and_draft_logits(
                hidden, out.block_hidden)
            pred_pos = s.cur_len[:, None] + pos_ids[None, :]
            proc = apply_processors(base, pred_pos, pcfg)
            if use_ts:
                proc = apply_timestamp_rules(
                    proc, pred_pos, s.chunk, penult_nodes, node_max_ts, pcfg)

        if use_fused_verify:
            nxt = am[0].astype(jnp.int32)                     # (B, N)
            best, accept, ptok, pnxt = _greedy_accept(s.chunk, nxt, retrieve)
        elif greedy:
            nxt = jnp.argmax(proc, axis=-1).astype(jnp.int32)
            best, accept, ptok, pnxt = _greedy_accept(s.chunk, nxt, retrieve)
        else:
            if sample:
                # One multinomial draw per tree node from the tempered processed
                # distribution; the accepted node's draw becomes the bonus token.
                nxt = jax.random.categorical(
                    jax.random.fold_in(rng, s.steps + 1),
                    proc / jnp.float32(gen.temperature)).astype(jnp.int32)
            else:
                nxt = jnp.argmax(proc, axis=-1).astype(jnp.int32)
            best, accept, ptok, pnxt = _typical_accept(
                s.chunk, proc, nxt, retrieve, gen.temperature,
                gen.posterior_threshold, gen.posterior_alpha)

        take_best = lambda a: jnp.take_along_axis(
            a, best[:, None, None], axis=1)[:, 0]            # (B, Lv)
        best_tok = take_best(ptok)
        best_nxt = take_best(pnxt)
        best_nodes = jnp.take(retrieve, best, axis=0)        # (B, Lv)
        bonus = jnp.take_along_axis(best_nxt, accept[:, None], axis=1)[:, 0]

        # Committed window: accepted drafts then the bonus token, padded out.
        idx = jnp.arange(lv)[None, :]
        shifted = jnp.concatenate(
            [best_tok[:, 1:], jnp.zeros((b, 1), jnp.int32)], axis=1)
        window = jnp.where(
            idx < accept[:, None], shifted,
            jnp.where(idx == accept[:, None], bonus[:, None], pad))

        write = jax.vmap(
            lambda buf, w, off: lax.dynamic_update_slice(buf, w, (off,)))(
            s.tokens, window, s.cur_len)
        tokens = jnp.where(s.finished[:, None], s.tokens, write)

        # Per-token logprobs of the committed window (output_scores equivalent):
        # committed token i is predicted by path node i's processed logits.
        if use_fused_verify:
            # Accepted draft i == chunk[i+1] == the gathered column of node i;
            # the bonus token IS node `accept`'s argmax (its row max).
            node_base = gth[0] - lse[0]                       # (B, N)
            node_bonus = mx[0] - lse[0]
            bonus_lp = jnp.take_along_axis(
                node_bonus, accept[:, None], axis=1)          # (B, 1)
            win_lp = jnp.where(idx < accept[:, None], node_base, bonus_lp)
            win_lp = jnp.where(idx <= accept[:, None], win_lp, 0.0)
        else:
            lp_all = jax.nn.log_softmax(proc, axis=-1)        # (B, N, V)
            node_lp = jnp.take_along_axis(
                lp_all, best_nodes[:, :, None].astype(jnp.int32),
                axis=1)                                       # (B, Lv, V)
            win_lp = jnp.take_along_axis(
                node_lp, jnp.clip(window, 0, None)[:, :, None], axis=-1)[..., 0]
            win_lp = jnp.where(idx <= accept[:, None], win_lp, 0.0)
        lp_write = jax.vmap(
            lambda buf, w, off: lax.dynamic_update_slice(buf, w, (off,)))(
            s.logprobs, win_lp.astype(jnp.float32), s.cur_len)
        logprobs = jnp.where(s.finished[:, None], s.logprobs, lp_write)

        ncommit = jnp.where(s.finished, 0, accept + 1)
        new_len = s.cur_len + ncommit
        eos_hit = jnp.any((window == eos) & (idx <= accept[:, None]), axis=-1)
        finished = s.finished | eos_hit | (new_len + num_heads >= max_length)

        if not buffers.is_chain:
            cache = _compact_tree_cache(cache, offsets, best_nodes)

        # Drafts for the next iteration: gather the accepted node's pre-computed
        # head logits (no extra matmuls — they came out of the fused projection).
        if two_pass:
            # Pass B: draft heads at the accepted node's hidden state only
            # (K x B rows vs the single-pass kernel's K x B x N) — the same
            # path prefill uses, so positions/processors/corruption match the
            # single-pass kernel bit-for-bit.  Chain: accepted node == accept.
            hsrc = out.block_hidden if block is not None else hidden
            h_acc = jnp.take_along_axis(
                hsrc, accept[:, None, None], axis=1)[:, 0]    # (B, D)
            chunk = drafts_to_chunk(bonus, h_acc, new_len, s.steps + 1)
        elif use_fused_verify and draft_params is not None:
            # Chain: accepted node index == accept; head k's draft is that
            # node's processed-argmax, already computed in the kernel.
            draft_am = jnp.transpose(am[1:], (1, 0, 2))       # (B, K, N)
            drafts = jnp.take_along_axis(
                draft_am, accept[:, None, None], axis=2)[:, :, 0]  # (B, K)
            drafts = drafts.astype(jnp.int32)
            if draft_corruption is not None:
                u = jax.random.uniform(
                    jax.random.fold_in(corrupt_key, s.steps + 1), drafts.shape)
                drafts = jnp.where(u < draft_corruption,
                                   (drafts + 1) % dims.vocab_size, drafts)
            flat = jnp.concatenate([bonus[:, None], drafts], axis=1)
            chunk = flat[:, tree_idx]
        elif draft_all is not None:
            acc_node = jnp.take_along_axis(best_nodes, accept[:, None], axis=1)[:, 0]
            dsel = jnp.take_along_axis(
                jnp.swapaxes(draft_all, 0, 1),               # (B, K, N, V)
                acc_node[:, None, None, None], axis=2)[:, :, 0]   # (B, K, V)
            chunk = chunk_from_draft_logits(bonus, dsel, new_len, s.steps + 1)
        else:
            chunk = bonus[:, None]

        # Timestamp-rule history update: the pending root is now `bonus`; the token
        # before it is best_tok[accept] — the last accepted draft, or the old root
        # when accept == 0.
        prev2_new = jnp.take_along_axis(best_tok, accept[:, None], axis=1)[:, 0]
        win_ts = jnp.where(idx <= accept[:, None], ts_val(window), 0)
        max_ts_new = jnp.maximum(s.max_ts, jnp.max(win_ts, axis=-1))
        prev2_out = jnp.where(s.finished, s.prev2, prev2_new)
        max_ts_out = jnp.where(s.finished, s.max_ts, max_ts_new)

        return SpecState(
            tokens=tokens, cur_len=new_len, finished=finished, cache=cache,
            chunk=chunk, steps=s.steps + 1,
            accepted=s.accepted + jnp.where(s.finished, 0, accept),
            prev2=prev2_out, max_ts=max_ts_out, logprobs=logprobs,
        )

    state = lax.while_loop(cond, body, state)

    # ---------------- finalize ----------------
    tokens = state.tokens[:, :max_length]
    pos = jnp.arange(max_length)[None, :]
    lengths = jnp.minimum(state.cur_len, max_length)
    tokens = jnp.where(pos < lengths[:, None], tokens, pad)
    # EOS backfill: everything after the first EOS becomes EOS
    # (reference: model.py:798-810).
    is_eos = tokens == eos
    has_eos = jnp.any(is_eos, axis=-1)
    first = jnp.argmax(is_eos, axis=-1)
    tokens = jnp.where((has_eos[:, None]) & (pos > first[:, None]), eos, tokens)
    out_lp = state.logprobs[:, :max_length]
    out_lp = jnp.where(pos < lengths[:, None], out_lp, 0.0)
    result = SpecResult(tokens=tokens, lengths=lengths,
                        steps=state.steps, accepted=state.accepted,
                        first_logits=base, logprobs=out_lp)
    if return_state:
        return result, state
    return result
