"""End-to-end generate() parity vs HF ``WhisperForConditionalGeneration.generate``.

The backbone parity tests (test_whisper_backbone.py) pin forward numerics only;
this pins the full generation orchestration — init tokens ([sot, lang, task,
notimestamps]), suppress / begin-suppress processors, exponential length decay,
EOS stopping and max_length truncation — against the real HF greedy loop on a
local random torch Whisper (the strongest accuracy proxy available without
network access).  The reference re-implements exactly this HF loop
(reference: whisper_medusa/models/model.py:837-1166 `_multi_heads_generate`,
1419-1840 `generate`), so agreeing with HF here is agreeing with the reference's
vanilla semantics; medusa variants are separately pinned to our vanilla loop
(test_api.py::test_disable_medusa_matches_medusa_tokens).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisper_medusa_tpu.config import (MedusaConfig, ModelConfig, WhisperDims)
from whisper_medusa_tpu.models import convert, medusa as medusa_mod
from whisper_medusa_tpu.models.api import WhisperMedusaModel

SUPPRESS = [7, 12, 50360, 50361]
BEGIN_SUPPRESS = [220, 50257]


@pytest.fixture(scope="module")
def pair():
    torch = pytest.importorskip("torch")
    from transformers import (GenerationConfig as HFGenerationConfig,
                              WhisperConfig, WhisperForConditionalGeneration)

    dims = WhisperDims(
        vocab_size=51865,           # v2 layout -> real special-token ids
        num_mel_bins=16,
        d_model=48,
        encoder_layers=2,
        decoder_layers=2,
        encoder_attention_heads=4,
        decoder_attention_heads=4,
        encoder_ffn_dim=96,
        decoder_ffn_dim=96,
        max_source_positions=24,
        max_target_positions=48,
    )
    st = dims.special
    hf_cfg = WhisperConfig(
        vocab_size=dims.vocab_size,
        num_mel_bins=dims.num_mel_bins,
        d_model=dims.d_model,
        encoder_layers=dims.encoder_layers,
        decoder_layers=dims.decoder_layers,
        encoder_attention_heads=dims.encoder_attention_heads,
        decoder_attention_heads=dims.decoder_attention_heads,
        encoder_ffn_dim=dims.encoder_ffn_dim,
        decoder_ffn_dim=dims.decoder_ffn_dim,
        max_source_positions=dims.max_source_positions,
        max_target_positions=dims.max_target_positions,
        attn_implementation="eager",
        # pad != eos: HF zeroes the pad row via nn.Embedding(padding_idx=pad),
        # and with the tied vocab projection that would pin the eos logit to
        # exactly 0.0, making EOS unreachable under multiplicative penalties.
        pad_token_id=st.eos - 1,
        bos_token_id=st.eos,
        eos_token_id=st.eos,
        decoder_start_token_id=st.sot,
    )
    torch.manual_seed(0)
    hf = WhisperForConditionalGeneration(hf_cfg).eval()
    gc = HFGenerationConfig(
        pad_token_id=st.eos - 1, eos_token_id=st.eos,
        decoder_start_token_id=st.sot,
        suppress_tokens=list(SUPPRESS),
        begin_suppress_tokens=list(BEGIN_SUPPRESS))
    gc.no_timestamps_token_id = st.no_timestamps
    gc.lang_to_id = {"<|en|>": st.first_language}
    gc.task_to_id = {"transcribe": st.transcribe, "translate": st.translate}
    gc.is_multilingual = True
    hf.generation_config = gc

    wp = convert.from_hf_whisper(hf.state_dict(), dims,
                                 dtype=jnp.float32)
    medusa = MedusaConfig(medusa_num_heads=2, medusa_hidden_size=dims.d_model,
                          medusa_choices=(1, 1, 1))
    config = ModelConfig(dims=dims, medusa=medusa,
                         param_dtype="float32", compute_dtype="float32")
    mp = medusa_mod.init_medusa_params(jax.random.PRNGKey(1), dims, medusa,
                                       wp, jnp.float32)
    model = WhisperMedusaModel(config, {"whisper": wp, "medusa": mp})
    return hf, model, dims


def _mel(dims, b=2, seed=0):
    rng = np.random.default_rng(seed)
    return rng.normal(
        size=(b, dims.num_mel_bins, 2 * dims.max_source_positions)
    ).astype(np.float32)


def _hf_generate(hf, mel, max_length, **kw):
    import torch

    with torch.no_grad():
        return hf.generate(
            input_features=torch.from_numpy(mel), language="en",
            task="transcribe", return_timestamps=False,
            max_length=max_length, do_sample=False, **kw).numpy()


def _compare(model, hf, dims, max_length, seed=0, hf_model=None, **kw):
    mel = _mel(dims, seed=seed)
    hf_out = _hf_generate(hf_model if hf_model is not None else hf,
                          mel, max_length, **kw)
    ours = model.generate(
        mel, language="en", max_length=max_length, disable_medusa=True,
        suppress_tokens=SUPPRESS, begin_suppress_tokens=BEGIN_SUPPRESS,
        **{k: v for k, v in kw.items()
           if k == "exponential_decay_length_penalty"})
    prompt_len = 4   # [sot, lang, task, notimestamps]
    st = dims.special
    for i in range(mel.shape[0]):
        n = int(ours.lengths[i]) - prompt_len
        got = ours.sequences[i, prompt_len:prompt_len + n]
        # HF's shortform Whisper generate strips the init tokens AND the
        # trailing EOS, padding finished rows with pad_token_id.
        if n and got[-1] == st.eos:
            got = got[:-1]
            n -= 1
        want = hf_out[i][:n]
        np.testing.assert_array_equal(got, want)
        # Length semantics: every HF token past our length must be padding
        # (i.e. HF stopped exactly where we stopped).
        assert (hf_out[i][n:] == hf.generation_config.pad_token_id).all()
    return ours, hf_out


def test_greedy_token_parity(pair):
    """28 greedy steps with suppress lists: identical token streams."""
    hf, model, dims = pair
    ours, hf_out = _compare(model, hf, dims, max_length=32)
    assert (ours.sequences[:, :4] == np.array(
        [50258, 50259, 50359, 50363])).all()
    # Suppress lists actually bit: none of the suppressed ids appear.
    for t in SUPPRESS:
        assert not (hf_out == t).any()


def test_length_decay_processor_parity(pair):
    """exponential_decay_length_penalty numerics vs HF's processor, exactly.

    An end-to-end race is ill-conditioned by design (the penalty multiplies
    |eos| exponentially, so any f32 backend drift flips the argmax at some
    step), so the decay semantics are pinned at the processor level on shared
    logits instead (reference live kwarg: README.md:116-137)."""
    torch = pytest.importorskip("torch")
    from transformers.generation.logits_process import (
        ExponentialDecayLengthPenalty)

    from whisper_medusa_tpu.decoding.processors import (ProcessorConfig,
                                                        apply_processors)

    _, _, dims = pair
    st = dims.special
    rng = np.random.default_rng(7)
    logits = rng.normal(size=(3, dims.vocab_size)).astype(np.float32)
    for cur_len in (3, 5, 9, 20):
        hf_proc = ExponentialDecayLengthPenalty(
            (4, 3.0), st.eos, input_ids_seq_length=0)
        want = hf_proc(torch.zeros((3, cur_len), dtype=torch.long),
                       torch.from_numpy(logits.copy())).numpy()
        cfg = ProcessorConfig(vocab_size=dims.vocab_size,
                              eos_token_id=st.eos, begin_index=4,
                              exponential_decay_length_penalty=(4, 3.0))
        got = np.asarray(apply_processors(
            jnp.asarray(logits), jnp.full((3,), cur_len, jnp.int32), cfg))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_eos_stopping_parity(pair):
    """EOS stopping + post-EOS padding semantics vs HF, with a decisive EOS
    margin (the eos embedding row is rewritten to 1.5x the dominant token's
    row, so both frameworks see eos win by ~50% — no numeric knife-edge)."""
    torch = pytest.importorskip("torch")

    hf, model, dims = pair
    st = dims.special
    # Token 45697 is the run's attractor (greedy parity test shows both sides
    # settle on it with a positive logit); make eos's tied-embedding row 1.5x
    # its row so eos out-scores it decisively once it would win.
    import copy

    hf2 = copy.deepcopy(hf)
    with torch.no_grad():
        emb = hf2.model.decoder.embed_tokens.weight
        emb[st.eos] = 1.5 * emb[45697]
    wp = convert.from_hf_whisper(hf2.state_dict(), dims, dtype=jnp.float32)
    model2 = WhisperMedusaModel(
        model.config, {"whisper": wp, "medusa": model.params["medusa"]})
    ours, hf_out = _compare(model2, hf, dims, max_length=40, hf_model=hf2)
    assert (ours.lengths < 40).all()
    for i in range(hf_out.shape[0]):
        assert ours.sequences[i, int(ours.lengths[i]) - 1] == st.eos
