"""Public model API: ``WhisperMedusaModel`` — load, generate, save.

Mirrors the reference's user-facing surface (reference: whisper_medusa/models/
model.py:213-291 ``WhisperMedusaModel.from_pretrained`` / ``.generate`` — usage shown
in README.md:102-141) on top of the TPU-native engine:

  * ``from_pretrained`` loads either this framework's own checkpoints
    (config.json + params.safetensors) or a reference torch checkpoint directory
    (converted on the fly).
  * ``generate`` performs the audio-level orchestration of reference
    model.py:1419-1840: 30 s shortform framing, language detection / language+task
    init tokens, logits-processor setup, temperature-fallback ladder, EOS padding —
    but batched (the reference asserts batch size 1, model.py:1451) and with the whole
    decode loop jitted on device.
  * Longform (>30 s) works via a sequential timestamp-advancing seek loop —
    beyond the reference, which raises (model.py:1214, 1840).
"""

from __future__ import annotations

import dataclasses
import json
import os
import zlib
from functools import partial
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from whisper_medusa_tpu.config import (
    GenerationConfig,
    ModelConfig,
    SpecialTokens,
    default_begin_suppress_tokens,
    default_suppress_tokens,
    language_token_id,
)
from whisper_medusa_tpu.decoding.buffers import generate_medusa_buffers
from whisper_medusa_tpu.decoding.processors import ProcessorConfig
from whisper_medusa_tpu.decoding.speculative import SpecResult, speculative_generate
from whisper_medusa_tpu.models import convert, medusa as medusa_mod, whisper

Params = Dict[str, Any]


@dataclasses.dataclass
class GenerateOutput:
    sequences: np.ndarray          # (B, <=max_length) int32, EOS backfilled
    lengths: np.ndarray            # (B,)
    steps: int                     # decoder loop iterations (all fallback rounds)
    accepted: np.ndarray           # (B,) accepted draft tokens
    mean_accept_length: float      # accepted drafts per step — *the* speedup metric
    detected_language: Optional[List[str]] = None
    segments: Optional[List[List[dict]]] = None  # per-example timestamped segments
    no_speech_probs: Optional[np.ndarray] = None  # (B,) prob of <|nospeech|>
    token_logprobs: Optional[np.ndarray] = None   # (B, max_length) per-token scores
    avg_logprobs: Optional[np.ndarray] = None     # (B,) mean generated-token logprob
    # Loop iterations of the fallback rung that produced each kept sequence —
    # per-example provenance for accepted/token_logprobs (the reference keeps
    # per-segment scores the same way, model.py:1929-1969).
    steps_per_example: Optional[np.ndarray] = None  # (B,)
    # ``return_scores="full"``: the complete processed score stack —
    # (B, max_length - prompt_len, V) float32 log-probs, one row per generated
    # position (the reference's ``output_scores`` surface, model.py:716-758,
    # rebuilt post-hoc — see decoding/scores.py for why not in-loop).
    scores: Optional[np.ndarray] = None
    # ``return_cross_attentions``: captured cross-attention maps —
    # (L, B, H, T, S) for ``True`` or (N_sel, B, T, S) for an explicit
    # (layer, head) selection (reference output surface model.py:317-377).
    cross_attentions: Optional[np.ndarray] = None
    # ``word_timestamps=True``: per-example [{"word", "start", "end"}] lists
    # via cross-attention DTW (decoding/word_timestamps.py) — the reference
    # raises NotImplementedError for all timestamp modes (model.py:1171-1175).
    words: Optional[List[List[dict]]] = None
    # ``return_token_timestamps=True``: per-example (T_gen_i, 2) float64
    # arrays of DTW (start, end) seconds per GENERATED token (prompt rows
    # excluded; timestamp/EOS rows NaN) — HF's ``return_token_timestamps``
    # surface, which the reference consumes only in its unreachable shortform
    # tail (model.py:1781-1840).  Unlike ``words`` this needs no tokenizer.
    token_timestamps: Optional[List[np.ndarray]] = None
    # ``return_decoder_attentions``: decoder SELF-attention maps —
    # (L, B, H, T, T) for ``True`` or (N_sel, B, T, T) for a (layer, head)
    # selection (the reference's ``decoder_attentions``, model.py:317-377).
    decoder_attentions: Optional[np.ndarray] = None
    # ``return_hidden_states``: per-layer decoder hidden states
    # (L+1, B, T, D) — row 0 the embedding output, row 1+l layer l's output,
    # pre-ln_post (the reference's ``decoder_hidden_states``,
    # model.py:317-377; HF tuple layout).
    decoder_hidden_states: Optional[np.ndarray] = None
    # Longform (>30 s) composition: ``scores`` keeps the (B, T_out, V) layout
    # with row j the processed logprob row that emitted ``sequences[:, j]``;
    # the attention/hidden surfaces become per-example LISTS of per-window
    # dicts {"time_offset": s, "cross_attentions": ..., "decoder_attentions":
    # ..., "decoder_hidden_states": ...} (windows have no common positional
    # layout to stack over).  ``words`` carry absolute times across windows.


class WhisperMedusaModel:
    """Functional-core / thin-OO-shell model wrapper."""

    def __init__(self, config: ModelConfig, params: Params,
                 generation_config: Optional[GenerationConfig] = None,
                 special_tokens: Optional[SpecialTokens] = None):
        self.config = config
        self.params = params            # {"whisper": ..., "medusa": ...}
        # Special-token ids derived from the vocabulary layout (v2 vs v3), unless a
        # checkpoint generation config overrode them (see from_pretrained).
        self.special = special_tokens or config.dims.special
        self.generation_config = generation_config or GenerationConfig(
            max_length=config.dims.max_target_positions,
            eos_token_id=self.special.eos,
            pad_token_id=self.special.eos,
            decoder_start_token_id=self.special.sot,
            suppress_tokens=default_suppress_tokens(self.special),
            begin_suppress_tokens=default_begin_suppress_tokens(self.special),
        )
        self._jit_cache: Dict[Any, Any] = {}
        self.mesh = None               # set by .shard(); None = single-device

    # --------------------------------------------------------------- sharding
    def shard(self, mesh=None, dp: Optional[int] = None,
              tp: Optional[int] = None) -> "WhisperMedusaModel":
        """Place parameters on a (data, model) mesh; subsequent ``encode`` /
        ``generate`` / ``detect_language`` calls run DP over the batch and TP over
        attention heads + the vocab projection, with XLA inserting the ICI
        collectives (GSPMD).

        The reference gets DP transparently via accelerate/Trainer (reference:
        medusa_trainer_cls.py:142-156); here multi-chip inference is a first-class
        product surface: ``model.shard(dp=2, tp=4)`` or ``--dp/--tp`` on the CLIs.
        """
        from whisper_medusa_tpu.parallel import mesh as mesh_mod

        if mesh is None:
            n = None
            if dp and tp:
                n = dp * tp
            mesh = mesh_mod.make_mesh(n, dp=dp, tp=tp)
        tp_size = mesh.devices.shape[1]
        d = self.config.dims
        # Only the axes device_put actually splits must divide; the vocab axis
        # falls back to contraction-dim sharding when it doesn't (mesh.py).
        for name, v in (("d_model", d.d_model),
                        ("encoder_ffn_dim", d.encoder_ffn_dim),
                        ("decoder_ffn_dim", d.decoder_ffn_dim)):
            if v % tp_size != 0:
                raise ValueError(
                    f"tensor-parallel size {tp_size} does not divide {name}={v}")
        self.params = mesh_mod.shard_params(self.params, mesh)
        self.mesh = mesh
        self._jit_cache.clear()
        return self

    def _mesh_ctx(self):
        import contextlib

        return jax.set_mesh(self.mesh) if self.mesh is not None \
            else contextlib.nullcontext()

    def _put_batch(self, x: jnp.ndarray) -> jnp.ndarray:
        """Shard a batch-leading array over the data axis (replicate when the
        batch doesn't divide)."""
        if self.mesh is None:
            return x
        from whisper_medusa_tpu.parallel import mesh as mesh_mod

        dp = self.mesh.devices.shape[0]
        if x.shape[0] % dp == 0:
            return jax.device_put(x, mesh_mod.data_sharding(self.mesh))
        return jax.device_put(
            x, jax.sharding.NamedSharding(self.mesh,
                                          jax.sharding.PartitionSpec()))

    # ------------------------------------------------------------------ loading
    @classmethod
    def from_pretrained(cls, path: str, dtype: Optional[str] = None) -> "WhisperMedusaModel":
        """Load from a framework checkpoint dir or a reference torch checkpoint dir.

        Reads ``generation_config.json`` when present — suppress lists, special-token
        ids, thresholds, posterior hyperparameters — mirroring the reference, which
        pulls these from checkpoint metadata at load time (reference:
        whisper_medusa/models/model.py:279-290, 1177-1186) instead of hardcoding them.
        """
        if os.path.isfile(os.path.join(path, "config.json")):
            with open(os.path.join(path, "config.json")) as f:
                raw = json.load(f)
        else:
            raise FileNotFoundError(f"no config.json under {path}")
        if "dims" in raw:  # our format
            config = ModelConfig.from_dict(raw)
            if dtype:
                config = config.replace(param_dtype=dtype)
            jdt = jnp.dtype(config.param_dtype)
            from safetensors.numpy import load_file

            flat = load_file(os.path.join(path, "params.safetensors"))
            params = _unflatten(flat, jdt)
            gen_cfg, special = _load_generation_config(path, config)
            return cls(config, params, gen_cfg, special)
        # Reference/HF MedusaConfig format (reference: config_and_args.py:17-62).
        config = _config_from_hf_dict(raw)
        if dtype:
            config = config.replace(param_dtype=dtype)
        sd = convert.load_state_dict(path)
        params = convert.from_medusa_checkpoint(
            sd, config, jnp.dtype(config.param_dtype))
        gen_cfg, special = _load_generation_config(path, config)
        return cls(config, params, gen_cfg, special)

    @classmethod
    def from_random(cls, config: ModelConfig, seed: int = 0) -> "WhisperMedusaModel":
        """Fresh model: random Whisper + identity-init Medusa heads
        (reference: get_model(), model.py:2079-2097, when no checkpoint exists)."""
        r1, r2 = jax.random.split(jax.random.PRNGKey(seed))
        dt = jnp.dtype(config.param_dtype)
        wp = whisper.init_whisper_params(r1, config.dims, dt)
        mp = medusa_mod.init_medusa_params(r2, config.dims, config.medusa, wp, dt)
        return cls(config, {"whisper": wp, "medusa": mp})

    def quantize(self) -> "WhisperMedusaModel":
        """Return an int8 weight-only quantized serving copy.

        Decoder layer weights, the tied embedding, and the medusa block layer are
        stored int8 with per-channel scales and dequantized in VMEM by the Pallas
        matmul (ops/qmm.py) — roughly halving per-step decode HBM traffic.
        Inference-only; medusa==vanilla parity holds within the quantized model.
        """
        from whisper_medusa_tpu.ops.qmm import quantize_decoder

        wp, mp = quantize_decoder(self.params["whisper"],
                                  self.params.get("medusa"))
        return WhisperMedusaModel(self.config, {"whisper": wp, "medusa": mp})

    def save_pretrained(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        self.config.save(path)
        gd = self.generation_config.to_dict()
        gd["special_tokens"] = dataclasses.asdict(self.special)
        with open(os.path.join(path, "generation_config.json"), "w") as f:
            json.dump(gd, f, indent=2)
        from safetensors.numpy import save_file

        save_file(_flatten(self.params), os.path.join(path, "params.safetensors"))

    # ----------------------------------------------------------------- encoding
    def encode(self, input_features: jnp.ndarray) -> jnp.ndarray:
        fn = self._cached(
            "encode",
            lambda: jax.jit(partial(whisper.encode, dims=self.config.dims)),
        )
        dt = jnp.dtype(self.config.compute_dtype)
        feats = self._put_batch(jnp.asarray(input_features, dt))
        with self._mesh_ctx():
            return fn(self.params["whisper"], mel=feats)

    def detect_language(self, enc_out: jnp.ndarray) -> np.ndarray:
        """Single decoder step from <|sot|>, restricted to language tokens
        (HF ``detect_language`` semantics, used by reference generate via
        ``_retrieve_init_tokens``)."""
        fn = self._cached("detect_lang", lambda: jax.jit(
            partial(_detect_language, dims=self.config.dims,
                    special=self.special)))
        with self._mesh_ctx():
            return np.asarray(fn(self.params["whisper"], enc_out))

    # ----------------------------------------------------------------- generate
    def generate(
        self,
        input_features: Union[np.ndarray, jnp.ndarray],
        language: Optional[Union[str, Sequence[str]]] = None,
        task: str = "transcribe",
        max_length: Optional[int] = None,
        medusa_choices: Optional[Sequence[int]] = None,
        disable_medusa: bool = False,
        exponential_decay_length_penalty: Optional[Tuple[int, float]] = None,
        temperature: Union[float, Sequence[float]] = 0.0,
        compression_ratio_threshold: Optional[float] = None,
        logprob_threshold: Optional[float] = None,
        no_speech_threshold: Optional[float] = None,
        suppress_tokens: Optional[Sequence[int]] = "default",
        begin_suppress_tokens: Optional[Sequence[int]] = "default",
        return_timestamps: bool = False,
        num_beams: int = 1,
        prompt_ids: Optional[Sequence[int]] = None,
        max_initial_timestamp_index: Optional[int] = "default",
        time_precision: float = 0.02,
        condition_on_prev_tokens: bool = False,
        seed: int = 0,
        return_scores: Union[bool, str] = False,
        return_cross_attentions: Union[bool, Sequence[Tuple[int, int]]] = False,
        word_timestamps: bool = False,
        alignment_heads: Optional[Sequence[Tuple[int, int]]] = None,
        tokenizer=None,
        return_decoder_attentions: Union[bool, Sequence[Tuple[int, int]]] = False,
        return_hidden_states: bool = False,
        length_penalty: float = 1.0,
        prompt_condition_type: Optional[str] = None,
        return_token_timestamps: bool = False,
        max_new_tokens: Optional[int] = None,
        attention_mask: Optional[np.ndarray] = None,
        logits_processor: Optional[Callable] = None,
    ) -> GenerateOutput:
        """Transcribe a batch of 30 s mel segments.

        Mirrors reference ``generate`` kwargs that are live
        (language / exponential_decay_length_penalty: README.md:116-137).
        Beyond the reference: ``return_timestamps=True`` works (the reference
        raises NotImplementedError, model.py:1171-1175, and ships the timestamp
        processors only as dead code) — the speculative loop evaluates the Whisper
        timestamp rules mid-chain with full history.  Longform (>30 s) inputs run
        through a seek loop (also NotImplementedError in the reference).  Beam
        search works (``num_beams>1``; the reference raises,
        model.py:1153-1156) with GNMT ``length_penalty`` (HF semantics;
        n-best ordering follows the length-normalized score), and composes
        with longform: >30 s inputs run the seek loop with beam-decoded
        windows (thresholds/temperature fallback stay greedy-path-only).

        ``return_scores="full"`` materializes the complete per-position
        processed score stack (the reference's ``output_scores``,
        model.py:716-758); ``return_cross_attentions`` /
        ``return_decoder_attentions`` capture cross- / decoder-self-attention
        maps (all heads for ``True``, or a (layer, head) selection);
        ``return_hidden_states`` the per-layer decoder hidden states (the
        reference's ``decoder_attentions`` / ``decoder_hidden_states``
        surfaces, model.py:317-377); ``word_timestamps=True`` adds DTW
        word-level timestamps (requires ``return_timestamps=True`` and a
        ``tokenizer``); ``return_token_timestamps=True`` the per-token
        (start, end) DTW surface, no tokenizer needed (HF kwarg; dead code
        in the reference, model.py:1781-1840).  All are served by post-hoc
        teacher-forced passes —
        see decoding/scores.py and decoding/word_timestamps.py.  On longform
        input the surfaces compose per window — see the GenerateOutput field
        docs for the longform layouts.
        """
        if return_scores not in (False, True, "full"):
            raise ValueError(f"return_scores must be False/True/'full', "
                             f"got {return_scores!r}")
        # Prompt conditioning across longform windows (HF kwarg semantics,
        # generation_whisper.py::_set_prompt_condition_type — the reference
        # inherits the kwarg but raises on any longform input):
        # "first-segment" conditions only the first window on ``prompt_ids``;
        # "all-segments" keeps the prompt at the front of EVERY window's
        # previous-context block and requires condition_on_prev_tokens=True.
        if max_new_tokens is not None and int(max_new_tokens) < 1:
            raise ValueError(
                f"max_new_tokens must be >= 1, got {max_new_tokens}")
        if prompt_condition_type is None:
            prompt_condition_type = "first-segment"
        if prompt_condition_type not in ("first-segment", "all-segments"):
            raise ValueError(
                f"prompt_condition_type must be 'first-segment' or "
                f"'all-segments', got {prompt_condition_type!r}")
        if (prompt_condition_type == "all-segments"
                and not condition_on_prev_tokens):
            raise ValueError(
                "prompt_condition_type='all-segments' requires "
                "condition_on_prev_tokens=True (HF raises the same, "
                "generation_whisper.py::_set_prompt_condition_type)")
        if word_timestamps:
            if not return_timestamps:
                raise ValueError("word_timestamps=True requires "
                                 "return_timestamps=True (words are attached "
                                 "to segments, like OpenAI Whisper)")
            if tokenizer is None:
                raise ValueError("word_timestamps=True requires tokenizer= "
                                 "(token->word splitting needs the BPE vocab)")
        if num_beams != 1:
            # Beyond the reference (which raises, model.py:1153-1156): vanilla
            # beam search — speculation and beams are not combined.  Length
            # penalty and prompt conditioning are honored; the temperature
            # fallback ladder and its quality thresholds are rejected explicitly
            # rather than silently ignored.
            temps = ((temperature,) if isinstance(temperature, (int, float))
                     else tuple(temperature))
            unsupported = []
            if any(float(t) != 0.0 for t in temps) or len(temps) > 1:
                unsupported.append("temperature fallback")
            for name, v in (("compression_ratio_threshold",
                             compression_ratio_threshold),
                            ("logprob_threshold", logprob_threshold),
                            ("no_speech_threshold", no_speech_threshold)):
                if v is not None:
                    unsupported.append(name)
            if return_scores == "full" or return_cross_attentions or \
                    word_timestamps or return_decoder_attentions or \
                    return_hidden_states or return_token_timestamps:
                unsupported.append(
                    "full scores/attentions/hidden states/word timestamps")
            if unsupported:
                raise ValueError(
                    f"num_beams={num_beams} does not support: "
                    f"{', '.join(unsupported)} (sampling/fallback is a greedy-"
                    "path feature; run beams at temperature=0 without thresholds)")
            feats_b = jnp.asarray(input_features)
            if feats_b.ndim == 2:
                feats_b = feats_b[None]
            if feats_b.shape[-1] > self.config.dims.num_frames:
                # Beam x longform: the seek loop decodes each 30 s window with
                # beam search (timestamp rules drive the seek advancement
                # exactly as on the greedy path).  The reference supports
                # neither beams nor longform (model.py:1153-1156, 1214).
                return self._generate_longform(
                    feats_b, language=language, task=task,
                    max_length=max_length, medusa_choices=medusa_choices,
                    disable_medusa=disable_medusa,
                    exponential_decay_length_penalty=
                    exponential_decay_length_penalty,
                    temperature=0.0, compression_ratio_threshold=None,
                    logprob_threshold=None, no_speech_threshold=None,
                    return_timestamps=return_timestamps,
                    time_precision=time_precision,
                    condition_on_prev_tokens=condition_on_prev_tokens,
                    num_beams=num_beams, length_penalty=length_penalty,
                    prompt_ids=prompt_ids,
                    prompt_condition_type=prompt_condition_type,
                    max_new_tokens=max_new_tokens,
                    attention_mask=attention_mask,
                    logits_processor=logits_processor)
            return self._generate_beam(
                input_features, language=language, task=task,
                max_length=max_length, max_new_tokens=max_new_tokens,
                num_beams=num_beams,
                suppress_tokens=suppress_tokens,
                begin_suppress_tokens=begin_suppress_tokens,
                length_penalty=length_penalty,
                exponential_decay_length_penalty=exponential_decay_length_penalty,
                prompt_ids=prompt_ids,
                return_timestamps=return_timestamps,
                time_precision=time_precision,
                logits_processor=logits_processor)
        cfg = self.config
        feats = jnp.asarray(input_features)
        if feats.ndim == 2:
            feats = feats[None]
        b, n_mels, n_frames = feats.shape
        if n_mels != cfg.dims.num_mel_bins:
            raise ValueError(f"expected {cfg.dims.num_mel_bins} mel bins, got {n_mels}")
        frame_counts = None
        if attention_mask is not None:
            # HF kwarg: per-example REAL frame counts inside a right-padded
            # batch.  Shortform uses it to bound each example's live audio
            # for the DTW surfaces; longform bounds each example's seek loop.
            am = np.asarray(attention_mask).reshape(b, -1)
            if am.shape[1] != n_frames:
                raise ValueError(
                    f"attention_mask shape {np.asarray(attention_mask).shape}"
                    f" does not match features (B={b}, frames={n_frames})")
            frame_counts = am.astype(bool).sum(axis=1)
        if n_frames > cfg.dims.num_frames:
            # Longform: sequential 30 s seek loop with timestamp-based advancement
            # (the reference raises NotImplementedError here, model.py:1214, 1840).
            # Scores / attention maps / hidden states / word timestamps compose
            # per window (each window's post-hoc capture runs inside the inner
            # shortform call; times shift by the window offset) — see the
            # GenerateOutput longform field docs.
            return self._generate_longform(
                feats, language=language, task=task, max_length=max_length,
                medusa_choices=medusa_choices, disable_medusa=disable_medusa,
                exponential_decay_length_penalty=exponential_decay_length_penalty,
                temperature=temperature,
                compression_ratio_threshold=compression_ratio_threshold,
                logprob_threshold=logprob_threshold,
                no_speech_threshold=no_speech_threshold,
                return_timestamps=return_timestamps,
                time_precision=time_precision,
                condition_on_prev_tokens=condition_on_prev_tokens,
                return_scores=return_scores,
                return_cross_attentions=return_cross_attentions,
                word_timestamps=word_timestamps,
                alignment_heads=alignment_heads, tokenizer=tokenizer,
                return_decoder_attentions=return_decoder_attentions,
                return_hidden_states=return_hidden_states,
                prompt_ids=prompt_ids,
                prompt_condition_type=prompt_condition_type,
                return_token_timestamps=return_token_timestamps,
                max_new_tokens=max_new_tokens,
                attention_mask=attention_mask,
                logits_processor=logits_processor)
        if n_frames < cfg.dims.num_frames:
            feats = jnp.pad(feats, ((0, 0), (0, 0),
                                    (0, cfg.dims.num_frames - n_frames)))

        enc_out = self.encode(feats)
        st = self.special

        # --- init tokens: [<|sot|>, <|lang|>, <|task|>, <|notimestamps|>] ---
        detected = None
        if language is None:
            lang_ids = self.detect_language(enc_out)
            detected = [
                st.languages[i - st.first_language] for i in lang_ids
            ]
        elif isinstance(language, str):
            lang_ids = np.full((b,), language_token_id(language, st), np.int64)
        else:
            if len(language) != b:
                raise ValueError("per-example language list length != batch size")
            lang_ids = np.array([language_token_id(l, st) for l in language])
        task_id = st.transcribe if task == "transcribe" else st.translate
        cols = [np.full((b,), st.sot), lang_ids, np.full((b,), task_id)]
        if not return_timestamps:
            cols.append(np.full((b,), st.no_timestamps))
        prompt = np.stack(cols, axis=1).astype(np.int32)
        if prompt_ids is not None:
            # Prompt conditioning: prepend the previous-context tokens before the
            # init tokens (reference shortform path, model.py:1794-1801).
            pids = np.asarray(prompt_ids, np.int32).reshape(1, -1)
            prompt = np.concatenate([np.tile(pids, (b, 1)), prompt], axis=1)

        # --- configs ---
        max_length = max_length or cfg.dims.max_target_positions
        if max_new_tokens is not None:
            # HF precedence: max_new_tokens wins over max_length (the
            # reference resolves the same way through GenerationConfig,
            # model.py:1014-1084).  Clamped to the positional ceiling so a
            # longform window with a longer conditioning prompt shrinks its
            # budget instead of raising mid-seek-loop.
            max_length = min(prompt.shape[1] + int(max_new_tokens),
                             cfg.dims.max_target_positions)
        if prompt.shape[1] >= max_length:
            raise ValueError(
                f"prompt length {prompt.shape[1]} exceeds max_length {max_length} "
                f"(reference raises the analogous error, model.py:1803-1815)")
        gd = self.generation_config
        sup = tuple(suppress_tokens) if suppress_tokens not in (None, "default") else (
            gd.suppress_tokens if suppress_tokens == "default" else None)
        bsup = tuple(begin_suppress_tokens) if begin_suppress_tokens not in (None, "default") else (
            gd.begin_suppress_tokens if begin_suppress_tokens == "default" else None)
        if max_initial_timestamp_index == "default":
            max_initial_timestamp_index = gd.max_initial_timestamp_index
        pcfg = ProcessorConfig(
            vocab_size=cfg.dims.vocab_size,
            suppress_tokens=sup,
            begin_suppress_tokens=bsup,
            begin_index=prompt.shape[1],
            # regulation_start counts *generated* tokens; the processor works in
            # absolute positions (HF passes input_ids_seq_length == prompt length
            # to ExponentialDecayLengthPenalty — pinned by
            # tests/test_hf_generate_parity.py).
            exponential_decay_length_penalty=(
                (int(exponential_decay_length_penalty[0]) + prompt.shape[1],
                 float(exponential_decay_length_penalty[1]))
                if exponential_decay_length_penalty else None),
            eos_token_id=st.eos,
            timestamp_rules=return_timestamps,
            timestamp_begin=st.timestamp_begin,
            no_timestamps_id=st.no_timestamps,
            max_initial_timestamp_index=max_initial_timestamp_index,
            custom=logits_processor,
        )
        if disable_medusa:
            choices: Tuple[int, ...] = (1,)
            variant = "vanilla"
        else:
            choices = tuple(medusa_choices or cfg.medusa.medusa_choices)
            variant = cfg.medusa.medusa_heads_type

        temps = (temperature,) if isinstance(temperature, (int, float)) else tuple(temperature)

        # Temperature-fallback ladder with *subset retry* and per-example result
        # provenance (the reference re-generates only the failing sequences and
        # keeps per-segment scores, model.py:1991-2005, 1929-1969): after the
        # first rung only the still-failing examples are re-decoded — gathered
        # into a power-of-two bucket so the jit cache stays bounded — and every
        # returned metric (tokens, lengths, logprobs, accepted, steps, no-speech
        # logits) comes from the rung that produced that example's kept sequence.
        keep = np.zeros((b,), bool)
        merged: Dict[str, np.ndarray] = {}
        steps_total = 0
        for t_i, temp in enumerate(temps):
            fail = np.arange(b) if t_i == 0 else np.where(~keep)[0]
            gen = GenerationConfig(
                max_length=max_length,
                temperature=float(temp),
                eos_token_id=st.eos,
                pad_token_id=gd.pad_token_id,
                decoder_start_token_id=st.sot,
                suppress_tokens=sup,
                begin_suppress_tokens=bsup,
                posterior_threshold=gd.posterior_threshold,
                posterior_alpha=gd.posterior_alpha,
            )
            # temp>0 retries are *sampled* (multinomial over the tempered
            # verification logits, deterministic per (seed, ladder index)) — the
            # reference sets do_sample=True for temp>0 (model.py:1878-1886) so a
            # stochastic retry can escape the failure mode that triggered fallback.
            rng = (jax.random.fold_in(jax.random.PRNGKey(seed), t_i)
                   if float(temp) > 0.0 else None)
            if t_i == 0:
                sub_enc, sub_prompt = enc_out, prompt
            else:
                bucket = 1 << (len(fail) - 1).bit_length()
                rows_idx = np.concatenate(
                    [fail, np.full((bucket - len(fail),), fail[0])])
                sub_enc = jnp.take(enc_out, rows_idx, axis=0)
                sub_prompt = prompt[rows_idx]
            result = self._run_decode(choices, variant, pcfg, gen, sub_enc,
                                      jnp.asarray(sub_prompt), rng=rng)
            steps_total += int(result.steps)
            rows = {
                "tokens": np.asarray(result.tokens),
                "lengths": np.asarray(result.lengths),
                "logprobs": np.asarray(result.logprobs),
                "accepted": np.asarray(result.accepted),
                "steps": np.full((np.asarray(result.lengths).shape[0],),
                                 int(result.steps), np.int64),
            }
            if result.first_logits is not None:
                rows["first_logits"] = np.asarray(result.first_logits,
                                                  np.float32)
            if t_i == 0:
                merged = {k: v.copy() for k, v in rows.items()}
            else:
                for k, v in rows.items():
                    merged[k][fail] = v[: len(fail)]
            avg_lp = _avg_from_captured(rows["logprobs"], rows["lengths"],
                                        prompt.shape[1])
            bad = _needs_fallback(
                rows["tokens"], rows["lengths"], prompt.shape[1],
                compression_ratio_threshold, avg_lp, logprob_threshold,
                vocab_size=cfg.dims.vocab_size)
            keep[fail] = ~bad[: len(fail)]
            if keep.all():
                break

        final_tokens = merged["tokens"]
        lengths = merged["lengths"]
        # Accepted drafts per step, each example scored against its own rung's
        # loop count (collapses to accepted.sum()/steps when no fallback ran).
        mean_acc = float(np.sum(merged["accepted"]
                                / np.maximum(merged["steps"], 1)))
        # No-speech detection (the reference raises NotImplementedError here,
        # model.py:1201-1205): prob of <|nospeech|> at the first decode position;
        # a segment counts as silence when it exceeds the threshold and the average
        # logprob is below logprob_threshold (HF semantics).
        no_speech_probs = None
        if "first_logits" in merged:
            fl = merged["first_logits"]
            p = np.exp(fl - fl.max(-1, keepdims=True))
            p /= p.sum(-1, keepdims=True)
            no_speech_probs = p[:, st.no_speech]
        final_avg_lp = _avg_from_captured(
            merged["logprobs"], lengths, prompt.shape[1])
        if no_speech_threshold is not None and no_speech_probs is not None:
            silent = no_speech_probs > no_speech_threshold
            if logprob_threshold is not None:
                silent &= final_avg_lp < logprob_threshold
            for i in np.where(silent)[0]:
                final_tokens[i, prompt.shape[1]:] = gd.pad_token_id
                lengths[i] = prompt.shape[1]
        segments = None
        if return_timestamps:
            segments = [
                _extract_segments(final_tokens[i], int(lengths[i]),
                                  prompt.shape[1], time_precision, st)
                for i in range(final_tokens.shape[0])
            ]

        # ---- opt-in post-hoc outputs (decoding/scores.py rationale) ----
        full_score_stack = None
        if return_scores == "full":
            from whisper_medusa_tpu.decoding import scores as scores_mod

            full_score_stack = scores_mod.full_scores(
                self.params["whisper"], cfg.dims, final_tokens, lengths,
                enc_out, pcfg, max_length)
        cross_attns = None
        words = None
        token_tts = None
        dec_attns = None
        dec_hidden = None
        want_align = word_timestamps or return_token_timestamps
        if (return_cross_attentions or want_align
                or return_decoder_attentions or return_hidden_states):
            # ONE teacher-forced capture pass serves every surface: full
            # capture when asked for every head, else the union of the user's
            # selection and the alignment heads (only those maps leave HBM).
            select = None
            if return_cross_attentions and return_cross_attentions is not True:
                select = tuple((int(l), int(h))
                               for l, h in return_cross_attentions)
            align_sel = ()
            if want_align:
                from whisper_medusa_tpu.decoding import word_timestamps as wt

                align_sel = tuple(
                    (int(l), int(h)) for l, h in (
                        alignment_heads
                        or self.generation_config.alignment_heads
                        or wt.default_alignment_heads(
                            cfg.dims.decoder_layers,
                            cfg.dims.decoder_attention_heads)))
            full_capture = return_cross_attentions is True
            need_cross = bool(return_cross_attentions) or want_align
            want = (None if full_capture
                    else tuple(dict.fromkeys((select or ()) + align_sel)))
            cross_arg = (None if not need_cross
                         else "all" if full_capture else want)
            self_arg = None
            if return_decoder_attentions is True:
                self_arg = "all"
            elif return_decoder_attentions:
                self_arg = tuple((int(l), int(h))
                                 for l, h in return_decoder_attentions)
            dec_in = jnp.asarray(final_tokens[:, :max_length], jnp.int32)
            _, maps, smaps, hid = jax.jit(
                lambda p, t, e: whisper.decode_train_capture(
                    p, cfg.dims, t, e, cross=cross_arg, self_attn=self_arg,
                    collect_hidden=return_hidden_states)
            )(self.params["whisper"], dec_in, enc_out)
            if smaps is not None:
                dec_attns = np.asarray(smaps, np.float32)
            if hid is not None:
                dec_hidden = np.asarray(hid, np.float32)
            maps = None if maps is None else np.asarray(maps, np.float32)
            if full_capture:
                cross_attns = maps                      # (L, B, H, T, S)
            elif select:
                cross_attns = maps[[want.index(p) for p in select]]
            if want_align:
                if full_capture:                        # (L, B, H, T, S)
                    amaps = np.stack([maps[l][:, h] for l, h in align_sel])
                else:
                    amaps = maps[[want.index(p) for p in align_sel]]
                live_frames = min(n_frames, cfg.dims.num_frames) // 2
                words = [] if word_timestamps else None
                token_tts = [] if return_token_timestamps else None
                for i in range(final_tokens.shape[0]):
                    li = int(lengths[i])
                    # Attention row for a generated token = the query at the
                    # token's own position (it is input at that position in
                    # the teacher-forced replay).
                    rows = np.arange(prompt.shape[1], li)
                    gen_i = final_tokens[i, prompt.shape[1]:li]
                    maps_i = amaps[:, i][:, rows]
                    # attention_mask narrows the live audio per example
                    # (right-padded batches): the DTW must not align tokens
                    # onto padding frames.
                    lf_i = (live_frames if frame_counts is None else
                            max(min(int(frame_counts[i]),
                                    cfg.dims.num_frames) // 2, 1))
                    spans = None
                    if return_token_timestamps:
                        spans = wt.per_token_times(gen_i, maps_i,
                                                   lf_i, st.eos)
                        token_tts.append(spans)
                    if word_timestamps:
                        # One DTW serves both surfaces (token_spans reuse).
                        words.append(wt.words_with_times(
                            gen_i, maps_i, tokenizer, lf_i, st.eos,
                            st.timestamp_begin, token_spans=spans))
                if word_timestamps and segments is not None:
                    _attach_words_to_segments(segments, words)

        return GenerateOutput(
            sequences=final_tokens,
            lengths=lengths,
            steps=steps_total,
            accepted=merged["accepted"],
            mean_accept_length=mean_acc,
            detected_language=detected,
            segments=segments,
            no_speech_probs=no_speech_probs,
            token_logprobs=merged["logprobs"],
            avg_logprobs=final_avg_lp,
            steps_per_example=merged["steps"],
            scores=full_score_stack,
            cross_attentions=cross_attns,
            words=words,
            token_timestamps=token_tts,
            decoder_attentions=dec_attns,
            decoder_hidden_states=dec_hidden,
        )

    def _generate_longform(
        self, feats, *, language, task, max_length, medusa_choices,
        disable_medusa, exponential_decay_length_penalty, temperature,
        compression_ratio_threshold, logprob_threshold,
        no_speech_threshold=None, return_timestamps=False,
        time_precision=0.02, condition_on_prev_tokens: bool = False,
        return_scores=False, return_cross_attentions=False,
        word_timestamps=False, alignment_heads=None, tokenizer=None,
        return_decoder_attentions=False, return_hidden_states=False,
        num_beams: int = 1, length_penalty: float = 1.0,
        prompt_ids: Optional[Sequence[int]] = None,
        prompt_condition_type: str = "first-segment",
        return_token_timestamps: bool = False,
        max_new_tokens: Optional[int] = None,
        attention_mask: Optional[np.ndarray] = None,
        logits_processor: Optional[Callable] = None,
    ) -> GenerateOutput:
        """Sequential seek loop over 30 s windows (reference scaffolding:
        model.py:1591-1703, unreachable there for >30 s inputs).

        Each window is decoded *with* timestamp rules so the seek pointer can
        advance to the end of the last complete segment (mel frame = 10 ms,
        timestamp unit = 20 ms); timestamps are stripped from the output unless
        requested.

        ``no_speech_threshold`` composes (HF longform semantics): a window whose
        <|nospeech|> probability exceeds the threshold (and, when
        ``logprob_threshold`` is also set, whose avg logprob is below it) is
        skipped — the seek pointer advances a full window and no tokens or
        segments are emitted for it.  The inner shortform call does the
        blanking; an emptied window naturally yields no segments here.

        Batching: with ``b > 1`` and no previous-context conditioning, each
        round decodes EVERY example's current window in one batched call —
        per-example seek pointers advance independently on the host, finished
        examples ride along (outputs ignored) so shapes stay static.  The
        conditioned path stays sequential (per-example prompts of different
        bucketed lengths can't share one prompt tensor).

        Metrics: ``steps`` counts decode-loop iterations summed over rounds
        (each batched round serves every active example at once, so it is not
        comparable to the sequential path's per-example sum); ``accepted`` /
        ``mean_accept_length`` are accumulated over *active* examples only.

        Capture surfaces compose per window (VERDICT r4 #4; the reference
        raises for ALL of this, model.py:1171-1175, 1214): each inner
        shortform call runs its own post-hoc capture; word/segment times
        shift by the window's seek offset; score rows follow the kept tokens
        (one row per emitted token); attention maps / hidden states are
        returned as per-example lists of per-window dicts keyed by
        ``time_offset`` (no common positional layout exists to stack over).

        Prompt conditioning (HF kwargs; the reference inherits them but
        raises on longform): ``prompt_condition_type="first-segment"``
        prepends ``prompt_ids`` to the FIRST window only — with
        ``condition_on_prev_tokens`` the prompt then ages out of the rolling
        context like any earlier window's text (HF keeps it while it fits the
        cut-off window; same spirit, simpler bound).  ``"all-segments"``
        (requires ``condition_on_prev_tokens=True``) keeps the prompt text at
        the FRONT of every window's previous-context block, ahead of the
        bucketed rolling text (HF ``_prepare_decoder_input_ids``:
        ``prev_ids = prompt_ids`` before the padded active segments).
        """
        cfg = self.config
        st = self.special
        b, _, total_frames = feats.shape
        if attention_mask is not None:
            am = np.asarray(attention_mask).reshape(b, -1)
            if am.shape[1] != total_frames:
                raise ValueError(
                    f"attention_mask shape {np.asarray(attention_mask).shape}"
                    f" does not match features (B={b}, frames={total_frames})")
            totals = [int(c) for c in am.astype(bool).sum(axis=1)]
        else:
            totals = [total_frames] * b
        win = cfg.dims.num_frames
        prompt_len = 3  # [sot, lang, task] — timestamp mode
        user_prompt = (list(np.asarray(prompt_ids, np.int32).reshape(-1))
                       if prompt_ids is not None else None)
        # Prompt text without a leading <|startofprev|> (HF strips it the same
        # way before composing it with rolling context,
        # generation_whisper.py::_prepare_segments).
        user_prompt_text = None
        if user_prompt:
            user_prompt_text = (user_prompt[1:]
                                if user_prompt[0] == st.start_of_prev
                                else list(user_prompt))
        all_tokens: List[List[int]] = [[] for _ in range(b)]
        all_segments: List[List[dict]] = [[] for _ in range(b)]
        steps_total, accepted_total = 0, 0
        want_caps = bool(return_cross_attentions or return_decoder_attentions
                         or return_hidden_states)
        all_words: List[List[dict]] = [[] for _ in range(b)]
        all_caps: List[List[dict]] = [[] for _ in range(b)]
        all_score_rows: List[List[np.ndarray]] = [[] for _ in range(b)]
        all_lp_rows: List[List[np.ndarray]] = [[] for _ in range(b)]
        all_tt_rows: List[List[np.ndarray]] = [[] for _ in range(b)]
        cap_kwargs = dict(
            return_scores=return_scores,
            return_cross_attentions=return_cross_attentions,
            word_timestamps=word_timestamps,
            alignment_heads=alignment_heads, tokenizer=tokenizer,
            return_decoder_attentions=return_decoder_attentions,
            return_hidden_states=return_hidden_states,
            return_token_timestamps=return_token_timestamps)

        def fold_window(i, out, row, p_len, seek):
            """Fold example ``i``'s kept tokens, segments and capture surfaces
            from window output row ``row`` into the running transcript;
            returns ``(advance_frames, kept_tokens)``.

            When the window contains complete segments and more audio remains,
            the seek advances to the last complete segment's end and
            everything after that boundary — tokens, words, the trailing
            incomplete segment — is DROPPED: that audio is re-decoded from the
            next window's start, so emitting it here would duplicate the
            overlap (OpenAI transcribe.py / HF ``_retrieve_segment``
            semantics).  Otherwise the full window is emitted and the seek
            advances a whole window."""
            t_off = seek * 0.01
            segs = out.segments[row]
            complete_ends = [s["end"] for s in segs if s["end"] is not None]
            advance, cut_time = win, None
            if complete_ends and seek + win < totals[i]:
                adv = int(round(complete_ends[-1] / 0.01))
                if adv > 0:
                    advance = min(adv, win)
                    cut_time = complete_ends[-1]
                    segs = [s for s in segs if s["end"] is not None]
            raw = np.asarray(out.sequences[row, p_len: out.lengths[row]])
            if cut_time is not None:
                cut = _cut_after_last_complete(raw, st.timestamp_begin, st.eos)
                if cut is not None:
                    raw = raw[:cut]
            keep = raw != st.eos
            if not return_timestamps:
                keep &= raw < st.timestamp_begin
            all_tokens[i].extend(raw[keep].tolist())
            if out.token_logprobs is not None:   # beam windows: n-best scores
                lp = np.asarray(out.token_logprobs[row, p_len: p_len + len(raw)])
                all_lp_rows[i].append(lp[keep])
            if out.scores is not None:
                all_score_rows[i].append(out.scores[row, : len(raw)][keep])
            if out.token_timestamps is not None:
                # Rows align 1:1 with the generated region (same cut as raw);
                # the window offset shifts real times, NaN rows stay NaN.
                tt = out.token_timestamps[row][: len(raw)][keep]
                all_tt_rows[i].append(tt + t_off)
            for s in segs:
                all_segments[i].append({
                    "start": s["start"] + t_off,
                    "end": None if s["end"] is None else s["end"] + t_off,
                    "tokens": s["tokens"],
                })
            if out.words is not None:
                all_words[i].extend(
                    {**w, "start": w["start"] + t_off, "end": w["end"] + t_off}
                    for w in out.words[row]
                    if cut_time is None or w["start"] < cut_time)
            if want_caps:
                entry = {"time_offset": t_off}
                if out.cross_attentions is not None:
                    entry["cross_attentions"] = out.cross_attentions[:, row]
                if out.decoder_attentions is not None:
                    entry["decoder_attentions"] = out.decoder_attentions[:, row]
                if out.decoder_hidden_states is not None:
                    entry["decoder_hidden_states"] = \
                        out.decoder_hidden_states[:, row]
                all_caps[i].append(entry)
            return advance, raw[keep].tolist()

        def pad_window(window):
            if window.shape[-1] < win:
                floor = float(window.min()) if window.size else 0.0
                window = np.pad(
                    window, ((0, 0), (0, 0), (0, win - window.shape[-1])),
                    constant_values=floor)
            return window

        if b > 1 and not condition_on_prev_tokens:
            seeks = [0] * b
            active = [True] * b
            guard, guard_max = 0, 4 * (total_frames // win + 2)
            while any(active) and guard < guard_max:
                guard += 1
                windows = [pad_window(np.asarray(
                    feats[i: i + 1, :, seeks[i]: seeks[i] + win]))
                    for i in range(b)]
                win_mask = None
                if attention_mask is not None:
                    # Each row's live frames inside its own current window.
                    live = [min(max(totals[i] - seeks[i], 0), win)
                            for i in range(b)]
                    win_mask = (np.arange(win)[None, :]
                                < np.asarray(live)[:, None]).astype(np.int32)
                # first-segment prompt conditioning: round 1 is every
                # example's first window (all seeks start at 0), so the
                # shared prompt tensor applies exactly there.
                round_prompt = user_prompt if guard == 1 else None
                out = self.generate(
                    np.concatenate(windows, axis=0), language=language,
                    task=task, max_length=max_length,
                    medusa_choices=medusa_choices,
                    disable_medusa=disable_medusa,
                    exponential_decay_length_penalty=
                    exponential_decay_length_penalty,
                    temperature=temperature,
                    compression_ratio_threshold=compression_ratio_threshold,
                    logprob_threshold=logprob_threshold,
                    no_speech_threshold=no_speech_threshold,
                    return_timestamps=True, time_precision=time_precision,
                    num_beams=num_beams, length_penalty=length_penalty,
                    max_new_tokens=max_new_tokens,
                    attention_mask=win_mask,
                    logits_processor=logits_processor,
                    prompt_ids=round_prompt, **cap_kwargs)
                steps_total += out.steps
                p_len_round = prompt_len + (len(round_prompt)
                                            if round_prompt else 0)
                # Finished 'rider' rows decode too (static shapes) but their
                # accepted counts must not inflate the speedup metric.
                accepted_total += int(sum(
                    out.accepted[i] for i in range(b) if active[i]))
                for i in range(b):
                    if not active[i]:
                        continue
                    adv, _ = fold_window(i, out, i, p_len_round, seeks[i])
                    seeks[i] += adv
                    if seeks[i] >= totals[i]:
                        active[i] = False
            if any(active):
                _warn_longform_truncation(
                    [(i, seeks[i], totals[i]) for i in range(b) if active[i]])
            return self._longform_output(
                all_tokens, all_segments, steps_total, accepted_total,
                return_timestamps, all_words=all_words, all_caps=all_caps,
                all_score_rows=all_score_rows,
                all_lp_rows=all_lp_rows if num_beams == 1 else None,
                all_tt_rows=all_tt_rows if return_token_timestamps else None,
                return_scores=return_scores, word_timestamps=word_timestamps,
                want_caps=want_caps)

        for i in range(b):
            lang_i = language if (language is None or isinstance(language, str)) \
                else language[i]
            seek = 0
            guard, guard_max = 0, 4 * (total_frames // win + 2)
            prev_text: List[int] = []
            while seek < totals[i] and guard < guard_max:
                guard += 1
                window = pad_window(
                    np.asarray(feats[i: i + 1, :, seek: seek + win]))
                # Previous-context conditioning (reference plumbing:
                # do_condition_on_prev_tokens; HF semantics).  Rolling-context
                # lengths are bucketed so at most 4 decode shapes ever compile
                # (the user prompt's fixed length adds at most one more).
                # The bucket must also FIT a user-supplied max_length: the
                # context is best-effort, so it shrinks (down to none) rather
                # than letting a later window's longer prompt raise mid-loop
                # and discard the windows already decoded.
                fixed = 1 + (len(user_prompt_text)
                             if (user_prompt_text
                                 and prompt_condition_type == "all-segments")
                             else 0)
                room = ((max_length or cfg.dims.max_target_positions)
                        - prompt_len - 1)
                bucket = 0
                if condition_on_prev_tokens and prev_text:
                    for cand in (64, 32, 16):
                        if len(prev_text) >= cand and fixed + cand <= room:
                            bucket = cand
                            break
                rolling = prev_text[-bucket:] if bucket else []
                window_prompt = None
                if (user_prompt and seek == 0
                        and prompt_condition_type == "first-segment"):
                    # First window: the user prompt conditions it directly
                    # (same prepend as the shortform path).
                    window_prompt = list(user_prompt)
                elif (user_prompt_text
                      and prompt_condition_type == "all-segments"):
                    # Every window: prompt text rides at the FRONT of the
                    # previous-context block, rolling text after it.
                    window_prompt = ([st.start_of_prev] + user_prompt_text
                                     + rolling)
                elif rolling:
                    window_prompt = [st.start_of_prev] + rolling
                out = self.generate(
                    window, language=lang_i, task=task, max_length=max_length,
                    medusa_choices=medusa_choices, disable_medusa=disable_medusa,
                    exponential_decay_length_penalty=exponential_decay_length_penalty,
                    temperature=temperature,
                    compression_ratio_threshold=compression_ratio_threshold,
                    logprob_threshold=logprob_threshold,
                    no_speech_threshold=no_speech_threshold,
                    return_timestamps=True,
                    time_precision=time_precision,
                    num_beams=num_beams, length_penalty=length_penalty,
                    max_new_tokens=max_new_tokens,
                    attention_mask=(
                        None if attention_mask is None
                        else (np.arange(win)
                              < min(max(totals[i] - seek, 0), win)
                              )[None, :].astype(np.int32)),
                    logits_processor=logits_processor,
                    prompt_ids=window_prompt, **cap_kwargs)
                steps_total += out.steps
                accepted_total += int(out.accepted.sum())
                p_len = prompt_len + (len(window_prompt) if window_prompt else 0)
                # Advance to the end of the last *complete* segment when
                # possible; conditioning context is the KEPT (cut) text only.
                adv, kept = fold_window(i, out, 0, p_len, seek)
                prev_text = [t for t in kept if t < st.eos]
                seek += adv
            if seek < totals[i]:
                _warn_longform_truncation([(i, seek, totals[i])])

        return self._longform_output(
            all_tokens, all_segments, steps_total, accepted_total,
            return_timestamps, all_words=all_words, all_caps=all_caps,
            all_score_rows=all_score_rows,
            all_lp_rows=all_lp_rows if num_beams == 1 else None,
            all_tt_rows=all_tt_rows if return_token_timestamps else None,
            return_scores=return_scores, word_timestamps=word_timestamps,
            want_caps=want_caps)

    def _longform_output(self, all_tokens, all_segments, steps_total,
                         accepted_total, return_timestamps, *,
                         all_words=None, all_caps=None, all_score_rows=None,
                         all_lp_rows=None, all_tt_rows=None,
                         return_scores=False, word_timestamps=False,
                         want_caps=False) -> GenerateOutput:
        st = self.special
        b = len(all_tokens)
        max_len_out = max((len(t) for t in all_tokens), default=0) + 1
        sequences = np.full((b, max_len_out), st.eos, np.int32)
        lengths = np.zeros((b,), np.int32)
        for i, toks in enumerate(all_tokens):
            sequences[i, : len(toks)] = toks
            lengths[i] = len(toks)
        # In-loop per-token logprobs compose for free: row j scores the token
        # that landed at sequences[:, j].
        token_logprobs = None
        avg_logprobs = None
        if all_lp_rows is not None:
            token_logprobs = np.zeros((b, max_len_out), np.float32)
            avg_logprobs = np.zeros((b,), np.float32)
            for i, rows in enumerate(all_lp_rows):
                lp = (np.concatenate(rows) if rows
                      else np.zeros((0,), np.float32))
                token_logprobs[i, : len(lp)] = lp
                avg_logprobs[i] = lp.mean() if len(lp) else 0.0
        scores = None
        if return_scores == "full" and all_score_rows is not None:
            v = self.config.dims.vocab_size
            scores = np.zeros((b, max_len_out, v), np.float32)
            for i, rows in enumerate(all_score_rows):
                if rows:
                    stk = np.concatenate(rows, axis=0)
                    scores[i, : stk.shape[0]] = stk
        words = all_words if word_timestamps else None
        if words is not None and return_timestamps and all_segments:
            _attach_words_to_segments(all_segments, words)
        token_tts = None
        if all_tt_rows is not None:
            token_tts = [
                (np.concatenate(rows, axis=0) if rows
                 else np.zeros((0, 2), np.float64))
                for rows in all_tt_rows]
        return GenerateOutput(
            sequences=sequences, lengths=lengths, steps=steps_total,
            accepted=np.asarray([accepted_total]),
            mean_accept_length=accepted_total / max(steps_total, 1),
            segments=all_segments if return_timestamps else None,
            token_logprobs=token_logprobs, avg_logprobs=avg_logprobs,
            scores=scores, words=words, token_timestamps=token_tts,
            cross_attentions=all_caps if want_caps else None,
        )

    def generate_stream(
        self,
        input_features: Union[np.ndarray, jnp.ndarray],
        language: Optional[str] = None,
        task: str = "transcribe",
        max_length: Optional[int] = None,
        chunk_tokens: int = 16,
        disable_medusa: bool = False,
    ):
        """Streaming generation: yields ``(sequences_so_far, lengths, finished)``
        every ~``chunk_tokens`` committed tokens.

        Plays the reference's ``streamer`` role (model.py:758-759) with the decode
        state held on device between segments; the final tokens are identical to a
        single :meth:`generate` call.  Greedy shortform only.
        """
        cfg = self.config
        st = self.special
        feats = jnp.asarray(input_features)
        if feats.ndim == 2:
            feats = feats[None]
        b = feats.shape[0]
        enc_out = self.encode(feats)
        if language is None:
            lang_ids = self.detect_language(enc_out)
        else:
            lang_ids = np.full((b,), language_token_id(language, st), np.int64)
        task_id = st.transcribe if task == "transcribe" else st.translate
        prompt = np.stack([
            np.full((b,), st.sot), lang_ids, np.full((b,), task_id),
            np.full((b,), st.no_timestamps)], axis=1).astype(np.int32)
        max_length = max_length or cfg.dims.max_target_positions
        gd = self.generation_config
        pcfg = ProcessorConfig(
            vocab_size=cfg.dims.vocab_size, suppress_tokens=gd.suppress_tokens,
            begin_suppress_tokens=gd.begin_suppress_tokens,
            begin_index=prompt.shape[1], eos_token_id=st.eos)
        gen = GenerationConfig(max_length=max_length, eos_token_id=st.eos,
                               pad_token_id=gd.pad_token_id,
                               decoder_start_token_id=st.sot)
        if disable_medusa:
            buffers = generate_medusa_buffers([1])
            variant, mp = "vanilla", None
        else:
            buffers = generate_medusa_buffers(cfg.medusa.medusa_choices)
            variant, mp = cfg.medusa.medusa_heads_type, self.params["medusa"]

        key = ("stream", variant, pcfg, gen, enc_out.shape, prompt.shape)
        if key not in self._jit_cache:
            start = jax.jit(partial(
                speculative_generate, dims=cfg.dims, buffers=buffers, pcfg=pcfg,
                gen=gen, variant=variant, return_state=True))
            resume = jax.jit(partial(
                speculative_generate, dims=cfg.dims, buffers=buffers, pcfg=pcfg,
                gen=gen, variant=variant, return_state=True))
            self._jit_cache[key] = (start, resume)
        start, resume = self._jit_cache[key]

        stop = jnp.int32(prompt.shape[1] + chunk_tokens)
        prompt_dev = self._put_batch(jnp.asarray(prompt))
        with self._mesh_ctx():
            result, state = start(self.params["whisper"], mp, enc_out=enc_out,
                                  prompt=prompt_dev, stop_len=stop)
        while True:
            lengths = np.asarray(result.lengths)
            finished = bool(np.asarray(state.finished).all())
            yield np.asarray(result.tokens), lengths, finished
            if finished:
                return
            stop = jnp.int32(int(lengths.max()) + chunk_tokens)
            with self._mesh_ctx():
                result, state = resume(
                    self.params["whisper"], mp, enc_out=enc_out,
                    prompt=prompt_dev, stop_len=stop, resume_state=state)

    def _generate_beam(self, input_features, *, language, task, max_length,
                       num_beams, suppress_tokens="default",
                       begin_suppress_tokens="default",
                       length_penalty: float = 1.0,
                       exponential_decay_length_penalty=None,
                       prompt_ids: Optional[Sequence[int]] = None,
                       return_timestamps: bool = False,
                       time_precision: float = 0.02,
                       max_new_tokens: Optional[int] = None,
                       logits_processor: Optional[Callable] = None
                       ) -> GenerateOutput:
        from whisper_medusa_tpu.decoding.beam import beam_search

        cfg = self.config
        st = self.special
        feats = jnp.asarray(input_features)
        if feats.ndim == 2:
            feats = feats[None]
        b = feats.shape[0]
        n_frames = feats.shape[-1]
        if n_frames > cfg.dims.num_frames:
            # generate() routes longform beam requests through the seek loop
            # (_generate_longform(num_beams=...)); this direct entry point is
            # per-window only.
            raise ValueError(
                f"_generate_beam is per-window: got {n_frames} mel frames > "
                f"{cfg.dims.num_frames}; call generate(num_beams=...) which "
                "runs the longform seek loop with beam-decoded windows")
        if n_frames < cfg.dims.num_frames:
            feats = jnp.pad(feats, ((0, 0), (0, 0),
                                    (0, cfg.dims.num_frames - n_frames)))
        enc_out = self.encode(feats)
        if language is None:
            lang_ids = self.detect_language(enc_out)
        elif isinstance(language, str):
            lang_ids = np.full((b,), language_token_id(language, st), np.int64)
        else:
            # Per-example languages work on beams exactly like the greedy path.
            if len(language) != b:
                raise ValueError("per-example language list length != batch size")
            lang_ids = np.array([language_token_id(l, st) for l in language])
        task_id = st.transcribe if task == "transcribe" else st.translate
        cols = [np.full((b,), st.sot), lang_ids, np.full((b,), task_id)]
        if not return_timestamps:
            cols.append(np.full((b,), st.no_timestamps))
        prompt = np.stack(cols, axis=1).astype(np.int32)
        if prompt_ids is not None:
            pids = np.asarray(prompt_ids, np.int32).reshape(1, -1)
            prompt = np.concatenate([np.tile(pids, (b, 1)), prompt], axis=1)
        max_length = max_length or cfg.dims.max_target_positions
        if max_new_tokens is not None:
            # Same HF precedence + clamp as the greedy path above.
            max_length = min(prompt.shape[1] + int(max_new_tokens),
                             cfg.dims.max_target_positions)
        if prompt.shape[1] >= max_length:
            raise ValueError(
                f"prompt length {prompt.shape[1]} exceeds max_length "
                f"{max_length} (reference raises the analogous error, "
                f"model.py:1803-1815)")
        gd = self.generation_config
        sup = tuple(suppress_tokens) if suppress_tokens not in (None, "default") \
            else (gd.suppress_tokens if suppress_tokens == "default" else None)
        bsup = tuple(begin_suppress_tokens) \
            if begin_suppress_tokens not in (None, "default") \
            else (gd.begin_suppress_tokens if begin_suppress_tokens == "default"
                  else None)
        pcfg = ProcessorConfig(
            vocab_size=cfg.dims.vocab_size, suppress_tokens=sup,
            begin_suppress_tokens=bsup, begin_index=prompt.shape[1],
            # start is relative to generated tokens; processor positions are
            # absolute (see generate() above / test_hf_generate_parity.py).
            exponential_decay_length_penalty=(
                (int(exponential_decay_length_penalty[0]) + prompt.shape[1],
                 float(exponential_decay_length_penalty[1]))
                if exponential_decay_length_penalty else None),
            eos_token_id=st.eos, timestamp_rules=return_timestamps,
            timestamp_begin=st.timestamp_begin,
            no_timestamps_id=st.no_timestamps,
            max_initial_timestamp_index=gd.max_initial_timestamp_index,
            custom=logits_processor)
        gen = GenerationConfig(max_length=max_length, eos_token_id=st.eos,
                               pad_token_id=gd.pad_token_id,
                               decoder_start_token_id=st.sot)
        key = ("beam", num_beams, length_penalty, pcfg, gen, enc_out.shape,
               prompt.shape)
        if key not in self._jit_cache:
            self._jit_cache[key] = jax.jit(partial(
                beam_search, dims=cfg.dims, pcfg=pcfg, gen=gen,
                num_beams=num_beams, length_penalty=length_penalty))
        with self._mesh_ctx():
            res = self._jit_cache[key](self.params["whisper"], enc_out=enc_out,
                                       prompt=self._put_batch(jnp.asarray(prompt)))
        sequences = np.asarray(res.tokens)
        lengths = np.asarray(res.lengths)
        segments = None
        if return_timestamps:
            segments = [
                _extract_segments(sequences[i], int(lengths[i]),
                                  prompt.shape[1], time_precision, st)
                for i in range(b)
            ]
        return GenerateOutput(
            sequences=sequences, lengths=lengths,
            steps=int(res.steps), accepted=np.zeros((b,), np.int32),
            mean_accept_length=0.0,
            avg_logprobs=np.asarray(res.scores), segments=segments)

    def score_sequences(self, enc_out: jnp.ndarray, sequences: np.ndarray,
                        lengths: np.ndarray, prompt_len: int) -> np.ndarray:
        """Average per-token log-probability of the generated tokens.

        Drives the ``logprob_threshold`` fallback criterion (reference delegates to
        HF ``_need_fallback``/``_retrieve_avg_logprobs``, model.py:1961-1969) via a
        single teacher-forced scoring pass."""
        fn = self._cached("score", lambda: jax.jit(
            partial(_avg_logprobs, dims=self.config.dims)))
        with self._mesh_ctx():
            return np.asarray(fn(self.params["whisper"], enc_out,
                                 jnp.asarray(sequences), jnp.asarray(lengths),
                                 prompt_len))

    # ------------------------------------------------------------------ helpers
    def _run_decode(self, choices, variant, pcfg, gen, enc_out, prompt,
                    rng=None) -> SpecResult:
        sampled = rng is not None
        key = ("decode", choices, variant, pcfg, gen, enc_out.shape,
               prompt.shape, sampled)
        if key not in self._jit_cache:
            buffers = generate_medusa_buffers(choices)
            medusa_params = None if variant == "vanilla" else self.params["medusa"]
            fn = jax.jit(partial(
                speculative_generate,
                dims=self.config.dims, buffers=buffers, pcfg=pcfg, gen=gen,
                variant=variant,
            ))
            self._jit_cache[key] = (fn, medusa_params)
        fn, medusa_params = self._jit_cache[key]
        kw = {"rng": rng} if sampled else {}
        with self._mesh_ctx():
            return fn(self.params["whisper"], medusa_params,
                      enc_out=enc_out, prompt=self._put_batch(prompt), **kw)

    def _cached(self, key, build):
        if key not in self._jit_cache:
            self._jit_cache[key] = build()
        return self._jit_cache[key]


# ---------------------------------------------------------------------------


def _warn_longform_truncation(dropped: List[Tuple[int, int, int]]) -> None:
    """Loud (non-fatal) report when the longform guard loop trips: the seek
    pointer stopped advancing (pathological zero-advance windows) and the
    remaining audio was dropped rather than transcribed."""
    import logging

    for i, seek, total in dropped:
        logging.getLogger("whisper_medusa_tpu").warning(
            "longform guard tripped for example %d: seek stalled at mel frame "
            "%d of %d — audio beyond %.1f s was dropped", i, seek, total,
            seek * 0.01)


def _detect_language(params, enc_out, dims, special: SpecialTokens):
    b = enc_out.shape[0]
    sot = jnp.full((b, 1), special.sot, jnp.int32)
    out = whisper.decode_train(params, dims, sot, enc_out)
    logits = whisper.project_logits(params, out.hidden[:, -1])
    lang_lo = special.first_language
    lang_hi = special.first_language + special.num_languages
    mask = (jnp.arange(logits.shape[-1]) >= lang_lo) & (
        jnp.arange(logits.shape[-1]) < lang_hi)
    logits = jnp.where(mask, logits, -jnp.inf)
    return jnp.argmax(logits, axis=-1)


def _avg_from_captured(logprobs: np.ndarray, lengths: np.ndarray,
                       prompt_len: int) -> np.ndarray:
    """Mean generated-token logprob from the loop-captured per-token scores."""
    b, L = logprobs.shape
    pos = np.arange(L)[None, :]
    mask = (pos >= prompt_len) & (pos < lengths[:, None])
    total = np.where(mask, logprobs, 0.0).sum(-1)
    return total / np.maximum(mask.sum(-1), 1)


def _avg_logprobs(params, enc_out, sequences, lengths, prompt_len, dims):
    """Teacher-forced mean log-prob of generated tokens (positions >= prompt_len,
    < length)."""
    from whisper_medusa_tpu.models import whisper as _w

    dec_in = sequences[:, :-1]
    out = _w.decode_train(params, dims, dec_in, enc_out)
    logits = _w.project_logits(params, out.hidden)          # (B, L-1, V) f32
    logp = jax.nn.log_softmax(logits, axis=-1)
    tgt = sequences[:, 1:]
    tok_lp = jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    pos = jnp.arange(tgt.shape[1])[None, :]
    mask = (pos >= prompt_len - 1) & (pos < (lengths - 1)[:, None])
    total = jnp.sum(jnp.where(mask, tok_lp, 0.0), axis=-1)
    count = jnp.maximum(jnp.sum(mask, axis=-1), 1)
    return total / count


def _extract_segments(tokens: np.ndarray, length: int, prompt_len: int,
                      time_precision: float = 0.02,
                      special: Optional[SpecialTokens] = None) -> List[dict]:
    """Split a timestamped token sequence into segments.

    Equivalent of the reference's `_retrieve_segment` role (delegated to HF,
    model.py:1683-1700): consecutive timestamp pairs bracket text spans."""
    st = special or SpecialTokens()
    ts_begin = st.timestamp_begin
    seq = tokens[prompt_len:length]
    segments: List[dict] = []
    start_ts = None
    text: List[int] = []
    for tok in seq.tolist():
        if tok >= ts_begin:
            if start_ts is None:
                start_ts = tok
            else:
                segments.append({
                    "start": (start_ts - ts_begin) * time_precision,
                    "end": (tok - ts_begin) * time_precision,
                    "tokens": text,
                })
                start_ts, text = None, []
        elif tok == st.eos:
            break
        else:
            text.append(tok)
    if start_ts is not None and text:
        segments.append({
            "start": (start_ts - ts_begin) * time_precision,
            "end": None,
            "tokens": text,
        })
    return segments


def _cut_after_last_complete(raw: np.ndarray, ts_begin: int,
                             eos: int) -> Optional[int]:
    """Index one past the closing timestamp of the last complete segment.

    Mirrors ``_extract_segments``'s alternating open/close timestamp pairing;
    returns None when no segment closes before EOS (emit everything)."""
    cut = None
    start_seen = False
    for j, tok in enumerate(raw.tolist()):
        if tok == eos:
            break
        if tok >= ts_begin:
            if start_seen:
                cut = j + 1
                start_seen = False
            else:
                start_seen = True
    return cut


def _attach_words_to_segments(segments: List[List[dict]],
                              words: List[List[dict]]) -> None:
    """Attach word dicts to the segment whose [start, end) span contains the
    word's midpoint (OpenAI groups words into segments the same way)."""
    for segs, wrds in zip(segments, words):
        for seg in segs:
            seg["words"] = []
        for w in wrds:
            mid = 0.5 * (w["start"] + w["end"])
            target = None
            for seg in segs:
                end = seg["end"] if seg["end"] is not None else float("inf")
                if seg["start"] <= mid < end:
                    target = seg
                    break
            if target is None and segs:
                target = min(
                    segs, key=lambda s: abs(s["start"] - w["start"]))
            if target is not None:
                target["words"].append(w)


def _compression_ratio(token_ids: np.ndarray, vocab_size: int) -> float:
    """HF-exact compression ratio (transformers ``_retrieve_compression_ratio``):
    tokens packed little-endian into ``int(log2(vocab)/8) + 1`` bytes each
    (2 bytes for whisper vocabularies) before zlib."""
    length = int(np.log2(vocab_size) / 8) + 1
    seq = b"".join(int(t).to_bytes(length, "little") for t in token_ids.tolist())
    if not seq:
        return 0.0
    return len(seq) / max(len(zlib.compress(seq)), 1)


def _needs_fallback(tokens, lengths, prompt_len, compression_ratio_threshold,
                    avg_logprobs=None, logprob_threshold=None,
                    vocab_size: int = 51865):
    """Quality gate for the temperature ladder (reference: model.py:1929-1969
    delegating to HF ``_need_fallback``; compression-ratio + avg-logprob criteria)."""
    b = tokens.shape[0]
    bad = np.zeros((b,), bool)
    if compression_ratio_threshold is not None:
        for i in range(b):
            ratio = _compression_ratio(tokens[i, prompt_len: lengths[i]],
                                       vocab_size)
            bad[i] |= ratio > compression_ratio_threshold
    if logprob_threshold is not None and avg_logprobs is not None:
        bad |= np.asarray(avg_logprobs) < logprob_threshold
    return bad


def _load_generation_config(
    path: str, config: ModelConfig,
) -> Tuple[Optional[GenerationConfig], Optional[SpecialTokens]]:
    """Parse a checkpoint's ``generation_config.json`` (HF or our own format).

    The reference reads suppress lists, token-id maps, and the Medusa posterior
    hyperparameters from the checkpoint generation config (reference:
    model.py:279-290 ``update_generation_config``, 1177-1186); HF whisper
    generation configs additionally carry ``lang_to_id``/``task_to_id``/
    ``no_timestamps_token_id``/``prev_sot_token_id``, from which the full special-
    token layout is recovered.  Returns (None, None) when the file is absent —
    callers then fall back to vocabulary-derived defaults.
    """
    p = os.path.join(path, "generation_config.json")
    if not os.path.isfile(p):
        return None, None
    with open(p) as f:
        raw = json.load(f)

    derived = config.dims.special
    if "special_tokens" in raw:           # our save format: exact round-trip
        special = SpecialTokens(**raw["special_tokens"])
    else:                                 # HF whisper generation config
        kw = {}
        if raw.get("eos_token_id") is not None:
            kw["eos"] = int(raw["eos_token_id"])
        if raw.get("decoder_start_token_id") is not None:
            kw["sot"] = int(raw["decoder_start_token_id"])
        lang_to_id = raw.get("lang_to_id")
        if lang_to_id:
            ids = sorted(int(v) for v in lang_to_id.values())
            kw["first_language"] = ids[0]
            kw["num_languages"] = len(ids)
        task_to_id = raw.get("task_to_id")
        if task_to_id:
            if "transcribe" in task_to_id:
                kw["transcribe"] = int(task_to_id["transcribe"])
            if "translate" in task_to_id:
                kw["translate"] = int(task_to_id["translate"])
        if raw.get("prev_sot_token_id") is not None:
            kw["start_of_prev"] = int(raw["prev_sot_token_id"])
            kw["start_of_lm"] = int(raw["prev_sot_token_id"]) - 1
        if raw.get("no_timestamps_token_id") is not None:
            nt = int(raw["no_timestamps_token_id"])
            kw["no_timestamps"] = nt
            kw["timestamp_begin"] = nt + 1
            kw["no_speech"] = nt - 1
        special = dataclasses.replace(derived, **kw)

    gen_kw: Dict[str, Any] = dict(
        max_length=int(raw.get("max_length", config.dims.max_target_positions)),
        eos_token_id=special.eos,
        pad_token_id=int(raw["pad_token_id"]) if raw.get("pad_token_id")
        is not None else special.eos,
        decoder_start_token_id=special.sot,
        suppress_tokens=tuple(raw["suppress_tokens"])
        if raw.get("suppress_tokens") is not None
        else default_suppress_tokens(special),
        begin_suppress_tokens=tuple(raw["begin_suppress_tokens"])
        if raw.get("begin_suppress_tokens") is not None
        else default_begin_suppress_tokens(special),
    )
    for k in ("posterior_threshold", "posterior_alpha", "temperature",
              "compression_ratio_threshold", "logprob_threshold",
              "no_speech_threshold"):
        if raw.get(k) is not None:
            gen_kw[k] = float(raw[k])
    if raw.get("max_initial_timestamp_index") is not None:
        gen_kw["max_initial_timestamp_index"] = int(
            raw["max_initial_timestamp_index"])
    if raw.get("exponential_decay_length_penalty") is not None:
        gen_kw["exponential_decay_length_penalty"] = tuple(
            raw["exponential_decay_length_penalty"])
    if raw.get("temperature_fallback") is not None:
        gen_kw["temperature_fallback"] = tuple(raw["temperature_fallback"])
    return GenerationConfig(**gen_kw), special


def _config_from_hf_dict(raw: dict) -> ModelConfig:
    """Build a ModelConfig from a reference/HF MedusaConfig json dict."""
    from whisper_medusa_tpu.config import MedusaConfig, WhisperDims

    dims = WhisperDims(
        vocab_size=raw.get("vocab_size", 51865),
        num_mel_bins=raw.get("num_mel_bins", 80),
        d_model=raw.get("d_model", 1280),
        encoder_layers=raw.get("encoder_layers", 32),
        encoder_attention_heads=raw.get("encoder_attention_heads", 20),
        decoder_layers=raw.get("decoder_layers", 32),
        decoder_attention_heads=raw.get("decoder_attention_heads", 20),
        encoder_ffn_dim=raw.get("encoder_ffn_dim", 5120),
        decoder_ffn_dim=raw.get("decoder_ffn_dim", 5120),
        max_source_positions=raw.get("max_source_positions", 1500),
        max_target_positions=raw.get("max_target_positions", 448),
    )
    n_heads = raw.get("medusa_num_heads", 10)
    medusa = MedusaConfig(
        medusa_num_heads=n_heads,
        medusa_num_layers=raw.get("medusa_num_layers", 1),
        medusa_hidden_size=raw.get("medusa_hidden_size", dims.d_model),
        medusa_choices=tuple(raw.get("medusa_choices", [1] * (n_heads + 1))),
        medusa_heads_type=raw.get("medusa_heads_type", "base_head"),
        medusa_loss_on_original=raw.get("medusa_loss_on_original", False),
        medusa_kl_loss=raw.get("medusa_kl_loss", False),
        medusa_kl_weight=raw.get("medusa_kl_weight", 0.0),
        output_whisper_original=raw.get("output_whisper_original", False),
    )
    return ModelConfig(dims=dims, medusa=medusa,
                       whisper_model_name=raw.get("whisper_model_name",
                                                  "openai/whisper-large-v2"))


def _flatten(tree: Params, prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    for k, v in tree.items():
        key = f"{prefix}{k}" if not prefix else f"{prefix}/{k}"
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            # Copy: np views of JAX buffers can alias (identical constants are
            # deduplicated by the runtime) which corrupts safetensors serialization.
            out[key] = np.array(v, copy=True)
    return out


def _unflatten(flat: Dict[str, np.ndarray], dtype) -> Params:
    tree: Params = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(v, dtype)
    return tree
