"""High-level Whisper runtime: capture, substitution, transcription.

Functional replacement for the reference's hook-based trio
(``WhisperActivationCache``, ``WhisperSubbedActivation``,
``activations_from_audio`` — src/models/hooked_model.py:86-195). One runtime
object owns the params and a cache of jitted programs keyed by the static
(capture, substitute, batch-shape) signature:

* ``activations(mels)`` — captured activations at the runtime's layer. For
  encoder layers this is one encoder forward: the reference runs a full
  autoregressive ``model.decode`` just to fire an encoder hook
  (hooked_model.py:103-110); collection here never touches the decoder (the
  structural win called out in SURVEY.md §3.2). ``decoder.*`` layers ARE
  supported — greedy decode + one teacher-forced captured pass
  (``decode_capture``), covering every decode step where the reference's
  hook keeps only the last forward.
* ``transcribe(mels, substitute=...)`` — encoder (optionally with a layer's
  output replaced) + greedy decoder, for transcript-bearing paths
  (validation, /manipulate_feature).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .decoding import beam_decode, detect_language, greedy_decode, sample_decode
from .load import load_model
from .model import encoder_forward
from .tokenizer import decode_text, language_index, special_tokens


def fallback_accepts(text, sum_lp, n_text, no_speech_prob,
                     compression_ratio_threshold, logprob_threshold,
                     no_speech_threshold):
    """whisper transcribe.py decode_with_fallback's acceptance rule for one
    clip/window — the SINGLE implementation both transcribe_with_fallback
    and the long-audio per-window ladder use (so the thresholds can't
    drift). → (accept, compression_ratio, avg_logprob)."""
    import zlib

    ratio = 0.0
    if text:
        raw = text.encode("utf-8")
        ratio = len(raw) / max(len(zlib.compress(raw)), 1)
    avg_lp = sum_lp / (n_text + 1.0)
    accept = True
    if (compression_ratio_threshold is not None
            and "<tok:" not in text
            and ratio > compression_ratio_threshold):
        # "<tok:N>" means the zero-asset placeholder rendering: its repeated
        # scaffolding compresses to ratio ≈ 2.9 regardless of content, so
        # gating on it would reject EVERY rung and force the whole ladder
        # to the t=1.0 sample — skip the repetition gate without BPE assets
        accept = False  # too repetitive
    if logprob_threshold is not None and avg_lp < logprob_threshold:
        accept = False  # average log probability too low
    if (no_speech_threshold is not None
            and no_speech_prob > no_speech_threshold):
        accept = True  # confident silence: don't escalate
    return accept, ratio, avg_lp


@partial(jax.jit, static_argnames=("dims", "capture", "compute_dtype",
                                   "sub_layer"))
def _encode_impl(params, mels, sub_value=None, *, dims, capture,
                 compute_dtype, sub_layer=None):
    substitute = {sub_layer: sub_value} if sub_layer else None
    return encoder_forward(
        params, dims, mels, capture=capture, substitute=substitute,
        compute_dtype=compute_dtype,
    )


def _check_encoder_layer(layer_name: str, what: str) -> None:
    """Tensor substitution (an encode-side splice) runs inside the encoder
    forward only — a ``decoder.*`` name would silently no-op (the tap never
    matches), so reject it loudly. Decoder-layer CAPTURE is supported
    (``decode_capture``), and decoder-layer STEERING is supported as an
    online per-position transform (``transcribe(decoder_tap=…)``) — a fixed
    precomputed tensor is the one interface that cannot work for an
    autoregressive decode (the positions don't exist yet), which is also why
    the reference's hook-based substitution only ever runs on encoder
    modules (manipulation configs are all encoder-side,
    configs/features/*.json)."""
    if layer_name.startswith("decoder."):
        raise ValueError(
            f"{what} supports encoder layers only, got {layer_name!r} — "
            "decoder-layer capture works via activations(); for decoder-"
            "layer steering pass decoder_tap=(layer_idx, fn, fn_params) "
            "(an online per-position transform) instead of a tensor"
        )


def decode_capture(params, dims, mels, layer_name, *, sot_seq, lang_detect,
                   lang_base, max_new, compute_dtype):
    """Decoder-layer activation capture for one mel batch (jit-composable).

    The reference's ``WhisperActivationCache`` hooks ANY named module during
    ``model.decode`` (hooked_model.py:47-56) — for decoder layers the hook
    fires once per decode step. This is the fixed-shape equivalent: greedy
    decode, then ONE teacher-forced captured pass over the decoded tokens —
    causal masking makes position ``i``'s activation identical to what the
    incremental step that processed token ``i`` produced (modulo fp
    reassociation), so the capture covers EVERY decode step, not just the
    hook's last overwrite (hooked_model.py:112-118 keeps only the final
    forward).

    → ``(acts (b, n_prompt+max_new, d), tokens, n_valid (b,))`` where
    ``n_valid = n_prompt + n_text`` counts the positions the decode actually
    processed (the forward at position n_valid−1 sampled the first EOT);
    rows beyond it are EOT-padding garbage and are masked by the store's
    per-file ``n_frames`` metadata.
    """
    from .model import decoder_forward

    encoded, _ = encoder_forward(params, dims, mels,
                                 compute_dtype=compute_dtype)
    b = encoded.shape[0]
    prompt = jnp.tile(jnp.asarray(sot_seq, jnp.int32)[None], (b, 1))
    if lang_detect:
        lang_idx = detect_language(params, dims, encoded,
                                   compute_dtype=compute_dtype)
        prompt = prompt.at[:, 1].set(lang_base + lang_idx)
    n_prompt = len(sot_seq)
    tokens, _, n_text, _ = sample_decode(
        params, dims, encoded, prompt, n_prompt, max_new=max_new,
        compute_dtype=compute_dtype,
    )
    _, caps = decoder_forward(params, dims, tokens, encoded,
                              capture=(layer_name,),
                              compute_dtype=compute_dtype)
    n_valid = (n_prompt + n_text).astype(jnp.int32)
    return caps[layer_name], tokens, n_valid


@partial(jax.jit, static_argnames=("dims", "layer_name", "sot_seq",
                                   "lang_detect", "lang_base", "max_new",
                                   "compute_dtype"))
def _decode_capture_impl(params, mels, *, dims, layer_name, sot_seq,
                         lang_detect, lang_base, max_new, compute_dtype):
    return decode_capture(params, dims, mels, layer_name, sot_seq=sot_seq,
                          lang_detect=lang_detect, lang_base=lang_base,
                          max_new=max_new, compute_dtype=compute_dtype)


class WhisperRuntime:
    """Jit-cached Whisper forward passes for one model + capture layer."""

    def __init__(
        self,
        model_name: str,
        layer_name: Optional[str] = None,
        compute_dtype=jnp.float32,
        max_new_tokens: int = 224,
        language: Optional[str] = None,
        task: str = "transcribe",
    ):
        """``language=None`` auto-detects per clip (multilingual models only),
        mirroring the reference's default DecodingOptions; pass a code like
        ``"en"`` to pin it and skip the detection step. ``task`` is whisper's
        DecodingOptions.task: "transcribe" (default) or "translate"
        (any-language → English, multilingual models only)."""
        if task not in ("transcribe", "translate"):
            raise ValueError(f"task must be transcribe|translate, got {task!r}")
        self.model_name = model_name
        self.layer_name = layer_name
        self.compute_dtype = compute_dtype
        self.max_new_tokens = max_new_tokens
        self.language = language
        self.task = task
        self.params, self.dims = load_model(model_name)
        self._st = special_tokens(self.dims.n_vocab)
        if task == "translate" and not self._st.multilingual:
            # sot_sequence has no task slot for English-only vocabularies —
            # silently transcribing instead would drop the user's option
            raise ValueError(
                f"{model_name!r} is English-only; task='translate' needs a "
                "multilingual model"
            )

        capture = (layer_name,) if layer_name else ()
        # module-level jit keyed on (dims, capture, compute_dtype): every
        # runtime with the same geometry SHARES the compiled executable.
        # Per-instance closures would reload/recompile per object — on
        # remote backends an executable load costs seconds, and repeated
        # collections in one process (bench warmup → timed run, server
        # restarts of a runtime) paid it every time.
        self._encode = partial(
            _encode_impl, dims=self.dims, capture=capture,
            compute_dtype=compute_dtype,
        )

    # -- capture ------------------------------------------------------------

    def activations(self, mels: jnp.ndarray) -> jnp.ndarray:
        """Captured activations at ``layer_name`` for (b, n_mels, 3000) mels.

        Encoder layers: one captured encoder forward (b, 1500, d). Decoder
        layers (``decoder.*``): greedy decode + one teacher-forced captured
        pass → (b, n_prompt+max_new, d) EOT-padded; use
        ``activations_with_lengths`` for the per-clip valid position counts
        (capability parity with the reference's module-name-agnostic hooks,
        hooked_model.py:47-56 — see ``decode_capture``)."""
        if self.layer_name is None:
            raise ValueError("runtime was built without a capture layer")
        if self.layer_name.startswith("decoder."):
            return self.activations_with_lengths(mels)[0]
        mels = self._batch(mels)
        _, caps = self._encode(self.params, mels)
        return caps[self.layer_name]

    def activations_with_lengths(
        self, mels: jnp.ndarray
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """→ (activations, n_valid (b,) int32) — valid leading positions per
        clip. Encoder layers: n_valid is the full frame axis (callers with
        audio lengths refine it, see loaders); decoder layers: the number of
        positions the greedy decode actually processed."""
        if self.layer_name is None:
            raise ValueError("runtime was built without a capture layer")
        if self.layer_name.startswith("decoder."):
            acts, n_valid, _ = self.activations_with_decode(mels)
            return acts, n_valid
        mels = self._batch(mels)
        _, caps = self._encode(self.params, mels)
        acts = caps[self.layer_name]
        return acts, jnp.full((acts.shape[0],), acts.shape[1], jnp.int32)

    def activations_with_decode(
        self, mels: jnp.ndarray
    ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Decoder layers only: → (activations, n_valid, tokens) where
        ``tokens`` (b, n_prompt+max_new) are the greedy-decoded ids the
        teacher-forced capture pass ran over. The capture program already
        decodes the clip (decode_capture), and its settings mirror
        ``transcribe`` exactly (same sot sequence, language handling,
        max_new, greedy sampling) — callers that also want the baseline
        transcript should render THESE tokens instead of paying a second
        full encode+decode program (see FeatureAnalyzer._manipulate_decoder).
        """
        if self.layer_name is None or not self.layer_name.startswith("decoder."):
            raise ValueError(
                "activations_with_decode needs a decoder.* capture layer, "
                f"got {self.layer_name!r}")
        mels = self._batch(mels)
        acts, tokens, n_valid = _decode_capture_impl(
            self.params, mels, dims=self.dims,
            layer_name=self.layer_name, **self._decode_capture_statics()
        )
        return acts, n_valid, tokens

    def decode_tokens_text(self, tokens) -> list[str]:
        """Render decoded token rows to transcripts — the same
        ``decode_text`` post-processing ``transcribe`` applies."""
        return [decode_text(row, self.dims.n_vocab)
                for row in np.asarray(tokens)]

    def _decode_capture_statics(self) -> dict:
        """Static (sot_seq, lang handling) kwargs for ``decode_capture`` —
        a pinned ``language`` bakes the token into the prompt; otherwise
        multilingual models detect per clip inside the same program."""
        st = self._st
        lang_detect = st.multilingual and self.language is None
        lang_index = (language_index(self.language, self.dims.n_vocab)
                      if (st.multilingual and self.language) else 0)
        sot_seq = st.sot_sequence(
            lang_index=lang_index,
            task_translate=self.task == "translate", timestamps=True)
        return dict(sot_seq=tuple(sot_seq), lang_detect=lang_detect,
                    lang_base=st.lang_base, max_new=self.max_new_tokens,
                    compute_dtype=self.compute_dtype)

    def encode(self, mels: jnp.ndarray) -> jnp.ndarray:
        return self._encode(self.params, self._batch(mels))[0]

    # -- transcription ------------------------------------------------------

    def _prompt(self, encoded: jnp.ndarray,
                lang_idx=None) -> tuple[jnp.ndarray, int]:
        """``lang_idx`` overrides detection — whisper.transcribe detects the
        language ONCE on the first window and pins it for the recording."""
        batch = encoded.shape[0]
        seq = self._st.sot_sequence(
            lang_index=0, task_translate=self.task == "translate",
            timestamps=True)
        arr = np.tile(np.asarray(seq, np.int32), (batch, 1))
        if self._st.multilingual:
            if lang_idx is not None:
                lang_idx = np.broadcast_to(np.asarray(lang_idx), (batch,))
            elif self.language is None:
                lang_idx = np.asarray(detect_language(
                    self.params, self.dims, encoded,
                    compute_dtype=self.compute_dtype))
            else:
                lang_idx = np.full(
                    (batch,), language_index(self.language, self.dims.n_vocab)
                )
            arr[:, 1] = self._st.lang_base + lang_idx
        return jnp.asarray(arr), len(seq)

    def transcribe(
        self,
        mels: jnp.ndarray,
        substitute_layer: Optional[str] = None,
        substitute_value: Optional[jnp.ndarray] = None,
        decoder_tap: Optional[tuple] = None,
    ) -> list[str]:
        """Greedy transcripts; optionally splice a replacement activation in.

        Capability parity with ``WhisperSubbedActivation.forward``
        (hooked_model.py:137-149): when ``substitute_layer`` is given, that
        (encoder) layer's output is replaced by ``substitute_value`` for the
        encode. ``decoder_tap=(layer_idx, fn, fn_params)`` steers DECODER
        block ``layer_idx`` online: ``fn(fn_params, x)`` replaces the block's
        output at every decode position as it is generated (see
        decoding._decode_step) — pass the SAME fn object across calls to
        share the compiled decode program.
        """
        mels = self._batch(mels)
        if substitute_layer is not None:
            _check_encoder_layer(substitute_layer, "substitution")
            sub = self._batched_substitute(substitute_value, mels.shape[0])
            encoded, _ = self._encode(
                self.params, mels, sub_layer=substitute_layer, sub_value=sub
            )
        else:
            encoded, _ = self._encode(self.params, mels)
        prompt, n_prompt = self._prompt(encoded)
        tokens = greedy_decode(
            self.params, self.dims, encoded, prompt, n_prompt,
            max_new=self.max_new_tokens, compute_dtype=self.compute_dtype,
            decoder_tap=decoder_tap,
        )
        tokens = np.asarray(tokens)
        return [decode_text(row, self.dims.n_vocab) for row in tokens]

    def transcribe_one(self, mels, **kw) -> str:
        return self.transcribe(mels, **kw)[0]

    def transcribe_with_fallback(
        self,
        mels: jnp.ndarray,
        substitute_layer: Optional[str] = None,
        substitute_value: Optional[jnp.ndarray] = None,
        temperatures: tuple = (0.0, 0.2, 0.4, 0.6, 0.8, 1.0),
        beam_size: Optional[int] = None,
        compression_ratio_threshold: Optional[float] = 2.4,
        logprob_threshold: Optional[float] = -1.0,
        no_speech_threshold: Optional[float] = 0.6,
        seed: int = 0,
    ) -> list[str]:
        """whisper.transcribe's decode-with-fallback schedule, batched.

        Each temperature is ONE fixed-shape compiled decode over the full
        batch (``sample_decode`` traces temperature, so the whole schedule
        reuses a single program; ``beam_size`` switches the t=0 rung to
        ``beam_decode``). A clip's transcript is accepted at the first rung
        where zlib compression ratio ≤ ``compression_ratio_threshold`` AND
        avg_logprob ≥ ``logprob_threshold`` (whisper transcribe.py's
        ``decode_with_fallback``); the last rung accepts unconditionally.
        A clip whose SOT-step <|nospeech|> probability exceeds
        ``no_speech_threshold`` also accepts the current rung — whisper's
        silence escape (``needs_fallback = False`` when
        ``no_speech_prob > threshold``) that keeps silent clips from walking
        the whole ladder into a t=1.0 hallucination.
        (The reference GUI paths use plain greedy ``model.decode`` — this is
        the transcription-quality extension beyond that parity line.)"""
        mels = self._batch(mels)
        if substitute_layer is not None:
            _check_encoder_layer(substitute_layer, "substitution")
            sub = self._batched_substitute(substitute_value, mels.shape[0])
            encoded, _ = self._encode(
                self.params, mels, sub_layer=substitute_layer, sub_value=sub
            )
        else:
            encoded, _ = self._encode(self.params, mels)
        prompt, n_prompt = self._prompt(encoded)
        b = encoded.shape[0]
        texts: list[Optional[str]] = [None] * b

        for ti, t in enumerate(temperatures):
            if t == 0.0 and beam_size:
                tokens, sum_lp, n_text, nsp = beam_decode(
                    self.params, self.dims, encoded, prompt, n_prompt,
                    max_new=self.max_new_tokens, beam_size=beam_size,
                    compute_dtype=self.compute_dtype,
                )
            else:
                tokens, sum_lp, n_text, nsp = sample_decode(
                    self.params, self.dims, encoded, prompt, n_prompt,
                    max_new=self.max_new_tokens, temperature=float(t),
                    key=jax.random.PRNGKey(seed + ti),
                    compute_dtype=self.compute_dtype,
                )
            tokens = np.asarray(tokens)
            sum_lp, n_text = np.asarray(sum_lp), np.asarray(n_text)
            nsp = np.asarray(nsp)
            last = ti == len(temperatures) - 1
            for i in range(b):
                if texts[i] is not None:
                    continue
                text = decode_text(tokens[i], self.dims.n_vocab)
                ok, _, _ = fallback_accepts(
                    text, float(sum_lp[i]), float(n_text[i]), float(nsp[i]),
                    compression_ratio_threshold, logprob_threshold,
                    no_speech_threshold,
                )
                if ok or last:
                    texts[i] = text
            if all(x is not None for x in texts):
                break
        return texts  # type: ignore[return-value]

    def transcribe_with_word_timestamps(
        self, mels: jnp.ndarray, num_frames: Optional[np.ndarray] = None
    ) -> tuple[list[str], list[list[dict]]]:
        """→ (texts, per-clip word lists ``[{"word", "start", "end"}, …]``).

        whisper's ``word_timestamps=True``: greedy decode, then ONE jitted
        teacher-forced decoder pass over the decoded tokens capturing the
        alignment layers' cross-attention weights, then host-side
        DTW (models/whisper/timing.py). ``num_frames`` optionally gives each
        clip's real encoder-frame count (= mel frames / 2) to trim the padded
        window. Divergence from whisper (documented): alignment runs over the
        timestamp-mode token sequence with timestamp tokens' rows dropped,
        rather than re-decoding in no-timestamps mode."""
        from . import timing
        from .tokenizer import token_pieces

        mels = self._batch(mels)
        encoded, _ = self._encode(self.params, mels)
        prompt, n_prompt = self._prompt(encoded)
        tokens = greedy_decode(
            self.params, self.dims, encoded, prompt, n_prompt,
            max_new=self.max_new_tokens, compute_dtype=self.compute_dtype,
        )

        # (b, n_pairs, T, frames) over the curated (layer, head) pairs
        w, tok_probs = self._alignment_forward(tokens, encoded)

        tokens = np.asarray(tokens)
        eot = self._st.eot
        texts, words = [], []
        for i in range(tokens.shape[0]):
            pos = [p for p in range(n_prompt, tokens.shape[1])
                   if tokens[i, p] < eot]
            ids = tokens[i, pos]
            pieces = token_pieces(ids, self.dims.n_vocab)
            nf = int(num_frames[i]) if num_frames is not None else None
            # row p-1 is the query that PREDICTS token p (whisper
            # find_alignment's convention); token_times normalizes over the
            # full row axis before slicing
            rows = [p - 1 for p in pos]
            starts, ends = timing.token_times(w[i], rows, nf)
            texts.append(decode_text(tokens[i], self.dims.n_vocab))
            words.append(timing.merge_punctuations(timing.group_words(
                pieces, starts, ends, probs=tok_probs[i][rows])))
        return texts, words

    def _alignment_forward(self, tokens: jnp.ndarray, encoded: jnp.ndarray):
        """Teacher-forced decoder pass capturing the alignment heads'
        cross-attention → (b, n_pairs, T, frames) in curated-pair order."""
        from . import timing
        from .model import decoder_forward

        pairs = tuple(timing.load_alignment_heads(
            self.model_name, self.dims.n_text_layer, self.dims.n_text_head))
        layers = sorted({l for l, _ in pairs})
        capture = tuple(f"decoder.blocks.{l}.cross_attn.weights" for l in layers)
        # cache keyed on the resolved pairs: load_alignment_heads re-resolves
        # from the (mutable) asset dirs per call, so a curated table appearing
        # mid-process must rebuild the jitted forward, not reuse a closure
        # captured over the fallback heads. The head SELECTION happens inside
        # the jit: only the curated (layer, head) planes ever cross the
        # device→host link (on tunneled backends that link is ~50 MB/s, and
        # all-heads transfer would multiply it by n_heads per window)
        if getattr(self, "_align_key", None) != pairs:
            self._align_key = pairs

            def _fwd(p, t, e):
                logits, caps = decoder_forward(p, self.dims, t, e,
                                               capture=capture)
                w = jnp.stack([
                    caps[f"decoder.blocks.{l}.cross_attn.weights"][:, h]
                    for l, h in pairs
                ], axis=1)
                # teacher-forced next-token probabilities: row r predicts
                # token r+1 (whisper find_alignment's text_token_probs —
                # word probability = mean over the word's tokens)
                sm = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
                probs = jnp.take_along_axis(
                    sm[:, :-1], t[:, 1:, None], axis=-1
                )[..., 0]
                return w, probs

            self._align_fwd = jax.jit(_fwd)
        w, probs = self._align_fwd(self.params, tokens, encoded)
        return np.asarray(w, np.float32), np.asarray(probs, np.float32)

    def align_words(
        self,
        encoded: jnp.ndarray,  # (1, frames, d)
        text_tokens: list[int],
        lang_idx: int = 0,
        num_frames: Optional[int] = None,
    ) -> tuple[np.ndarray, np.ndarray, list[str], np.ndarray]:
        """→ (starts, ends, pieces, token_probs) for ``text_tokens`` against
        one window (token_probs: teacher-forced next-token probabilities,
        whisper find_alignment's text_token_probs).

        whisper timing.py ``find_alignment``: the alignment sequence is the
        CLEAN ``sot_sequence + <|notimestamps|> + text + <|eot|>`` —
        independent of however the window was actually decoded (conditioned
        prompts, timestamps) — teacher-forced once. The row pads with EOT to
        one fixed ``len(base) + max_new_tokens + 1`` shape, so every window
        of every recording reuses a single compiled program."""
        from . import timing
        from .tokenizer import token_pieces

        st = self._st
        base = st.sot_sequence(
            lang_index=lang_idx, task_translate=self.task == "translate",
            timestamps=False)
        cap = self.max_new_tokens
        text_tokens = list(text_tokens)[:cap]
        if not text_tokens:  # timestamp-only window: nothing to align —
            return np.zeros(0), np.zeros(0), [], np.zeros(0)  # skip the pass
        row = base + text_tokens + [st.eot]
        buf = len(base) + cap + 1
        row = row + [st.eot] * (buf - len(row))
        tokens = jnp.asarray(np.asarray([row], np.int32))
        w, tok_probs = self._alignment_forward(tokens, encoded)
        n = len(text_tokens)
        # rows B-1 .. B+n-1 predict text[0..n-1]; row B+n-1 (the last text
        # token's own row) predicts EOT and rides along as whisper's extra
        # DTW target anchoring the final word's end
        rows = list(range(len(base) - 1, len(base) + n))
        pieces = token_pieces(np.asarray(text_tokens), self.dims.n_vocab)
        starts, ends = timing.token_times(w[0], rows, num_frames)
        return starts[:n], ends[:n], pieces, tok_probs[0][rows[:n]]

    def transcribe_long(self, audio: np.ndarray, verbose: bool = False,
                        **kw) -> dict:
        """Arbitrary-length transcription: whisper.transcribe's 30-s seek
        loop with no-speech gating (see models/whisper/long_audio.py).
        → {"text", "segments", "language"} — segments carry whisper's
        ten-key record (id/seek/start/end/text/tokens/temperature/
        avg_logprob/compression_ratio/no_speech_prob, plus "words" when
        word_timestamps=True)."""
        from .long_audio import transcribe_long

        return transcribe_long(self, audio, verbose=verbose, **kw)

    # -- helpers ------------------------------------------------------------

    @staticmethod
    def _batched_substitute(substitute_value, batch: int) -> jnp.ndarray:
        """Broadcast a single (s, d) replacement over the mel batch — the
        residual-stream substitution replaces the tensor WHOLESALE, so a
        batch-1 value against batch-N mels would silently collapse the
        encode to batch 1 (and drop N−1 clips' transcripts)."""
        sub = jnp.asarray(substitute_value)
        if sub.ndim == 2:
            sub = sub[None]
        if sub.shape[0] == 1 and batch > 1:
            sub = jnp.broadcast_to(sub, (batch, *sub.shape[1:]))
        return sub

    @staticmethod
    def _batch(mels: jnp.ndarray) -> jnp.ndarray:
        mels = jnp.asarray(mels)
        return mels[None] if mels.ndim == 2 else mels

    @property
    def activation_width(self) -> int:
        """Feature dimension at the capture layer (d_model or 4·d_model)."""
        name = self.layer_name or ""
        d = (self.dims.n_text_state if name.startswith("decoder.")
             else self.dims.n_audio_state)
        if name.endswith((".mlp.0", ".mlp.1")):
            return 4 * d
        return d

    @property
    def activation_frames(self) -> int:
        """Padded frame-axis length of ``activations()`` rows: encoder
        layers 1500 (= n_audio_ctx), decoder layers the fixed decode
        buffer (n_prompt + max_new_tokens)."""
        if self.layer_name and self.layer_name.startswith("decoder."):
            return (len(self._decode_capture_statics()["sot_seq"])
                    + self.max_new_tokens)
        return self.dims.n_audio_ctx


def init_runtime(model_name: str, layer_name: Optional[str] = None, **kw) -> WhisperRuntime:
    return WhisperRuntime(model_name, layer_name, **kw)
