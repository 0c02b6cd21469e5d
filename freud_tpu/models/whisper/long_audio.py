"""Arbitrary-length transcription: whisper.transcribe's 30-s seek loop.

The reference (and this framework's parity surfaces) pad-or-trim everything
to one 30-s window (src/utils/audio_utils.py:76-99); this module is the
beyond-parity long-audio path, following whisper transcribe.py's structure:

* ``full_log_mel`` — the log-mel of the WHOLE recording. whisper computes one
  STFT over audio + 30 s of trailing zeros and applies the dynamic-range
  floor against the GLOBAL max; here the identical result comes from fixed-
  shape device chunks (3000 frames each, sliced with their 480-sample halo
  from the host-padded stream — so every interior frame sees its true
  neighbor samples, with reflection only at the real edges), log10'd
  unfloored, then floored host-side against the global max. One compiled
  shape regardless of duration.
* ``transcribe_long`` — the seek loop: decode a (1, n_mels, 3000) window,
  split the token stream on consecutive timestamp pairs into segments,
  advance ``seek`` to the last closed timestamp (or the full window when the
  decode ran off the end), repeat. Timestamp tokens are 0.02 s apart; seek is
  tracked in mel frames (2 mel frames per timestamp tick).

The full whisper.transcribe control set is carried: temperature statistics,
SOT-step no-speech gating, ``condition_on_previous_text`` /
``initial_prompt`` conditioning through a fixed-size start-offset prompt
buffer (see ``transcribe_long``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ...constants import HOP_LENGTH, N_FFT, N_FRAMES, N_SAMPLES
from .tokenizer import special_tokens

_TIME_PRECISION = 0.02          # seconds per timestamp token
_FRAMES_PER_TICK = 2            # mel frames per timestamp token


@partial(jax.jit, static_argnames=("n_mels",))
def _chunk_log10_mel(window: jnp.ndarray, n_mels: int) -> jnp.ndarray:
    """(480480,) haloed sample window → (3000, n_mels) UNFLOORED log10-mel
    (the shared mel projection core — audio/mel.framed_log10_mel — over
    pre-haloed frames; the global floor is applied host-side by the
    caller)."""
    from ...audio.mel import frame_signal, framed_log10_mel

    return framed_log10_mel(frame_signal(window, N_FRAMES), n_mels)


def full_log_mel(audio: np.ndarray, n_mels: int) -> np.ndarray:
    """Whole-recording whisper log-mel → (n_mels, total_frames) float32,
    where total_frames = (len(audio) + N_SAMPLES) // HOP_LENGTH (the trailing
    30 s of zero padding whisper appends is included, its frames too)."""
    audio = np.asarray(audio, np.float32).reshape(-1)
    if len(audio) < N_FFT // 2 + 1:  # the 200-sample reflect prefix needs
        audio = np.pad(audio, (0, N_FFT // 2 + 1 - len(audio)))  # ≥201 samples
    total_frames = (len(audio) + N_SAMPLES) // HOP_LENGTH
    pad = 200
    halo = N_FRAMES * HOP_LENGTH + 480  # chunk window length 480480
    stream = np.concatenate([
        audio[pad:0:-1], audio,
        np.zeros(N_SAMPLES + halo, np.float32),
    ])
    chunks = []
    for f0 in range(0, total_frames, N_FRAMES):
        window = stream[f0 * HOP_LENGTH: f0 * HOP_LENGTH + halo]
        if len(window) < halo:
            window = np.pad(window, (0, halo - len(window)))
        chunks.append(np.asarray(_chunk_log10_mel(jnp.asarray(window), n_mels)))
    log_spec = np.concatenate(chunks, axis=0)[:total_frames]  # (T, n_mels)
    log_spec = np.maximum(log_spec, log_spec.max() - 8.0)
    log_spec = (log_spec + 4.0) / 4.0
    return np.ascontiguousarray(log_spec.T)


def _parse_segments(gen: np.ndarray, st, seek_time: float, window_s: float):
    """Split one window's generated tokens on paired timestamps.

    → (segments ``[{"start", "end", "text_tokens"}]``, seek_advance_frames,
    single_timestamp_ending). whisper transcribe.py's rule set: consecutive
    timestamp tokens close a segment; a window ENDING on a lone timestamp
    (single_timestamp_ending — whisper consults it for the word-timestamp
    seek heuristics too) means no speech after it — the final piece is
    emitted and the whole window is consumed; otherwise the unfinished
    trailing piece is dropped and seek moves to the last closed timestamp
    so that audio is re-decoded.
    """
    ts0 = st.timestamp_begin
    toks = [int(t) for t in gen]
    if st.eot in toks:
        toks = toks[: toks.index(st.eot)]
    is_ts = [t >= ts0 for t in toks]
    consecutive = [i + 1 for i in range(len(toks) - 1) if is_ts[i] and is_ts[i + 1]]
    # whisper transcribe.py: "<ts> text <ts>" at the very end — no speech
    # after the last timestamp; the final piece IS a complete segment and the
    # whole window is consumed
    single_ending = len(toks) >= 2 and is_ts[-1] and not is_ts[-2]

    segments = []
    if consecutive:
        slices = list(consecutive)
        if single_ending:
            slices.append(len(toks))
        last_slice = 0
        for boundary in slices:
            piece = toks[last_slice:boundary]
            start_ts = piece[0] - ts0 if piece and is_ts[last_slice] else 0
            end_ts = piece[-1] - ts0
            segments.append({
                "start": seek_time + start_ts * _TIME_PRECISION,
                "end": seek_time + end_ts * _TIME_PRECISION,
                "text_tokens": [t for t in piece if t < st.eot],
            })
            last_slice = boundary
        if single_ending:
            advance = N_FRAMES
        else:
            # drop the unfinished trailing piece; seek to the last CLOSED
            # timestamp so that audio is re-decoded next window
            advance = max((toks[last_slice - 1] - ts0) * _FRAMES_PER_TICK, 1)
    else:
        # no closed segment in this window: whole window, one segment; its
        # end comes from the last timestamp when one was produced
        ts = [t - ts0 for t, f in zip(toks, is_ts) if f]
        end = window_s
        if ts and ts[-1] != 0:
            end = ts[-1] * _TIME_PRECISION
        text = [t for t in toks if t < st.eot]
        if text:
            segments.append({"start": seek_time, "end": seek_time + end,
                             "text_tokens": text})
        advance = N_FRAMES
    return segments, advance, single_ending


def _get_end(segments: list[dict]) -> float | None:
    """whisper transcribe.py ``get_end``: the last word end over segments
    that carry words (None when none do)."""
    for s in reversed(segments):
        if s.get("words"):
            return s["words"][-1]["end"]
    return None


def _next_words_segment(segments: list[dict]) -> dict | None:
    return next((s for s in segments if s.get("words")), None)


def _word_anomaly_score(word: dict) -> float:
    """whisper transcribe.py's hallucination heuristic per word: low
    teacher-forced probability, implausibly short, or implausibly long."""
    probability = word.get("probability", 0.0)
    duration = word["end"] - word["start"]
    score = 0.0
    if probability < 0.15:
        score += 1.0
    if duration < 0.133:
        score += (0.133 - duration) * 15
    if duration > 2.0:
        score += duration - 2.0
    return score


def _is_segment_anomaly(segment: dict | None) -> bool:
    """whisper's segment-level call: score the first 8 non-punctuation words;
    anomalous when the total reaches 3 or ~1 per word."""
    from .timing import APPEND_PUNCTUATIONS, PREPEND_PUNCTUATIONS

    if segment is None or not segment.get("words"):
        return False
    punct = PREPEND_PUNCTUATIONS + APPEND_PUNCTUATIONS
    words = [w for w in segment["words"] if w["word"] not in punct][:8]
    score = sum(_word_anomaly_score(w) for w in words)
    return score >= 3 or score + 0.01 >= len(words)


def _decode_window_with_fallback(
    runtime, encoded, prompt, n_prompt, start, temperatures, beam_size,
    compression_ratio_threshold, logprob_threshold, no_speech_threshold,
    st, key_base,
):
    """whisper transcribe.py's ``decode_with_fallback`` for ONE window.

    Walks the temperature ladder; a rung is accepted when its zlib
    compression ratio ≤ threshold AND avg_logprob ≥ threshold — except that
    confident silence (no_speech_prob > threshold) accepts the current rung
    immediately (whisper's ``needs_fallback = False`` escape — the rule
    itself lives in runtime.fallback_accepts, shared with the batched
    transcribe_with_fallback). Every rung reuses the SAME traced-temperature
    compiled program (t=0 optionally beam).
    → (tokens, sum_lp, n_text, nsp, temperature_used, compression_ratio)."""
    from .decoding import beam_decode, sample_decode
    from .runtime import fallback_accepts
    from .tokenizer import decode_text

    dims = runtime.dims
    out = None
    for ti, t in enumerate(temperatures):
        if t == 0.0 and beam_size:
            tokens, sum_lp, n_text, nsp = beam_decode(
                runtime.params, dims, encoded, prompt, n_prompt,
                max_new=runtime.max_new_tokens, beam_size=beam_size,
                start=start, compute_dtype=runtime.compute_dtype,
            )
        else:
            tokens, sum_lp, n_text, nsp = sample_decode(
                runtime.params, dims, encoded, prompt, n_prompt,
                max_new=runtime.max_new_tokens, temperature=float(t),
                key=jax.random.fold_in(jax.random.PRNGKey(key_base), ti),
                start=start, compute_dtype=runtime.compute_dtype,
            )
        # one whole-array transfer per stat — ad-hoc [0] indexing on device
        # arrays compiles a fresh gather program remotely (CLAUDE.md hot-path
        # rule); np.asarray is a plain transfer
        tokens_h = np.asarray(tokens)
        slp = float(np.asarray(sum_lp).reshape(-1)[0])
        ntx = float(np.asarray(n_text).reshape(-1)[0])
        nsp_h = float(np.asarray(nsp).reshape(-1)[0])
        gen = tokens_h[0, n_prompt:]
        text = decode_text([int(x) for x in gen if x < st.eot], dims.n_vocab)
        accept, ratio, _ = fallback_accepts(
            text, slp, ntx, nsp_h, compression_ratio_threshold,
            logprob_threshold, no_speech_threshold,
        )
        out = (tokens_h, slp, ntx, nsp_h, float(t), ratio)
        if accept or ti == len(temperatures) - 1:
            break
    return out


def transcribe_long(
    runtime,
    audio: np.ndarray,
    verbose: bool = False,
    temperatures: tuple = (0.0, 0.2, 0.4, 0.6, 0.8, 1.0),
    beam_size: int | None = None,
    compression_ratio_threshold: float | None = 2.4,
    no_speech_threshold: float | None = 0.6,
    logprob_threshold: float | None = -1.0,
    condition_on_previous_text: bool = True,
    history_budget: int | None = None,
    initial_prompt: str | None = None,
    word_timestamps: bool = False,
    clip_timestamps: str | list = "0",
    carry_initial_prompt: bool = False,
    prepend_punctuations: str | None = None,
    append_punctuations: str | None = None,
    hallucination_silence_threshold: float | None = None,
    seed: int = 0,
) -> dict:
    """→ {"text", "segments": [{"start", "end", "text", "tokens",
    "temperature", "avg_logprob", "compression_ratio", "no_speech_prob"}, …],
    "language"} for a waveform of any length, via ``runtime``'s (batch-1,
    fixed-shape) decode programs (whisper transcribe.py's result record —
    language detected on the first window and pinned, whisper's rule).

    ``word_timestamps=True`` adds whisper's per-word timing to every
    segment (one teacher-forced alignment pass per window —
    ``runtime.align_words`` — words split per segment by token spans), and
    enables whisper's word-informed seek rule: a window that does not end
    on a closed timestamp pair resumes right after the last attested word.
    ``hallucination_silence_threshold`` (seconds; needs word timestamps,
    whisper's option of the same name) additionally drops anomalous
    segments — low word probability, implausible word durations — that sit
    surrounded by silence gaps longer than the threshold, re-seeking past
    the silence instead of transcribing it.

    EVERY window decodes through the temperature-fallback ladder
    (``_decode_window_with_fallback`` — whisper's ``decode_with_fallback``
    applied per window, compression-ratio + logprob gates, optional beam at
    the t=0 rung); when a window escalates past t=0.5, the conditioning
    history is reset (whisper's ``prompt_reset_since`` rule — high-temperature
    text is never fed forward as a prompt).

    ``clip_timestamps`` (whisper's option, "start,end,start,end,…" seconds
    as a string or list) restricts transcription to those ranges; windows
    never cross a clip boundary (the mel past the clip end zero-pads, and
    seek jumps to the next clip's start).

    Silence gating matches whisper transcribe.py: a window whose SOT-step
    <|nospeech|> probability exceeds ``no_speech_threshold`` is skipped —
    unless its avg_logprob beats ``logprob_threshold`` (confident decode
    overrides the silence call).

    ``condition_on_previous_text`` threads the previous windows' text tokens
    into the prompt as ``<|startofprev|> history… <|sot|>…`` (whisper
    transcribe.py's all_tokens prompt). ``initial_prompt`` seeds that
    history; with ``carry_initial_prompt`` it instead re-prefixes EVERY
    window's conditioning, surviving high-temperature resets (whisper's
    option of the same name). TPU-shape discipline: the prompt
    lives in a FIXED buffer of ``n_text_ctx − max_new`` slots, left-filled
    with ``<|startofprev|>`` and carried with a per-clip ``start`` offset
    (positions before it are masked out of attention and position numbering
    — decoding.py `_decode_step`), so every window of every recording runs
    the same compiled program regardless of history length."""
    from .tokenizer import decode_text

    if hallucination_silence_threshold is not None and not word_timestamps:
        # the heuristic runs on word alignments; without them it is a no-op
        # (whisper transcribe.py warns in the same combination)
        import warnings
        warnings.warn(
            "hallucination_silence_threshold requires word_timestamps=True; "
            "the option has no effect without it", stacklevel=2)

    dims = runtime.dims
    st = special_tokens(dims.n_vocab)
    orig_len = int(np.asarray(audio).reshape(-1).shape[0])
    mel = full_log_mel(audio, dims.n_mels)
    # whisper transcribe.py: content_frames = mel frames of audio + 30-s pad
    # minus one window; ≤ 0 (sub-10 ms recordings) decodes NOTHING and
    # returns an empty result. Computed from the ORIGINAL length — the
    # min-pad full_log_mel applies for the reflect prefix must not mint a
    # content frame whisper would not have.
    content_frames = (orig_len + N_SAMPLES) // HOP_LENGTH - N_FRAMES

    segments: list[dict] = []
    history: list[int] = []  # previous windows' text tokens
    lang_pinned = None
    last_speech_timestamp = 0.0  # across windows AND clips (whisper's init)
    init_ids: list[int] = []
    if initial_prompt:
        from .tokenizer import encode_text

        ids = encode_text(" " + initial_prompt.strip(), dims.n_vocab)
        if ids:  # silently a no-op without tokenizer assets (whisper needs
            init_ids = list(ids)  # them to encode the prompt too)
            if not carry_initial_prompt:
                # one-shot conditioning: the prompt tokens live in the
                # ordinary history and vanish on the first reset
                history.extend(init_ids)
    # whisper's clip_timestamps: comma-separated string (or list) of
    # start,end second offsets to transcribe; a trailing start without an
    # end implicitly closes at the recording end. Default "0" = everything.
    if isinstance(clip_timestamps, str):
        clip_list = ([float(t) for t in clip_timestamps.split(",")]
                     if clip_timestamps else [])
    else:
        clip_list = [float(t) for t in (clip_timestamps or [])]
    pts = [round(t * 100) for t in clip_list]  # seconds → mel frames
    if not pts:
        pts = [0]
    if len(pts) % 2 == 1:
        pts.append(content_frames)
    seek_clips = [(max(s, 0), min(e, content_frames))
                  for s, e in zip(pts[::2], pts[1::2])]

    clip_idx = 0
    seek = seek_clips[0][0] if seek_clips else 0  # in mel frames (10 ms each)
    while clip_idx < len(seek_clips):
        clip_start, clip_end = seek_clips[clip_idx]
        if seek < clip_start:
            seek = clip_start
        if seek >= clip_end:
            clip_idx += 1
            if clip_idx < len(seek_clips):
                seek = seek_clips[clip_idx][0]
            continue
        # seek < content_frames ⇒ seek + N_FRAMES ≤ total mel frames: every
        # window is full-width (the 30-s zero tail is part of the mel) — but
        # a window crossing its CLIP end zero-pads past it, whisper's
        # pad_or_trim of the clipped mel segment (audio beyond the clip
        # must not leak into the encoder)
        segment_size = min(N_FRAMES, clip_end - seek)
        win = mel[:, seek: seek + N_FRAMES]
        if segment_size < N_FRAMES:
            win = win.copy()
            win[:, segment_size:] = 0.0
        encoded, _ = runtime._encode(runtime.params, jnp.asarray(win[None]))
        # whisper.transcribe detects the language once (first window), pins it
        prompt, n_prompt = runtime._prompt(encoded, lang_idx=lang_pinned)
        if lang_pinned is None and runtime._st.multilingual:
            lang_pinned = int(np.asarray(prompt)[0, 1]) - runtime._st.lang_base
        start = None
        carried = init_ids if carry_initial_prompt else []
        if (condition_on_previous_text or initial_prompt) and (
                history or carried):
            base = [int(t) for t in np.asarray(prompt)[0]]
            buf_len = dims.n_text_ctx - runtime.max_new_tokens
            if history_budget is not None:
                buf_len = min(buf_len, len(base) + 1 + history_budget)
            budget = buf_len - len(base) - 1
            if budget > 0:  # max_new_tokens near n_text_ctx can leave no room
                if carried:
                    # whisper's carry_initial_prompt: the initial prompt
                    # re-prefixes EVERY window's conditioning (surviving
                    # resets); the rolling history fills what's left
                    room = max(budget - len(carried), 0)
                    tail = carried + (history[-room:] if room else [])
                    tail = tail[-budget:]  # init_ids alone may exceed budget
                else:
                    tail = history[-budget:]  # for even the sot_prev marker —
                seq = [st.sot_prev] + tail + base  # then skip conditioning
                pad_n = buf_len - len(seq)  # (≥ 0 by the budget cap above)
                prompt = jnp.asarray(
                    np.array([[st.sot_prev] * pad_n + seq], np.int32))
                n_prompt = buf_len
                start = jnp.asarray(np.array([pad_n], np.int32))
        tokens, slp, ntx, nsp, used_t, ratio = (
            _decode_window_with_fallback(
                runtime, encoded, prompt, n_prompt, start, temperatures,
                beam_size, compression_ratio_threshold, logprob_threshold,
                no_speech_threshold, st, key_base=seed * 1009 + seek,
            ))
        avg_lp = slp / (ntx + 1.0)
        if no_speech_threshold is not None and nsp > no_speech_threshold:
            if logprob_threshold is None or avg_lp < logprob_threshold:
                seek += N_FRAMES  # silent window: skip it entirely
                continue
        tokens = tokens[0]
        gen = tokens[n_prompt:]
        window_s = segment_size * 0.01
        segs, advance, single_ts_ending = _parse_segments(
            gen, st, seek * 0.01, window_s)
        if not condition_on_previous_text:
            # whisper resets the prompt after every window in this mode (the
            # initial_prompt still conditioned the FIRST window above)
            history.clear()
        aligned = None
        if word_timestamps and segs:
            # whisper's word_timestamps=True composed with the seek loop:
            # ONE teacher-forced alignment pass over the window's text
            # tokens (runtime.align_words — the clean notimestamps sequence,
            # per whisper find_alignment), then words split per segment by
            # token spans; times shift by the window's seek offset
            from .timing import group_words

            window_tokens = [t for s in segs for t in s["text_tokens"]]
            enc_frames = segment_size // 2
            aligned = runtime.align_words(
                encoded, window_tokens,
                lang_idx=(lang_pinned or 0), num_frames=enc_frames,
            )
        tok_cursor = 0
        for s in segs:
            toks = s.pop("text_tokens")
            # whisper new_segment record: seek is the window's mel-frame
            # origin (ids are assigned at commit time below — the
            # hallucination heuristics may still drop trailing segments)
            s["seek"] = seek
            s["text"] = decode_text(toks, dims.n_vocab)
            s["tokens"] = toks
            s["temperature"] = used_t
            s["avg_logprob"] = avg_lp
            s["compression_ratio"] = ratio
            s["no_speech_prob"] = nsp
            if aligned is not None:
                starts_w, ends_w, pieces_w, probs_w = aligned
                n_tok = min(len(toks), len(pieces_w) - tok_cursor)
                sl = slice(tok_cursor, tok_cursor + n_tok)
                from .timing import (APPEND_PUNCTUATIONS,
                                     PREPEND_PUNCTUATIONS,
                                     merge_punctuations)

                s["words"] = [
                    {"word": wd["word"],
                     "start": wd["start"] + seek * 0.01,
                     "end": wd["end"] + seek * 0.01,
                     "probability": wd["probability"]}
                    for wd in merge_punctuations(
                        group_words(pieces_w[sl], starts_w[sl], ends_w[sl],
                                    probs=probs_w[sl]),
                        prepended=(prepend_punctuations
                                   if prepend_punctuations is not None
                                   else PREPEND_PUNCTUATIONS),
                        appended=(append_punctuations
                                  if append_punctuations is not None
                                  else APPEND_PUNCTUATIONS))
                ]
                tok_cursor += n_tok

        if aligned is not None:
            # whisper transcribe.py's word-timestamp seek heuristics. When
            # the window does not end on a closed timestamp pair, trust the
            # word alignment over the timestamp tokens and resume right
            # after the last attested word
            time_offset = seek * 0.01
            window_end_time = (seek + N_FRAMES) * 0.01
            if not single_ts_ending:
                lwe = _get_end(segs)
                if lwe is not None and lwe > time_offset:
                    # (max 1: a word ending within the seek frame must still
                    # advance, or the loop would re-decode forever)
                    advance = max(round(lwe * 100) - seek, 1)
            if hallucination_silence_threshold is not None:
                threshold = hallucination_silence_threshold
                if not single_ts_ending:
                    lwe = _get_end(segs)
                    if lwe is not None and lwe > time_offset:
                        remaining = window_end_time - lwe
                        if remaining > threshold:
                            advance = max(round(lwe * 100) - seek, 1)
                        else:
                            advance = segment_size
                # a leading anomaly after a long silent gap: skip the
                # silence and retry from the anomaly's start
                first_seg = _next_words_segment(segs)
                if first_seg is not None and _is_segment_anomaly(first_seg):
                    gap = first_seg["start"] - time_offset
                    if gap > threshold:
                        seek += max(round(gap * 100), 1)
                        continue  # window's output dropped entirely
                # an anomaly surrounded by silence (or more anomalies):
                # drop it and everything after, resume at its start
                hal_last_end = last_speech_timestamp
                for si, segment in enumerate(segs):
                    if not segment.get("words"):
                        continue
                    if _is_segment_anomaly(segment):
                        nxt = _next_words_segment(segs[si + 1:])
                        if nxt is not None:
                            hal_next_start = nxt["words"][0]["start"]
                        else:
                            hal_next_start = (time_offset
                                              + segment_size * 0.01)
                        silence_before = (
                            segment["start"] - hal_last_end > threshold
                            or segment["start"] < threshold
                            or segment["start"] - time_offset < 2.0)
                        silence_after = (
                            hal_next_start - segment["end"] > threshold
                            or _is_segment_anomaly(nxt)
                            or window_end_time - segment["end"] < 2.0)
                        if silence_before and silence_after:
                            advance = max(
                                round(max(time_offset + 1, segment["start"])
                                      * 100) - seek, 1)
                            if (content_frames * 0.01 - segment["end"]
                                    < threshold):
                                advance = content_frames - seek
                            del segs[si:]
                            break
                    # whisper transcribe.py advances hal_last_end with the
                    # SEGMENT end (timestamp-token derived), not the last
                    # word's DTW end — they diverge when alignment disagrees
                    # with the timestamp tokens, and the silence_before gap
                    # test must see the same value whisper would
                    hal_last_end = segment["end"]
            lwe = _get_end(segs)
            if lwe is not None:
                last_speech_timestamp = lwe

        for s in segs:
            s["id"] = len(segments)
            segments.append(s)
            if condition_on_previous_text:
                history.extend(s["tokens"])
            if verbose:
                print(f"[{s['start']:.2f} -> {s['end']:.2f}] {s['text']}")
        if used_t > 0.5:
            # whisper's prompt_reset_since: a window that escalated past 0.5
            # never conditions later windows (its own tokens included)
            history.clear()
        seek += advance
    # whisper.transcribe's result carries the decode language (detected on
    # the first window and pinned, or the caller's override); English-only
    # models are always "en"
    from .tokenizer import LANGUAGES

    if not runtime._st.multilingual:
        language = "en"
    elif lang_pinned is not None and 0 <= lang_pinned < len(LANGUAGES):
        language = LANGUAGES[lang_pinned]
    else:
        language = runtime.language
    return {
        "text": "".join(s["text"] for s in segments),
        "segments": segments,
        "language": language,
    }
