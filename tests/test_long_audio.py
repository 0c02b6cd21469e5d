"""Long-audio path: whole-recording mel exactness + the 30-s seek loop."""

import numpy as np

from freud_tpu.constants import HOP_LENGTH, N_FRAMES, N_SAMPLES
from freud_tpu.models.whisper import long_audio, special_tokens


def test_full_log_mel_matches_single_window():
    """For a 30-s clip the first 3000 frames must equal the standard
    single-window mel (same math, chunked with true-neighbor halos) — except
    the final ~2 frames: the single-window path reflect-pads at the 30-s
    edge while the long-form stream correctly continues into whisper's
    trailing zero padding (transcribe.py pads zeros, then reflects only at
    the true recording ends)."""
    import jax.numpy as jnp
    from freud_tpu.audio.mel import log_mel_spectrogram

    rng = np.random.default_rng(0)
    audio = rng.standard_normal(N_SAMPLES).astype(np.float32) * 0.1
    full = long_audio.full_log_mel(audio, 80)
    want = np.asarray(log_mel_spectrogram(jnp.asarray(audio), 80))
    assert full.shape == (80, (2 * N_SAMPLES) // HOP_LENGTH)
    np.testing.assert_allclose(full[:, :N_FRAMES - 2], want[:, :N_FRAMES - 2],
                               atol=2e-4, rtol=1e-4)


def test_full_log_mel_interior_chunk_boundary_is_seamless():
    """Frames straddling the 3000-frame chunk boundary of a 60-s recording
    must match a direct computation over a window centered there (no
    boundary artifacts from chunking)."""
    import jax.numpy as jnp
    from freud_tpu.audio.mel import frame_signal, _dft_basis, N_FREQS
    from freud_tpu.audio.filters import mel_filterbank
    import jax

    rng = np.random.default_rng(1)
    audio = rng.standard_normal(2 * N_SAMPLES).astype(np.float32) * 0.1
    full = long_audio.full_log_mel(audio, 80)

    # direct: frames 2990..3010 from the padded stream, no chunking
    pad = 200
    stream = np.concatenate([audio[pad:0:-1], audio, np.zeros(N_SAMPLES, np.float32)])
    f0 = 2990
    window = stream[f0 * HOP_LENGTH: f0 * HOP_LENGTH + 20 * HOP_LENGTH + 480]
    frames = np.asarray(frame_signal(jnp.asarray(window), 20))
    proj = frames @ np.asarray(_dft_basis())
    power = proj[:, :N_FREQS] ** 2 + proj[:, N_FREQS:] ** 2
    mel = power @ mel_filterbank(80).T
    want = np.log10(np.clip(mel, 1e-10, None))
    got_unfloored = full[:, f0:f0 + 20].T * 4.0 - 4.0
    # undo the global floor only where it did not clamp
    mask = got_unfloored > (full.max() * 4.0 - 4.0 - 8.0 + 1e-6)
    np.testing.assert_allclose(got_unfloored[mask], want[mask],
                               atol=2e-4, rtol=1e-4)


def test_parse_segments_pairs_and_seek():
    st = special_tokens(51865)
    ts0 = st.timestamp_begin
    # single-timestamp ending: BOTH segments emitted (no text dropped), the
    # whole window is consumed (whisper transcribe.py's rule)
    gen = np.array([ts0 + 0, 100, 101, ts0 + 150, ts0 + 150, 102, ts0 + 200,
                    st.eot, st.eot])
    segs, advance, single = long_audio._parse_segments(
        gen, st, seek_time=10.0, window_s=30.0)
    assert len(segs) == 2
    assert segs[0]["start"] == 10.0 and abs(segs[0]["end"] - 13.0) < 1e-6
    assert segs[0]["text_tokens"] == [100, 101]
    assert abs(segs[1]["start"] - 13.0) < 1e-6
    assert abs(segs[1]["end"] - 14.0) < 1e-6
    assert segs[1]["text_tokens"] == [102]
    assert advance == N_FRAMES
    assert single  # "<ts> text <ts>" ending

    # text after the last closed pair WITHOUT a closing timestamp: the
    # unfinished piece is dropped and seek returns to the closed timestamp
    # so that audio is re-decoded
    gen_unfinished = np.array([ts0 + 0, 100, ts0 + 150, ts0 + 150, 102,
                               st.eot])
    segs_u, adv_u, single_u = long_audio._parse_segments(
        gen_unfinished, st, 0.0, 30.0)
    assert len(segs_u) == 1 and segs_u[0]["text_tokens"] == [100]
    assert adv_u == 150 * 2
    assert not single_u

    # no consecutive pair: whole window consumed, end from the last timestamp
    gen2 = np.array([ts0 + 0, 100, 101, ts0 + 90, st.eot])
    segs2, advance2, single2 = long_audio._parse_segments(gen2, st, 0.0, 30.0)
    assert advance2 == N_FRAMES
    assert segs2 and segs2[0]["text_tokens"] == [100, 101]
    assert abs(segs2[0]["end"] - 1.8) < 1e-6
    assert single2  # trailing lone timestamp


def test_transcribe_long_end_to_end():
    from freud_tpu.models.whisper.runtime import WhisperRuntime

    rt = WhisperRuntime("test:tiny", max_new_tokens=6, language="en")
    audio = np.random.default_rng(2).standard_normal(int(16000 * 45)).astype(
        np.float32) * 0.1
    out = rt.transcribe_long(audio, condition_on_previous_text=False)
    assert set(out) == {"text", "segments", "language"}
    # whisper result record: language detected on window 1 and pinned;
    # test:tiny is multilingual so the pinned index must render to a code
    assert isinstance(out["language"], str) and len(out["language"]) >= 2
    assert isinstance(out["text"], str)
    for s in out["segments"]:
        assert 0.0 <= s["start"] <= s["end"] <= 45.0 + 30.0
        assert isinstance(s["text"], str)

    # conditioned mode (fixed prompt buffer + start offsets) also terminates
    # and yields well-formed segments
    out_c = rt.transcribe_long(audio, history_budget=8)
    assert isinstance(out_c["text"], str)
    for s in out_c["segments"]:
        assert 0.0 <= s["start"] <= s["end"] <= 45.0 + 30.0


def test_left_padded_prompt_with_start_equals_unpadded():
    """The conditioned-prompt mechanism must be EXACT: decoding a left-padded
    prompt buffer with a start offset gives identical tokens/statistics to
    decoding the unpadded prompt (pad positions fully masked, positions
    renumbered)."""
    import jax.numpy as jnp
    from freud_tpu.models.whisper import dims_for, encoder_forward, init_params
    from freud_tpu.models.whisper.decoding import sample_decode

    dims = dims_for("test:tiny")
    params = init_params(dims, seed=3)
    st = special_tokens(dims.n_vocab)
    mels = np.random.default_rng(0).standard_normal((2, 80, 3000)).astype(
        np.float32)
    encoded, _ = encoder_forward(params, dims, jnp.asarray(mels))

    base = [st.sot_prev, 100, 101, st.sot, st.lang_base, st.transcribe]
    plain = np.tile(np.asarray(base, np.int32), (2, 1))
    tok_a, lp_a, nt_a, nsp_a = sample_decode(
        params, dims, encoded, jnp.asarray(plain), len(base), max_new=10)

    pad_n = 5
    padded = np.tile(
        np.asarray([st.sot_prev] * pad_n + base, np.int32), (2, 1))
    start = jnp.asarray(np.full((2,), pad_n, np.int32))
    tok_b, lp_b, nt_b, nsp_b = sample_decode(
        params, dims, encoded, jnp.asarray(padded), len(base) + pad_n,
        max_new=10, start=start)

    np.testing.assert_array_equal(np.asarray(tok_a),
                                  np.asarray(tok_b)[:, pad_n:])
    np.testing.assert_allclose(np.asarray(lp_a), np.asarray(lp_b),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(nt_a), np.asarray(nt_b))
    np.testing.assert_allclose(np.asarray(nsp_a), np.asarray(nsp_b),
                               rtol=1e-5, atol=1e-7)


def test_long_audio_fallback_ladder(monkeypatch):
    """Per-window decode_with_fallback (whisper transcribe.py): a window that
    fails the t=0 logprob gate escalates through the temperature ladder; the
    accepted rung's temperature is recorded on its segments. Permissive
    thresholds never leave t=0."""
    from freud_tpu.models.whisper import decoding
    from freud_tpu.models.whisper.runtime import WhisperRuntime

    calls = []
    orig = decoding.sample_decode

    def spy(*a, **k):
        calls.append(float(k.get("temperature", 0.0)))
        return orig(*a, **k)

    monkeypatch.setattr(decoding, "sample_decode", spy)
    rt = WhisperRuntime("test:tiny", max_new_tokens=6, language="en")
    audio = np.random.default_rng(5).standard_normal(
        int(16000 * 35)).astype(np.float32) * 0.1

    # impossible logprob gate (and no silence escape): every window must walk
    # the ladder to its last rung and the segments record that temperature
    out = rt.transcribe_long(
        audio, temperatures=(0.0, 1.0), logprob_threshold=10.0,
        no_speech_threshold=None)
    assert 1.0 in calls, "ladder never escalated past t=0"
    for i, s in enumerate(out["segments"]):
        assert s["temperature"] == 1.0
        assert {"id", "seek", "tokens", "avg_logprob", "compression_ratio",
                "no_speech_prob"} <= set(s)
        # whisper's new_segment record: id numbers segments across the whole
        # recording; seek is the window's mel-frame origin
        assert s["id"] == i
        assert 0 <= s["seek"] and s["seek"] * 0.01 <= s["start"] + 1e-6

    # permissive gates: the ladder accepts every window at t=0
    calls.clear()
    out0 = rt.transcribe_long(
        audio, temperatures=(0.0, 1.0), logprob_threshold=None,
        compression_ratio_threshold=None, no_speech_threshold=None)
    assert calls and set(calls) == {0.0}
    for s in out0["segments"]:
        assert s["temperature"] == 0.0


def test_long_audio_word_timestamps():
    """word_timestamps=True composes with the seek loop: every segment
    carries per-word times within its window, monotone non-decreasing and
    offset by the window's seek position."""
    from freud_tpu.models.whisper.runtime import WhisperRuntime

    rt = WhisperRuntime("test:tiny", max_new_tokens=6, language="en")
    audio = np.random.default_rng(8).standard_normal(
        int(16000 * 35)).astype(np.float32) * 0.1
    out = rt.transcribe_long(
        audio, word_timestamps=True, logprob_threshold=None,
        compression_ratio_threshold=None, no_speech_threshold=None)
    assert out["segments"], "no segments decoded"
    saw_words = False
    for s in out["segments"]:
        assert "words" in s
        for wd in s["words"]:
            saw_words = True
            assert set(wd) == {"word", "start", "end", "probability"}
            assert 0.0 <= wd["probability"] <= 1.0
            # within the recording (+ zero-padded tail) and ordered
            assert 0.0 <= wd["start"] <= wd["end"] <= 35.0 + 30.0
        starts = [wd["start"] for wd in s["words"]]
        assert starts == sorted(starts)
    assert saw_words, "no window produced any word"


def test_transcribe_long_empty_audio_returns_empty():
    """whisper returns {'text': '', 'segments': []} for sub-window audio
    (content_frames <= 0) instead of decoding a window of pure padding."""
    from freud_tpu.models.whisper.runtime import WhisperRuntime

    rt = WhisperRuntime("test:tiny", max_new_tokens=4, language="en")
    out = rt.transcribe_long(np.zeros(100, np.float32))
    # no window ever decoded → language falls back to the caller's pin
    assert out == {"text": "", "segments": [], "language": "en"}


def test_hallucination_threshold_without_word_timestamps_warns():
    """hallucination_silence_threshold is a no-op without word_timestamps
    (the heuristic runs on word alignments); whisper warns here, so do we."""
    import pytest

    from freud_tpu.models.whisper.runtime import WhisperRuntime

    rt = WhisperRuntime("test:tiny", max_new_tokens=4, language="en")
    with pytest.warns(UserWarning, match="word_timestamps"):
        rt.transcribe_long(np.zeros(100, np.float32),
                           hallucination_silence_threshold=2.0)


def test_clip_timestamps_restricts_decoding():
    """whisper's clip_timestamps: only the given ranges are transcribed —
    segments stay inside their clips, and the string/list forms agree."""
    from freud_tpu.models.whisper.runtime import WhisperRuntime

    rt = WhisperRuntime("test:tiny", max_new_tokens=6, language="en")
    audio = np.random.default_rng(5).standard_normal(int(16000 * 70)).astype(
        np.float32) * 0.1

    out = rt.transcribe_long(audio, condition_on_previous_text=False,
                             clip_timestamps="5,20,40,55")
    for s in out["segments"]:
        # windows never START outside a clip (segments may still END past a
        # clip edge when the model emits a late timestamp into the window's
        # zero-padded tail — whisper's pad_or_trim has the same property)
        in_clip1 = 500 <= s["seek"] < 2000
        in_clip2 = 4000 <= s["seek"] < 5500
        assert in_clip1 or in_clip2, s["seek"]
        assert s["start"] >= 5.0 - 0.011  # nothing before the first clip

    out_list = rt.transcribe_long(audio, condition_on_previous_text=False,
                                  clip_timestamps=[5, 20, 40, 55])
    assert out_list["text"] == out["text"]
    assert [s["start"] for s in out_list["segments"]] == \
        [s["start"] for s in out["segments"]]

    # an odd list closes at the recording end (whisper's rule); default "0"
    # covers everything and matches the unclipped call
    out_tail = rt.transcribe_long(audio, condition_on_previous_text=False,
                                  clip_timestamps="60")
    for s in out_tail["segments"]:
        assert s["seek"] >= 6000  # windows begin at the trailing clip

    plain = rt.transcribe_long(audio, condition_on_previous_text=False)
    out_zero = rt.transcribe_long(audio, condition_on_previous_text=False,
                                  clip_timestamps="0")
    assert out_zero["text"] == plain["text"]


def test_hallucination_silence_threshold(monkeypatch):
    """whisper's hallucination_silence_threshold: an anomalous segment (low
    word probability, implausible duration) surrounded by silence is dropped
    and the seek resumes past it; without the option the same segment is
    kept — and the word-informed seek rule advances past the last attested
    word. Scripted decode + alignment (real models can't be steered here)."""
    import freud_tpu.models.whisper.long_audio as la
    from freud_tpu.models.whisper.runtime import WhisperRuntime

    rt = WhisperRuntime("test:tiny", max_new_tokens=8, language="en")
    st = rt._st
    ts0 = st.timestamp_begin
    audio = np.zeros(int(16000 * 35), np.float32)

    windows = []

    def fake_decode(runtime, encoded, prompt, n_prompt, start, *a, **k):
        import numpy as _np
        windows.append(len(windows))
        base = _np.asarray(prompt)[0].tolist()
        if len(windows) == 1:
            # one closed segment 0.0 -> 2.0 s, then a dangling pair opener:
            # NOT a single-timestamp ending, so the word seek rule applies
            gen = [ts0, 100, ts0 + 100, ts0 + 100]
        else:
            gen = []  # silent window (nsp high below): skipped entirely
        row = base + gen + [st.eot] * (n_prompt + 8 - len(base) - len(gen))
        toks = _np.asarray([row], _np.int32)
        nsp = 0.0 if len(windows) == 1 else 0.99
        slp = -1.0 if len(windows) == 1 else -50.0  # silent: fails override
        return toks, slp, 3.0, nsp, 0.0, 1.0

    def fake_align(encoded, text_tokens, lang_idx=0, num_frames=None):
        n = len(text_tokens)
        # one word spanning 0-3 s at probability 0.01: anomaly score
        # 1 (prob) + 1 (3s-2s) = 2 >= ~1/word -> anomalous
        return (np.zeros(n), np.full(n, 3.0), [f"<tok:{t}>" for t in
                text_tokens], np.full(n, 0.01))

    monkeypatch.setattr(la, "_decode_window_with_fallback", fake_decode)
    monkeypatch.setattr(rt, "align_words", fake_align)

    control = rt.transcribe_long(audio, word_timestamps=True,
                                 condition_on_previous_text=False)
    assert len(control["segments"]) == 1
    assert control["segments"][0]["words"][0]["probability"] == 0.01

    windows.clear()
    dropped = rt.transcribe_long(audio, word_timestamps=True,
                                 condition_on_previous_text=False,
                                 hallucination_silence_threshold=2.0)
    assert dropped["segments"] == [] and dropped["text"] == ""


def test_carry_initial_prompt(monkeypatch):
    """whisper's carry_initial_prompt: the initial prompt re-prefixes every
    window's conditioning and survives the high-temperature history reset;
    without it the prompt tokens vanish after the first reset."""
    import freud_tpu.models.whisper.long_audio as la
    import freud_tpu.models.whisper.tokenizer as tok
    from freud_tpu.models.whisper.runtime import WhisperRuntime

    rt = WhisperRuntime("test:tiny", max_new_tokens=8, language="en")
    st = rt._st
    ts0 = st.timestamp_begin
    audio = np.zeros(int(16000 * 65), np.float32)
    marker = [701, 702, 703]

    monkeypatch.setattr(tok, "encode_text", lambda *a, **k: list(marker))

    prompts = []

    def fake_decode(runtime, encoded, prompt, n_prompt, start, *a, **k):
        import numpy as _np
        row = _np.asarray(prompt)[0].tolist()
        prompts.append(row)
        base = row
        # a full window 0->30 s (single-timestamp ending) at t=1.0: the
        # history resets after EVERY window (whisper prompt_reset_since)
        gen = [ts0, 100, ts0 + 1500]
        full = base + gen + [st.eot] * (n_prompt + 8 - len(base) - len(gen))
        return (_np.asarray([full], _np.int32), -0.5, 1.0, 0.0, 1.0, 1.0)

    monkeypatch.setattr(la, "_decode_window_with_fallback", fake_decode)

    def contains_marker(row):
        return any(row[i:i + 3] == marker for i in range(len(row)))

    rt.transcribe_long(audio, initial_prompt="seed words",
                       carry_initial_prompt=True)
    assert len(prompts) >= 2
    assert all(contains_marker(p) for p in prompts)  # every window carries it

    prompts.clear()
    rt.transcribe_long(audio, initial_prompt="seed words")
    assert len(prompts) >= 2
    assert contains_marker(prompts[0])       # seeds the first window…
    assert not contains_marker(prompts[-1])  # …but dies with the reset


def test_all_options_compose():
    """Kitchen-sink smoke: every seek-loop option at once (beam rung, word
    timestamps, clips, hallucination gate, carried prompt) yields a
    well-formed whisper result record."""
    from freud_tpu.models.whisper.runtime import WhisperRuntime

    rt = WhisperRuntime("test:tiny", max_new_tokens=6, language="en")
    audio = np.random.default_rng(9).standard_normal(int(16000 * 40)).astype(
        np.float32) * 0.1
    out = rt.transcribe_long(
        audio, beam_size=2, word_timestamps=True, clip_timestamps="0,35",
        hallucination_silence_threshold=10.0, initial_prompt="seed",
        carry_initial_prompt=True, history_budget=8,
    )
    assert set(out) == {"text", "segments", "language"}
    for s in out["segments"]:
        assert {"id", "seek", "start", "end", "text", "tokens", "temperature",
                "avg_logprob", "compression_ratio", "no_speech_prob"} <= set(s)
        for wd in s.get("words", []):
            assert set(wd) == {"word", "start", "end", "probability"}


def test_hallucination_leading_gap_skip(monkeypatch):
    """The leading-anomaly rule: when the window's first (anomalous) segment
    starts more than the threshold past the window origin, the whole
    window's output is dropped and the seek jumps over the silent gap."""
    import freud_tpu.models.whisper.long_audio as la
    from freud_tpu.models.whisper.runtime import WhisperRuntime

    rt = WhisperRuntime("test:tiny", max_new_tokens=8, language="en")
    st = rt._st
    ts0 = st.timestamp_begin
    audio = np.zeros(int(16000 * 35), np.float32)
    seeks = []

    def fake_decode(runtime, encoded, prompt, n_prompt, start, *a, **k):
        import numpy as _np
        base = _np.asarray(prompt)[0].tolist()
        # one closed segment starting 10 s into the window
        gen = [ts0 + 500, 100, ts0 + 650, ts0 + 650]
        row = base + gen + [st.eot] * (n_prompt + 8 - len(base) - len(gen))
        return (_np.asarray([row], _np.int32), -1.0, 2.0, 0.0, 0.0, 1.0)

    def fake_align(encoded, text_tokens, lang_idx=0, num_frames=None):
        n = len(text_tokens)
        return (np.full(n, 10.0), np.full(n, 13.0),
                [f"<tok:{t}>" for t in text_tokens], np.full(n, 0.01))

    real_parse = la._parse_segments

    def spy_parse(gen, st_, seek_time, window_s):
        seeks.append(round(seek_time * 100))
        return real_parse(gen, st_, seek_time, window_s)

    monkeypatch.setattr(la, "_decode_window_with_fallback", fake_decode)
    monkeypatch.setattr(la, "_parse_segments", spy_parse)
    monkeypatch.setattr(rt, "align_words", fake_align)

    out = rt.transcribe_long(audio, word_timestamps=True,
                             condition_on_previous_text=False,
                             hallucination_silence_threshold=2.0)
    # every window's leading segment is anomalous after a >2 s gap: all
    # output dropped, and each seek jumped by the 10-s gap (1000 frames),
    # not by the parse advance
    assert out["segments"] == []
    assert seeks[:3] == [0, 1000, 2000]

    # control: without the threshold the segments survive
    seeks.clear()
    out_c = rt.transcribe_long(audio, word_timestamps=True,
                               condition_on_previous_text=False)
    assert out_c["segments"]
