"""Native audio decoder tests (libavformat-backed libfreud_audio.so)."""

import wave

import numpy as np

from freud_tpu.audio.decode import (
    audio_duration_s,
    load_audio,
    load_audio_batch,
    native_lib,
)
from freud_tpu.constants import N_SAMPLES, SAMPLE_RATE


def _write_wav(path, audio, sr=SAMPLE_RATE):
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((audio * 32767).astype(np.int16).tobytes())


def test_native_lib_loads():
    assert native_lib() is not None, "native decoder should build in this image"


def test_decode_flac_example(example_flac):
    audio = load_audio(example_flac)
    assert audio.dtype == np.float32
    # LibriSpeech clips are 16 kHz speech of a plausible duration with energy.
    assert 2 * SAMPLE_RATE < len(audio) < 35 * SAMPLE_RATE
    assert 0.001 < np.abs(audio).max() <= 1.0


def test_decode_wav_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    ref = (rng.standard_normal(SAMPLE_RATE) * 0.1).astype(np.float32)
    path = tmp_path / "t.wav"
    _write_wav(path, ref)
    audio = load_audio(str(path))
    assert len(audio) == SAMPLE_RATE
    np.testing.assert_allclose(audio, ref, atol=1.5 / 32768)


def test_decode_resamples(tmp_path):
    ref = np.sin(2 * np.pi * 440 * np.arange(8000) / 8000).astype(np.float32) * 0.5
    path = tmp_path / "r.wav"
    _write_wav(path, ref, sr=8000)
    audio = load_audio(str(path))  # 1 s at 8 kHz -> ~16000 samples at 16 kHz
    assert abs(len(audio) - SAMPLE_RATE) < 64


def test_batch_decode(tmp_path, example_flac):
    paths = []
    for i in range(3):
        p = tmp_path / f"b{i}.wav"
        _write_wav(p, np.full(1000 * (i + 1), 0.25, np.float32))
        paths.append(str(p))
    paths.append(example_flac)
    buf, lengths = load_audio_batch(paths)
    assert buf.shape == (4, N_SAMPLES)
    assert list(lengths[:3]) == [1000, 2000, 3000]
    assert lengths[3] > SAMPLE_RATE
    # zero-padding beyond true length
    assert buf[0, 1000:].sum() == 0
    # batch row matches single-file decode
    single = load_audio(paths[0])
    np.testing.assert_allclose(buf[0, :1000], single, atol=1e-7)


def test_duration(tmp_path, example_flac):
    p = tmp_path / "d.wav"
    _write_wav(p, np.zeros(SAMPLE_RATE * 2, np.float32))
    assert abs(audio_duration_s(str(p)) - 2.0) < 0.01
    dur = audio_duration_s(example_flac)
    audio = load_audio(example_flac)
    assert abs(dur - len(audio) / SAMPLE_RATE) < 0.1


def test_task_translate_prompt():
    """task="translate" swaps the task token in the decoder prompt (whisper
    DecodingOptions.task); invalid tasks are rejected."""
    import numpy as np
    import pytest

    from freud_tpu.models.whisper.runtime import WhisperRuntime

    rt = WhisperRuntime("test:tiny", max_new_tokens=4, language="en",
                        task="translate")
    mels = np.random.default_rng(0).standard_normal((1, 80, 3000)).astype(
        np.float32)
    enc = rt.encode(mels)
    prompt, n_prompt = rt._prompt(enc)
    st = rt._st
    assert int(np.asarray(prompt)[0, 2]) == st.translate
    rt2 = WhisperRuntime("test:tiny", max_new_tokens=4, language="en")
    prompt2, _ = rt2._prompt(enc)
    assert int(np.asarray(prompt2)[0, 2]) == st.transcribe
    with pytest.raises(ValueError):
        WhisperRuntime("test:tiny", task="detect")


def test_substitute_broadcasts_over_batch():
    """A single (s, d) replacement against BATCHED mels must transcribe every
    clip (the wholesale residual-stream substitution would otherwise collapse
    the encode to batch 1 and silently drop clips)."""
    import numpy as np

    from freud_tpu.models.whisper.runtime import WhisperRuntime

    rt = WhisperRuntime("test:tiny", max_new_tokens=4, language="en")
    rng = np.random.default_rng(3)
    mels = rng.standard_normal((3, 80, 3000)).astype(np.float32)
    sub = rng.standard_normal((1500, rt.dims.n_audio_state)).astype(np.float32)
    texts = rt.transcribe(mels, substitute_layer="encoder.blocks.1",
                          substitute_value=sub)
    assert len(texts) == 3
