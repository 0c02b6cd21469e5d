"""GUI server in on-the-fly mode (no pre-collected store)."""

import json
import threading
import urllib.request
import wave

import numpy as np
import pytest

from freud_tpu.server.app import GuiState, create_server


@pytest.fixture(scope="module")
def served_fly(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("fly")
    audio_dir = tmp / "audio"
    audio_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        with wave.open(str(audio_dir / f"c{i}.wav"), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes(
                (rng.standard_normal(8000) * 3000).astype(np.int16).tobytes()
            )
    config = {
        "whisper_model": "test:tiny",
        "sae_model": None,
        "layer_name": "encoder.blocks.0",
        "batch_size": 2,
        "data_path": str(audio_dir),
        "dl_max_workers": 0,
    }
    state = GuiState(config, from_disk=False)
    state.runtime.max_new_tokens = 2
    server = create_server(state, host="127.0.0.1", port=0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{server.server_address[1]}"
    server.shutdown()


def test_fly_status_and_search(served_fly):
    with urllib.request.urlopen(served_fly + "/status", timeout=120) as r:
        s = json.loads(r.read())
    assert s["n_features"] == 384

    with urllib.request.urlopen(
        served_fly + "/top_files?feature_idx=3&n_files=2", timeout=300
    ) as r:
        d = json.loads(r.read())
    assert len(d["top_files"]) == 2
    assert len(d["max_per_file"]) == 3
    # fly search trims via audio headers: 0.5 s clips → 25 frames
    assert len(d["activations"][0]) == 25


def test_fly_serves_gui_page(served_fly):
    with urllib.request.urlopen(served_fly + "/", timeout=60) as r:
        page = r.read().decode()
    assert "freud_tpu" in page and "Activation Search" in page
    # the transcription controls ship with the upload tab
    assert "runTranscribe" in page and 'id="t-fallback"' in page
    assert 'id="t-words"' in page and "word_timestamps" in page


def _post_multipart(url, audio_bytes, filename="u.wav"):
    import urllib.error

    boundary = "testboundary42"
    body = (
        f"--{boundary}\r\n"
        f'Content-Disposition: form-data; name="audio"; filename="{filename}"\r\n'
        f"Content-Type: audio/wav\r\n\r\n"
    ).encode() + audio_bytes + f"\r\n--{boundary}--\r\n".encode()
    req = urllib.request.Request(
        url, data=body,
        headers={"Content-Type": f"multipart/form-data; boundary={boundary}"},
    )
    try:
        with urllib.request.urlopen(req, timeout=600) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _wav_bytes(seconds=0.5, seed=1):
    import io

    buf = io.BytesIO()
    audio = np.random.default_rng(seed).standard_normal(int(16000 * seconds))
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes((audio * 0.1 * 32767).astype(np.int16).tobytes())
    return buf.getvalue()


def test_transcribe_endpoint(served_fly):
    """POST /transcribe (the serving route beyond the reference's five):
    plain, fallback-ladder, and long-audio forms."""
    code, d = _post_multipart(served_fly + "/transcribe", _wav_bytes())
    assert code == 200 and isinstance(d["text"], str)

    code, d = _post_multipart(
        served_fly + "/transcribe?fallback=1", _wav_bytes()
    )
    assert code == 200 and isinstance(d["text"], str)

    # >30 s routes through transcribe_long automatically → segments form
    code, d = _post_multipart(
        served_fly + "/transcribe", _wav_bytes(seconds=31.0)
    )
    assert code == 200
    assert "segments" in d and isinstance(d["text"], str)
    for seg in d["segments"]:
        assert {"start", "end", "text", "temperature"} <= set(seg)


def test_transcribe_endpoint_rejects_empty(served_fly):
    code, d = _post_multipart(served_fly + "/transcribe", b"")
    assert code == 400 and "error" in d


def test_concurrent_requests_are_serialized(served_fly):
    """The device lock must serialize concurrent search + transcribe work:
    parallel clients all get well-formed 200s, no interleaved-jit errors."""
    import threading

    errors = []
    results = {"search": 0, "transcribe": 0}

    def search_worker():
        try:
            for _ in range(3):
                with urllib.request.urlopen(
                    served_fly + "/top_files?feature_idx=1&n_files=2",
                    timeout=600,
                ) as r:
                    d = json.loads(r.read())
                assert len(d["top_files"]) == 2
                results["search"] += 1
        except Exception as e:  # noqa: BLE001 — collected for the assert
            errors.append(e)

    def transcribe_worker():
        try:
            for _ in range(3):
                code, d = _post_multipart(
                    served_fly + "/transcribe", _wav_bytes(seed=7)
                )
                assert code == 200 and isinstance(d["text"], str)
                results["transcribe"] += 1
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=search_worker),
               threading.Thread(target=transcribe_worker)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert not errors, errors
    assert results == {"search": 3, "transcribe": 3}


def test_fly_state_respects_precision(tmp_path):
    import jax.numpy as jnp

    from freud_tpu.server.app import GuiState

    audio_dir = tmp_path / "a"
    audio_dir.mkdir()
    rng = np.random.default_rng(0)
    with wave.open(str(audio_dir / "c.wav"), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes((rng.standard_normal(4000) * 3000).astype(np.int16).tobytes())
    state = GuiState({
        "whisper_model": "test:tiny",
        "sae_model": None,
        "layer_name": "encoder.blocks.0",
        "batch_size": 1,
        "data_path": str(audio_dir),
        "precision": "bfloat16",
    }, from_disk=False)
    assert state.runtime.compute_dtype == jnp.bfloat16


def test_oversized_upload_rejected_without_read(served_fly):
    import urllib.error

    req = urllib.request.Request(
        served_fly + "/transcribe", data=b"x",
        headers={"Content-Type": "multipart/form-data; boundary=b",
                 "Content-Length": str(300 * 1024 * 1024)},
    )
    # the server must answer 413 from the header alone (it would otherwise
    # block reading 300 MB that never arrives)
    try:
        urllib.request.urlopen(req, timeout=30)
        raise AssertionError("expected HTTP error")
    except urllib.error.HTTPError as e:
        assert e.code == 413
        assert "error" in json.loads(e.read())


def _post_multipart_raw(url, audio_bytes, filename="u.wav"):
    """Like _post_multipart but returns (status, content_type, raw text) —
    for the non-JSON ?format= responses."""
    import urllib.error

    boundary = "testboundary42"
    body = (
        f"--{boundary}\r\n"
        f'Content-Disposition: form-data; name="audio"; filename="{filename}"\r\n'
        f"Content-Type: audio/wav\r\n\r\n"
    ).encode() + audio_bytes + f"\r\n--{boundary}--\r\n".encode()
    req = urllib.request.Request(
        url, data=body,
        headers={"Content-Type": f"multipart/form-data; boundary={boundary}"},
    )
    try:
        with urllib.request.urlopen(req, timeout=600) as r:
            return r.status, r.headers.get("Content-Type", ""), r.read().decode()
    except urllib.error.HTTPError as e:
        return e.code, e.headers.get("Content-Type", ""), e.read().decode()


def test_transcribe_endpoint_formats(served_fly):
    """?format=srt|vtt|txt renders server-side via the transcript writers;
    subtitle formats demand the long path's timed segments."""
    code, ctype, text = _post_multipart_raw(
        served_fly + "/transcribe?format=txt", _wav_bytes()
    )
    assert code == 200 and ctype.startswith("text/plain")
    assert text.endswith("\n")

    # srt on a 30-s window (no segments) → explicit 400, not a crash
    code, _, text = _post_multipart_raw(
        served_fly + "/transcribe?format=srt", _wav_bytes()
    )
    assert code == 400 and "long=1" in text

    code, ctype, text = _post_multipart_raw(
        served_fly + "/transcribe?format=vtt&long=1", _wav_bytes()
    )
    assert code == 200 and ctype.startswith("text/vtt")
    assert text.startswith("WEBVTT")

    code, _, text = _post_multipart_raw(
        served_fly + "/transcribe?format=docx", _wav_bytes()
    )
    assert code == 400 and "format" in text


def test_transcribe_endpoint_word_timestamps(served_fly):
    """?long=1&word_timestamps=1 returns segments whose word lists carry
    whisper's {word, start, end, probability} record."""
    code, d = _post_multipart(
        served_fly + "/transcribe?long=1&word_timestamps=1",
        _wav_bytes(seconds=2.0)
    )
    assert code == 200
    assert set(d) == {"text", "segments", "language"}
    for s in d["segments"]:
        for wd in s.get("words", []):
            assert set(wd) == {"word", "start", "end", "probability"}


def test_transcribe_endpoint_subtitle_options(served_fly):
    """?format=vtt&long=1&word_timestamps=1&highlight_words=1 renders
    word-boundary karaoke cues server-side."""
    code, ctype, text = _post_multipart_raw(
        served_fly + "/transcribe?format=vtt&long=1&word_timestamps=1"
        "&highlight_words=1&max_line_width=30",
        _wav_bytes(seconds=2.0)
    )
    assert code == 200 and ctype.startswith("text/vtt")
    assert text.startswith("WEBVTT")
    # noise decodes may yield zero segments; when words exist the karaoke
    # underline must appear
    if "-->" in text and "<tok:" in text:
        assert "<u>" in text


def test_top_features_rejects_bad_top_n(served_fly):
    code, d = _post_multipart(
        served_fly + "/top_features?top_n=999999", _wav_bytes())
    assert code == 400 and "top_n" in d["error"]
    code, d = _post_multipart(
        served_fly + "/top_features?top_n=0", _wav_bytes())
    assert code == 400
