"""HTTP contract tests pinning the five endpoint schemas (SURVEY.md §2/§4)."""

import io
import json
import threading
import urllib.request
import wave
from pathlib import Path

import numpy as np
import pytest

from freud_tpu.scripts.collect_activations import get_activations
from freud_tpu.server.app import GuiState, create_server


def _write_wav(path, audio):
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes((audio * 32767).astype(np.int16).tobytes())


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("srv")
    audio_dir = tmp / "audio"
    audio_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(4):
        _write_wav(audio_dir / f"c{i}.wav",
                   (rng.standard_normal(8000) * 0.1).astype(np.float32))
    out = tmp / "acts"
    get_activations(
        data_path=str(audio_dir), layer_name="encoder.blocks.1",
        whisper_model="test:tiny", sae_model=None, batch_size=2,
        out_folder=str(out), verbose=False,
    )
    config = {
        "whisper_model": "test:tiny",
        "sae_model": None,
        "layer_name": "encoder.blocks.1",
        "batch_size": 2,
        "data_path": str(audio_dir),
        "out_folder": str(out),
        "dl_max_workers": 0,
    }
    state = GuiState(config, from_disk=True)
    state.runtime.max_new_tokens = 3
    server = create_server(state, host="127.0.0.1", port=0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}", audio_dir
    server.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=300) as r:
        return r.status, json.loads(r.read())


def _post_multipart(url, audio_bytes, filename="u.wav"):
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


def _wav_bytes(seconds=0.5):
    buf = io.BytesIO()
    audio = (np.random.default_rng(1).standard_normal(int(16000 * seconds)) * 0.1)
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes((audio * 32767).astype(np.int16).tobytes())
    return buf.getvalue()


def test_status(served):
    base, _ = served
    code, body = _get(base + "/status")
    assert code == 200
    assert body["status"] == "Initialization complete"
    assert body["n_features"] == 384
    assert body["layer_name"] == "encoder.blocks.1"
    assert body["allow_audio_upload"] is True


def test_top_files(served):
    base, _ = served
    code, body = _get(base + "/top_files?feature_idx=5&n_files=2")
    assert code == 200
    assert set(body) == {"top_files", "activations", "max_per_file"}
    assert len(body["top_files"]) == 2
    assert len(body["activations"]) == 2
    assert len(body["max_per_file"]) == 4
    assert all(isinstance(f, str) for f in body["top_files"])
    # 0.5 s clips → 25-frame trimmed traces
    assert len(body["activations"][0]) == 25


def test_audio_route(served):
    base, audio_dir = served
    target = str(audio_dir / "c0.wav")
    with urllib.request.urlopen(base + "/audio" + target, timeout=60) as r:
        assert r.status == 200
        assert r.headers["Content-Type"] == "audio/wav"
        assert len(r.read()) > 100


def test_audio_route_blocks_escapes(served):
    base, _ = served
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(base + "/audio/etc/passwd", timeout=60)
    assert ei.value.code == 403


def test_top_features(served):
    base, _ = served
    code, body = _post_multipart(base + "/top_features?top_n=4", _wav_bytes())
    assert code == 200
    assert set(body) == {"top_indices", "top_activations"}
    assert len(body["top_indices"]) == 4
    assert len(body["top_activations"]) == 4
    assert len(body["top_activations"][0]) == 25


def test_top_features_bad_upload(served):
    base, _ = served
    code, body = _post_multipart(base + "/top_features", b"")
    assert code == 400
    assert "error" in body


def test_manipulate_feature(served):
    base, _ = served
    code, body = _post_multipart(
        base + "/manipulate_feature?feat_idx=3&manipulation_factor=2.0",
        _wav_bytes(),
    )
    assert code == 200
    assert set(body) == {
        "baseline_text", "manipulated_text", "standard_text",
        "standard_activations", "manipulated_activations",
    }
    # reference returns the unmodified-forward transcript in every path,
    # SAE or not (src/utils/activations.py:241-242)
    assert isinstance(body["baseline_text"], str) and body["baseline_text"]
    assert isinstance(body["manipulated_text"], str)
    np.testing.assert_allclose(
        np.asarray(body["manipulated_activations"]),
        2.0 * np.asarray(body["standard_activations"]),
        rtol=1e-5, atol=1e-6,
    )


# ---- React-contract replays -------------------------------------------------
# These requests are DERIVED from the reference GUI source — the one consumer
# the compatibility claim is about. Each test replays the exact URL template /
# multipart shape the JS builds, so a param rename in app.py fails here.


def test_react_status_poll(served):
    """ActivationDisplay.js:17-23: fetch(`${API_BASE_URL}/status`), gates the
    UI on data.status === "Initialization complete" and reads
    data.n_features."""
    base, _ = served
    code, body = _get(base + "/status")
    assert code == 200
    assert body["status"] == "Initialization complete"
    assert isinstance(body["n_features"], int)


def test_react_top_files_url_template(served):
    """ActivationSearchTab.js:52-75: `/top_files?feature_idx=${idx}
    &n_files=${nResults}` then conditionally `&max_val=` `&min_val=`
    `&absolute_magnitude=true`; consumes data.top_files / data.activations /
    data.max_per_file."""
    base, _ = served
    # all optional params present, exactly as the JS appends them
    url = (base + "/top_files?feature_idx=5&n_files=2"
           + "&max_val=1000.5&min_val=-1000&absolute_magnitude=true")
    code, body = _get(url)
    assert code == 200
    for key in ("top_files", "activations", "max_per_file"):
        assert key in body
    assert len(body["top_files"]) == len(body["activations"]) == 2

    # minimal form (no optional params)
    code2, body2 = _get(base + "/top_files?feature_idx=0&n_files=1")
    assert code2 == 200 and len(body2["top_files"]) == 1


def test_react_audio_url_is_one_encoded_segment(served):
    """AudioPlayerWithActivation.js:109/142:
    `${apiBaseUrl}/audio/${encodeURIComponent(audioFile)}` — the ABSOLUTE
    file path percent-encoded as a single path segment (slashes become %2F).
    The server must decode it back to the same file the raw-path form
    serves."""
    base, audio_dir = served
    target = str(audio_dir / "c0.wav")
    encoded = urllib.parse.quote(target, safe="")  # == encodeURIComponent
    assert "%2F" in encoded
    with urllib.request.urlopen(base + "/audio/" + encoded, timeout=60) as r:
        assert r.status == 200
        body_enc = r.read()
    with urllib.request.urlopen(base + "/audio" + target, timeout=60) as r:
        body_raw = r.read()
    assert body_enc == body_raw and len(body_enc) > 100


def test_react_top_features_multipart(served):
    """TopFeaturesTab.js:19-29: POST `/top_features?top_n=${topN}` with a
    FormData whose single field is named "audio"; consumes data.top_indices
    and data.top_activations (parallel arrays)."""
    base, _ = served
    code, body = _post_multipart(base + "/top_features?top_n=3", _wav_bytes())
    assert code == 200
    assert len(body["top_indices"]) == len(body["top_activations"]) == 3

    # a WRONGLY-named multipart field must be rejected — guards against the
    # server silently accepting a different field name than the React client
    boundary = "tb99"
    wav = _wav_bytes()
    raw = (
        f"--{boundary}\r\n"
        f'Content-Disposition: form-data; name="file"; filename="u.wav"\r\n'
        f"Content-Type: audio/wav\r\n\r\n"
    ).encode() + wav + f"\r\n--{boundary}--\r\n".encode()
    req = urllib.request.Request(
        base + "/top_features?top_n=3", data=raw,
        headers={"Content-Type": f"multipart/form-data; boundary={boundary}"},
    )
    try:
        with urllib.request.urlopen(req, timeout=60) as r:
            code2 = r.status
    except urllib.error.HTTPError as e:
        code2 = e.code
    assert code2 == 400


def test_react_manipulate_feature_multipart(served):
    """ManipulateFeatureTab.js:17-30: POST `/manipulate_feature
    ?feat_idx=${featureIndex}&manipulation_factor=${ablationFactor}` with
    FormData field "audio"; renders data.baseline_text,
    data.standard_activations, data.standard_text,
    data.manipulated_activations, data.manipulated_text
    (ManipulateFeatureTab.js:71-95)."""
    base, _ = served
    code, body = _post_multipart(
        base + "/manipulate_feature?feat_idx=2&manipulation_factor=-1.5",
        _wav_bytes(),
    )
    assert code == 200
    for key in ("baseline_text", "standard_text", "manipulated_text",
                "standard_activations", "manipulated_activations"):
        assert key in body
    np.testing.assert_allclose(
        np.asarray(body["manipulated_activations"]),
        -1.5 * np.asarray(body["standard_activations"]),
        rtol=1e-5, atol=1e-6,
    )


def test_react_every_accessed_response_field_is_served(served):
    """STATIC extraction over the reference JS (VERDICT r3 item 8a): find
    every property the React code reads off a parsed response — directly
    (`data.x` after response.json()) or through the state variable the
    whole object is stored into (`setManipulationResults(data)` →
    `manipulationResults.x`) — and assert the live payloads carry every one
    of them. A field the stock GUI dereferences that we stop serving fails
    here without npm or a browser."""
    import re

    ref_gui = Path("/root/reference/gui/src")
    if not ref_gui.is_dir():
        pytest.skip("reference GUI source unavailable")

    def response_fields(js_path):
        src = js_path.read_text()
        result_vars = set(re.findall(
            r"(?:const|let|var)\s+(\w+)\s*=\s*await\s+\w+\.json\(\)", src))
        result_vars |= set(re.findall(
            r"\.then\(\s*(\w+)\s*=>\s*\{", src)) & {"data"}
        # whole-object stores: setFooBar(data) → fooBar
        for setter in re.findall(r"set([A-Z]\w*)\(\s*data\s*\)", src):
            result_vars.add(setter[0].lower() + setter[1:])
        fields = set()
        for var in result_vars:
            fields |= set(re.findall(rf"\b{var}(?:\?)?\.(\w+)", src))
            fields |= set(re.findall(rf"\b{var}\[[\"'](\w+)[\"']\]", src))
        return fields

    base, _ = served
    # endpoint payloads, live from the server under test
    _, status_body = _get(base + "/status")
    _, tf_body = _get(base + "/top_files?feature_idx=1&n_files=1")
    _, feat_body = _post_multipart(base + "/top_features?top_n=2",
                                   _wav_bytes())
    _, man_body = _post_multipart(
        base + "/manipulate_feature?feat_idx=1&manipulation_factor=2",
        _wav_bytes())
    payload_for = {
        "ActivationDisplay.js": status_body,
        "ActivationSearchTab.js": tf_body,
        "TopFeaturesTab.js": feat_body,
        "ManipulateFeatureTab.js": man_body,
    }
    checked = 0
    for js_name, payload in payload_for.items():
        fields = response_fields(ref_gui / js_name)
        assert fields, f"{js_name}: extraction found no response fields"
        missing = fields - set(payload)
        assert not missing, f"{js_name} reads {sorted(missing)} " \
                            f"but the payload only has {sorted(payload)}"
        checked += len(fields)
    assert checked >= 12  # the extraction really saw the GUI's consumption


def test_internal_error_returns_json_500(served, monkeypatch):
    """An unexpected handler exception must answer a JSON 500 (Flask's
    behavior, which the React client's response.ok check expects), not drop
    the connection mid-request."""
    import freud_tpu.analysis.search as search_mod

    base, _ = served

    def boom(*a, **k):
        raise RuntimeError("kaboom")

    monkeypatch.setattr(search_mod, "top_activations", boom)
    # the server process shares this interpreter (threaded, same module)
    import freud_tpu.server.app as app_mod
    monkeypatch.setattr(app_mod, "top_activations", boom)
    try:
        with urllib.request.urlopen(
                base + "/top_files?feature_idx=1&n_files=1", timeout=60) as r:
            code, body = r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        code, body = e.code, json.loads(e.read())
    assert code == 500
    assert "error" in body and "kaboom" in body["error"]


def test_manipulate_feature_rejects_out_of_range_index(served):
    """JAX clamp-gather semantics would silently manipulate the LAST feature
    for a bogus index — the endpoint must 400 instead."""
    base, _ = served
    code, body = _post_multipart(
        base + "/manipulate_feature?feat_idx=999999&manipulation_factor=2.0",
        _wav_bytes(),
    )
    assert code == 400 and "error" in body
