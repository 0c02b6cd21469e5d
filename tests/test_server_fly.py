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
