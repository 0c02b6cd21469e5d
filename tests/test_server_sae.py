"""HTTP contract tests with an SAE attached (latent-space endpoints)."""

import io
import json
import threading
import urllib.request
import wave

import numpy as np
import pytest

from freud_tpu.models.sae import L1AutoEncoderConfig, init_l1, state_dict_from_params
from freud_tpu.scripts.collect_activations import get_activations
from freud_tpu.server.app import GuiState, create_server


@pytest.fixture(scope="module")
def served_sae(tmp_path_factory):
    import torch

    tmp = tmp_path_factory.mktemp("srv_sae")
    audio_dir = tmp / "audio"
    audio_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        audio = (rng.standard_normal(8000) * 0.1).astype(np.float32)
        with wave.open(str(audio_dir / f"c{i}.wav"), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes((audio * 32767).astype(np.int16).tobytes())

    cfg = L1AutoEncoderConfig(n_dict_components=40)
    params = init_l1(384, cfg, seed=0)
    ckpt = tmp / "sae.pth"
    torch.save(
        {
            "model": state_dict_from_params("l1", params),
            "hparams": {
                "autoencoder_variant": "l1",
                "autoencoder_config": cfg.to_dict(),
                "activation_size": 384,
            },
        },
        ckpt,
    )
    out = tmp / "acts"
    get_activations(
        data_path=str(audio_dir), layer_name="encoder.blocks.1",
        whisper_model="test:tiny", sae_model=str(ckpt), batch_size=2,
        out_folder=str(out), verbose=False,
    )
    config = {
        "whisper_model": "test:tiny",
        "sae_model": str(ckpt),
        "layer_name": "encoder.blocks.1",
        "batch_size": 2,
        "data_path": str(audio_dir),
        "out_folder": str(out),
        "dl_max_workers": 0,
    }
    state = GuiState(config, from_disk=True)
    state.runtime.max_new_tokens = 2
    server = create_server(state, host="127.0.0.1", port=0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{server.server_address[1]}"
    server.shutdown()


def _wav_bytes():
    buf = io.BytesIO()
    audio = np.random.default_rng(1).standard_normal(8000) * 0.1
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes((audio * 32767).astype(np.int16).tobytes())
    return buf.getvalue()


def _post(url, data):
    boundary = "b42"
    body = (
        f"--{boundary}\r\n"
        'Content-Disposition: form-data; name="audio"; filename="u.wav"\r\n'
        "Content-Type: audio/wav\r\n\r\n"
    ).encode() + data + f"\r\n--{boundary}--\r\n".encode()
    req = urllib.request.Request(
        url, data=body,
        headers={"Content-Type": f"multipart/form-data; boundary={boundary}"},
    )
    with urllib.request.urlopen(req, timeout=600) as r:
        return json.loads(r.read())


def test_status_reports_latent_space(served_sae):
    with urllib.request.urlopen(served_sae + "/status", timeout=120) as r:
        s = json.loads(r.read())
    assert s["n_features"] == 40  # SAE dictionary, not d_model


def test_top_files_over_latents(served_sae):
    with urllib.request.urlopen(
        served_sae + "/top_files?feature_idx=7&n_files=2", timeout=300
    ) as r:
        d = json.loads(r.read())
    assert len(d["top_files"]) == 2
    assert len(d["activations"][0]) == 25  # trimmed to 0.5 s


def test_top_features_latent(served_sae):
    d = _post(served_sae + "/top_features?top_n=5", _wav_bytes())
    assert len(d["top_indices"]) == 5
    assert all(0 <= i < 40 for i in d["top_indices"])


def test_manipulate_latent_feature(served_sae):
    d = _post(
        served_sae + "/manipulate_feature?feat_idx=3&manipulation_factor=0.0",
        _wav_bytes(),
    )
    assert isinstance(d["baseline_text"], str)  # SAE present → baseline text
    np.testing.assert_allclose(np.asarray(d["manipulated_activations"]), 0.0)
    assert isinstance(d["manipulated_text"], str)


# ---------------------------------------------------------------- decoder SAE


@pytest.fixture(scope="module")
def served_decoder_sae(tmp_path_factory):
    """A decoder-layer SAE behind the full HTTP surface: /manipulate_feature
    steers the block output online inside the decode (decoder_tap)."""
    import torch

    from freud_tpu.models.sae import TopKAutoEncoderConfig, init_topk

    tmp = tmp_path_factory.mktemp("srv_dec_sae")
    audio_dir = tmp / "audio"
    audio_dir.mkdir()
    rng = np.random.default_rng(3)
    for i in range(2):
        audio = (rng.standard_normal(8000) * 0.1).astype(np.float32)
        with wave.open(str(audio_dir / f"d{i}.wav"), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes((audio * 32767).astype(np.int16).tobytes())

    cfg = TopKAutoEncoderConfig(n_dict_components=32, k=4)
    params = init_topk(384, cfg, seed=0)
    ckpt = tmp / "sae.pth"
    torch.save(
        {
            "model": state_dict_from_params("topk", params),
            "hparams": {
                "autoencoder_variant": "topk",
                "autoencoder_config": cfg.to_dict(),
                "activation_size": 384,
            },
        },
        ckpt,
    )
    out = tmp / "acts"
    get_activations(
        data_path=str(audio_dir), layer_name="decoder.blocks.1",
        whisper_model="test:tiny", sae_model=str(ckpt), batch_size=2,
        out_folder=str(out), verbose=False, max_new_tokens=4,
    )
    config = {
        "whisper_model": "test:tiny",
        "sae_model": str(ckpt),
        "layer_name": "decoder.blocks.1",
        "batch_size": 2,
        "data_path": str(audio_dir),
        "out_folder": str(out),
        "dl_max_workers": 0,
    }
    state = GuiState(config, from_disk=True)
    state.runtime.max_new_tokens = 2
    server = create_server(state, host="127.0.0.1", port=0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{server.server_address[1]}"
    server.shutdown()


def test_manipulate_decoder_feature_endpoint(served_decoder_sae):
    d = _post(
        served_decoder_sae
        + "/manipulate_feature?feat_idx=3&manipulation_factor=0.0",
        _wav_bytes(),
    )
    assert isinstance(d["baseline_text"], str)
    assert isinstance(d["manipulated_text"], str)
    assert isinstance(d["standard_text"], str)
    np.testing.assert_allclose(np.asarray(d["manipulated_activations"]), 0.0)


def test_top_features_decoder_latent(served_decoder_sae):
    d = _post(served_decoder_sae + "/top_features?top_n=4", _wav_bytes())
    assert len(d["top_indices"]) == 4
    assert all(0 <= i < 32 for i in d["top_indices"])
