"""HF checkpoint loading and language utilities."""

import json

import numpy as np
import pytest

from freud_tpu.models.whisper import dims_for, encoder_forward, init_params
from freud_tpu.models.whisper.load import load_hf_dir, load_model
from freud_tpu.models.whisper.tokenizer import LANGUAGES, language_index


def _export_hf_state_dict(params, dims):
    """Write our random params into an HF-layout state dict (inverse of the
    loader's mapping) to round-trip the conversion."""
    sd = {}

    def lin(prefix, p):
        sd[f"{prefix}.weight"] = np.asarray(p["w"]).T
        if "b" in p:
            sd[f"{prefix}.bias"] = np.asarray(p["b"])

    def ln(prefix, p):
        sd[f"{prefix}.weight"] = np.asarray(p["g"])
        sd[f"{prefix}.bias"] = np.asarray(p["b"])

    e = params["encoder"]
    sd["model.encoder.conv1.weight"] = np.asarray(e["conv1"]["w"]).transpose(2, 1, 0)
    sd["model.encoder.conv1.bias"] = np.asarray(e["conv1"]["b"])
    sd["model.encoder.conv2.weight"] = np.asarray(e["conv2"]["w"]).transpose(2, 1, 0)
    sd["model.encoder.conv2.bias"] = np.asarray(e["conv2"]["b"])
    sd["model.encoder.embed_positions.weight"] = np.asarray(e["pos"])
    for i, blk in enumerate(e["blocks"]):
        p = f"model.encoder.layers.{i}"
        ln(f"{p}.self_attn_layer_norm", blk["attn_ln"])
        lin(f"{p}.self_attn.q_proj", blk["attn"]["q"])
        lin(f"{p}.self_attn.k_proj", blk["attn"]["k"])
        lin(f"{p}.self_attn.v_proj", blk["attn"]["v"])
        lin(f"{p}.self_attn.out_proj", blk["attn"]["out"])
        ln(f"{p}.final_layer_norm", blk["mlp_ln"])
        lin(f"{p}.fc1", blk["mlp"]["fc1"])
        lin(f"{p}.fc2", blk["mlp"]["fc2"])
    ln("model.encoder.layer_norm", e["ln_post"])

    d = params["decoder"]
    sd["model.decoder.embed_tokens.weight"] = np.asarray(d["tok_emb"])
    sd["model.decoder.embed_positions.weight"] = np.asarray(d["pos"])
    for i, blk in enumerate(d["blocks"]):
        p = f"model.decoder.layers.{i}"
        ln(f"{p}.self_attn_layer_norm", blk["attn_ln"])
        lin(f"{p}.self_attn.q_proj", blk["attn"]["q"])
        lin(f"{p}.self_attn.k_proj", blk["attn"]["k"])
        lin(f"{p}.self_attn.v_proj", blk["attn"]["v"])
        lin(f"{p}.self_attn.out_proj", blk["attn"]["out"])
        ln(f"{p}.encoder_attn_layer_norm", blk["cross_attn_ln"])
        lin(f"{p}.encoder_attn.q_proj", blk["cross_attn"]["q"])
        lin(f"{p}.encoder_attn.k_proj", blk["cross_attn"]["k"])
        lin(f"{p}.encoder_attn.v_proj", blk["cross_attn"]["v"])
        lin(f"{p}.encoder_attn.out_proj", blk["cross_attn"]["out"])
        ln(f"{p}.final_layer_norm", blk["mlp_ln"])
        lin(f"{p}.fc1", blk["mlp"]["fc1"])
        lin(f"{p}.fc2", blk["mlp"]["fc2"])
    ln("model.decoder.layer_norm", d["ln"])
    # safetensors serializes raw buffers: views must be made C-contiguous
    return {k: np.ascontiguousarray(v, dtype=np.float32) for k, v in sd.items()}


def test_hf_roundtrip(tmp_path):
    from safetensors.numpy import save_file

    dims = dims_for("test:tiny")
    params = init_params(dims, seed=0)
    sd = _export_hf_state_dict(params, dims)
    save_file(sd, tmp_path / "model.safetensors")
    with open(tmp_path / "config.json", "w") as f:
        json.dump(
            {
                "num_mel_bins": dims.n_mels,
                "max_source_positions": dims.n_audio_ctx,
                "d_model": dims.n_audio_state,
                "encoder_attention_heads": dims.n_audio_head,
                "encoder_layers": dims.n_audio_layer,
                "vocab_size": dims.n_vocab,
                "max_target_positions": dims.n_text_ctx,
                "decoder_attention_heads": dims.n_text_head,
                "decoder_layers": dims.n_text_layer,
            },
            f,
        )

    loaded, ldims = load_hf_dir(tmp_path)
    assert ldims == dims

    mels = np.random.default_rng(0).standard_normal((1, 80, 3000)).astype(np.float32)
    a, _ = encoder_forward(params, dims, mels)
    b, _ = encoder_forward(loaded, ldims, mels)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5)

    # load_model dispatches directories to the HF loader
    p2, d2 = load_model(str(tmp_path))
    assert d2 == dims


def test_language_index():
    assert language_index("en", 51865) == 0
    assert language_index("ja", 51865) == LANGUAGES.index("ja")
    with pytest.raises(ValueError):
        language_index("yue", 51865)  # only in the v3 vocab
    assert language_index("yue", 51866) == 99
    with pytest.raises(ValueError):
        language_index("qq", 51865)


def test_language_detection_and_pinning():
    from freud_tpu.models.whisper import WhisperRuntime

    rt = WhisperRuntime("test:tiny", max_new_tokens=2)  # auto-detect
    mels = np.zeros((1, 80, 3000), np.float32)
    text = rt.transcribe_one(mels)
    assert isinstance(text, str)
    rt_en = WhisperRuntime("test:tiny", max_new_tokens=2, language="en")
    assert isinstance(rt_en.transcribe_one(mels), str)
