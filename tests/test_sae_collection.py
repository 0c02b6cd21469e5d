"""End-to-end: train SAE → checkpoint → collect SAE activations (dense/indexed)."""

import wave

import numpy as np

from freud_tpu.data.loaders import MemoryMappedActivationLoader
from freud_tpu.data.store import ActivationStoreReader
from freud_tpu.models.sae import (
    L1AutoEncoderConfig,
    TopKAutoEncoderConfig,
    init_l1,
    init_topk,
    state_dict_from_params,
)
from freud_tpu.scripts.collect_activations import get_activations


def _write_wavs(folder, n, seconds=0.3, seed=0):
    rng = np.random.default_rng(seed)
    folder.mkdir(exist_ok=True)
    for i in range(n):
        p = folder / f"clip{i}.wav"
        audio = (rng.standard_normal(int(16000 * seconds)) * 0.1).astype(np.float32)
        with wave.open(str(p), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes((audio * 32767).astype(np.int16).tobytes())


def _save_ckpt(path, variant, cfg, act_size, params):
    import torch

    torch.save(
        {
            "model": state_dict_from_params(variant, params),
            "hparams": {
                "autoencoder_variant": variant,
                "autoencoder_config": cfg.to_dict(),
                "activation_size": act_size,
            },
        },
        path,
    )


def test_collect_l1_sae_latents(tmp_path):
    audio = tmp_path / "audio"
    _write_wavs(audio, 3)
    cfg = L1AutoEncoderConfig(n_dict_components=48)
    ckpt = tmp_path / "sae.pth"
    _save_ckpt(ckpt, "l1", cfg, 384, init_l1(384, cfg, seed=0))

    out = tmp_path / "acts"
    stats = get_activations(
        data_path=str(audio), layer_name="encoder.blocks.1",
        whisper_model="test:tiny", sae_model=str(ckpt), batch_size=2,
        out_folder=str(out), verbose=False,
    )
    assert stats["n_files"] == 3
    r = ActivationStoreReader(out, "encoder.blocks.1")
    assert r.activation_type == "tensor"
    assert r.tensor_shape == (1500, 48)  # latent width, not d_model
    arr, _ = r[0]
    assert np.abs(arr).max() > 0


def test_collect_topk_sae_indexed(tmp_path):
    audio = tmp_path / "audio"
    _write_wavs(audio, 4)
    cfg = TopKAutoEncoderConfig(expansion_factor=2, k=5)
    ckpt = tmp_path / "sae.pth"
    _save_ckpt(ckpt, "topk", cfg, 384, init_topk(384, cfg, seed=0))

    out = tmp_path / "acts"
    get_activations(
        data_path=str(audio), layer_name="encoder.blocks.1",
        whisper_model="test:tiny", sae_model=str(ckpt), batch_size=3,
        out_folder=str(out), verbose=False,
    )
    r = ActivationStoreReader(out, "encoder.blocks.1")
    assert r.activation_type == "indexed"
    assert r.tensor_shape == (1500, 5)  # k pairs per frame
    assert r.activation_shape == [1500, 768]  # n_dict reported, reference-style
    vals, idx, _ = r[0]
    assert idx.dtype == np.int64
    assert idx.min() >= 0 and idx.max() < 768
    assert (vals >= 0).all()  # ReLU'd topk values

    # the indexed store round-trips through the mmap loader + search
    from freud_tpu.analysis.search import top_activations

    loader = MemoryMappedActivationLoader(out, "encoder.blocks.1", batch_size=2)
    feat = int(idx[0, 0])
    results, mpf = top_activations(loader, feat, 2)
    assert len(results) == 2
    assert len(mpf) == 4
