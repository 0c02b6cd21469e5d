"""End-to-end: train SAE → checkpoint → collect SAE activations (dense/indexed)."""

import wave

import numpy as np
import pytest

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


def test_collect_write_thread_error_propagates(tmp_path, monkeypatch):
    """A failing store write (disk full, bad shape) in the write-behind
    thread must raise in get_activations promptly — never hang the loop on
    a full queue against a dead writer thread."""
    import pytest

    from freud_tpu.data import store as store_mod

    _write_wavs(tmp_path / "audio", 4)

    def boom(self, *a, **k):
        raise OSError("disk full (simulated)")

    monkeypatch.setattr(store_mod.ActivationStoreWriter, "append_batch", boom)
    with pytest.raises(OSError, match="disk full"):
        get_activations(
            data_path=str(tmp_path / "audio"),
            layer_name="encoder.blocks.1",
            whisper_model="test:tiny",
            sae_model=None,
            batch_size=2,
            out_folder=str(tmp_path / "out"),
            verbose=False,
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


def test_collect_data_parallel_matches_single_device(tmp_path):
    """data_parallel collection (batch sharded over the 8-device mesh, mel +
    encode in one sharded jit, padded tail batch) must produce the same store
    as the single-device path."""
    import jax
    import pytest

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")

    audio = tmp_path / "audio"
    _write_wavs(audio, 10)  # 10 files, batch 8 → one full + one padded tail

    single = get_activations(
        data_path=str(audio), layer_name="encoder.blocks.1",
        whisper_model="test:tiny", sae_model=None, batch_size=8,
        out_folder=str(tmp_path / "acts_single"), verbose=False,
    )
    sharded = get_activations(
        data_path=str(audio), layer_name="encoder.blocks.1",
        whisper_model="test:tiny", sae_model=None, batch_size=8,
        out_folder=str(tmp_path / "acts_dp"), verbose=False,
        data_parallel=True,
    )
    assert single["n_files"] == sharded["n_files"] == 10
    a = ActivationStoreReader(tmp_path / "acts_single", "encoder.blocks.1")
    b = ActivationStoreReader(tmp_path / "acts_dp", "encoder.blocks.1")
    assert len(a) == len(b) == 10
    for i in range(10):
        xa, fa = a[i]
        xb, fb = b[i]
        assert fa == fb
        np.testing.assert_allclose(np.asarray(xa), np.asarray(xb),
                                   rtol=2e-5, atol=2e-5)


def test_mesh_loader_rejects_indivisible_batch():
    import jax
    import pytest

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    from freud_tpu.data.loaders import FlyActivationLoader
    from freud_tpu.parallel.mesh import make_mesh

    with pytest.raises(ValueError, match="divisible"):
        FlyActivationLoader(
            data_path="/tmp", whisper_model="test:tiny", sae_checkpoint=None,
            layer_name="encoder.blocks.1", batch_size=3, mesh=make_mesh(),
        )


def test_collect_decoder_layer(tmp_path):
    """decoder.* collection: greedy decode + teacher-forced capture per batch
    (capability parity with the reference's hooks on any named module,
    hooked_model.py:47-56). The store's n_frames records the per-clip decode
    positions actually processed — not audio-derived frame counts."""
    audio = tmp_path / "audio"
    _write_wavs(audio, 3)
    out = tmp_path / "acts"
    stats = get_activations(
        data_path=str(audio), layer_name="decoder.blocks.1",
        whisper_model="test:tiny", sae_model=None, batch_size=2,
        out_folder=str(out), verbose=False, max_new_tokens=4,
    )
    assert stats["n_files"] == 3
    r = ActivationStoreReader(out, "decoder.blocks.1")
    assert r.activation_type == "tensor"
    n_prompt = 3  # <|sot|><|lang|><|transcribe|> (timestamps on)
    assert r.tensor_shape == (n_prompt + 4, 384)
    assert r.n_frames is not None and len(r.n_frames) == 3
    assert all(n_prompt <= n <= n_prompt + 4 for n in r.n_frames)
    arr, _ = r[0]
    assert np.abs(arr[: r.n_frames[0]]).max() > 0


def test_collect_decoder_layer_with_sae(tmp_path):
    """An SAE stacks on decoder activations inside the same program."""
    audio = tmp_path / "audio"
    _write_wavs(audio, 2)
    cfg = TopKAutoEncoderConfig(expansion_factor=2, k=3)
    ckpt = tmp_path / "sae.pth"
    _save_ckpt(ckpt, "topk", cfg, 384, init_topk(384, cfg, seed=0))
    out = tmp_path / "acts"
    get_activations(
        data_path=str(audio), layer_name="decoder.blocks.0",
        whisper_model="test:tiny", sae_model=str(ckpt), batch_size=2,
        out_folder=str(out), verbose=False, max_new_tokens=4,
    )
    r = ActivationStoreReader(out, "decoder.blocks.0")
    assert r.activation_type == "indexed"
    assert r.tensor_shape == (7, 3)  # (n_prompt+max_new, k) indexed pairs
    vals, idx, _ = r[0]
    assert idx.min() >= 0 and idx.max() < 768

    # pointing the TRAINER at an indexed store must die loudly up front
    # (the (T, k) pair rows would otherwise reach the model as if dense and
    # fail in a shape error deep inside the first step)
    from freud_tpu.train.trainer import train

    with pytest.raises(SystemExit, match="indexed store"):
        train(
            seed=0, train_folder=str(out), val_folder=str(out),
            run_dir=str(tmp_path / "run"), lr=1e-3, weight_decay=0.0,
            steps=2, clip_thresh=1.0, batch_size=2, log_tb_every=2,
            save_every=2, val_every=2,
            whisper_config={"model": "test:tiny",
                            "layer_name": "decoder.blocks.0"},
            optimizer="adam", scheduler="linear",
            scheduler_params={"num_warmup_steps": 1},
            autoencoder_variant="topk",
            autoencoder_config={"expansion_factor": 2, "k": 3},
            from_disk=True, enable_transcripts=False, verbose=False,
        )

    # same guard for the VAL folder, and it must fire NOW — the val loader
    # is otherwise built lazily at the first val_every step, burning that
    # much training before dying
    raw = tmp_path / "raw"
    get_activations(
        data_path=str(audio), layer_name="decoder.blocks.0",
        whisper_model="test:tiny", sae_model=None, batch_size=2,
        out_folder=str(raw), verbose=False, max_new_tokens=4,
    )
    with pytest.raises(SystemExit, match="indexed store"):
        train(
            seed=0, train_folder=str(raw), val_folder=str(out),
            run_dir=str(tmp_path / "run2"), lr=1e-3, weight_decay=0.0,
            steps=2, clip_thresh=1.0, batch_size=2, log_tb_every=2,
            save_every=2, val_every=2,
            whisper_config={"model": "test:tiny",
                            "layer_name": "decoder.blocks.0"},
            optimizer="adam", scheduler="linear",
            scheduler_params={"num_warmup_steps": 1},
            autoencoder_variant="topk",
            autoencoder_config={"expansion_factor": 2, "k": 3},
            from_disk=True, enable_transcripts=False, verbose=False,
        )


def test_decoder_store_train_and_search(tmp_path):
    """Full decoder-layer loop: collect → train an SAE on the store → search.
    Decoder stores are ordinary stores (per-clip n_frames = decode positions
    actually processed), so the training and analysis surfaces consume them
    unchanged; validation transcripts steer the block output ONLINE with the
    current SAE's reconstruction (decoder_tap) instead of the encoder-side
    tensor splice."""
    from freud_tpu.analysis.search import top_activations
    from freud_tpu.train.trainer import train

    audio = tmp_path / "audio"
    _write_wavs(audio, 4)
    out = tmp_path / "acts"
    get_activations(
        data_path=str(audio), layer_name="decoder.blocks.0",
        whisper_model="test:tiny", sae_model=None, batch_size=2,
        out_folder=str(out), verbose=False, max_new_tokens=4,
    )
    stats = train(
        seed=0, train_folder=str(out), val_folder=str(out),
        run_dir=str(tmp_path / "run"), lr=1e-3, weight_decay=0.0, steps=4,
        clip_thresh=1.0, batch_size=2, log_tb_every=2, save_every=4,
        val_every=4,
        whisper_config={"model": "test:tiny", "layer_name": "decoder.blocks.0"},
        optimizer="adam", scheduler="linear",
        scheduler_params={"num_warmup_steps": 1},
        autoencoder_variant="topk",
        autoencoder_config={"expansion_factor": 2, "k": 3},
        from_disk=True, enable_transcripts=True,  # online-steered transcripts
        max_transcript_tokens=3,
        verbose=False,
    )
    assert stats["steps"] == 4

    loader = MemoryMappedActivationLoader(str(out), "decoder.blocks.0",
                                          batch_size=2)
    results, per_file = top_activations(loader, feature_idx=5, n_files=2)
    assert len(results) == 2 and len(per_file) == 4
    r = ActivationStoreReader(out, "decoder.blocks.0")
    names = list(r.filenames)
    for fname, trace, value, max_t in results:
        nf = r.n_frames[names.index(fname)]
        assert trace.shape[0] == nf  # trimmed to decode positions, not 1500
        assert np.isclose(trace.max(), value, rtol=1e-5)
