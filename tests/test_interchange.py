"""Cross-implementation artifact interchange.

Proves (not just asserts) that freud_tpu reads artifacts laid out the way the
reference writes them, and that reference-style consumers can read ours:

* checkpoints: a dict written directly with ``torch.save`` in the reference
  trainer's layout (src/scripts/train_sae.py:232-251 state keys; model keys
  per src/models/l1autoencoder.py / topkautoencoder.py) loads through
  ``sae_from_checkpoint``; and our checkpoints ``torch.load`` cleanly with
  the reference's key names.
* activation stores: a store whose ``.npy`` was written by plain ``np.save``
  (tight header, no growth headroom — the npy-append-array/foreign case,
  src/dataset/activations.py:116-174 reads these with np.load mmap) is
  readable, and APPENDABLE: AppendableNpy rebases the header once at open.
"""

import json

import numpy as np
import pytest
import torch

from freud_tpu.data.store import ActivationStoreWriter, AppendableNpy
from freud_tpu.data.loaders import MemoryMappedActivationLoader
from freud_tpu.models.sae import sae_from_checkpoint
from freud_tpu.models.sae.serialize import save_checkpoint, state_dict_from_params


def test_reference_style_l1_checkpoint_loads(tmp_path):
    torch.manual_seed(0)
    act_size, n_dict = 8, 16
    sd = {
        "decoder.weight": torch.randn(act_size, n_dict),
        "encoder_bias": torch.randn(n_dict),
    }
    ckpt = {
        "model": sd,
        "optimizer": {},
        "scheduler": {},
        "step": 123,
        "best_val_loss": 0.5,
        "hparams": {
            "autoencoder_variant": "l1",
            "autoencoder_config": {"n_dict_components": n_dict,
                                   "recon_alpha": 1e4},
            "activation_size": act_size,
        },
    }
    path = tmp_path / "ref.pth"
    torch.save(ckpt, path)

    variant, cfg, size, params = sae_from_checkpoint(str(path))
    assert variant == "l1" and size == act_size
    np.testing.assert_allclose(
        np.asarray(params.W), sd["decoder.weight"].numpy(), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(params.encoder_bias), sd["encoder_bias"].numpy(), rtol=1e-6)


def test_reference_style_topk_checkpoint_loads(tmp_path):
    torch.manual_seed(1)
    d_in, n_dict = 8, 32
    sd = {
        "encoder.weight": torch.randn(n_dict, d_in),
        "encoder.bias": torch.zeros(n_dict),
        "W_dec": torch.randn(n_dict, d_in),
        "b_dec": torch.randn(d_in),
    }
    ckpt = {
        "model": sd,
        "step": 7,
        "hparams": {
            "autoencoder_variant": "topk",
            "autoencoder_config": {"expansion_factor": 4, "k": 3,
                                   "auxk_alpha": 0.03125},
            "activation_size": d_in,
        },
    }
    path = tmp_path / "ref_topk.pth"
    torch.save(ckpt, path)

    variant, cfg, size, params = sae_from_checkpoint(str(path))
    assert variant == "topk" and size == d_in and cfg.k == 3
    np.testing.assert_allclose(np.asarray(params.W_dec), sd["W_dec"].numpy(),
                               rtol=1e-6)


def test_our_checkpoint_reads_with_reference_consumer_semantics(tmp_path):
    """The reference's init_sae_from_checkpoint does torch.load →
    hparams[...] → load_state_dict (src/dataset/activations.py:16-31).
    Mimic that consumer byte-for-byte on one of OUR checkpoints."""
    from freud_tpu.models.sae import init_l1
    from freud_tpu.models.sae.config import L1AutoEncoderConfig

    cfg = L1AutoEncoderConfig(n_dict_components=16)
    params = init_l1(8, cfg, seed=0)
    path = tmp_path / "ours.pth"
    save_checkpoint(str(path), {
        "model": state_dict_from_params("l1", params),
        "step": 9,
        "hparams": {
            "autoencoder_variant": "l1",
            "autoencoder_config": {"n_dict_components": 16},
            "activation_size": 8,
        },
    })

    ck = torch.load(path, map_location="cpu", weights_only=False)
    assert ck["hparams"]["autoencoder_variant"] == "l1"
    assert ck["hparams"]["activation_size"] == 8
    sd = ck["model"]
    assert set(sd.keys()) == {"decoder.weight", "encoder_bias"}
    assert tuple(sd["decoder.weight"].shape) == (8, 16)
    # torch consumer can use them as real tensors
    w = sd["decoder.weight"] @ torch.eye(16)
    np.testing.assert_allclose(w.numpy(), np.asarray(params.W), rtol=1e-6)


def _write_reference_layout_store(root, layer, data):
    """metadata JSON (reference schema: no n_frames) + tight-header np.save."""
    n, T, d = data.shape
    md = {
        "tensor_shape": [T, d],
        "activation_shape": [T, d],
        "filenames": [f"/nowhere/f{i}.wav" for i in range(n)],
    }
    (root / f"{layer}_metadata.json").write_text(json.dumps(md))
    np.save(root / f"{layer}_tensors.npy", data.reshape(n, -1))


def test_foreign_store_reads_and_appends(tmp_path):
    rng = np.random.default_rng(0)
    layer = "encoder.blocks.1"
    data = rng.standard_normal((5, 10, 8)).astype(np.float32)
    _write_reference_layout_store(tmp_path, layer, data)

    loader = MemoryMappedActivationLoader(str(tmp_path), layer, batch_size=2)
    acts, names = loader.reader.batch(np.arange(2))
    assert acts.shape == (2, 10, 8)
    np.testing.assert_allclose(np.asarray(acts), data[:2], rtol=1e-6)

    # append through AppendableNpy: the tight np.save header (no headroom)
    # must be rebased, not crash with "header grew beyond reserved space"
    extra = rng.standard_normal((9995, 80)).astype(np.float32)
    with AppendableNpy(tmp_path / f"{layer}_tensors.npy", (80,), np.float32) as f:
        f.append(extra)

    final = np.load(tmp_path / f"{layer}_tensors.npy", mmap_mode="r")
    assert final.shape == (10000, 80)  # row count digits grew 1 → 5
    np.testing.assert_allclose(final[:5], data.reshape(5, -1), rtol=1e-6)
    np.testing.assert_allclose(final[5:], extra, rtol=1e-6)


def test_writer_output_is_standard_npy(tmp_path):
    """Our grown store must load with stock numpy (the reference reader)."""
    rng = np.random.default_rng(1)
    w = ActivationStoreWriter(tmp_path, "L", (6, 4), (6, 4))
    a = rng.standard_normal((3, 6, 4)).astype(np.float32)
    b = rng.standard_normal((2, 6, 4)).astype(np.float32)
    w.append_batch(["a0", "a1", "a2"], a, n_frames=[6] * 3)
    w.append_batch(["b0", "b1"], b, n_frames=[6] * 2)
    w.close()

    md = json.loads((tmp_path / "L_metadata.json").read_text())
    assert md["filenames"] == ["a0", "a1", "a2", "b0", "b1"]
    arr = np.load(tmp_path / "L_tensors.npy", mmap_mode="r")
    assert arr.shape == (5, 24)
    np.testing.assert_allclose(
        arr, np.concatenate([a, b]).reshape(5, -1), rtol=1e-6)


def test_own_trainer_checkpoint_uses_safe_loader(tmp_path, capsys):
    """This repo's trainer checkpoints carry numpy optimizer leaves and the
    numpy RNG state; the safe (weights_only) loader must cover them via the
    numpy-reconstructor allowlist — falling back to the legacy pickle loader
    (with its warning) would mean the arbitrary-code protection never applies
    to the main resume/bestval path."""
    from freud_tpu.models.sae.serialize import load_checkpoint_file

    p = tmp_path / "ckpt.pth"
    torch.save(
        {
            "model": {"w": torch.zeros(2, 2)},
            "optimizer": [np.zeros(4, np.float32), np.float64(1.5)],
            "numpy_rng": np.random.RandomState(0).get_state(),
            "hparams": {"autoencoder_variant": "topk", "n": 1},
        },
        p,
    )
    capsys.readouterr()
    out = load_checkpoint_file(str(p))
    captured = capsys.readouterr()
    assert "unsafe" not in captured.out, captured.out
    assert out["hparams"]["n"] == 1
    np.testing.assert_array_equal(out["optimizer"][0], np.zeros(4))
