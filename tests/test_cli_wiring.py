"""CLI wiring: every script's ``main(argv)`` drives its library path.

The library functions behind each script are covered elsewhere; these tests
pin the argparse → config-JSON → call glue itself (the reference user's
actual entry points, docs/MIGRATION.md's command table): a renamed config
key, flag, or output path breaks here even when the library tests stay
green. The collect → train → index chain runs end-to-end on a tmp dataset.
"""

import json
import wave

import numpy as np
import pytest


def _write_wavs(folder, n, seconds=0.3, seed=0):
    rng = np.random.default_rng(seed)
    folder.mkdir(parents=True, exist_ok=True)
    for i in range(n):
        audio = (rng.standard_normal(int(16000 * seconds)) * 0.1).astype(
            np.float32
        )
        with wave.open(str(folder / f"clip{i}.wav"), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes((audio * 32767).astype(np.int16).tobytes())


def test_collect_train_index_chain(tmp_path):
    from freud_tpu.scripts import collect_activations, index_activations, train_sae

    audio = tmp_path / "audio"
    _write_wavs(audio, 4)
    acts = tmp_path / "acts"
    layer = "encoder.blocks.1"

    # -- collect (reference feature-config schema incl. ignored keys) -------
    feat_cfg = tmp_path / "feat.json"
    feat_cfg.write_text(json.dumps({
        "whisper_model": "test:tiny",
        "sae_model": None,
        "layer_name": layer,
        "batch_size": 2,
        "data_path": str(audio),
        "device": "tpu",
        "out_folder": str(acts),
        "dl_max_workers": 0,
        "collect_max": None,
    }))
    collect_activations.main(["--config", str(feat_cfg)])
    meta = json.loads((acts / f"{layer}_metadata.json").read_text())
    assert len(meta["filenames"]) == 4
    tensors = np.load(acts / f"{layer}_tensors.npy", mmap_mode="r")
    assert tensors.shape[0] == 4

    # -- train (reference train-config schema, train(**config) splat) -------
    run_dir = tmp_path / "run"
    train_cfg = tmp_path / "train.json"
    train_cfg.write_text(json.dumps({
        "whisper_config": {"model": "test:tiny", "layer_name": layer},
        "autoencoder_variant": "l1",
        "autoencoder_config": {"n_dict_components": 16,
                               "recon_alpha": 10000.0},
        "seed": 0,
        "device": "tpu",
        "weight_decay": 0.0,
        "clip_thresh": 1.0,
        "dl_max_workers": 0,
        "log_tb_every": 1,
        "save_every": 2,
        "val_every": 2,
        "start_checkpoint": None,
        "from_disk": True,
        "train_folder": str(acts),
        "val_folder": str(acts),
        "run_dir": str(run_dir),
        "lr": 1e-4,
        "steps": 3,
        "batch_size": 2,
        "optimizer": "radam",
        "scheduler": "cosine",
        "scheduler_params": {},
        "enable_transcripts": False,
        "verbose": False,
    }))
    train_sae.main(["--config", str(train_cfg)])
    ckpts = sorted((run_dir / "checkpoints").glob("*.pth"))
    assert ckpts, "train CLI should write at least one checkpoint"
    import torch

    state = torch.load(ckpts[-1], map_location="cpu")
    assert "model" in state and "hparams" in state

    # -- index (feature-major search index over the collected store) --------
    index_activations.main(["--config", str(feat_cfg)])
    idx_files = list(acts.glob("*feature_major*")) + list(acts.glob("*index*"))
    assert idx_files, "index CLI should write an index artifact"


def test_merge_stores_cli(tmp_path):
    from freud_tpu.data.store import ActivationStoreReader, ActivationStoreWriter
    from freud_tpu.scripts import merge_stores

    rng = np.random.default_rng(0)
    n, p = 6, 2
    names = [f"f{i}.wav" for i in range(n)]
    data = rng.standard_normal((n, 5, 4)).astype(np.float32)
    for i in range(p):
        w = ActivationStoreWriter(tmp_path / f"shard{i}", "L",
                                  data.shape[1:], data.shape[1:])
        w.append_batch(names[i::p], data[i::p],
                       n_frames=np.full(len(names[i::p]), 5))
        w.close()
    merge_stores.main(["--out_folder", str(tmp_path), "--layer_name", "L"])
    reader = ActivationStoreReader(tmp_path, "L")
    assert reader.filenames == names


def test_plot_polysemantic_cli(tmp_path):
    from freud_tpu.scripts import plot_polysemantic

    out = tmp_path / "plots"
    plot_polysemantic.main(["--out", str(out)])
    assert list(out.glob("*.png")), "plot CLI should write png plots"


def test_download_rejects_unknown_dataset(tmp_path):
    from freud_tpu.scripts import download_audio_datasets

    with pytest.raises((ValueError, SystemExit)):
        download_audio_datasets.main(
            ["--output_dir", str(tmp_path), "--dataset", "nope"]
        )
