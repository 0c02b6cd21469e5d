"""TensorBoard tag-layout parity (SURVEY §5.5).

The reference trainer's TB layout (src/scripts/train_sae.py:369,466-487,
525-585) is the monitoring contract a reference user's dashboards are built
on. This test runs a real ``train(**config)`` and reads the event file back
with TensorBoard's own EventAccumulator, asserting every reference scalar /
histogram / text tag is present under the same name.
"""

import json
import wave

import numpy as np
import pytest

from freud_tpu.scripts.collect_activations import get_activations
from freud_tpu.train.trainer import train


@pytest.fixture(scope="module")
def run_dir(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("tb")
    audio = tmp / "audio"
    audio.mkdir()
    rng = np.random.default_rng(0)
    for i in range(4):
        with wave.open(str(audio / f"c{i}.wav"), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes(
                (rng.standard_normal(8000) * 3000).astype(np.int16).tobytes()
            )
    acts = tmp / "acts"
    get_activations(
        data_path=str(audio), layer_name="encoder.blocks.1",
        whisper_model="test:tiny", sae_model=None, batch_size=2,
        out_folder=str(acts), verbose=False,
    )
    rd = tmp / "run"
    train(
        seed=0, train_folder=str(acts), val_folder=str(acts),
        run_dir=str(rd), lr=1e-4, weight_decay=0.0, steps=3,
        clip_thresh=1.0, batch_size=2, log_tb_every=1, save_every=2,
        val_every=2,
        whisper_config={"model": "test:tiny",
                        "layer_name": "encoder.blocks.1"},
        optimizer="radam", scheduler="cosine", scheduler_params={},
        autoencoder_variant="l1",
        autoencoder_config={"n_dict_components": 16, "recon_alpha": 1e4},
        enable_transcripts=False, verbose=False,
    )
    return rd


def test_reference_tb_tags_present(run_dir):
    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator,
    )

    acc = EventAccumulator(str(run_dir))
    acc.Reload()
    tags = acc.Tags()
    scalars = set(tags["scalars"])
    # reference train_sae.py's L1 scalar set, byte-identical tag names
    assert {
        "train/loss", "train/loss_recon", "train/loss_l1", "train/lr",
        "val/loss_recon", "val/loss_l1", "val/mse",
        "val/encoded/num_dead", "val/encoded/percent_dead",
    } <= scalars, scalars
    assert {"val/encoded/magnitude_maxes",
            "val/encoded/magnitude_stds"} <= set(tags["histograms"])
    # hparams text record (reference train_sae.py:369): stored as a tensor
    # event by torch's SummaryWriter — accept either surfacing
    text_like = set(tags.get("tensors", ())) | set(tags.get("text", ()))
    assert any(t.startswith("hparams") for t in text_like), text_like


def test_tb_scalar_steps_monotonic(run_dir):
    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator,
    )

    acc = EventAccumulator(str(run_dir))
    acc.Reload()
    steps = [e.step for e in acc.Scalars("train/loss")]
    assert steps == sorted(steps) and len(steps) >= 3
    assert all(np.isfinite(e.value) for e in acc.Scalars("train/loss"))


def test_topk_tb_tags_present(run_dir, tmp_path):
    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator,
    )

    acts = run_dir.parent / "acts"
    rd = tmp_path / "run_topk"
    train(
        seed=0, train_folder=str(acts), val_folder=str(acts),
        run_dir=str(rd), lr=1e-4, weight_decay=0.0, steps=3,
        clip_thresh=1.0, batch_size=2, log_tb_every=1, save_every=10,
        val_every=2,
        whisper_config={"model": "test:tiny",
                        "layer_name": "encoder.blocks.1"},
        optimizer="adam", scheduler="linear",
        scheduler_params={"num_warmup_steps": 2},
        autoencoder_variant="topk",
        autoencoder_config={"expansion_factor": 2, "k": 4,
                            "auxk_alpha": 0.03125,
                            "dead_feature_threshold": 1e6},
        enable_transcripts=False, verbose=False,
    )
    acc = EventAccumulator(str(rd))
    acc.Reload()
    scalars = set(acc.Tags()["scalars"])
    assert {
        "train/loss", "train/fvu", "train/auxk_loss",
        "train/multi_topk_fvu", "train/dead_pct", "train/lr",
        "val/fvu", "val/auxk_loss", "val/multi_topk_fvu", "val/mse",
    } <= scalars, scalars
