"""Multi-layer collection + concurrent SAE sweep tests."""

import wave

import numpy as np

from freud_tpu.data.multilayer import collect_multilayer
from freud_tpu.data.store import ActivationStoreReader, ActivationStoreWriter
from freud_tpu.train.sweep import SAESweepTrainer, train_sweep


def _write_wavs(folder, n, seconds=0.3, seed=0):
    rng = np.random.default_rng(seed)
    folder.mkdir(exist_ok=True)
    for i in range(n):
        audio = (rng.standard_normal(int(16000 * seconds)) * 0.1).astype(np.float32)
        with wave.open(str(folder / f"c{i}.wav"), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes((audio * 32767).astype(np.int16).tobytes())


def test_multilayer_collection(tmp_path):
    audio = tmp_path / "audio"
    _write_wavs(audio, 3)
    layers = ["encoder.blocks.0", "encoder.blocks.1", "encoder.blocks.1.mlp.1"]
    out = tmp_path / "acts"
    stats = collect_multilayer(
        str(audio), layers, "test:tiny", batch_size=2, out_folder=str(out),
        verbose=False,
    )
    assert stats["n_files"] == 3
    for layer in layers:
        r = ActivationStoreReader(out, layer)
        assert len(r) == 3
        width = 4 * 384 if layer.endswith("mlp.1") else 384
        assert r.tensor_shape == (1500, width)
    # single-pass capture equals single-layer capture
    from freud_tpu.data.loaders import FlyActivationLoader

    single = FlyActivationLoader(str(audio), "test:tiny", None,
                                 "encoder.blocks.1", batch_size=3)
    acts, names = next(iter(single))
    r = ActivationStoreReader(out, "encoder.blocks.1")
    arr, name0 = r[0]
    idx = names.index(name0)
    np.testing.assert_allclose(arr, np.asarray(acts)[idx], atol=2e-5, rtol=1e-4)


def test_sweep_trainer_matches_independent_training(tmp_path):
    """Each sweep member must evolve exactly like a solo trainer with its seed."""
    from freud_tpu.train.trainer import SAETrainer

    rng = np.random.default_rng(0)
    cfg = {"n_dict_components": 12, "recon_alpha": 10.0}
    data = rng.standard_normal((3, 4, 6, 8)).astype(np.float32)  # (K,B,T,d)

    sweep = SAESweepTrainer("l1", cfg, 8, 3, optimizer="adam",
                            scheduler="linear",
                            scheduler_params={"num_warmup_steps": 1},
                            lr=1e-3, steps=5, amp=False)
    for _ in range(3):
        m = sweep.train_step(data)
    assert np.asarray(m["loss"]).shape == (3,)

    solo = SAETrainer("l1", cfg, 8, optimizer="adam", scheduler="linear",
                      scheduler_params={"num_warmup_steps": 1}, lr=1e-3,
                      steps=5, seed=1, amp=False)
    for _ in range(3):
        solo_m = solo.train_step(data[1])
    member_W = np.asarray(sweep.params.W[1])
    np.testing.assert_allclose(member_W, np.asarray(solo.params.W),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(np.asarray(m["loss"])[1]),
                               float(solo_m["loss"]), rtol=1e-5)


def test_hparam_sweep_l1_matches_independent_trainers():
    """One vmapped step, three models with DISTINCT lr / recon_alpha over
    the same batches — each must track a solo SAETrainer built with those
    exact hyperparameters (VERDICT r3 item 6)."""
    from freud_tpu.train.trainer import SAETrainer

    rng = np.random.default_rng(3)
    cfg = {"n_dict_components": 12, "recon_alpha": 10.0}
    hps = [{"lr": 1e-3}, {"lr": 3e-3, "recon_alpha": 25.0},
           {"recon_alpha": 2.0}]
    batches = [rng.standard_normal((4, 6, 8)).astype(np.float32)
               for _ in range(3)]

    sweep = SAESweepTrainer("l1", cfg, 8, 3, optimizer="radam",
                            scheduler="cosine", lr=1e-3, steps=5, amp=False,
                            model_hparams=hps)
    for x in batches:
        # the grid path: ONE batch feeds all K models (in_axes=None)
        m = sweep.train_step_shared(x)

    for i, hp in enumerate(hps):
        solo = SAETrainer(
            "l1", {**cfg, "recon_alpha": hp.get("recon_alpha", 10.0)}, 8,
            optimizer="radam", scheduler="cosine",
            lr=hp.get("lr", 1e-3), steps=5, seed=i, amp=False)
        for x in batches:
            solo_m = solo.train_step(x)
        np.testing.assert_allclose(
            np.asarray(sweep.params.W[i]), np.asarray(solo.params.W),
            rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(
            float(np.asarray(m["loss"])[i]), float(solo_m["loss"]),
            rtol=1e-5)


def test_hparam_sweep_topk_matches_independent_trainers():
    """TopK grid members (distinct lr / auxk_alpha, shared k) track solo
    trainers — dead-feature counters live so AuxK fires."""
    from freud_tpu.train.trainer import SAETrainer

    rng = np.random.default_rng(4)
    cfg = {"n_dict_components": 16, "k": 3, "auxk_alpha": 1 / 32,
           "dead_feature_threshold": 0.0}
    hps = [{"lr": 1e-3}, {"lr": 2e-3, "auxk_alpha": 0.25},
           {"auxk_alpha": 0.0}]
    batches = [rng.standard_normal((2, 5, 8)).astype(np.float32)
               for _ in range(3)]

    sweep = SAESweepTrainer("topk", cfg, 8, 3, optimizer="adam",
                            scheduler="linear",
                            scheduler_params={"num_warmup_steps": 1},
                            lr=1e-3, steps=5, amp=False, model_hparams=hps)
    for x in batches:
        m = sweep.train_step(np.broadcast_to(x, (3, *x.shape)))

    for i, hp in enumerate(hps):
        solo = SAETrainer(
            "topk", {**cfg, "auxk_alpha": hp.get("auxk_alpha", 1 / 32)}, 8,
            optimizer="adam", scheduler="linear",
            scheduler_params={"num_warmup_steps": 1},
            lr=hp.get("lr", 1e-3), steps=5, seed=i, amp=False)
        for x in batches:
            solo_m = solo.train_step(x)
        np.testing.assert_allclose(
            np.asarray(sweep.params.encoder_weight[i]),
            np.asarray(solo.params.encoder_weight),
            rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(
            float(np.asarray(m["loss"])[i]), float(solo_m["loss"]),
            rtol=1e-5)


def test_hparam_sweep_rejects_bad_keys_and_mixed_k():
    import pytest

    with pytest.raises(ValueError, match="unsupported"):
        SAESweepTrainer("l1", {"n_dict_components": 4}, 8, 1,
                        model_hparams=[{"k": 2}])
    with pytest.raises(ValueError, match="share k"):
        SAESweepTrainer("topk", {"n_dict_components": 8, "k": 2}, 8, 2,
                        model_hparams=[{"k": 2}, {"k": 4}])


def test_train_hparam_sweep_grid_end_to_end(tmp_path):
    """The grid CLI path: lr × k grid over one store → one checkpoint per
    combination, k-groups compiled separately, stored configs carry each
    model's own values."""
    from freud_tpu.train.sweep import expand_grid, train_hparam_sweep

    assert expand_grid({"lr": [1, 2], "k": [3]}) == [
        {"k": 3, "lr": 1}, {"k": 3, "lr": 2}]

    rng = np.random.default_rng(5)
    layer = "encoder.blocks.0"
    w = ActivationStoreWriter(tmp_path, layer, (6, 8), (6, 8))
    w.append_batch([f"f{i}" for i in range(12)],
                   rng.standard_normal((12, 6, 8)).astype(np.float32))
    w.close()
    stats = train_hparam_sweep(
        str(tmp_path), layer, "topk",
        {"expansion_factor": 2, "dead_feature_threshold": 100.0},
        grid={"lr": [1e-3, 2e-3], "k": [2, 4]},
        steps=3, batch_size=4, out_dir=str(tmp_path / "grid"),
        scheduler_params={"num_warmup_steps": 1}, verbose=False,
    )
    assert stats["steps"] == 3 and len(stats["models"]) == 4
    from freud_tpu.models.sae import sae_from_checkpoint

    for m in stats["models"]:
        v, cfg, act, params = sae_from_checkpoint(
            str(tmp_path / "grid" / f"{m['tag']}.pth"))
        assert v == "topk" and act == 8
        assert cfg.k == m["k"]  # the model's OWN grid value
        # machine-consumable even under verbose=False
        assert np.isfinite(m["final_loss"])


def test_sweep_fused_chunk_matches_per_step(tmp_path):
    """train_chunk_shared (cache sampling + K steps scanned in one program)
    lands on the same parameters as per-step next_batch + train_step_shared
    over the identical cache stream."""
    import jax
    from freud_tpu.data.device_cache import DeviceShuffleCache

    rng = np.random.default_rng(4)
    layer = "encoder.blocks.0"
    w = ActivationStoreWriter(tmp_path, layer, (6, 8), (6, 8))
    w.append_batch([f"f{i}" for i in range(12)],
                   rng.standard_normal((12, 6, 8)).astype(np.float32))
    w.close()
    hps = [{"lr": 1e-3}, {"lr": 2e-3, "recon_alpha": 25.0}]

    def run(chunked):
        sweep = SAESweepTrainer(
            "l1", {"n_dict_components": 12, "recon_alpha": 10.0}, 8, 2,
            optimizer="adam", scheduler="linear",
            scheduler_params={"num_warmup_steps": 1}, lr=1e-3, steps=12,
            amp=False, model_hparams=hps)
        cache = DeviceShuffleCache(str(tmp_path), layer, capacity_files=12,
                                   refresh_files=0, seed=9)
        try:
            if chunked:
                for _ in range(2):
                    m, key = sweep.train_chunk_shared(
                        cache.sample_state(), 4, 3)
                    cache.set_key(key)
            else:
                for _ in range(6):
                    m = sweep.train_step_shared(
                        np.asarray(cache.next_batch(4)))
            assert sweep.step == 6
            return jax.device_get(sweep.params), np.asarray(cache._key)
        finally:
            cache.close()

    params_a, key_a = run(chunked=False)
    params_b, key_b = run(chunked=True)
    np.testing.assert_array_equal(key_a, key_b)
    for pa, pb in zip(jax.tree_util.tree_leaves(params_a),
                      jax.tree_util.tree_leaves(params_b)):
        np.testing.assert_allclose(pa, pb, rtol=2e-5, atol=2e-6)


def test_train_hparam_sweep_cached_end_to_end(tmp_path):
    """The grid driver's device-cache path: fused chunks + per-step tail,
    every k-group fed the identical snapshotted stream."""
    from freud_tpu.train.sweep import train_hparam_sweep

    rng = np.random.default_rng(6)
    layer = "encoder.blocks.0"
    w = ActivationStoreWriter(tmp_path, layer, (6, 8), (6, 8))
    w.append_batch([f"f{i}" for i in range(12)],
                   rng.standard_normal((12, 6, 8)).astype(np.float32))
    w.close()
    stats = train_hparam_sweep(
        str(tmp_path), layer, "topk",
        {"expansion_factor": 2, "dead_feature_threshold": 100.0},
        grid={"lr": [1e-3, 2e-3], "k": [2, 4]},
        steps=5, batch_size=4, out_dir=str(tmp_path / "grid"),
        scheduler_params={"num_warmup_steps": 1}, verbose=False,
        device_cache_files=12, fused_steps=2,
    )
    # 2 chunks of 2 + a per-step tail of 1
    assert stats["steps"] == 5 and len(stats["models"]) == 4
    assert all(np.isfinite(m["final_loss"]) for m in stats["models"])


def test_train_sweep_end_to_end(tmp_path):
    rng = np.random.default_rng(1)
    layers = ["encoder.blocks.0", "encoder.blocks.1"]
    for layer in layers:
        w = ActivationStoreWriter(tmp_path, layer, (6, 8), (6, 8))
        w.append_batch([f"{layer}-f{i}" for i in range(12)],
                       rng.standard_normal((12, 6, 8)).astype(np.float32))
        w.close()
    stats = train_sweep(
        str(tmp_path), layers, "topk",
        {"expansion_factor": 2, "k": 2, "dead_feature_threshold": 100.0},
        steps=4, batch_size=4, out_dir=str(tmp_path / "sweep"),
        scheduler_params={"num_warmup_steps": 1}, verbose=False,
    )
    assert stats["steps"] == 4
    from freud_tpu.models.sae import sae_from_checkpoint

    for layer in layers:
        v, cfg, act, params = sae_from_checkpoint(
            str(tmp_path / "sweep" / f"{layer}.pth")
        )
        assert v == "topk" and act == 8
        assert params.encoder_weight.shape == (16, 8)


def test_multilayer_collection_data_parallel(tmp_path):
    """Mesh-sharded multilayer collection equals the single-device stores."""
    import jax
    import pytest

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")

    audio = tmp_path / "audio"
    _write_wavs(audio, 10)
    layers = ["encoder.blocks.0", "encoder.blocks.1"]
    a = collect_multilayer(
        str(audio), layers, "test:tiny", batch_size=8,
        out_folder=str(tmp_path / "acts_a"), verbose=False,
    )
    b = collect_multilayer(
        str(audio), layers, "test:tiny", batch_size=8,
        out_folder=str(tmp_path / "acts_b"), verbose=False,
        data_parallel=True,
    )
    assert a["n_files"] == b["n_files"] == 10
    for layer in layers:
        ra = ActivationStoreReader(tmp_path / "acts_a", layer)
        rb = ActivationStoreReader(tmp_path / "acts_b", layer)
        for i in range(10):
            xa, fa = ra[i]
            xb, fb = rb[i]
            assert fa == fb
            np.testing.assert_allclose(np.asarray(xa), np.asarray(xb),
                                       rtol=2e-5, atol=2e-5)


def test_sweep_cli_wiring(tmp_path):
    """The sweep CLI (scripts/sweep.py) drives train_sweep end-to-end and
    writes one reference-format checkpoint per layer."""
    import json

    from freud_tpu.scripts import sweep as sweep_cli

    audio = tmp_path / "audio"
    _write_wavs(audio, 4)
    layers = ["encoder.blocks.0", "encoder.blocks.1"]
    acts = tmp_path / "acts"
    collect_multilayer(str(audio), layers, "test:tiny", batch_size=2,
                       out_folder=str(acts), verbose=False)
    cfg = tmp_path / "sweep.json"
    cfg.write_text(json.dumps({
        "data_path": str(acts),
        "layer_names": layers,
        "variant": "l1",
        "autoencoder_config": {"n_dict_components": 16,
                               "recon_alpha": 100.0},
        "steps": 2,
        "batch_size": 2,
        "out_dir": str(tmp_path / "out"),
        "verbose": False,
    }))
    sweep_cli.main(["--config", str(cfg)])
    import torch

    for layer in layers:
        ckpts = list((tmp_path / "out").glob(f"*{layer}*.pth"))
        assert ckpts, f"no checkpoint written for {layer}"
        state = torch.load(ckpts[0], map_location="cpu")
        assert "model" in state and "hparams" in state
