"""Trainer tests: optimizer/schedule parity vs torch, end-to-end training, resume."""

from pathlib import Path

import numpy as np
import pytest

from freud_tpu.train.optim import make_optimizer, make_schedule


def test_cosine_schedule_matches_torch():
    import torch

    lr, steps = 4e-4, 100
    sched = make_schedule("cosine", lr, steps, {})
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=lr)
    tsched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=steps, eta_min=0)
    for t in range(steps):
        assert abs(float(sched(t)) - tsched.get_last_lr()[0]) < 1e-9
        opt.step()
        tsched.step()


def test_linear_schedule_warmup():
    sched = make_schedule("linear", 1e-3, 100, {"num_warmup_steps": 10})
    assert float(sched(0)) == 0.0
    assert abs(float(sched(5)) - 5e-4) < 1e-9
    assert abs(float(sched(10)) - 1e-3) < 1e-9
    assert abs(float(sched(55)) - 1e-3 * 45 / 90) < 1e-9
    assert float(sched(100)) == 0.0


@pytest.mark.parametrize("name,make_torch", [
    ("radam", lambda params, lr: __import__("torch").optim.RAdam(params, lr=lr, eps=1e-5)),
    ("adam", lambda params, lr: __import__("torch").optim.Adam(params, lr=lr)),
])
def test_optimizer_matches_torch(name, make_torch):
    """Run 8 steps of both stacks on identical quadratic grads."""
    import jax.numpy as jnp
    import optax
    import torch

    lr, steps = 1e-2, 8
    rng = np.random.default_rng(0)
    w0 = rng.standard_normal(6).astype(np.float32)
    target = rng.standard_normal(6).astype(np.float32)

    tx, _ = make_optimizer(name, "cosine", lr, steps, clip_thresh=1.0)
    w = jnp.asarray(w0)
    state = tx.init(w)

    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    topt = make_torch([tw], lr)
    tsched = torch.optim.lr_scheduler.CosineAnnealingLR(topt, T_max=steps, eta_min=0)

    for _ in range(steps):
        grad = 2 * (w - jnp.asarray(target))
        updates, state = tx.update(grad, state, w)
        w = optax.apply_updates(w, updates)

        topt.zero_grad()
        loss = ((tw - torch.from_numpy(target)) ** 2).sum()
        loss.backward()
        torch.nn.utils.clip_grad_norm_([tw], 1.0)
        topt.step()
        tsched.step()

    np.testing.assert_allclose(np.asarray(w), tw.detach().numpy(), rtol=2e-4, atol=2e-5)


# ------------------------------------------------------------ end-to-end


def _make_store(tmp_path, n_files=24, T=16, d=8, layer="encoder.blocks.1"):
    from freud_tpu.data.store import ActivationStoreWriter

    rng = np.random.default_rng(0)
    # activations with low-rank structure an SAE can learn
    basis = rng.standard_normal((3, d)).astype(np.float32)
    codes = rng.standard_normal((n_files, T, 3)).astype(np.float32)
    data = codes @ basis
    w = ActivationStoreWriter(tmp_path, layer, (T, d), (T, d))
    w.append_batch([f"f{i}.wav" for i in range(n_files)], data,
                   n_frames=[T] * n_files)
    w.close()
    return data


@pytest.mark.parametrize("variant,ae_cfg", [
    ("l1", {"n_dict_components": 16, "recon_alpha": 100.0}),
    ("topk", {"expansion_factor": 4, "k": 3, "auxk_alpha": 0.03125,
              "dead_feature_threshold": 1000.0}),
])
def test_train_end_to_end(tmp_path, variant, ae_cfg):
    from freud_tpu.models.sae import sae_from_checkpoint
    from freud_tpu.train.trainer import train

    store_dir = tmp_path / "acts"
    store_dir.mkdir()
    _make_store(store_dir)
    run_dir = tmp_path / "run"

    stats = train(
        seed=0,
        train_folder=str(store_dir),
        val_folder=str(store_dir),
        run_dir=str(run_dir),
        lr=1e-3,
        weight_decay=0.0,
        steps=6,
        clip_thresh=1.0,
        batch_size=8,
        log_tb_every=2,
        save_every=3,
        val_every=4,
        whisper_config={"model": "test:tiny", "layer_name": "encoder.blocks.1"},
        optimizer="radam" if variant == "l1" else "adam",
        scheduler="cosine" if variant == "l1" else "linear",
        scheduler_params={} if variant == "l1" else {"num_warmup_steps": 2},
        autoencoder_variant=variant,
        autoencoder_config=ae_cfg,
        from_disk=True,
        enable_transcripts=False,
        verbose=False,
    )
    assert stats["steps"] == 6
    ckpts = sorted(p.name for p in (run_dir / "checkpoints").glob("*.pth"))
    assert "step3.pth" in ckpts and "step6.pth" in ckpts and "bestval.pth" in ckpts

    v, cfg, act_size, params = sae_from_checkpoint(str(run_dir / "checkpoints/step6.pth"))
    assert v == variant and act_size == 8

    import torch

    ckpt = torch.load(run_dir / "checkpoints/step6.pth", map_location="cpu",
                      weights_only=False)
    assert ckpt["step"] == 6
    assert ckpt["hparams"]["whisper_config"]["layer_name"] == "encoder.blocks.1"
    # TensorBoard event file written
    assert list(Path(run_dir).glob("events.out.tfevents.*"))


def test_train_loss_decreases(tmp_path):
    from freud_tpu.train.trainer import SAETrainer

    rng = np.random.default_rng(1)
    basis = rng.standard_normal((3, 8)).astype(np.float32)
    trainer = SAETrainer(
        "l1", {"n_dict_components": 16, "recon_alpha": 10.0}, 8,
        optimizer="adam", scheduler="linear",
        scheduler_params={"num_warmup_steps": 5}, lr=3e-3, steps=60,
    )
    recons = []
    for _ in range(60):
        codes = rng.standard_normal((16, 12, 3)).astype(np.float32)
        m = trainer.train_step(codes @ basis)
        recons.append(float(m["loss_recon"]))
    assert np.mean(recons[-10:]) < 0.7 * np.mean(recons[:10])


def test_resume_roundtrip(tmp_path):
    from freud_tpu.train.trainer import SAETrainer

    rng = np.random.default_rng(2)
    data = [rng.standard_normal((4, 6, 8)).astype(np.float32) for _ in range(6)]
    cfg = {"expansion_factor": 2, "k": 2, "dead_feature_threshold": 10.0,
           "auxk_alpha": 0.1}

    a = SAETrainer("topk", cfg, 8, optimizer="adam", scheduler="linear",
                   scheduler_params={"num_warmup_steps": 2}, lr=1e-3, steps=10)
    for b in data[:3]:
        a.train_step(b)
    path = str(tmp_path / "ck.pth")
    a.save(path, a.hparams())
    for b in data[3:]:
        a.train_step(b)

    b_tr = SAETrainer("topk", cfg, 8, optimizer="adam", scheduler="linear",
                      scheduler_params={"num_warmup_steps": 2}, lr=1e-3, steps=10)
    b_tr.load(path)
    assert b_tr.step == 3
    for b in data[3:]:
        b_tr.train_step(b)
    # identical continuation
    for pa, pb in zip(a.params, b_tr.params):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb), rtol=1e-5, atol=1e-6)


def test_resume_restores_data_order(tmp_path):
    """An interrupted+resumed train() consumes the identical batch sequence
    as an uninterrupted run (the reference gets this by restoring pickled
    RNG states on load, train_sae.py:265-294): final params must match."""
    from freud_tpu.models.sae import sae_from_checkpoint
    from freud_tpu.train.trainer import train

    store_dir = tmp_path / "acts"
    store_dir.mkdir()
    _make_store(store_dir)

    kwargs = dict(
        seed=0, train_folder=str(store_dir), val_folder=str(store_dir),
        lr=1e-3, weight_decay=0.0, clip_thresh=1.0, batch_size=8,
        log_tb_every=100, save_every=2, val_every=100,
        whisper_config={"model": "test:tiny", "layer_name": "encoder.blocks.1"},
        optimizer="adam", scheduler="linear",
        scheduler_params={"num_warmup_steps": 2},
        autoencoder_variant="l1",
        autoencoder_config={"n_dict_components": 16, "recon_alpha": 100.0},
        from_disk=True, enable_transcripts=False, verbose=False,
    )
    # uninterrupted: 5 steps (epoch is 3 batches → resume lands mid-epoch)
    run_a = tmp_path / "run_a"
    train(run_dir=str(run_a), steps=5, **kwargs)
    # interrupted at 2, resumed to 5
    run_b = tmp_path / "run_b"
    train(run_dir=str(run_b), steps=2, **kwargs)
    train(run_dir=str(run_b), steps=5,
          start_checkpoint=str(run_b / "checkpoints" / "step2.pth"), **kwargs)

    _, _, _, pa = sae_from_checkpoint(str(run_a / "checkpoints" / "step5.pth"))
    _, _, _, pb = sae_from_checkpoint(str(run_b / "checkpoints" / "step5.pth"))
    for a, b in zip(pa, pb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_loader_set_position_matches_stream(tmp_path):
    from freud_tpu.data.loaders import MemoryMappedActivationLoader

    store_dir = tmp_path / "acts"
    store_dir.mkdir()
    _make_store(store_dir, n_files=10)

    def batches(loader, n):
        got = []
        while len(got) < n:
            for b in loader:
                got.append(np.asarray(b[0]))
                if len(got) >= n:
                    break
        return got

    mk = lambda: MemoryMappedActivationLoader(
        str(store_dir), "encoder.blocks.1", batch_size=3,
        shuffle=True, drop_last=True, seed=7)
    full = batches(mk(), 8)  # 3 batches/epoch → crosses epochs, lands mid-epoch
    resumed = mk()
    resumed.set_position(5)
    tail = batches(resumed, 3)
    for x, y in zip(full[5:], tail):
        np.testing.assert_array_equal(x, y)


def test_topk_dp_mesh_step_matches_single_device():
    """On a >1-chip data mesh the TopK step uses the shardable XLA branch
    (the fused kernel is single-chip; see models/sae/topk.training_losses);
    both formulations select identical latent sets, so a few steps stay
    within bf16-matmul tolerance of the single-device kernel path."""
    import jax
    import pytest

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from freud_tpu.parallel.mesh import make_mesh
    from freud_tpu.train.trainer import SAETrainer

    cfg = {"expansion_factor": 4, "k": 3, "auxk_alpha": 0.25,
           "dead_feature_threshold": 50.0}
    kw = dict(optimizer="adam", scheduler="linear",
              scheduler_params={"num_warmup_steps": 2}, lr=1e-3, steps=10)
    t_dp = SAETrainer("topk", cfg, 16, mesh=make_mesh(), **kw)
    t_1 = SAETrainer("topk", cfg, 16, mesh=make_mesh(n_devices=1), **kw)

    rng = np.random.default_rng(0)
    for _ in range(3):
        batch = rng.standard_normal((16, 6, 16)).astype(np.float32)
        m_dp = t_dp.train_step(batch)
        m_1 = t_1.train_step(batch)
    assert abs(float(m_dp["loss"]) - float(m_1["loss"])) < 2e-2 * max(
        1.0, abs(float(m_1["loss"])))
    for a, b in zip(t_dp.params, t_1.params):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-2, atol=3e-3)


def test_train_fly_mode_end_to_end(tmp_path):
    """``from_disk: false`` — the reference README's documented no-collection
    workflow (train straight from audio through decode→mel→capture): one
    short L1 run over tmp WAVs must step, validate through the fly val
    loader, and write reference-format checkpoints."""
    import wave

    from freud_tpu.models.sae.serialize import sae_from_checkpoint
    from freud_tpu.train.trainer import train

    audio_dir = tmp_path / "audio"
    audio_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(4):
        with wave.open(str(audio_dir / f"clip{i}.wav"), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes(
                (rng.standard_normal(8000) * 2000).astype(np.int16).tobytes()
            )
    run_dir = tmp_path / "run"

    stats = train(
        seed=0,
        train_folder=str(audio_dir),
        val_folder=str(audio_dir),
        run_dir=str(run_dir),
        lr=1e-3,
        weight_decay=0.0,
        steps=2,
        clip_thresh=1.0,
        batch_size=2,
        log_tb_every=1,
        save_every=2,
        val_every=2,
        whisper_config={"model": "test:tiny", "layer_name": "encoder.blocks.1"},
        optimizer="radam",
        scheduler="cosine",
        scheduler_params={},
        autoencoder_variant="l1",
        autoencoder_config={"n_dict_components": 16, "recon_alpha": 100.0},
        from_disk=False,
        enable_transcripts=False,
        verbose=False,
    )
    assert stats["steps"] == 2
    ckpts = sorted(p.name for p in (run_dir / "checkpoints").glob("*.pth"))
    assert "step2.pth" in ckpts and "bestval.pth" in ckpts
    v, cfg, act_size, params = sae_from_checkpoint(
        str(run_dir / "checkpoints/step2.pth")
    )
    # fly activations carry whisper-tiny's encoder width
    assert v == "l1" and act_size == 384


def test_validate_transcripts_and_selective_fetch(tmp_path):
    """validate() with a transcriber: substituted (and base) transcripts for
    the first files, fed by the per-file sae_out reconstructions — which are
    only FETCHED while transcript slots remain (the transfer fix) — and the
    loss stats must be identical with and without the transcriber."""
    import wave

    from freud_tpu.train.trainer import SAETrainer, validate

    rng = np.random.default_rng(0)
    audio_dir = tmp_path / "audio"
    audio_dir.mkdir()
    names = []
    for i in range(4):
        p = audio_dir / f"clip{i}.wav"
        with wave.open(str(p), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes((rng.standard_normal(8000) * 2000)
                          .astype(np.int16).tobytes())
        names.append(str(p))

    from freud_tpu.data.store import ActivationStoreWriter

    T, d = 16, 8
    acts = rng.standard_normal((4, T, d)).astype(np.float32)
    store = tmp_path / "acts"
    w = ActivationStoreWriter(store, "encoder.blocks.1", (T, d), (T, d))
    w.append_batch(names, acts, n_frames=[T] * 4)
    w.close()

    tr = SAETrainer("l1", {"n_dict_components": 16, "recon_alpha": 100.0}, d,
                    optimizer="radam", scheduler="cosine", lr=1e-3, steps=10,
                    clip_thresh=1.0)

    calls = []

    def transcriber(mels, substitute_values=None):
        calls.append(substitute_values is not None)
        mels = np.asarray(mels)
        assert mels.ndim == 3  # batched contract: (B, n_mels, T)
        if substitute_values is not None:
            assert np.asarray(substitute_values).shape == (
                mels.shape[0], T, d)
        return ["text"] * mels.shape[0]

    plain = validate(tr, str(store), "encoder.blocks.1", "test:tiny",
                     True, False)
    with_t = validate(tr, str(store), "encoder.blocks.1", "test:tiny",
                      True, True, transcriber=transcriber)
    assert with_t[1], "no substituted transcripts produced"
    assert with_t[2] and with_t[3], "base transcripts/filenames missing"
    assert any(calls) and not all(calls)  # both subbed and base calls ran
    for a, b in zip(plain[0].values(), with_t[0].values()):
        if a is not None:
            np.testing.assert_allclose(a, b, rtol=1e-6)


def test_validate_transcript_head_transport(tmp_path):
    """Transcript substitute values ride the bf16 device-side head slice
    (``sae_out_head``, first N_TRANSCRIPTS rows) instead of a full f32
    sae_out fetch — at large_v1 val shapes 61 MB → 15 MB per validation on
    the host link. The values handed to the transcriber must be exactly
    the bf16 rounding of the full-precision reconstruction."""
    import wave

    import jax
    import ml_dtypes

    from freud_tpu.data.loaders import init_dataloader
    from freud_tpu.data.store import ActivationStoreWriter
    from freud_tpu.train.trainer import DeviceValSet, SAETrainer, validate

    rng = np.random.default_rng(7)
    T, d = 16, 8
    names = []
    for i in range(4):
        p = tmp_path / f"clip{i}.wav"
        with wave.open(str(p), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes((rng.standard_normal(4000) * 2000)
                          .astype(np.int16).tobytes())
        names.append(str(p))
    acts = rng.standard_normal((4, T, d)).astype(np.float32)
    store = tmp_path / "acts"
    w = ActivationStoreWriter(store, "L", (T, d), (T, d))
    w.append_batch(names, acts, n_frames=[T] * 4)
    w.close()

    tr = SAETrainer("l1", {"n_dict_components": 16, "recon_alpha": 100.0}, d,
                    optimizer="radam", scheduler="cosine", lr=1e-3, steps=10,
                    clip_thresh=1.0)
    captured = {}

    def transcriber(mels, substitute_values=None):
        if substitute_values is not None:
            captured["subs"] = np.asarray(substitute_values)
        return ["t"] * np.asarray(mels).shape[0]

    loader, _, _ = init_dataloader(True, str(store), "test:tiny", None, "L",
                                   batch_size=4, shuffle=False)
    vs = DeviceValSet(loader, val_batch=4)
    assert vs.ok
    out = validate(tr, str(store), "L", "test:tiny", True, False,
                   val_batch=4, device_set=vs, transcriber=transcriber)
    assert len(out[1]) == 4
    full = np.asarray(
        jax.device_get(tr.validate_files(acts)["sae_out"]))[:4]
    want = full.astype(ml_dtypes.bfloat16).astype(np.float32)
    np.testing.assert_array_equal(captured["subs"], want)


def test_device_val_set_matches_loader_validation(tmp_path):
    """DeviceValSet validation (resident arrays, zero per-call H2D) must be
    bit-identical to streaming the loader, including ragged tails; an
    over-budget set reports ok=False and callers fall back."""
    from freud_tpu.data.loaders import init_dataloader
    from freud_tpu.data.store import ActivationStoreWriter
    from freud_tpu.train.trainer import DeviceValSet, SAETrainer, validate

    rng = np.random.default_rng(2)
    T, d = 12, 8
    acts = rng.standard_normal((5, T, d)).astype(np.float32)  # ragged at bs=2
    w = ActivationStoreWriter(tmp_path, "L", (T, d), (T, d))
    w.append_batch([f"f{i}" for i in range(5)], acts, n_frames=[T] * 5)
    w.close()

    tr = SAETrainer("l1", {"n_dict_components": 16, "recon_alpha": 100.0}, d,
                    optimizer="radam", scheduler="cosine", lr=1e-3, steps=10,
                    clip_thresh=1.0)
    loader, _, _ = init_dataloader(True, str(tmp_path), "test:tiny", None,
                                   "L", batch_size=2, shuffle=False)
    vs = DeviceValSet(loader, val_batch=2)
    assert vs.ok and len(vs.batches) == 3
    streamed = validate(tr, str(tmp_path), "L", "test:tiny", True, False,
                        val_batch=2, loader=loader)
    resident = validate(tr, str(tmp_path), "L", "test:tiny", True, False,
                        val_batch=2, device_set=vs)
    for a, b in zip(streamed[0].values(), resident[0].values()):
        if a is not None:
            np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(streamed[4], resident[4])  # mag maxes
    np.testing.assert_array_equal(streamed[5], resident[5])  # mag stds

    too_small = DeviceValSet(loader, val_batch=2, max_bytes=100)
    assert not too_small.ok and not too_small.batches


def test_device_val_set_sharded_over_mesh(tmp_path):
    """A multi-device mesh shards each resident val batch over the data
    axis (the val program partitions across chips) with max_bytes as a
    PER-DEVICE cap — a set over the single-chip budget fits once spread —
    and validation results equal the streamed path exactly."""
    from freud_tpu.data.loaders import init_dataloader
    from freud_tpu.data.store import ActivationStoreWriter
    from freud_tpu.parallel import mesh as mesh_lib
    from freud_tpu.train.trainer import DeviceValSet, SAETrainer, validate

    rng = np.random.default_rng(4)
    T, d = 12, 8
    acts = rng.standard_normal((16, T, d)).astype(np.float32)
    w = ActivationStoreWriter(tmp_path, "L", (T, d), (T, d))
    w.append_batch([f"f{i}" for i in range(16)], acts, n_frames=[T] * 16)
    w.close()

    mesh = mesh_lib.make_mesh()  # 8 virtual devices, data axis 8
    n_data = mesh.shape[mesh_lib.DATA_AXIS]
    assert n_data == 8
    tr = SAETrainer("l1", {"n_dict_components": 16, "recon_alpha": 100.0}, d,
                    optimizer="radam", scheduler="cosine", lr=1e-3, steps=10,
                    clip_thresh=1.0, mesh=mesh)
    loader, _, _ = init_dataloader(True, str(tmp_path), "test:tiny", None,
                                   "L", batch_size=8, shuffle=False)
    per_batch_bytes = 8 * T * d * 4
    # under the per-device cap only BECAUSE it spreads over the mesh: the
    # whole set (2 batches) exceeds the budget, a 1/8 shard does not
    vs = DeviceValSet(loader, val_batch=8, mesh=mesh,
                      max_bytes=per_batch_bytes // 2)
    assert vs.ok and len(vs.batches) == 2
    for x, _, _ in vs.batches:
        assert len(x.sharding.device_set) == n_data, x.sharding
    unsharded = DeviceValSet(loader, val_batch=8,
                             max_bytes=per_batch_bytes // 2)
    assert not unsharded.ok  # same budget, no mesh → over cap

    streamed = validate(tr, str(tmp_path), "L", "test:tiny", True, False,
                        val_batch=8, loader=loader)
    resident = validate(tr, str(tmp_path), "L", "test:tiny", True, False,
                        val_batch=8, device_set=vs)
    for a, b in zip(streamed[0].values(), resident[0].values()):
        if a is not None:
            np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(streamed[4], resident[4], rtol=1e-6)
    np.testing.assert_allclose(streamed[5], resident[5], rtol=1e-6)


def test_device_val_set_transcripts_past_keep_horizon(tmp_path):
    """Resident validation with transcripts: when early files fail
    load_audio (skipped without consuming slots), later batches whose
    sae_out was dropped from the batched pre-fetch must re-fetch it on
    demand instead of crashing (review finding r4)."""
    import wave

    from freud_tpu.data.loaders import init_dataloader
    from freud_tpu.data.store import ActivationStoreWriter
    from freud_tpu.train.trainer import DeviceValSet, SAETrainer, validate

    rng = np.random.default_rng(3)
    T, d = 12, 8
    names = [str(tmp_path / f"missing{i}.wav") for i in range(4)]
    for i in range(4, 6):  # only the LAST batch's files exist on disk
        p = tmp_path / f"real{i}.wav"
        with wave.open(str(p), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes((rng.standard_normal(4000) * 2000)
                          .astype(np.int16).tobytes())
        names.append(str(p))
    store = tmp_path / "acts"
    w = ActivationStoreWriter(store, "L", (T, d), (T, d))
    w.append_batch(names, rng.standard_normal((6, T, d)).astype(np.float32),
                   n_frames=[T] * 6)
    w.close()

    tr = SAETrainer("l1", {"n_dict_components": 16, "recon_alpha": 100.0}, d,
                    optimizer="radam", scheduler="cosine", lr=1e-3, steps=10,
                    clip_thresh=1.0)
    loader, _, _ = init_dataloader(True, str(store), "test:tiny", None, "L",
                                   batch_size=2, shuffle=False)
    vs = DeviceValSet(loader, val_batch=2)
    assert vs.ok
    subs = []

    def transcriber(mels, substitute_values=None):
        if substitute_values is not None:
            subs.append(np.asarray(substitute_values).shape)
        return ["text"] * np.asarray(mels).shape[0]

    out = validate(tr, str(store), "L", "test:tiny", True, False,
                   val_batch=2, device_set=vs, transcriber=transcriber)
    # files 0-3 are unloadable: the two real files (batch 2, past the
    # keep horizon of N_TRANSCRIPTS=4 offered files) must still transcribe;
    # the batched call pads the 2 real slots to the N_TRANSCRIPTS bucket
    assert len(out[1]) == 2 and subs == [(4, T, d)]


def test_auto_fused_chunk_divides_cadences(tmp_path, ):
    """The AUTO fused chunk must be a divisor of gcd(save_every, val_every)
    even when the gcd exceeds the cap — a plain min() would land chunk
    ends off the cadence steps and silently skip checkpoints/validations
    (review finding r4)."""
    from freud_tpu.data.store import ActivationStoreWriter
    from freud_tpu.train.trainer import train

    rng = np.random.default_rng(0)
    src = tmp_path / "acts"
    w = ActivationStoreWriter(src, "L", (4, 6), (4, 6))
    w.append_batch([f"f{i}" for i in range(12)],
                   rng.standard_normal((12, 4, 6)).astype(np.float32))
    w.close()
    stats = train(
        seed=0, train_folder=str(src), val_folder=str(src),
        run_dir=str(tmp_path / "run"), lr=1e-3, weight_decay=0.0, steps=250,
        clip_thresh=1.0, batch_size=4, log_tb_every=1000, save_every=125,
        val_every=125,
        whisper_config={"model": "test:tiny", "layer_name": "L"},
        optimizer="adam", scheduler="linear",
        scheduler_params={"num_warmup_steps": 1},
        autoencoder_variant="l1",
        autoencoder_config={"n_dict_components": 8, "recon_alpha": 1.0},
        from_disk=True, enable_transcripts=False, verbose=False,
        device_cache_files=12,
    )
    assert stats["steps"] == 250
    # gcd(125,125)=125 > 100 → auto must pick 25 (largest divisor ≤ 100),
    # so the step-125 checkpoint fires on a chunk boundary
    assert (tmp_path / "run" / "checkpoints" / "step125.pth").exists()
    assert stats["best_val_loss"] != float("inf")  # validation fired


def test_schedule_host_mirror_matches_device():
    """make_schedule's .host (pure-Python logging evaluator) must equal the
    optax schedule at every step for both recipes."""
    for sched, params in (("cosine", {}), ("linear", {"num_warmup_steps": 7})):
        s = make_schedule(sched, 4e-4, 100, params)
        for step in [0, 1, 3, 7, 8, 50, 99, 100, 150]:
            np.testing.assert_allclose(
                float(s(step)), s.host(step), rtol=1e-6, atol=1e-10,
                err_msg=f"{sched} step {step}")


def test_async_checkpoint_writer_snapshot_and_coalesce(tmp_path):
    """save_async must (a) snapshot the trainer state AT SUBMIT TIME — a
    later train step must not leak into the queued checkpoint — and
    (b) write every path from ONE device fetch (the save_every+bestval
    coincidence step)."""
    import torch

    from freud_tpu.train.checkpoint import AsyncCheckpointWriter
    from freud_tpu.train.trainer import SAETrainer

    rng = np.random.default_rng(0)
    tr = SAETrainer("l1", {"n_dict_components": 16, "recon_alpha": 1.0}, 8,
                    optimizer="radam", scheduler="cosine", lr=1e-3, steps=10,
                    clip_thresh=1.0)
    w = AsyncCheckpointWriter()
    a, b = str(tmp_path / "a.pth"), str(tmp_path / "b.pth")
    tr.save_async([a, b], tr.hparams(), w)
    # mutate the live state AFTER submit: the snapshot must not see it
    tr.train_step(rng.standard_normal((4, 6, 8), dtype=np.float32) + 0.0)
    tr.step = 777
    w.flush()
    ca = torch.load(a, weights_only=True)
    cb = torch.load(b, weights_only=True)
    assert ca["step"] == 0 and cb["step"] == 0
    for k in ca["model"]:
        np.testing.assert_array_equal(np.asarray(ca["model"][k]),
                                      np.asarray(cb["model"][k]))
    # round-trips through the normal loader
    tr2 = SAETrainer("l1", {"n_dict_components": 16, "recon_alpha": 1.0}, 8,
                     optimizer="radam", scheduler="cosine", lr=1e-3, steps=10,
                     clip_thresh=1.0)
    tr2.load(a)
    assert tr2.step == 0
    w.close()


def test_async_checkpoint_writer_coalesces_superseded():
    """A queued (unstarted) write is REPLACED by a newer submit carrying the
    same coalesce key — the bestval cadence fix: when the link is slower
    than the validation cadence, superseded bestval snapshots must not
    stall training while they drain (they all target the same path; only
    the newest matters)."""
    import threading

    from freud_tpu.train.checkpoint import AsyncCheckpointWriter

    w = AsyncCheckpointWriter()
    gate = threading.Event()
    started = threading.Event()

    def slow():
        started.set()
        assert gate.wait(30)

    order = []
    w.submit(slow)
    assert started.wait(30)  # slow is IN FLIGHT; the queue slot is free
    w.submit(lambda: order.append("A"), coalesce="bestval")
    # these would BLOCK without coalescing (slot occupied); with it they
    # replace the queued superseded snapshot and return immediately
    w.submit(lambda: order.append("B"), coalesce="bestval")
    w.submit(lambda: order.append("C"), coalesce="bestval")
    assert w.dropped == 2
    gate.set()
    w.flush()
    assert order == ["C"]
    # distinct keys never coalesce: normal ordered execution
    w.submit(lambda: order.append("D"), coalesce="bestval")
    w.submit(lambda: order.append("E"))
    w.flush()
    assert order == ["C", "D", "E"]
    w.close()


def test_save_async_coalesce_key_selection(tmp_path):
    """save_async coalesces ONLY pure-bestval writes; any write that
    includes a step checkpoint must never be dropped."""
    from freud_tpu.train.trainer import SAETrainer

    class Capture:
        def __init__(self):
            self.keys = []

        def submit(self, work, coalesce=None):
            self.keys.append(coalesce)
            work()

    tr = SAETrainer("l1", {"n_dict_components": 16, "recon_alpha": 1.0}, 8,
                    optimizer="radam", scheduler="cosine", lr=1e-3, steps=10,
                    clip_thresh=1.0)
    w = Capture()
    tr.save_async([str(tmp_path / "bestval.pth")], tr.hparams(), w)
    tr.save_async([str(tmp_path / "step100.pth"),
                   str(tmp_path / "bestval.pth")], tr.hparams(), w)
    assert w.keys == ["bestval", None]
    assert (tmp_path / "bestval.pth").exists()
    assert (tmp_path / "step100.pth").exists()


def test_async_checkpoint_writer_error_propagates(tmp_path):
    """A failed background write must raise on the next submit/flush —
    a silently dead writer would end a long run with stale checkpoints."""
    import pytest

    from freud_tpu.train.checkpoint import AsyncCheckpointWriter

    w = AsyncCheckpointWriter()

    def boom():
        raise OSError("disk full")

    w.submit(boom)
    with pytest.raises(RuntimeError, match="async checkpoint write failed"):
        w.flush()
    # the writer stays usable after surfacing the error
    ok = []
    w.submit(lambda: ok.append(1))
    w.flush()
    assert ok == [1]
    w.close()
