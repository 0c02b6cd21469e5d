"""Device-resident shuffle cache tests."""

import time

import numpy as np
import pytest

from freud_tpu.data.device_cache import DeviceShuffleCache
from freud_tpu.data.store import ActivationStoreWriter


@pytest.fixture()
def store(tmp_path):
    rng = np.random.default_rng(0)
    data = rng.standard_normal((20, 4, 6)).astype(np.float32)
    # tag each file with its index so provenance is checkable
    data[:, 0, 0] = np.arange(20)
    w = ActivationStoreWriter(tmp_path, "L", (4, 6), (4, 6))
    w.append_batch([f"f{i}" for i in range(20)], data)
    w.close()
    return tmp_path, data


def test_sample_shapes_and_provenance(store):
    path, data = store
    cache = DeviceShuffleCache(str(path), "L", capacity_files=8, refresh_files=0)
    try:
        batch = np.asarray(cache.next_batch(5))
        assert batch.shape == (5, 4, 6)
        # every sampled row is a real store row
        tags = batch[:, 0, 0]
        assert all(int(t) in range(20) for t in tags)
        # different draws differ (randomized indices): over several draws of
        # 5 rows from 20 files, identical sequences are (20^-5)^4-improbable
        draws = [np.asarray(cache.next_batch(5)) for _ in range(4)]
        assert any(not np.array_equal(batch, d) for d in draws)
    finally:
        cache.close()


def test_process_shard_strata_are_disjoint(store):
    """Pod mode: each host's cache holds only its strided file stratum —
    samples carry only that stratum's tags, and the two hosts' strata
    partition the store."""
    path, data = store
    caches = [DeviceShuffleCache(str(path), "L", capacity_files=10,
                                 refresh_files=2, process_shard=(i, 2))
              for i in range(2)]
    try:
        seen = []
        for i, cache in enumerate(caches):
            np.testing.assert_array_equal(cache._files,
                                          np.arange(20)[i::2])
            tags = {int(t) for _ in range(6)
                    for t in np.asarray(cache.next_batch(4))[:, 0, 0]}
            assert tags <= set(range(i, 20, 2)), (i, tags)
            seen.append(tags)
        # decorrelated PRNGs: the two hosts draw different index sequences
        assert seen[0].isdisjoint(seen[1])
    finally:
        for c in caches:
            c.close()
    with pytest.raises(ValueError, match="bad process_shard"):
        DeviceShuffleCache(str(path), "L", capacity_files=4,
                           process_shard=(2, 2))


def test_refresh_brings_new_files(store):
    path, data = store
    cache = DeviceShuffleCache(str(path), "L", capacity_files=4, refresh_files=4)
    try:
        seen = set()
        deadline = time.time() + 20
        while time.time() < deadline and len(seen) < 10:
            batch = np.asarray(cache.next_batch(8))
            seen.update(int(t) for t in batch[:, 0, 0])
        # initial window is files 0..3; refresh must surface others
        assert len(seen) > 4, f"only saw {sorted(seen)}"
    finally:
        cache.close()


@pytest.mark.parametrize("variant,cfg", [
    ("l1", {"n_dict_components": 8, "recon_alpha": 1.0}),
    ("topk", {"expansion_factor": 2, "k": 2}),
])
def test_fused_chunk_matches_per_step(store, variant, cfg):
    """The fused multi-step program (lax.scan over sample+step) draws the
    SAME batch stream as per-step next_batch/train_step and lands on the
    same parameters: the chunk body chains the identical split/randint/take
    sequence through the scan carry."""
    import jax
    from freud_tpu.train.trainer import SAETrainer

    path, _ = store

    def run(chunked):
        trainer = SAETrainer(
            variant, cfg, 6, optimizer="adam", scheduler="linear",
            scheduler_params={"num_warmup_steps": 1}, lr=1e-3, steps=12,
            seed=3,
        )
        cache = DeviceShuffleCache(str(path), "L", capacity_files=20,
                                   refresh_files=0, seed=7)
        try:
            if chunked:
                for _ in range(2):
                    stacked = trainer.train_chunk(cache, 8, 3)
                # the chunk returns the per-step metric stack; the final
                # step's row is the per-step path's final metrics
                metrics = jax.tree_util.tree_map(lambda v: v[-1], stacked)
            else:
                for _ in range(6):
                    metrics = trainer.train_step(
                        np.asarray(cache.next_batch(8)))
            assert trainer.step == 6
            return (jax.device_get(trainer.params),
                    np.asarray(cache._key),
                    jax.device_get(metrics))
        finally:
            cache.close()

    params_a, key_a, metrics_a = run(chunked=False)
    params_b, key_b, metrics_b = run(chunked=True)
    # identical PRNG stream consumed
    np.testing.assert_array_equal(key_a, key_b)
    for pa, pb in zip(jax.tree_util.tree_leaves(params_a),
                      jax.tree_util.tree_leaves(params_b)):
        np.testing.assert_allclose(pa, pb, rtol=2e-5, atol=2e-6)
    for k in metrics_a:
        np.testing.assert_allclose(metrics_a[k], metrics_b[k],
                                   rtol=2e-4, atol=2e-6)


def test_pod_fused_chunk_matches_per_step(store):
    """train_chunk_pod (the pod fused path: one host-local dispatch samples
    the chunk's batches, one global assembly, one scanned step program)
    draws the identical split/randint/take stream as per-step next_batch/
    train_step — and as the single-host fused train_chunk — and lands on
    the same parameters. The bf16 cache pins the raw-dtype staging too:
    staging in storage dtype then upcasting in the global program must be
    bit-identical to next_batch's upcast-at-sample."""
    import jax
    from freud_tpu.train.trainer import SAETrainer

    path, _ = store

    def run(mode):
        trainer = SAETrainer(
            "l1", {"n_dict_components": 8, "recon_alpha": 1.0}, 6,
            optimizer="adam", scheduler="linear",
            scheduler_params={"num_warmup_steps": 1}, lr=1e-3, steps=12,
            seed=3)
        cache = DeviceShuffleCache(str(path), "L", capacity_files=20,
                                   refresh_files=0, seed=7,
                                   cache_dtype="bfloat16")
        try:
            if mode == "pod":
                for _ in range(2):
                    trainer.train_chunk_pod(cache, 8, 3)
            elif mode == "chunk":
                for _ in range(2):
                    trainer.train_chunk(cache, 8, 3)
            else:
                for _ in range(6):
                    trainer.train_step(np.asarray(cache.next_batch(8)))
            assert trainer.step == 6
            return jax.device_get(trainer.params), np.asarray(cache._key)
        finally:
            cache.close()

    ref_params, ref_key = run("step")
    for mode in ("pod", "chunk"):
        params, key = run(mode)
        np.testing.assert_array_equal(ref_key, key)
        for pa, pb in zip(jax.tree_util.tree_leaves(ref_params),
                          jax.tree_util.tree_leaves(params)):
            np.testing.assert_allclose(pa, pb, rtol=2e-5, atol=2e-6)


def test_bf16_cache_storage(store):
    """cache_dtype="bfloat16": storage is bf16 (half the HBM), samples come
    out as f32 with exactly bf16-rounded values; the fused chunk consumes
    the reduced-precision cache directly."""
    import jax
    import jax.numpy as jnp
    from freud_tpu.train.trainer import SAETrainer

    path, data = store
    cache = DeviceShuffleCache(str(path), "L", capacity_files=20,
                               refresh_files=0, cache_dtype="bfloat16")
    try:
        assert cache.cache.dtype == jnp.bfloat16
        batch = cache.next_batch(6)
        assert np.asarray(batch).dtype == np.float32
        # every sampled row is a bf16-rounded store row: rounding then
        # upcasting must reproduce the sample bit-for-bit
        rounded = data.astype(jnp.bfloat16).astype(np.float32)
        tags = np.asarray(batch)[:, 0, 0]
        for row, tag in zip(np.asarray(batch), tags):
            np.testing.assert_array_equal(row, rounded[int(tag)])

        trainer = SAETrainer(
            "l1", {"n_dict_components": 8, "recon_alpha": 1.0}, 6,
            optimizer="adam", scheduler="linear",
            scheduler_params={"num_warmup_steps": 1}, lr=1e-3, steps=8)
        m = trainer.train_chunk(cache, 4, 2)
        assert np.all(np.isfinite(np.asarray(jax.device_get(m["loss"]))))
    finally:
        cache.close()
    with pytest.raises(ValueError, match="cache_dtype"):
        DeviceShuffleCache(str(path), "L", capacity_files=4,
                           cache_dtype="float16")


def test_train_fused_steps_validation(tmp_path, store):
    src, _ = store
    from freud_tpu.train.trainer import train

    kwargs = dict(
        seed=0, train_folder=str(src), val_folder=str(src),
        run_dir=str(tmp_path / "runf"), lr=1e-3, weight_decay=0.0, steps=6,
        clip_thresh=1.0, batch_size=4, log_tb_every=2, save_every=6,
        val_every=6,
        whisper_config={"model": "test:tiny", "layer_name": "L"},
        optimizer="adam", scheduler="linear",
        scheduler_params={"num_warmup_steps": 1},
        autoencoder_variant="l1",
        autoencoder_config={"n_dict_components": 8, "recon_alpha": 1.0},
        from_disk=True, enable_transcripts=False, verbose=False,
        device_cache_files=8,
    )
    # explicit fused_steps must divide every cadence
    with pytest.raises(ValueError, match="must divide"):
        train(**{**kwargs, "fused_steps": 4})
    stats = train(**{**kwargs, "fused_steps": 2})
    assert stats["steps"] == 6


def test_train_with_device_cache(tmp_path, store):
    src, _ = store
    from freud_tpu.train.trainer import train

    stats = train(
        seed=0, train_folder=str(src), val_folder=str(src),
        run_dir=str(tmp_path / "run"), lr=1e-3, weight_decay=0.0, steps=4,
        clip_thresh=1.0, batch_size=4, log_tb_every=2, save_every=4,
        val_every=10,
        whisper_config={"model": "test:tiny", "layer_name": "L"},
        optimizer="adam", scheduler="linear",
        scheduler_params={"num_warmup_steps": 1},
        autoencoder_variant="l1",
        autoencoder_config={"n_dict_components": 8, "recon_alpha": 1.0},
        from_disk=True, enable_transcripts=False, verbose=False,
        device_cache_files=8,
    )
    assert stats["steps"] == 4
