"""Decoder-store EOT-padding resampling (data layer).

Decoder-layer stores are EOT-padded past each file's valid decode positions
(whisper/runtime.decode_capture docstring); training consumes full
fixed-shape batches, so the loaders replace padding rows with
per-file-deterministic draws from the VALID rows instead of feeding
teacher-forced EOT garbage into the SAE loss (loaders.resample_padding_rows).
Search/analysis paths mask positionally via n_frames and stay row-exact.
"""

import numpy as np

from freud_tpu.data.device_cache import DeviceShuffleCache
from freud_tpu.data.loaders import (
    MemoryMappedActivationLoader,
    resample_padding_rows,
)
from freud_tpu.data.store import ActivationStoreWriter

T, D = 6, 4


def _decoder_store(tmp_path, n_files=8, layer="decoder.blocks.0", seed=0):
    rng = np.random.default_rng(seed)
    data = rng.standard_normal((n_files, T, D)).astype(np.float32)
    # valid rows carry their file id in channel 0; padding rows carry -1
    n_frames = [max(1, (i % (T - 1)) + 1) for i in range(n_files)]
    n_frames[0] = T  # one fully-valid file
    for i, n in enumerate(n_frames):
        data[i, :n, 0] = i
        data[i, n:, 0] = -1.0
    w = ActivationStoreWriter(tmp_path, layer, (T, D), (T, D))
    w.append_batch([f"f{i}" for i in range(n_files)], data, n_frames=n_frames)
    w.close()
    return data, n_frames


def test_helper_replaces_padding_with_valid_rows():
    x = np.zeros((2, T, D), np.float32)
    x[0, :2] = [[1] * D, [2] * D]
    x[0, 2:] = -1
    x[1, :] = 7  # fully valid: untouched
    out = resample_padding_rows(x, [5, 6], [2, T], seed=0)
    assert out is x
    # every former padding row is now one of the file's valid rows
    assert all(row[0] in (1.0, 2.0) for row in out[0, 2:])
    assert (out[1] == 7).all()
    # per-(seed, file) deterministic
    y = np.zeros((1, T, D), np.float32)
    y[0, :2] = [[1] * D, [2] * D]
    y[0, 2:] = -1
    resample_padding_rows(y, [5], [2], seed=0)
    assert np.array_equal(out[0], y[0])


def test_helper_leaves_zero_valid_files_alone():
    x = np.full((1, T, D), -1.0, np.float32)
    resample_padding_rows(x, [0], [0], seed=0)
    assert (x == -1).all()


def test_loader_resamples_decoder_padding(tmp_path):
    data, n_frames = _decoder_store(tmp_path)
    loader = MemoryMappedActivationLoader(
        str(tmp_path), "decoder.blocks.0", batch_size=4, shuffle=True,
        seed=3, resample_padding=True)
    assert loader.resample_padding
    batches = list(loader)
    rows = np.concatenate([b[0] for b in batches])
    # no padding marker survives anywhere in the epoch
    assert (rows[:, :, 0] >= 0).all()
    # each row is one of its own file's valid rows (channel 0 = file id)
    names = np.concatenate([[n for n in b[-1]] for b in batches])
    for x, name in zip(rows, names):
        fid = int(name[1:])
        assert (x[:, 0] == fid).all()
        valid = data[fid, : n_frames[fid]]
        for row in x:
            assert any(np.array_equal(row, v) for v in valid)
    # identical across loader instances (per-(seed, file)-deterministic)
    loader2 = MemoryMappedActivationLoader(
        str(tmp_path), "decoder.blocks.0", batch_size=4, shuffle=True,
        seed=3, resample_padding=True)
    loader3 = MemoryMappedActivationLoader(
        str(tmp_path), "decoder.blocks.0", batch_size=4, shuffle=True,
        seed=3, resample_padding=True)
    for b2, b3 in zip(loader2, loader3):
        assert np.array_equal(b2[0], b3[0])


def test_loader_default_keeps_raw_rows(tmp_path):
    data, _ = _decoder_store(tmp_path)
    loader = MemoryMappedActivationLoader(
        str(tmp_path), "decoder.blocks.0", batch_size=8, shuffle=False)
    (rows, _), = list(loader)
    assert np.array_equal(rows, data)  # positional consumers stay row-exact


def test_device_cache_resamples_decoder_stores(tmp_path):
    _decoder_store(tmp_path)
    cache = DeviceShuffleCache(
        str(tmp_path), "decoder.blocks.0", capacity_files=8, refresh_files=0)
    try:
        assert cache._resample
        window = np.asarray(cache.cache)
        assert (window[:, :, 0] >= 0).all()
        batch = np.asarray(cache.next_batch(4))
        assert (batch[:, :, 0] >= 0).all()
    finally:
        cache.close()


def test_device_cache_refresh_resamples(tmp_path):
    _decoder_store(tmp_path, n_files=12)
    cache = DeviceShuffleCache(
        str(tmp_path), "decoder.blocks.0", capacity_files=6, refresh_files=3)
    try:
        import time

        # sample across a couple of background refresh applications — the
        # no-padding invariant must hold for refreshed rows too
        for _ in range(20):
            batch = np.asarray(cache.next_batch(4))
            assert (batch[:, :, 0] >= 0).all()
            time.sleep(0.02)
        window = np.asarray(cache.cache)
        assert (window[:, :, 0] >= 0).all()
    finally:
        cache.close()


def test_encoder_store_never_resamples(tmp_path):
    # encoder stores also carry n_frames (short clips) but match the
    # reference by training on the full padded frame axis
    rng = np.random.default_rng(0)
    data = rng.standard_normal((4, T, D)).astype(np.float32)
    w = ActivationStoreWriter(tmp_path, "encoder.blocks.0", (T, D), (T, D))
    w.append_batch([f"f{i}" for i in range(4)], data, n_frames=[2, 3, 4, T])
    w.close()
    cache = DeviceShuffleCache(
        str(tmp_path), "encoder.blocks.0", capacity_files=4, refresh_files=0)
    try:
        assert not cache._resample
        assert np.array_equal(np.sort(np.asarray(cache.cache), axis=0),
                              np.sort(data, axis=0))
    finally:
        cache.close()
