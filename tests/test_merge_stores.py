"""Multi-host collection sharding: strided file split + shard-store merge."""

import numpy as np

from freud_tpu.data.store import ActivationStoreReader, ActivationStoreWriter
from freud_tpu.scripts.merge_stores import merge_shards


def _write(folder, layer, names, data, n_frames):
    w = ActivationStoreWriter(folder, layer, data.shape[1:], data.shape[1:])
    w.append_batch(names, data, n_frames=n_frames)
    w.close()


def test_merge_restores_original_order(tmp_path):
    """shard j%P row j//P → merged store equals the single-host collection
    of the same files, byte-for-byte (order, arrays, n_frames)."""
    rng = np.random.default_rng(0)
    n, t, f, p = 11, 6, 4, 3
    data = rng.standard_normal((n, t, f)).astype(np.float32)
    names = [f"/a/f{j:02d}.wav" for j in range(n)]
    frames = [int(x) for x in rng.integers(1, t + 1, n)]

    for i in range(p):
        _write(tmp_path / f"shard{i}", "L", names[i::p], data[i::p],
               [frames[j] for j in range(i, n, p)])

    stats = merge_shards(tmp_path, "L", chunk=4, verbose=False)
    assert stats == {"n_files": n, "shards": p, "out_folder": tmp_path}

    r = ActivationStoreReader(tmp_path, "L")
    assert len(r) == n
    assert r.filenames == names
    assert [int(x) for x in r.n_frames] == frames
    got, got_names = r.batch(np.arange(n))
    np.testing.assert_allclose(got, data)
    assert got_names == names


def test_pipeline_shard_param(tmp_path):
    """AudioBatchPipeline(shard=(i, n)) keeps exactly files[i::n] of the
    sorted universe — disjoint and exhaustive across shards."""
    import wave

    from freud_tpu.data.audio_dataset import AudioBatchPipeline

    for j in range(7):
        with wave.open(str(tmp_path / f"c{j}.wav"), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes(np.zeros(1600, np.int16).tobytes())

    full = AudioBatchPipeline(str(tmp_path), 2, 80, compute_mels=False).files
    assert len(full) == 7
    shards = [
        AudioBatchPipeline(str(tmp_path), 2, 80, compute_mels=False,
                           shard=(i, 3)).files
        for i in range(3)
    ]
    assert shards[0] == full[0::3]
    assert sorted(sum(shards, [])) == sorted(full)

    import pytest

    with pytest.raises(ValueError):
        AudioBatchPipeline(str(tmp_path), 2, 80, compute_mels=False,
                           shard=(3, 3))


def test_merge_preserves_float16(tmp_path):
    """A float16 collection must not silently double in size through the
    merge — the merged store keeps the shards' value dtype."""
    rng = np.random.default_rng(0)
    n, p = 4, 2
    names = [f"f{i}.wav" for i in range(n)]
    data = rng.standard_normal((n, 3, 2)).astype(np.float16)
    for i in range(p):
        w = ActivationStoreWriter(tmp_path / f"shard{i}", "L",
                                  data.shape[1:], data.shape[1:],
                                  store_dtype=np.float16)
        w.append_batch(names[i::p], data[i::p],
                       n_frames=np.full(len(names[i::p]), 3))
        w.close()
    merge_shards(tmp_path, "L", verbose=False)
    merged = np.load(tmp_path / "L_tensors.npy", mmap_mode="r")
    assert merged.dtype == np.float16
    r = ActivationStoreReader(tmp_path, "L")
    assert r.filenames == names
    for i in range(n):
        np.testing.assert_array_equal(
            np.asarray(r[i][0]), data[i].reshape(3, 2))


def test_merge_rejects_mixed_dtype_shards(tmp_path):
    """Hosts that collected with different store_dtype configs must fail the
    merge loudly — a silent cast would corrupt one side's precision."""
    import numpy as np
    import pytest

    from freud_tpu.data.store import ActivationStoreWriter
    from freud_tpu.scripts.merge_stores import merge_shards

    layer = "encoder.blocks.1"
    rng = np.random.default_rng(0)
    for i, dt in enumerate([np.float32, np.float16]):
        d = tmp_path / f"shard{i}"
        w = ActivationStoreWriter(d, layer, (4, 3), (4, 3), store_dtype=dt)
        w.append_batch([f"f{i}.wav"], rng.standard_normal((1, 4, 3)))
        w.close()
    with pytest.raises(ValueError, match="store_dtype"):
        merge_shards(str(tmp_path), layer, verbose=False)
