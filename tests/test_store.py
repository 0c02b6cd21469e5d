"""Activation store tests: npy append format, metadata, reader round-trips."""

import json
import wave

import numpy as np
import pytest

from freud_tpu.data.store import (
    ActivationStoreReader,
    ActivationStoreWriter,
    AppendableNpy,
)


def test_appendable_npy_is_standard_npy(tmp_path):
    p = tmp_path / "a.npy"
    with AppendableNpy(p, (6,), np.float32) as f:
        f.append(np.arange(12, dtype=np.float32).reshape(2, 6))
        f.append(np.arange(6, dtype=np.float32).reshape(1, 6) + 100)
    loaded = np.load(p)
    assert loaded.shape == (3, 6)
    np.testing.assert_allclose(loaded[2], np.arange(6) + 100)
    # and mmap-readable, like the reference's np.load(mmap_mode="r")
    m = np.load(p, mmap_mode="r")
    assert m.shape == (3, 6)


def test_appendable_npy_reopen_appends(tmp_path):
    p = tmp_path / "b.npy"
    with AppendableNpy(p, (4,), np.float32) as f:
        f.append(np.ones((2, 4), np.float32))
    with AppendableNpy(p, (4,), np.float32) as f:
        f.append(np.full((3, 4), 2.0, np.float32))
    loaded = np.load(p)
    assert loaded.shape == (5, 4)
    assert loaded[0, 0] == 1.0 and loaded[4, 0] == 2.0


def test_appendable_npy_shape_mismatch(tmp_path):
    with AppendableNpy(tmp_path / "c.npy", (4,), np.float32) as f:
        with pytest.raises(ValueError):
            f.append(np.ones((2, 5), np.float32))


def test_dense_store_roundtrip(tmp_path):
    w = ActivationStoreWriter(
        tmp_path, "encoder.blocks.2", tensor_shape=(10, 8),
        activation_shape=(10, 8),
    )
    data = np.random.default_rng(0).standard_normal((5, 10, 8)).astype(np.float32)
    w.append_batch(["f0", "f1", "f2"], data[:3], n_frames=[10, 7, 3])
    w.append_batch(["f3", "f4"], data[3:], n_frames=[10, 10])
    w.close()

    meta = json.loads((tmp_path / "encoder.blocks.2_metadata.json").read_text())
    assert meta["tensor_shape"] == [10, 8]
    assert meta["activation_shape"] == [10, 8]
    assert meta["filenames"] == ["f0", "f1", "f2", "f3", "f4"]
    assert meta["n_frames"] == [10, 7, 3, 10, 10]

    r = ActivationStoreReader(tmp_path, "encoder.blocks.2")
    assert r.activation_type == "tensor"
    assert len(r) == 5
    arr, name = r[3]
    assert name == "f3"
    np.testing.assert_allclose(arr, data[3])
    batch = r.batch(np.array([0, 4]))
    np.testing.assert_allclose(batch[0][1], data[4])
    assert batch[1] == ["f0", "f4"]


def test_indexed_store_roundtrip(tmp_path):
    w = ActivationStoreWriter(
        tmp_path, "L", tensor_shape=(10, 4), activation_shape=(10, 64), indexed=True
    )
    vals = np.random.default_rng(1).standard_normal((3, 10, 4)).astype(np.float32)
    idx = np.random.default_rng(2).integers(0, 64, (3, 10, 4)).astype(np.int64)
    w.append_batch(["a", "b", "c"], vals, idx)
    w.close()

    r = ActivationStoreReader(tmp_path, "L")
    assert r.activation_type == "indexed"
    v, i, name = r[1]
    np.testing.assert_allclose(v, vals[1])
    np.testing.assert_array_equal(i, idx[1])
    assert i.dtype == np.int64
    assert name == "b"


def test_store_tensor_shape_check(tmp_path):
    w = ActivationStoreWriter(tmp_path, "L", (4, 4), (4, 4))
    with pytest.raises(ValueError, match="tensor shape"):
        w.append_batch(["x"], np.ones((1, 5, 4), np.float32))


def test_subset_size(tmp_path):
    w = ActivationStoreWriter(tmp_path, "L", (2, 2), (2, 2))
    w.append_batch([f"f{i}" for i in range(6)], np.ones((6, 2, 2), np.float32))
    w.close()
    r = ActivationStoreReader(tmp_path, "L", subset_size=4)
    assert len(r) == 4


def _write_wavs(folder, n, seconds=1.0, seed=0):
    rng = np.random.default_rng(seed)
    paths = []
    for i in range(n):
        p = folder / f"clip{i}.wav"
        audio = (rng.standard_normal(int(16000 * seconds)) * 0.1).astype(np.float32)
        with wave.open(str(p), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes((audio * 32767).astype(np.int16).tobytes())
        paths.append(str(p))
    return paths


def test_collection_end_to_end(tmp_path):
    """Minimum end-to-end slice: wavs → mel → capture → store → read back."""
    from freud_tpu.scripts.collect_activations import get_activations

    audio_dir = tmp_path / "audio"
    audio_dir.mkdir()
    _write_wavs(audio_dir, 5, seconds=0.5)
    out = tmp_path / "acts"

    stats = get_activations(
        data_path=str(audio_dir),
        layer_name="encoder.blocks.1.mlp.1",
        whisper_model="test:tiny",
        sae_model=None,
        batch_size=2,
        out_folder=str(out),
        verbose=False,
    )
    assert stats["n_files"] == 5

    r = ActivationStoreReader(out, "encoder.blocks.1.mlp.1")
    assert len(r) == 5
    assert r.tensor_shape == (1500, 4 * 384)
    arr, name = r[0]
    assert name.endswith("clip0.wav")
    assert np.isfinite(arr).all() and np.abs(arr).max() > 0
    # 0.5 s of audio → 25 encoder frames recorded as true length
    assert r.n_frames == [25] * 5


def test_fly_loader_matches_runtime(tmp_path):
    """Fly loader activations equal a direct runtime capture per file."""
    from freud_tpu.data.loaders import FlyActivationLoader
    from freud_tpu.audio.decode import load_audio
    from freud_tpu.audio.mel import mels_from_array
    from freud_tpu.models.whisper import WhisperRuntime

    audio_dir = tmp_path / "audio"
    audio_dir.mkdir()
    paths = _write_wavs(audio_dir, 3, seconds=0.3, seed=5)

    loader = FlyActivationLoader(
        str(audio_dir), "test:tiny", None, "encoder.blocks.0", batch_size=2
    )
    got = {}
    for acts, names in loader:
        for a, n in zip(np.asarray(acts), names):
            got[n] = a

    rt = WhisperRuntime("test:tiny", "encoder.blocks.0")
    for p in paths:
        mel = mels_from_array(load_audio(p), 80)
        direct = np.asarray(rt.activations(mel))[0]
        np.testing.assert_allclose(got[p], direct, atol=2e-5, rtol=1e-4)


def test_collection_skips_undecodable_files(tmp_path):
    from freud_tpu.scripts.collect_activations import get_activations

    audio_dir = tmp_path / "audio"
    audio_dir.mkdir()
    _write_wavs(audio_dir, 3, seconds=0.4)
    (audio_dir / "broken.wav").write_bytes(b"not really a wav file")
    out = tmp_path / "acts"
    stats = get_activations(
        data_path=str(audio_dir), layer_name="encoder.blocks.0",
        whisper_model="test:tiny", sae_model=None, batch_size=2,
        out_folder=str(out), verbose=False,
    )
    assert stats["n_files"] == 3  # broken file dropped, run completes
    r = ActivationStoreReader(out, "encoder.blocks.0")
    assert len(r) == 3
    assert all("broken" not in f for f in r.filenames)
    assert all(n > 0 for n in r.n_frames)


def test_append_mode_preserves_existing_metadata(tmp_path):
    """overwrite=False resumes the existing store: rows append AND metadata
    keeps the earlier filenames/n_frames (a fresh metadata list against
    grown npy files would silently misalign every row↔filename lookup)."""
    import numpy as np

    from freud_tpu.data.store import (ActivationStoreReader,
                                      ActivationStoreWriter)

    a = np.random.default_rng(0).standard_normal((3, 4, 2)).astype(np.float32)
    w = ActivationStoreWriter(tmp_path, "L", (4, 2), (4, 2))
    w.append_batch(["/x/a0", "/x/a1", "/x/a2"], a, n_frames=[4, 3, 2])
    w.close()

    b = np.random.default_rng(1).standard_normal((2, 4, 2)).astype(np.float32)
    w2 = ActivationStoreWriter(tmp_path, "L", (4, 2), (4, 2), overwrite=False)
    w2.append_batch(["/x/b0", "/x/b1"], b, n_frames=[1, 4])
    w2.close()

    r = ActivationStoreReader(tmp_path, "L")
    assert len(r) == 5
    assert r.filenames == ["/x/a0", "/x/a1", "/x/a2", "/x/b0", "/x/b1"]
    assert [int(x) for x in r.n_frames] == [4, 3, 2, 1, 4]
    got, _ = r.batch(np.arange(5))
    np.testing.assert_allclose(got, np.concatenate([a, b]))


def test_partial_n_frames_rejected(tmp_path):
    """Mixing n_frames-bearing and n_frames-less batches would emit a
    positionally-misaligned metadata list — the writer must refuse."""
    import numpy as np
    import pytest

    from freud_tpu.data.store import ActivationStoreWriter

    a = np.zeros((2, 4, 2), np.float32)
    w = ActivationStoreWriter(tmp_path, "L", (4, 2), (4, 2))
    w.append_batch(["/x/a0", "/x/a1"], a, n_frames=[4, 4])
    with pytest.raises(ValueError):
        w.append_batch(["/x/a2", "/x/a3"], a)
    w.close()
