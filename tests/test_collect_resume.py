"""Interrupted-collection resume (collect_activations --resume).

Production collections run for hours; an interruption must not force a
restart. Pinned here: the crash-consistency mechanics (AppendableNpy
truncates orphan bytes past the last flushed header; the writer reconciles
data/metadata to their common prefix) and the end-to-end resume (skip
already-stored files, append, final store equals a from-scratch run
file-for-file).
"""

import json
import wave

import numpy as np

from freud_tpu.data.store import (
    ActivationStoreReader,
    ActivationStoreWriter,
    AppendableNpy,
)
from freud_tpu.scripts.collect_activations import get_activations


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


def test_appendable_npy_truncates_orphan_bytes(tmp_path):
    """Rows written after the last header flush (a killed writer) must not
    survive a reopen — appends would otherwise land after garbage."""
    p = tmp_path / "t.npy"
    a = AppendableNpy(p, (4,), np.float32)
    a.append(np.ones((2, 4), np.float32))
    a.flush()  # header says 2 rows
    # simulate a kill: more bytes hit the file, header never updated
    a._f.write(np.full((3, 4), 7.0, np.float32).tobytes())
    a._f.flush()
    a._f.close()

    b = AppendableNpy(p, (4,), np.float32)
    assert b.n_rows == 2
    b.append(np.full((1, 4), 9.0, np.float32))
    b.close()
    arr = np.load(p)
    assert arr.shape == (3, 4)
    np.testing.assert_array_equal(arr[2], np.full(4, 9.0))


def test_truncate_rows(tmp_path):
    p = tmp_path / "t.npy"
    a = AppendableNpy(p, (2,), np.float32)
    a.append(np.arange(10, dtype=np.float32).reshape(5, 2))
    a.truncate_rows(3)
    a.close()
    arr = np.load(p)
    np.testing.assert_array_equal(arr, np.arange(6, dtype=np.float32).reshape(3, 2))


def test_writer_reconciles_metadata_data_mismatch(tmp_path):
    """Kill between data flush and metadata write: the reopened writer keeps
    only the prefix both agree on."""
    w = ActivationStoreWriter(tmp_path, "L", (3,), [3])
    w.append_batch(["a", "b", "c"], np.ones((3, 3), np.float32),
                   n_frames=[1, 1, 1])
    w.close()
    # simulate: data gained a flushed row the metadata never recorded
    f = AppendableNpy(tmp_path / "L_tensors.npy", (3,), np.float32)
    f.append(np.full((1, 3), 5.0, np.float32))
    f.close()

    w2 = ActivationStoreWriter(tmp_path, "L", (3,), [3], overwrite=False)
    assert w2.filenames == ["a", "b", "c"]
    assert w2.files[0].n_rows == 3  # the orphan row was dropped
    w2.append_batch(["d"], np.full((1, 3), 2.0, np.float32), n_frames=[1])
    w2.close()
    r = ActivationStoreReader(tmp_path, "L")
    assert r.filenames == ["a", "b", "c", "d"]
    x, _ = r[3]
    np.testing.assert_array_equal(np.asarray(x)[0], np.full(3, 2.0))


def test_resume_completes_partial_collection(tmp_path):
    audio = tmp_path / "audio"
    _write_wavs(audio, 6)
    kw = dict(
        data_path=str(audio), layer_name="encoder.blocks.1",
        whisper_model="test:tiny", sae_model=None, batch_size=2,
        verbose=False,
    )

    # partial run: first 2 files only (collect_max caps the universe)
    partial = get_activations(out_folder=str(tmp_path / "acts"),
                              collect_max=2, **kw)
    assert partial["n_files"] == 2

    # resumed run over the full set skips the stored two and appends
    resumed = get_activations(out_folder=str(tmp_path / "acts"),
                              resume=True, **kw)
    assert resumed["n_files"] == 4

    # reference run from scratch
    full = get_activations(out_folder=str(tmp_path / "acts_full"), **kw)
    assert full["n_files"] == 6

    a = ActivationStoreReader(tmp_path / "acts", "encoder.blocks.1")
    b = ActivationStoreReader(tmp_path / "acts_full", "encoder.blocks.1")
    assert sorted(a.filenames) == sorted(b.filenames)
    rows_b = {fn: np.asarray(b[i][0]) for i, fn in enumerate(b.filenames)}
    for i, fn in enumerate(a.filenames):
        np.testing.assert_allclose(np.asarray(a[i][0]), rows_b[fn],
                                   rtol=1e-6, atol=1e-6)


def test_resume_noop_when_complete(tmp_path):
    audio = tmp_path / "audio"
    _write_wavs(audio, 2)
    kw = dict(
        data_path=str(audio), layer_name="encoder.blocks.1",
        whisper_model="test:tiny", sae_model=None, batch_size=2,
        out_folder=str(tmp_path / "acts"), verbose=False,
    )
    get_activations(**kw)
    again = get_activations(resume=True, **kw)
    assert again["n_files"] == 0
    meta = json.loads((tmp_path / "acts" / "encoder.blocks.1_metadata.json")
                      .read_text())
    assert len(meta["filenames"]) == 2


def test_float16_store_roundtrip_and_search(tmp_path):
    """store_dtype=float16: half-size store, every consumer upcasts on read;
    search results match the f32 store within fp16 quantization."""
    audio = tmp_path / "audio"
    _write_wavs(audio, 4)
    kw = dict(
        data_path=str(audio), layer_name="encoder.blocks.1",
        whisper_model="test:tiny", sae_model=None, batch_size=2,
        verbose=False,
    )
    get_activations(out_folder=str(tmp_path / "f32"), **kw)
    get_activations(out_folder=str(tmp_path / "f16"),
                    store_dtype="float16", **kw)

    t32 = np.load(tmp_path / "f32" / "encoder.blocks.1_tensors.npy",
                  mmap_mode="r")
    t16 = np.load(tmp_path / "f16" / "encoder.blocks.1_tensors.npy",
                  mmap_mode="r")
    assert t16.dtype == np.float16 and t32.dtype == np.float32
    assert t16.shape == t32.shape
    assert (tmp_path / "f16" / "encoder.blocks.1_tensors.npy").stat().st_size \
        < 0.6 * (tmp_path / "f32" / "encoder.blocks.1_tensors.npy").stat().st_size
    np.testing.assert_allclose(np.asarray(t16, np.float32), t32,
                               rtol=2e-3, atol=2e-3)

    from freud_tpu.data.loaders import MemoryMappedActivationLoader
    from freud_tpu.analysis.search import top_activations

    l32 = MemoryMappedActivationLoader(str(tmp_path / "f32"),
                                       "encoder.blocks.1", 2)
    l16 = MemoryMappedActivationLoader(str(tmp_path / "f16"),
                                       "encoder.blocks.1", 2)
    r32, _ = top_activations(l32, 7, 3, None, None, False,
                             return_max_per_file=True)
    r16, _ = top_activations(l16, 7, 3, None, None, False,
                             return_max_per_file=True)
    assert [r[0] for r in r32] == [r[0] for r in r16]

    # training from an fp16 store runs (loader output upcast by the trainer)
    from freud_tpu.train.trainer import SAETrainer

    tr = SAETrainer("l1", {"n_dict_components": 8, "recon_alpha": 100.0},
                    t16.shape[-1], steps=2)
    batch = np.asarray(t16[:2], np.float32)
    m = tr.train_step(batch)
    assert np.isfinite(float(m["loss"]))
