"""Activation search and feature-analysis tests."""

import numpy as np
import pytest

from freud_tpu.analysis.features import FeatureAnalyzer, activation_length_from_samples
from freud_tpu.analysis.search import top_activations
from freud_tpu.data.loaders import MemoryMappedActivationLoader
from freud_tpu.data.store import ActivationStoreWriter


@pytest.fixture()
def dense_store(tmp_path):
    """12 files, 10 frames, 6 features, known per-file maxima for feature 2."""
    rng = np.random.default_rng(0)
    data = rng.uniform(-1, 1, (12, 10, 6)).astype(np.float32)
    # plant known values in feature 2
    for i in range(12):
        data[i, i % 10, 2] = float(i)  # file i peaks at value i
    data[11, 3, 2] = -20.0  # big negative for abs-mode checks
    w = ActivationStoreWriter(tmp_path, "L", (10, 6), (10, 6))
    w.append_batch([f"/d/f{i}.wav" for i in range(12)], data,
                   n_frames=[10] * 12)
    w.close()
    return tmp_path, data


def test_top_activations_dense(dense_store):
    path, data = dense_store
    loader = MemoryMappedActivationLoader(path, "L", batch_size=5)
    results, max_per_file = top_activations(loader, 2, 3)
    assert len(results) == 3
    files = [r[0] for r in results]
    assert files == ["/d/f11.wav", "/d/f10.wav", "/d/f9.wav"]
    assert results[0][2] == 11.0
    # trace returned trimmed to n_frames and matching the store
    np.testing.assert_allclose(results[0][1], data[11, :, 2])
    assert len(max_per_file) == 12
    assert max_per_file[10] == 10.0


def test_top_activations_absolute(dense_store):
    path, data = dense_store
    loader = MemoryMappedActivationLoader(path, "L", batch_size=4)
    results, max_per_file = top_activations(
        loader, 2, 2, absolute_magnitude=True
    )
    assert results[0][0] == "/d/f11.wav"  # |-20| wins
    assert results[0][2] == 20.0
    # max_per_file keeps signed values in abs mode (reference behavior)
    assert max_per_file[11] == -20.0


def test_top_activations_range_filter(dense_store):
    path, _ = dense_store
    loader = MemoryMappedActivationLoader(path, "L", batch_size=6)
    results, _ = top_activations(loader, 2, 10, max_val=7.0, min_val=4.0)
    vals = [r[2] for r in results]
    assert all(4.0 <= v <= 7.0 for v in vals)
    assert vals == sorted(vals, reverse=True)


def test_top_activations_trims_to_n_frames(tmp_path):
    data = np.zeros((2, 10, 3), np.float32)
    data[0, 8, 1] = 5.0  # beyond file 0's true length of 4
    data[0, 2, 1] = 1.0
    data[1, 1, 1] = 2.0
    w = ActivationStoreWriter(tmp_path, "L", (10, 3), (10, 3))
    w.append_batch(["/a0.wav", "/a1.wav"], data, n_frames=[4, 10])
    w.close()
    loader = MemoryMappedActivationLoader(tmp_path, "L", batch_size=2)
    results, _ = top_activations(loader, 1, 2)
    # the padded frame-8 spike of file 0 must not count
    assert results[0][0] == "/a1.wav" and results[0][2] == 2.0
    assert results[1][2] == 1.0
    assert len(results[1][1]) == 4  # trimmed trace


def test_top_activations_indexed(tmp_path):
    vals = np.zeros((3, 5, 2), np.float32)
    idx = np.zeros((3, 5, 2), np.int64)
    # file 1 activates feature 7 strongly at t=2
    vals[1, 2] = [4.0, 1.0]
    idx[1, 2] = [7, 3]
    vals[2, 0] = [2.5, 0.5]
    idx[2, 0] = [7, 1]
    w = ActivationStoreWriter(tmp_path, "L", (5, 2), (5, 16), indexed=True)
    w.append_batch(["/i0.wav", "/i1.wav", "/i2.wav"], vals, idx,
                   n_frames=[5, 5, 5])
    w.close()
    loader = MemoryMappedActivationLoader(tmp_path, "L", batch_size=2)
    results, mpf = top_activations(loader, 7, 2)
    assert [r[0] for r in results] == ["/i1.wav", "/i2.wav"]
    assert results[0][2] == 4.0
    np.testing.assert_allclose(results[0][1], [0, 0, 4.0, 0, 0])
    assert mpf == [0.0, 4.0, 2.5]


def test_activation_length():
    assert activation_length_from_samples(16000) == 50  # 1 s → 50 frames
    assert activation_length_from_samples(16000 * 60) == 1500  # capped


def test_feature_analyzer_top_and_manipulate():
    from freud_tpu.models.sae import L1AutoEncoderConfig, init_l1
    from freud_tpu.models.whisper import WhisperRuntime

    rt = WhisperRuntime("test:tiny", "encoder.blocks.1", max_new_tokens=3)
    cfg = L1AutoEncoderConfig(n_dict_components=32)
    sae = ("l1", cfg, init_l1(384, cfg, seed=0))
    an = FeatureAnalyzer(rt, sae)
    assert an.n_features == 32

    audio = np.random.default_rng(0).standard_normal(16000).astype(np.float32) * 0.1
    idx, traces = an.top_features_for_audio(audio, top_n=5)
    assert len(idx) == 5 and len(traces) == 5
    assert len(set(idx)) == 5  # distinct features
    true_len = activation_length_from_samples(len(audio))
    for i, tr in zip(idx, traces):
        assert tr.shape == (true_len,)
    # ranking invariant (the reference's max==value sanity assert,
    # utils/activations.py:204-206): traces arrive in descending order of
    # their per-feature maxima — misaligned trace/feature columns break this
    maxes = [float(t.max()) for t in traces]
    assert maxes == sorted(maxes, reverse=True)
    assert maxes[0] > 0

    base, manip, std, s_trace, m_trace = an.manipulate(audio, idx[0], 2.0)
    assert isinstance(manip, str) and isinstance(std, str)
    assert isinstance(base, str)  # sae present → baseline text
    np.testing.assert_allclose(m_trace, s_trace * 2.0, rtol=1e-5)
    assert s_trace.shape == (true_len,)


def test_feature_analyzer_no_sae():
    from freud_tpu.models.whisper import WhisperRuntime

    rt = WhisperRuntime("test:tiny", "encoder.blocks.0", max_new_tokens=3)
    an = FeatureAnalyzer(rt, None)
    assert an.n_features == 384
    audio = np.zeros(8000, np.float32)
    base, manip, std, s_trace, m_trace = an.manipulate(audio, 3, 0.0)
    # reference returns the unmodified-forward transcript in EVERY path,
    # SAE or not (src/utils/activations.py:241-242)
    assert isinstance(base, str) and base
    np.testing.assert_allclose(m_trace, 0.0)


def test_scan_single_compiled_shape(dense_store):
    """A non-divisible dataset (12 files, batch 5 → tail of 2) must not
    compile a second _dense_stats program: the tail chunk is padded to the
    bucket shape (a fresh remote compile costs minutes on a tunneled TPU)."""
    from freud_tpu.analysis import search as search_mod

    path, data = dense_store
    loader = MemoryMappedActivationLoader(path, "L", batch_size=5)
    search_mod._dense_stats._clear_cache()
    results, max_per_file = top_activations(loader, 2, 3)
    assert [r[0] for r in results] == ["/d/f11.wav", "/d/f10.wav", "/d/f9.wav"]
    assert len(max_per_file) == 12
    assert search_mod._dense_stats._cache_size() == 1


def test_sharded_scan_equals_single_device(dense_store):
    """8-virtual-device mesh: sharding the file axis over the data axis must
    reproduce the single-device scan exactly (VERDICT #9)."""
    import jax
    from freud_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 2:
        import pytest
        pytest.skip("needs multi-device mesh")
    path, data = dense_store
    mesh = make_mesh()

    loader = MemoryMappedActivationLoader(path, "L", batch_size=8)
    res_s, mpf_s = top_activations(loader, 2, 4, mesh=mesh)
    loader2 = MemoryMappedActivationLoader(path, "L", batch_size=8)
    res_1, mpf_1 = top_activations(loader2, 2, 4)
    assert [r[0] for r in res_s] == [r[0] for r in res_1]
    np.testing.assert_allclose(mpf_s, mpf_1)
    for a, b in zip(res_s, res_1):
        np.testing.assert_allclose(a[1], b[1])
        assert a[2] == b[2] and a[3] == b[3]


def test_sharded_indexed_plane_scan(tmp_path):
    """Feature-major fast path with a mesh: equality with the plain path."""
    import jax
    import pytest
    from freud_tpu.parallel.mesh import make_mesh
    from freud_tpu.data.feature_store import build_feature_major_index

    if len(jax.devices()) < 2:
        pytest.skip("needs multi-device mesh")
    rng = np.random.default_rng(5)
    data = rng.uniform(-1, 1, (11, 10, 6)).astype(np.float32)
    w = ActivationStoreWriter(tmp_path, "L", (10, 6), (10, 6))
    w.append_batch([f"/d/g{i}.wav" for i in range(11)], data,
                   n_frames=[10] * 11)
    w.close()
    build_feature_major_index(str(tmp_path), "L")

    mesh = make_mesh()
    loader = MemoryMappedActivationLoader(tmp_path, "L", batch_size=4)
    res_s, mpf_s = top_activations(loader, 3, 5, mesh=mesh)
    loader2 = MemoryMappedActivationLoader(tmp_path, "L", batch_size=4)
    res_1, mpf_1 = top_activations(loader2, 3, 5)
    assert [r[0] for r in res_s] == [r[0] for r in res_1]
    np.testing.assert_allclose(mpf_s, mpf_1)


def test_absolute_magnitude_time_locates_the_reported_value(tmp_path):
    """In absolute-magnitude mode max_time must point at the |max| peak —
    a signed negative spike at t_a with a weaker positive peak at t_b must
    report (|spike|, t_a), not (|spike|, t_b)."""
    import numpy as np

    from freud_tpu.data.loaders import MemoryMappedActivationLoader
    from freud_tpu.data.store import ActivationStoreWriter

    t, f = 20, 3
    data = np.zeros((2, t, f), np.float32)
    data[0, 5, 1] = -9.0   # strongest |activation| at frame 5
    data[0, 15, 1] = 4.0   # weaker positive peak at frame 15
    data[1, 2, 1] = 1.0
    w = ActivationStoreWriter(tmp_path, "L", (t, f), (t, f))
    w.append_batch(["/x/a.wav", "/x/b.wav"], data, n_frames=[t, t])
    w.close()
    loader = MemoryMappedActivationLoader(tmp_path, "L", batch_size=2)

    from freud_tpu.analysis.search import top_activations
    from freud_tpu.constants import TIMESTEP_S

    res, _ = top_activations(loader, 1, 1, absolute_magnitude=True)
    fname, trace, value, max_time = res[0]
    assert fname == "/x/a.wav" and value == 9.0
    assert abs(max_time - 5 * TIMESTEP_S) < 1e-9

    # shuffled / tail-dropping loaders are rejected (offset bookkeeping
    # assumes sequential complete iteration)
    import pytest

    bad = MemoryMappedActivationLoader(tmp_path, "L", batch_size=2,
                                       shuffle=True)
    with pytest.raises(ValueError):
        top_activations(bad, 1, 1)


def test_fly_loader_drop_last_rejected(tmp_path):
    """The sequential-scan guard must actually see FlyActivationLoader's
    drop_last: with drop_last=True the tail files would silently never be
    scanned (the guard once read a missing attribute and passed)."""
    from tests.test_store import _write_wavs
    from freud_tpu.data.loaders import FlyActivationLoader

    audio_dir = tmp_path / "audio"
    audio_dir.mkdir()
    _write_wavs(audio_dir, 3, seconds=0.2)
    loader = FlyActivationLoader(
        str(audio_dir), "test:tiny", None, "encoder.blocks.0",
        batch_size=2, drop_last=True,
    )
    with pytest.raises(ValueError, match="drop_last"):
        top_activations(loader, 0, 2)
