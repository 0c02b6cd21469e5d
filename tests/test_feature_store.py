"""Feature-major index: build, read, and search fast-path equivalence."""

import numpy as np

from freud_tpu.analysis.search import top_activations
from freud_tpu.data.feature_store import (
    FeatureMajorReader,
    build_feature_major_index,
    index_path,
)
from freud_tpu.data.loaders import MemoryMappedActivationLoader
from freud_tpu.data.store import ActivationStoreWriter


def _make_store(tmp_path, n=14, t=12, f=6, seed=0):
    rng = np.random.default_rng(seed)
    data = rng.uniform(-2, 2, (n, t, f)).astype(np.float32)
    w = ActivationStoreWriter(tmp_path, "L", (t, f), (t, f))
    w.append_batch([f"/x/f{i}.wav" for i in range(n)], data,
                   n_frames=[t] * n)
    w.close()
    return data


def test_build_and_read(tmp_path):
    data = _make_store(tmp_path)
    build_feature_major_index(tmp_path, "L", chunk_files=5, verbose=False)
    assert index_path(tmp_path, "L").exists()
    r = FeatureMajorReader(tmp_path, "L")
    np.testing.assert_allclose(r.feature(3), data[:, :, 3])


def test_search_fast_path_matches_scan(tmp_path):
    data = _make_store(tmp_path, seed=4)
    loader = MemoryMappedActivationLoader(tmp_path, "L", batch_size=4)

    scan_results, scan_mpf = top_activations(loader, 2, 4,
                                             absolute_magnitude=True)
    build_feature_major_index(tmp_path, "L", verbose=False)
    fast_results, fast_mpf = top_activations(loader, 2, 4,
                                             absolute_magnitude=True)

    assert [r[0] for r in fast_results] == [r[0] for r in scan_results]
    for a, b in zip(fast_results, scan_results):
        np.testing.assert_allclose(a[1], b[1])
        assert a[2] == b[2] and a[3] == b[3]
    np.testing.assert_allclose(fast_mpf, scan_mpf)

    # range filter also identical
    s2, _ = top_activations(loader, 1, 10, min_val=0.5, max_val=1.5)
    import os

    os.unlink(index_path(tmp_path, "L"))
    s1, _ = top_activations(loader, 1, 10, min_val=0.5, max_val=1.5)
    assert [r[0] for r in s2] == [r[0] for r in s1]


def test_extend_appends_segment_and_search_stays_fast(tmp_path, capsys):
    """Growth path: extending after the store grew writes a .seg1 file (only
    the new rows transposed), the reader splices it, and search keeps the
    fast path — no stale-index full scan."""
    from freud_tpu.data.feature_store import (extend_feature_major_index,
                                              segment_paths)
    from freud_tpu.data.store import ActivationStoreWriter

    data = _make_store(tmp_path, n=10)
    build_feature_major_index(tmp_path, "L", verbose=False)
    # extend with nothing new: no-op
    assert extend_feature_major_index(tmp_path, "L", verbose=False) is None

    # grow the store by 6 files (rewrite with the first 10 rows unchanged —
    # what a re-run collection over a grown dataset produces)
    rng = np.random.default_rng(9)
    extra = rng.uniform(-2, 2, (6, 12, 6)).astype(np.float32)
    w = ActivationStoreWriter(tmp_path, "L", (12, 6), (12, 6))
    w.append_batch([f"/x/f{i}.wav" for i in range(10)], data,
                   n_frames=[12] * 10)
    w.append_batch([f"/x/g{i}.wav" for i in range(6)], extra,
                   n_frames=[12] * 6)
    w.close()

    seg = extend_feature_major_index(tmp_path, "L", verbose=False)
    assert seg is not None and seg.name == "L_feature_major.seg1.npy"
    assert len(segment_paths(tmp_path, "L")) == 2
    # segment holds ONLY the new rows
    assert np.load(seg, mmap_mode="r").shape == (6, 6, 12)

    full = np.concatenate([data, extra], axis=0)
    r = FeatureMajorReader(tmp_path, "L")
    assert r.n_files == 16
    np.testing.assert_allclose(r.feature(4), full[:, :, 4])

    loader = MemoryMappedActivationLoader(tmp_path, "L", batch_size=4)
    capsys.readouterr()
    fast, _ = top_activations(loader, 4, 5)
    assert "stale" not in capsys.readouterr().out
    # equivalence with the scan (index removed)
    import os

    for p in segment_paths(tmp_path, "L"):
        os.unlink(p)
    scan, _ = top_activations(loader, 4, 5)
    assert [x[0] for x in fast] == [x[0] for x in scan]
    for a, b in zip(fast, scan):
        np.testing.assert_allclose(a[1], b[1])


def _make_indexed_store(tmp_path, n=12, t=10, k=3, n_dict=16, seed=0,
                        prefix="f", writer_mode_new=True):
    rng = np.random.default_rng(seed)
    vals = rng.uniform(-2, 2, (n, t, k)).astype(np.float32)
    idx = np.stack([
        rng.choice(n_dict, size=k, replace=False) for _ in range(n * t)
    ]).reshape(n, t, k).astype(np.int64)
    w = ActivationStoreWriter(tmp_path, "L", (t, k), (t, n_dict),
                              indexed=True, overwrite=writer_mode_new)
    w.append_batch([f"/x/{prefix}{i}.wav" for i in range(n)], vals, idx,
                   n_frames=[t] * n)
    w.close()
    return vals, idx


def test_sparse_build_and_read(tmp_path):
    """The CSR index reconstructs exactly the plane the scan's
    _densify_indexed computes (sum over matching top-k slots)."""
    from freud_tpu.data.feature_store import (
        SparseFeatureMajorReader, build_sparse_feature_major_index)

    vals, idx = _make_indexed_store(tmp_path)
    build_sparse_feature_major_index(tmp_path, "L", chunk_files=5,
                                     verbose=False)
    r = SparseFeatureMajorReader(tmp_path, "L")
    assert r.n_files == 12
    for feat in (0, 7, 15):
        dense = np.where(idx == feat, vals, 0.0).sum(-1)
        np.testing.assert_allclose(r.feature(feat), dense, rtol=1e-6)


def test_sparse_search_fast_path_matches_scan(tmp_path, capsys):
    """Indexed (TopK) stores get the same O(one-plane) fast path as dense
    stores (VERDICT r3 item 9): query equality with the scan, growth via a
    CSR segment, staleness fallback on re-collection."""
    from freud_tpu.data.feature_store import (
        SparseFeatureMajorReader, build_sparse_feature_major_index,
        extend_sparse_feature_major_index, sparse_index_is_current,
        sparse_segment_groups)

    vals, idx = _make_indexed_store(tmp_path, seed=3)
    loader = MemoryMappedActivationLoader(tmp_path, "L", batch_size=4)
    scan, scan_mpf = top_activations(loader, 7, 5, absolute_magnitude=True)
    build_sparse_feature_major_index(tmp_path, "L", verbose=False)
    assert sparse_index_is_current(tmp_path, "L", 12)
    fast, fast_mpf = top_activations(loader, 7, 5, absolute_magnitude=True)
    assert [r[0] for r in fast] == [r[0] for r in scan]
    for a, b in zip(fast, scan):
        np.testing.assert_allclose(a[1], b[1], rtol=1e-6)
        assert a[2] == b[2] and a[3] == b[3]
    np.testing.assert_allclose(fast_mpf, scan_mpf)

    # growth: append 5 files, extend writes ONE new CSR segment
    vals2, idx2 = _make_indexed_store(tmp_path, n=5, seed=8, prefix="g",
                                      writer_mode_new=False)
    out = extend_sparse_feature_major_index(tmp_path, "L", verbose=False)
    assert out is not None and ".sparse1." in out.name
    assert len(sparse_segment_groups(tmp_path, "L")) == 2
    r = SparseFeatureMajorReader(tmp_path, "L")
    assert r.n_files == 17
    full_vals = np.concatenate([vals, vals2])
    full_idx = np.concatenate([idx, idx2])
    dense = np.where(full_idx == 5, full_vals, 0.0).sum(-1)
    np.testing.assert_allclose(r.feature(5), dense, rtol=1e-6)

    loader = MemoryMappedActivationLoader(tmp_path, "L", batch_size=4)
    capsys.readouterr()
    fast2, _ = top_activations(loader, 5, 6)
    assert "stale" not in capsys.readouterr().out
    for g in sparse_segment_groups(tmp_path, "L"):
        for p in g.values():
            p.unlink()
    scan2, _ = top_activations(loader, 5, 6)
    assert [x[0] for x in fast2] == [x[0] for x in scan2]
    for a, b in zip(fast2, scan2):
        np.testing.assert_allclose(a[1], b[1], rtol=1e-6)


def test_sparse_recollection_invalidates_index(tmp_path, capsys):
    from freud_tpu.data.feature_store import (
        build_sparse_feature_major_index, extend_sparse_feature_major_index,
        sparse_index_is_current, sparse_segment_groups)

    _make_indexed_store(tmp_path, seed=1)
    build_sparse_feature_major_index(tmp_path, "L", verbose=False)
    assert sparse_index_is_current(tmp_path, "L", 12)
    # same-size re-collection with different files → stale
    _make_indexed_store(tmp_path, seed=2, prefix="h")
    assert not sparse_index_is_current(tmp_path, "L", 12)
    loader = MemoryMappedActivationLoader(tmp_path, "L", batch_size=4)
    capsys.readouterr()
    res_scan, _ = top_activations(loader, 3, 4)
    assert "stale" in capsys.readouterr().out
    out = extend_sparse_feature_major_index(tmp_path, "L", verbose=False)
    assert out is not None and ".sparse0." in out.name
    assert len(sparse_segment_groups(tmp_path, "L")) == 1
    assert sparse_index_is_current(tmp_path, "L", 12)
    res_fast, _ = top_activations(loader, 3, 4)
    assert [x[0] for x in res_fast] == [x[0] for x in res_scan]


def test_recollection_invalidates_index(tmp_path, capsys):
    """A re-collection over the same out_folder (same OR different size) must
    never let the index silently serve the previous run's planes: the
    filename fingerprint mismatches, extend rebuilds, and search (before any
    rebuild) falls back to the scan."""
    from freud_tpu.data.feature_store import (extend_feature_major_index,
                                              index_is_current,
                                              segment_paths)
    from freud_tpu.data.store import ActivationStoreWriter

    _make_store(tmp_path, n=10, seed=1)
    build_feature_major_index(tmp_path, "L", verbose=False)
    assert index_is_current(tmp_path, "L", 10)

    # same-SIZE re-collection with different files
    rng = np.random.default_rng(7)
    new = rng.uniform(-2, 2, (10, 12, 6)).astype(np.float32)
    w = ActivationStoreWriter(tmp_path, "L", (12, 6), (12, 6))
    w.append_batch([f"/y/h{i}.wav" for i in range(10)], new,
                   n_frames=[12] * 10)
    w.close()
    assert not index_is_current(tmp_path, "L", 10)

    # search refuses the stale fast path
    loader = MemoryMappedActivationLoader(tmp_path, "L", batch_size=4)
    capsys.readouterr()
    res_scan, _ = top_activations(loader, 3, 4)
    assert "stale" in capsys.readouterr().out

    # the collection-flush extend path rebuilds rather than splicing
    out = extend_feature_major_index(tmp_path, "L", verbose=False)
    assert out is not None and out.name == "L_feature_major.npy"
    assert len(segment_paths(tmp_path, "L")) == 1
    assert index_is_current(tmp_path, "L", 10)
    r = FeatureMajorReader(tmp_path, "L")
    np.testing.assert_allclose(r.feature(2), new[:, :, 2])
    # fast path agrees with the scan on the NEW data
    res_fast, _ = top_activations(loader, 3, 4)
    assert [x[0] for x in res_fast] == [x[0] for x in res_scan]
    for a, b in zip(res_fast, res_scan):
        np.testing.assert_allclose(a[1], b[1])
