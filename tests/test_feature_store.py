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
