"""Feature-major activation index: O(one feature) search instead of full scans.

The reference's ``/top_files`` search reads the ENTIRE (files × time ×
features) store for every query (src/utils/activations.py:60-132 — at
large-v3 scale that is hundreds of GB per GUI click). Activation search is
feature-major by nature: one query touches exactly one feature column. This
module builds a one-time transposed copy ``{layer}_feature_major.npy`` with
shape (features, files, time); a query then mmap-reads a single (files, time)
plane — e.g. 60 MB instead of 23 GB for a 10k-file large-v3 store — and the
device computes the trimmed maxima in one shot.

The index is an optional acceleration: search falls back to the scan when the
file is absent, and the primary store format stays reference-compatible.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import numpy as np

from .store import ActivationStoreReader


def index_path(data_path: str | Path, layer_name: str) -> Path:
    return Path(data_path) / f"{layer_name}_feature_major.npy"


def build_feature_major_index(
    data_path: str | Path,
    layer_name: str,
    chunk_files: int = 256,
    verbose: bool = True,
) -> Path:
    """Transpose a dense store to (features, files, time), chunked by files."""
    reader = ActivationStoreReader(data_path, layer_name)
    if reader.activation_type != "tensor":
        raise ValueError("feature-major index requires a dense store")
    n = len(reader)
    t, f = reader.tensor_shape
    out_path = index_path(data_path, layer_name)
    out = np.lib.format.open_memmap(
        out_path, mode="w+", dtype=np.float32, shape=(f, n, t)
    )
    for start in range(0, n, chunk_files):
        idx = np.arange(start, min(start + chunk_files, n))
        chunk = reader.batch(idx)[0]  # (C, T, F)
        out[:, idx[0] : idx[-1] + 1, :] = np.ascontiguousarray(
            chunk.transpose(2, 0, 1)
        )
        if verbose:
            print(f"\rindexed {idx[-1] + 1}/{n} files", end="", flush=True)
    out.flush()
    del out
    if verbose:
        print()
    return out_path


class FeatureMajorReader:
    """mmap access to one feature's (files, time) activation plane."""

    def __init__(self, data_path: str | Path, layer_name: str,
                 subset_size: Optional[int] = None):
        self.mmap = np.load(index_path(data_path, layer_name), mmap_mode="r")
        self.subset_size = subset_size

    @staticmethod
    def exists(data_path: str | Path, layer_name: str) -> bool:
        return index_path(data_path, layer_name).exists()

    def feature(self, feature_idx: int) -> np.ndarray:
        plane = self.mmap[feature_idx]
        if self.subset_size is not None:
            plane = plane[: self.subset_size]
        return np.asarray(plane)
