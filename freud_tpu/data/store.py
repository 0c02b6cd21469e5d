"""Memory-mappable activation store: append-grown ``.npy`` + metadata JSON.

On-disk format parity with the reference collection pipeline
(src/scripts/collect_activations.py:12-63 + src/dataset/activations.py:116-174):

  {layer}_metadata.json            {"tensor_shape", "activation_shape",
                                    "filenames": [...]}  (+ "n_frames", ours)
  {layer}_tensors.npy              dense rows, one flattened sample per row
  {layer}_activation_values.npy |  indexed (TopK) layout
  {layer}_feature_indices.npy   |

The reference appends via the npy-append-array package and rewrites the whole
metadata JSON every batch; here the writer owns a standard NPY v1 header with
padded headroom, appends batches with one contiguous write, and rewrites the
header/metadata on flush — same final bytes layout, O(batch) instead of
O(dataset) bookkeeping per step. Readers use ``np.load(mmap_mode="r")`` and
accept stores produced by either implementation.

The extra ``n_frames`` metadata (true activation length per file, from audio
duration) lets the search path skip the reference's per-file audio header
reads in its hot loop (src/utils/activations.py:19-29).
"""

from __future__ import annotations

import json
import os
import struct
from pathlib import Path
from typing import Iterable, Optional

import numpy as np

_MAGIC = b"\x93NUMPY\x01\x00"
_HEADER_SPARE = 64  # spare header padding so the shape can grow in place


def _header_bytes(shape: tuple, dtype: np.dtype, pad_to: Optional[int] = None) -> bytes:
    descr = np.lib.format.dtype_to_descr(np.dtype(dtype))
    d = f"{{'descr': {descr!r}, 'fortran_order': False, 'shape': {tuple(shape)!r}, }}"
    header = d.encode("latin1")
    base = len(_MAGIC) + 2
    total = base + len(header) + 1
    aligned = ((total + 63) // 64) * 64
    if pad_to is not None:
        if pad_to < total:
            raise ValueError("header grew beyond reserved space")
        aligned = pad_to
    header = header + b" " * (aligned - base - len(header) - 1) + b"\n"
    return _MAGIC + struct.pack("<H", len(header)) + header


class AppendableNpy:
    """A standard ``.npy`` file that supports appending along axis 0."""

    def __init__(self, path: str | Path, row_shape: tuple[int, ...], dtype):
        self.path = Path(path)
        self.row_shape = tuple(int(s) for s in row_shape)
        self.dtype = np.dtype(dtype)
        self.n_rows = 0
        if self.path.exists():
            existing = np.load(self.path, mmap_mode="r")
            if existing.shape[1:] != self.row_shape or existing.dtype != self.dtype:
                raise ValueError(
                    f"{path}: existing shape {existing.shape}/{existing.dtype} "
                    f"incompatible with rows {self.row_shape}/{self.dtype}"
                )
            self.n_rows = existing.shape[0]
            del existing
            self._header_len = self._measure_header()
            # Foreign files (np.save / npy-append-array with a tight header)
            # may lack room for the shape digits to grow; rebase ONCE at open
            # so every later flush() is an in-place header rewrite.
            fresh = _header_bytes((0, *self.row_shape), self.dtype)
            target = len(fresh) + _HEADER_SPARE
            if self._header_len < target:
                self._rebase(target)
            self._f = open(self.path, "r+b")
            # Trust the HEADER's row count, not the file size: a killed
            # writer may have written rows after its last header flush
            # (orphan bytes past the accounted region). Appending at the
            # raw file end would leave that garbage spliced between the
            # accounted rows and the new ones — truncate to the accounted
            # data end instead (crash-consistent resume).
            data_end = self._header_len + self.n_rows * (
                self.dtype.itemsize * int(np.prod(self.row_shape, dtype=np.int64))
            )
            self._f.truncate(data_end)
            self._f.seek(0, os.SEEK_END)
        else:
            self._f = open(self.path, "w+b")
            hdr = _header_bytes(
                (0, *self.row_shape), self.dtype,
            )
            # reserve spare space so future shape digits fit
            hdr = _header_bytes((0, *self.row_shape), self.dtype, pad_to=len(hdr) + _HEADER_SPARE)
            self._header_len = len(hdr)
            self._f.write(hdr)

    def _measure_header(self) -> int:
        with open(self.path, "rb") as f:
            magic = f.read(8)
            if magic != _MAGIC:
                raise ValueError(f"{self.path} is not NPY v1")
            (hlen,) = struct.unpack("<H", f.read(2))
            return 10 + hlen

    def _rebase(self, new_header_len: int) -> None:
        """Stream-copy the file with a larger padded header (one-time cost
        when adopting a store whose header was written without headroom)."""
        tmp = self.path.with_name(self.path.name + ".rebase.tmp")
        with open(self.path, "rb") as src, open(tmp, "wb") as dst:
            src.seek(self._header_len)
            dst.write(
                _header_bytes(
                    (self.n_rows, *self.row_shape), self.dtype,
                    pad_to=new_header_len,
                )
            )
            while True:
                chunk = src.read(1 << 24)
                if not chunk:
                    break
                dst.write(chunk)
        os.replace(tmp, self.path)
        self._header_len = new_header_len

    def append(self, rows: np.ndarray) -> None:
        rows = np.ascontiguousarray(rows, dtype=self.dtype)
        if rows.shape[1:] != self.row_shape:
            raise ValueError(
                f"tensor shape mismatch: expected {self.row_shape}, got {rows.shape[1:]}"
            )
        # zero-copy: write the array's buffer directly (tobytes() would
        # duplicate the whole batch — measurable at multi-GB/run store sizes)
        self._f.write(memoryview(rows).cast("B"))
        self.n_rows += rows.shape[0]

    def truncate_rows(self, n_rows: int) -> None:
        """Drop rows past ``n_rows`` (crash-recovery reconciliation)."""
        if n_rows > self.n_rows:
            raise ValueError(f"cannot grow via truncate ({n_rows} > {self.n_rows})")
        self.n_rows = int(n_rows)
        data_end = self._header_len + self.n_rows * (
            self.dtype.itemsize * int(np.prod(self.row_shape, dtype=np.int64))
        )
        self._f.truncate(data_end)
        self._f.seek(0, os.SEEK_END)
        self.flush()

    def flush(self) -> None:
        self._f.flush()
        hdr = _header_bytes(
            (self.n_rows, *self.row_shape), self.dtype, pad_to=self._header_len
        )
        pos = self._f.tell()
        self._f.seek(0)
        self._f.write(hdr)
        self._f.seek(pos)
        self._f.flush()

    def close(self) -> None:
        self.flush()
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class ActivationStoreWriter:
    """Writes one layer's activation store (dense or indexed) + metadata."""

    def __init__(
        self,
        out_folder: str | Path,
        layer_name: str,
        tensor_shape: tuple[int, ...],
        activation_shape: tuple[int, ...],
        indexed: bool = False,
        overwrite: bool = True,
        store_dtype=np.float32,
    ):
        """``store_dtype=np.float16`` halves store size and read IO; every
        in-repo consumer upcasts to f32 on read (trainer, validate, search,
        device cache), and the files stay standard NPY the reference's
        ``MemoryMappedActivationsDataset`` can open — but ITS pipeline then
        computes in torch fp16, so fp16 stores are a freud_tpu-native option
        (an opt-in divergence). Index files (int64) are unaffected."""
        self.out = Path(out_folder)
        self.out.mkdir(parents=True, exist_ok=True)
        self.layer_name = layer_name
        self.indexed = indexed
        self.tensor_shape = tuple(int(s) for s in tensor_shape)
        self.activation_shape = [int(s) for s in activation_shape]
        self.filenames: list[str] = []
        self.n_frames: list[int] = []

        self.metadata_path = self.out / f"{layer_name}_metadata.json"
        if not overwrite and self.metadata_path.exists():
            # append mode resumes the EXISTING store: the npy files gain rows
            # (AppendableNpy resumes their row count), so the metadata must
            # keep the existing filenames/n_frames or every row↔filename
            # lookup after close() would be silently misaligned
            with open(self.metadata_path) as f:
                meta = json.load(f)
            self.filenames = list(meta.get("filenames", []))
            self.n_frames = [int(n) for n in meta.get("n_frames", [])]
        store_dtype = np.dtype(store_dtype)
        if store_dtype not in (np.dtype(np.float32), np.dtype(np.float16)):
            raise ValueError(f"store_dtype must be float32|float16, got {store_dtype}")
        if indexed:
            paths = [
                self.out / f"{layer_name}_activation_values.npy",
                self.out / f"{layer_name}_feature_indices.npy",
            ]
            dtypes = [store_dtype, np.int64]
        else:
            paths = [self.out / f"{layer_name}_tensors.npy"]
            dtypes = [store_dtype]
        if overwrite:
            for p in [self.metadata_path, *paths]:
                if p.exists():
                    p.unlink()
        flat = (int(np.prod(self.tensor_shape)),)
        self.files = [AppendableNpy(p, flat, dt) for p, dt in zip(paths, dtypes)]
        if not overwrite:
            # Crash-consistent resume: a kill between a data flush and the
            # metadata write (or vice versa) leaves row counts and the
            # filename list disagreeing. The prefix they AGREE on is intact
            # — reconcile everything down to it so resumed appends stay
            # row↔filename aligned.
            n = min([len(self.filenames), *[f.n_rows for f in self.files]])
            for f in self.files:
                if f.n_rows > n:
                    f.truncate_rows(n)
            del self.filenames[n:]
            del self.n_frames[n:]

    def append_batch(
        self,
        filenames: Iterable[str],
        *arrays: np.ndarray,
        n_frames: Optional[Iterable[int]] = None,
    ) -> None:
        filenames = list(filenames)
        assert len(arrays) == len(self.files)
        for arr, f in zip(arrays, self.files):
            arr = np.asarray(arr)
            if arr.shape[0] != len(filenames):
                raise ValueError("batch size mismatch between arrays and filenames")
            if tuple(arr.shape[1:]) != self.tensor_shape:
                raise ValueError(
                    f"All tensors must share the store's tensor shape. "
                    f"Expected {self.tensor_shape}, got {arr.shape[1:]}"
                )
            f.append(arr.reshape(arr.shape[0], -1))
        self.filenames.extend(filenames)
        if n_frames is not None:
            self.n_frames.extend(int(n) for n in n_frames)
            if len(self.n_frames) != len(self.filenames):
                raise ValueError(
                    "n_frames supplied for this batch but missing for "
                    "earlier files — a partial n_frames list would be "
                    "positionally misaligned in the metadata"
                )
        elif self.n_frames:
            raise ValueError(
                "earlier batches carried n_frames but this one does not — "
                "pass n_frames for every batch or for none"
            )

    def write_metadata(self) -> None:
        meta = {
            "tensor_shape": list(self.tensor_shape),
            "activation_shape": self.activation_shape,
            "filenames": self.filenames,
        }
        if self.n_frames:
            meta["n_frames"] = self.n_frames
        # atomic replace: a kill mid-write must never leave corrupt JSON —
        # the crash-consistent resume path (flush points every 30 s) reads
        # this file back to decide what is already stored
        tmp = self.metadata_path.with_name(self.metadata_path.name + ".tmp")
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, self.metadata_path)

    def flush(self) -> None:
        for f in self.files:
            f.flush()
        self.write_metadata()

    def close(self) -> None:
        self.write_metadata()
        for f in self.files:
            f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class ActivationStoreReader:
    """Memory-mapped reader for a layer's activation store.

    Auto-detects dense vs indexed layout the same way the reference does
    (presence of ``{layer}_tensors.npy``, src/dataset/activations.py:127-143).
    """

    def __init__(self, data_path: str | Path, layer_name: str,
                 subset_size: Optional[int] = None):
        self.data_path = Path(data_path)
        self.layer_name = layer_name
        with open(self.data_path / f"{layer_name}_metadata.json") as f:
            self.metadata = json.load(f)
        tensors = self.data_path / f"{layer_name}_tensors.npy"
        if tensors.exists():
            self.activation_type = "tensor"
            self.mmaps = [np.load(tensors, mmap_mode="r")]
        else:
            self.activation_type = "indexed"
            self.mmaps = [
                np.load(self.data_path / f"{layer_name}_activation_values.npy", mmap_mode="r"),
                np.load(self.data_path / f"{layer_name}_feature_indices.npy", mmap_mode="r"),
            ]
        self.filenames: list[str] = self.metadata["filenames"]
        self.n_frames: Optional[list[int]] = self.metadata.get("n_frames")
        if subset_size is not None:
            self.filenames = self.filenames[:subset_size]
            self.mmaps = [m[:subset_size] for m in self.mmaps]
            if self.n_frames is not None:
                self.n_frames = self.n_frames[:subset_size]
        self.tensor_shape = tuple(self.metadata["tensor_shape"])
        self.activation_shape = self.metadata["activation_shape"]

    def __len__(self) -> int:
        return len(self.filenames)

    def __getitem__(self, idx: int):
        arrays = tuple(
            np.asarray(m[idx]).reshape(self.tensor_shape) for m in self.mmaps
        )
        return (*arrays, self.filenames[idx])

    def batch(self, indices: np.ndarray):
        """Gather a batch of rows → tuple of (B, *tensor_shape) arrays + names."""
        arrays = tuple(
            np.asarray(m[indices]).reshape(len(indices), *self.tensor_shape)
            for m in self.mmaps
        )
        names = [self.filenames[i] for i in indices]
        return (*arrays, names)
