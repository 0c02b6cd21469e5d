"""Dataset-wide activation search (top-activating files for a feature).

Behavioral parity with the reference's ``top_activations``
(src/utils/activations.py:60-132): scan every file, trim each activation
trace to the file's true duration, rank files by (abs-)max activation with an
optional [min, max] filter, return the top-n (file, trimmed trace, max value,
max time) plus per-file maxima for the histogram.

TPU redesign of the reference's hot loop (which densifies indexed rows in
nested Python loops, reads an audio header per file, and re-sorts a Python
list per append):

* chunks of the store stream to the device; per-file trimmed max / argmax /
  signed-max are one jitted masked-reduction over the (chunk, time) block;
* true lengths come from store metadata ``n_frames`` written at collection
  time (fallback: one native header read per file, off the hot path);
* top-n selection merges per-chunk device results on the host; only the
  winning n rows are re-read for their full traces.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..audio.decode import audio_duration_s
from ..constants import TIMESTEP_S
from ..data.loaders import FlyActivationLoader, MemoryMappedActivationLoader


@jax.jit
def _dense_stats(chunk: jnp.ndarray, n_frames: jnp.ndarray, feature_idx):
    """(C, T, F) chunk → per-file stats of the feature's trace, PLUS the
    trace itself: (plain_max, plain_argmax, abs_argmax, signed_at_absmax,
    trace). Fetching the (C, T) trace with the stats (one small transfer)
    lets the host keep winners' traces without any per-row device slicing —
    an ad-hoc ``chunk[j, :, feature_idx]`` would compile a fresh remote
    program per row index.

    ``feature_idx`` is a TRACED scalar — one compiled program serves every
    feature the GUI queries (a static index would recompile per feature; a
    fresh remote compile costs minutes on the tunneled TPU)."""
    trace = jnp.take(chunk, feature_idx, axis=2)  # (C, T)
    t = jnp.arange(trace.shape[1])[None, :]
    valid = t < n_frames[:, None]
    masked = jnp.where(valid, trace, -jnp.inf)
    abs_masked = jnp.where(valid, jnp.abs(trace), -jnp.inf)
    plain_max = jnp.max(masked, axis=1)
    plain_argmax = jnp.argmax(masked, axis=1)
    abs_argmax = jnp.argmax(abs_masked, axis=1)
    signed_at_absmax = jnp.take_along_axis(trace, abs_argmax[:, None], axis=1)[:, 0]
    return plain_max, plain_argmax, abs_argmax, signed_at_absmax, trace


@jax.jit
def _dense_stats_only(chunk: jnp.ndarray, n_frames: jnp.ndarray, feature_idx):
    """``_dense_stats`` without fetching the trace output — for callers that
    already hold the plane host-side (the feature-major fast path), where
    transferring the (C, T) trace back over the ~50 MB/s tunnel link would
    waste ~1 s per 10k-file query."""
    return _dense_stats(chunk, n_frames, feature_idx)[:4]


@jax.jit
def _densify_indexed(vals: jnp.ndarray, idx: jnp.ndarray, feature_idx):
    """(C, T, k) indexed rows → (C, T) dense trace of one feature
    (``feature_idx`` traced — see ``_dense_stats``)."""
    return jnp.sum(jnp.where(idx == feature_idx, vals, 0.0), axis=-1)


def _true_lengths(loader, filenames: list[str], start: int) -> np.ndarray:
    reader = getattr(loader, "reader", None)
    if reader is not None and reader.n_frames is not None:
        return np.asarray(reader.n_frames[start : start + len(filenames)], np.int32)
    out = np.empty(len(filenames), np.int32)
    for i, f in enumerate(filenames):
        try:
            out[i] = min(int(audio_duration_s(f) / TIMESTEP_S), 1500)
        except Exception:
            out[i] = 1500
    return out


def top_activations(
    loader: MemoryMappedActivationLoader | FlyActivationLoader,
    feature_idx: int,
    n_files: int,
    max_val: Optional[float] = None,
    min_val: Optional[float] = None,
    absolute_magnitude: bool = False,
    return_max_per_file: bool = True,
    mesh=None,
):
    """Returns ([(file, trimmed_trace, max_value, max_time_s)], max_per_file).

    When a feature-major index exists next to a dense store
    (freud_tpu.data.feature_store), the query reads only that feature's
    (files, time) plane instead of scanning the whole store.

    ``mesh``: shard each chunk's file axis over the mesh's data axis —
    the per-file masked reductions are embarrassingly parallel, so XLA
    splits the scan across chips with no collectives; the host top-n merge
    is unchanged (tests/test_search.py pins sharded ≡ single-device).
    """
    n_feat = getattr(loader, "activation_shape", (None, None))[-1]
    if n_feat is not None and not (0 <= int(feature_idx) < n_feat):
        # feature_idx is TRACED in the jitted stats (no recompile per
        # feature), so an out-of-range value would silently become jnp.take's
        # fill value instead of failing at trace time — validate host-side
        # here for direct library callers (the HTTP endpoint also validates)
        raise ValueError(
            f"feature_idx {feature_idx} out of range [0, {n_feat})"
        )

    reader = getattr(loader, "reader", None)
    if reader is not None:
        # dense stores use the transposed-plane index; indexed (TopK) stores
        # the CSR-by-feature one — both serve the SAME one-plane fast path
        from ..data import feature_store as fs

        if reader.activation_type == "tensor":
            fm_cls, current = fs.FeatureMajorReader, fs.index_is_current
        else:
            fm_cls = fs.SparseFeatureMajorReader
            current = fs.sparse_index_is_current
        if fm_cls.exists(reader.data_path, reader.layer_name):
            if current(reader.data_path, reader.layer_name, len(reader)):
                fm = fm_cls(reader.data_path, reader.layer_name,
                            subset_size=len(reader))
                return _top_activations_indexed_plane(
                    loader, reader, feature_idx, n_files, max_val, min_val,
                    absolute_magnitude, return_max_per_file, mesh=mesh,
                    fm=fm,
                )
            # the store changed under the index (grown, truncated, or
            # re-collected by an external writer — the sidecar filename
            # fingerprint no longer matches): fall through to the full
            # scan; the next collection flush or
            # scripts/index_activations.py rebuilds the fast path
            print("feature-major index is stale (store changed); scanning")

    # the scan's offset/lazy-row bookkeeping assumes the loader yields the
    # store SEQUENTIALLY and COMPLETELY — a shuffled or tail-dropping loader
    # would silently attach n_frames (and re-read traces) for the WRONG files
    if getattr(loader, "shuffle", False):
        raise ValueError("top_activations requires an unshuffled loader")
    if getattr(loader, "drop_last", False):
        raise ValueError(
            "top_activations requires drop_last=False (the tail files would "
            "silently never be scanned)"
        )

    entries = []  # (value_for_ranking, file, n_frames, trace)
    max_per_file: list[float] = []
    offset = 0

    if hasattr(loader, "set_position"):
        # the server shares one loader across requests; an aborted previous
        # scan would otherwise leave its resume cursor mid-epoch and silently
        # misalign this scan's file/offset bookkeeping
        loader.set_position(0)

    # fly loaders know every file's exact frame count from the decode they
    # are already doing — iterating with lengths avoids one native header
    # read per file per query (and the silent full-length fallback on
    # unreadable headers)
    fly_lengths = (not hasattr(loader, "reader")
                   and hasattr(loader, "iter_with_lengths"))
    stream = loader.iter_with_lengths() if fly_lengths else loader

    for batch in stream:
        batch_n_frames = None
        if fly_lengths:
            *batch, filenames, batch_n_frames = batch
        else:
            *batch, filenames = batch
        if loader.activation_type == "tensor":
            (chunk,) = batch
            # fly chunks are already device arrays — don't round-trip them
            # through the host; mmap chunks upload once here
            if not isinstance(chunk, jax.Array):
                chunk = jnp.asarray(np.asarray(chunk, np.float32))
        else:
            vals, idx = batch
            trace = _densify_indexed(
                jnp.asarray(np.asarray(vals, np.float32)),
                jnp.asarray(np.asarray(idx)),
                feature_idx,
            )
            chunk = trace[:, :, None]
        if batch_n_frames is not None:
            n_frames = np.asarray(batch_n_frames, np.int32)
        else:
            n_frames = _true_lengths(loader, filenames, offset)
        offset += len(filenames)

        # pad the ragged tail chunk to the bucket shape so the whole scan is
        # ONE compiled program (a fresh remote compile costs minutes on the
        # tunneled TPU); padded rows get n_frames 0 and are sliced away
        n_valid = chunk.shape[0]
        bucket = getattr(loader, "batch_size", n_valid)
        if n_valid < bucket:
            chunk = jnp.pad(chunk, ((0, bucket - n_valid), (0, 0), (0, 0)))
            n_frames = np.pad(n_frames, (0, bucket - n_valid))
        nf_dev = jnp.asarray(n_frames)
        if mesh is not None:
            from ..parallel import mesh as mesh_lib

            chunk, nf_dev = mesh_lib.put_batch(mesh, chunk, nf_dev)

        fidx = feature_idx if loader.activation_type == "tensor" else 0
        plain_max, plain_argmax, abs_argmax, signed_at_absmax, trace_np = (
            np.asarray(a)[:n_valid]
            for a in _dense_stats(chunk, nf_dev, fidx)
        )

        for j, fname in enumerate(filenames):
            if absolute_magnitude:
                signed = float(signed_at_absmax[j])
                allowed = _passes(signed, min_val, max_val)
                value = abs(signed)
                # the reported time must locate the reported VALUE — the
                # plain (signed) argmax can sit at a different peak
                max_t = float(abs_argmax[j]) * TIMESTEP_S
            else:
                value = float(plain_max[j])
                allowed = _passes(value, min_val, max_val)
                max_t = float(plain_argmax[j]) * TIMESTEP_S
            if return_max_per_file:
                max_per_file.append(
                    float(signed_at_absmax[j]) if absolute_magnitude else value
                )
            if allowed:
                entries.append(
                    (value, fname, int(n_frames[j]), max_t,
                     trace_np[j].copy())
                )
        entries.sort(key=lambda e: e[0], reverse=True)
        entries = entries[:n_files]

    return (
        [(fname, trace[:nf], value, max_time)
         for value, fname, nf, max_time, trace in entries],
        max_per_file if return_max_per_file else None,
    )


def _top_activations_indexed_plane(
    loader, reader, feature_idx, n_files, max_val, min_val,
    absolute_magnitude, return_max_per_file, mesh=None, fm=None,
):
    """Fast path: one feature plane from the feature-major index."""
    from ..data.feature_store import FeatureMajorReader

    if fm is None:
        fm = FeatureMajorReader(
            reader.data_path, reader.layer_name, subset_size=len(reader)
        )
    plane = fm.feature(feature_idx)  # (N, T)
    filenames = reader.filenames
    if reader.n_frames is not None:
        n_frames = np.asarray(reader.n_frames, np.int32)
    else:
        n_frames = _true_lengths(loader, filenames, 0)

    n = plane.shape[0]
    chunk = jnp.asarray(plane)[:, :, None]
    nf_dev = jnp.asarray(n_frames)
    if mesh is not None:
        from ..parallel import mesh as mesh_lib

        # pad the file axis to the data-axis multiple so the plane shards
        n_data = mesh.shape[mesh_lib.DATA_AXIS]
        pad = (-n) % n_data
        if pad:
            chunk = jnp.pad(chunk, ((0, pad), (0, 0), (0, 0)))
            nf_dev = jnp.pad(nf_dev, (0, pad))
        chunk, nf_dev = mesh_lib.put_batch(mesh, chunk, nf_dev)

    plain_max, plain_argmax, abs_argmax, signed_at_absmax = (
        np.asarray(a)[:n] for a in _dense_stats_only(chunk, nf_dev, 0)
    )
    max_per_file = []
    entries = []
    for j, fname in enumerate(filenames):
        if absolute_magnitude:
            signed = float(signed_at_absmax[j])
            allowed = _passes(signed, min_val, max_val)
            value = abs(signed)
            max_t = float(abs_argmax[j]) * TIMESTEP_S
        else:
            value = float(plain_max[j])
            allowed = _passes(value, min_val, max_val)
            max_t = float(plain_argmax[j]) * TIMESTEP_S
        if return_max_per_file:
            max_per_file.append(
                float(signed_at_absmax[j]) if absolute_magnitude else value
            )
        if allowed:
            entries.append((value, fname, int(n_frames[j]), max_t, j))
    entries.sort(key=lambda e: e[0], reverse=True)
    results = [
        (fname, plane[row, :nf].copy(), value, max_time)
        for value, fname, nf, max_time, row in entries[:n_files]
    ]
    return results, (max_per_file if return_max_per_file else None)


def _passes(value: float, min_val: Optional[float], max_val: Optional[float]) -> bool:
    if max_val is not None and value > max_val:
        return False
    if min_val is not None and value < min_val:
        return False
    return True
