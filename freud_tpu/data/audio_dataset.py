"""Audio-folder dataset and prefetching batch pipeline.

Capability parity with the reference's ``AudioDataset`` (src/dataset/audio.py:
7-47: recursive walk for audio extensions, per-item ffmpeg decode + mel).
Redesigned as a batch pipeline for the TPU: the native decoder fills one
contiguous (B, 480000) float32 buffer per batch on a thread pool
(freud_tpu/audio/native), mels are computed on-device for the whole batch in
one jit, and a one-deep prefetch thread overlaps next-batch decode with
current-batch device compute.

Divergence (documented): file order is sorted for determinism; the reference
inherits os.walk's filesystem order.
"""

from __future__ import annotations

import os
from typing import Iterator, Optional

import jax.numpy as jnp
import numpy as np

from ..constants import N_SAMPLES, is_audio_file
from .. import profiling
from ..audio.decode import load_audio_batch
from ..audio.mel import batched_log_mel_jit


def list_audio_files(folder: str) -> list[str]:
    """Sorted audio files under ``folder`` — or ``[folder]`` itself when it
    IS a single audio file (so every data_path-taking CLI accepts one file
    the way whisper's CLI does, instead of silently matching nothing)."""
    if os.path.isfile(folder):
        return [os.path.abspath(folder)] if is_audio_file(folder) else []
    files = []
    for root, _dirs, names in os.walk(folder):
        root = os.path.abspath(root)
        for name in names:
            if is_audio_file(name):
                files.append(os.path.join(root, name))
    files.sort()
    return files


class AudioBatchPipeline:
    """Iterates (mels, filenames, true_lengths) batches over an audio folder."""

    def __init__(
        self,
        folder: str,
        batch_size: int,
        n_mels: int,
        subset_size: Optional[int] = None,
        prefetch: int = 2,
        drop_last: bool = False,
        compute_mels: bool = True,
        decode_threads: int | None = None,
        shard: tuple[int, int] | None = None,
        exclude: Optional[set] = None,
    ):
        """``shard=(i, n)`` keeps every n-th file starting at i — the
        multi-host collection split (each host walks the same sorted list,
        so the shards are disjoint and exhaustive; subset_size applies to
        the full list BEFORE sharding so hosts agree on the universe).
        ``exclude``: file paths to skip, applied AFTER subset/shard so a
        resumed run keeps the original run's universe and shard split
        (collection resume — scripts/collect_activations.py)."""
        self.files = list_audio_files(folder)
        if subset_size is not None:
            self.files = self.files[:subset_size]
        if shard is not None:
            idx, count = shard
            if not (0 <= idx < count):
                raise ValueError(f"bad shard {shard}")
            self.files = self.files[idx::count]
        if exclude:
            self.files = [f for f in self.files if f not in exclude]
        self.batch_size = batch_size
        self.n_mels = n_mels
        self.prefetch = prefetch
        self.drop_last = drop_last
        self.compute_mels = compute_mels
        self.decode_threads = decode_threads
        # shared module-level jit (one loaded executable per n_mels/shape
        # across ALL pipeline instances in the process)
        self._mel_fn = lambda a: batched_log_mel_jit(a, n_mels)

    def __len__(self) -> int:
        n = len(self.files)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    @property
    def dataset_length(self) -> int:
        return len(self.files)

    def _batches(self) -> list[list[str]]:
        out = []
        for i in range(0, len(self.files), self.batch_size):
            chunk = self.files[i : i + self.batch_size]
            if self.drop_last and len(chunk) < self.batch_size:
                break
            out.append(chunk)
        return out

    def __iter__(self) -> Iterator[tuple[jnp.ndarray, list[str], np.ndarray]]:
        from .prefetch import prefetch_iter

        def decoded():
            for chunk in self._batches():
                with profiling.span("decode_batch"):
                    buf, lengths = load_audio_batch(
                        chunk, frame_len=N_SAMPLES,
                        n_threads=self.decode_threads,
                    )
                yield buf, chunk, lengths

        # the shared cancellable prefetch handles early close and forwards
        # decode exceptions instead of hanging the consumer
        for buf, chunk, lengths in prefetch_iter(decoded(), self.prefetch):
            if self.compute_mels:
                with profiling.span("mel_batch"):
                    mels = self._mel_fn(jnp.asarray(buf))
                yield mels, chunk, lengths
            else:
                # raw (n, N_SAMPLES) host waveforms — the mesh-sharded
                # collection path computes mel+encode in one sharded jit
                yield buf, chunk, lengths
