"""Multi-layer activation collection: N capture points in ONE encoder pass.

New capability beyond the reference (BASELINE.json's "Whisper Small
multi-layer collection + per-layer SAE sweep" configuration): the reference
would run the full hooked forward once per layer; here the functional capture
API returns every requested intermediate from a single jitted encoder
forward, and the collection writer streams each layer to its own
reference-format store.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .. import profiling
from ..constants import get_n_mels
from ..models.whisper import WhisperRuntime, encoder_forward
from .audio_dataset import AudioBatchPipeline
from .loaders import decodable_mask
from .store import ActivationStoreWriter


class MultiLayerActivationLoader:
    """Yields ({layer: activations}, filenames, n_frames) per audio batch."""

    def __init__(
        self,
        data_path: str,
        whisper_model: str,
        layer_names: Sequence[str],
        batch_size: int,
        subset_size: Optional[int] = None,
        compute_dtype=None,
        mesh=None,
        shard: tuple[int, int] | None = None,
    ):
        """``mesh`` shards each batch over the data axis the same way
        ``FlyActivationLoader`` does (mel+capture in one sharded jit);
        ``shard=(i, n)`` keeps every n-th file (the multi-host split)."""
        self.layer_names = tuple(layer_names)
        bad = [n for n in self.layer_names if n.startswith("decoder.")]
        if bad:
            raise ValueError(
                f"multi-layer collection captures from ONE encoder pass; "
                f"decoder layers {bad} need a greedy decode per batch — "
                "collect them one at a time (single-layer collection "
                "supports decoder.* names)"
            )
        self.runtime = WhisperRuntime(
            whisper_model, None,
            compute_dtype=compute_dtype if compute_dtype is not None
            else jnp.float32,
        )
        self.mesh = mesh
        self.batch_size = batch_size
        dims = self.runtime.dims
        capture = self.layer_names
        if mesh is not None:
            from ..parallel import mesh as mesh_lib

            n_data = mesh.shape[mesh_lib.DATA_AXIS]
            if batch_size % n_data:
                raise ValueError(
                    f"batch_size {batch_size} not divisible by the mesh's "
                    f"data axis ({n_data})"
                )
            self.runtime.params = jax.device_put(
                self.runtime.params, mesh_lib.replicated(mesh))

        cdt = compute_dtype if compute_dtype is not None else jnp.float32

        @jax.jit
        def encode(params, mels):
            if mesh is not None:
                from ..audio.mel import batched_log_mel

                mels = batched_log_mel(mels, dims.n_mels)
            _, caps = encoder_forward(params, dims, mels, capture=capture,
                                      compute_dtype=cdt)
            return caps

        self._encode = encode
        self.pipeline = AudioBatchPipeline(
            data_path, batch_size, get_n_mels(whisper_model),
            subset_size=subset_size, compute_mels=mesh is None,
            shard=shard,
        )

    @property
    def dataset_length(self) -> int:
        return self.pipeline.dataset_length

    def __iter__(self):
        for mels, filenames, lengths in self.pipeline:
            n = len(filenames)
            if self.mesh is not None:
                from ..parallel import mesh as mesh_lib

                mels = mesh_lib.pad_and_shard(self.mesh, mels, self.batch_size)
            elif n < self.batch_size:
                # pad the ragged tail to the bucket shape — the jitted
                # encode would otherwise re-trace for the tail (a fresh
                # remote compile costs minutes on the tunneled TPU)
                mels = np.concatenate([
                    np.asarray(mels),
                    np.zeros((self.batch_size - n, *np.shape(mels)[1:]),
                             np.float32),
                ])
            with profiling.span("multilayer_capture"):
                caps = self._encode(self.runtime.params, mels)
            if n < self.batch_size:
                caps = {k: v[:n] for k, v in caps.items()}
            # per-file decode degrade (shared policy, loaders.decodable_mask):
            # drop undecodable files instead of writing their zero rows +
            # negative n_frames into every layer store
            ok = decodable_mask(lengths, filenames)
            if not ok.all():
                caps = {k: np.asarray(v)[ok] for k, v in caps.items()}
                filenames = [f for f, good in zip(filenames, ok) if good]
                lengths = lengths[ok]
            from ..analysis.features import activation_length_from_samples

            n_frames = np.asarray(
                [activation_length_from_samples(int(n)) for n in lengths],
                np.int64)
            yield caps, filenames, n_frames


def collect_multilayer(
    data_path: str,
    layer_names: Sequence[str],
    whisper_model: str,
    batch_size: int,
    out_folder: str,
    collect_max: Optional[int] = None,
    verbose: bool = True,
    data_parallel: bool = False,
    precision: str = "float32",
    build_index: bool = False,
    store_dtype: str = "float32",
) -> dict:
    """One encoder pass per batch, one reference-format store per layer.

    Under ``jax.process_count() > 1`` with ``data_parallel``, the same
    per-host strided file-shard scheme as single-layer collection applies
    (``collection_shard_setup`` — one policy for both paths): each host
    writes ``<out>/shard<i>`` stores for every layer with its local chips;
    merge each layer with scripts/merge_stores.py."""
    from ..scripts.collect_activations import collection_shard_setup

    mesh, shard, out_folder = collection_shard_setup(out_folder, data_parallel)
    compute_dtype = jnp.bfloat16 if precision == "bfloat16" else jnp.float32
    loader = MultiLayerActivationLoader(
        data_path, whisper_model, layer_names, batch_size,
        subset_size=collect_max, mesh=mesh, shard=shard,
        compute_dtype=compute_dtype,
    )
    writers: dict[str, ActivationStoreWriter] = {}
    n_files = 0
    for caps, filenames, n_frames in loader:
        for layer in loader.layer_names:
            arr = np.asarray(caps[layer])
            if layer not in writers:
                writers[layer] = ActivationStoreWriter(
                    out_folder, layer,
                    tensor_shape=arr.shape[1:], activation_shape=arr.shape[1:],
                    store_dtype=np.dtype(store_dtype),
                )
            writers[layer].append_batch(filenames, arr, n_frames=n_frames)
        n_files += len(filenames)
        if verbose:
            print(f"\rcollected {n_files}/{loader.dataset_length} files "
                  f"x {len(loader.layer_names)} layers", end="", flush=True)
    for w in writers.values():
        w.close()
    if shard is None:
        from .feature_store import (FeatureMajorReader,
                                    extend_feature_major_index)

        for layer in loader.layer_names:
            if build_index or FeatureMajorReader.exists(out_folder, layer):
                extend_feature_major_index(out_folder, layer, verbose=verbose)
    if verbose:
        print()
    return {"n_files": n_files, "layers": list(loader.layer_names)}
