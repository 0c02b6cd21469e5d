"""Activation loaders: on-the-fly (Whisper→SAE) and memory-mapped.

Capability parity with the reference's two loaders
(src/dataset/activations.py:34-113 fly, 116-206 mmap), rebuilt for the TPU
pipeline:

* ``FlyActivationLoader`` — audio batches stream through the native decoder →
  on-device mel → layer capture → (optional) SAE encode, entirely on device.
  Encoder layers capture from one encoder forward; the reference instead runs
  a full autoregressive decode per batch to trigger its hook and bounces
  activations device→CPU→device when an SAE is attached
  (hooked_model.py:103-115, activations.py:95-101) — here the SAE encode
  consumes the captured activation without leaving the chip. ``decoder.*``
  layers run greedy decode + teacher-forced capture in the same program
  (``_fly_decode_impl``), with per-clip valid decode positions as n_frames.
* ``MemoryMappedActivationLoader`` — host-side mmap gather of shuffled batch
  indices feeding jnp arrays; length = ⌊N/batch⌋ like the reference's
  DataLoader with drop_last.

Yield contracts match the reference: dense → (activations, filenames);
L1 SAE → (latent, filenames); TopK SAE → (top_acts, top_indices, filenames).
"""

from __future__ import annotations

from functools import partial
from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import profiling
from ..constants import get_n_mels
from ..models.sae import config as sae_config
from ..models.sae import l1 as l1_mod
from ..models.sae import serialize as sae_serialize
from ..models.sae import topk as topk_mod
from ..models.whisper import WhisperRuntime
from .audio_dataset import AudioBatchPipeline
from .store import ActivationStoreReader


def decodable_mask(lengths: np.ndarray, filenames: list[str]) -> np.ndarray:
    """Per-file decode-degrade policy (shared by single- and multi-layer
    collection): lengths < 0 mark undecodable files — warn once per batch and
    return the keep mask (the reference aborts the whole run on its first
    ffmpeg failure, audio_utils.py:55-56)."""
    ok = lengths >= 0
    if not ok.all():
        bad = [f for f, good in zip(filenames, ok) if not good]
        print(f"skipping {len(bad)} undecodable file(s): {bad[:3]}…")
    return ok


def load_sae(checkpoint: str):
    """(variant, cfg, activation_size, params) from a trainer checkpoint."""
    return sae_serialize.sae_from_checkpoint(checkpoint)


def resample_padding_rows(
    x: np.ndarray,
    file_indices,
    n_frames,
    seed: int,
) -> np.ndarray:
    """Replace each file's padding rows with draws from its VALID rows.

    Decoder-layer stores are EOT-padded: row ``t >= n_frames[f]`` of file
    ``f`` is teacher-forced garbage past the position where greedy decode
    sampled EOT (see whisper/runtime.decode_capture) — often the majority of
    the (n_prompt + max_new) buffer for short transcripts. Training consumes
    full fixed-shape (B, T, d) batches (static shapes are what keep the step
    one compiled program), so instead of masking inside every loss/kernel,
    the padding rows are RESAMPLED uniformly from the file's valid rows at
    load time: each file still contributes exactly T frames (the same
    per-file weighting the encoder path has), every frame is a real decode
    position, and the entire train/val stack downstream is untouched.

    Deterministic per (seed, file index): reloading a file — any epoch, any
    host slice, any cache refresh — reproduces the identical rows, so pod
    host slicing and fused-vs-per-step streams stay bit-identical. Mutates
    and returns ``x`` (callers pass freshly-gathered batches). Files with
    ``n_frames == 0`` (undecodable audio stored as zeros) are left as-is.
    """
    t = x.shape[1]
    for row, (fi, n) in enumerate(zip(file_indices, n_frames)):
        n = int(n)
        if 0 < n < t:
            rng = np.random.default_rng((seed, int(fi)))
            x[row, n:] = x[row, rng.integers(0, n, t - n)]
    return x


def _sae_fetch_tail(acts, sae_params, variant, cfg_key, fetch_dtype):
    """Shared SAE-encode + fetch-cast tail of both collection programs."""
    if variant is None:
        outs = (acts,)
    elif variant == "l1":
        outs = (l1_mod.encode(sae_params, acts).latent,)
    else:
        cfg = sae_config.config_for_variant("topk", dict(cfg_key))
        enc = topk_mod.encode(sae_params, acts, cfg)
        outs = (enc.top_acts, enc.top_indices)
    if fetch_dtype is not None:
        # cast float outputs ON DEVICE before the host fetch: for float16
        # stores this halves device→host bytes (the e2e-dominant stage on
        # link-bound hosts) — the store would down-cast host-side anyway,
        # and both casts are IEEE round-to-nearest-even
        outs = tuple(
            o.astype(fetch_dtype)
            if jnp.issubdtype(o.dtype, jnp.floating) else o
            for o in outs
        )
    return outs


@partial(jax.jit, static_argnames=("dims", "layer_name", "variant",
                                   "cfg_key", "from_audio", "compute_dtype",
                                   "fetch_dtype"))
def _fly_encode_impl(params, sae_params, mels, *, dims, layer_name, variant,
                     cfg_key, from_audio, compute_dtype, fetch_dtype):
    """Module-level collection encode: mel (mesh mode) → encoder capture →
    optional SAE encode → optional fetch-dtype cast. Keyed on hashable
    statics so EVERY FlyActivationLoader with the same geometry shares one
    compiled executable (a per-instance closure reloads the program per
    loader — seconds apiece on remote backends, and it defeated warmup-run
    caching in bench.py)."""
    if from_audio:  # mesh mode: mel computed inside the sharded jit
        from ..audio.mel import batched_log_mel

        mels = batched_log_mel(mels, dims.n_mels)
    _, caps = encoder_forward_capture(params, dims, mels, layer_name,
                                      compute_dtype)
    return _sae_fetch_tail(caps[layer_name], sae_params, variant, cfg_key,
                           fetch_dtype)


@partial(jax.jit, static_argnames=("dims", "layer_name", "variant",
                                   "cfg_key", "from_audio", "compute_dtype",
                                   "fetch_dtype", "sot_seq", "lang_detect",
                                   "lang_base", "max_new"))
def _fly_decode_impl(params, sae_params, mels, *, dims, layer_name, variant,
                     cfg_key, from_audio, compute_dtype, fetch_dtype,
                     sot_seq, lang_detect, lang_base, max_new):
    """Decoder-layer collection program: mel (mesh mode) → greedy decode →
    teacher-forced capture (see ``whisper.runtime.decode_capture``) →
    optional SAE encode → fetch cast. Returns ``(*outs, n_valid)`` — the
    per-clip count of decode positions actually processed, which becomes the
    store's ``n_frames`` (rows beyond it are EOT-padding). Capability parity:
    the reference's hooks accept any named module incl. decoder blocks
    (hooked_model.py:47-56)."""
    from ..models.whisper.runtime import decode_capture

    if from_audio:
        from ..audio.mel import batched_log_mel

        mels = batched_log_mel(mels, dims.n_mels)
    acts, _, n_valid = decode_capture(
        params, dims, mels, layer_name, sot_seq=sot_seq,
        lang_detect=lang_detect, lang_base=lang_base, max_new=max_new,
        compute_dtype=compute_dtype,
    )
    outs = _sae_fetch_tail(acts, sae_params, variant, cfg_key, fetch_dtype)
    return (*outs, n_valid)


def encoder_forward_capture(params, dims, mels, layer_name, compute_dtype):
    from ..models.whisper.model import encoder_forward

    return encoder_forward(params, dims, mels, capture=(layer_name,),
                           compute_dtype=compute_dtype)


class FlyActivationLoader:
    """Compute Whisper (and optionally SAE) activations on the fly."""

    def __init__(
        self,
        data_path: str,
        whisper_model: str,
        sae_checkpoint: Optional[str],
        layer_name: str,
        batch_size: int,
        subset_size: Optional[int] = None,
        drop_last: bool = False,
        shuffle: bool = False,  # kept for API parity; file order is deterministic
        compute_dtype=jnp.float32,
        decode_threads: int | None = None,
        mesh=None,
        shard: tuple[int, int] | None = None,
        exclude: set | None = None,
        fetch_dtype=None,
        max_new_tokens: int = 224,
    ):
        """``mesh``: a freud_tpu data×model Mesh shards collection over the
        ``data`` axis — the batch is device_put with the file dim partitioned,
        mel+encode run as ONE sharded jit (every kernel carries a GSPMD rule,
        so each chip processes its own files, no collectives), and
        ``batch_size`` must divide by the data-axis size. Ragged tail batches
        pad to the full batch shape (one compiled program per run) and trim
        after compute. ``shard=(i, n)``: process only every n-th file
        starting at i — the multi-host split (collect_activations passes
        (process_index, process_count) so each host owns a disjoint file
        shard; merge the per-host stores with scripts/merge_stores.py)."""
        self.layer_name = layer_name
        # max_new_tokens sizes the decoder-layer capture buffer (ignored by
        # encoder layers, which never decode during collection)
        self.runtime = WhisperRuntime(whisper_model, layer_name,
                                      compute_dtype=compute_dtype,
                                      max_new_tokens=max_new_tokens)
        self.batch_size = batch_size
        # recorded so sequential-scan consumers (analysis.search) can verify
        # this loader yields the dataset completely and in order: shuffle is
        # accepted for API parity but never acts (file order stays
        # deterministic); drop_last genuinely drops the ragged tail batch
        self.shuffle = False
        self.drop_last = drop_last
        self.mesh = mesh
        if mesh is not None:
            from ..parallel import mesh as mesh_lib

            n_data = mesh.shape[mesh_lib.DATA_AXIS]
            if batch_size % n_data:
                raise ValueError(
                    f"batch_size {batch_size} not divisible by the mesh's "
                    f"data axis ({n_data})"
                )
        self.sae = None
        self.activation_type = "tensor"
        if sae_checkpoint:
            variant, cfg, act_size, params = load_sae(sae_checkpoint)
            self.sae = (variant, cfg, params)
            if variant == "topk":
                self.activation_type = "indexed"
        self.pipeline = AudioBatchPipeline(
            data_path,
            batch_size,
            get_n_mels(whisper_model),
            subset_size=subset_size,
            drop_last=drop_last,
            compute_mels=mesh is None,
            decode_threads=decode_threads,
            shard=shard,
            exclude=exclude,
        )
        if mesh is not None:
            from ..parallel import mesh as mesh_lib

            rep = mesh_lib.replicated(mesh)
            self.runtime.params = jax.device_put(self.runtime.params, rep)
            if self.sae is not None:
                variant, cfg, params = self.sae
                self.sae = (variant, cfg, jax.device_put(params, rep))
        variant = self.sae[0] if self.sae else None
        cfg_key = (tuple(sorted(self.sae[1].to_dict().items()))
                   if self.sae and variant == "topk" else ())
        self._decoder_layer = layer_name.startswith("decoder.")
        common = dict(
            dims=self.runtime.dims, layer_name=layer_name, variant=variant,
            cfg_key=cfg_key, from_audio=mesh is not None,
            compute_dtype=compute_dtype,
            fetch_dtype=None if fetch_dtype is None else jnp.dtype(fetch_dtype).type,
        )
        if self._decoder_layer:
            statics = self.runtime._decode_capture_statics()
            statics.pop("compute_dtype")  # already in common
            self._encode_jit = partial(_fly_decode_impl, **common, **statics)
        else:
            self._encode_jit = partial(_fly_encode_impl, **common)
        self.activation_shape = self._probe_shape()

    def _device_batch(self, buf):
        """Mesh mode: pad a host batch to full batch_size and device_put it
        with the file dim sharded over the data axis."""
        from ..parallel import mesh as mesh_lib

        return mesh_lib.pad_and_shard(self.mesh, buf, self.batch_size)

    def _sae_params(self):
        return self.sae[2] if self.sae else None

    def _probe_shape(self):
        """Activation shape per sample, reported like the reference
        (fly loader shape probe, src/dataset/activations.py:73-88): dense →
        (T, width); L1 → (T, n_dict); TopK → (T, n_dict) even though stored
        rows are (T, k) indexed pairs. T is 1500 encoder frames, or the
        fixed decode buffer (n_prompt + max_new) for decoder layers."""
        t = self.runtime.activation_frames
        if self.sae is None:
            return (t, self.runtime.activation_width)
        variant, cfg, params = self.sae
        n_dict = sae_config.get_n_dict_components(
            self.runtime.activation_width, cfg.expansion_factor, cfg.n_dict_components
        )
        return (t, n_dict)

    @property
    def dataset_length(self) -> int:
        return self.pipeline.dataset_length

    def __len__(self) -> int:
        return len(self.pipeline)

    def _compute(self, mels, n: int):
        if self.mesh is not None:
            mels = self._device_batch(mels)
        elif n < self.batch_size:
            # pad the ragged tail to the bucket shape (one compiled encode
            # per run — a fresh remote compile costs minutes on the
            # tunneled TPU); padded rows trim below
            mels = np.concatenate([
                np.asarray(mels),
                np.zeros((self.batch_size - n, *np.shape(mels)[1:]),
                         np.float32),
            ])
        with profiling.span("encoder_capture"):
            outs = self._encode_jit(self.runtime.params, self._sae_params(), mels)
        if n < self.batch_size:
            outs = tuple(o[:n] for o in outs)
        return outs

    def __iter__(self) -> Iterator[tuple]:
        # undecodable files (zero-filled rows, length < 0) are dropped here
        # too — training/validation must not silently consume silence-derived
        # activations under real filenames (same per-file degrade policy as
        # the collection path below)
        for *outs, filenames, _ in self.iter_with_lengths():
            yield (*outs, filenames)

    def iter_with_lengths(self) -> Iterator[tuple]:
        """Like __iter__ but also yields per-file true activation frame counts.

        Files the decoder could not read (length < 0) are dropped from the
        batch — the reference would abort the whole run on its first ffmpeg
        failure (audio_utils.py:55-56); collection here degrades per-file.

        The loop is software-pipelined one batch deep: batch k+1's encode is
        DISPATCHED (JAX async dispatch — the call returns futures) before
        batch k is yielded, so the device computes k+1 while the consumer
        blocks on k's device→host fetch and store write. Combined with the
        decode prefetch thread, all three stages (host decode / device
        compute / host fetch+write) overlap; yield order is unchanged."""
        pending = None
        for mels, filenames, lengths in self.pipeline:
            outs = self._compute(mels, len(filenames))
            if pending is not None:
                yield self._finalize(*pending)
            pending = (outs, filenames, lengths)
        if pending is not None:
            yield self._finalize(*pending)

    def _finalize(self, outs, filenames, lengths):
        ok = decodable_mask(lengths, filenames)
        if not ok.all():
            outs = tuple(np.asarray(o)[ok] for o in outs)
            filenames = [f for f, good in zip(filenames, ok) if good]
            lengths = lengths[ok]
        if self._decoder_layer:
            # decoder layers: true length is how many positions the decode
            # processed (computed on device, last element of the program's
            # outputs) — audio length says nothing about transcript length
            *outs, n_valid = outs
            return (*outs, filenames, np.asarray(n_valid, np.int64))
        from ..analysis.features import activation_length_from_samples

        n_frames = np.asarray(
            [activation_length_from_samples(int(n)) for n in lengths],
            np.int64)
        return (*outs, filenames, n_frames)


class MemoryMappedActivationLoader:
    """Batched reader over a collected activation store."""

    def __init__(
        self,
        data_path: str,
        layer_name: str,
        batch_size: int,
        subset_size: Optional[int] = None,
        shuffle: bool = False,
        drop_last: bool = False,
        seed: int = 0,
        host_bounds: Optional[tuple] = None,
        resample_padding: bool = False,
    ):
        """``resample_padding``: replace EOT-padding rows of decoder-layer
        stores with per-file-deterministic draws from the valid rows (see
        ``resample_padding_rows``) — training/validation callers enable it
        for ``decoder.*`` stores; positional consumers (search masks via
        n_frames itself) leave it off.

        ``host_bounds=(lo, hi)``: the pod input path — every process
        computes the SAME (seed, epoch)-derived global shuffle order, but
        this loader yields only rows [lo, hi) of each global batch (the
        slice this host's chips own under the mesh's data sharding; see
        parallel/mesh.py host_shard_bounds). Requires ``drop_last`` so every
        batch is full-size. Epoch/step counting stays GLOBAL: len() and
        batches_per_epoch count global batches, one per train step."""
        if host_bounds is not None:
            lo, hi = host_bounds
            if not (0 <= lo < hi <= batch_size):
                raise ValueError(f"host_bounds {host_bounds} outside the "
                                 f"global batch of {batch_size}")
            if not drop_last:
                raise ValueError(
                    "host_bounds requires drop_last=True (a ragged global "
                    "tail would misalign the per-host slices)")
        self.host_bounds = host_bounds
        self.reader = ActivationStoreReader(data_path, layer_name, subset_size)
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.activation_shape = self.reader.activation_shape
        self.activation_type = self.reader.activation_type
        self.tensor_shape = self.reader.tensor_shape
        self.dataset_length = len(self.reader)
        self.seed = seed
        self.resample_padding = bool(
            resample_padding
            and self.activation_type == "tensor"
            and self.reader.n_frames is not None
        )
        # Position state for deterministic resume: the shuffle order is a
        # pure function of (seed, epoch), so a checkpointed batch count fully
        # determines the remaining data stream (the reference gets the same
        # guarantee by pickling torch/numpy RNG states, train_sae.py:265-294).
        self.epoch = 0
        self.cursor = 0  # batches already yielded in the current epoch

    def __len__(self) -> int:
        # reference MemoryMappedActivationDataLoader.__len__ floors
        # (src/dataset/activations.py:205-206)
        return self.dataset_length // self.batch_size

    @property
    def batches_per_epoch(self) -> int:
        n, b = self.dataset_length, self.batch_size
        return n // b if self.drop_last else -(-n // b)

    def _epoch_order(self, epoch: int) -> np.ndarray:
        if not self.shuffle:
            return np.arange(self.dataset_length)
        return np.random.default_rng((self.seed, epoch)).permutation(
            self.dataset_length
        )

    def set_position(self, consumed_batches: int) -> None:
        """Jump to the state after ``consumed_batches`` total batches."""
        per = max(self.batches_per_epoch, 1)
        self.epoch = consumed_batches // per
        self.cursor = consumed_batches % per

    def __iter__(self) -> Iterator[tuple]:
        order = self._epoch_order(self.epoch)
        stop = len(self) * self.batch_size if self.drop_last else self.dataset_length
        for i in range(self.cursor * self.batch_size, stop, self.batch_size):
            idx = order[i : i + self.batch_size]
            if self.drop_last and len(idx) < self.batch_size:
                break
            # advance BEFORE yielding: if the consumer abandons the iteration
            # mid-epoch (the train loop breaking at `steps`), a later iter()
            # resumes at the next unseen batch instead of re-yielding this one
            self.cursor += 1
            if self.host_bounds is not None:
                idx = idx[self.host_bounds[0]:self.host_bounds[1]]
            with profiling.span("mmap_batch"):
                batch = self.reader.batch(idx)
            if self.resample_padding:
                # reader.batch gathers fresh arrays (fancy indexing copies
                # out of the mmap), so in-place resampling is safe
                resample_padding_rows(
                    batch[0], idx,
                    [self.reader.n_frames[i] for i in idx], self.seed)
            yield batch
        self.epoch += 1
        self.cursor = 0


def init_dataloader(
    from_disk: bool,
    data_path: str,
    whisper_model: str,
    sae_checkpoint: Optional[str],
    layer_name: str,
    batch_size: int,
    subset_size: Optional[int] = None,
    shuffle: bool = False,
    drop_last: bool = False,
    seed: int = 0,
    host_bounds: Optional[tuple] = None,
    resample_padding: bool = False,
):
    """(loader, feat_dim, dataset_len) — reference init_dataloader shape
    (src/scripts/train_sae.py:32-67). ``seed`` drives the shuffle stream
    (the reference gets this through its global torch/numpy seeding).
    ``host_bounds`` is the pod input slice (mmap loader only);
    ``resample_padding`` replaces decoder-store EOT-padding rows with valid
    ones (mmap loader — training/validation callers; fly mode handles its
    own lengths)."""
    if from_disk:
        loader = MemoryMappedActivationLoader(
            data_path, layer_name, batch_size,
            subset_size=subset_size, shuffle=shuffle, drop_last=drop_last,
            seed=seed, host_bounds=host_bounds,
            resample_padding=resample_padding,
        )
    else:
        if host_bounds is not None:
            raise ValueError(
                "host_bounds is a disk-store input path; fly-mode training "
                "has no per-host batch slicing (collect first, or train "
                "single-host)")
        loader = FlyActivationLoader(
            data_path, whisper_model, sae_checkpoint, layer_name, batch_size,
            subset_size=subset_size, drop_last=drop_last,
        )
    feat_dim = loader.activation_shape[-1]
    return loader, feat_dim, loader.dataset_length
