"""Device-resident activation shuffle cache for SAE training.

The reference training loop (and a naive port) streams every batch from the
host store to the device — at tiny_l1 scale that is ~230 MB/step of
host→device traffic, an order of magnitude slower than the compiled train
step itself. This cache keeps a large window of files resident in HBM,
serves batches as on-device gathers (zero H2D on the hot path), and
continuously refreshes random slots from the host store on a background
thread — so fresh data flows in at whatever rate the link sustains while the
train step never waits.

Sampling semantics: batches are drawn uniformly from the resident window
(files recur until evicted) rather than epoch-shuffled — the standard
shuffle-buffer trade, surfaced as the ``device_cache_files`` train option.
"""

from __future__ import annotations

import queue
import threading
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .loaders import MemoryMappedActivationLoader, resample_padding_rows
from ..parallel import mesh as mesh_lib


def sample_rows_raw(cache: jnp.ndarray, key, batch: int):
    """``sample_rows`` without the f32 upcast: rows come back in the cache's
    storage dtype. The pod fused path stages a whole chunk's batches through
    host assembly — keeping them in storage dtype halves the staging bytes
    for bf16 caches; the global train program upcasts after slicing, which
    is bit-identical to upcasting here (bf16→f32 is exact)."""
    key, sub = jax.random.split(key)
    idx = jax.random.randint(sub, (batch,), 0, cache.shape[0])
    return jnp.take(cache, idx, axis=0), key


def sample_rows(cache: jnp.ndarray, key, batch: int):
    """Traceable sampling body: (batch rows as f32, advanced key). This is
    THE sampling sequence — ``_sample`` and the trainers' fused scan bodies
    (SAETrainer.train_chunk, SAESweepTrainer.train_chunk_shared) all call
    it, so the fused paths draw bit-identical streams to per-step
    ``next_batch`` structurally, not by copy-paste. A reduced-precision
    cache (cache_dtype) upcasts here — storage dtype is internal."""
    rows, key = sample_rows_raw(cache, key, batch)
    return rows.astype(jnp.float32), key


@partial(jax.jit, static_argnames=("batch",), donate_argnums=())
def _sample(cache: jnp.ndarray, key, batch: int):
    """One-dispatch sampler — the key advances INSIDE the program: a
    host-side jax.random.split would be a second device dispatch per train
    step (dispatch round-trips are the per-step floor on tunneled backends;
    the compute itself is microseconds)."""
    return sample_rows(cache, key, batch)


@partial(jax.jit, donate_argnums=(0,))
def _refresh(cache: jnp.ndarray, rows: jnp.ndarray, slots: jnp.ndarray) -> jnp.ndarray:
    # the cache is rebound to this result immediately — donating it lets XLA
    # scatter in place instead of allocating a SECOND full-cache buffer per
    # refresh (2x peak HBM at exactly the multi-GB capacities this exists for)
    return cache.at[slots].set(rows)


class DeviceShuffleCache:
    def __init__(
        self,
        data_path: str,
        layer_name: str,
        capacity_files: int,
        refresh_files: int = 16,
        seed: int = 0,
        subset_size: Optional[int] = None,
        start_step: int = 0,
        process_shard: Optional[tuple] = None,
        mesh=None,
        cache_dtype: str = "float32",
    ):
        """``start_step``: fold the resume position into the sampling PRNGs.
        The cache is a uniform sampler with timing-dependent background
        refresh — exact stream replay is impossible by construction — but a
        resumed run must at least not RE-ISSUE the start-of-run sample
        sequence it already trained on (the mmap loader path keeps exact
        data-order determinism; this path trades it for device residency).

        ``process_shard=(i, n)``: the pod mode — this host caches and
        samples only its strided file stratum (every n-th store row starting
        at i), with per-host-decorrelated PRNGs; the global batch is the
        union of per-host stratum samples (assembled by the trainer's
        host_local path). Each host's HBM, disk reads, and refresh traffic
        stay constant as the pod grows.

        ``mesh``: a multi-device mesh places the cache (and refresh rows /
        PRNG key) REPLICATED over it so the trainer's fused multi-step
        program can consume the cache directly — a single-device placement
        would mix shardings inside that jit. Single-device meshes keep the
        plain placement.

        ``cache_dtype="bfloat16"`` stores the resident window in bf16:
        2× the file capacity per byte of HBM, half the refresh upload and
        half the per-step gather traffic (the measured fused-chunk floor is
        step + gather). Samples upcast to f32 on the way out; with amp
        training (the default) the matmuls round inputs to bf16 anyway, so
        only the f32 loss targets see the rounding."""
        if cache_dtype not in ("float32", "bfloat16"):
            raise ValueError(
                f"cache_dtype must be float32 or bfloat16, got {cache_dtype}")
        self._host_dtype = np.dtype(
            np.float32 if cache_dtype == "float32" else jnp.bfloat16)
        self._put = jnp.asarray
        if mesh is not None and mesh.size > 1 and not mesh_lib.is_multiprocess(mesh):
            sharding = mesh_lib.replicated(mesh)
            self._put = lambda a: jax.device_put(a, sharding)
        self.loader = MemoryMappedActivationLoader(
            data_path, layer_name, batch_size=max(refresh_files, 1),
            subset_size=subset_size, shuffle=True, drop_last=False, seed=seed,
        )
        if self.loader.activation_type != "tensor":
            raise ValueError("device cache supports dense activation stores")
        # decoder-layer stores are EOT-padded past each file's valid decode
        # positions; the cache exists only to feed training, so padding rows
        # are always resampled from valid ones at fill/refresh time (see
        # loaders.resample_padding_rows — per-file-deterministic, so every
        # refresh of a file reproduces identical rows)
        self._resample = (layer_name.startswith("decoder.")
                          and self.loader.reader.n_frames is not None)
        self._store_seed = seed
        n_store = self.loader.dataset_length
        if process_shard is not None:
            pi, pc = process_shard
            if not (0 <= pi < pc):
                raise ValueError(f"bad process_shard {process_shard}")
            self._files = np.arange(n_store)[pi::pc]
            seed_tuple = (seed, start_step, pi)
            key_base = jax.random.fold_in(jax.random.PRNGKey(seed), pi)
        else:
            self._files = np.arange(n_store)
            seed_tuple = (seed, start_step)
            key_base = jax.random.PRNGKey(seed)
        n = len(self._files)
        if n == 0:
            raise ValueError("device cache shard holds no files")
        self.capacity = min(capacity_files, n)
        self.refresh_files = refresh_files if n > self.capacity else 0
        self._rng = np.random.default_rng(seed_tuple)
        self._key = jax.random.fold_in(key_base, start_step)

        reader = self.loader.reader
        # fill from the head of the SHUFFLE ORDER, not store order: a
        # sequentially-written store would otherwise bias early training to
        # a correlated prefix, and the refresh cursor (which starts at
        # capacity into this order) would skip a random non-resident subset
        # for a whole epoch
        self._order0 = self._rng.permutation(n)
        fill_idx = np.sort(self._files[self._order0[: self.capacity]])
        first = reader.batch(fill_idx)[0]
        first = self._resample_rows(first, fill_idx)
        self.cache = self._put(
            np.asarray(first, np.float32).astype(self._host_dtype))
        self._key = self._put(self._key)

        self._q: queue.Queue = queue.Queue(maxsize=2)
        self._stop = threading.Event()
        self._error: BaseException | None = None
        if self.refresh_files:
            self._thread = threading.Thread(target=self._producer, daemon=True)
            self._thread.start()
        else:
            self._thread = None

    def _resample_rows(self, rows: np.ndarray, file_idx: np.ndarray):
        if not self._resample:
            return rows
        nf = self.loader.reader.n_frames
        return resample_padding_rows(
            rows, file_idx, [nf[i] for i in file_idx], self._store_seed)

    def _producer(self):
        try:
            reader = self.loader.reader
            n = len(self._files)
            # continue the SAME permutation the initial fill consumed —
            # cursor starts right after the resident files
            cursor = self.capacity
            order = self._order0
            while not self._stop.is_set():
                take = []
                while len(take) < self.refresh_files:
                    if cursor >= n:
                        order = self._rng.permutation(n)
                        cursor = 0
                    take.append(order[cursor])
                    cursor += 1
                refresh_idx = self._files[np.asarray(take)]
                rows = reader.batch(refresh_idx)[0]
                rows = self._resample_rows(rows, refresh_idx)
                slots = self._rng.integers(0, self.capacity, self.refresh_files)
                # device_put HERE, on the producer thread: the H2D upload
                # (tens of MB per refresh) overlaps training instead of
                # blocking the consumer's next sample — on slow links a
                # consumer-side upload was ~1 s per application, collapsing
                # the through-cache step rate to the link rate. The queue
                # bound (2) caps in-flight device-side staging buffers.
                item = (self._put(np.asarray(rows, np.float32)
                                  .astype(self._host_dtype)),
                        self._put(slots))
                while not self._stop.is_set():
                    # retry the SAME item: dropping it on a full queue would
                    # busy-loop on wasted disk reads and skip these files'
                    # cache residency entirely
                    try:
                        self._q.put(item, timeout=0.5)
                        break
                    except queue.Full:
                        continue
        except BaseException as e:  # surface I/O errors to next_batch —
            self._error = e         # a silently dead refresher would freeze
            return                  # the shuffle window for the whole run

    def _apply_pending_refresh(self) -> None:
        if self._error is not None:
            raise RuntimeError("device-cache refresh thread died") from self._error
        if self._thread is not None:
            try:
                rows, slots = self._q.get_nowait()  # already device-resident
                self.cache = _refresh(self.cache, rows, slots)
            except queue.Empty:
                pass

    def next_batch(self, batch_size: int) -> jnp.ndarray:
        """On-device (batch, T, d) sample; applies any pending refresh first."""
        self._apply_pending_refresh()
        out, self._key = _sample(self.cache, self._key, batch_size)
        return out

    def sample_state(self):
        """(cache, key) for an externally-jitted sampler — the trainer's
        fused multi-step program draws batches INSIDE its scan with the
        same split/randint/take sequence as ``next_batch``. Applies any
        pending refresh first (refresh lands at chunk boundaries instead of
        step boundaries — the refresh stream is timing-dependent either
        way). The caller owns key advancement and must hand the advanced
        key back via ``set_key``."""
        self._apply_pending_refresh()
        return self.cache, self._key

    def set_key(self, key) -> None:
        self._key = key

    def close(self):
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=2)
