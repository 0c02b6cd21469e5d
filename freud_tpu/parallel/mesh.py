"""Device mesh and sharding helpers.

The reference is single-process single-device with no distributed code at all
(SURVEY.md §2 parallelism inventory); scaling here is introduced the JAX way:
one ``Mesh`` over the chips with a ``data`` axis (batch sharding for SAE
training and collection) and a ``model`` axis (dictionary/feature sharding for
very large SAEs). Collectives are never written by hand — parameters and
batches carry ``NamedSharding`` annotations and XLA inserts the
all-reduce/all-gather pattern over ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_devices: Optional[int] = None,
    model_parallel: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """A (data × model) mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if n % model_parallel:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    grid = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard axis 0 (files/batch) over the data axis, replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def dict_sharding(mesh: Mesh, axis: int, ndim: int) -> NamedSharding:
    """Shard a parameter's dictionary axis over the model axis."""
    spec = [None] * ndim
    spec[axis] = MODEL_AXIS
    return NamedSharding(mesh, P(*spec))


def pad_and_shard(mesh: Mesh, buf, batch_size: int):
    """Zero-pad a host batch's leading dim to ``batch_size`` and device_put
    it with that dim sharded over ``data`` (the collection loaders' ragged-
    tail rule: one compiled shape per run, outputs trimmed by the caller).

    device_put runs directly on the HOST array — a ``jnp.asarray`` first
    would commit the whole buffer to device 0 and then redistribute,
    doubling the host→device transfer on the collection hot path."""
    buf = np.asarray(buf)
    n = buf.shape[0]
    if n < batch_size:
        buf = np.concatenate(
            [buf, np.zeros((batch_size - n, *buf.shape[1:]), buf.dtype)],
            axis=0,
        )
    return jax.device_put(buf, batch_sharding(mesh, buf.ndim))


_warned_replicated = False


def put_batch(mesh: Mesh, *arrays, expected_tail: bool = False):
    """Device-put host arrays with batch (axis 0) sharded over ``data``.

    Batches not divisible by the data axis fall back to replicated placement
    (correct, just unsharded) rather than failing — validation tails and tiny
    smoke batches hit this. On a multi-device mesh the fallback warns ONCE
    per process unless the caller marks it expected (``expected_tail=True``):
    a misconfigured pod run (batch % n_data ≠ 0 on EVERY step) would
    otherwise train fully replicated — n× memory, zero scaling — silently.
    The trainer additionally rejects indivisible training batches outright
    (train/trainer.py:train_step)."""
    global _warned_replicated
    n_data = mesh.shape[DATA_AXIS]
    out = []
    for a in arrays:
        divisible = np.shape(a)[0] % n_data == 0
        if not divisible and n_data > 1 and not expected_tail \
                and not _warned_replicated:
            import warnings

            _warned_replicated = True
            warnings.warn(
                f"batch of {np.shape(a)[0]} is not divisible by the mesh's "
                f"data axis ({n_data}); placing it REPLICATED — correct but "
                "unsharded (no data-parallel speedup, n_data× memory). "
                "Expected for ragged validation tails; a misconfigured "
                "training batch should be made divisible.",
                stacklevel=2)
        out.append(jax.device_put(
            a,
            batch_sharding(mesh, np.ndim(a)) if divisible
            else replicated(mesh),
        ))
    out = tuple(out)
    return out if len(out) > 1 else out[0]


def divisible_batch(batch: int, mesh: Mesh) -> bool:
    return batch % mesh.shape[DATA_AXIS] == 0


def is_multiprocess(mesh: Mesh) -> bool:
    """True when the mesh spans devices owned by more than one process —
    the pod case, where host data must be assembled per-process."""
    me = jax.process_index()
    return any(d.process_index != me for d in mesh.devices.flat)


def put_host_batch(mesh: Mesh, local_batch):
    """Assemble a GLOBAL batch from this host's shard (axis 0 sharded over
    ``data``). Every process passes only the rows its own devices will hold
    (1/process_count of the global batch, contiguous, in process order);
    nothing is transferred between hosts — each host's rows go straight to
    its local chips. This is the pod training input path: the alternative
    (every host materializing the FULL global batch for ``jax.device_put``)
    multiplies host IO and memory by the process count.

    On a single-process mesh this is exactly ``put_batch`` (the local shard
    IS the global batch). Device-resident local batches (the pod device
    cache's samples) pass through WITHOUT a host round-trip."""
    if not is_multiprocess(mesh):
        return put_batch(mesh, local_batch)
    if not isinstance(local_batch, jax.Array):
        local_batch = np.asarray(local_batch)
    return jax.make_array_from_process_local_data(
        batch_sharding(mesh, local_batch.ndim), local_batch)


def chunk_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard axis 1 (batch) over ``data``, replicate the rest — the layout
    of a fused-chunk batch stack ``(n_steps, batch, ...)``: the scan slices
    axis 0, leaving each step's batch sharded exactly as ``batch_sharding``
    places a single batch."""
    return NamedSharding(mesh, P(None, DATA_AXIS, *([None] * (ndim - 2))))


def put_host_chunk(mesh: Mesh, local_stack):
    """``put_host_batch`` for a fused-chunk batch stack: assemble a GLOBAL
    ``(n_steps, global_batch, ...)`` array from this host's
    ``(n_steps, local_batch, ...)`` stack (axis 1 sharded over ``data``).
    This is the pod fused-training input path — ONE assembly per chunk
    instead of one per step; device-resident local stacks (the pod device
    cache's fused samples) pass through without a host round-trip. On a
    single-process mesh the local stack IS the global stack and divisible
    batches shard in place."""
    if not is_multiprocess(mesh):
        if not isinstance(local_stack, jax.Array):
            local_stack = np.asarray(local_stack)
        divisible = local_stack.shape[1] % mesh.shape[DATA_AXIS] == 0
        return jax.device_put(
            local_stack,
            chunk_sharding(mesh, local_stack.ndim) if divisible
            else replicated(mesh))
    if not isinstance(local_stack, jax.Array):
        local_stack = np.asarray(local_stack)
    return jax.make_array_from_process_local_data(
        chunk_sharding(mesh, local_stack.ndim), local_stack)


def host_shard_bounds(global_batch: int, mesh: Mesh) -> tuple[int, int]:
    """[lo, hi) rows of a global batch owned by THIS process under
    ``batch_sharding`` — derived from the sharding's own device→index map
    (no assumption about device enumeration order), so it is exactly the
    slice ``put_host_batch`` will place on local chips. Raises if this
    process's rows are not one contiguous range (an exotic hand-built mesh
    interleaving processes along ``data`` — feed such meshes the full batch
    via ``put_batch`` instead)."""
    pc = jax.process_count()
    if global_batch % pc:
        raise ValueError(
            f"global batch {global_batch} not divisible by process count "
            f"{pc}")
    sharding = batch_sharding(mesh, 2)
    idx = sharding.addressable_devices_indices_map((global_batch, 1))
    # a size-1 (or replicated) data axis yields slice(None) per device:
    # normalize Nones so the contiguity math below never compares them
    starts = sorted(
        (s[0].start or 0,
         global_batch if s[0].stop is None else s[0].stop)
        for s in idx.values())
    lo, hi = starts[0][0], starts[-1][1]
    covered = sorted({(a, b) for a, b in starts})
    run = covered[0][0]
    for a, b in covered:
        if a > run:
            raise ValueError(
                "this process's batch rows are not contiguous under the "
                "mesh's data axis; use put_batch with the full batch")
        run = max(run, b)
    return lo, hi
