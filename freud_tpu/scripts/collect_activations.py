"""Activation collection CLI.

Config-schema parity with the reference (src/scripts/collect_activations.py:
139-161; configs/features/*.json keys data_path / layer_name / whisper_model /
sae_model / batch_size / device / out_folder / dl_max_workers / collect_max)
and identical output artifacts ({layer}_metadata.json + dense or indexed
``.npy`` stores). The pipeline itself is the TPU redesign: native batched
decode → on-device mel → layer capture (encoder layers: one forward, no
autoregressive decode, no host round trip before the SAE; ``decoder.*``
layers: greedy decode + teacher-forced capture, ``max_new_tokens`` sizes the
position buffer) → streamed append to the memory-mappable store. ``device`` is accepted for config compatibility and ignored — placement
is JAX's.

Usage: python -m freud_tpu.scripts.collect_activations --config cfg.json
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path
from typing import Optional

import numpy as np

from .. import profiling
from ..constants import CHUNK_LENGTH
from ..data.loaders import FlyActivationLoader
from ..data.store import ActivationStoreWriter


def collection_shard_setup(out_folder: str, data_parallel: bool):
    """(mesh, shard, out_folder) — ONE sharding policy for single- and
    multi-layer collection. Multi-host (``jax.process_count() > 1``): each
    host collects a DISJOINT strided file shard with its local chips into
    ``<out_folder>/shard<i>`` — collection is embarrassingly parallel, so
    per-host sharding scales linearly with zero cross-host traffic; merge
    with scripts/merge_stores.py afterwards."""
    import jax

    if not data_parallel:
        return None, None, out_folder
    from ..parallel.mesh import make_mesh

    if jax.process_count() > 1:
        from pathlib import Path

        shard = (jax.process_index(), jax.process_count())
        out_folder = str(Path(out_folder) / f"shard{jax.process_index()}")
        return make_mesh(devices=jax.local_devices()), shard, out_folder
    return make_mesh(), None, out_folder


def get_activations(
    data_path: str,
    layer_name: str,
    whisper_model: str,
    sae_model: Optional[str],
    batch_size: int,
    out_folder: str,
    collect_max: Optional[int] = None,
    verbose: bool = True,
    precision: str = "float32",
    dl_max_workers: int = 0,
    build_index: bool = False,
    data_parallel: bool = False,
    resume: bool = False,
    flush_every_s: float = 30.0,
    store_dtype: str = "float32",
    max_new_tokens: int = 224,
) -> dict:
    """``precision="bfloat16"`` runs the encoder in bf16 (≈1e-2 relative on
    captured activations, substantially higher throughput); the default keeps
    f32 for reference-tolerance parity. ``data_parallel`` shards every batch
    over the device mesh's data axis (one decode→mel→encoder→SAE pipeline
    per chip; batch_size must divide by the chip count).

    ``resume=True`` continues an interrupted collection: already-stored
    files (per the existing metadata) are skipped, new activations append to
    the store, and the store is flushed crash-consistently every
    ``flush_every_s`` seconds (header + metadata; a kill loses at most that
    window, and the writer reconciles any data/metadata disagreement down to
    their common prefix on reopen). Composes with multi-host shards — each
    host resumes its own ``shard<i>`` store.

    ``store_dtype="float16"`` halves store size and read IO (every in-repo
    consumer upcasts on read; see data/store.py for the reference-pipeline
    caveat)."""
    import jax.numpy as jnp

    mesh, shard, out_folder = collection_shard_setup(out_folder, data_parallel)
    compute_dtype = jnp.bfloat16 if precision == "bfloat16" else jnp.float32

    exclude = None
    if resume:
        meta_path = Path(out_folder) / f"{layer_name}_metadata.json"
        if meta_path.exists():
            with open(meta_path) as f:
                exclude = set(json.load(f).get("filenames", []))
            if verbose and exclude:
                print(f"resume: skipping {len(exclude)} already-stored files")

    loader = FlyActivationLoader(
        data_path=data_path,
        whisper_model=whisper_model,
        sae_checkpoint=sae_model,
        layer_name=layer_name,
        batch_size=batch_size,
        subset_size=collect_max,
        compute_dtype=compute_dtype,
        decode_threads=dl_max_workers if dl_max_workers > 0 else None,
        mesh=mesh,
        shard=shard,
        exclude=exclude,
        # float16 stores: cast on device so the D2H fetch moves half the
        # bytes (the dominant e2e stage on link-bound hosts; the store
        # would down-cast host-side anyway)
        fetch_dtype=np.float16 if store_dtype == "float16" else None,
        # decoder.* layers: greedy-decode buffer size (n_prompt + max_new
        # rows per file); encoder layers ignore it
        max_new_tokens=max_new_tokens,
    )

    # Write-behind store thread: the e2e stage decomposition (bench.py
    # collection_e2e) shows the consumer loop's two big host stages —
    # device→host fetch and store write — are each a large fraction of the
    # wall; serialized they ADD. A one-deep queue lets batch k write to
    # disk while batch k+1 fetches (decode already overlaps in the prefetch
    # thread, device compute under the fetch via the loader's one-ahead
    # dispatch), so the wall tracks the slowest single stage instead of the
    # sum. Crash consistency is unchanged: the writer thread owns ALL
    # writer calls including the periodic flush points.
    import queue
    import threading

    writer: Optional[ActivationStoreWriter] = None
    wq: queue.Queue = queue.Queue(maxsize=2)
    werr: list[BaseException] = []

    def _drain():
        last_flush = time.perf_counter()
        while True:
            item = wq.get()
            if item is None:
                return
            filenames, arrays, n_frames = item
            try:
                with profiling.span("store_append"):
                    writer.append_batch(filenames, *arrays, n_frames=n_frames)
                # periodic crash-consistency point (header + metadata) so
                # ANY interrupted run is resumable with at most this window
                # lost
                if time.perf_counter() - last_flush >= flush_every_s:
                    writer.flush()
                    last_flush = time.perf_counter()
            except BaseException as e:  # surface in the main loop
                werr.append(e)
                return
            finally:
                wq.task_done()

    def _safe_put(item):
        # never block forever against a dead writer thread: re-check the
        # error slot while waiting for queue room
        while True:
            if werr:
                raise werr[0]
            try:
                wq.put(item, timeout=1.0)
                return
            except queue.Full:
                continue

    wthread: Optional[threading.Thread] = None
    n_files = 0
    t0 = time.perf_counter()
    try:
        for batch in loader.iter_with_lengths():
            *arrays, filenames, n_frames = batch
            # device→host fetch: on remote/tunneled backends this is the
            # dominant e2e stage; the loader has already dispatched the NEXT
            # batch's encode, so the device stays busy underneath this
            # blocking copy
            with profiling.span("d2h_fetch"):
                arrays = [np.asarray(a) for a in arrays]
            if writer is None:
                writer = ActivationStoreWriter(
                    out_folder,
                    layer_name,
                    tensor_shape=arrays[0].shape[1:],
                    activation_shape=loader.activation_shape,
                    indexed=loader.activation_type == "indexed",
                    overwrite=not resume,
                    store_dtype=np.dtype(store_dtype),
                )
                wthread = threading.Thread(target=_drain, daemon=True)
                wthread.start()
            _safe_put((filenames, arrays, n_frames))
            n_files += len(filenames)
            if verbose:
                dt = time.perf_counter() - t0
                rtfx = n_files * CHUNK_LENGTH / max(dt, 1e-9)
                print(
                    f"\rcollected {n_files}/{loader.dataset_length} files "
                    f"({rtfx:.0f}x realtime)",
                    end="",
                    flush=True,
                )
    finally:
        if wthread is not None:
            try:
                while wthread.is_alive():
                    try:
                        wq.put(None, timeout=1.0)
                        break
                    except queue.Full:
                        continue
            finally:
                wthread.join()
    if werr:
        raise werr[0]
    if writer is not None:
        writer.close()
    if writer is not None and shard is None:
        # (per-host shard stores skip indexing — a shard index would be
        # orphaned by the merge; pass --build_index to merge_stores.py to
        # index the merged store instead)
        from ..data import feature_store as fs

        # keep an existing index current after every run (a grown store must
        # never silently degrade search to a full scan); build fresh only
        # when asked. Dense stores get the transposed-plane index, indexed
        # (TopK) stores the CSR-by-feature one.
        if writer.indexed:
            if build_index or fs.SparseFeatureMajorReader.exists(
                    out_folder, layer_name):
                fs.extend_sparse_feature_major_index(
                    out_folder, layer_name, verbose=verbose)
        elif build_index or fs.FeatureMajorReader.exists(
                out_folder, layer_name):
            fs.extend_feature_major_index(out_folder, layer_name,
                                          verbose=verbose)
    elapsed = time.perf_counter() - t0
    if verbose:
        print()
        print(profiling.report())
    return {
        "n_files": n_files,
        "elapsed_s": elapsed,
        "rtfx": n_files * CHUNK_LENGTH / max(elapsed, 1e-9),
    }


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", type=str, required=True,
                        help="Path to feature configuration file")
    parser.add_argument("--resume", action="store_true",
                        help="continue an interrupted collection: skip "
                             "already-stored files and append to the store")
    args = parser.parse_args(argv)
    with open(args.config) as f:
        config = json.load(f)
    if isinstance(config["layer_name"], list):
        if args.resume or config.get("resume"):
            raise SystemExit("--resume is not supported for multi-layer "
                             "collection yet; re-collect or collect the "
                             "missing layers individually")
        # multi-layer extension: one encoder pass, one store per layer
        from ..data.multilayer import collect_multilayer

        if config.get("sae_model"):
            raise SystemExit(
                "multi-layer collection does not support sae_model — "
                "collect raw activations per layer, then train per-layer "
                "SAEs (train/sweep.py)"
            )
        stats = collect_multilayer(
            data_path=config["data_path"],
            layer_names=config["layer_name"],
            whisper_model=config["whisper_model"],
            batch_size=config["batch_size"],
            out_folder=config["out_folder"],
            collect_max=config.get("collect_max"),
            data_parallel=bool(config.get("data_parallel", False)),
            precision=config.get("precision", "float32"),
            build_index=bool(config.get("build_index", False)),
            store_dtype=config.get("store_dtype", "float32"),
        )
        print(json.dumps(stats))
        return
    stats = get_activations(
        data_path=config["data_path"],
        layer_name=config["layer_name"],
        whisper_model=config["whisper_model"],
        sae_model=config.get("sae_model"),
        batch_size=config["batch_size"],
        out_folder=config["out_folder"],
        collect_max=config.get("collect_max"),
        precision=config.get("precision", "float32"),
        dl_max_workers=config.get("dl_max_workers", 0),
        build_index=bool(config.get("build_index", False)),
        data_parallel=bool(config.get("data_parallel", False)),
        resume=bool(args.resume or config.get("resume", False)),
        store_dtype=config.get("store_dtype", "float32"),
        max_new_tokens=int(config.get("max_new_tokens", 224)),
    )
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
