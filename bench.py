"""Benchmark: the headline metrics (BASELINE.json), with MFU accounting.

1. Whisper-tiny block-2 activation-collection throughput, as RTFx (audio
   seconds processed per wall second) of the on-device pipeline
   (mel → encoder → capture). North-star target: ≥100× realtime per chip.
2. END-TO-END collection RTFx: disk → native decode → H2D → mel → encoder →
   D2H → store write, measured steady-state over a synthetic on-disk WAV
   corpus (compile excluded via a warmup run), with a stage decomposition
   (profiling spans) so the gap to the device-only number is explained.
3. tiny_l1 SAE training steps/sec/chip (batch 100 × 1500 × 384, n_dict 200,
   RAdam + cosine — the configs/train/tiny_l1.json recipe) + the other three
   recipe rows.
4. Serving: batched greedy transcription, calibrated — generated-token
   counts recorded, tokens/sec reported, and a fixed-budget
   (early-exit-disabled) row for cross-round comparability.

Every row carries ``mfu_pct``: analytic matmul FLOPs (freud_tpu/flops.py —
the machine-checkable form of the tools/ floor decompositions) against the
chip's MXU peak. Rows whose floor is VPU- or HBM-bound (tiny_topk bisection,
serving decode) read low by construction; that gap IS the documented floor.

Prints ONE JSON line:
  {"metric", "value", "unit", "vs_baseline", ...extra}
vs_baseline is RTFx / 100 (the north-star target; the reference publishes no
numbers of its own — BASELINE.md).

Random weights are used (identical FLOPs/memory traffic to pretrained; no
network in this environment). Run with no JAX_PLATFORMS override to use the
TPU.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import time
import wave
from pathlib import Path

import numpy as np

import freud_tpu  # noqa: F401  (platform/compile-cache setup)
from freud_tpu import flops as flops_mod
from freud_tpu import profiling
import jax
import jax.numpy as jnp


def _mfu(total_flops: float, elapsed_s: float):
    v = flops_mod.mfu_pct(total_flops, elapsed_s)
    return None if v is None else round(v, 1)


def bench_collection(
    batch: int = 128, iters: int = 8, warmup: int = 2, dtype=jnp.float32
) -> dict:
    from freud_tpu.audio.mel import batched_log_mel
    from freud_tpu.models.whisper import dims_for, encoder_forward, init_params

    dims = dims_for("tiny")
    params = init_params(dims, seed=0)
    layer = "encoder.blocks.2"

    # The pipeline returns the activations PLUS an in-jit checksum scalar;
    # fetching the checksum forces execution without a separate slice program
    # (block_until_ready is unreliable on tunneled backends) and without
    # pulling the full activation tensor over the measurement path.
    @jax.jit
    def pipeline(params, audio):
        mels = batched_log_mel(audio, dims.n_mels)
        _, caps = encoder_forward(
            params, dims, mels, capture=(layer,), compute_dtype=dtype
        )
        acts = caps[layer]
        return acts, jnp.sum(acts[:, 0, 0].astype(jnp.float32))

    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((batch, 480_000)).astype(np.float32) * 0.1)

    for _ in range(warmup):
        float(pipeline(params, audio)[1])
    t0 = time.perf_counter()
    for _ in range(iters):
        _, checksum = pipeline(params, audio)
    float(checksum)  # device executes in order; last checksum ⇒ all done
    elapsed = time.perf_counter() - t0
    audio_seconds = batch * iters * 30.0
    return {
        "rtfx": audio_seconds / elapsed,
        "files_per_sec": batch * iters / elapsed,
        "elapsed_s": elapsed,
        "batch": batch,
        "mfu_pct": _mfu(
            batch * iters * flops_mod.encoder_flops(dims), elapsed),
    }


# -- end-to-end collection (disk → store) ------------------------------------

def _ensure_corpus(n_files: int, seed: int = 0) -> str:
    """One-time synthetic on-disk WAV corpus (16 kHz mono int16, durations
    cycling 5–15 s, LibriSpeech-like mean ≈ 10 s). Cached under
    ~/.cache/freud_tpu; rebuilt only if the file count changes."""
    root = Path.home() / ".cache" / "freud_tpu" / "bench_corpus_v1"
    marker = root / ".complete"
    if marker.exists() and marker.read_text().strip() == str(n_files):
        return str(root)
    shutil.rmtree(root, ignore_errors=True)
    root.mkdir(parents=True)
    rng = np.random.default_rng(seed)
    sr = 16_000
    for i in range(n_files):
        dur = 5.0 + 10.0 * ((i * 37) % 101) / 100.0  # 5..15 s, scattered
        n = int(sr * dur)
        # band-limited-ish noise: cheap to generate, non-trivial to decode
        x = rng.standard_normal(n).astype(np.float32)
        x = np.clip(x * 0.15, -1.0, 1.0)
        pcm = (x * 32767.0).astype("<i2")
        with wave.open(str(root / f"clip_{i:05d}.wav"), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(sr)
            w.writeframes(pcm.tobytes())
    marker.write_text(str(n_files))
    return str(root)


def bench_collection_e2e(batch: int = 64, n_files: int = 1024,
                         store_dtype: str = "float32") -> dict:
    """Steady-state disk→store collection RTFx over the synthetic corpus
    (the reference hot loop: src/scripts/collect_activations.py:118-127).
    A warmup run over one batch excludes compile; the stage decomposition
    comes from the profiling spans. Span semantics under the pipelined
    loader (data/loaders.py iter_with_lengths): ``encoder_capture`` is
    DISPATCH time only (JAX async dispatch); device compute hides under
    ``d2h_fetch``, which blocks on the previous batch's result — on
    tunneled/remote backends that stage is dominated by link bandwidth,
    on directly-attached hosts by the device itself."""
    from freud_tpu.scripts.collect_activations import get_activations

    corpus = _ensure_corpus(n_files)
    layer = "encoder.blocks.2"
    tmp = tempfile.mkdtemp(prefix="freud_bench_e2e_")
    try:
        # warmup: compiles the full-batch encode + mel programs (the timed
        # run re-traces but hits the persistent compile cache)
        get_activations(corpus, layer, "random:tiny", None, batch,
                        os.path.join(tmp, "warm"), collect_max=batch,
                        verbose=False, store_dtype=store_dtype)
        profiling.reset()
        stats = get_activations(corpus, layer, "random:tiny", None, batch,
                                os.path.join(tmp, "run"), verbose=False,
                                store_dtype=store_dtype)
        spans = profiling.stats()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    from freud_tpu.models.whisper import dims_for

    stage = {k: round(v["total_s"], 2) for k, v in spans.items()}
    return {
        "rtfx": stats["rtfx"],
        "files_per_sec": stats["n_files"] / stats["elapsed_s"],
        "elapsed_s": stats["elapsed_s"],
        "n_files": stats["n_files"],
        "batch": batch,
        "stages_s": stage,
        "mfu_pct": _mfu(
            stats["n_files"] * flops_mod.encoder_flops(dims_for("tiny")),
            stats["elapsed_s"]),
    }


def _bench_train(variant: str, cfg: dict, d_in: int, batch: int,
                 optimizer: str, scheduler: str, iters: int, warmup: int,
                 scheduler_params=None, lr: float = 1e-4,
                 steps: int = 100_000) -> dict:
    """One trainer recipe's steps/s. All timing goes through this single
    helper so the axon-backend discipline (force a scalar computed IN the
    jit — block_until_ready is a no-op on tunneled backends) lives in one
    place."""
    from freud_tpu.train.trainer import SAETrainer

    trainer = SAETrainer(
        variant, cfg, d_in,
        optimizer=optimizer, scheduler=scheduler,
        scheduler_params=scheduler_params, lr=lr, steps=steps,
        clip_thresh=1.0,
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, 1500, d_in)).astype(np.float32))
    state = (trainer.params, trainer.opt_state, trainer.num_frames_since_fired)
    for _ in range(warmup):
        *state, m = trainer._train_step(*state, x)
    float(m["loss"])  # force (in-order device execution)
    t0 = time.perf_counter()
    for _ in range(iters):
        *state, m = trainer._train_step(*state, x)
    float(m["loss"])
    elapsed = time.perf_counter() - t0
    rows = batch * 1500
    n_dict = trainer.n_dict_components
    if variant == "l1":
        step_flops = flops_mod.sae_l1_step_flops(rows, d_in, n_dict)
    else:
        step_flops = flops_mod.sae_topk_step_flops(rows, d_in, n_dict)
    return {
        "steps_per_sec": iters / elapsed,
        "elapsed_s": elapsed,
        "batch": batch,
        "final_loss": float(m["loss"]),
        "mfu_pct": _mfu(iters * step_flops, elapsed),
    }


def bench_sae_train(batch: int = 100, iters: int = 200, warmup: int = 5) -> dict:
    """tiny_l1 recipe (configs/train/tiny_l1.json)."""
    return _bench_train(
        "l1", {"n_dict_components": 200, "recon_alpha": 1e4}, 384, batch,
        "radam", "cosine", iters, warmup, lr=4e-4,
    )


def bench_sae_train_cached(batch: int = 100, chunks: int = 5,
                           fused: int = 100, warmup: int = 2,
                           n_files: int = 128, capacity: int = 64,
                           cache_dtype: str = "float32") -> dict:
    """tiny_l1 recipe through the PRODUCTION input path: a device shuffle
    cache over a real on-disk store, sampled + stepped inside the fused
    multi-step program (SAETrainer.train_chunk — one dispatch per ``fused``
    steps, background refresh live; ``fused=100`` is what the tiny_l1
    recipe's auto chunk picks: gcd(save_every, val_every)). The per-step
    through-cache rate is reported alongside: the delta is host-dispatch
    overhead, which the fused program amortizes away (measured round 4:
    fused≥25 plateaus at the device floor ≈3.6 ms/step — the 2 ms sample-
    free step plus the in-scan 230 MB batch gather; per-step through-cache
    was 148-210 steps/s across backend-drift states)."""
    from freud_tpu.data.device_cache import DeviceShuffleCache
    from freud_tpu.data.store import ActivationStoreWriter
    from freud_tpu.train.trainer import SAETrainer

    d_in, T = 384, 1500
    tmp = tempfile.mkdtemp(prefix="freud_bench_cache_")
    try:
        rng = np.random.default_rng(0)
        w = ActivationStoreWriter(tmp, "encoder.blocks.2", (T, d_in), (T, d_in))
        for i in range(0, n_files, 16):
            n = min(16, n_files - i)
            w.append_batch(
                [f"f{i + j}.wav" for j in range(n)],
                rng.standard_normal((n, T, d_in)).astype(np.float32))
        w.close()

        trainer = SAETrainer(
            "l1", {"n_dict_components": 200, "recon_alpha": 1e4}, d_in,
            optimizer="radam", scheduler="cosine", lr=4e-4, steps=100_000,
            clip_thresh=1.0,
        )
        cache = DeviceShuffleCache(tmp, "encoder.blocks.2", capacity,
                                   cache_dtype=cache_dtype)
        try:
            m = trainer.train_chunk(cache, batch, fused)  # compile
            for _ in range(max(warmup - 1, 0)):
                m = trainer.train_chunk(cache, batch, fused)
            float(np.asarray(m["loss"])[-1])
            t0 = time.perf_counter()
            for _ in range(chunks):
                m = trainer.train_chunk(cache, batch, fused)
            float(np.asarray(m["loss"])[-1])
            fused_elapsed = time.perf_counter() - t0
            # per-step comparison over the same number of steps
            for _ in range(fused):  # warm the sample+step dispatch pair
                trainer.train_step(cache.next_batch(batch))
            t0 = time.perf_counter()
            for _ in range(chunks * fused):
                m = trainer.train_step(cache.next_batch(batch))
            float(m["loss"])
            step_elapsed = time.perf_counter() - t0
        finally:
            cache.close()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    n_steps = chunks * fused
    step_flops = flops_mod.sae_l1_step_flops(batch * T, d_in,
                                             trainer.n_dict_components)
    return {
        "steps_per_sec_fused": n_steps / fused_elapsed,
        "steps_per_sec_per_step": n_steps / step_elapsed,
        "fused": fused,
        "mfu_pct": _mfu(n_steps * step_flops, fused_elapsed),
    }


def bench_large_topk_cached(batch: int = 32, chunks: int = 3,
                            fused: int = 100, n_files: int = 64,
                            capacity: int = 48) -> dict:
    """large_v1_audioset through the PRODUCTION input path: d=1280,
    n_dict=20480, k=32, bf16 device shuffle cache (the documented
    production configuration), fused 100-step chunks, background refresh
    LIVE (capacity < store). This is the row the round-4 campaign left
    unevidenced: the r5 decomposition (tools/bench_large_chunk.py) measured
    the bare chunk at 14.1-14.3 s/100 steps — the r3 per-step floor
    exactly — with refresh contention ZERO; the campaign's 45-75 s cycles
    were validation (~6.5 s steady-state per val_every=100 cycle) plus
    first-compile amortization and cross-run backend drift."""
    from freud_tpu.data.device_cache import DeviceShuffleCache
    from freud_tpu.data.store import ActivationStoreWriter
    from freud_tpu.train.trainer import SAETrainer

    d_in, T = 1280, 1500
    tmp = tempfile.mkdtemp(prefix="freud_bench_lcache_")
    try:
        rng = np.random.default_rng(0)
        w = ActivationStoreWriter(tmp, "encoder.blocks.16", (T, d_in),
                                  (T, d_in), store_dtype="float16")
        for i in range(0, n_files, 8):
            n = min(8, n_files - i)
            w.append_batch(
                [f"f{i + j}.wav" for j in range(n)],
                rng.standard_normal((n, T, d_in)).astype(np.float32))
        w.close()

        trainer = SAETrainer(
            "topk",
            {"expansion_factor": 16, "normalize_decoder": True, "k": 32,
             "multi_topk": False, "auxk_alpha": 0.03125,
             "dead_feature_threshold": 1e6},
            d_in, optimizer="adam", scheduler="linear",
            scheduler_params={"num_warmup_steps": 1000}, lr=1e-4,
            steps=25_000, clip_thresh=1.0,
        )
        cache = DeviceShuffleCache(tmp, "encoder.blocks.16", capacity,
                                   cache_dtype="bfloat16")
        try:
            m = trainer.train_chunk(cache, batch, fused)  # compile
            float(np.asarray(m["loss"])[-1])
            t0 = time.perf_counter()
            for _ in range(chunks):
                m = trainer.train_chunk(cache, batch, fused)
            float(np.asarray(m["loss"])[-1])
            elapsed = time.perf_counter() - t0
        finally:
            cache.close()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    n_steps = chunks * fused
    step_flops = flops_mod.sae_topk_step_flops(batch * T, d_in,
                                               trainer.n_dict_components)
    return {
        "steps_per_sec_fused": n_steps / elapsed,
        "fused": fused,
        "mfu_pct": _mfu(n_steps * step_flops, elapsed),
    }


def bench_link(mb: int = 32) -> dict:
    """Self-calibration of the host↔device link (VERDICT r4 weak-3): one
    timed raw-bytes D2H fetch + a scalar round-trip. The e2e collection row
    is link-bound on tunneled backends and its RTFx drifts 4-6× across
    runs with the tunnel's state — carrying the measured link bandwidth in
    the same JSON gives every round's e2e number its own drift context."""
    n = mb * (1 << 20) // 4

    @jax.jit
    def make(x):
        return x * 2.0, jnp.sum(x)

    arr, s = make(jnp.arange(n, dtype=jnp.float32))
    float(s)  # force execution so the fetch below times ONLY the transfer
    t0 = time.perf_counter()
    np.asarray(arr)
    d2h_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(5):
        float(make(jnp.zeros((8,), jnp.float32))[1])
    rtt_s = (time.perf_counter() - t0) / 5
    return {"d2h_mbps": mb / d2h_s, "rtt_ms": rtt_s * 1e3}


def bench_topk_train(batch: int = 50, iters: int = 60, warmup: int = 3) -> dict:
    """tiny_topk recipe: expansion 16 (dict 6144), k 32, AuxK live."""
    return _bench_train(
        "topk",
        {"expansion_factor": 16, "k": 32, "auxk_alpha": 0.03125,
         "dead_feature_threshold": 1e6},
        384, batch, "adam", "linear", iters, warmup,
        scheduler_params={"num_warmup_steps": 1000},
    )


def bench_large_topk_train(batch: int = 32, iters: int = 30, warmup: int = 3) -> dict:
    """large_v1_audioset recipe (configs/train/large_v1_audioset.json:1-34):
    d=1280, expansion 16 (n_dict 20480), k 32, AuxK live, adam+linear,
    batch 32 files. n_dict·d here exceeds the fused kernel's resident-weight
    VMEM gate, so this exercises the threshold-kernel formulation."""
    return _bench_train(
        "topk",
        {"expansion_factor": 16, "k": 32, "auxk_alpha": 0.03125,
         "dead_feature_threshold": 1e6},
        1280, batch, "adam", "linear", iters, warmup,
        scheduler_params={"num_warmup_steps": 1000}, steps=25_000,
    )


def bench_large_l1_train(batch: int = 16, iters: int = 30, warmup: int = 3) -> dict:
    """large_v3_l1 recipe (configs/train/large_v3_l1.json:1-27): d=1280,
    expansion 16 (n_dict 20480), recon_alpha 1e4, radam+cosine, batch 16."""
    return _bench_train(
        "l1", {"expansion_factor": 16, "recon_alpha": 1e4}, 1280, batch,
        "radam", "cosine", iters, warmup, steps=25_000,
    )


def bench_search(n_files: int = 1024, batch: int = 64, d: int = 384,
                 T: int = 1500) -> dict:
    """Analytics/search surface (VERDICT r4 weak-2): speed evidence for the
    north star's "activation search runs as an on-device top-k scan".

    (a) full-store scan: ``top_activations`` (the /top_files core,
        server/app.py routes the endpoint straight to it) over a
        1024-file dense f16 store with NO feature-major index — chunks
        stream to the device, one jitted masked-reduction per chunk.
        Link-bound on tunneled backends (the whole store crosses H2D);
        reported as RTFx of audio-seconds covered per wall second.
    (b) dense plane query: the same query through the transposed
        feature-major index (data/feature_store.py) — reads ONE
        (files, time) plane (~6 MB here) instead of the full store.
    (c) sparse (TopK CSR) plane query over an indexed store.
    Correctness for all three paths is pinned by tests/test_search.py;
    these are the latency/throughput numbers."""
    from freud_tpu.analysis.search import top_activations
    from freud_tpu.data import feature_store as fs
    from freud_tpu.data.loaders import MemoryMappedActivationLoader
    from freud_tpu.data.store import ActivationStoreWriter

    layer = "encoder.blocks.2"
    rng = np.random.default_rng(0)
    out: dict = {}
    tmp = tempfile.mkdtemp(prefix="freud_bench_search_")
    try:
        w = ActivationStoreWriter(tmp, layer, (T, d), (T, d),
                                  store_dtype="float16")
        for i in range(0, n_files, 32):
            n = min(32, n_files - i)
            w.append_batch([f"f{i + j}.wav" for j in range(n)],
                           rng.standard_normal((n, T, d)).astype(np.float32),
                           n_frames=[T] * n)
        w.close()
        loader = MemoryMappedActivationLoader(
            tmp, layer, batch, shuffle=False, drop_last=False)
        top_activations(loader, 5, 10)  # compile warmup
        t0 = time.perf_counter()
        top_activations(loader, 7, 10)
        scan_s = time.perf_counter() - t0
        out["scan_s"] = round(scan_s, 3)
        out["scan_rtfx"] = round(n_files * 30.0 / scan_s, 1)
        out["scan_files"] = n_files

        fs.build_feature_major_index(tmp, layer, verbose=False)
        top_activations(loader, 5, 10)  # plane-path warmup
        t0 = time.perf_counter()
        top_activations(loader, 9, 10)
        out["plane_query_s"] = round(time.perf_counter() - t0, 3)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    k, n_dict, n_sparse = 32, 6144, 512
    tmp = tempfile.mkdtemp(prefix="freud_bench_sparse_")
    try:
        w = ActivationStoreWriter(tmp, layer, (T, k), (T, n_dict),
                                  indexed=True, store_dtype="float16")
        for i in range(0, n_sparse, 32):
            n = min(32, n_sparse - i)
            w.append_batch(
                [f"f{i + j}.wav" for j in range(n)],
                rng.standard_normal((n, T, k)).astype(np.float32),
                rng.integers(0, n_dict, (n, T, k)),
                n_frames=[T] * n)
        w.close()
        fs.build_sparse_feature_major_index(tmp, layer, verbose=False)
        loader = MemoryMappedActivationLoader(
            tmp, layer, batch, shuffle=False, drop_last=False)
        top_activations(loader, 5, 10)  # warmup
        t0 = time.perf_counter()
        top_activations(loader, 9, 10)
        out["sparse_plane_query_s"] = round(time.perf_counter() - t0, 3)
        out["sparse_files"] = n_sparse
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def bench_server_analytics() -> dict:
    """End-to-end latency of the serving analytics endpoints THROUGH
    server/app.py (VERDICT r4 weak-2 c/d): a live threaded HTTP server over
    a real collected store (random:tiny), timing steady-state (post-compile)
    GET /top_files, POST /top_features and POST /manipulate_feature —
    upload parsing, decode, mel, whisper capture, SAE-less raw-channel
    analytics, transcript decodes and JSON serialization all included."""
    import io
    import threading
    import urllib.request
    from freud_tpu.scripts.collect_activations import get_activations
    from freud_tpu.server.app import GuiState, create_server

    tmp = tempfile.mkdtemp(prefix="freud_bench_srv_")
    out: dict = {}
    server = None
    try:
        audio_dir = Path(tmp) / "audio"
        audio_dir.mkdir()
        rng = np.random.default_rng(0)
        sr = 16_000
        for i in range(8):
            x = np.clip(rng.standard_normal(sr * 5) * 0.15, -1, 1)
            with wave.open(str(audio_dir / f"c{i}.wav"), "wb") as wv:
                wv.setnchannels(1)
                wv.setsampwidth(2)
                wv.setframerate(sr)
                wv.writeframes((x * 32767.0).astype("<i2").tobytes())
        store = Path(tmp) / "acts"
        get_activations(
            data_path=str(audio_dir), layer_name="encoder.blocks.2",
            whisper_model="random:tiny", sae_model=None, batch_size=8,
            out_folder=str(store), verbose=False)
        state = GuiState(
            {"whisper_model": "random:tiny", "sae_model": None,
             "layer_name": "encoder.blocks.2", "batch_size": 8,
             "data_path": str(audio_dir), "out_folder": str(store),
             "dl_max_workers": 0},
            from_disk=True)
        server = create_server(state, host="127.0.0.1", port=0)
        port = server.server_address[1]
        threading.Thread(target=server.serve_forever, daemon=True).start()
        base = f"http://127.0.0.1:{port}"

        buf = io.BytesIO()
        with wave.open(buf, "wb") as wv:
            wv.setnchannels(1)
            wv.setsampwidth(2)
            wv.setframerate(sr)
            wv.writeframes((np.clip(
                rng.standard_normal(sr * 5) * 0.15, -1, 1)
                * 32767.0).astype("<i2").tobytes())
        wav_bytes = buf.getvalue()

        def get(path):
            with urllib.request.urlopen(base + path, timeout=1200) as r:
                return r.read()

        def post(path):
            boundary = "benchboundary42"
            body = (
                f"--{boundary}\r\n"
                'Content-Disposition: form-data; name="audio"; '
                'filename="u.wav"\r\n'
                "Content-Type: audio/wav\r\n\r\n"
            ).encode() + wav_bytes + f"\r\n--{boundary}--\r\n".encode()
            req = urllib.request.Request(
                base + path, data=body,
                headers={"Content-Type":
                         f"multipart/form-data; boundary={boundary}"})
            with urllib.request.urlopen(req, timeout=1200) as r:
                return r.read()

        for name, fn in (
            ("top_files", lambda: get("/top_files?feature_idx=5&n_files=5")),
            ("top_features", lambda: post("/top_features?top_n=16")),
            ("manipulate_feature",
             lambda: post("/manipulate_feature?feat_idx=3"
                          "&manipulation_factor=1.5")),
        ):
            fn()  # compile/warmup call
            t0 = time.perf_counter()
            for _ in range(3):
                fn()
            out[f"{name}_s"] = round((time.perf_counter() - t0) / 3, 3)
    finally:
        if server is not None:
            server.shutdown()
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def bench_serving(batch: int = 8, max_new: int = 224, iters: int = 5,
                  warmup: int = 2, early_exit: bool = True,
                  eot_steer: bool = False) -> dict:
    """Batched greedy transcription serving RTFx (tiny, bf16 decode, the
    tools/bench_transcribe.py headline configuration). Calibrated: the
    generated-token counts are recorded (the decode's own n_text statistic),
    tokens/sec is reported, and ``early_exit=False`` gives the fixed-budget
    row — decode cost there is budget-determined, so the number is
    comparable across rounds and against real-weights runs later.
    ``eot_steer`` biases the final-LN toward the EOT embedding so every
    decode terminates after ~2 real-compute steps — the machine-checkable
    proof that the while_loop early exit fires on-chip (random weights never
    emit EOT, so the default rows run the full budget; real speech exits
    early like the steered row)."""
    from freud_tpu.models.whisper import dims_for, encoder_forward, init_params
    from freud_tpu.models.whisper.decoding import sample_decode
    from freud_tpu.models.whisper.tokenizer import special_tokens

    dims = dims_for("tiny")
    params = init_params(dims, seed=0)
    st = special_tokens(dims.n_vocab)
    if eot_steer:
        emb = np.asarray(params["decoder"]["tok_emb"])
        eot_dir = emb[st.eot] / (np.linalg.norm(emb[st.eot]) + 1e-9)
        dec = dict(params["decoder"])
        dec["ln"] = dict(dec["ln"], b=jnp.asarray(
            np.asarray(dec["ln"]["b"]) + 40.0 * eot_dir))
        params = {**params, "decoder": dec}
    rng = np.random.default_rng(0)
    mels = jnp.asarray(
        rng.standard_normal((batch, dims.n_mels, 3000)).astype(np.float32) * 0.3)

    @jax.jit
    def pipeline(params, mels):
        encoded, _ = encoder_forward(
            params, dims, mels, compute_dtype=jnp.bfloat16)
        seq = st.sot_sequence(lang_index=0, timestamps=True)
        prompt = jnp.tile(jnp.asarray(seq, jnp.int32)[None], (batch, 1))
        tokens, sum_lp, n_text, _ = sample_decode(
            params, dims, encoded, prompt, len(seq), max_new=max_new,
            compute_dtype=jnp.bfloat16, early_exit=early_exit)
        checksum = jnp.sum(tokens[:, -1].astype(jnp.float32)) + jnp.sum(sum_lp)
        return checksum, jnp.sum(n_text), jnp.max(n_text)

    for _ in range(warmup):
        float(pipeline(params, mels)[0])
    # token counts are deterministic (greedy): fetch once, outside the loop
    _, total_text, max_text = pipeline(params, mels)
    total_text, max_text = int(total_text), int(max_text)
    t0 = time.perf_counter()
    for _ in range(iters):
        out, _, _ = pipeline(params, mels)
    float(out)
    dt = (time.perf_counter() - t0) / iters
    # steps actually executed by the while_loop: every sequence computes
    # every step until the LAST one finishes (or the budget, fixed mode)
    steps_executed = max_new if not early_exit else min(max_text + 1, max_new)
    exec_flops = flops_mod.decode_flops(
        dims, n_clips=batch, tokens_per_clip=steps_executed,
        mean_pos=steps_executed / 2.0 + 3)
    return {
        "rtfx": batch * 30.0 / dt,
        "clips_per_sec": batch / dt,
        "tokens_per_sec": (total_text + batch) / dt,  # text + EOT per clip
        "mean_tokens": total_text / batch,
        "steps_executed": steps_executed,
        "mfu_pct": _mfu(exec_flops, dt),
    }


def main():
    backend = jax.default_backend()
    coll = bench_collection()
    coll_bf16 = bench_collection(dtype=jnp.bfloat16)
    sae = bench_sae_train()
    topk = bench_topk_train()
    large_topk = bench_large_topk_train()
    large_l1 = bench_large_l1_train()
    extras: dict = {}
    try:
        serving = bench_serving()
        extras["serving_transcribe_rtfx_bf16"] = round(serving["rtfx"], 1)
        extras["serving_tokens_per_sec"] = round(serving["tokens_per_sec"], 1)
        extras["serving_mean_tokens"] = round(serving["mean_tokens"], 1)
        extras["serving_mfu_pct"] = serving["mfu_pct"]
        fixed = bench_serving(early_exit=False)
        extras["serving_fixed_budget_rtfx"] = round(fixed["rtfx"], 1)
        extras["serving_fixed_budget_tokens_per_sec"] = round(
            fixed["tokens_per_sec"], 1)
        # steered-EOT demo: proves the while_loop exit fires on-chip
        # (mean_tokens collapses to ~1, rtfx jumps orders of magnitude)
        demo = bench_serving(eot_steer=True)
        extras["serving_early_exit_demo_rtfx"] = round(demo["rtfx"], 1)
        extras["serving_early_exit_demo_mean_tokens"] = round(
            demo["mean_tokens"], 1)
    except Exception:  # the headline metrics must never die on the extra rows
        pass
    try:
        # bf16 cache window is the documented production configuration
        # (docs/SCALING.md): headline cached row runs it; the f32 row stays
        # for comparison
        cached16 = bench_sae_train_cached(cache_dtype="bfloat16")
        extras["tiny_l1_cached_fused_steps_per_sec"] = round(
            cached16["steps_per_sec_fused"], 2)
        extras["tiny_l1_cached_per_step_steps_per_sec"] = round(
            cached16["steps_per_sec_per_step"], 2)
        extras["tiny_l1_cached_fused_chunk"] = cached16["fused"]
        extras["tiny_l1_cached_mfu_pct"] = cached16["mfu_pct"]
        extras["tiny_l1_cached_dtype"] = "bfloat16"
        cached = bench_sae_train_cached()
        extras["tiny_l1_cached_fused_f32_steps_per_sec"] = round(
            cached["steps_per_sec_fused"], 2)
    except Exception:
        pass
    try:
        lcached = bench_large_topk_cached()
        extras["large_v1_topk_cached_fused_steps_per_sec"] = round(
            lcached["steps_per_sec_fused"], 2)
        extras["large_v1_topk_cached_mfu_pct"] = lcached["mfu_pct"]
    except Exception:
        pass
    try:
        search = bench_search()
        extras["search_scan_rtfx"] = search["scan_rtfx"]
        extras["search_scan_s"] = search["scan_s"]
        extras["search_scan_files"] = search["scan_files"]
        extras["search_plane_query_s"] = search["plane_query_s"]
        extras["search_sparse_plane_query_s"] = search["sparse_plane_query_s"]
    except Exception:
        pass
    try:
        srv = bench_server_analytics()
        extras["server_top_files_s"] = srv["top_files_s"]
        extras["server_top_features_s"] = srv["top_features_s"]
        extras["server_manipulate_feature_s"] = srv["manipulate_feature_s"]
    except Exception:
        pass
    try:
        link = bench_link()
        extras["link_d2h_mbps"] = round(link["d2h_mbps"], 1)
        extras["link_rtt_ms"] = round(link["rtt_ms"], 1)
    except Exception:
        pass
    try:
        e2e = bench_collection_e2e()
        extras["collection_rtfx_e2e"] = round(e2e["rtfx"], 1)
        extras["collection_e2e_files_per_sec"] = round(e2e["files_per_sec"], 2)
        extras["collection_e2e_mfu_pct"] = e2e["mfu_pct"]
        extras["collection_e2e_stages_s"] = e2e["stages_s"]
        extras["collection_e2e_wall_s"] = round(e2e["elapsed_s"], 2)
        # float16 stores halve the two link/disk-bound stages (device-side
        # cast before the fetch + half the store bytes)
        e2e16 = bench_collection_e2e(store_dtype="float16")
        extras["collection_rtfx_e2e_f16"] = round(e2e16["rtfx"], 1)
        extras["collection_e2e_f16_stages_s"] = e2e16["stages_s"]
    except Exception:
        pass
    result = {
        "metric": "whisper_tiny_block2_collection_rtfx",
        "value": round(coll["rtfx"], 1),
        "unit": "x_realtime_per_chip",
        "vs_baseline": round(coll["rtfx"] / 100.0, 3),
        "tiny_l1_steps_per_sec": round(sae["steps_per_sec"], 2),
        "tiny_topk_steps_per_sec": round(topk["steps_per_sec"], 2),
        "large_v1_topk_steps_per_sec": round(large_topk["steps_per_sec"], 2),
        "large_v3_l1_steps_per_sec": round(large_l1["steps_per_sec"], 2),
        "collection_files_per_sec": round(coll["files_per_sec"], 2),
        "collection_rtfx_bf16": round(coll_bf16["rtfx"], 1),
        "collection_mfu_pct": coll["mfu_pct"],
        "collection_bf16_mfu_pct": coll_bf16["mfu_pct"],
        "tiny_l1_mfu_pct": sae["mfu_pct"],
        "tiny_topk_mfu_pct": topk["mfu_pct"],
        "large_v1_topk_mfu_pct": large_topk["mfu_pct"],
        "large_v3_l1_mfu_pct": large_l1["mfu_pct"],
        "backend": backend,
        **extras,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
