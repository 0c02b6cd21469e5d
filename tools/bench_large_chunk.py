"""Probe: bare fused-chunk time for the large_v1_audioset shapes.

Separates three candidate costs in the campaign's 45-75 s/100-step cycles
(tools/run_large_recipe.py; floor ≈ 14.3 s at the r3-measured 143 ms/step):
  a) the device step itself (chunked scan, no refresh, no validation)
  b) background refresh contention (refresh on vs cache-covers-store)
  c) axon backend drift (compare within THIS process only)

Run:  PYTHONPATH="/root/repo:$PYTHONPATH" python tools/bench_large_chunk.py \
          [--phase {1,2,3}]
(no --phase: chunk phases 1-2 only; phase 3 — validation interleave with the
large-v1 runtime resident — needs a FRESH process: on a 16 GB chip the
phase-1/2 caches/trainers leave too little HBM for the whisper weights.)

Measured (r5, v5e): phase 1 no-refresh 14.3 s/100-step chunk (the r3 floor
exactly); phase 2 refresh-live 14.1-14.2 s — refresh contention ZERO (the
producer-thread H2D fully overlaps). Phase 3: see ROADMAP round-5.
"""

from __future__ import annotations

import argparse
import time

import jax

import freud_tpu  # noqa: F401


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", type=int, default=0, choices=(0, 1, 2, 3))
    args = ap.parse_args()
    if args.phase == 3:
        return phase3()
    from freud_tpu.data.device_cache import DeviceShuffleCache
    from freud_tpu.train.trainer import SAETrainer

    store = "/tmp/freud_large_recipe/train"
    layer = "encoder.blocks.16"
    ae_cfg = {"expansion_factor": 16, "normalize_decoder": True, "k": 32,
              "multi_topk": False, "auxk_alpha": 0.03125,
              "dead_feature_threshold": 1e6}

    phases = [("no-refresh (cache=512=all files)", 512),
              ("refresh-live (cache=384 of 512)", 384)]
    if args.phase:
        phases = [phases[args.phase - 1]]
    for label, cap in phases:
        cache = DeviceShuffleCache(
            store, layer, capacity_files=cap, cache_dtype="bfloat16")
        d = cache.cache.shape[-1]
        trainer = SAETrainer(
            "topk", ae_cfg, activation_size=d, optimizer="adam",
            scheduler="linear", scheduler_params={"num_warmup_steps": 1000},
            lr=1e-4, steps=2500, clip_thresh=1.0, seed=0)
        # warmup/compile
        t0 = time.perf_counter()
        metrics = trainer.train_chunk(cache, batch_size=32, n_steps=100)
        _ = float(metrics["loss"][-1])
        print(f"[{label}] compile+first chunk: "
              f"{time.perf_counter() - t0:.1f} s", flush=True)
        times = []
        for _ in range(4):
            t0 = time.perf_counter()
            metrics = trainer.train_chunk(cache, batch_size=32, n_steps=100)
            _ = float(metrics["loss"][-1])
            times.append(time.perf_counter() - t0)
        per = [f"{t:.1f}" for t in times]
        print(f"[{label}] 100-step chunks: {per} s "
              f"({100 / min(times):.1f} steps/s best)", flush=True)
        cache.close()
        del trainer


def phase3():
    # the campaign condition — validation (DeviceValSet + random:large-v1
    # transcripts) interleaved between chunks, chunk time measured
    # separately from validation time
    from freud_tpu.data.device_cache import DeviceShuffleCache
    from freud_tpu.models.whisper import WhisperRuntime
    from freud_tpu.train.trainer import DeviceValSet, init_dataloader, validate
    from freud_tpu.train.trainer import SAETrainer

    store = "/tmp/freud_large_recipe/train"
    layer = "encoder.blocks.16"
    ae_cfg = {"expansion_factor": 16, "normalize_decoder": True, "k": 32,
              "multi_topk": False, "auxk_alpha": 0.03125,
              "dead_feature_threshold": 1e6}
    cache = DeviceShuffleCache(
        store, layer, capacity_files=384, cache_dtype="bfloat16")
    trainer = SAETrainer(
        "topk", ae_cfg, activation_size=1280, optimizer="adam",
        scheduler="linear", scheduler_params={"num_warmup_steps": 1000},
        lr=1e-4, steps=2500, clip_thresh=1.0, seed=0)
    rt = WhisperRuntime("random:large-v1", layer, max_new_tokens=224)

    def transcriber(mels, substitute_values=None):
        if substitute_values is None:
            return rt.transcribe(mels)
        return rt.transcribe(
            mels, substitute_layer=layer, substitute_value=substitute_values)

    val_folder = "/tmp/freud_large_recipe/val"
    val_loader, _, _ = init_dataloader(
        True, val_folder, "random:large-v1", None, layer,
        batch_size=8, shuffle=False)
    val_set = DeviceValSet(val_loader)
    metrics = trainer.train_chunk(cache, batch_size=32, n_steps=100)
    _ = float(metrics["loss"][-1])
    for it in range(4):
        t0 = time.perf_counter()
        validate(trainer, val_folder, layer, "random:large-v1", True,
                 log_base_transcripts=False, transcriber=transcriber,
                 loader=val_loader, device_set=val_set)
        t_val = time.perf_counter() - t0
        t0 = time.perf_counter()
        metrics = trainer.train_chunk(cache, batch_size=32, n_steps=100)
        _ = float(metrics["loss"][-1])
        print(f"[interleaved] val {t_val:.1f} s, "
              f"chunk {time.perf_counter() - t0:.1f} s", flush=True)
    # streamed-vs-resident at the large shapes: the same validation call
    # re-uploading the whole val store per call (DeviceValSet disabled)
    for it in range(2):
        t0 = time.perf_counter()
        validate(trainer, val_folder, layer, "random:large-v1", True,
                 log_base_transcripts=False, transcriber=transcriber,
                 loader=val_loader, device_set=None)
        print(f"[streamed] val {time.perf_counter() - t0:.1f} s", flush=True)
    cache.close()


if __name__ == "__main__":
    main()
