"""Fused multi-step training probe: chunk-size sweep, refresh on/off,
cache dtype — the round-4 campaign record (ROADMAP.md round-4 item 11).

Measured findings (v5e via tunnel; absolute rates drift ±4-6× with backend
state — compare WITHIN one run only):

  fused-size sweep   fused=10/25/50/100 over a resident 64-file window:
                     ≥25 plateaus at the device floor ≈3.6 ms/step in the
                     healthy backend state (2 ms sample-free step + ~1.6 ms
                     in-scan 230 MB batch gather); per-step through-cache
                     was 4.8 ms in the same state.
  refresh placement  consumer-side device_put of refresh rows (37 MB/apply)
                     collapsed per-step through-cache to ~1 step/s on the
                     tunnel; producer-thread uploads (shipped) overlap
                     training: 192 steps/s with refresh live in the same
                     backend state.
  cache dtype        bfloat16 window: half the gather/upload bytes; ~10%
                     through-cache gain in-run (structurally bound by the
                     gather share of the step).

Usage: python tools/bench_fused.py  (uses a tmp synthetic store; TPU)
"""

from __future__ import annotations

import json
import shutil
import tempfile
import time

import numpy as np

import freud_tpu  # noqa: F401
from freud_tpu.data.device_cache import DeviceShuffleCache
from freud_tpu.data.store import ActivationStoreWriter
from freud_tpu.train.trainer import SAETrainer


def make_store(tmp, n_files=128, T=1500, d=384):
    rng = np.random.default_rng(0)
    w = ActivationStoreWriter(tmp, "L", (T, d), (T, d))
    for i in range(0, n_files, 16):
        n = min(16, n_files - i)
        w.append_batch([f"f{i + j}.wav" for j in range(n)],
                       rng.standard_normal((n, T, d)).astype(np.float32))
    w.close()


def make_trainer(d=384):
    return SAETrainer(
        "l1", {"n_dict_components": 200, "recon_alpha": 1e4}, d,
        optimizer="radam", scheduler="cosine", lr=4e-4, steps=100_000,
        clip_thresh=1.0)


def time_chunks(trainer, cache, batch, fused, chunks):
    m = trainer.train_chunk(cache, batch, fused)  # compile
    float(np.asarray(m["loss"])[-1])
    t0 = time.perf_counter()
    for _ in range(chunks):
        m = trainer.train_chunk(cache, batch, fused)
    float(np.asarray(m["loss"])[-1])
    dt = time.perf_counter() - t0
    return chunks * fused / dt


def main():
    batch = 100
    tmp = tempfile.mkdtemp(prefix="bench_fused_")
    try:
        make_store(tmp)
        # chunk-size sweep, refresh OFF (capacity = subset) for a clean floor
        trainer = make_trainer()
        cache = DeviceShuffleCache(tmp, "L", 64, subset_size=64)
        try:
            for fused in (10, 25, 50, 100):
                sps = time_chunks(trainer, cache, batch, fused,
                                  max(200 // fused, 2))
                print(json.dumps({"row": "fused_sweep", "fused": fused,
                                  "steps_per_sec": round(sps, 1)}))
        finally:
            cache.close()
        # refresh live (capacity < store) vs off, fused=50
        for label, cap in (("refresh_live", 64), ("refresh_off", 128)):
            trainer = make_trainer()
            cache = DeviceShuffleCache(tmp, "L", cap)
            try:
                sps = time_chunks(trainer, cache, batch, 50, 4)
                print(json.dumps({"row": label,
                                  "steps_per_sec": round(sps, 1)}))
            finally:
                cache.close()
        # cache dtype, fused=50
        for dt in ("float32", "bfloat16"):
            trainer = make_trainer()
            cache = DeviceShuffleCache(tmp, "L", 64, subset_size=64,
                                       cache_dtype=dt)
            try:
                sps = time_chunks(trainer, cache, batch, 50, 4)
                print(json.dumps({"row": "cache_dtype", "dtype": dt,
                                  "steps_per_sec": round(sps, 1)}))
            finally:
                cache.close()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
