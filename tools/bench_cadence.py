"""Production-cadence training overheads: validation, logging, cache path.

bench.py's train rows time the bare jitted step; the reference's REAL
cadences (val_every=100, log_tb_every=10, save_every=1000 —
/root/reference/configs/train/tiny_l1.json:22-24) exercise the host loop
around it. Running the full 100k-step tiny_l1 recipe end-to-end exposed
three costs this probe reproduces (fix records in ROADMAP.md §production-
cadence):

  validate     per-call wall of trainer.validate over a 200-file store.
               Was 44 s (every batch fetched the full (B, T, d) sae_out
               reconstruction over the ~50 MB/s tunneled link); 13 s after
               the selective fetch — the rest is the store's own H2D.
  logfetch     50 steps with a metric fetch every 10: the batched
               device_get vs the old per-key float() loop (one blocking
               round-trip per metric).
  lr           current_lr x10: pure-Python .host schedule mirror (≈0) vs
               eagerly executing the optax schedule (~0.3 s/call of
               op-by-op remote dispatch).
  cachestep    steps/s through DeviceShuffleCache.next_batch + train step
               (one fused sample+key-advance dispatch; was two).

Usage: PYTHONPATH=$REPO python tools/bench_cadence.py --store DIR --layer L
(defaults assume a tiny_l1-shaped store, e.g. the bench harness's).
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

import freud_tpu  # noqa: F401
import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--store", default="/tmp/tinyl1/acts")
    ap.add_argument("--layer", default="encoder.blocks.2")
    ap.add_argument("--d", type=int, default=384)
    args = ap.parse_args()

    from freud_tpu.train.trainer import SAETrainer, validate

    tr = SAETrainer("l1", {"n_dict_components": 200, "recon_alpha": 1e4},
                    args.d, optimizer="radam", scheduler="cosine", lr=4e-4,
                    steps=100_000, clip_thresh=1.0)
    out = {}

    # validate: steady-state per-call wall (2nd call, post-compile)
    for i in range(2):
        t0 = time.perf_counter()
        validate(tr, args.store, args.layer, "random:tiny", True, False)
        out["validate_s"] = round(time.perf_counter() - t0, 2)
    print(json.dumps(out), flush=True)

    # logfetch: 50 steps, metric fetch every 10 (batched vs per-key)
    rng = np.random.default_rng(0)
    x = jax.device_put(rng.standard_normal((100, 1500, args.d)).astype(np.float32))
    state = (tr.params, tr.opt_state, tr.num_frames_since_fired)
    for _ in range(3):
        *state, m = tr._train_step(*state, x)
    float(m["loss"])
    for tag, fetch in (("batched", lambda m: jax.device_get(m)),
                       ("perkey", lambda m: {k: float(v) for k, v in m.items()})):
        t0 = time.perf_counter()
        for i in range(50):
            *state, m = tr._train_step(*state, x)
            if i % 10 == 0:
                fetch(m)
        float(m["loss"])
        out[f"logfetch_{tag}_50steps_s"] = round(time.perf_counter() - t0, 3)
    print(json.dumps(out), flush=True)

    # lr: host mirror vs device schedule
    t0 = time.perf_counter()
    for _ in range(10):
        tr.current_lr()
    out["lr_host_x10_s"] = round(time.perf_counter() - t0, 4)
    t0 = time.perf_counter()
    for _ in range(10):
        float(tr.schedule(100))
    out["lr_device_x10_s"] = round(time.perf_counter() - t0, 3)
    print(json.dumps(out), flush=True)

    # cachestep: steps/s through the device cache
    from freud_tpu.data.device_cache import DeviceShuffleCache

    cache = DeviceShuffleCache(args.store, args.layer, 200)
    for _ in range(3):
        *state, m = tr._train_step(*state, cache.next_batch(100))
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(200):
        *state, m = tr._train_step(*state, cache.next_batch(100))
    float(m["loss"])
    out["cache_steps_per_sec"] = round(200 / (time.perf_counter() - t0), 1)
    cache.close()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
