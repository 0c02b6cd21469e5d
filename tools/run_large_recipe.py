"""Production-scale recipe campaign: large_v1_audioset end-to-end on chip.

The tiny_l1 recipe has run at the reference's exact cadences end-to-end
(ROADMAP round-4 close); this campaign executes the LARGE recipe —
configs/train/large_v1_audioset.json shapes (d=1280, n_dict=20480, k=32,
batch 32, adam+linear, val_every=100, save_every=1000, log_tb_every=10) —
through the same surfaces, scaled only in step count (sandbox chip time)
and corpus (synthetic WAVs; zero egress — identical FLOPs/bytes to real
audio):

  1. collect 512 train files (bench corpus) + 64 val files (a disjoint
     synthetic corpus) with random:large-v1, encoder.blocks.16,
     float16 stores — the production store configuration
  2. train `--steps` steps with the device shuffle cache (bf16 window) and
     the fused multi-step path, every cadence at the reference value

Run:  python tools/run_large_recipe.py [--steps 2500] [--skip-collect]
Record: prints a JSON summary (train stats + the profiling-span stage
decomposition: train_chunk / validate / checkpoint_write walls); measured
numbers live in ROADMAP.md's round-5 summary.
"""

from __future__ import annotations

import argparse
import json
import time
import wave
from pathlib import Path

import numpy as np

ROOT = Path("/tmp/freud_large_recipe")
CORPUS = Path.home() / ".cache" / "freud_tpu" / "bench_corpus_v1"


def _synth_corpus(root: Path, n_files: int, seed: int, prefix: str,
                  stride: int) -> Path:
    """Synthetic WAV corpus (16 kHz mono int16, durations cycling 5-15 s);
    idempotent via a count marker. The train corpus matches bench.py's
    `_ensure_corpus` layout/seed exactly so the two share the disk cache."""
    marker = root / ".complete"
    if marker.exists() and marker.read_text().strip() == str(n_files):
        return root
    root.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    sr = 16_000
    for i in range(n_files):
        dur = 5.0 + 10.0 * ((i * stride) % 101) / 100.0
        x = np.clip(rng.standard_normal(int(sr * dur)).astype(np.float32)
                    * 0.15, -1, 1)
        pcm = (x * 32767.0).astype("<i2")
        with wave.open(str(root / f"{prefix}_{i:05d}.wav"), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(sr)
            w.writeframes(pcm.tobytes())
    marker.write_text(str(n_files))
    return root


def _train_corpus() -> Path:
    return _synth_corpus(CORPUS, 1024, seed=0, prefix="clip", stride=37)


def _val_corpus(n_files: int = 64) -> Path:
    """Synthetic val WAVs, disjoint from the train corpus (seed differs)."""
    return _synth_corpus(ROOT / "val_corpus", n_files, seed=9100,
                         prefix="val", stride=53)


def collect(data_path: Path, subdir: str, collect_max: int) -> dict:
    from freud_tpu.scripts.collect_activations import get_activations

    t0 = time.perf_counter()
    stats = get_activations(
        data_path=str(data_path),
        layer_name="encoder.blocks.16",
        whisper_model="random:large-v1",
        sae_model=None,
        batch_size=16,
        out_folder=str(ROOT / subdir),
        collect_max=collect_max,
        verbose=True,
        store_dtype="float16",
    )
    stats["wall_s"] = round(time.perf_counter() - t0, 1)
    return stats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2500)
    ap.add_argument("--skip-collect", action="store_true")
    ap.add_argument("--cache-files", type=int, default=384)
    args = ap.parse_args()

    import freud_tpu  # noqa: F401  (platform setup)

    summary: dict = {"recipe": "large_v1_audioset", "steps": args.steps}
    if not args.skip_collect:
        print("== collect: train store (512 files) ==", flush=True)
        summary["collect_train"] = collect(_train_corpus(), "train", 512)
        print("\n== collect: val store (64 files, disjoint corpus) ==",
              flush=True)
        summary["collect_val"] = collect(_val_corpus(), "val", 64)

    from freud_tpu.train.trainer import train

    cfg = json.loads(
        (Path(__file__).parent.parent / "configs/train/large_v1_audioset.json")
        .read_text())
    cfg.update(
        steps=args.steps,
        train_folder=str(ROOT / "train"),
        val_folder=str(ROOT / "val"),
        run_dir=str(ROOT / "run"),
        device_cache_files=args.cache_files,
        device_cache_dtype="bfloat16",
    )
    # The config names the real checkpoint ("large-v1"); this sandbox has no
    # weights (zero egress), so point validation transcripts at the seeded
    # random model the store was collected with.
    cfg["whisper_config"]["model"] = "random:large-v1"
    from freud_tpu import profiling

    print("\n== train ==", flush=True)
    profiling.reset()
    t0 = time.perf_counter()
    stats = train(**cfg)
    stats["wall_s"] = round(time.perf_counter() - t0, 1)
    summary["train"] = stats
    summary["stages"] = {
        k: {"total_s": round(v["total_s"], 1), "count": v["count"],
            # per-call walls so steady state separates from first-compile
            "calls_s": [round(c, 1) for c in profiling.calls(k)[:64]]}
        for k, v in profiling.stats().items()
        if k in ("train_chunk", "train_chunk_wait", "train_step", "validate",
                 "val_fetch", "val_transcripts", "checkpoint_write",
                 "checkpoint_d2h", "checkpoint_disk")
    }
    print(profiling.report(), flush=True)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
