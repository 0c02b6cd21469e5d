"""Collection RTFx across the WHOLE Whisper family on one chip.

bench.py carries tiny (the reference's default feature configs) and earlier
probes carried large-v3 (the width-gate fix, commit af6f609); this probe
fills in base/small/medium so every size the reference's configs can name
(configs/features/*.json) has a compile-and-run record and a number. The
attention-impl gate (models/whisper/model.py:_attention_impl) switches from
the fused-qkv kernel (d ≤ 768: tiny/base/small) to the K/V-resident blocked
kernel (medium/large) — medium is the first d=1024 shape through that path.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/bench_family.py [sizes...]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

import freud_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from freud_tpu.audio.mel import batched_log_mel
from freud_tpu.models.whisper import dims_for, encoder_forward, init_params


def run(size: str, batch: int, dtype, iters=4, warmup=2):
    dims = dims_for(size)
    params = init_params(dims, seed=0)
    layer = f"encoder.blocks.{dims.n_audio_layer // 2}"

    @jax.jit
    def pipeline(params, audio):
        mels = batched_log_mel(audio, dims.n_mels)
        _, caps = encoder_forward(
            params, dims, mels, capture=(layer,), compute_dtype=dtype)
        acts = caps[layer]
        return jnp.sum(acts[:, 0, 0].astype(jnp.float32))

    rng = np.random.default_rng(0)
    audio = jnp.asarray(
        rng.standard_normal((batch, 480_000)).astype(np.float32) * 0.1)
    for _ in range(warmup):
        float(pipeline(params, audio))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = pipeline(params, audio)
    float(out)
    dt = time.perf_counter() - t0
    print(json.dumps({
        "model": size, "batch": batch,
        "dtype": jnp.dtype(dtype).name,
        "rtfx": round(batch * iters * 30.0 / dt, 1),
        "files_per_sec": round(batch * iters / dt, 2),
    }), flush=True)


def main():
    sizes = sys.argv[1:] or ["base", "small", "medium"]
    batches = {"tiny": 128, "base": 96, "small": 48, "medium": 24,
               "large-v2": 16, "large-v3": 16}
    for size in sizes:
        for dtype in (jnp.float32, jnp.bfloat16):
            run(size, batches.get(size, 16), dtype)


if __name__ == "__main__":
    main()
