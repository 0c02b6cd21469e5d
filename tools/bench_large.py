"""Collection throughput at whisper large-v3 geometry (block-16 capture,
batch 16 — the configs/features/large_v3_block_16_train* recipe shape)."""

from __future__ import annotations

import json
import sys
import time

import numpy as np

import freud_tpu  # noqa: F401
import jax
import jax.numpy as jnp


def main():
    from freud_tpu.audio.mel import batched_log_mel
    from freud_tpu.models.whisper import dims_for, encoder_forward, init_params

    dims = dims_for("large-v3")
    params = init_params(dims, seed=0)
    layer = "encoder.blocks.16"
    rng = np.random.default_rng(0)

    for batch in (16, 32):
        audio = jnp.asarray(
            rng.standard_normal((batch, 480_000)).astype(np.float32) * 0.1)
        for dt, tag in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
            @jax.jit
            def pipe(p, a, dt=dt):
                m = batched_log_mel(a, dims.n_mels)
                _, caps = encoder_forward(p, dims, m, capture=(layer,),
                                          compute_dtype=dt)
                acts = caps[layer]
                return jnp.sum(acts[:, 0, 0].astype(jnp.float32))
            try:
                for _ in range(2):
                    out = pipe(params, audio)
                float(out)
                t0 = time.perf_counter()
                iters = 6
                for _ in range(iters):
                    out = pipe(params, audio)
                float(out)
                dt_s = (time.perf_counter() - t0) / iters
                print(json.dumps({
                    "name": f"large_v3_block16_{tag}_b{batch}",
                    "ms": round(dt_s * 1e3, 1),
                    "rtfx": round(batch * 30.0 / dt_s),
                    "files_per_sec": round(batch / dt_s, 1)}))
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"name": f"large_v3_{tag}_b{batch}",
                                  "error": repr(e)[:250]}))
            sys.stdout.flush()
    print(json.dumps({"name": "done", "backend": jax.default_backend()}))


if __name__ == "__main__":
    main()
