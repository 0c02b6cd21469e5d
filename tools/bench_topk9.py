"""Fused-kernel row-tile sweep: does a larger tile lift MXU utilization?

The enc+decode matmuls inside ops/topk_fused measure ~55% of bf16 peak at
ROWS=128 (bench_topk8 decomposition); a bigger row tile amortizes per-tile
fixed costs and gives Mosaic longer matmul loops to pipeline. Sweeps ROWS and
reports forward ms at tiny_topk shapes.
"""

from __future__ import annotations

import json
import time

import numpy as np

import freud_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from freud_tpu.ops import topk_fused


def run(rows):
    topk_fused.ROWS = rows
    topk_fused._partitioned_forward.cache_clear()
    topk_fused.topk_sae_forward.clear_cache()

    rng = np.random.default_rng(0)
    M, d_in, n_dict = 50 * 1500, 384, 6144
    x = jnp.asarray(rng.standard_normal((M, d_in)).astype(np.float32))
    enc_w = jnp.asarray(rng.standard_normal((d_in, n_dict)).astype(np.float32) * 0.05)
    enc_b = jnp.zeros((n_dict,), jnp.float32)
    b_dec = jnp.zeros((d_in,), jnp.float32)
    W_dec = jnp.asarray(rng.standard_normal((n_dict, d_in)).astype(np.float32) * 0.05)
    dead = jnp.zeros((n_dict,), jnp.float32).at[:200].set(1.0)

    @jax.jit
    def fn(x):
        acts, ym, ya, tm, ta, fired = topk_fused.topk_sae_forward(
            x, enc_w, enc_b, b_dec, W_dec, dead, 32, 192)
        return jnp.sum(ym[:, 0]) + jnp.sum(tm)

    for _ in range(3):
        float(fn(x))
    t0 = time.perf_counter()
    for _ in range(15):
        out = fn(x)
    float(out)
    dt = (time.perf_counter() - t0) / 15
    print(json.dumps({"rows": rows, "fwd_ms": round(dt * 1e3, 2)}))


def main():
    for rows in (128, 256, 512):
        try:
            run(rows)
        except Exception as e:  # noqa: BLE001 — report and continue the sweep
            print(json.dumps({"rows": rows, "error": str(e)[:200]}))


if __name__ == "__main__":
    main()
