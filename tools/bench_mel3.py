"""Probe: Pallas DMA throughput vs tile minor-dim width (mel band layouts)."""

from __future__ import annotations

import json
import sys
import time

import numpy as np

import freud_tpu  # noqa: F401
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(name, fn, *args, iters=15, warmup=3, **meta):
    try:
        for _ in range(warmup):
            out = fn(*args)
        float(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        float(out)
        dt = (time.perf_counter() - t0) / iters
        rec = {"name": name, "ms": round(dt * 1e3, 3), **meta}
    except Exception as e:  # noqa: BLE001
        rec = {"name": name, "error": repr(e)[:200], **meta}
    print(json.dumps(rec))
    sys.stdout.flush()


def make_sum(rows, cols, tile_rows):
    def kern(a_ref, o_ref):
        o_ref[0] = jnp.full((8, 128), jnp.sum(a_ref[...]), jnp.float32)

    @jax.jit
    def fn(a):
        B = a.shape[0]
        out = pl.pallas_call(
            kern,
            grid=(B, rows // tile_rows),
            in_specs=[pl.BlockSpec((1, tile_rows, cols),
                                   lambda b, t: (b, t, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 8, 128), lambda b, t: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, 8, 128), jnp.float32),
        )(a)
        return jnp.sum(out[:, 0, 0])

    return fn


def main():
    rng = np.random.default_rng(0)
    base = rng.standard_normal((64, 480_000)).astype(np.float32)

    for rows, cols, tr in ((3000, 160, 1000), (3200, 128, 800),
                           (1600, 256, 800), (800, 512, 400),
                           (400, 1024, 400), (3000, 160, 3000)):
        n = rows * cols
        a = jnp.asarray(base[:, :n].reshape(64, rows, cols))
        timeit(f"dma_sum_{rows}x{cols}_tr{tr}", make_sum(rows, cols, tr), a,
               mb=round(64 * n * 4 / 1e6, 1))

    print(json.dumps({"name": "done"}))


if __name__ == "__main__":
    main()
