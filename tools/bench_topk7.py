"""Decompose the fused TopK forward kernel cost: enc / +bisect / +decode."""

from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np

import freud_tpu  # noqa: F401
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 128
M, D, N = 75008, 384, 6144


def timeit(name, fn, *args, iters=30, warmup=3, **meta):
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


def _bisect(bits, k, iters):
    lo = jnp.min(bits, axis=-1, keepdims=True)
    hi = jnp.max(bits, axis=-1, keepdims=True) + 1

    def body(_, lohi):
        lo, hi = lohi
        mid = jnp.maximum((lo + hi) >> 1, lo)
        cnt = jnp.sum((bits >= mid).astype(jnp.int32), axis=-1, keepdims=True)
        ok = cnt >= k
        return jnp.where(ok, mid, lo), jnp.where(ok, hi, mid)

    lo, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
    return lo


def make(variant, iters=16):
    def kern(x_ref, wenc_ref, wdec_ref, acts_ref, ym_ref):
        sae_in = x_ref[...].astype(jnp.bfloat16)
        z = jnp.dot(sae_in, wenc_ref[...], preferred_element_type=jnp.float32)
        acts = jnp.maximum(z.astype(jnp.bfloat16), 0)
        acts_ref[...] = acts
        if variant == "enc":
            ym_ref[...] = z[:, :D]
            return
        bits = jax.lax.bitcast_convert_type(acts, jnp.int16).astype(jnp.int32)
        t = _bisect(bits, 32, iters)
        t2 = _bisect(jnp.where(bits % 3 == 0, bits, -1), 192, iters)
        if variant == "enc_bisect":
            ym_ref[...] = (t + t2).astype(jnp.float32) * jnp.ones((1, D), jnp.float32)
            return
        dense_m = jnp.where(bits >= t, acts, 0)
        dense_a = jnp.where(bits >= t2, acts, 0)
        y = jnp.dot(dense_m, wdec_ref[...], preferred_element_type=jnp.float32)
        y += jnp.dot(dense_a, wdec_ref[...], preferred_element_type=jnp.float32)
        ym_ref[...] = y

    @jax.jit
    def fn(x, wenc, wdec):
        acts, ym = pl.pallas_call(
            kern,
            grid=(M // ROWS,),
            in_specs=[
                pl.BlockSpec((ROWS, D), lambda t: (t, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((D, N), lambda t: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((N, D), lambda t: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((ROWS, N), lambda t: (t, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((ROWS, D), lambda t: (t, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
                jax.ShapeDtypeStruct((M, D), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=96 * 1024 * 1024),
        )(x, wenc, wdec)
        return jnp.sum(ym) + jnp.sum(acts[0].astype(jnp.float32))

    return fn


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((M, D)).astype(np.float32))
    wenc = jnp.asarray(rng.standard_normal((D, N)).astype(np.float32) * 0.05
                       ).astype(jnp.bfloat16)
    wdec = jnp.asarray(rng.standard_normal((N, D)).astype(np.float32) * 0.05
                       ).astype(jnp.bfloat16)

    timeit("v_enc", make("enc"), x, wenc, wdec)
    timeit("v_enc_bisect16", make("enc_bisect", 16), x, wenc, wdec)
    timeit("v_enc_bisect1", make("enc_bisect", 1), x, wenc, wdec)
    timeit("v_full16", make("full", 16), x, wenc, wdec)
    timeit("v_full1", make("full", 1), x, wenc, wdec)
    print(json.dumps({"name": "done"}))


if __name__ == "__main__":
    main()
