"""Piecewise timing of the TopK train-step components on TPU."""

from __future__ import annotations

import json
import sys
import time

import numpy as np

import freud_tpu  # noqa: F401
import jax
import jax.numpy as jnp


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
        rec = {"name": name, "error": repr(e)[:300], **meta}
    print(json.dumps(rec))
    sys.stdout.flush()


def main():
    from freud_tpu.ops.topk_threshold import topk_thresholds_fired

    M, n_dict, d_in = 75008, 6144, 384
    rng = np.random.default_rng(0)
    acts_b = jnp.asarray(
        np.abs(rng.standard_normal((M, n_dict))).astype(np.float32)
    ).astype(jnp.bfloat16)
    dead = jnp.zeros((n_dict,), bool).at[jnp.arange(0, n_dict, 3)].set(True)
    W_dec = jnp.asarray(rng.standard_normal((n_dict, d_in)).astype(np.float32) * 0.05
                        ).astype(jnp.bfloat16)
    W_enc = jnp.asarray(rng.standard_normal((d_in, n_dict)).astype(np.float32) * 0.05
                        ).astype(jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((M, d_in)).astype(np.float32))

    for rows in (128, 256, 512):
        for iters_ in (26, 16):
            @jax.jit
            def th(a, d, rows=rows, iters_=iters_):
                tm, ta, _, f = topk_thresholds_fired(a, d, 32, 192,
                                                  rows=rows, iters=iters_)
                return jnp.sum(tm[:4]) + jnp.sum(f[:4].astype(jnp.float32))
            timeit(f"thresholds_r{rows}_i{iters_}", th, acts_b, dead,
                   rows=rows, iters=iters_)

    t_main = jnp.full((M, 1), 1.5, jnp.float32)

    @jax.jit
    def plain_mm(a, w):
        y = jax.lax.dot(a, w, preferred_element_type=jnp.float32)
        return jnp.sum(y[0])
    timeit("plain_decode_mm", plain_mm, acts_b, W_dec)

    @jax.jit
    def masked_mm(a, t, w):
        dense = jnp.where(a.astype(jnp.float32) >= t, a, 0)
        y = jax.lax.dot(dense, w, preferred_element_type=jnp.float32)
        return jnp.sum(y[0])
    timeit("masked_decode_mm", masked_mm, acts_b, t_main, W_dec)

    @jax.jit
    def enc_mm(xx, w):
        y = jax.lax.dot(xx.astype(jnp.bfloat16), w,
                        preferred_element_type=jnp.float32)
        acts = jax.nn.relu(y.astype(jnp.bfloat16))
        return jnp.sum(acts[0].astype(jnp.float32))
    timeit("enc_mm_relu", enc_mm, x, W_enc)

    # both masked decodes together (shared acts read)
    t_aux = jnp.full((M, 1), 2.0, jnp.float32)

    @jax.jit
    def both_mm(a, tm, ta, d, w):
        af = a.astype(jnp.float32)
        dm = jnp.where(af >= tm, a, 0)
        da = jnp.where((af >= ta) & d, a, 0)
        y1 = jax.lax.dot(dm, w, preferred_element_type=jnp.float32)
        y2 = jax.lax.dot(da, w, preferred_element_type=jnp.float32)
        return jnp.sum(y1[0]) + jnp.sum(y2[0])
    timeit("both_masked_mm", both_mm, acts_b, t_main, t_aux, dead, W_dec)

    print(json.dumps({"name": "done", "backend": jax.default_backend()}))


if __name__ == "__main__":
    main()
