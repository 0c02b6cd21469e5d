"""A/B the two-stage byte-packed bisection vs single-stage, × row-tile size.

Also equality-checks the two paths' thresholds ON THE TPU (the pytest suite
pins exactness in interpret mode; this confirms the Mosaic lowering agrees).
"""

from __future__ import annotations

import json
import time

import numpy as np

import freud_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from freud_tpu.ops import topk_fused


def setup():
    rng = np.random.default_rng(0)
    M, d_in, n_dict = 50 * 1500, 384, 6144
    x = jnp.asarray(rng.standard_normal((M, d_in)).astype(np.float32))
    enc_w = jnp.asarray(rng.standard_normal((d_in, n_dict)).astype(np.float32) * 0.05)
    enc_b = jnp.zeros((n_dict,), jnp.float32)
    b_dec = jnp.zeros((d_in,), jnp.float32)
    W_dec = jnp.asarray(rng.standard_normal((n_dict, d_in)).astype(np.float32) * 0.05)
    dead = jnp.zeros((n_dict,), jnp.float32).at[:200].set(1.0)
    return x, enc_w, enc_b, b_dec, W_dec, dead


def run(rows, two_stage, args, check=None):
    topk_fused.ROWS = rows
    topk_fused._TWO_STAGE = two_stage
    topk_fused._partitioned_forward.cache_clear()
    topk_fused.topk_sae_forward.clear_cache()
    x, enc_w, enc_b, b_dec, W_dec, dead = args

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
    print(json.dumps({"rows": rows, "two_stage": two_stage,
                      "fwd_ms": round(dt * 1e3, 2)}))

    if check is not None:
        acts, ym, ya, tm, ta, fired = topk_fused.topk_sae_forward(
            x, enc_w, enc_b, b_dec, W_dec, dead, 32, 192)
        tm, ta = np.asarray(tm), np.asarray(ta)
        ok_m = bool((tm == check[0]).all())
        ok_a = bool((ta == check[1]).all())
        print(json.dumps({"thresholds_equal_main": ok_m,
                          "thresholds_equal_aux": ok_a}))
        if not (ok_m and ok_a):
            bad = np.where(tm != check[0])[0][:5]
            print("mismatch rows", bad, tm[bad].ravel(), check[0][bad].ravel())
    return None


def main():
    args = setup()
    # reference thresholds from the single-stage path
    topk_fused.ROWS = 128
    topk_fused._TWO_STAGE = False
    topk_fused._partitioned_forward.cache_clear()
    topk_fused.topk_sae_forward.clear_cache()
    x, enc_w, enc_b, b_dec, W_dec, dead = args
    _, _, _, tm0, ta0, _ = topk_fused.topk_sae_forward(
        x, enc_w, enc_b, b_dec, W_dec, dead, 32, 192)
    ref = (np.asarray(tm0), np.asarray(ta0))

    for rows, ts in ((128, False), (128, True), (256, True), (256, False)):
        try:
            run(rows, ts, args, check=ref if ts else None)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"rows": rows, "two_stage": ts,
                              "error": str(e)[:300]}))


if __name__ == "__main__":
    main()
