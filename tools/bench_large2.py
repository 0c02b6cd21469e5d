"""Floor decomposition for the large-recipe train steps (VERDICT r2 item 2).

large_v1_audioset (topk, d=1280, n_dict=20480, k=32, batch 32×1500) and
large_v3_l1 (l1, d=1280, n_dict=20480, batch 16×1500): measure each stage of
the step separately so BENCH numbers have a floor to be judged against.

v5e reference rates: ~197 TFLOP/s bf16 MXU, ~820 GB/s HBM.
large_v1 topk irreducible matmuls: 8 × 2·48000·1280·20480 ≈ 20.1 TFLOP
  (enc, 2 fwd decodes, 2 dW_dec, d1, d2, dW_enc) ≈ 102 ms at peak
  — the XLA-branch backward materializes (M, n_dict) cotangents: + ~12 GB
  of HBM traffic ≈ 15 ms.
large_v3 l1 matmuls: fwd enc+dec + bwd (dW×2, dx) ≈ 5 × 2·24000·1280·20480
  ≈ 12.6 TFLOP ≈ 64 ms at peak — but the L1 path runs f32 (no amp for this
  recipe?) — see the measured split below.
"""

from __future__ import annotations

import json
import time

import numpy as np

import freud_tpu  # noqa: F401
import jax
import jax.numpy as jnp


def timeit(name, fn, *args, iters=10, warmup=2):
    """``fn`` must return a SCALAR computed in-jit (block_until_ready is a
    no-op on the tunneled backend; ad-hoc slicing compiles remotely)."""
    for _ in range(warmup):
        float(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(out)
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({"probe": name, "ms": round(dt * 1e3, 2)}))


def main():
    M, d, n = 32 * 1500, 1280, 20480
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((M, d)).astype(np.float32))
    W_enc = jnp.asarray((rng.standard_normal((d, n)) * 0.03).astype(np.float32))
    W_dec = jnp.asarray((rng.standard_normal((n, d)) * 0.03).astype(np.float32))
    dead = jnp.zeros((n,), bool).at[: n // 10].set(True)

    @jax.jit
    def enc(x):
        return jax.nn.relu(jax.lax.dot(
            x.astype(jnp.bfloat16), W_enc.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16))

    @jax.jit
    def enc_s(x):
        return jnp.sum(enc(x)[:, 0].astype(jnp.float32))

    acts = enc(x)
    timeit("enc_matmul_bf16", enc_s, x)

    from freud_tpu.ops.topk_threshold import topk_thresholds_fired

    @jax.jit
    def thr(a):
        tm, ta, _, f = topk_thresholds_fired(a, dead, 32, 640)
        return jnp.sum(tm)

    timeit("threshold_kernel", thr, acts)

    @jax.jit
    def dec(a):
        tm, ta, _, f = topk_thresholds_fired(a, dead, 32, 640)
        dm = jnp.where(a.astype(jnp.float32) >= tm, a, 0)
        y = jax.lax.dot(dm, W_dec.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
        return jnp.sum(y[:, 0])

    timeit("thr_plus_one_decode", dec, acts)

    # full topk train steps at both recipes via the real trainer
    from freud_tpu.train.trainer import SAETrainer

    for name, variant, d_in, batch, cfg, opt, sched in (
        ("large_v1_topk_step", "topk", 1280, 32,
         {"expansion_factor": 16, "k": 32, "auxk_alpha": 0.03125,
          "dead_feature_threshold": 1e6}, "adam", "linear"),
        ("large_v3_l1_step", "l1", 1280, 16,
         {"expansion_factor": 16, "recon_alpha": 1e4}, "radam", "cosine"),
    ):
        tr = SAETrainer(variant, cfg, d_in, optimizer=opt, scheduler=sched,
                        scheduler_params={"num_warmup_steps": 1000}
                        if sched == "linear" else None,
                        lr=1e-4, steps=25_000)
        xb = jnp.asarray(rng.standard_normal(
            (batch, 1500, d_in)).astype(np.float32))
        state = (tr.params, tr.opt_state, tr.num_frames_since_fired)
        for _ in range(3):
            *state, m = tr._train_step(*state, xb)
        float(m["loss"])
        t0 = time.perf_counter()
        for _ in range(15):
            *state, m = tr._train_step(*state, xb)
        float(m["loss"])
        dt = (time.perf_counter() - t0) / 15
        print(json.dumps({"probe": name, "ms": round(dt * 1e3, 2),
                          "steps_per_sec": round(1.0 / dt, 2)}))


if __name__ == "__main__":
    main()
