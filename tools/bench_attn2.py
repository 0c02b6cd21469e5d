"""Round 2 of attention/mel/encoder microbenches (post-optimization)."""

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
    from freud_tpu.ops.attention import whisper_attention

    b, h, s, dh = 64, 6, 1500, 64
    rng = np.random.default_rng(0)
    q32 = jnp.asarray(rng.standard_normal((b, h, s, dh)).astype(np.float32))
    k32 = jnp.asarray(rng.standard_normal((b, h, s, dh)).astype(np.float32))
    v32 = jnp.asarray(rng.standard_normal((b, h, s, dh)).astype(np.float32))
    qb, kb, vb = (t.astype(jnp.bfloat16) for t in (q32, k32, v32))

    def chk(f):
        @jax.jit
        def g(q, k, v):
            o = f(q, k, v)
            return jnp.sum(o[:, 0, 0, :].astype(jnp.float32))
        return g

    timeit("v2_kernel_f32", chk(whisper_attention), q32, k32, v32)
    timeit("v2_kernel_bf16", chk(whisper_attention), qb, kb, vb)
    timeit("v2_kernel_f32_fast", chk(
        lambda q, k, v: whisper_attention(q, k, v, stable=False)), q32, k32, v32)
    timeit("v2_kernel_bf16_fast", chk(
        lambda q, k, v: whisper_attention(q, k, v, stable=False)), qb, kb, vb)
    for bq in (768, 1536):
        timeit(f"v2_kernel_bf16_bq{bq}", chk(
            lambda q, k, v, bq=bq: whisper_attention(q, k, v, block_q=bq)
        ), qb, kb, vb)

    from freud_tpu.audio.mel import batched_log_mel
    from freud_tpu.models.whisper import dims_for, encoder_forward, init_params

    dims = dims_for("tiny")
    params = init_params(dims, seed=0)
    audio = jnp.asarray(rng.standard_normal((b, 480_000)).astype(np.float32) * 0.1)

    @jax.jit
    def mel_only(a):
        m = batched_log_mel(a, dims.n_mels)
        return jnp.sum(m[:, 0, :].astype(jnp.float32))

    timeit("v2_mel_only_b64", mel_only, audio, iters=12)

    mels = batched_log_mel(audio, dims.n_mels)
    for dt, tag in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        @jax.jit
        def enc(p, m, dt=dt):
            out, _ = encoder_forward(p, dims, m, capture=(), compute_dtype=dt)
            return jnp.sum(out[:, 0, 0].astype(jnp.float32))
        timeit(f"v2_encoder_{tag}_b64", enc, params, mels, iters=12)

    # full collection pipeline, batch 64 and 128
    layer = "encoder.blocks.2"
    for batch in (64, 128):
        aud = jnp.asarray(
            rng.standard_normal((batch, 480_000)).astype(np.float32) * 0.1)
        for dt, tag in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
            @jax.jit
            def pipe(p, a, dt=dt):
                m = batched_log_mel(a, dims.n_mels)
                _, caps = encoder_forward(p, dims, m, capture=(layer,),
                                          compute_dtype=dt)
                acts = caps[layer]
                return jnp.sum(acts[:, 0, 0].astype(jnp.float32))
            def run(p, a, pipe=pipe):
                return pipe(p, a)
            name = f"v2_pipeline_{tag}_b{batch}"
            try:
                for _ in range(2):
                    out = run(params, aud)
                float(out)
                t0 = time.perf_counter()
                iters = 10
                for _ in range(iters):
                    out = run(params, aud)
                float(out)
                dt_s = (time.perf_counter() - t0) / iters
                rtfx = batch * 30.0 / dt_s
                print(json.dumps({"name": name, "ms": round(dt_s * 1e3, 2),
                                  "rtfx": round(rtfx)}))
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"name": name, "error": repr(e)[:300]}))
            sys.stdout.flush()

    print(json.dumps({"name": "done", "backend": jax.default_backend()}))


if __name__ == "__main__":
    main()
