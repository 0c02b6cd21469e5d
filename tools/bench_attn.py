"""Microbench: attention variants + encoder stage breakdown on the TPU.

Run:  nohup python tools/bench_attn.py > /tmp/bench_attn.log 2>&1 &
Each line printed is one JSON record. Timing uses the in-jit checksum fetch
(block_until_ready is a no-op on the tunneled axon backend).
"""

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

    def einsum_attn(q, k, v):
        scale = dh ** -0.5
        w = jax.nn.softmax(
            jnp.einsum("bhsd,bhtd->bhst", q * scale, k).astype(jnp.float32), axis=-1
        ).astype(q.dtype)
        return jnp.einsum("bhst,bhtd->bhsd", w, v)

    timeit("einsum_f32", chk(einsum_attn), q32, k32, v32)
    timeit("einsum_bf16", chk(einsum_attn), qb, kb, vb)
    timeit("kernel_f32_f32mm", chk(
        lambda q, k, v: whisper_attention(q, k, v, matmul_dtype=jnp.float32)
    ), q32, k32, v32)
    timeit("kernel_f32_bf16mm", chk(
        lambda q, k, v: whisper_attention(q, k, v, matmul_dtype=jnp.bfloat16)
    ), q32, k32, v32)
    timeit("kernel_bf16", chk(whisper_attention), qb, kb, vb)
    for bq in (256, 768, 1536):
        timeit(f"kernel_f32_bf16mm_bq{bq}", chk(
            lambda q, k, v, bq=bq: whisper_attention(
                q, k, v, matmul_dtype=jnp.bfloat16, block_q=bq)
        ), q32, k32, v32, block_q=bq)
        timeit(f"kernel_bf16_bq{bq}", chk(
            lambda q, k, v, bq=bq: whisper_attention(q, k, v, block_q=bq)
        ), qb, kb, vb, block_q=bq)

    # ---- encoder stage breakdown ----
    from freud_tpu.audio.mel import batched_log_mel
    from freud_tpu.models.whisper import dims_for, encoder_forward, init_params

    dims = dims_for("tiny")
    params = init_params(dims, seed=0)
    audio = jnp.asarray(rng.standard_normal((b, 480_000)).astype(np.float32) * 0.1)

    @jax.jit
    def mel_only(a):
        m = batched_log_mel(a, dims.n_mels)
        return jnp.sum(m[:, 0, :].astype(jnp.float32))

    timeit("mel_only_b64", mel_only, audio, iters=12)

    mels = batched_log_mel(audio, dims.n_mels)

    for dt, tag in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        @jax.jit
        def enc(p, m, dt=dt):
            out, _ = encoder_forward(p, dims, m, capture=(), compute_dtype=dt)
            return jnp.sum(out[:, 0, 0].astype(jnp.float32))
        timeit(f"encoder_{tag}_b64", enc, params, mels, iters=12)

    # mlp-shaped matmul proxy: (96000, 384) @ (384, 1536) @ (1536, 384)
    x32 = jnp.asarray(rng.standard_normal((96000, 384)).astype(np.float32))
    w1 = jnp.asarray(rng.standard_normal((384, 1536)).astype(np.float32) * 0.05)
    w2 = jnp.asarray(rng.standard_normal((1536, 384)).astype(np.float32) * 0.05)

    @jax.jit
    def mlp(x, w1, w2):
        hgelu = jax.nn.gelu(x @ w1)
        return jnp.sum((hgelu @ w2)[0].astype(jnp.float32))

    timeit("mlp_proxy_f32", mlp, x32, w1, w2)
    timeit("mlp_proxy_bf16", mlp, x32.astype(jnp.bfloat16),
           w1.astype(jnp.bfloat16), w2.astype(jnp.bfloat16))

    print(json.dumps({"name": "done", "backend": jax.default_backend()}))


if __name__ == "__main__":
    main()
