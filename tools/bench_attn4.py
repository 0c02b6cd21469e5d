"""Probe: attention softmax-cost variants + mel kernel variants."""

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


BLOCK_Q = 512
_NEG = -0.7 * float(jnp.finfo(jnp.float32).max)


def make_attn(mode):
    def _kernel(q_ref, k_ref, v_ref, out_ref, *, scale, valid_len):
        q = (q_ref[0].astype(jnp.float32) * scale).astype(jnp.bfloat16)
        k = k_ref[0]
        v = v_ref[0]
        scores = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        s_pad = scores.shape[-1]
        col = jax.lax.broadcasted_iota(jnp.int32, (1, s_pad), 1)
        scores = scores + jnp.where(col < valid_len, 0.0, _NEG)
        if mode == "noexp":
            p = scores * scores
        elif mode == "exp2":
            p = jnp.exp2(scores)  # scale folded: q *= scale*log2(e) upstream
        elif mode == "exp_bf16":
            p = jnp.exp(scores.astype(jnp.bfloat16)).astype(jnp.float32)
        elif mode == "stable":
            p = jnp.exp(scores - jnp.max(scores, axis=-1, keepdims=True))
        else:  # fast
            p = jnp.exp(scores)
        l = jnp.sum(p, axis=-1, keepdims=True)
        out = jax.lax.dot(p.astype(jnp.bfloat16), v,
                          preferred_element_type=jnp.float32)
        out_ref[0] = (out * (1.0 / l)).astype(out_ref.dtype)

    @jax.jit
    def attn(q, k, v):
        b, h, s, dh = q.shape
        scale = dh ** -0.5
        s_pad = -(-s // BLOCK_Q) * BLOCK_Q

        def pad(t):
            return jnp.pad(t.reshape(b * h, s, dh),
                           ((0, 0), (0, s_pad - s), (0, 0)))

        out = pl.pallas_call(
            functools.partial(_kernel, scale=scale, valid_len=s),
            grid=(b * h, s_pad // BLOCK_Q),
            in_specs=[
                pl.BlockSpec((1, BLOCK_Q, dh), lambda bh, t: (bh, t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, s_pad, dh), lambda bh, t: (bh, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, s_pad, dh), lambda bh, t: (bh, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, BLOCK_Q, dh), lambda bh, t: (bh, t, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b * h, s_pad, dh), q.dtype),
        )(pad(q), pad(k), pad(v))
        return jnp.sum(out[:, 0, :].astype(jnp.float32))

    return attn


def main():
    rng = np.random.default_rng(0)
    b, h, s, dh = 64, 6, 1500, 64
    qb, kb, vb = (jnp.asarray(
        rng.standard_normal((b, h, s, dh)).astype(np.float32)
    ).astype(jnp.bfloat16) for _ in range(3))

    for mode in ("stable", "fast", "noexp", "exp2", "exp_bf16"):
        timeit(f"attn_{mode}", make_attn(mode), qb, kb, vb)

    # ---- mel variants ----
    from freud_tpu.audio.mel import batched_log_mel
    from freud_tpu.ops import mel_pallas

    audio = jnp.asarray(rng.standard_normal((64, 480_000)).astype(np.float32) * 0.1)

    @jax.jit
    def mel_fn(a):
        m = mel_pallas.log_mel_spectrogram_pallas(a, 80)
        return jnp.sum(m[:, 0, :].astype(jnp.float32))

    timeit("mel_v2", mel_fn, audio, iters=12)

    print(json.dumps({"name": "done"}))


if __name__ == "__main__":
    main()
