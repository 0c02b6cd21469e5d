"""Prototype: fused qkv-projection + self-attention kernel vs current path."""

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

B, S, D, H = 64, 1500, 384, 6
DH = D // H
S_PAD = 1504
_NEG = -0.7 * float(jnp.finfo(jnp.float32).max)


def timeit(name, fn, *args, iters=20, warmup=3, **meta):
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
        rec = {"name": name, "error": repr(e)[:250], **meta}
    print(json.dumps(rec))
    sys.stdout.flush()


def _mha_kernel(x_ref, wq_ref, wk_ref, wv_ref, bq_ref, bv_ref, out_ref,
                *, scale: float, valid_len: int):
    x = x_ref[0]  # (S_PAD, D) bf16
    q = jnp.dot(x, wq_ref[...], preferred_element_type=jnp.float32)
    q = ((q + bq_ref[...]) * scale).astype(jnp.bfloat16)
    k = jnp.dot(x, wk_ref[...], preferred_element_type=jnp.float32
                ).astype(jnp.bfloat16)  # whisper: k has no bias
    v = (jnp.dot(x, wv_ref[...], preferred_element_type=jnp.float32)
         + bv_ref[...]).astype(jnp.bfloat16)

    col = jax.lax.broadcasted_iota(jnp.int32, (1, S_PAD), 1)
    bias = jnp.where(col < valid_len, 0.0, _NEG)

    outs = []
    for h in range(H):
        qh = q[:, h * DH:(h + 1) * DH]
        kh = k[:, h * DH:(h + 1) * DH]
        vh = v[:, h * DH:(h + 1) * DH]
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) + bias
        s = s - jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot(p.astype(jnp.bfloat16), vh,
                        preferred_element_type=jnp.float32)
        outs.append(o * (1.0 / l))
    out_ref[0] = jnp.concatenate(outs, axis=-1).astype(out_ref.dtype)


@jax.jit
def mha_fused(x, wq, wk, wv, bq, bv):
    xp = jnp.pad(x, ((0, 0), (0, S_PAD - S), (0, 0))).astype(jnp.bfloat16)
    out = pl.pallas_call(
        functools.partial(_mha_kernel, scale=DH ** -0.5, valid_len=S),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, S_PAD, D), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, D), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, D), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, D), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, S_PAD, D), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, S_PAD, D), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
    )(xp, wq.astype(jnp.bfloat16), wk.astype(jnp.bfloat16),
      wv.astype(jnp.bfloat16), bq.reshape(1, -1), bv.reshape(1, -1))
    return out[:, :S, :]


def main():
    from freud_tpu.ops.attention import whisper_attention

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, S, D)).astype(np.float32) * 0.5
                    ).astype(jnp.bfloat16)
    wq, wk, wv = (jnp.asarray(
        rng.standard_normal((D, D)).astype(np.float32) * 0.05)
        for _ in range(3))
    bq, bv = (jnp.asarray(rng.standard_normal((D,)).astype(np.float32) * 0.01)
              for _ in range(2))

    @jax.jit
    def current(x, wq, wk, wv, bq, bv):
        q = x.astype(jnp.float32) @ wq + bq
        k = x.astype(jnp.float32) @ wk
        v = x.astype(jnp.float32) @ wv + bv

        def split(t):
            return jnp.moveaxis(
                t.reshape(B, S, H, DH).astype(jnp.bfloat16), -2, -3)
        o = whisper_attention(split(q), split(k), split(v))
        o = jnp.moveaxis(o, -3, -2).reshape(B, S, D)
        return jnp.sum(o.astype(jnp.float32))

    @jax.jit
    def fused(x, wq, wk, wv, bq, bv):
        return jnp.sum(mha_fused(x, wq, wk, wv, bq, bv).astype(jnp.float32))

    timeit("qkv_attn_current", current, x, wq, wk, wv, bq, bv)
    timeit("qkv_attn_fused", fused, x, wq, wk, wv, bq, bv)

    # numerical agreement
    a = np.asarray(mha_fused(x, wq, wk, wv, bq, bv), np.float32)
    q = np.asarray(x, np.float32) @ np.asarray(wq) + np.asarray(bq)
    k = np.asarray(x, np.float32) @ np.asarray(wk)
    v = np.asarray(x, np.float32) @ np.asarray(wv) + np.asarray(bv)
    qh = q.reshape(B, S, H, DH).transpose(0, 2, 1, 3)
    kh = k.reshape(B, S, H, DH).transpose(0, 2, 1, 3)
    vh = v.reshape(B, S, H, DH).transpose(0, 2, 1, 3)
    sc = np.einsum("bhsd,bhtd->bhst", qh * DH ** -0.5, kh)
    sc = sc - sc.max(-1, keepdims=True)
    p = np.exp(sc)
    ref = np.einsum("bhst,bhtd->bhsd", p / p.sum(-1, keepdims=True), vh)
    ref = ref.transpose(0, 2, 1, 3).reshape(B, S, D)
    err = np.abs(a - ref) / (np.abs(ref).max() + 1e-6)
    print(json.dumps({"name": "fused_relerr", "max": float(err.max())}))
    print(json.dumps({"name": "done"}))


if __name__ == "__main__":
    main()
