"""Decompose the Pallas mel kernel cost."""

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

from freud_tpu.audio.filters import mel_filterbank
from freud_tpu.audio.mel import N_FREQS, _dft_basis
from freud_tpu.constants import HOP_LENGTH, N_FFT, N_FRAMES

TILE = 1000
_TAIL = N_FFT - 2 * HOP_LENGTH


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


def make(variant, n_mels=80):
    def kern(a0, a1, a2, bhi, blo, melw, out_ref):
        if variant == "dma_only":
            out_ref[0] = (a0[0, :, :n_mels] + a1[0, :, :n_mels]
                          + a2[0, :, :n_mels])
            return

        def dot3(f):
            p = f(a0[0], bhi[0:HOP_LENGTH, :], blo[0:HOP_LENGTH, :])
            p += f(a1[0], bhi[HOP_LENGTH:2 * HOP_LENGTH, :],
                   blo[HOP_LENGTH:2 * HOP_LENGTH, :])
            p += f(a2[0], bhi[2 * HOP_LENGTH:, :], blo[2 * HOP_LENGTH:, :])
            return p

        if variant == "bf16_single":
            proj = dot3(lambda a, bh, bl: jnp.dot(
                a.astype(jnp.bfloat16), bh,
                preferred_element_type=jnp.float32))
        elif variant == "limb4":
            def f(a, bh, bl):
                ah = a.astype(jnp.bfloat16)
                al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
                o = jnp.dot(ah, bh, preferred_element_type=jnp.float32)
                o += jnp.dot(ah, bl, preferred_element_type=jnp.float32)
                o += jnp.dot(al, bh, preferred_element_type=jnp.float32)
                o += jnp.dot(al, bl, preferred_element_type=jnp.float32)
                return o
            proj = dot3(f)
        elif variant == "f32_default":
            proj = dot3(lambda a, bh, bl: jnp.dot(
                a, bh.astype(jnp.float32),
                preferred_element_type=jnp.float32))
        re = proj[:, :N_FREQS]
        im = proj[:, N_FREQS:]
        power = re * re + im * im
        if variant == "nomel":
            out_ref[0] = power[:, :n_mels]
            return
        mel = jnp.dot(power, melw[:], preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
        out_ref[0] = jnp.log(jnp.maximum(mel, 1e-10))

    basis = np.asarray(_dft_basis(), np.float32)
    bh0 = jnp.asarray(basis).astype(jnp.bfloat16)
    bl0 = (jnp.asarray(basis) - bh0.astype(jnp.float32)).astype(jnp.bfloat16)
    melw0 = jnp.asarray(mel_filterbank(n_mels).T)

    @jax.jit
    def fn(audio):
        B = audio.shape[0]
        pad = N_FFT // 2
        padded = jnp.pad(audio, ((0, 0), (pad, pad)), mode="reflect")
        rows_total = N_FRAMES + 3
        need = rows_total * HOP_LENGTH
        padded = jnp.pad(padded, ((0, 0), (0, need - padded.shape[1])))
        g = padded.reshape(B, rows_total, HOP_LENGTH)
        b0 = g[:, 0:N_FRAMES, :]
        b1 = g[:, 1:N_FRAMES + 1, :]
        b2 = g[:, 2:N_FRAMES + 2, :_TAIL]
        bh, bl, melw = bh0, bl0, melw0
        out = pl.pallas_call(
            kern,
            grid=(B, N_FRAMES // TILE),
            in_specs=[
                pl.BlockSpec((1, TILE, HOP_LENGTH), lambda b, t: (b, t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TILE, HOP_LENGTH), lambda b, t: (b, t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TILE, _TAIL), lambda b, t: (b, t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((N_FFT, 2 * N_FREQS), lambda b, t: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((N_FFT, 2 * N_FREQS), lambda b, t: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((N_FREQS, n_mels), lambda b, t: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, TILE, n_mels), lambda b, t: (b, t, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, N_FRAMES, n_mels), jnp.float32),
        )(b0, b1, b2, bh, bl, melw)
        return jnp.sum(out[:, 0, :])

    return fn


def main():
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((64, 480_000)).astype(np.float32) * 0.1)
    timeit("mel_dma_only", make("dma_only"), audio)
    timeit("mel_bf16_single", make("bf16_single"), audio)
    timeit("mel_limb4", make("limb4"), audio)
    timeit("mel_f32_default", make("f32_default"), audio)
    print(json.dumps({"name": "done"}))


if __name__ == "__main__":
    main()
