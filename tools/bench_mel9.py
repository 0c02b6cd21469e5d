"""Pad-free mel kernel candidate: raw-row band decomposition.

Frame j covers padded-stream samples [160j-200, 160j+200), i.e. raw rows
j-2 (cols 120:), j-1 (full), j (full), j+1 (cols :40) — so the kernel can
consume the FREE (B, 3000, 160) reshape of the raw waveform plus a tiny
(8, 160) edge tensor holding the three reflect-boundary rows, instead of the
XLA reflect-pad → zero-pad → reshape chain (~2 ms/batch-64 of pure copies).
Also limb3 everywhere + in-kernel epilogue (bench_mel8).
"""

from __future__ import annotations

import json
import sys

import numpy as np

import freud_tpu  # noqa: F401
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from freud_tpu.audio.filters import mel_filterbank
from freud_tpu.audio.mel import N_FREQS, _dft_basis
from freud_tpu.constants import HOP_LENGTH, N_FFT, N_FRAMES, N_SAMPLES
from freud_tpu.ops.mel_pallas import log_mel_spectrogram_pallas

sys.path.insert(0, "/root/repo/tools")
from bench_mel6 import timeit  # noqa: E402

_LN10 = float(np.log(10.0))
_EDGE = 40  # samples of rows j-2 / j+1 inside the frame


def _limb3_dot(a_hi, a_lo, b_hi, b_lo):
    out = jnp.dot(a_hi, b_hi, preferred_element_type=jnp.float32)
    out += jnp.dot(a_hi, b_lo, preferred_element_type=jnp.float32)
    out += jnp.dot(a_lo, b_hi, preferred_element_type=jnp.float32)
    return out


def _kernel(x_ref, e_ref, bhi_ref, blo_ref, mhi_ref, mlo_ref, out_ref):
    x = x_ref[0]            # (3000, 160) raw rows
    e = e_ref[0]            # (8, 160): [row -2, row -1, row 3000, 0...]
    x_hi = x.astype(jnp.bfloat16)
    x_lo = (x - x_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    e_hi = e.astype(jnp.bfloat16)
    e_lo = (e - e_hi.astype(jnp.float32)).astype(jnp.bfloat16)

    bA_hi, bA_lo = bhi_ref[0:_EDGE, :], blo_ref[0:_EDGE, :]
    bB_hi, bB_lo = bhi_ref[_EDGE:_EDGE + HOP_LENGTH, :], blo_ref[_EDGE:_EDGE + HOP_LENGTH, :]
    bC_hi, bC_lo = (bhi_ref[_EDGE + HOP_LENGTH:_EDGE + 2 * HOP_LENGTH, :],
                    blo_ref[_EDGE + HOP_LENGTH:_EDGE + 2 * HOP_LENGTH, :])
    bD_hi, bD_lo = bhi_ref[_EDGE + 2 * HOP_LENGTH:, :], blo_ref[_EDGE + 2 * HOP_LENGTH:, :]

    pa = _limb3_dot(x_hi[:, 120:], x_lo[:, 120:], bA_hi, bA_lo)
    pb = _limb3_dot(x_hi, x_lo, bB_hi, bB_lo)
    pc = _limb3_dot(x_hi, x_lo, bC_hi, bC_lo)
    pd = _limb3_dot(x_hi[:, :_EDGE], x_lo[:, :_EDGE], bD_hi, bD_lo)
    ea = _limb3_dot(e_hi[:, 120:], e_lo[:, 120:], bA_hi, bA_lo)
    eb = _limb3_dot(e_hi, e_lo, bB_hi, bB_lo)
    ed = _limb3_dot(e_hi[:, :_EDGE], e_lo[:, :_EDGE], bD_hi, bD_lo)

    proj = pc
    proj = proj + jnp.concatenate([ea[0:2], pa[0:N_FRAMES - 2]], axis=0)
    proj = proj + jnp.concatenate([eb[1:2], pb[0:N_FRAMES - 1]], axis=0)
    proj = proj + jnp.concatenate([pd[1:N_FRAMES], ed[2:3]], axis=0)

    re = proj[:, :N_FREQS]
    im = proj[:, N_FREQS:]
    power = re * re + im * im
    p_hi = power.astype(jnp.bfloat16)
    p_lo = (power - p_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    mel = _limb3_dot(p_hi, p_lo, mhi_ref[:], mlo_ref[:])
    log_spec = jnp.log(jnp.maximum(mel, 1e-10)) * (1.0 / _LN10)
    gmax = jnp.max(log_spec)
    log_spec = jnp.maximum(log_spec, gmax - 8.0)
    out_ref[0] = (log_spec + 4.0) / 4.0


def build(n_mels=80):
    basis = np.asarray(_dft_basis(), np.float32)
    # band order A|B|C|D = basis rows [0:40 | 40:200 | 200:360 | 360:400]
    basis_hi = jnp.asarray(basis.astype(jnp.bfloat16))
    basis_lo = jnp.asarray((basis - np.float32(basis_hi)).astype(jnp.bfloat16))
    melf = mel_filterbank(n_mels).T.astype(np.float32)
    mel_hi = jnp.asarray(melf.astype(jnp.bfloat16))
    mel_lo = jnp.asarray((melf - np.float32(mel_hi)).astype(jnp.bfloat16))
    pad = N_FFT // 2

    @jax.jit
    def fn(audio):
        B = audio.shape[0]
        x = audio.reshape(B, N_FRAMES, HOP_LENGTH)
        z40 = jnp.zeros((B, 120), audio.dtype)
        e0 = jnp.concatenate([z40, audio[:, pad:pad - _EDGE:-1]], axis=1)
        e1 = audio[:, HOP_LENGTH:0:-1]
        e2 = jnp.concatenate(
            [audio[:, N_SAMPLES - 2:N_SAMPLES - 2 - _EDGE:-1], z40], axis=1)
        e = jnp.stack([e0, e1, e2], axis=1)  # (B, 3, 160)
        e = jnp.pad(e, ((0, 0), (0, 5), (0, 0)))
        out = pl.pallas_call(
            _kernel,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, N_FRAMES, HOP_LENGTH), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, HOP_LENGTH), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((N_FFT, 2 * N_FREQS), lambda b: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((N_FFT, 2 * N_FREQS), lambda b: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((N_FREQS, n_mels), lambda b: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((N_FREQS, n_mels), lambda b: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, N_FRAMES, n_mels), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, N_FRAMES, n_mels), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=80 * 1024 * 1024),
        )(x, e, basis_hi, basis_lo, mel_hi, mel_lo)
        return jnp.swapaxes(out, 1, 2)

    return fn


def main():
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((64, 480_000)).astype(np.float32) * 0.1)
    fn = build()

    @jax.jit
    def timed(a):
        return jnp.sum(fn(a)[:, 0, 0])

    timeit("padfree_limb3_fused", timed, audio)

    a2 = audio[:2]
    got = np.asarray(fn(a2), np.float64)
    cur = np.asarray(log_mel_spectrogram_pallas(a2, 80), np.float64)
    diff = np.abs(got - cur)
    print(json.dumps({"name": "vs_production", "max": float(diff.max()),
                      "frac_gt_3e-4": float(np.mean(diff > 3e-4))}))


if __name__ == "__main__":
    main()
