"""Pad-free mel kernel, take 3: padded rows via lane ROLLS + where.

VERDICT (v5e, 2026-08-17): 6.217 ms/batch-64, bit-exact vs production —
IDENTICAL to the production kernel with its XLA reflect-pad (6.21 ms). The
3.5 ms the pad measures standalone overlaps completely with kernel
execution in the pipelined program, so removing it buys nothing; the mel
path is closed at ~6.2 ms (kernel ≈ compute-bound, wrapper free).

padded_row[r] = [xall[r][120:] | xall[r+1][:120]] where xall = [2 edge rows |
raw rows | 1 tail edge row | zeros]. Two VMEM concats (~1.9 MB) replace the
XLA reflect-pad+reshape chain measured at ~3.5 ms/batch-64
(tools/bench_mel5-9 history); the 3-band matmul structure is unchanged, so
the result is bit-exact vs the production kernel.
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
from freud_tpu.ops.mel_pallas import _ROWS, log_mel_spectrogram_pallas

sys.path.insert(0, "/root/repo/tools")
from bench_mel6 import timeit  # noqa: E402

_LN10 = float(np.log(10.0))
_TAIL = N_FFT - 2 * HOP_LENGTH
_SHIFT = 120  # lane split: cols [120:] of row r, cols [:120] of row r+1


def _limb3_dot(a_hi, a_lo, b_hi, b_lo):
    out = jnp.dot(a_hi, b_hi, preferred_element_type=jnp.float32)
    out += jnp.dot(a_hi, b_lo, preferred_element_type=jnp.float32)
    out += jnp.dot(a_lo, b_hi, preferred_element_type=jnp.float32)
    return out


def _kernel(x_ref, e_ref, bhi_ref, blo_ref, mhi_ref, mlo_ref, out_ref):
    raw = x_ref[0]          # (3000, 160)
    e = e_ref[0]            # (16, 160): [row -2, row -1, row 3000, 0…]
    # xall: stream rows -2 .. 3013 (tail zeros unused by kept frames)
    xall = jnp.concatenate([e[0:2], raw, e[2:16]], axis=0)  # (3016, 160)
    A = xall[0:_ROWS]
    B = xall[1:_ROWS + 1]
    # padded[r] = [A[r][120:] | B[r][:120]]: lane rolls align each source to
    # its destination lanes, a lane-indexed where stitches them (Mosaic
    # rejects lane concats with mismatched operand offsets, but rolls+where
    # lower fine)
    RA = jnp.roll(A, -_SHIFT, axis=1)
    RB = jnp.roll(B, 160 - _SHIFT, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (_ROWS, 160), 1)
    x = jnp.where(lane < 160 - _SHIFT, RA, RB)  # (3008, 160)

    x_hi = x.astype(jnp.bfloat16)
    x_lo = (x - x_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    p0 = _limb3_dot(x_hi, x_lo, bhi_ref[0:HOP_LENGTH, :], blo_ref[0:HOP_LENGTH, :])
    p1 = _limb3_dot(x_hi, x_lo, bhi_ref[HOP_LENGTH:2 * HOP_LENGTH, :],
                    blo_ref[HOP_LENGTH:2 * HOP_LENGTH, :])
    p2 = _limb3_dot(x_hi[:, :_TAIL], x_lo[:, :_TAIL],
                    bhi_ref[2 * HOP_LENGTH:, :], blo_ref[2 * HOP_LENGTH:, :])
    proj = p0[0:N_FRAMES] + p1[1:N_FRAMES + 1] + p2[2:N_FRAMES + 2]
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
    bh = jnp.asarray(basis.astype(jnp.bfloat16))
    bl = jnp.asarray((basis - np.float32(bh)).astype(jnp.bfloat16))
    mf = mel_filterbank(n_mels).T.astype(np.float32)
    mh = jnp.asarray(mf.astype(jnp.bfloat16))
    ml = jnp.asarray((mf - np.float32(mh)).astype(jnp.bfloat16))
    pad = N_FFT // 2

    @jax.jit
    def fn(audio):
        B = audio.shape[0]
        x = audio.reshape(B, N_FRAMES, HOP_LENGTH)
        z120 = jnp.zeros((B, _SHIFT), audio.dtype)
        # stream row -2, cols 120:160 = samples [-200,-160) = audio[200:160:-1]
        e0 = jnp.concatenate([z120, audio[:, pad:pad - 40:-1]], axis=1)
        # stream row -1 = samples [-160, 0) = audio[160:0:-1]
        e1 = audio[:, HOP_LENGTH:0:-1]
        # stream row 3000, cols 0:40 = samples [480000, 480040) (tail reflect)
        e2 = jnp.concatenate(
            [audio[:, N_SAMPLES - 2:N_SAMPLES - 2 - 40:-1], z120], axis=1)
        e = jnp.stack([e0, e1, e2], axis=1)       # (B, 3, 160)
        e = jnp.pad(e, ((0, 0), (0, 13), (0, 0)))  # (B, 16, 160)
        out = pl.pallas_call(
            _kernel,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, N_FRAMES, HOP_LENGTH), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 16, HOP_LENGTH), lambda b: (b, 0, 0),
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
        )(x, e, bh, bl, mh, ml)
        return jnp.swapaxes(out, 1, 2)

    return fn


def main():
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((64, 480_000)).astype(np.float32) * 0.1)
    fn = build()

    @jax.jit
    def timed(a):
        return jnp.sum(fn(a)[:, 0, 0])

    timeit("vmem_pad_roll", timed, audio)
    a2 = audio[:2]
    got = np.asarray(fn(a2))
    cur = np.asarray(log_mel_spectrogram_pallas(a2, 80))
    print(json.dumps({"name": "vs_production_maxdiff",
                      "max": float(np.abs(got - cur).max())}))


if __name__ == "__main__":
    main()
