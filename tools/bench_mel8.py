"""Candidate production mel kernel: limb3 DFT + limb3 mel proj + in-kernel
epilogue. Timing + accuracy vs the current production kernel and vs f64."""

from __future__ import annotations

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
from freud_tpu.ops.mel_pallas import _ROWS, log_mel_spectrogram_pallas

sys.path.insert(0, "/root/repo/tools")
from bench_mel6 import timeit  # noqa: E402

_LN10 = float(np.log(10.0))
_TAIL = N_FFT - 2 * HOP_LENGTH


def _limb3_dot(a_hi, a_lo, b_hi, b_lo):
    out = jnp.dot(a_hi, b_hi, preferred_element_type=jnp.float32)
    out += jnp.dot(a_hi, b_lo, preferred_element_type=jnp.float32)
    out += jnp.dot(a_lo, b_hi, preferred_element_type=jnp.float32)
    return out


def _kernel(x_ref, bhi_ref, blo_ref, mhi_ref, mlo_ref, out_ref):
    x = x_ref[0]
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


def candidate(audio, n_mels=80):
    basis = np.asarray(_dft_basis(), np.float32)
    basis_hi = jnp.asarray(basis.astype(jnp.bfloat16))
    basis_lo = jnp.asarray((basis - np.float32(basis_hi)).astype(jnp.bfloat16))
    melf = mel_filterbank(n_mels).T.astype(np.float32)
    mel_hi = jnp.asarray(melf.astype(jnp.bfloat16))
    mel_lo = jnp.asarray((melf - np.float32(mel_hi)).astype(jnp.bfloat16))

    @jax.jit
    def fn(audio):
        pad = N_FFT // 2
        padded = jnp.pad(audio, ((0, 0), (pad, pad)), mode="reflect")
        need = _ROWS * HOP_LENGTH
        padded = jnp.pad(padded, ((0, 0), (0, need - padded.shape[1])))
        grid_audio = padded.reshape(audio.shape[0], _ROWS, HOP_LENGTH)
        out = pl.pallas_call(
            _kernel,
            grid=(grid_audio.shape[0],),
            in_specs=[
                pl.BlockSpec((1, _ROWS, HOP_LENGTH), lambda b: (b, 0, 0),
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
            out_shape=jax.ShapeDtypeStruct(
                (grid_audio.shape[0], N_FRAMES, n_mels), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=80 * 1024 * 1024),
        )(grid_audio, basis_hi, basis_lo, mel_hi, mel_lo)
        return jnp.swapaxes(out, 1, 2)

    return fn


def main():
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((64, 480_000)).astype(np.float32) * 0.1)
    fn = candidate(audio)

    @jax.jit
    def timed(a):
        return jnp.sum(fn(a)[:, 0, 0])

    timeit("candidate_limb3_fused", timed, audio)

    # accuracy vs current production kernel on the TPU
    a2 = audio[:2]
    got = np.asarray(fn(a2), np.float64)
    cur = np.asarray(log_mel_spectrogram_pallas(a2, 80), np.float64)
    diff = np.abs(got - cur)
    print(json.dumps({"name": "vs_production", "max": float(diff.max()),
                      "frac_gt_3e-4": float(np.mean(diff > 3e-4))}))

    # accuracy vs f64 host computation of the same math
    from freud_tpu.audio import mel as mel_mod
    a_np = np.asarray(a2, np.float64)
    pad = N_FFT // 2
    padded = np.pad(a_np, ((0, 0), (pad, pad)), mode="reflect")
    basis64 = np.asarray(_dft_basis(), np.float64)
    frames = np.stack(
        [padded[:, i * HOP_LENGTH:i * HOP_LENGTH + N_FFT] for i in range(N_FRAMES)],
        axis=1,
    )  # (2, 3000, 400)
    proj = frames @ basis64
    power = proj[..., :N_FREQS] ** 2 + proj[..., N_FREQS:] ** 2
    mel = power @ mel_filterbank(80).T.astype(np.float64)
    log_spec = np.log10(np.maximum(mel, 1e-10))
    gmax = log_spec.max(axis=(1, 2), keepdims=True)
    log_spec = np.maximum(log_spec, gmax - 8.0)
    want = ((log_spec + 4.0) / 4.0).swapaxes(1, 2)
    diff = np.abs(got - want)
    print(json.dumps({"name": "vs_f64", "max": float(diff.max()),
                      "frac_gt_3e-4": float(np.mean(diff > 3e-4))}))


if __name__ == "__main__":
    main()
