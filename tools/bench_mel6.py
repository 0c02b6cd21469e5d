"""Production mel path vs kernel-only: where the wrapper time goes.

Variants: full production fn; production minus epilogue; production minus
transpose; epilogue folded into the kernel (per-file max in VMEM).
"""

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
from freud_tpu.ops.mel_pallas import _ROWS, _kernel, log_mel_spectrogram_pallas

_LN10 = float(np.log(10.0))
_TAIL = N_FFT - 2 * HOP_LENGTH


def timeit(name, fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    float(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(out)
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({"name": name, "ms_b64": round(dt * 1e3, 3)}))
    sys.stdout.flush()


def _fused_kernel(x_ref, bhi_ref, blo_ref, mel_ref, out_ref):
    """_kernel + whisper epilogue (per-clip floor + affine) in VMEM."""
    x = x_ref[0]
    x_hi = x.astype(jnp.bfloat16)
    x_lo = (x - x_hi.astype(jnp.float32)).astype(jnp.bfloat16)

    def _split_dot(a_hi, a_lo, b_hi, b_lo):
        out = jnp.dot(a_hi, b_hi, preferred_element_type=jnp.float32)
        out += jnp.dot(a_hi, b_lo, preferred_element_type=jnp.float32)
        out += jnp.dot(a_lo, b_hi, preferred_element_type=jnp.float32)
        out += jnp.dot(a_lo, b_lo, preferred_element_type=jnp.float32)
        return out

    p0 = _split_dot(x_hi, x_lo, bhi_ref[0:HOP_LENGTH, :], blo_ref[0:HOP_LENGTH, :])
    p1 = _split_dot(x_hi, x_lo, bhi_ref[HOP_LENGTH:2 * HOP_LENGTH, :],
                    blo_ref[HOP_LENGTH:2 * HOP_LENGTH, :])
    p2 = _split_dot(x_hi[:, :_TAIL], x_lo[:, :_TAIL],
                    bhi_ref[2 * HOP_LENGTH:, :], blo_ref[2 * HOP_LENGTH:, :])
    proj = p0[0:N_FRAMES] + p1[1:N_FRAMES + 1] + p2[2:N_FRAMES + 2]
    re = proj[:, :N_FREQS]
    im = proj[:, N_FREQS:]
    power = re * re + im * im
    mel = jnp.dot(power, mel_ref[:], preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    log_spec = jnp.log(jnp.maximum(mel, 1e-10)) * (1.0 / _LN10)
    gmax = jnp.max(log_spec)
    log_spec = jnp.maximum(log_spec, gmax - 8.0)
    out_ref[0] = (log_spec + 4.0) / 4.0


def run_fused_epilogue(n_mels=80):
    basis = np.asarray(_dft_basis(), np.float32)
    basis_hi = jnp.asarray(basis.astype(jnp.bfloat16))
    basis_lo = jnp.asarray((basis - np.float32(basis_hi)).astype(jnp.bfloat16))
    mel_t = jnp.asarray(mel_filterbank(n_mels).T)

    @jax.jit
    def fn(audio):
        pad = N_FFT // 2
        padded = jnp.pad(audio, ((0, 0), (pad, pad)), mode="reflect")
        need = _ROWS * HOP_LENGTH
        padded = jnp.pad(padded, ((0, 0), (0, need - padded.shape[1])))
        grid_audio = padded.reshape(audio.shape[0], _ROWS, HOP_LENGTH)
        out = pl.pallas_call(
            _fused_kernel,
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
            ],
            out_specs=pl.BlockSpec((1, N_FRAMES, n_mels), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(
                (grid_audio.shape[0], N_FRAMES, n_mels), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=80 * 1024 * 1024),
        )(grid_audio, basis_hi, basis_lo, mel_t)
        out = jnp.swapaxes(out, 1, 2)
        return jnp.sum(out[:, 0, 0])

    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((64, 480_000)).astype(np.float32) * 0.1)
    timeit("fused_epilogue_in_kernel", fn, audio)

    @jax.jit
    def fn_no_t(audio):
        pad = N_FFT // 2
        padded = jnp.pad(audio, ((0, 0), (pad, pad)), mode="reflect")
        need = _ROWS * HOP_LENGTH
        padded = jnp.pad(padded, ((0, 0), (0, need - padded.shape[1])))
        grid_audio = padded.reshape(audio.shape[0], _ROWS, HOP_LENGTH)
        out = pl.pallas_call(
            _fused_kernel,
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
            ],
            out_specs=pl.BlockSpec((1, N_FRAMES, n_mels), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(
                (grid_audio.shape[0], N_FRAMES, n_mels), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=80 * 1024 * 1024),
        )(grid_audio, basis_hi, basis_lo, mel_t)
        return jnp.sum(out[:, 0, 0])

    timeit("fused_epilogue_no_transpose", fn_no_t, audio)


def main():
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((64, 480_000)).astype(np.float32) * 0.1)

    @jax.jit
    def prod(a):
        m = log_mel_spectrogram_pallas(a, 80)
        return jnp.sum(m[:, 0, 0])

    timeit("production_full", prod, audio)
    run_fused_epilogue()


if __name__ == "__main__":
    main()
