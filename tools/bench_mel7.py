"""Padding-path ablation for the mel kernel wrapper.

The production wrapper does reflect-pad → zero-pad → reshape (potentially 3
XLA materializations of the 123 MB waveform). Variant: ONE concatenate
[reversed 200-sample head | audio | zero tail] then the free contiguous
reshape, plus the in-kernel epilogue from bench_mel6.
"""

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
from freud_tpu.ops.mel_pallas import _ROWS

sys.path.insert(0, "/root/repo/tools")
from bench_mel6 import _fused_kernel, timeit  # noqa: E402


def main(n_mels=80):
    basis = np.asarray(_dft_basis(), np.float32)
    basis_hi = jnp.asarray(basis.astype(jnp.bfloat16))
    basis_lo = jnp.asarray((basis - np.float32(basis_hi)).astype(jnp.bfloat16))
    mel_t = jnp.asarray(mel_filterbank(n_mels).T)

    def call(grid_audio):
        return pl.pallas_call(
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

    pad = N_FFT // 2

    @jax.jit
    def concat_pad(audio):
        B = audio.shape[0]
        head = audio[:, pad:0:-1]                      # reflect, 200 samples
        need = _ROWS * HOP_LENGTH
        tail = jnp.zeros((B, need - audio.shape[1] - pad), audio.dtype)
        padded = jnp.concatenate([head, audio, tail], axis=1)
        out = call(padded.reshape(B, _ROWS, HOP_LENGTH))
        out = jnp.swapaxes(out, 1, 2)
        return jnp.sum(out[:, 0, 0])

    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((64, 480_000)).astype(np.float32) * 0.1)
    timeit("concat_pad_fused_epilogue", concat_pad, audio)

    # numerical identity with the two-pad formulation
    @jax.jit
    def two_pad(audio):
        padded = jnp.pad(audio, ((0, 0), (pad, pad)), mode="reflect")
        need = _ROWS * HOP_LENGTH
        padded = jnp.pad(padded, ((0, 0), (0, need - padded.shape[1])))
        return call(padded.reshape(audio.shape[0], _ROWS, HOP_LENGTH))

    @jax.jit
    def one_pad(audio):
        B = audio.shape[0]
        head = audio[:, pad:0:-1]
        need = _ROWS * HOP_LENGTH
        tail = jnp.zeros((B, need - audio.shape[1] - pad), audio.dtype)
        padded = jnp.concatenate([head, audio, tail], axis=1)
        return call(padded.reshape(B, _ROWS, HOP_LENGTH))

    a2 = audio[:2]
    d = jnp.max(jnp.abs(two_pad(a2) - one_pad(a2)))
    print(json.dumps({"name": "identity_max_abs_diff", "val": float(d)}))


if __name__ == "__main__":
    main()
