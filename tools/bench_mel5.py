"""Locate the mel kernel's time: limb products vs mel proj vs VPU vs DMA.

Variants of ops/mel_pallas._kernel with pieces removed; timing-only (output
values are wrong for the ablated variants).
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

_TAIL = N_FFT - 2 * HOP_LENGTH
_ROWS = N_FRAMES + 8
_LN10 = float(np.log(10.0))


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


def make_kernel(n_limbs: int, do_power: bool, do_mel: bool, mel_precision):
    def _split_dot(a_hi, a_lo, b_hi, b_lo):
        out = jnp.dot(a_hi, b_hi, preferred_element_type=jnp.float32)
        if n_limbs >= 2:
            out += jnp.dot(a_hi, b_lo, preferred_element_type=jnp.float32)
        if n_limbs >= 3:
            out += jnp.dot(a_lo, b_hi, preferred_element_type=jnp.float32)
        if n_limbs >= 4:
            out += jnp.dot(a_lo, b_lo, preferred_element_type=jnp.float32)
        return out

    def _kernel(x_ref, bhi_ref, blo_ref, mel_ref, out_ref):
        x = x_ref[0]
        x_hi = x.astype(jnp.bfloat16)
        x_lo = (x - x_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        p0 = _split_dot(x_hi, x_lo, bhi_ref[0:HOP_LENGTH, :], blo_ref[0:HOP_LENGTH, :])
        p1 = _split_dot(x_hi, x_lo, bhi_ref[HOP_LENGTH:2 * HOP_LENGTH, :],
                        blo_ref[HOP_LENGTH:2 * HOP_LENGTH, :])
        p2 = _split_dot(x_hi[:, :_TAIL], x_lo[:, :_TAIL],
                        bhi_ref[2 * HOP_LENGTH:, :], blo_ref[2 * HOP_LENGTH:, :])
        proj = p0[0:N_FRAMES] + p1[1:N_FRAMES + 1] + p2[2:N_FRAMES + 2]
        if not do_power:
            out_ref[0] = proj[:, : out_ref.shape[-1]]
            return
        re = proj[:, :N_FREQS]
        im = proj[:, N_FREQS:]
        power = re * re + im * im
        if not do_mel:
            out_ref[0] = power[:, : out_ref.shape[-1]]
            return
        mel = jnp.dot(power, mel_ref[:], preferred_element_type=jnp.float32,
                      precision=mel_precision)
        out_ref[0] = jnp.log(jnp.maximum(mel, 1e-10)) * (1.0 / _LN10)

    return _kernel


def run_variant(name, n_limbs=4, do_power=True, do_mel=True,
                mel_precision=jax.lax.Precision.HIGHEST, n_mels=80):
    kern = make_kernel(n_limbs, do_power, do_mel, mel_precision)
    basis = np.asarray(_dft_basis(), np.float32)
    basis_hi = jnp.asarray(basis.astype(jnp.bfloat16))
    basis_lo = jnp.asarray((basis - np.float32(basis_hi)).astype(jnp.bfloat16))
    mel_t = jnp.asarray(mel_filterbank(n_mels).T)

    @jax.jit
    def fn(grid_audio):
        out = pl.pallas_call(
            kern,
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

    rng = np.random.default_rng(0)
    audio = rng.standard_normal((64, 480_000)).astype(np.float32) * 0.1
    pad = N_FFT // 2
    padded = np.pad(audio, ((0, 0), (pad, pad)), mode="reflect")
    need = _ROWS * HOP_LENGTH
    padded = np.pad(padded, ((0, 0), (0, need - padded.shape[1])))
    grid_audio = jnp.asarray(padded.reshape(64, _ROWS, HOP_LENGTH))
    timeit(name, fn, grid_audio)


def main():
    run_variant("baseline_limb4_highest")
    run_variant("limb3", n_limbs=3)
    run_variant("limb1", n_limbs=1)
    run_variant("mel_default_prec", mel_precision=None)
    run_variant("no_mel_proj", do_mel=False)
    run_variant("no_power_no_mel", do_power=False)


if __name__ == "__main__":
    main()
