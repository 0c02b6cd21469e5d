"""Fused STFT + mel-filterbank Pallas TPU kernel.

The hop length divides the frame span as 400 = 2·160 + 80, so STFT framing
decomposes exactly into three row-shifted views of a (rows, 160) reshape of
the padded waveform: frame[j] = [rows[j] | rows[j+1] | rows[j+2][:80]].
XLA prepares those three shifted bands (cheap fused copies); the kernel then
computes, per (file, 600-frame tile), the windowed real-DFT as three MXU
matmuls against the matching row-bands of the basis, squares into the power
spectrum, projects through the mel filterbank, and takes log10 — never
writing the (T, 400) frame expansion or the (T, 201) power spectrogram to
HBM. Blocks are non-overlapping, so Pallas double-buffers the HBM→VMEM moves
automatically. The whisper dynamic-range floor (per-clip max − 8) + affine
run as a trivially fused XLA epilogue.

TPU-native replacement for the reference's ``torch.stft`` + filterbank matmul
(src/utils/audio_utils.py:147-194); numerical parity with freud_tpu.audio.mel
(and therefore the reference) is pinned by tests/test_mel_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..audio.filters import mel_filterbank
from ..audio.mel import N_FREQS, _dft_basis
from ..constants import HOP_LENGTH, N_FFT, N_FRAMES

TILE = 1000  # frames per kernel invocation (8-divisible); 3 tiles per 30 s window
_TAIL = N_FFT - 2 * HOP_LENGTH  # 80
_LN10 = float(np.log(10.0))


def _split_dot(a, b_hi, b_lo):
    """Limb-split matmul (4 bf16 products ≈ f32): Mosaic rejects
    lax.Precision.HIGH inside kernels and HIGHEST's 6 true-f32 passes
    measured 12.2 ms/batch-64 for the whole mel. Splitting each operand into
    bf16 hi+lo limbs and keeping all four products leaves only the ~2⁻²⁵
    limb-representation residual — well inside the 3e-4 golden tolerance vs
    torch.stft (tests/test_mel_pallas.py; dropping lo·lo was measurably NOT
    enough for near-cancelled DFT bins). Basis limbs precomputed host-side;
    the audio tile splits on the VPU."""
    a_hi = a.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    out = jnp.dot(a_hi, b_hi, preferred_element_type=jnp.float32)
    out += jnp.dot(a_hi, b_lo, preferred_element_type=jnp.float32)
    out += jnp.dot(a_lo, b_hi, preferred_element_type=jnp.float32)
    out += jnp.dot(a_lo, b_lo, preferred_element_type=jnp.float32)
    return out


def _kernel(a0, a1, a2, bhi_ref, blo_ref, mel_ref, out_ref):
    proj = _split_dot(
        a0[0], bhi_ref[0:HOP_LENGTH, :], blo_ref[0:HOP_LENGTH, :]
    )
    proj += _split_dot(
        a1[0],
        bhi_ref[HOP_LENGTH : 2 * HOP_LENGTH, :],
        blo_ref[HOP_LENGTH : 2 * HOP_LENGTH, :],
    )
    proj += _split_dot(
        a2[0], bhi_ref[2 * HOP_LENGTH :, :], blo_ref[2 * HOP_LENGTH :, :]
    )

    re = proj[:, :N_FREQS]
    im = proj[:, N_FREQS:]
    power = re * re + im * im  # (TILE, N_FREQS)

    # the mel projection is tiny (201→n_mels); keep it at true f32
    mel = jnp.dot(
        power, mel_ref[:], preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    out_ref[0] = jnp.log(jnp.maximum(mel, 1e-10)) * (1.0 / _LN10)


@functools.partial(jax.jit, static_argnames=("n_mels", "interpret"))
def log_mel_spectrogram_pallas(
    audio: jnp.ndarray, n_mels: int = 80, interpret: bool = False
) -> jnp.ndarray:
    """(B, 480000) waveforms → (B, n_mels, 3000) whisper log-mels."""
    if audio.ndim == 1:
        return log_mel_spectrogram_pallas(audio[None], n_mels, interpret)[0]
    B = audio.shape[0]
    n_tiles = N_FRAMES // TILE

    pad = N_FFT // 2
    padded = jnp.pad(audio, ((0, 0), (pad, pad)), mode="reflect")
    rows_total = N_FRAMES + 3
    need = rows_total * HOP_LENGTH
    padded = jnp.pad(padded, ((0, 0), (0, need - padded.shape[1])))
    grid_audio = padded.reshape(B, rows_total, HOP_LENGTH)
    band0 = grid_audio[:, 0:N_FRAMES, :]
    band1 = grid_audio[:, 1 : N_FRAMES + 1, :]
    band2 = grid_audio[:, 2 : N_FRAMES + 2, :_TAIL]

    basis = _dft_basis()  # (N_FFT, 2*N_FREQS), hann pre-folded — numpy f64/f32
    basis = np.asarray(basis, np.float32)
    basis_hi = basis.astype(jnp.bfloat16)
    basis_lo = (basis - basis_hi.astype(np.float32)).astype(jnp.bfloat16)
    mel_t = jnp.asarray(mel_filterbank(n_mels).T)  # (N_FREQS, n_mels)

    log_spec = pl.pallas_call(
        _kernel,
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec(
                (1, TILE, HOP_LENGTH), lambda b, t: (b, t, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, TILE, HOP_LENGTH), lambda b, t: (b, t, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, TILE, _TAIL), lambda b, t: (b, t, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (N_FFT, 2 * N_FREQS), lambda b, t: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (N_FFT, 2 * N_FREQS), lambda b, t: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (N_FREQS, n_mels), lambda b, t: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, TILE, n_mels), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, N_FRAMES, n_mels), jnp.float32),
        interpret=interpret,
    )(band0, band1, band2, jnp.asarray(basis_hi), jnp.asarray(basis_lo), mel_t)

    # whisper epilogue: per-clip dynamic-range floor + affine (fused by XLA)
    gmax = jnp.max(log_spec, axis=(1, 2), keepdims=True)
    log_spec = jnp.maximum(log_spec, gmax - 8.0)
    log_spec = (log_spec + 4.0) / 4.0
    return jnp.swapaxes(log_spec, 1, 2)
