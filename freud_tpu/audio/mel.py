"""Log-mel spectrogram front end, as pure JAX.

Reproduces the reference DSP pipeline (src/utils/audio_utils.py:147-194) —
periodic Hann window, centered STFT (reflect padding) with N_FFT=400 /
HOP_LENGTH=160, last frame dropped, power magnitudes, Slaney mel filterbank,
``log10(clamp(1e-10))``, an 8-decade dynamic-range floor relative to the
per-clip max, and the ``(x + 4) / 4`` affine — but expressed as framed
matmuls against an explicit real-DFT basis so the whole thing is one fused
XLA (or Pallas, see freud_tpu.ops.mel_pallas) program on TPU: no FFT
library, no host round trips, batched over files.
"""

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import HOP_LENGTH, N_FFT, N_FRAMES, N_SAMPLES
from .filters import mel_filterbank

N_FREQS = N_FFT // 2 + 1  # 201 one-sided bins


@lru_cache(maxsize=None)
def _dft_basis() -> np.ndarray:
    """Windowed real-DFT analysis basis, shape (N_FFT, 2 * N_FREQS).

    Column block [0:201] = cos terms, [201:402] = -sin terms, each pre-scaled
    by the periodic Hann window so framing + windowing + DFT is one matmul.
    """
    n = np.arange(N_FFT, dtype=np.float64)
    k = np.arange(N_FREQS, dtype=np.float64)
    ang = 2.0 * np.pi * np.outer(n, k) / N_FFT
    hann = 0.5 * (1.0 - np.cos(2.0 * np.pi * n / N_FFT))  # periodic Hann
    basis = np.concatenate([np.cos(ang), -np.sin(ang)], axis=1)
    return (basis * hann[:, None]).astype(np.float32)


def reflect_pad_center(audio: jnp.ndarray) -> jnp.ndarray:
    """Center the STFT: reflect-pad N_FFT//2 samples on both ends (last axis)."""
    pad = N_FFT // 2
    cfg = [(0, 0)] * (audio.ndim - 1) + [(pad, pad)]
    return jnp.pad(audio, cfg, mode="reflect")


def frame_signal(padded: jnp.ndarray, n_frames: int) -> jnp.ndarray:
    """Overlapping (…, n_frames, N_FFT) frames of a padded (…, samples) signal.

    Because HOP_LENGTH divides N_FFT's span neatly (400 = 2×160 + 80), framing
    decomposes into three shifted slices of a (…, blocks, HOP) reshape — no
    gather, so XLA lowers it to cheap vectorized copies on TPU.
    """
    blocks = n_frames + 3  # covers frame (n_frames-1) start + N_FFT span
    need = blocks * HOP_LENGTH
    extra = need - padded.shape[-1]
    if extra > 0:
        cfg = [(0, 0)] * (padded.ndim - 1) + [(0, extra)]
        padded = jnp.pad(padded, cfg)
    grid = padded[..., :need].reshape(*padded.shape[:-1], blocks, HOP_LENGTH)
    return jnp.concatenate(
        [
            grid[..., 0:n_frames, :],
            grid[..., 1 : n_frames + 1, :],
            grid[..., 2 : n_frames + 2, : N_FFT - 2 * HOP_LENGTH],
        ],
        axis=-1,
    )


def power_spectrogram(audio: jnp.ndarray, n_frames: int) -> jnp.ndarray:
    """|STFT|^2 of a (…, samples) waveform → (…, n_frames, N_FREQS)."""
    frames = frame_signal(reflect_pad_center(audio), n_frames)
    return framed_power(frames)


def framed_power(frames: jnp.ndarray) -> jnp.ndarray:
    """|DFT|² of already-framed (…, T, N_FFT) windows → (…, T, N_FREQS)."""
    # HIGHEST keeps the DFT in true f32 on the MXU (default would be bf16).
    proj = jnp.dot(
        frames, jnp.asarray(_dft_basis()), precision=jax.lax.Precision.HIGHEST
    )
    re, im = proj[..., :N_FREQS], proj[..., N_FREQS:]
    return re * re + im * im


def framed_log10_mel(frames: jnp.ndarray, n_mels: int) -> jnp.ndarray:
    """(…, T, N_FFT) framed windows → (…, T, n_mels) UNFLOORED log10-mel.

    The projection core (DFT → power → mel bank → log10/clip) shared by the
    standard 30-s path below and the long-audio chunker
    (models/whisper/long_audio._chunk_log10_mel) — precision/clipping fixes
    live in exactly one place."""
    from .filters import mel_filterbank

    mel = jnp.dot(
        framed_power(frames),
        jnp.asarray(mel_filterbank(n_mels).T),
        precision=jax.lax.Precision.HIGHEST,
    )
    return jnp.log10(jnp.clip(mel, min=1e-10))


def log_mel_spectrogram(
    audio: jnp.ndarray, n_mels: int = 80, n_frames: int = N_FRAMES
) -> jnp.ndarray:
    """Whisper-style log-mel of (…, N_SAMPLES) audio → (…, n_mels, n_frames).

    The dynamic-range floor (max - 8) is applied per clip, matching the
    reference's per-file invocation pattern (one clip per call,
    src/utils/audio_utils.py:102-123).
    """
    frames = frame_signal(reflect_pad_center(audio), n_frames)
    log_spec = framed_log10_mel(frames, n_mels)  # (…, T, n_mels)
    peak = jnp.max(log_spec, axis=(-2, -1), keepdims=True)
    log_spec = jnp.maximum(log_spec, peak - 8.0)
    log_spec = (log_spec + 4.0) / 4.0
    return jnp.swapaxes(log_spec, -1, -2)  # (…, n_mels, T)


def pad_or_trim(array: np.ndarray, length: int = N_SAMPLES, *, axis: int = -1):
    """Pad with zeros or truncate along ``axis`` to exactly ``length`` samples.

    Host-side numpy analogue of the reference helper (audio_utils.py:76-99).
    """
    n = array.shape[axis]
    if n > length:
        array = np.take(array, np.arange(length), axis=axis)
    elif n < length:
        widths = [(0, 0)] * array.ndim
        widths[axis] = (0, length - n)
        array = np.pad(array, widths)
    return array


def trim_audio(
    array: np.ndarray, start_time: float, end_time: float, sample_rate: int = 16_000
) -> np.ndarray:
    """Slice a waveform to a [start, end] second range (audio_utils.py:61-73)."""
    return array[int(sample_rate * start_time) : int(sample_rate * end_time)]


def batched_log_mel(audio: jnp.ndarray, n_mels: int) -> jnp.ndarray:
    """Backend-dispatched log-mel: fused Pallas kernel on TPU, XLA elsewhere.

    Both paths are numerically equivalent (tests/test_mel_pallas.py); the
    Pallas kernel keeps framing/power entirely in VMEM.
    """
    if jax.default_backend() == "tpu":
        from ..ops.mel_pallas import log_mel_spectrogram_pallas

        return log_mel_spectrogram_pallas(audio, n_mels)
    return log_mel_spectrogram(audio, n_mels)


from functools import partial as _partial


@_partial(jax.jit, static_argnames=("n_mels",))
def batched_log_mel_jit(audio, n_mels: int):
    """Module-level jitted ``batched_log_mel`` — one compiled executable
    shared by every pipeline instance (per-instance ``jax.jit(lambda …)``
    closures each reload the program, seconds apiece on remote backends)."""
    return batched_log_mel(audio, n_mels)


@jax.jit
def _mels_jit_80(audio):
    return log_mel_spectrogram(audio, 80)


@jax.jit
def _mels_jit_128(audio):
    return log_mel_spectrogram(audio, 128)


def mels_from_array(audio: np.ndarray, n_mels: int) -> jnp.ndarray:
    """Pad/trim a 1-D waveform to 30 s and compute its log-mel on device."""
    if n_mels not in (80, 128):
        # whisper models use exactly these two banks; a silent 128-mel
        # fallback for any other value would feed wrong-width features
        raise ValueError(f"n_mels must be 80 or 128, got {n_mels}")
    audio = pad_or_trim(np.asarray(audio, dtype=np.float32).reshape(-1))
    fn = _mels_jit_80 if n_mels == 80 else _mels_jit_128
    return fn(jnp.asarray(audio))
