"""Mel filterbank construction.

The reference ships a precomputed librosa filterbank asset
(src/assets/mel_filters.npz, provenance comment src/utils/audio_utils.py:126-144:
``librosa.filters.mel(sr=16000, n_fft=400, n_mels=80/128)``). Rather than bundling
a binary blob, we regenerate the identical filterbank from the published
Slaney-mel formulas (librosa defaults: ``htk=False``, ``norm="slaney"``,
``fmin=0``, ``fmax=sr/2``). A golden test checks fp32 equality against the
reference asset.
"""

from functools import lru_cache

import numpy as np

from ..constants import N_FFT, SAMPLE_RATE

# Slaney auditory-toolbox mel scale: linear below 1 kHz, logarithmic above.
_F_MIN = 0.0
_F_SP = 200.0 / 3.0
_MIN_LOG_HZ = 1000.0
_MIN_LOG_MEL = (_MIN_LOG_HZ - _F_MIN) / _F_SP
_LOGSTEP = np.log(6.4) / 27.0


def hz_to_mel(freq):
    freq = np.asanyarray(freq, dtype=np.float64)
    mels = (freq - _F_MIN) / _F_SP
    log_region = freq >= _MIN_LOG_HZ
    mels = np.where(
        log_region,
        _MIN_LOG_MEL + np.log(np.maximum(freq, _MIN_LOG_HZ) / _MIN_LOG_HZ) / _LOGSTEP,
        mels,
    )
    return mels


def mel_to_hz(mels):
    mels = np.asanyarray(mels, dtype=np.float64)
    freqs = _F_MIN + _F_SP * mels
    log_region = mels >= _MIN_LOG_MEL
    freqs = np.where(
        log_region,
        _MIN_LOG_HZ * np.exp(_LOGSTEP * (np.maximum(mels, _MIN_LOG_MEL) - _MIN_LOG_MEL)),
        freqs,
    )
    return freqs


@lru_cache(maxsize=None)
def mel_filterbank(
    n_mels: int, sr: int = SAMPLE_RATE, n_fft: int = N_FFT
) -> np.ndarray:
    """Slaney-normalized triangular mel filterbank, shape (n_mels, n_fft//2 + 1).

    Numerically matches ``librosa.filters.mel(sr, n_fft, n_mels)`` (float32).
    """
    fmax = sr / 2.0
    n_freqs = n_fft // 2 + 1
    fft_freqs = np.linspace(0.0, sr / 2.0, n_freqs)

    mel_pts = np.linspace(hz_to_mel(_F_MIN), hz_to_mel(fmax), n_mels + 2)
    hz_pts = mel_to_hz(mel_pts)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts.reshape(-1, 1) - fft_freqs.reshape(1, -1)

    lower = -ramps[:-2] / fdiff[:-1].reshape(-1, 1)
    upper = ramps[2:] / fdiff[1:].reshape(-1, 1)
    weights = np.maximum(0.0, np.minimum(lower, upper))

    # Slaney-style area normalization.
    enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
    weights *= enorm.reshape(-1, 1)

    out = weights.astype(np.float32)
    # the lru_cache hands THIS array to every caller: freeze it so an
    # in-place mutation can't silently poison every later mel computation
    out.setflags(write=False)
    return out
