"""DSP parity tests: filterbank and log-mel vs independently computed goldens."""

import numpy as np
import pytest
import torch

from freud_tpu.audio.filters import mel_filterbank
from freud_tpu.audio.mel import log_mel_spectrogram, mels_from_array, pad_or_trim
from freud_tpu.constants import HOP_LENGTH, N_FFT, N_FRAMES, N_SAMPLES


def test_filterbank_matches_reference_asset(reference_mel_filters):
    for n_mels in (80, 128):
        ours = mel_filterbank(n_mels)
        ref = reference_mel_filters[f"mel_{n_mels}"]
        assert ours.shape == ref.shape == (n_mels, N_FFT // 2 + 1)
        np.testing.assert_allclose(ours, ref, rtol=0, atol=2e-8)


def _torch_golden_logmel(audio: np.ndarray, n_mels: int) -> np.ndarray:
    """Independent golden using torch.stft + the reference filterbank formulas."""
    x = torch.from_numpy(audio.astype(np.float32))
    window = torch.hann_window(N_FFT)
    stft = torch.stft(x, N_FFT, HOP_LENGTH, window=window, return_complex=True)
    mag = stft[..., :-1].abs() ** 2
    filters = torch.from_numpy(mel_filterbank(n_mels).copy())
    mel = filters @ mag
    log_spec = torch.clamp(mel, min=1e-10).log10()
    log_spec = torch.maximum(log_spec, log_spec.max() - 8.0)
    log_spec = (log_spec + 4.0) / 4.0
    return log_spec.numpy()


@pytest.mark.parametrize("n_mels", [80, 128])
def test_log_mel_matches_torch_stft(n_mels):
    rng = np.random.default_rng(0)
    audio = rng.standard_normal(N_SAMPLES).astype(np.float32) * 0.1
    ours = np.asarray(log_mel_spectrogram(audio, n_mels))
    golden = _torch_golden_logmel(audio, n_mels)
    assert ours.shape == (n_mels, N_FRAMES)
    np.testing.assert_allclose(ours, golden, rtol=2e-4, atol=2e-4)


def test_log_mel_batched_matches_per_file():
    rng = np.random.default_rng(1)
    batch = rng.standard_normal((3, N_SAMPLES)).astype(np.float32) * 0.05
    batch[1] *= 10.0  # distinct per-clip dynamic ranges exercise the per-clip floor
    batched = np.asarray(log_mel_spectrogram(batch, 80))
    for i in range(3):
        single = np.asarray(log_mel_spectrogram(batch[i], 80))
        np.testing.assert_allclose(batched[i], single, rtol=1e-6, atol=1e-6)


def test_pad_or_trim():
    short = np.ones(100, np.float32)
    padded = pad_or_trim(short)
    assert padded.shape == (N_SAMPLES,)
    assert padded[100:].sum() == 0
    long = np.ones(N_SAMPLES + 5, np.float32)
    assert pad_or_trim(long).shape == (N_SAMPLES,)


def test_mels_from_array_shape():
    audio = np.zeros(1000, np.float32)
    mel = np.asarray(mels_from_array(audio, 80))
    assert mel.shape == (80, N_FRAMES)
