"""Pallas fused mel kernel vs the XLA reference path (interpret mode on CPU)."""

import jax
import numpy as np
import pytest

from freud_tpu.audio.mel import log_mel_spectrogram
from freud_tpu.constants import N_FRAMES, N_SAMPLES
from freud_tpu.ops.mel_pallas import log_mel_spectrogram_pallas


def _assert_mel_close(got, want):
    """3e-4 for (essentially) every bin; isolated bins sitting exactly on the
    per-clip dynamic-range floor (max − 8) may clamp on one side only, so a
    ≤1-per-10⁵ tail is allowed up to a 2e-3 hard cap (still far below any
    bf16-precision failure mode)."""
    diff = np.abs(got - want)
    assert diff.max() < 2e-3, diff.max()
    frac_loose = np.mean(diff > 3e-4)
    assert frac_loose < 1e-5, frac_loose


@pytest.mark.parametrize("n_mels", [80, 128])
def test_pallas_mel_matches_xla(n_mels):
    rng = np.random.default_rng(0)
    audio = rng.standard_normal((2, N_SAMPLES)).astype(np.float32) * 0.1
    interpret = jax.default_backend() == "cpu"
    got = np.asarray(log_mel_spectrogram_pallas(audio, n_mels, interpret=interpret))
    want = np.asarray(log_mel_spectrogram(audio, n_mels))
    assert got.shape == (2, n_mels, N_FRAMES)
    _assert_mel_close(got, want)


def test_pallas_mel_single_clip():
    audio = np.zeros(N_SAMPLES, np.float32)
    audio[1000:2000] = 0.5
    interpret = jax.default_backend() == "cpu"
    got = np.asarray(log_mel_spectrogram_pallas(audio, 80, interpret=interpret))
    want = np.asarray(log_mel_spectrogram(audio, 80))
    assert got.shape == (80, N_FRAMES)
    _assert_mel_close(got, want)


def test_mel_kernel_partitions_without_gather():
    """Data-sharded audio through the mel kernel partitions per chip."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    from freud_tpu.parallel.mesh import make_mesh

    mesh = make_mesh()
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((8, N_SAMPLES)).astype(np.float32) * 0.1)
    sharded = jax.device_put(audio, NamedSharding(mesh, P("data")))
    interpret = jax.default_backend() == "cpu"

    fn = jax.jit(lambda a: log_mel_spectrogram_pallas(a, 80, interpret=interpret))
    out_s = fn(sharded)
    out_p = log_mel_spectrogram_pallas(audio, 80, interpret=interpret)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_p),
                               rtol=1e-5, atol=1e-5)
    txt = fn.lower(sharded).compile().as_text().lower()
    assert "all-gather" not in txt
