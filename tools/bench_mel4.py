"""Mel: accuracy of f32-default in-kernel dots on TPU + XLA path timing."""

from __future__ import annotations

import json
import sys
import time

import numpy as np

import freud_tpu  # noqa: F401
import jax
import jax.numpy as jnp


def main():
    rng = np.random.default_rng(0)
    audio64 = rng.standard_normal((64, 480_000)).astype(np.float32) * 0.1

    from freud_tpu.audio import mel as mel_mod

    # XLA framed-matmul path on TPU, b64 timing
    @jax.jit
    def xla_mel(a):
        m = mel_mod.log_mel_spectrogram(a, 80)
        return m, jnp.sum(m[:, 0, :])

    a64 = jnp.asarray(audio64)
    for _ in range(3):
        _, s = xla_mel(a64)
    float(s)
    t0 = time.perf_counter()
    for _ in range(10):
        _, s = xla_mel(a64)
    float(s)
    print(json.dumps({"name": "mel_xla_path_b64_tpu",
                      "ms": round((time.perf_counter() - t0) / 10 * 1e3, 3)}))
    sys.stdout.flush()

    # accuracy: pallas (current limb4) and XLA-on-TPU vs the f64 numpy golden
    from freud_tpu.ops.mel_pallas import log_mel_spectrogram_pallas
    from freud_tpu.audio.mel import _dft_basis
    from freud_tpu.audio.filters import mel_filterbank

    a2 = audio64[:2]
    got_pallas = np.asarray(log_mel_spectrogram_pallas(jnp.asarray(a2), 80))
    got_xla = np.asarray(xla_mel(jnp.asarray(a2[:2]))[0]) if False else None
    m_xla, _ = xla_mel(a64)  # reuse compiled; slice later

    # f64 golden on host
    basis = np.asarray(_dft_basis(), np.float64)
    melw = np.asarray(mel_filterbank(80), np.float64)  # (80, 201)
    out = []
    for clip in a2:
        padded = np.pad(clip.astype(np.float64), 200, mode="reflect")
        frames = np.stack([padded[i * 160:i * 160 + 400] for i in range(3000)])
        proj = frames @ basis
        power = proj[:, :201] ** 2 + proj[:, 201:] ** 2
        mel = power @ melw.T
        log = np.log10(np.maximum(mel, 1e-10))
        log = np.maximum(log, log.max() - 8.0)
        out.append(((log + 4.0) / 4.0).T)
    golden = np.stack(out)

    d_pallas = np.abs(got_pallas - golden)
    print(json.dumps({"name": "pallas_vs_f64_maxdiff",
                      "max": float(d_pallas.max()),
                      "p999": float(np.quantile(d_pallas, 0.999))}))
    m_xla2 = np.asarray(m_xla)[:2]
    d_xla = np.abs(m_xla2 - golden)
    print(json.dumps({"name": "xla_tpu_vs_f64_maxdiff",
                      "max": float(d_xla.max()),
                      "p999": float(np.quantile(d_xla, 0.999))}))
    print(json.dumps({"name": "done"}))


if __name__ == "__main__":
    main()
