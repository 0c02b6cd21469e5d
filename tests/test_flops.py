"""Analytic FLOP accounting (freud_tpu/flops.py) — the MFU inputs."""

import numpy as np

from freud_tpu import flops
from freud_tpu.models.whisper import dims_for


def test_peak_for_kind_longest_prefix_wins():
    # v5p must NOT fall into the shorter "TPU v5" entry
    assert flops.peak_for_kind("TPU v5p") == 459e12
    assert flops.peak_for_kind("TPU v5 lite") == 197e12
    assert flops.peak_for_kind("TPU v5") == 197e12
    assert flops.peak_for_kind("TPU v6e") == 918e12
    assert flops.peak_for_kind("TPU v9 future") == 197e12  # conservative
    assert flops.peak_for_kind("") is None


def test_encoder_flops_scaling():
    tiny = flops.encoder_flops(dims_for("tiny"))
    large = flops.encoder_flops(dims_for("large-v3"))
    # tiny ≈ 38 GFLOP/file (4 blocks of 24·T·d² + 4·T²·d at d=384 + stem)
    assert 3e10 < tiny < 5e10
    assert large > 20 * tiny  # 32 layers at d=1280
    assert flops.encoder_flops(dims_for("tiny"), include_mel=False) < tiny


def test_sae_step_flops():
    rows, d, n = 150_000, 384, 6144
    l1 = flops.sae_l1_step_flops(rows, d, n)
    topk = flops.sae_topk_step_flops(rows, d, n)
    assert l1 == 5 * 2.0 * rows * d * n
    assert topk == 8 * 2.0 * rows * d * n
    assert flops.sae_topk_step_flops(rows, d, n, auxk_live=False) \
        == 6 * 2.0 * rows * d * n


def test_decode_flops_monotonic_in_tokens():
    dims = dims_for("tiny")
    f8 = flops.decode_flops(dims, n_clips=8, tokens_per_clip=8)
    f224 = flops.decode_flops(dims, n_clips=8, tokens_per_clip=224)
    assert 0 < f8 < f224
    # per-clip encoder work alone is a lower bound
    assert f8 > 8 * flops.encoder_flops(dims)


def test_mfu_pct_off_tpu_is_none_or_positive():
    v = flops.mfu_pct(1e12, 1.0)
    assert v is None or v > 0
    assert np.isfinite(flops.mel_flops(80))
