"""Analytic FLOP accounting for the headline pipelines → MFU.

The reference publishes no utilization numbers (BASELINE.md); every "at the
floor" claim in this repo previously lived in prose decompositions under
tools/ (bench_large2.py, bench_topk11.py, bench_attn4.py). This module makes
them machine-checkable: bench.py computes analytic matmul FLOPs per headline
row and prints ``mfu_pct`` against the chip's MXU peak for the dtype used.

Conventions (matching the tools/ decompositions):

* A matmul of shapes (M, K) × (K, N) counts 2·M·K·N FLOPs.
* Only matmul/conv FLOPs count — elementwise/VPU work (softmax, gelu, the
  TopK bisection) is excluded, so MFU here is a *matmul* utilization; rows
  whose floor is VPU- or HBM-bound (tiny_topk, serving decode) will read low
  by construction, and that gap IS the measurement (see ROADMAP.md round-3
  §1: the bisection is ~9 ms of the 30 ms TopK step).
* Attention scores/values count the dense 4·T²·d (the kernels compute
  exactly this; dh=64 MXU under-utilization is a rate problem, not a FLOP
  problem).
"""

from __future__ import annotations

import jax

# MXU peak dense-matmul rates, FLOP/s. bf16 figures from the public chip
# specs (v5e ≈ 197 TFLOP/s — the rate all tools/ floor decompositions use).
# f32 on TPU MXUs runs via bf16x3 passes ≈ 1/3 the bf16 rate; XLA's default
# f32 matmul precision on TPU is single-pass bf16 inputs with f32
# accumulation, which runs AT the bf16 rate — so the honest f32-peak choice
# depends on precision config. We report MFU against the bf16 peak for both
# dtypes (the default-precision truth), and callers can override.
_PEAK_BF16: dict[str, float] = {
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v5": 197e12,
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,
    "TPU v6e": 918e12,
}


def peak_for_kind(kind: str) -> float | None:
    """bf16 MXU peak for a device_kind string (longest prefix wins:
    "TPU v5p" must not fall into the "TPU v5" entry)."""
    for name in sorted(_PEAK_BF16, key=len, reverse=True):
        if kind.startswith(name):
            return _PEAK_BF16[name]
    return 197e12 if kind else None


def device_peak_flops() -> float | None:
    """MXU bf16 peak of the attached accelerator, or None off-TPU (MFU is
    meaningless against a host CPU)."""
    dev = jax.devices()[0]
    if dev.platform not in ("tpu",):
        return None
    return peak_for_kind(getattr(dev, "device_kind", ""))


def mfu_pct(total_flops: float, elapsed_s: float) -> float | None:
    """Model FLOPs utilization (percent) vs the attached chip's MXU peak."""
    peak = device_peak_flops()
    if peak is None or elapsed_s <= 0:
        return None
    return 100.0 * total_flops / elapsed_s / peak


# -- whisper encoder ---------------------------------------------------------

def mel_flops(n_mels: int, n_frames_in: int = 3000) -> float:
    """Framed-matmul DFT + mel projection (audio/mel.py geometry): each of
    the ``n_frames_in`` hops multiplies a 400-sample window by the packed
    (400, 2·201) DFT basis, then (201,)·(201, n_mels)."""
    n_fft, n_freq = 400, 201
    dft = 2.0 * n_frames_in * n_fft * (2 * n_freq)
    mel = 2.0 * n_frames_in * n_freq * n_mels
    return dft + mel


def encoder_flops(dims, include_mel: bool = True) -> float:
    """Forward FLOPs for ONE 30-s file through the Whisper encoder
    (conv stem + n_audio_layer blocks at T=1500), the collection hot path
    (reference runs the same geometry via torch conv/attention —
    src/whisper wrapping in hooked_model.py)."""
    d, t = dims.n_audio_state, dims.n_audio_ctx
    t_in = 2 * t  # conv1 runs at 3000 frames; conv2 strides to 1500
    conv1 = 2.0 * t_in * 3 * dims.n_mels * d
    conv2 = 2.0 * t * 3 * d * d
    # per block: qkv+out projections 4·(2·T·d²), scores+values 2·(2·T²·d),
    # mlp 2·(2·T·d·4d)
    block = 8.0 * t * d * d + 4.0 * t * t * d + 16.0 * t * d * d
    total = conv1 + conv2 + dims.n_audio_layer * block
    if include_mel:
        total += mel_flops(dims.n_mels)
    return total


# -- SAE training steps ------------------------------------------------------

def sae_l1_step_flops(rows: int, d_in: int, n_dict: int) -> float:
    """L1 fwd+bwd matmuls: enc, dec, dW_enc, dW_dec, d_latent — the 5-matmul
    count of tools/bench_large2.py."""
    return 5 * 2.0 * rows * d_in * n_dict


def sae_topk_step_flops(rows: int, d_in: int, n_dict: int,
                        auxk_live: bool = True) -> float:
    """TopK fwd+bwd matmuls (tools/bench_large2.py): enc, topk decode,
    auxk decode, d1, d2, dW_enc, 2 dW_dec — 8 with AuxK live, 6 without.
    The masked decodes run DENSE on the MXU (the fused kernel's masked
    formulation), so they count full 2·M·d·n."""
    n_matmuls = 8 if auxk_live else 6
    return n_matmuls * 2.0 * rows * d_in * n_dict


# -- serving decode ----------------------------------------------------------

def decode_flops(dims, n_clips: int, tokens_per_clip: float,
                 mean_pos: float | None = None) -> float:
    """Matmul FLOPs for batched greedy serving: per-clip encoder forward +
    cross-K/V projections, then per-token decoder work (self/cross attention
    + MLP + vocab projection). ``mean_pos`` is the mean self-attention KV
    length over emitted tokens (defaults to tokens_per_clip/2 + the SOT
    prompt)."""
    d, t_audio = dims.n_text_state, dims.n_audio_ctx
    layers = dims.n_text_layer
    enc = encoder_flops(dims) * n_clips
    cross_kv = layers * 2 * 2.0 * t_audio * d * d * n_clips
    if mean_pos is None:
        mean_pos = tokens_per_clip / 2.0 + 3
    # per token per layer: self q/k/v/out 4·2·d², cross q/out 2·2·d²,
    # mlp 16·d², self dots 4·pos·d, cross dots 4·T_audio·d
    per_tok_layer = (4 + 2) * 2.0 * d * d + 16.0 * d * d \
        + 4.0 * mean_pos * d + 4.0 * t_audio * d
    vocab = 2.0 * d * dims.n_vocab
    total_tokens = n_clips * tokens_per_clip
    return enc + cross_kv + total_tokens * (layers * per_tok_layer + vocab)
