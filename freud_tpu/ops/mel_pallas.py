"""Fused STFT + mel-filterbank Pallas TPU kernel.

The hop length divides the frame span as 400 = 2·160 + 80, so STFT framing
decomposes exactly into three row-shifted views of a (rows, 160) reshape of
the padded waveform: frame[j] = [rows[j] | rows[j+1] | rows[j+2][:80]].

Layout (v5e-measured): one grid step per FILE, one (3008, 160) input DMA and
one (3000, n_mels) output DMA. Per-step DMA issue latency — not bandwidth —
dominated the earlier 3-band × 3-tile layout (tools/bench_mel3.py: a trivial
sum kernel over the same bytes ran at ~45 GB/s effective with 4 small DMAs
per step, while 2-DMA kernels sustain >300 GB/s). The row shifts are applied
to the small (3008, 402) DFT projections inside VMEM instead of the inputs:
``proj[j] = P0[j] + P1[j+1] + P2[j+2]`` where ``Pb = X @ basis_band_b``.

The windowed real-DFT runs as limb-split bf16 matmuls, THREE products
(hi·hi + hi·lo + lo·hi — the lo·lo term is ~2⁻¹⁸ relative, far below the
bf16-limb rounding already present; Mosaic rejects lax.Precision.HIGH inside
kernels and HIGHEST's 6 true-f32 passes measured 12.2 ms/batch-64). The mel
projection runs the same limb3 scheme (power and filters are positive — no
cancellation — and Mosaic's HIGHEST emulation measured 1.2 ms alone,
tools/bench_mel5.py). The whisper epilogue (per-clip dynamic-range floor +
affine) folds into the kernel while the clip's full spectrogram is VMEM-
resident. End-to-end log-mel measured ≤5.9e-5 of an f64 host computation and
≤7.1e-5 of the limb4 formulation; 7.8 → 6.6 ms/batch-64 on v5e
(tools/bench_mel8.py).

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

_TAIL = N_FFT - 2 * HOP_LENGTH  # 80
_LN10 = float(np.log(10.0))
_ROWS = N_FRAMES + 8  # 3008: frames + 2 shift rows + sublane-pad to 8


def _split_dot(a_hi, a_lo, b_hi, b_lo):
    """Limb-split matmul (3 bf16 products; lo·lo dropped — ~2⁻¹⁸ relative)."""
    out = jnp.dot(a_hi, b_hi, preferred_element_type=jnp.float32)
    out += jnp.dot(a_hi, b_lo, preferred_element_type=jnp.float32)
    out += jnp.dot(a_lo, b_hi, preferred_element_type=jnp.float32)
    return out


def _kernel(x_ref, bhi_ref, blo_ref, mhi_ref, mlo_ref, out_ref):
    x = x_ref[0]  # (3008, 160) f32
    x_hi = x.astype(jnp.bfloat16)
    x_lo = (x - x_hi.astype(jnp.float32)).astype(jnp.bfloat16)

    p0 = _split_dot(x_hi, x_lo,
                    bhi_ref[0:HOP_LENGTH, :], blo_ref[0:HOP_LENGTH, :])
    p1 = _split_dot(x_hi, x_lo,
                    bhi_ref[HOP_LENGTH:2 * HOP_LENGTH, :],
                    blo_ref[HOP_LENGTH:2 * HOP_LENGTH, :])
    p2 = _split_dot(x_hi[:, :_TAIL], x_lo[:, :_TAIL],
                    bhi_ref[2 * HOP_LENGTH:, :], blo_ref[2 * HOP_LENGTH:, :])

    proj = (p0[0:N_FRAMES] + p1[1:N_FRAMES + 1] + p2[2:N_FRAMES + 2])

    re = proj[:, :N_FREQS]
    im = proj[:, N_FREQS:]
    power = re * re + im * im  # (N_FRAMES, N_FREQS)

    # mel projection via the same limb3 scheme (positive operands, no
    # cancellation; Mosaic's HIGHEST emulation measured 1.2 ms by itself)
    p_hi = power.astype(jnp.bfloat16)
    p_lo = (power - p_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    mel = _split_dot(p_hi, p_lo, mhi_ref[:], mlo_ref[:])
    log_spec = jnp.log(jnp.maximum(mel, 1e-10)) * (1.0 / _LN10)

    # whisper epilogue while the clip's spectrogram is VMEM-resident:
    # per-clip dynamic-range floor + affine (audio_utils.py:190-193)
    gmax = jnp.max(log_spec)
    log_spec = jnp.maximum(log_spec, gmax - 8.0)
    out_ref[0] = (log_spec + 4.0) / 4.0


@functools.partial(jax.jit, static_argnames=("n_mels", "interpret"))
def log_mel_spectrogram_pallas(
    audio: jnp.ndarray, n_mels: int = 80, interpret: bool = False
) -> jnp.ndarray:
    """(B, 480000) waveforms → (B, n_mels, 3000) whisper log-mels.

    Carries a GSPMD sharding rule (like ops/attention.py): the file axis
    partitions freely, so pjit over a data-sharded collection batch runs one
    kernel per chip instead of gathering around the custom call."""
    if audio.ndim == 1:
        return log_mel_spectrogram_pallas(audio[None], n_mels, interpret)[0]
    B = audio.shape[0]

    # ONE reflect pad covering the sublane-alignment tail too (saves an XLA
    # materialization; bit-exact because the over-reflected region beyond
    # stream sample 480040 only feeds the discarded frames ≥ 3000 —
    # frame 2999 reads padded index < 480240, inside the identical
    # first-200-sample reflection)
    pad = N_FFT // 2
    need = _ROWS * HOP_LENGTH
    padded = jnp.pad(audio, ((0, 0), (pad, need - audio.shape[1] - pad)),
                     mode="reflect")
    grid_audio = padded.reshape(B, _ROWS, HOP_LENGTH)

    basis = np.asarray(_dft_basis(), np.float32)  # (N_FFT, 2·N_FREQS)
    basis_hi = basis.astype(jnp.bfloat16)
    basis_lo = (basis - basis_hi.astype(np.float32)).astype(jnp.bfloat16)
    mel_f = mel_filterbank(n_mels).T.astype(np.float32)  # (N_FREQS, n_mels)
    mel_hi = mel_f.astype(jnp.bfloat16)
    mel_lo = (mel_f - mel_hi.astype(np.float32)).astype(jnp.bfloat16)

    # epilogue (floor + affine) runs inside the kernel; only the layout
    # transpose remains at the XLA level
    log_spec = _partitioned_mel(n_mels, interpret)(
        grid_audio, jnp.asarray(basis_hi), jnp.asarray(basis_lo),
        jnp.asarray(mel_hi), jnp.asarray(mel_lo),
    )
    return jnp.swapaxes(log_spec, 1, 2)


@functools.lru_cache(maxsize=None)
def _partitioned_mel(n_mels: int, interpret: bool):
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    def body(grid_audio, basis_hi, basis_lo, mel_hi, mel_lo):
        return _mel_pallas_call(grid_audio, basis_hi, basis_lo, mel_hi,
                                mel_lo, n_mels, interpret)

    cp = custom_partitioning(body)

    def partition(mesh, arg_infos, result_infos):
        spec = arg_infos[0].sharding.spec if arg_infos[0].sharding else P()
        b = spec[0] if len(spec) > 0 else None
        out = NamedSharding(mesh, P(b, None, None))
        rep = NamedSharding(mesh, P())
        return mesh, body, out, (out, rep, rep, rep, rep)

    cp.def_partition(
        partition=partition,
        sharding_rule="b r h, x y, x y, z m, z m -> b f m",
        need_replication_factors=("r", "h", "x", "y", "z", "m", "f"),
    )
    # custom_partitioning lacks a batching rule; make vmap lower to a scan
    return jax.custom_batching.sequential_vmap(lambda *a: cp(*a))


def _mel_pallas_call(grid_audio, basis_hi, basis_lo, mel_hi, mel_lo, n_mels,
                     interpret):
    B = grid_audio.shape[0]
    log_spec = pl.pallas_call(
        _kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(
                (1, _ROWS, HOP_LENGTH), lambda b: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (N_FFT, 2 * N_FREQS), lambda b: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (N_FFT, 2 * N_FREQS), lambda b: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (N_FREQS, n_mels), lambda b: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (N_FREQS, n_mels), lambda b: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, N_FRAMES, n_mels), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, N_FRAMES, n_mels), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=80 * 1024 * 1024,
        ),
        interpret=interpret,
    )(grid_audio, basis_hi, basis_lo, mel_hi, mel_lo)
    return log_spec
