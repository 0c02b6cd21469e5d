"""Functional JAX Whisper with activation capture and substitution.

The reference reaches intermediate activations with PyTorch forward hooks
(src/models/hooked_model.py:12-83: register hook → forward → detach to CPU →
remove hook) and overrides a layer's output with a second hook class for
feature splicing (hooked_model.py:121-163). Here both are structural: the
forward pass takes a static tuple of capture names and a dict of substitution
arrays, returns the requested intermediates alongside the output, and the
whole thing stays inside one jit — no hook machinery, no host round trips,
traced once per (capture, substitute) signature.

Capture names mirror the reference's torch module paths so the reference's
JSON configs work unchanged (e.g. ``encoder.blocks.2``,
``encoder.blocks.2.mlp.1`` — configs/features/tiny_block_2_mlp_1_test.json):

  encoder.conv1 / encoder.conv2      conv output, pre-GELU
  encoder.blocks.N                   residual-stream output of block N
  encoder.blocks.N.attn_ln           pre-attention LayerNorm output
  encoder.blocks.N.attn.out          attention output projection
  encoder.blocks.N.mlp_ln            pre-MLP LayerNorm output
  encoder.blocks.N.mlp.0             first MLP linear (pre-GELU)
  encoder.blocks.N.mlp.1             GELU output (width 4·d_model)
  encoder.blocks.N.mlp.2 / .mlp      MLP output projection
  encoder.ln_post                    final LayerNorm

Parameters are a plain nested-dict pytree; layers are unrolled Python loops
(static per-layer capture/substitution with zero overhead when unused).
"""

from __future__ import annotations

from functools import partial
from typing import Mapping, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .config import WhisperDims

Params = dict
Captures = dict[str, jnp.ndarray]


# ---------------------------------------------------------------------------
# Initialization


def _linear_init(key, d_in, d_out, scale=None):
    if scale is None:
        scale = 1.0 / np.sqrt(d_in)
    kw, kb = jax.random.split(key)
    return {
        "w": jax.random.uniform(kw, (d_in, d_out), jnp.float32, -scale, scale),
        "b": jax.random.uniform(kb, (d_out,), jnp.float32, -scale, scale),
    }


def _ln_init(d):
    return {"g": jnp.ones((d,), jnp.float32), "b": jnp.zeros((d,), jnp.float32)}


def _block_init(key, d, cross_attention: bool):
    keys = jax.random.split(key, 10)
    p = {
        "attn_ln": _ln_init(d),
        "attn": {
            "q": _linear_init(keys[0], d, d),
            "k": {"w": _linear_init(keys[1], d, d)["w"]},  # no bias, as in Whisper
            "v": _linear_init(keys[2], d, d),
            "out": _linear_init(keys[3], d, d),
        },
        "mlp_ln": _ln_init(d),
        "mlp": {
            "fc1": _linear_init(keys[4], d, 4 * d),
            "fc2": _linear_init(keys[5], 4 * d, d),
        },
    }
    if cross_attention:
        p["cross_attn_ln"] = _ln_init(d)
        p["cross_attn"] = {
            # distinct keys per projection: reusing one would make q == v
            # byte-identical in every random:/test: model, hiding q/v wiring
            # bugs from every structural test
            "q": _linear_init(keys[6], d, d),
            "k": {"w": _linear_init(keys[7], d, d)["w"]},
            "v": _linear_init(keys[8], d, d),
            "out": _linear_init(keys[9], d, d),
        }
    return p


def sinusoids(length: int, channels: int, max_timescale: float = 10000.0) -> np.ndarray:
    """Standard sinusoidal position encoding (sin | cos concatenated)."""
    assert channels % 2 == 0
    log_inc = np.log(max_timescale) / (channels // 2 - 1)
    inv = np.exp(-log_inc * np.arange(channels // 2))
    scaled = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(scaled), np.cos(scaled)], axis=1).astype(np.float32)


def init_params(dims: WhisperDims, seed: int = 0) -> Params:
    """Random-initialized Whisper parameters (for tests / benchmarks)."""
    key = jax.random.PRNGKey(seed)
    k_enc, k_dec = jax.random.split(key)
    d, dt = dims.n_audio_state, dims.n_text_state

    ek = jax.random.split(k_enc, dims.n_audio_layer + 3)
    encoder = {
        "conv1": {
            "w": jax.random.normal(ek[0], (3, dims.n_mels, d), jnp.float32)
            * (1.0 / np.sqrt(3 * dims.n_mels)),
            "b": jnp.zeros((d,), jnp.float32),
        },
        "conv2": {
            "w": jax.random.normal(ek[1], (3, d, d), jnp.float32)
            * (1.0 / np.sqrt(3 * d)),
            "b": jnp.zeros((d,), jnp.float32),
        },
        "pos": jnp.asarray(sinusoids(dims.n_audio_ctx, d)),
        "blocks": [
            _block_init(ek[i + 2], d, cross_attention=False)
            for i in range(dims.n_audio_layer)
        ],
        "ln_post": _ln_init(d),
    }

    dk = jax.random.split(k_dec, dims.n_text_layer + 2)
    decoder = {
        "tok_emb": jax.random.normal(dk[0], (dims.n_vocab, dt), jnp.float32) * 0.02,
        "pos": jax.random.normal(dk[1], (dims.n_text_ctx, dt), jnp.float32) * 0.01,
        "blocks": [
            _block_init(dk[i + 2], dt, cross_attention=True)
            for i in range(dims.n_text_layer)
        ],
        "ln": _ln_init(dt),
    }
    return {"encoder": encoder, "decoder": decoder}


# ---------------------------------------------------------------------------
# Forward primitives


def _layer_norm(p, x):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + 1e-5) * p["g"] + p["b"]


def _linear(p, x):
    y = x @ p["w"]
    return y + p["b"] if "b" in p else y


# Full-sequence self-attention implementation:
#   "auto"   → the K/V-resident Pallas kernel (freud_tpu.ops.attention) on
#              TPU, einsum elsewhere
#   "einsum" → XLA path (materializes the (s × s) scores in HBM — ~40 GB per
#              64-file whisper-tiny encoder batch, the collection bottleneck)
#   "kernel" → force the Pallas kernel
#   "flash"  → the stock Pallas flash kernel (measured 2× slower at whisper
#              geometry: its 128-lane tiles pad head_dim 64 → 128)
ATTENTION_IMPL: str = "auto"


def _flash_self_attention(qh, kh, vh, scale_total):
    """Pallas TPU flash attention over (b, h, s, dh), padded to kernel tiles."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        SegmentIds,
        flash_attention,
    )

    b, h, s, dh = qh.shape
    s_pad = -(-s // 512) * 512
    dh_pad = max(128, -(-dh // 128) * 128)

    def pad(t):
        return jnp.pad(t, ((0, 0), (0, 0), (0, s_pad - s), (0, dh_pad - dh)))

    seg = jnp.concatenate(
        [jnp.ones((b, s), jnp.int32), jnp.zeros((b, s_pad - s), jnp.int32)], axis=1
    )
    out = flash_attention(
        pad(qh), pad(kh), pad(vh),
        segment_ids=SegmentIds(seg, seg),
        sm_scale=scale_total,
    )
    return out[:, :, :s, :dh]


def _attention_impl(d: int) -> str:
    if ATTENTION_IMPL == "auto":
        # The fused qkv+attention kernel (q/k/v projections + per-head
        # softmax-attention in one pass per file, q/k/v never in HBM) runs
        # bf16 matmuls with f32 stats for BOTH input dtypes — the same
        # truncation XLA's DEFAULT precision applies to f32 einsum operands
        # on TPU. Measured 8.1 → 5.5 ms/batch-64 vs XLA projections + the
        # blocked "kernel" path. Its per-step VMEM working set grows with
        # d² (weights resident) + s·d (q/k/v/out live at once): at d=1280
        # (large-v3) the compiler needs ~150 MB vs the 128 MB arena, so wide
        # models take the K/V-resident blocked kernel instead (whose working
        # set is per-(batch, head) and geometry-independent in d).
        if jax.default_backend() == "tpu":
            return "fused" if d <= 768 else "kernel"
        return "einsum"
    return ATTENTION_IMPL


def _attention(p, x, heads, xa=None, mask=None, wtap=None):
    """Multi-head attention with Whisper's split (d_head)^-0.25 scaling.

    ``xa`` switches to cross-attention. ``wtap`` (optional callback)
    receives the post-softmax attention weights (…, heads, T, S) — the
    capture hook for word-timestamp alignment. (Incremental decoding does
    NOT route through here — decoding.py owns its own KV-cached step.)
    """
    *lead, d = x.shape
    dh = d // heads

    impl = _attention_impl(d)
    full_self_attn = mask is None and xa is None and len(lead) == 2
    if full_self_attn and impl == "fused":
        from ...ops.attention import fused_qkv_attention

        out = fused_qkv_attention(
            x, p["q"]["w"], p["q"]["b"], p["k"]["w"], p["v"]["w"],
            p["v"]["b"], heads,
        )
        return _linear(p["out"], out)

    q = _linear(p["q"], x)
    source = x if xa is None else xa
    k = _linear(p["k"], source)
    v = _linear(p["v"], source)

    if full_self_attn and impl != "einsum":
        def split(t):
            return jnp.moveaxis(t.reshape(*t.shape[:-1], heads, dh), -2, -3)

        if impl == "flash":
            out = _flash_self_attention(split(q), split(k), split(v), dh ** -0.5)
        else:
            from ...ops.attention import whisper_attention

            out = whisper_attention(split(q), split(k), split(v))
        out = jnp.moveaxis(out, -3, -2).reshape(*lead, d)
        return _linear(p["out"], out)

    def split(t):
        return jnp.moveaxis(t.reshape(*t.shape[:-1], heads, dh), -2, -3)

    qh, kh, vh = split(q), split(k), split(v)
    scale = dh ** -0.25
    logits = jnp.einsum(
        "...hqd,...hkd->...hqk", qh * scale, kh * scale,
        preferred_element_type=jnp.float32,
    )
    if mask is not None:
        logits = logits + mask
    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
    if wtap is not None:
        wtap(weights)
    out = jnp.einsum("...hqk,...hkd->...hqd", weights, vh)
    out = jnp.moveaxis(out, -3, -2).reshape(*lead, d)
    return _linear(p["out"], out)


def _tap(name, x, capture, substitute, store):
    """Capture and/or substitute the tensor at a named point."""
    if substitute and name in substitute:
        x = jnp.asarray(substitute[name]).astype(x.dtype)
    if name in capture:
        store[name] = x
    return x


def _residual_block(
    p, x, heads, prefix, capture, substitute, store, xa=None, mask=None,
):
    tap = partial(_tap, capture=capture, substitute=substitute, store=store)

    h = tap(f"{prefix}.attn_ln", _layer_norm(p["attn_ln"], x))
    attn_out = _attention(p["attn"], h, heads, mask=mask)
    x = x + tap(f"{prefix}.attn.out", attn_out)

    if xa is not None:
        h = _layer_norm(p["cross_attn_ln"], x)
        cross_out = _attention(
            p["cross_attn"], h, heads, xa=xa,
            wtap=partial(tap, f"{prefix}.cross_attn.weights"),
        )
        x = x + cross_out

    h = tap(f"{prefix}.mlp_ln", _layer_norm(p["mlp_ln"], x))
    h = tap(f"{prefix}.mlp.0", _linear(p["mlp"]["fc1"], h))
    h = tap(f"{prefix}.mlp.1", jax.nn.gelu(h, approximate=False))
    h = tap(f"{prefix}.mlp.2", _linear(p["mlp"]["fc2"], h))
    h = tap(f"{prefix}.mlp", h)
    x = x + h
    x = tap(prefix, x)
    return x


# ---------------------------------------------------------------------------
# Encoder / decoder


def encoder_forward(
    params: Params,
    dims: WhisperDims,
    mels: jnp.ndarray,
    capture: Sequence[str] = (),
    substitute: Mapping[str, jnp.ndarray] | None = None,
    compute_dtype=jnp.float32,
) -> tuple[jnp.ndarray, Captures]:
    """Encode (batch, n_mels, 3000) log-mels → (batch, 1500, d_model).

    Returns (encoded, captures). ``capture``/``substitute`` keys are the
    module-path names listed in the module docstring.
    """
    capture = frozenset(capture)
    substitute = substitute or {}
    store: Captures = {}
    tap = partial(_tap, capture=capture, substitute=substitute, store=store)
    p = params["encoder"]
    if compute_dtype != jnp.float32:
        # cast weights too — otherwise mixed-dtype matmuls promote back to
        # f32 and reduced precision never engages
        p = jax.tree_util.tree_map(lambda a: a.astype(compute_dtype), p)

    x = mels.astype(compute_dtype)
    # conv over time: (b, mels, T) -> (b, T, d), kernel layout (k, in, out)
    x = jnp.swapaxes(x, -1, -2)
    x = jax.lax.conv_general_dilated(
        x, p["conv1"]["w"].astype(compute_dtype),
        window_strides=(1,), padding=((1, 1),),
        dimension_numbers=("NHC", "HIO", "NHC"),
    ) + p["conv1"]["b"].astype(compute_dtype)
    x = tap("encoder.conv1", x)
    x = jax.nn.gelu(x, approximate=False)
    x = jax.lax.conv_general_dilated(
        x, p["conv2"]["w"].astype(compute_dtype),
        window_strides=(2,), padding=((1, 1),),
        dimension_numbers=("NHC", "HIO", "NHC"),
    ) + p["conv2"]["b"].astype(compute_dtype)
    x = tap("encoder.conv2", x)
    x = jax.nn.gelu(x, approximate=False)

    x = x + p["pos"].astype(compute_dtype)

    for i, block in enumerate(p["blocks"]):
        x = _residual_block(
            block, x, dims.n_audio_head, f"encoder.blocks.{i}", capture, substitute,
            store,
        )

    x = tap("encoder.ln_post", _layer_norm(p["ln_post"], x))
    return x, store


def decoder_forward(
    params: Params,
    dims: WhisperDims,
    tokens: jnp.ndarray,
    encoded: jnp.ndarray,
    capture: Sequence[str] = (),
    substitute: Mapping[str, jnp.ndarray] | None = None,
    compute_dtype=jnp.float32,
) -> tuple[jnp.ndarray, Captures]:
    """Full-sequence decoder: (batch, T) tokens → (batch, T, n_vocab) logits."""
    capture = frozenset(capture)
    substitute = substitute or {}
    store: Captures = {}
    p = params["decoder"]
    if compute_dtype != jnp.float32:
        # cast the whole decoder subtree (see encoder_forward) — casting only
        # the embeddings would let the first f32 layer-norm weight promote
        # everything back to f32 and compute_dtype would be a silent no-op
        p = jax.tree_util.tree_map(lambda a: a.astype(compute_dtype), p)
    T = tokens.shape[-1]

    x = p["tok_emb"][tokens].astype(compute_dtype) + p["pos"][:T].astype(compute_dtype)
    mask = jnp.where(
        jnp.tril(jnp.ones((T, T), bool)), 0.0, -jnp.inf
    ).astype(jnp.float32)

    for i, block in enumerate(p["blocks"]):
        x = _residual_block(
            block, x, dims.n_text_head, f"decoder.blocks.{i}", capture, substitute,
            store, xa=encoded.astype(compute_dtype), mask=mask,
        )

    x = _layer_norm(p["ln"], x)
    logits = jnp.dot(
        x, p["tok_emb"].T.astype(compute_dtype),
        preferred_element_type=jnp.float32,
    )
    return logits, store
