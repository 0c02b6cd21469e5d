"""Greedy Whisper decoding as a fixed-shape lax.scan with KV caches.

The reference calls ``whisper.DecodingOptions(without_timestamps=False, …)`` +
``model.decode`` (src/models/hooked_model.py:103-110) — a Python
token-by-token loop with host syncs per token. Here decoding is one compiled
program: cross-attention K/V are precomputed from the encoded audio once,
self-attention K/V live in fixed-size ring buffers, and a ``lax.scan`` over
``prompt + max_new`` steps performs prefill and generation with no
data-dependent shapes (post-EOT steps are masked to EOT).

Sampling is greedy with the core suppression set (SOT/SOT_PREV/NO_TIMESTAMPS
and friends); the reference's text-dependent suppression lists require
tokenizer assets and are applied when available.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .config import WhisperDims
from .model import Params, _layer_norm, _linear
from .tokenizer import special_tokens


def _split_heads(t, heads):
    *lead, d = t.shape
    return jnp.moveaxis(t.reshape(*lead, heads, d // heads), -2, -3)


def precompute_cross_kv(params: Params, dims: WhisperDims, encoded: jnp.ndarray):
    """Per-layer cross-attention (k, v) of the encoded audio — computed once."""
    kvs = []
    for block in params["decoder"]["blocks"]:
        k = _linear(block["cross_attn"]["k"], encoded)
        v = _linear(block["cross_attn"]["v"], encoded)
        kvs.append((k, v))
    return kvs


def _decode_step(params, dims, token, pos, self_k, self_v, cross_kv):
    """One decoder step at position ``pos``: (b,) token → (b, vocab) logits.

    self_k/self_v: per-layer ring buffers, each (L, b, ctx, d).
    """
    p = params["decoder"]
    heads = dims.n_text_head
    d = dims.n_text_state
    dh = d // heads
    scale = dh ** -0.25
    ctx = self_k.shape[-2]

    x = p["tok_emb"][token][:, None, :] + jax.lax.dynamic_slice_in_dim(
        p["pos"], pos, 1, axis=0
    )  # (b, 1, d)

    pos_mask = (jnp.arange(ctx) <= pos)[None, None, None, :]  # causal over cache

    new_k, new_v = [], []
    for i, block in enumerate(p["blocks"]):
        h = _layer_norm(block["attn_ln"], x)
        q = _linear(block["attn"]["q"], h)
        k_t = _linear(block["attn"]["k"], h)
        v_t = _linear(block["attn"]["v"], h)
        bk = jax.lax.dynamic_update_slice_in_dim(self_k[i], k_t, pos, axis=-2)
        bv = jax.lax.dynamic_update_slice_in_dim(self_v[i], v_t, pos, axis=-2)
        new_k.append(bk)
        new_v.append(bv)

        qh = _split_heads(q, heads) * scale  # (b, h, 1, dh)
        kh = _split_heads(bk, heads) * scale  # (b, h, ctx, dh)
        vh = _split_heads(bv, heads)
        logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                            preferred_element_type=jnp.float32)
        logits = jnp.where(pos_mask, logits, -jnp.inf)
        w = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        attn = jnp.einsum("bhqk,bhkd->bhqd", w, vh)
        attn = jnp.moveaxis(attn, -3, -2).reshape(*x.shape)
        x = x + _linear(block["attn"]["out"], attn)

        h = _layer_norm(block["cross_attn_ln"], x)
        q = _linear(block["cross_attn"]["q"], h)
        ck, cv = cross_kv[0][i], cross_kv[1][i]
        qh = _split_heads(q, heads) * scale
        kh = _split_heads(ck, heads) * scale
        vh = _split_heads(cv, heads)
        logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                            preferred_element_type=jnp.float32)
        w = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        attn = jnp.einsum("bhqk,bhkd->bhqd", w, vh)
        attn = jnp.moveaxis(attn, -3, -2).reshape(*x.shape)
        x = x + _linear(block["cross_attn"]["out"], attn)

        h = _layer_norm(block["mlp_ln"], x)
        h = _linear(block["mlp"]["fc2"], jax.nn.gelu(_linear(block["mlp"]["fc1"], h),
                                                     approximate=False))
        x = x + h

    x = _layer_norm(p["ln"], x)
    logits = jnp.einsum("bqd,vd->bqv", x, p["tok_emb"],
                        preferred_element_type=jnp.float32)
    return logits[:, 0, :], jnp.stack(new_k), jnp.stack(new_v)


@partial(jax.jit, static_argnames=("dims",))
def detect_language(
    params: Params, dims: WhisperDims, encoded: jnp.ndarray
) -> jnp.ndarray:
    """(b,) language indices: one decoder step from <|sot|>, argmax over the
    language-token band (the reference's default DecodingOptions path —
    ``language=None`` triggers detection inside ``model.decode``)."""
    st = special_tokens(dims.n_vocab)
    b = encoded.shape[0]
    L, d = dims.n_text_layer, dims.n_text_state
    cross = precompute_cross_kv(params, dims, encoded)
    cross_k = jnp.stack([k for k, _ in cross])
    cross_v = jnp.stack([v for _, v in cross])
    self_k = jnp.zeros((L, b, 1, d), encoded.dtype)
    self_v = jnp.zeros((L, b, 1, d), encoded.dtype)
    token = jnp.full((b,), st.sot, jnp.int32)
    logits, _, _ = _decode_step(
        params, dims, token, 0, self_k, self_v, (cross_k, cross_v)
    )
    lang_logits = jax.lax.dynamic_slice_in_dim(
        logits, st.lang_base, st.n_langs, axis=-1
    )
    return jnp.argmax(lang_logits, axis=-1).astype(jnp.int32)


@partial(jax.jit, static_argnames=("dims", "n_prompt", "max_new"))
def greedy_decode(
    params: Params,
    dims: WhisperDims,
    encoded: jnp.ndarray,
    prompt: jnp.ndarray,  # (b, n_prompt) int32
    n_prompt: int,
    max_new: int = 224,
) -> jnp.ndarray:
    """Greedy-decode token ids: (b, n_prompt + max_new), EOT-padded."""
    st = special_tokens(dims.n_vocab)
    b = encoded.shape[0]
    L, d = dims.n_text_layer, dims.n_text_state
    ctx = n_prompt + max_new
    assert ctx <= dims.n_text_ctx

    cross = precompute_cross_kv(params, dims, encoded)
    cross_k = jnp.stack([k for k, _ in cross])
    cross_v = jnp.stack([v for _, v in cross])

    # per-step suppression: whisper's default DecodingOptions set — the
    # non-speech list (built from the tiktoken table when assets exist) plus
    # the task/SOT specials (reference hooked_model.py:103-110 →
    # whisper decoding.py _get_suppress_tokens with suppress_tokens="-1");
    # no_timestamps additionally stays suppressed (ApplyTimestampRules).
    from .tokenizer import blank_token_id, suppress_token_ids

    sup_np = np.zeros((dims.n_vocab,), np.float32)
    for tok in suppress_token_ids(dims.n_vocab):
        sup_np[tok] = -np.inf
    sup_np[st.no_timestamps] = -np.inf
    suppress = jnp.asarray(sup_np)
    # SuppressBlank: " " and EOT are masked at the FIRST sampled position
    blank_np = np.zeros((dims.n_vocab,), np.float32)
    blank = blank_token_id(dims.n_vocab)
    if blank is not None:
        blank_np[blank] = -np.inf
    blank_np[st.eot] = -np.inf
    suppress_blank = jnp.asarray(blank_np)

    ts0 = st.timestamp_begin
    vocab_ids = jnp.arange(dims.n_vocab)
    is_ts = vocab_ids >= ts0
    # max_initial_timestamp = 1.0 s → 50 frames (whisper's decode default)
    max_initial = ts0 + 50

    self_k = jnp.zeros((L, b, ctx, d), encoded.dtype)
    self_v = jnp.zeros((L, b, ctx, d), encoded.dtype)

    def step(carry, pos):
        token, prev, max_ts, sk, sv, finished = carry
        logits, sk, sv = _decode_step(
            params, dims, token, pos, sk, sv, (cross_k, cross_v)
        )
        logits = logits + suppress

        # --- whisper timestamp rules (model.decode's ApplyTimestampRules) ---
        last_was_ts = (token >= ts0)[:, None]
        penult_was_ts = (prev >= ts0)[:, None]
        at_first = pos + 1 == n_prompt
        # SuppressBlank at the first sampled token only
        logits = jnp.where(at_first, logits + suppress_blank[None, :], logits)
        # paired timestamps: <ts> <ts> → text next; lone <ts> → ts/eot next
        block_ts = last_was_ts & penult_was_ts
        block_text = last_was_ts & ~penult_was_ts
        text_mask = (~is_ts) & (vocab_ids != st.eot)
        logits = jnp.where(block_ts & is_ts[None, :], -jnp.inf, logits)
        logits = jnp.where(block_text & text_mask[None, :], -jnp.inf, logits)
        # monotonic timestamps
        logits = jnp.where(
            is_ts[None, :] & (vocab_ids[None, :] < max_ts[:, None]), -jnp.inf, logits
        )
        # first sampled token: cap the initial timestamp
        logits = jnp.where(
            at_first & (vocab_ids > max_initial)[None, :], -jnp.inf, logits
        )
        # if total timestamp mass beats the best text token, force a timestamp
        logprobs = jax.nn.log_softmax(logits, axis=-1)
        ts_mass = jax.nn.logsumexp(
            jnp.where(is_ts[None, :], logprobs, -jnp.inf), axis=-1
        )
        max_text = jnp.max(jnp.where(is_ts[None, :], -jnp.inf, logprobs), axis=-1)
        force_ts = (ts_mass > max_text)[:, None]
        logits = jnp.where(force_ts & ~is_ts[None, :], -jnp.inf, logits)

        is_prompt = pos + 1 < n_prompt
        next_tok = jnp.where(
            is_prompt,
            prompt[:, jnp.minimum(pos + 1, n_prompt - 1)],
            jnp.argmax(logits, axis=-1).astype(jnp.int32),
        )
        next_tok = jnp.where(finished, st.eot, next_tok)
        finished = finished | (next_tok == st.eot) & ~is_prompt
        new_max = jnp.where(
            (next_tok >= ts0) & ~finished, jnp.maximum(max_ts, next_tok), max_ts
        )
        return (next_tok, token, new_max, sk, sv, finished), next_tok

    init = (
        prompt[:, 0],
        jnp.zeros((b,), jnp.int32),
        jnp.full((b,), ts0, jnp.int32),
        self_k,
        self_v,
        jnp.zeros((b,), bool),
    )
    _, tokens = jax.lax.scan(step, init, jnp.arange(ctx - 1))
    tokens = jnp.moveaxis(tokens, 0, 1)  # (b, ctx-1)
    return jnp.concatenate([prompt[:, :1], tokens], axis=1)
