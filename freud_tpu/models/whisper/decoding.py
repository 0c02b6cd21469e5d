"""Greedy Whisper decoding as a fixed-shape lax.scan with KV caches.

The reference calls ``whisper.DecodingOptions(without_timestamps=False, …)`` +
``model.decode`` (src/models/hooked_model.py:103-110) — a Python
token-by-token loop with host syncs per token. Here decoding is one compiled
program: cross-attention K/V are precomputed from the encoded audio once,
self-attention K/V live in fixed-size ring buffers, and a ``lax.scan`` over
``prompt + max_new`` steps performs prefill and generation with no
data-dependent shapes (post-EOT steps are masked to EOT).

Three decoders share the rule set (SuppressTokens/SuppressBlank/
ApplyTimestampRules, built from the tiktoken table when assets exist):
``greedy_decode``; ``sample_decode`` (traced temperature — one compiled
program serves whisper.transcribe's whole 0.0→1.0 fallback schedule — plus
the sum-logprob/length statistics that schedule needs); and ``beam_decode``,
whisper's BeamSearchDecoder as a single fixed-shape scan (beam folded into
batch, top-k re-rank + one beam-axis gather of the KV ring buffers per step).
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


def _cast_decode_inputs(params, encoded, compute_dtype):
    """Serving-precision cast: decoder weights + encoded audio to
    ``compute_dtype`` (the KV ring buffers and cross K/V follow
    ``encoded.dtype``). Decode throughput is HBM-read-bound — per generated
    token every cross K/V plane and every decoder weight is re-read — so
    bf16 halves the dominant traffic (measured ~1.9× serving RTFx on v5e,
    tools/bench_transcribe.py). Attention scores, the vocab projection,
    softmax statistics, and every rule/ranking computation stay f32
    (``preferred_element_type`` below), matching the encoder's proven
    bf16-collection discipline (model.py:327-330).

    ``encoded`` is ALWAYS cast to ``compute_dtype`` — the self-attention ring
    buffers take ``encoded.dtype`` while their updates come from the weights'
    dtype, so a bf16-encoded / f32-decode mix would feed
    ``dynamic_update_slice`` mismatched dtypes."""
    if compute_dtype == jnp.float32:
        return params, encoded.astype(jnp.float32)
    dec = jax.tree_util.tree_map(
        lambda a: a.astype(compute_dtype), params["decoder"]
    )
    return {**params, "decoder": dec}, encoded.astype(compute_dtype)


def precompute_cross_kv(params: Params, dims: WhisperDims, encoded: jnp.ndarray):
    """Per-layer cross-attention (k, v) of the encoded audio — computed once."""
    kvs = []
    for block in params["decoder"]["blocks"]:
        k = _linear(block["cross_attn"]["k"], encoded)
        v = _linear(block["cross_attn"]["v"], encoded)
        kvs.append((k, v))
    return kvs


def _quant_rows_int8(t: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-row int8 quantization over the last axis → (int8, f32
    scale with a keepdims-1 last axis)."""
    f = t.astype(jnp.float32)
    amax = jnp.max(jnp.abs(f), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(f / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _cross_kv_stacks(params, dims, encoded, kv_dtype=None):
    """Stacked (L, b, s, d) cross-attention K/V planes for the decode loop.

    ``kv_dtype="int8"`` returns the quantized 4-tuple ``(k8, k_scale, v8,
    v_scale)`` (per-(layer, batch, position) symmetric scales) — an
    EXPERIMENTAL knob kept for probe reproducibility, NOT wired into any
    product surface, because it is a measured end-to-end LOSER on v5e.
    The measurement story (tools/bench_decode3.py, tools/bench_kv8.py):
    per-token decode is HBM-read-bound on exactly these planes (58% of the
    bf16 token step), and under a bare fixed ``lax.scan`` the int8 planes
    dequantized at the attention dot win 0.359 → 0.253 ms/step (tiny) and
    3.90 → 3.16 (small) with exact token agreement. But the PRODUCT decode
    loop is an early-exit ``while_loop`` whose bf16 body is already
    cross-op-overlapped, and there the extra dequant producer breaks the
    overlap instead of fusing: serving RTFx drops 3854 → 3257 (tiny b8)
    and 455 → 262 (small b8). The requantized int8-math variants lose to
    their own quantization overhead in every configuration."""
    cross = precompute_cross_kv(params, dims, encoded)
    k = jnp.stack([k for k, _ in cross])
    v = jnp.stack([v for _, v in cross])
    if kv_dtype is None:
        return (k, v)
    if kv_dtype != "int8":
        raise ValueError(f"kv_dtype must be None or 'int8', got {kv_dtype!r}")
    k8, ks = _quant_rows_int8(k)
    v8, vs = _quant_rows_int8(v)
    return (k8, ks, v8, vs)


def _decode_step(params, dims, token, pos, self_k, self_v, cross_kv,
                 start=None, tap_layer=None, tap_fn=None, tap_params=None):
    """One decoder step at position ``pos``: (b,) token → (b, vocab) logits.

    self_k/self_v: per-layer ring buffers, each (L, b, ctx, d).

    ``start`` (optional, (b,) int32) left-crops the sequence per clip: buffer
    positions < start are masked out of attention and position embeddings are
    indexed at ``pos − start`` — the fixed-shape mechanism behind
    variable-length conditioned prompts (condition_on_previous_text): one
    compiled program serves every history length.

    ``tap_layer``/``tap_fn``/``tap_params`` (optional): an ONLINE per-position
    transform applied to block ``tap_layer``'s output (the residual stream
    after its MLP) — ``x ← tap_fn(tap_params, x)`` with x (b, 1, d) — before
    downstream blocks consume it and before its value enters their K/V
    caches. This is the autoregressive analog of the reference's
    substituted-forward hook on a decoder module (hooked_model.py:58-69):
    the hook fires per incremental forward, but can only replay a fixed
    precomputed tensor (shape-mismatched against KV-cached steps); a
    per-position FUNCTION (e.g. an SAE roundtrip with one feature scaled)
    steers the decode causally — each substituted position influences every
    later token. Backs /manipulate_feature for decoder-layer SAEs.
    """
    p = params["decoder"]
    heads = dims.n_text_head
    d = dims.n_text_state
    dh = d // heads
    scale = dh ** -0.25
    ctx = self_k.shape[-2]

    if start is None:
        pe = jax.lax.dynamic_slice_in_dim(p["pos"], pos, 1, axis=0)  # (1, d)
        x = p["tok_emb"][token][:, None, :] + pe
        pos_mask = (jnp.arange(ctx) <= pos)[None, None, None, :]
    else:
        posn = jnp.maximum(pos - start, 0)  # (b,)
        pe = jnp.take(p["pos"], posn, axis=0)[:, None, :]  # (b, 1, d)
        x = p["tok_emb"][token][:, None, :] + pe
        cols = jnp.arange(ctx)
        # every step may attend to ITSELF even inside the pad region — a
        # no-op for real positions (pos ≥ start already includes it) that
        # keeps pad-step softmax rows finite: a fully-masked row would go
        # NaN and poison the layer-1+ KV cache through 0·NaN
        pos_mask = ((cols[None, :] <= pos)
                    & ((cols[None, :] >= start[:, None]) | (cols == pos))
                    )[:, None, None, :]  # (b, 1, 1, ctx)

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
        if len(cross_kv) == 4:
            # int8 planes + per-(b, s) scales (see _cross_kv_stacks). The
            # dequant must stay convert-ONLY on the (b, s, d) planes — the
            # int8→compute cast fuses into the dot's HBM read, while a
            # full-plane scale multiply materializes a dense copy per step
            # inside the decode while_loop (measured: it erases the entire
            # win). Exact algebra moves both scales to tiny axes: the K
            # scale multiplies the (b, h, 1, s) logits, the V scale folds
            # into the softmax weights.
            ck8, cks, cv8, cvs = (c[i] for c in cross_kv)
            qh = _split_heads(q, heads) * (scale * scale)
            k8h = _split_heads(ck8.astype(x.dtype), heads)
            logits = jnp.einsum("bhqd,bhkd->bhqk", qh, k8h,
                                preferred_element_type=jnp.float32)
            logits = logits * cks[..., 0][:, None, None, :]
            w = jax.nn.softmax(logits, axis=-1)
            w = (w * cvs[..., 0][:, None, None, :]).astype(x.dtype)
            v8h = _split_heads(cv8.astype(x.dtype), heads)
            attn = jnp.einsum("bhqk,bhkd->bhqd", w, v8h)
        else:
            ck, cv = cross_kv[0], cross_kv[1]
            qh = _split_heads(q, heads) * scale
            kh = _split_heads(ck[i], heads) * scale
            vh = _split_heads(cv[i], heads)
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
        if tap_fn is not None and i == tap_layer:
            x = tap_fn(tap_params, x).astype(x.dtype)

    x = _layer_norm(p["ln"], x)
    logits = jnp.einsum("bqd,vd->bqv", x, p["tok_emb"],
                        preferred_element_type=jnp.float32)
    return logits[:, 0, :], jnp.stack(new_k), jnp.stack(new_v)


@partial(jax.jit, static_argnames=("dims", "compute_dtype"))
def detect_language(
    params: Params, dims: WhisperDims, encoded: jnp.ndarray,
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """(b,) language indices: one decoder step from <|sot|>, argmax over the
    language-token band (the reference's default DecodingOptions path —
    ``language=None`` triggers detection inside ``model.decode``)."""
    st = special_tokens(dims.n_vocab)
    b = encoded.shape[0]
    L, d = dims.n_text_layer, dims.n_text_state
    params, encoded = _cast_decode_inputs(params, encoded, compute_dtype)
    # one decoder step total: the cross K/V planes are read exactly once, so
    # int8 kv_dtype would only add quantization cost here — always dense
    cross_kv = _cross_kv_stacks(params, dims, encoded)
    self_k = jnp.zeros((L, b, 1, d), encoded.dtype)
    self_v = jnp.zeros((L, b, 1, d), encoded.dtype)
    token = jnp.full((b,), st.sot, jnp.int32)
    logits, _, _ = _decode_step(
        params, dims, token, 0, self_k, self_v, cross_kv
    )
    lang_logits = jax.lax.dynamic_slice_in_dim(
        logits, st.lang_base, st.n_langs, axis=-1
    )
    return jnp.argmax(lang_logits, axis=-1).astype(jnp.int32)


def _suppress_tables(dims: WhisperDims):
    """(suppress, suppress_blank) additive (-inf) vocab rows.

    Whisper's default DecodingOptions set — the non-speech list (built from
    the tiktoken table when assets exist) plus the task/SOT specials
    (reference hooked_model.py:103-110 → whisper decoding.py
    _get_suppress_tokens with suppress_tokens="-1"); no_timestamps
    additionally stays suppressed (ApplyTimestampRules). SuppressBlank masks
    " " and EOT at the FIRST sampled position only."""
    from .tokenizer import blank_token_id, suppress_token_ids

    st = special_tokens(dims.n_vocab)
    sup_np = np.zeros((dims.n_vocab,), np.float32)
    for tok in suppress_token_ids(dims.n_vocab):
        sup_np[tok] = -np.inf
    sup_np[st.no_timestamps] = -np.inf
    blank_np = np.zeros((dims.n_vocab,), np.float32)
    blank = blank_token_id(dims.n_vocab)
    if blank is not None:
        blank_np[blank] = -np.inf
    blank_np[st.eot] = -np.inf
    return jnp.asarray(sup_np), jnp.asarray(blank_np)


def _apply_rules(logits, token, prev, max_ts, at_first, st, suppress,
                 suppress_blank, at_second=False):
    """whisper's SuppressTokens + SuppressBlank + ApplyTimestampRules on a
    flat (N, vocab) logits block; ``token``/``prev``/``max_ts`` are (N,)."""
    n_vocab = logits.shape[-1]
    ts0 = st.timestamp_begin
    vocab_ids = jnp.arange(n_vocab)
    is_ts = vocab_ids >= ts0
    # max_initial_timestamp = 1.0 s → 50 frames (whisper's decode default)
    max_initial = ts0 + 50

    logits = logits + suppress
    last_was_ts = (token >= ts0)[:, None]
    # whisper ApplyTimestampRules: penultimate_was_timestamp is TRUE when
    # fewer than two tokens have been sampled (len(sampled) < 2) — right
    # after the forced initial timestamp the decoder must emit TEXT, not a
    # second timestamp. ``prev`` is a prompt token there, so without the
    # at_second override the pairing rule inverts and every decode opens
    # with a spurious zero-length "<ts><ts>" segment.
    penult_was_ts = (prev >= ts0)[:, None] | jnp.asarray(at_second)
    # SuppressBlank at the first sampled token only
    logits = jnp.where(at_first, logits + suppress_blank[None, :], logits)
    # paired timestamps: <ts> <ts> → text next; lone <ts> → ts/eot next
    block_ts = last_was_ts & penult_was_ts
    block_text = last_was_ts & ~penult_was_ts
    text_mask = (~is_ts) & (vocab_ids != st.eot)
    logits = jnp.where(block_ts & is_ts[None, :], -jnp.inf, logits)
    logits = jnp.where(block_text & text_mask[None, :], -jnp.inf, logits)
    # monotonic timestamps with whisper's nonzero-segment rule: once any
    # timestamp was sampled, new ones must be ≥ it while a segment is open
    # (lone trailing <ts>) and STRICTLY greater once it closed — equality
    # after a closed pair would mint zero-length segments and loop forever
    # (ApplyTimestampRules' timestamp_last = timestamps[-1] (+1))
    no_ts_yet = (max_ts < ts0)[:, None]
    open_seg = last_was_ts & ~penult_was_ts
    min_allowed = jnp.where(
        no_ts_yet, ts0, jnp.where(open_seg, max_ts[:, None], max_ts[:, None] + 1)
    )
    logits = jnp.where(
        is_ts[None, :] & (vocab_ids[None, :] < min_allowed), -jnp.inf, logits
    )
    # first sampled token: MUST be a timestamp (whisper suppresses every
    # non-timestamp token at sample_begin), capped at max_initial
    logits = jnp.where(at_first & ~is_ts[None, :], -jnp.inf, logits)
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
    return jnp.where(force_ts & ~is_ts[None, :], -jnp.inf, logits)


def sample_decode(
    params: Params,
    dims: WhisperDims,
    encoded: jnp.ndarray,
    prompt: jnp.ndarray,  # (b, n_prompt) int32
    n_prompt: int,
    max_new: int = 224,
    temperature: jnp.ndarray | float = 0.0,
    key: jnp.ndarray | None = None,
    start: jnp.ndarray | None = None,
    compute_dtype=jnp.float32,
    kv_dtype: str | None = None,
    early_exit: bool = True,
    decoder_tap: tuple | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Decode token ids with optional temperature sampling.

    ``decoder_tap=(layer_idx, fn, fn_params)`` applies ``fn(fn_params, x)``
    to block ``layer_idx``'s output at every decode position, online (see
    ``_decode_step``) — ``layer_idx`` and ``fn`` are static (reuse the SAME
    fn object across calls to share the compiled program); ``fn_params`` is
    a traced pytree.

    ``temperature`` is a TRACED scalar (one compiled program serves the whole
    whisper.transcribe fallback schedule 0.0 → 1.0): 0 means argmax, > 0
    samples from softmax(logits / temperature) (whisper decoding.py
    GreedyDecoder.update). Returns ``(tokens (b, n_prompt+max_new) EOT-padded,
    sum_logprob (b,), n_text (b,), no_speech_prob (b,))`` where sum_logprob
    accumulates the post-rules log-probability of every sampled token up to
    and including the first EOT and n_text counts sampled non-EOT tokens — so
    whisper's ``avg_logprob = sum_logprob / (n_text + 1)`` (transcribe.py's
    fallback statistic) is reproducible exactly. ``no_speech_prob`` is the
    raw-logits softmax mass of <|nospeech|> at the SOT step (whisper's
    silence statistic). ``start`` ((b,) int32, optional) marks where each
    clip's prompt really begins inside a fixed-size left-padded prompt
    buffer — the conditioned-prompt (sot_prev + previous text) mechanism;
    positions before it are excluded from attention and position numbering
    (see ``_decode_step``). ``kv_dtype="int8"`` stores the precomputed
    cross-attention K/V planes int8-quantized and dequantizes at the
    attention dot — exact token agreement, but a measured end-to-end LOSER
    in this loop; experimental/probe-only, see ``_cross_kv_stacks``.
    ``early_exit=False`` disables the all-finished while_loop exit and runs
    the full ``max_new`` budget — the output contract is IDENTICAL (post-EOT
    positions emit EOT with frozen statistics either way); it exists so
    benchmarks can report a budget-calibrated serving number alongside the
    early-exit one (bench.py serving rows)."""
    # Greedy-only fast path: with no key and a STATICALLY-zero temperature
    # the per-step Gumbel draw over the full (b, vocab) block (fold_in +
    # uniform + log + divide) is provably dead — drop it at trace time.
    # Decided here in Python (a jitted body would only see tracers); callers
    # that sample (the fallback ladder) always pass a key, which preserves
    # the one-compiled-program property of the traced-temperature schedule.
    greedy_only = key is None and isinstance(temperature, (int, float)) \
        and float(temperature) == 0.0
    if key is None:
        key = jax.random.PRNGKey(0)
    tap_layer, tap_fn, tap_params = decoder_tap or (None, None, None)
    if tap_layer is not None and not (0 <= tap_layer < dims.n_text_layer):
        # an out-of-range layer would make the tap a silent no-op: the
        # "steered" decode would be byte-identical to baseline with no error
        # (e.g. an SAE trained on decoder.blocks.5 served against a 4-layer
        # model)
        raise ValueError(
            f"decoder_tap layer {tap_layer} out of range for a model with "
            f"{dims.n_text_layer} decoder layers")
    return _sample_decode_impl(
        params, encoded, prompt, temperature, key, start, tap_params,
        dims=dims, n_prompt=n_prompt, max_new=max_new,
        compute_dtype=compute_dtype, greedy_only=greedy_only,
        kv_dtype=kv_dtype, early_exit=early_exit,
        tap_layer=tap_layer, tap_fn=tap_fn,
    )


@partial(jax.jit, static_argnames=("dims", "n_prompt", "max_new",
                                   "compute_dtype", "greedy_only",
                                   "kv_dtype", "early_exit",
                                   "tap_layer", "tap_fn"))
def _sample_decode_impl(
    params, encoded, prompt, temperature, key, start, tap_params=None,
    *, dims, n_prompt, max_new, compute_dtype, greedy_only, kv_dtype,
    early_exit=True, tap_layer=None, tap_fn=None,
):
    st = special_tokens(dims.n_vocab)
    b = encoded.shape[0]
    L, d = dims.n_text_layer, dims.n_text_state
    ctx = n_prompt + max_new
    assert ctx <= dims.n_text_ctx
    temperature = jnp.asarray(temperature, jnp.float32)

    params, encoded = _cast_decode_inputs(params, encoded, compute_dtype)
    cross_kv = _cross_kv_stacks(params, dims, encoded, kv_dtype=kv_dtype)
    suppress, suppress_blank = _suppress_tables(dims)
    ts0 = st.timestamp_begin

    self_k = jnp.zeros((L, b, ctx, d), encoded.dtype)
    self_v = jnp.zeros((L, b, ctx, d), encoded.dtype)

    def step(carry, pos):
        token, prev, max_ts, sk, sv, finished, sum_lp, n_text, nsp = carry
        logits, sk, sv = _decode_step(
            params, dims, token, pos, sk, sv, cross_kv, start=start,
            tap_layer=tap_layer, tap_fn=tap_fn, tap_params=tap_params,
        )
        # no_speech prob from the RAW logits at the SOT step, before any
        # suppression (whisper decoding.py probs_at_sot → no_speech_probs);
        # keyed on the token rather than pos 0 so conditioned prompts (where
        # sot sits after the sot_prev history) capture the right step
        nsp = jnp.where(
            token == st.sot,
            jax.nn.softmax(logits, axis=-1)[:, st.no_speech],
            nsp,
        )
        at_first = pos + 1 == n_prompt
        at_second = pos + 1 == n_prompt + 1
        logits = _apply_rules(logits, token, prev, max_ts, at_first, st,
                              suppress, suppress_blank, at_second=at_second)

        greedy_tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        if greedy_only:
            chosen = greedy_tok
        else:
            temp = jnp.maximum(temperature, 1e-6)
            sampled_tok = jax.random.categorical(
                jax.random.fold_in(key, pos), logits / temp, axis=-1
            ).astype(jnp.int32)
            chosen = jnp.where(temperature > 0, sampled_tok, greedy_tok)

        is_prompt = pos + 1 < n_prompt
        next_tok = jnp.where(
            is_prompt, prompt[:, jnp.minimum(pos + 1, n_prompt - 1)], chosen
        )
        next_tok = jnp.where(finished, st.eot, next_tok)

        # avg-logprob bookkeeping: whisper sums log_softmax(post-rules logits)
        # of each freely sampled token while the sequence is alive, including
        # the terminating EOT (GreedyDecoder.update's sum_logprobs)
        logprobs = jax.nn.log_softmax(logits, axis=-1)
        tok_lp = jnp.take_along_axis(logprobs, next_tok[:, None], axis=-1)[:, 0]
        live = ~finished & ~is_prompt
        sum_lp = sum_lp + jnp.where(live, tok_lp, 0.0)
        n_text = n_text + jnp.where(live & (next_tok != st.eot), 1, 0)

        finished = finished | (next_tok == st.eot) & ~is_prompt
        new_max = jnp.where(
            (next_tok >= ts0) & ~finished, jnp.maximum(max_ts, next_tok), max_ts
        )
        return (next_tok, token, new_max, sk, sv, finished, sum_lp, n_text,
                nsp), next_tok

    # Early-exit generation loop. A scan would run all ``max_new`` steps even
    # after every sequence hit EOT; real 30-s speech windows finish in a
    # fraction of the 224-token budget, so the wall-clock win on real serving
    # is large (the fixed-shape contract is preserved — post-exit positions
    # stay EOT from the buffer init, exactly what the masked scan steps would
    # have written: finished rows emit EOT and every statistic is frozen).
    tokens_buf = jnp.full((b, ctx), st.eot, jnp.int32)
    tokens_buf = jax.lax.dynamic_update_slice_in_dim(
        tokens_buf, prompt[:, :1], 0, axis=1
    )

    init = (
        prompt[:, 0],
        jnp.zeros((b,), jnp.int32),
        jnp.zeros((b,), jnp.int32),  # max_ts: < ts0 = none sampled yet
        self_k,
        self_v,
        jnp.zeros((b,), bool),
        jnp.zeros((b,), jnp.float32),
        jnp.zeros((b,), jnp.int32),
        jnp.zeros((b,), jnp.float32),
    )

    def cond(state):
        pos, carry, _ = state
        if not early_exit:  # fixed-budget mode: run every step
            return pos < ctx - 1
        finished = carry[5]
        return (pos < ctx - 1) & ~jnp.all(finished)

    def body(state):
        pos, carry, buf = state
        carry, next_tok = step(carry, pos)
        buf = jax.lax.dynamic_update_slice_in_dim(
            buf, next_tok[:, None], pos + 1, axis=1
        )
        return pos + 1, carry, buf

    _, carry, tokens = jax.lax.while_loop(
        cond, body, (jnp.asarray(0, jnp.int32), init, tokens_buf)
    )
    return tokens, carry[6], carry[7], carry[8]


def greedy_decode(
    params: Params,
    dims: WhisperDims,
    encoded: jnp.ndarray,
    prompt: jnp.ndarray,  # (b, n_prompt) int32
    n_prompt: int,
    max_new: int = 224,
    compute_dtype=jnp.float32,
    kv_dtype: str | None = None,
    decoder_tap: tuple | None = None,
) -> jnp.ndarray:
    """Greedy-decode token ids: (b, n_prompt + max_new), EOT-padded."""
    return sample_decode(params, dims, encoded, prompt, n_prompt, max_new,
                         compute_dtype=compute_dtype, kv_dtype=kv_dtype,
                         decoder_tap=decoder_tap)[0]


@partial(jax.jit, static_argnames=("dims", "n_prompt", "max_new", "beam_size",
                                   "compute_dtype", "kv_dtype"))
def beam_decode(
    params: Params,
    dims: WhisperDims,
    encoded: jnp.ndarray,
    prompt: jnp.ndarray,  # (b, n_prompt) int32
    n_prompt: int,
    max_new: int = 224,
    beam_size: int = 5,
    start: jnp.ndarray | None = None,
    compute_dtype=jnp.float32,
    kv_dtype: str | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batched beam search as ONE fixed-shape lax.scan (whisper's
    BeamSearchDecoder semantics, TPU-native formulation).

    The beam dim folds into the batch for the decoder step (b·beam, …); each
    scan step takes the top 2·beam of the (beam × vocab) continuations with
    ``lax.top_k``, routes EOT-ending candidates into a fixed-size FINISHED
    pool (kept aside exactly as whisper's BeamSearchDecoder saves completed
    sequences — they stop occupying live slots), refills all ``beam`` live
    slots from the non-EOT candidates, and reorders the KV ring buffers and
    token history with one gather along the beam axis — no host syncs, no
    data-dependent shapes. Final selection is whisper's
    MaximumLikelihoodRanker with length_penalty=None — argmax of
    sum_logprob / (n_text + 1) over the finished pool, with live beams
    competing only when nothing finished (their pool scores start at −inf).
    ``start`` ((b,) int32, optional) is the conditioned-prompt left-crop
    offset, identical semantics to ``sample_decode`` — it lets beam search
    compose with ``condition_on_previous_text`` / ``initial_prompt`` (the
    whisper-default long-audio quality path). Returns ``(tokens
    (b, n_prompt+max_new), sum_logprob (b,), n_text (b,), no_speech_prob
    (b,))`` of the winning sequence — ``no_speech_prob`` is the raw-logits
    <|nospeech|> mass at the SOT step (identical across beams then), the
    statistic whisper's decode_with_fallback silence escape consumes.
    """
    st = special_tokens(dims.n_vocab)
    b = encoded.shape[0]
    L, d = dims.n_text_layer, dims.n_text_state
    V = dims.n_vocab
    ctx = n_prompt + max_new
    assert ctx <= dims.n_text_ctx

    params, encoded = _cast_decode_inputs(params, encoded, compute_dtype)
    # tile each clip's cross KV across its beams: (L, b·beam, s, ·) — the
    # int8 4-tuple's scale planes repeat identically
    cross_kv = tuple(
        jnp.repeat(c, beam_size, axis=1)
        for c in _cross_kv_stacks(params, dims, encoded, kv_dtype=kv_dtype)
    )
    suppress, suppress_blank = _suppress_tables(dims)
    ts0 = st.timestamp_begin

    self_k = jnp.zeros((L, b * beam_size, ctx, d), encoded.dtype)
    self_v = jnp.zeros((L, b * beam_size, ctx, d), encoded.dtype)
    start_rep = None if start is None else jnp.repeat(start, beam_size)

    def gather_beam(t, parent):
        """Reorder a (b, n, …) leaf by (b, k) indices along axis 1."""
        idx = parent.reshape(b, parent.shape[1], *([1] * (t.ndim - 2)))
        return jnp.take_along_axis(t, idx, axis=1)

    def step(carry, pos):
        (token, prev, max_ts, sk, sv, cum, n_text, seq,
         fin_key, fin_score, fin_ntext, fin_seq, nsp) = carry
        logits, sk, sv = _decode_step(
            params, dims, token.reshape(-1), pos, sk, sv, cross_kv,
            start=start_rep,
        )
        # SOT-step <|nospeech|> mass from the RAW logits (pre-rules); during
        # the prompt phase every beam is identical, so beam 0 suffices
        logits0 = logits.reshape(b, beam_size, V)[:, 0, :]
        nsp = jnp.where(
            token[:, 0] == st.sot,
            jax.nn.softmax(logits0, axis=-1)[:, st.no_speech],
            nsp,
        )
        at_first = pos + 1 == n_prompt
        at_second = pos + 1 == n_prompt + 1
        logits = _apply_rules(
            logits, token.reshape(-1), prev.reshape(-1), max_ts.reshape(-1),
            at_first, st, suppress, suppress_blank, at_second=at_second,
        )
        lp = jax.nn.log_softmax(logits, axis=-1).reshape(b, beam_size, V)
        cand = cum[..., None] + lp  # (b, beam, V)

        # whisper BeamSearchDecoder.update: each parent beam proposes its top
        # beam_size+1 continuations; candidates are visited in global
        # logprob order, EOT-ending ones complete into the finished pool
        # UNTIL `beam` live slots fill (the loop's break), the rest refill
        # all `beam` live slots. Reproduced on the global top-2·beam with a
        # per-parent occurrence cap (candidates past a parent's
        # (beam+1)-th are invisible to whisper) and a live-count-before
        # gate on EOT acceptance. Each parent's visible set has ≥ beam
        # non-EOT entries, so live refill never starves.
        vals2, idx2 = jax.lax.top_k(cand.reshape(b, beam_size * V),
                                    2 * beam_size)
        par2 = (idx2 // V).astype(jnp.int32)
        tok2 = (idx2 % V).astype(jnp.int32)
        is_eot = tok2 == st.eot

        same_parent = par2[:, :, None] == par2[:, None, :]  # (b, 2B, 2B)
        r = jnp.arange(2 * beam_size)
        occ = jnp.sum(same_parent & (r[None, None, :] <= r[None, :, None]),
                      axis=-1)  # 1-based occurrence index within the parent
        visible = occ <= beam_size + 1
        live_cand = visible & ~is_eot
        live_before = jnp.cumsum(live_cand.astype(jnp.int32), axis=1) \
            - live_cand.astype(jnp.int32)  # exclusive

        live_vals = jnp.where(live_cand, vals2, -jnp.inf)
        top_val, pick = jax.lax.top_k(live_vals, beam_size)
        parent = jnp.take_along_axis(par2, pick, axis=1)
        new_tok = jnp.take_along_axis(tok2, pick, axis=1)

        is_prompt = pos + 1 < n_prompt
        beam_iota = jnp.broadcast_to(jnp.arange(beam_size), (b, beam_size))
        parent = jnp.where(is_prompt, beam_iota, parent)
        forced = jnp.broadcast_to(
            prompt[:, jnp.minimum(pos + 1, n_prompt - 1)][:, None],
            (b, beam_size),
        )
        new_tok = jnp.where(is_prompt, forced, new_tok)
        new_cum = jnp.where(is_prompt, cum, top_val)

        # finished-pool update (sampling phase only). whisper fills the pool
        # FIRST-COME in candidate-rank order and ignores completions once it
        # holds `beam` sequences (BeamSearchDecoder.update's
        # ``len(finished) < beam`` guard) — reproduced with a monotone
        # insertion key: earlier steps/ranks always win the keep-smallest-k
        # merge, so a full pool never changes. An EOT candidate is only SEEN
        # at all while fewer than `beam` live candidates precede it (the
        # update loop breaks at beam saved) and only within its parent's
        # visible top-(beam+1)
        accepted = (is_eot & visible & (live_before < beam_size)
                    & ~is_prompt)
        cand_key = jnp.where(
            accepted,
            pos.astype(jnp.float32) * (2 * beam_size)
            + jnp.arange(2 * beam_size, dtype=jnp.float32)[None, :],
            jnp.inf,
        )
        eot_vals = jnp.where(accepted, vals2, -jnp.inf)
        eot_ntext = jnp.take_along_axis(n_text, par2, axis=1)
        # completed sequence == parent's seq (positions > pos are EOT-filled)
        eot_seq = gather_beam(seq, par2)  # (b, 2·beam, ctx)
        all_keys = jnp.concatenate([fin_key, cand_key], axis=1)
        all_scores = jnp.concatenate([fin_score, eot_vals], axis=1)
        all_ntext = jnp.concatenate([fin_ntext, eot_ntext], axis=1)
        all_seq = jnp.concatenate([fin_seq, eot_seq], axis=1)
        neg_keys, keep = jax.lax.top_k(-all_keys, beam_size)
        fin_key = -neg_keys
        fin_score = jnp.take_along_axis(all_scores, keep, axis=1)
        fin_ntext = jnp.take_along_axis(all_ntext, keep, axis=1)
        fin_seq = gather_beam(all_seq, keep)

        # reorder per-beam live state by parent
        prev_tok = jnp.take_along_axis(token, parent, axis=1)
        max_ts = jnp.take_along_axis(max_ts, parent, axis=1)
        n_text = jnp.take_along_axis(n_text, parent, axis=1)
        seq = gather_beam(seq, parent)
        flat_parent = (
            parent + jnp.arange(b)[:, None] * beam_size
        ).reshape(-1)
        sk = jnp.take(sk, flat_parent, axis=1)
        sv = jnp.take(sv, flat_parent, axis=1)

        n_text = n_text + jnp.where(is_prompt, 0, 1)  # live picks are non-EOT
        max_ts = jnp.where(
            new_tok >= ts0, jnp.maximum(max_ts, new_tok), max_ts
        )
        seq = jax.lax.dynamic_update_slice_in_dim(
            seq, new_tok[:, :, None], pos + 1, axis=2
        )
        return (new_tok, prev_tok, max_ts, sk, sv, new_cum, n_text, seq,
                fin_key, fin_score, fin_ntext, fin_seq, nsp)

    cum0 = jnp.broadcast_to(
        jnp.where(jnp.arange(beam_size) == 0, 0.0, -jnp.inf), (b, beam_size)
    )
    seq0 = jnp.full((b, beam_size, ctx), st.eot, jnp.int32)
    seq0 = seq0.at[:, :, 0].set(prompt[:, :1])
    init = (
        jnp.broadcast_to(prompt[:, :1], (b, beam_size)),
        jnp.zeros((b, beam_size), jnp.int32),
        jnp.zeros((b, beam_size), jnp.int32),  # max_ts: < ts0 = none yet
        self_k,
        self_v,
        cum0,
        jnp.zeros((b, beam_size), jnp.int32),
        seq0,
        jnp.full((b, beam_size), jnp.inf),    # finished-pool insertion keys
        jnp.full((b, beam_size), -jnp.inf),   # finished-pool scores
        jnp.zeros((b, beam_size), jnp.int32),
        jnp.full((b, beam_size, ctx), st.eot, jnp.int32),
        jnp.zeros((b,), jnp.float32),         # no_speech_prob
    )
    # Early-exit loop: whisper's BeamSearchDecoder reports completed once
    # every audio has beam_size finished sequences — and this formulation's
    # FULL pool is immutable by construction (monotone insertion keys: a
    # full pool's keep-smallest-k merge never admits a later candidate), the
    # finalize ranking then ignores live beams (n_fin == beam_size), so
    # stopping there is exact, not approximate.
    def cond(state):
        pos, carry = state
        fin_key = carry[8]
        pools_full = jnp.all(
            jnp.sum(jnp.isfinite(fin_key), axis=1) == beam_size
        )
        return (pos < ctx - 1) & ~pools_full

    def body(state):
        pos, carry = state
        return pos + 1, step(carry, pos)

    _, carry = jax.lax.while_loop(
        cond, body, (jnp.asarray(0, jnp.int32), init)
    )
    (_, _, _, _, _, cum, n_text, seq,
     fin_key, fin_score, fin_ntext, fin_seq, nsp) = carry
    # MaximumLikelihoodRanker with length_penalty=None: sum_logprob / LENGTH
    # (the +1 denominator is the avg_logprob STATISTIC only, whisper
    # decode()'s ranker divides by the text-token count). whisper's finalize
    # pads the candidate set with the best UNFINISHED beams whenever fewer
    # than beam_size sequences finished (``len(sequences) < beam_size``, not
    # only when none did): with n finished, the top (beam−n) live beams —
    # already cum-sorted from the top_k refill — join the ranking.
    valid = jnp.isfinite(fin_key)
    n_fin = valid.sum(axis=1, keepdims=True)
    live_ok = jnp.arange(beam_size)[None, :] < (beam_size - n_fin)
    live_len = jnp.maximum(n_text.astype(jnp.float32), 1.0)
    live_score = jnp.where(live_ok, cum / live_len, -jnp.inf)
    fin_avg = fin_score / jnp.maximum(fin_ntext.astype(jnp.float32), 1.0)
    fin_avg = jnp.where(valid, fin_avg, -jnp.inf)
    all_score = jnp.concatenate([fin_avg, live_score], axis=1)
    all_sum = jnp.concatenate([fin_score, cum], axis=1)
    all_ntext = jnp.concatenate([fin_ntext, n_text], axis=1)
    all_seq = jnp.concatenate([fin_seq, seq], axis=1)
    best = jnp.argmax(all_score, axis=1)
    tokens = jnp.take_along_axis(all_seq, best[:, None, None], axis=1)[:, 0]
    sum_lp = jnp.take_along_axis(all_sum, best[:, None], axis=1)[:, 0]
    n_best = jnp.take_along_axis(all_ntext, best[:, None], axis=1)[:, 0]
    return tokens, sum_lp, n_best, nsp
