"""Decode per-step cost decomposition (bf16 serving config).

Where does the ~0.46 ms/token (tiny, batch 8, bf16) actually go? Each run
ablates one component of ``_decode_step`` (monkeypatch + jit-cache clear)
and re-times the full pipeline. To keep the step count IDENTICAL across
variants (the early-exit loop would otherwise exit at different positions
for different ablations), every variant — including the baseline — shifts
the EOT id out of vocab range so no decode ever finishes early: all run the
full ``max_new`` budget and ms/step is directly comparable.

Ablations are NOT semantics-preserving; this is a measurement probe only.
"""

from __future__ import annotations

import json
import time

import numpy as np

import freud_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from freud_tpu.models.whisper import decoding
from freud_tpu.models.whisper import dims_for, encoder_forward, init_params
from freud_tpu.models.whisper import tokenizer as tok_mod
from freud_tpu.models.whisper.model import _layer_norm, _linear


def _timed_pipeline(dims, params, mels, seq, batch, max_new=128, iters=5,
                    warmup=2):
    @jax.jit
    def pipeline(params, mels):
        encoded, _ = encoder_forward(params, dims, mels,
                                     compute_dtype=jnp.bfloat16)
        prompt = jnp.tile(jnp.asarray(seq, jnp.int32)[None], (batch, 1))
        tokens, sum_lp, _, _ = decoding.sample_decode(
            params, dims, encoded, prompt, len(seq), max_new=max_new,
            compute_dtype=jnp.bfloat16)
        return jnp.sum(tokens[:, -1].astype(jnp.float32)) + jnp.sum(sum_lp)

    for _ in range(warmup):
        float(pipeline(params, mels))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = pipeline(params, mels)
    float(out)
    return (time.perf_counter() - t0) / iters


def main():
    model, batch, max_new = "tiny", 8, 128
    dims = dims_for(model)
    params = init_params(dims, seed=0)
    rng = np.random.default_rng(0)
    mels = jnp.asarray(
        rng.standard_normal((batch, dims.n_mels, 3000)).astype(np.float32)
        * 0.3)

    # EOT out of vocab range → no variant ever exits early (uniform steps)
    import dataclasses
    real_st = tok_mod.special_tokens(dims.n_vocab)
    shifted = dataclasses.replace(real_st, eot=dims.n_vocab + 7)
    # the suppress tables index arrays by st.eot — build them from the REAL
    # ids once and serve them under the patch
    real_tables = decoding._suppress_tables(dims)

    def with_patches(step_fn=None):
        decoding._sample_decode_impl.clear_cache()
        saved_step = decoding._decode_step
        saved_tok = decoding.special_tokens
        saved_tables = decoding._suppress_tables
        decoding.special_tokens = lambda n: shifted
        decoding._suppress_tables = lambda dims_: real_tables
        if step_fn is not None:
            decoding._decode_step = step_fn
        try:
            seq = real_st.sot_sequence(lang_index=0, timestamps=True)
            return _timed_pipeline(dims, params, mels, seq, batch,
                                   max_new=max_new)
        finally:
            decoding._decode_step = saved_step
            decoding.special_tokens = saved_tok
            decoding._suppress_tables = saved_tables
            decoding._sample_decode_impl.clear_cache()

    orig_step = decoding._decode_step

    def make_ablated(no_self=False, no_cross=False, no_mlp=False,
                     cheap_vocab=False):
        def step(params_, dims_, token, pos, self_k, self_v, cross_kv,
                 start=None):
            p = params_["decoder"]
            heads = dims_.n_text_head
            d = dims_.n_text_state
            dh = d // heads
            scale = dh ** -0.25
            ctx = self_k.shape[-2]
            pe = jax.lax.dynamic_slice_in_dim(p["pos"], pos, 1, axis=0)
            x = p["tok_emb"][token][:, None, :] + pe
            pos_mask = (jnp.arange(ctx) <= pos)[None, None, None, :]

            def split(t):
                *lead, dd = t.shape
                return jnp.moveaxis(
                    t.reshape(*lead, heads, dd // heads), -2, -3)

            new_k, new_v = [], []
            for i, block in enumerate(p["blocks"]):
                h = _layer_norm(block["attn_ln"], x)
                k_t = _linear(block["attn"]["k"], h)
                v_t = _linear(block["attn"]["v"], h)
                bk = jax.lax.dynamic_update_slice_in_dim(
                    self_k[i], k_t, pos, axis=-2)
                bv = jax.lax.dynamic_update_slice_in_dim(
                    self_v[i], v_t, pos, axis=-2)
                new_k.append(bk)
                new_v.append(bv)
                if not no_self:
                    q = _linear(block["attn"]["q"], h)
                    qh, kh, vh = split(q) * scale, split(bk) * scale, split(bv)
                    lg = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                                    preferred_element_type=jnp.float32)
                    lg = jnp.where(pos_mask, lg, -jnp.inf)
                    w = jax.nn.softmax(lg, axis=-1).astype(x.dtype)
                    at = jnp.einsum("bhqk,bhkd->bhqd", w, vh)
                    at = jnp.moveaxis(at, -3, -2).reshape(*x.shape)
                    x = x + _linear(block["attn"]["out"], at)
                if not no_cross:
                    h = _layer_norm(block["cross_attn_ln"], x)
                    q = _linear(block["cross_attn"]["q"], h)
                    ck, cv = cross_kv[0][i], cross_kv[1][i]
                    qh, kh, vh = split(q) * scale, split(ck) * scale, split(cv)
                    lg = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                                    preferred_element_type=jnp.float32)
                    w = jax.nn.softmax(lg, axis=-1).astype(x.dtype)
                    at = jnp.einsum("bhqk,bhkd->bhqd", w, vh)
                    at = jnp.moveaxis(at, -3, -2).reshape(*x.shape)
                    x = x + _linear(block["cross_attn"]["out"], at)
                if not no_mlp:
                    h = _layer_norm(block["mlp_ln"], x)
                    h = _linear(block["mlp"]["fc2"],
                                jax.nn.gelu(_linear(block["mlp"]["fc1"], h),
                                            approximate=False))
                    x = x + h

            x = _layer_norm(p["ln"], x)
            if cheap_vocab:
                lg = jnp.pad(
                    jnp.sum(x, axis=-1, keepdims=True).astype(jnp.float32),
                    ((0, 0), (0, 0), (0, dims_.n_vocab - 1)))
            else:
                lg = jnp.einsum("bqd,vd->bqv", x, p["tok_emb"],
                                preferred_element_type=jnp.float32)
            return lg[:, 0, :], jnp.stack(new_k), jnp.stack(new_v)

        return step

    results = {}
    results["full"] = with_patches()
    results["no_rules"] = None  # known ~0 from tools/bench_decode.py
    for name, kw in [
        ("no_self_attn", dict(no_self=True)),
        ("no_cross_attn", dict(no_cross=True)),
        ("no_mlp", dict(no_mlp=True)),
        ("cheap_vocab_proj", dict(cheap_vocab=True)),
    ]:
        results[name] = with_patches(make_ablated(**kw))
    decoding._decode_step = orig_step

    base = results["full"]
    out = {"model": model, "batch": batch, "max_new": max_new,
           "full_ms": round(base * 1e3, 1)}
    for k, v in results.items():
        if v is None or k == "full":
            continue
        out[k + "_saved_ms"] = round((base - v) * 1e3, 1)
    out["ms_per_step_full"] = round(base * 1e3 / max_new, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
