"""Decode step decomposition: what does a token step cost, and where?

bench_transcribe measures ~0.88 ms/token-step (tiny, batch 8). This probe
splits it: full rule set vs no-rules argmax, varying max_new (fixed costs),
and encoder-only — to see whether the vocab-wide rule/softmax passes or the
per-step decoder matmuls dominate the serving path.
"""

from __future__ import annotations

import json
import time

import numpy as np

import freud_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from freud_tpu.models.whisper import dims_for, encoder_forward, init_params
from freud_tpu.models.whisper import decoding
from freud_tpu.models.whisper.tokenizer import special_tokens


def timeit(name, fn, *args, iters=5, warmup=2):
    for _ in range(warmup):
        float(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(out)
    print(json.dumps({"probe": name,
                      "ms": round((time.perf_counter() - t0) / iters * 1e3, 1)}),
          flush=True)


def main():
    dims = dims_for("tiny")
    params = init_params(dims, seed=0)
    st = special_tokens(dims.n_vocab)
    batch = 8
    rng = np.random.default_rng(0)
    mels = jnp.asarray(
        rng.standard_normal((batch, dims.n_mels, 3000)).astype(np.float32) * 0.3)

    @jax.jit
    def encode_only(params, mels):
        encoded, _ = encoder_forward(params, dims, mels)
        return jnp.sum(encoded[:, 0, 0])

    timeit("encode_only", encode_only, params, mels)

    seq = st.sot_sequence(lang_index=0, timestamps=True)

    def decode_n(max_new):
        @jax.jit
        def fn(params, mels):
            encoded, _ = encoder_forward(params, dims, mels)
            prompt = jnp.tile(jnp.asarray(seq, jnp.int32)[None], (batch, 1))
            tokens, sum_lp, _, _ = decoding.sample_decode(
                params, dims, encoded, prompt, len(seq), max_new=max_new)
            return jnp.sum(tokens[:, -1].astype(jnp.float32)) + jnp.sum(sum_lp)
        return fn

    timeit("decode_224", decode_n(224), params, mels)
    timeit("decode_32", decode_n(32), params, mels)

    # rules ablation: identity _apply_rules (NOT exact semantics — probe only)
    orig = decoding._apply_rules
    try:
        decoding._apply_rules = (
            lambda logits, token, prev, max_ts, at_first, st, s, sb, **kw: logits)
        decoding._sample_decode_impl.clear_cache()
        timeit("decode_224_no_rules", decode_n(224), params, mels)
    finally:
        decoding._apply_rules = orig
        decoding._sample_decode_impl.clear_cache()


if __name__ == "__main__":
    main()
