"""Transcription (serving) throughput: batched greedy decode RTFx on TPU.

The reference never measures decode (its GUI transcribes one clip at a
time); this probe records the serving-side headline — how many audio-seconds
per wall-second one chip transcribes with the fixed-shape KV-cached scan
decoder at production-ish settings (batch 8, max_new 224, language pinned).
"""

from __future__ import annotations

import json
import time

import numpy as np

import freud_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from freud_tpu.models.whisper import dims_for, encoder_forward, init_params
from freud_tpu.models.whisper.decoding import sample_decode
from freud_tpu.models.whisper.tokenizer import special_tokens


def run(model="tiny", batch=8, max_new=224, iters=5, warmup=2,
        dtype=None, eot_bias=False, label=None):
    dims = dims_for(model)
    params = init_params(dims, seed=0)
    if eot_bias:
        # Early-exit mechanism demo: steer the final-LN bias toward the EOT
        # embedding so every (real-compute) decode emits EOT right after the
        # forced initial timestamp. Wall time should collapse to ~(n_prompt+2)
        # of the 227 budgeted steps — proving lax.while_loop's all-finished
        # exit fires on-chip. NOT a serving-throughput claim.
        import numpy as _np
        st_ = special_tokens(dims.n_vocab)
        emb = _np.asarray(params["decoder"]["tok_emb"])
        eot_dir = emb[st_.eot] / (_np.linalg.norm(emb[st_.eot]) + 1e-9)
        dec = dict(params["decoder"])
        dec["ln"] = dict(dec["ln"], b=jnp.asarray(
            _np.asarray(dec["ln"]["b"]) + 40.0 * eot_dir))
        params = {**params, "decoder": dec}
    st = special_tokens(dims.n_vocab)
    rng = np.random.default_rng(0)
    mels = jnp.asarray(
        rng.standard_normal((batch, dims.n_mels, 3000)).astype(np.float32) * 0.3)

    cdt = dtype or jnp.float32

    @jax.jit
    def pipeline(params, mels):
        encoded, _ = encoder_forward(params, dims, mels, compute_dtype=cdt)
        seq = st.sot_sequence(lang_index=0, timestamps=True)
        prompt = jnp.tile(jnp.asarray(seq, jnp.int32)[None], (batch, 1))
        tokens, sum_lp, n_text, nsp = sample_decode(
            params, dims, encoded, prompt, len(seq), max_new=max_new,
            compute_dtype=cdt)
        return jnp.sum(tokens[:, -1].astype(jnp.float32)) + jnp.sum(sum_lp)

    for _ in range(warmup):
        float(pipeline(params, mels))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = pipeline(params, mels)
    float(out)
    dt = (time.perf_counter() - t0) / iters
    audio_s = batch * 30.0
    print(json.dumps({
        "model": model, "batch": batch, "max_new": max_new,
        "dtype": jnp.dtype(cdt).name, "mode": label or "full_budget",
        "ms_per_batch": round(dt * 1e3, 1),
        "transcribe_rtfx": round(audio_s / dt, 1),
        "clips_per_sec": round(batch / dt, 2),
    }))


def main():
    for batch in (8, 32):
        run(batch=batch)
    for batch in (8, 32):
        run(batch=batch, dtype=jnp.bfloat16)
    run(batch=8, dtype=jnp.bfloat16, eot_bias=True, label="early_exit_demo")
    # family rows: small, and large-v3-turbo (the production serving model:
    # large encoder, 4-layer decoder)
    run(model="small", batch=8, dtype=jnp.bfloat16)
    run(model="turbo", batch=8, dtype=jnp.bfloat16)


if __name__ == "__main__":
    main()
