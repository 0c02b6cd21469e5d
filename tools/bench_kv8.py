"""End-to-end serving RTFx of the int8 cross-KV decode knob. VERDICT: LOSES.

tools/bench_decode3.py isolated the token step and found ``x_kv8_deq`` (int8
cross-K/V planes dequantized at the attention dot) at 0.253 vs bf16's 0.359
ms/step with exact token agreement. This probe measures the knob behind the
same encoder+decode pipeline bench.py's serving row times, to see what
survives end-to-end. Result (v5e): the bare product-step scan (``--step``)
keeps the win — tiny b8 0.403 → 0.273, small b8 3.90 → 3.16 ms/step — but
the composed early-exit while_loop LOSES on every model: tiny b8
3854 → 3257 RTFx, small b8 455 → 262. The composed bf16 body is already
cross-op-overlapped; the dequant producer breaks that overlap instead of
fusing into the dot as it does under a bare scan. Outcome: ``kv_dtype`` is
a probe-only decoding knob, NOT wired into runtime/CLI/server (same
discipline as bench_sqattn.py's unintegrated kernel).
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


def run(model: str, batch: int, kv_dtype, max_new: int = 224,
        iters: int = 5, warmup: int = 2) -> float:
    dims = dims_for(model)
    params = init_params(dims, seed=0)
    st = special_tokens(dims.n_vocab)
    rng = np.random.default_rng(0)
    mels = jnp.asarray(
        rng.standard_normal((batch, dims.n_mels, 3000)).astype(np.float32)
        * 0.3)

    @jax.jit
    def pipeline(params, mels):
        encoded, _ = encoder_forward(
            params, dims, mels, compute_dtype=jnp.bfloat16)
        seq = st.sot_sequence(lang_index=0, timestamps=True)
        prompt = jnp.tile(jnp.asarray(seq, jnp.int32)[None], (batch, 1))
        tokens, sum_lp, _, _ = sample_decode(
            params, dims, encoded, prompt, len(seq), max_new=max_new,
            compute_dtype=jnp.bfloat16, kv_dtype=kv_dtype)
        return jnp.sum(tokens[:, -1].astype(jnp.float32)) + jnp.sum(sum_lp)

    for _ in range(warmup):
        float(pipeline(params, mels))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = pipeline(params, mels)
    float(out)
    dt = (time.perf_counter() - t0) / iters
    return batch * 30.0 / dt


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="tiny")
    ap.add_argument("--batches", default="8,32")
    args = ap.parse_args()

    out = {"model": args.model}
    for b in (int(x) for x in args.batches.split(",")):
        for kv in (None, "int8"):
            tag = f"b{b}_" + ("kv8" if kv else "bf16")
            out[tag + "_rtfx"] = round(run(args.model, b, kv))
            print(json.dumps(out), flush=True)
    print(json.dumps(out))




def step_scan(model: str, batch: int, kv_dtype, steps: int = 128,
              iters: int = 10, warmup: int = 3) -> float:
    """ms/step of the PRODUCT ``_decode_step`` under a bare fixed scan (no
    rules, no sampling, no early exit) — the bench_decode3 methodology but
    through decoding.py's real step + ``_cross_kv_stacks``. Separates "the
    product step formulation lost the fusion" from "the composed
    while_loop/rules body lost it"."""
    from freud_tpu.models.whisper.decoding import (
        _cross_kv_stacks, _decode_step)

    dims = dims_for(model)
    params = init_params(dims, seed=0)
    rng = np.random.default_rng(0)
    mels = jnp.asarray(
        rng.standard_normal((batch, dims.n_mels, 3000)).astype(np.float32)
        * 0.3)
    encoded, _ = jax.jit(
        lambda p, m: encoder_forward(p, dims, m,
                                     compute_dtype=jnp.bfloat16))(params, mels)
    L, d = dims.n_text_layer, dims.n_text_state

    @jax.jit
    def run_steps(params, encoded):
        from freud_tpu.models.whisper.decoding import _cast_decode_inputs
        params, encoded = _cast_decode_inputs(params, encoded, jnp.bfloat16)
        cross_kv = _cross_kv_stacks(params, dims, encoded, kv_dtype=kv_dtype)
        sk = jnp.zeros((L, batch, steps, d), encoded.dtype)
        sv = jnp.zeros((L, batch, steps, d), encoded.dtype)

        def body(carry, pos):
            token, sk, sv = carry
            logits, sk, sv = _decode_step(
                params, dims, token, pos, sk, sv, cross_kv)
            return (jnp.argmax(logits, -1).astype(jnp.int32), sk, sv), None

        tok0 = jnp.zeros((batch,), jnp.int32)
        (tok, _, _), _ = jax.lax.scan(
            body, (tok0, sk, sv), jnp.arange(steps))
        return jnp.sum(tok)

    for _ in range(warmup):
        float(run_steps(params, encoded))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run_steps(params, encoded)
    float(out)
    return (time.perf_counter() - t0) / iters / steps * 1e3


def main_step():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="tiny")
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()
    out = {"model": args.model, "batch": args.batch}
    for kv in (None, "int8"):
        tag = "kv8" if kv else "bf16"
        out[tag + "_ms_per_step"] = round(step_scan(args.model, args.batch, kv), 4)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    import sys
    if "--step" in sys.argv:
        sys.argv.remove("--step")
        main_step()
    else:
        main()
