"""int8 encoder probe: does quantization beat the bf16 collection forward?

The shipping collection forward (bf16 + fused q/k/v attention Pallas kernel)
runs at ~38% of v5e's bf16 MXU peak (bench_attn4.py: the remainder is
MXU shape-bound at dh=64). v5e runs s8xs8->s32 at 2x bf16 peak, and ~60%
of encoder FLOPs (q/k/v/out projections + MLP) have int8-friendly shapes,
so this probe times ISOLATED encoder-forward variants:

  bf16      real encoder_forward(compute_dtype=bf16) -- the shipping path
            (fused Pallas attention on TPU)
  w8        weight-only int8 linears (dequant to bf16 at use), einsum attn
  w8a8      dynamic per-row activation quant: s8xs8->s32 linears, bf16 attn
  w8a8_qk   w8a8 + int8 QK^T and AV attention matmuls

and reports ms/forward + the encoded-output relative error vs f32 (the
collection consumer stores these activations; error bounds the science
cost). Measurement probe only -- nothing here is wired into the pipeline.
"""

from __future__ import annotations

import json
import time
from functools import partial

import numpy as np

import freud_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from freud_tpu.models.whisper import dims_for, init_params
from freud_tpu.models.whisper.model import _layer_norm, encoder_forward


def _quant_rows(t, axis=-1):
    amax = jnp.max(jnp.abs(t.astype(jnp.float32)), axis=axis, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(t.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def _linear_bf16(p, x):
    return x @ p["w"] + p["b"] if "b" in p else x @ p["w"]


def _linear_w8(p, x):
    w = p["w8"].astype(jnp.bfloat16) * p["ws"].astype(jnp.bfloat16)
    y = x @ w
    return y + p["b"] if "b" in p else y


def _linear_w8a8(p, x):
    xq, xs = _quant_rows(x)
    y = jax.lax.dot_general(
        xq, p["w8"], (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32) * xs * p["ws"].reshape(1, 1, -1)
    y = y.astype(jnp.bfloat16)
    return y + p["b"] if "b" in p else y


def _split(t, heads):
    *lead, d = t.shape
    return jnp.moveaxis(t.reshape(*lead, heads, d // heads), -2, -3)


def _attn_bf16(q, k, v, heads):
    d = q.shape[-1]
    dh = d // heads
    scale = dh ** -0.25
    qh, kh, vh = _split(q, heads) * scale, _split(k, heads) * scale, _split(v, heads)
    logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                        preferred_element_type=jnp.float32)
    w = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", w, vh)
    return jnp.moveaxis(out, -3, -2).reshape(*q.shape)


def _attn_int8(q, k, v, heads):
    """QK^T and AV in s8xs8->s32 with per-(b, s) scales."""
    b, s, d = q.shape
    dh = d // heads
    scale_total = dh ** -0.5
    q8, qs = _quant_rows(q)
    k8, ks = _quant_rows(k)
    logits = jnp.einsum("bhqd,bhkd->bhqk", _split(q8, heads), _split(k8, heads),
                        preferred_element_type=jnp.int32).astype(jnp.float32)
    logits = logits * qs.reshape(b, 1, s, 1) * ks.reshape(b, 1, 1, s) * scale_total
    w = jax.nn.softmax(logits, axis=-1)
    v8, vs = _quant_rows(v)
    wv = w * vs.reshape(b, 1, 1, s)
    w8, wss = _quant_rows(wv)
    out = jnp.einsum("bhqk,bhkd->bhqd", w8, _split(v8, heads),
                     preferred_element_type=jnp.int32).astype(jnp.float32)
    out = (out * wss).astype(jnp.bfloat16)
    return jnp.moveaxis(out, -3, -2).reshape(b, s, d)


def make_encoder(dims, variant):
    heads = dims.n_audio_head
    if variant == "w8":
        linear = _linear_w8
    elif variant in ("w8a8", "w8a8_qk"):
        linear = _linear_w8a8
    else:
        linear = _linear_bf16
    attn = _attn_int8 if variant == "w8a8_qk" else _attn_bf16

    def forward(p, mels):
        x = jnp.swapaxes(mels.astype(jnp.bfloat16), -1, -2)
        x = jax.lax.conv_general_dilated(
            x, p["conv1w"], window_strides=(1,), padding=((1, 1),),
            dimension_numbers=("NHC", "HIO", "NHC")) + p["conv1b"]
        x = jax.nn.gelu(x, approximate=False)
        x = jax.lax.conv_general_dilated(
            x, p["conv2w"], window_strides=(2,), padding=((1, 1),),
            dimension_numbers=("NHC", "HIO", "NHC")) + p["conv2b"]
        x = jax.nn.gelu(x, approximate=False)
        x = x + p["pos"]

        for blk in p["blocks"]:
            h = _layer_norm(blk["attn_ln"], x)
            q = linear(blk["attn"]["q"], h)
            k = linear(blk["attn"]["k"], h)
            v = linear(blk["attn"]["v"], h)
            x = x + linear(blk["attn"]["out"], attn(q, k, v, heads))
            h = _layer_norm(blk["mlp_ln"], x)
            h = jax.nn.gelu(linear(blk["mlp"]["fc1"], h), approximate=False)
            x = x + linear(blk["mlp"]["fc2"], h)
        return _layer_norm(p["ln_post"], x)

    return forward


def prep(params, variant):
    enc = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.bfloat16), params["encoder"])
    q_weights = variant in ("w8", "w8a8", "w8a8_qk")

    def conv_layout(lp):
        return lp["w"], lp["b"]

    def q_linear(lp):
        if not q_weights:
            return dict(lp)
        w8, ws = _quant_rows(lp["w"], axis=0)
        out = {"w8": w8, "ws": ws.reshape(-1)}
        if "b" in lp:
            out["b"] = lp["b"]
        return out

    c1w, c1b = conv_layout(enc["conv1"])
    c2w, c2b = conv_layout(enc["conv2"])
    p = {
        "conv1w": c1w, "conv1b": c1b, "conv2w": c2w, "conv2b": c2b,
        "pos": enc["pos"], "ln_post": enc["ln_post"],
        "blocks": [
            {
                "attn_ln": b["attn_ln"], "mlp_ln": b["mlp_ln"],
                "attn": {k: q_linear(b["attn"][k])
                         for k in ("q", "k", "v", "out")},
                "mlp": {"fc1": q_linear(b["mlp"]["fc1"]),
                        "fc2": q_linear(b["mlp"]["fc2"])},
            }
            for b in enc["blocks"]
        ],
    }
    return p


def time_variant(dims, params, batch, variant, iters=10, warmup=3):
    rng = np.random.default_rng(0)
    mels = jnp.asarray(
        rng.standard_normal((batch, dims.n_mels, 3000)), jnp.float32)

    if variant == "bf16":
        @jax.jit
        def run(params, mels):
            enc, _ = encoder_forward(params, dims, mels,
                                     compute_dtype=jnp.bfloat16)
            return jnp.sum(enc.astype(jnp.float32))
        args = (params, mels)
    else:
        p = prep(params, variant)
        fwd = make_encoder(dims, variant)

        @jax.jit
        def run(p, mels):
            return jnp.sum(fwd(p, mels).astype(jnp.float32))
        args = (p, mels)

    for _ in range(warmup):
        float(run(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(*args)
    float(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms / forward


def check_variant(dims, params, batch, variant):
    """Relative error of the encoded output vs the f32 encoder."""
    rng = np.random.default_rng(0)
    mels = jnp.asarray(
        rng.standard_normal((batch, dims.n_mels, 3000)), jnp.float32)
    ref, _ = jax.jit(partial(encoder_forward, dims=dims))(params, mels=mels)
    if variant == "bf16":
        got, _ = jax.jit(partial(encoder_forward, dims=dims,
                                 compute_dtype=jnp.bfloat16))(params, mels=mels)
    else:
        got = jax.jit(make_encoder(dims, variant))(prep(params, variant), mels)
    num = jnp.linalg.norm((got.astype(jnp.float32) - ref).reshape(-1))
    den = jnp.linalg.norm(ref.reshape(-1)) + 1e-9
    return float(num / den)


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="tiny")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--variants", default="bf16,w8,w8a8,w8a8_qk")
    ap.add_argument("--check", action="store_true",
                    help="numeric error vs f32 only, no timing")
    args = ap.parse_args()

    dims = dims_for(args.model)
    params = init_params(dims, seed=0)
    out = {"model": args.model, "batch": args.batch}
    for v in args.variants.split(","):
        if args.check:
            out[v + "_rel_err"] = round(check_variant(dims, params,
                                                      min(args.batch, 2), v), 5)
        else:
            ms = time_variant(dims, params, args.batch, v)
            out[v + "_ms"] = round(ms, 3)
            sec_audio = args.batch * 30.0
            out[v + "_rtfx"] = round(sec_audio / (ms / 1e3))
        print(json.dumps(out), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
