"""int8 decode probe: can quantization beat the bf16 HBM-read floor?

bench_decode2.py's decomposition pinned the bf16 token step at ~1.8x its
HBM-bandwidth floor, dominated by re-reading the cross-attention K/V planes
(58%), self-attention state (27%) and decoder weights every generated token.
int8 halves those bytes again and v5e's MXU runs s8xs8->s32 natively, so this
probe times ISOLATED decode-step variants (fixed 128-step lax.scan, no rules,
no sampling -- rules measured ~0 in bench_decode.py) to find which int8
placements actually pay on-chip:

  bf16            baseline (the shipping serving step)
  x_kv8           int8 cross-K/V planes, per-(b,s) scales, int8 QK^T and
                  int8 (scale-folded, requantized) attn@V
  x_kv8_deq       int8 cross-K/V planes dequantized to bf16 before einsum
                  (tests whether XLA fuses the convert into the dot read)
  kv8             x_kv8 + int8 self-attention ring buffers
  w8              kv8 + weight-only int8 linears (dequant to bf16 at use)
  w8_dyn          kv8 + int8 linears with dynamic per-row activation
                  quantization (full s8xs8->s32 dots)

Measurement probe only -- NOT semantics-preserving (no EOT, no rules).
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
from freud_tpu.models.whisper.model import _layer_norm


def _quant_rows(t, axis=-1):
    """Symmetric int8 quantization along ``axis``: returns (int8, f32 scale)."""
    amax = jnp.max(jnp.abs(t.astype(jnp.float32)), axis=axis, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(t.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def _split_heads(t, heads):
    *lead, d = t.shape
    return jnp.moveaxis(t.reshape(*lead, heads, d // heads), -2, -3)


def _linear_bf16(p, x):
    y = x @ p["w"]
    return y + p["b"] if "b" in p else y


def _linear_w8(p, x):
    """Weight-only int8: dequantize to bf16 at the point of use."""
    w = p["w8"].astype(jnp.bfloat16) * p["ws"].astype(jnp.bfloat16)
    y = x @ w
    return y + p["b"] if "b" in p else y


def _linear_w8_dyn(p, x):
    """Dynamic activation quantization: s8 x s8 -> s32 dot, rescale after."""
    xq, xs = _quant_rows(x)  # per-row activation scale
    y = jax.lax.dot_general(
        xq, p["w8"], (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32) * xs * p["ws"].reshape(1, -1)
    y = y.astype(jnp.bfloat16)
    return y + p["b"] if "b" in p else y


def _attn_bf16(q, k, v, heads, scale, mask=None):
    qh = _split_heads(q, heads) * scale
    kh = _split_heads(k, heads) * scale
    vh = _split_heads(v, heads)
    logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                        preferred_element_type=jnp.float32)
    if mask is not None:
        logits = jnp.where(mask, logits, -jnp.inf)
    w = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", w, vh)
    return jnp.moveaxis(out, -3, -2).reshape(*q.shape)


def _attn_kv8(q, k8, ks, v8, vs, heads, scale_total, mask=None, deq=False):
    """Attention against int8 K/V with per-(b, s) scales.

    deq=True dequantizes K/V to bf16 and runs the bf16 einsum (XLA convert-
    fusion test); deq=False keeps the dots in s8xs8->s32.
    """
    b, s, d = k8.shape
    if deq:
        k = (k8.astype(jnp.bfloat16) * ks.astype(jnp.bfloat16))
        v = (v8.astype(jnp.bfloat16) * vs.astype(jnp.bfloat16))
        qh = _split_heads(q, heads) * (scale_total ** 0.5)
        kh = _split_heads(k, heads) * (scale_total ** 0.5)
        vh = _split_heads(v, heads)
        logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                            preferred_element_type=jnp.float32)
        if mask is not None:
            logits = jnp.where(mask, logits, -jnp.inf)
        w = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", w, vh)
        return jnp.moveaxis(out, -3, -2).reshape(*q.shape)

    q8, qs = _quant_rows(q)  # (b, 1, d) per-row
    q8h = _split_heads(q8, heads)  # (b, h, 1, dh)
    k8h = _split_heads(k8, heads)  # (b, h, s, dh)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q8h, k8h,
                        preferred_element_type=jnp.int32).astype(jnp.float32)
    # scales: q per (b,1) row -> (b,1,1,1); k per (b,s) -> (b,1,1,s)
    logits = logits * qs.reshape(b, 1, 1, 1) * jnp.swapaxes(
        ks, 1, 2).reshape(b, 1, 1, s) * scale_total
    if mask is not None:
        logits = jnp.where(mask, logits, -jnp.inf)
    w = jax.nn.softmax(logits, axis=-1)  # (b, h, 1, s) f32
    # fold the V scale into the weights, then requantize the weights per row
    wv = w * jnp.swapaxes(vs, 1, 2).reshape(b, 1, 1, s)
    w8, wss = _quant_rows(wv)
    v8h = _split_heads(v8, heads)
    out = jnp.einsum("bhqk,bhkd->bhqd", w8, v8h,
                     preferred_element_type=jnp.int32).astype(jnp.float32)
    out = (out * wss).astype(jnp.bfloat16)
    return jnp.moveaxis(out, -3, -2).reshape(*q.shape)


def make_step(dims, variant):
    """One decoder token step; state layout depends on variant."""
    heads = dims.n_text_head
    d = dims.n_text_state
    dh = d // heads
    scale = dh ** -0.25

    kv8 = variant in ("kv8", "w8", "w8_dyn")
    xkv8 = variant in ("x_kv8", "x_kv8_deq") or kv8
    deq = variant == "x_kv8_deq"
    if variant == "w8":
        linear = _linear_w8
    elif variant == "w8_dyn":
        linear = _linear_w8_dyn
    else:
        linear = _linear_bf16

    def step(p, token, pos, self_state, cross_state):
        pe = jax.lax.dynamic_slice_in_dim(p["pos"], pos, 1, axis=0)
        x = (p["tok_emb_r"][token][:, None, :] + pe).astype(jnp.bfloat16)
        ctx = (self_state[0].shape[-2] if not kv8
               else self_state[0].shape[-2])
        pos_mask = (jnp.arange(ctx) <= pos)[None, None, None, :]

        new_self = []
        for i, block in enumerate(p["blocks"]):
            h = _layer_norm(block["attn_ln"], x)
            q = linear(block["attn"]["q"], h)
            k_t = linear(block["attn"]["k"], h)
            v_t = linear(block["attn"]["v"], h)
            if kv8:
                sk8, sks, sv8, svs = [s[i] for s in self_state]
                k8_t, ks_t = _quant_rows(k_t)
                v8_t, vs_t = _quant_rows(v_t)
                sk8 = jax.lax.dynamic_update_slice_in_dim(sk8, k8_t, pos, -2)
                sks = jax.lax.dynamic_update_slice_in_dim(sks, ks_t, pos, -2)
                sv8 = jax.lax.dynamic_update_slice_in_dim(sv8, v8_t, pos, -2)
                svs = jax.lax.dynamic_update_slice_in_dim(svs, vs_t, pos, -2)
                new_self.append((sk8, sks, sv8, svs))
                attn = _attn_kv8(q, sk8, sks, sv8, svs, heads, scale * scale,
                                 mask=pos_mask)
            else:
                sk, sv = self_state[0][i], self_state[1][i]
                sk = jax.lax.dynamic_update_slice_in_dim(sk, k_t, pos, -2)
                sv = jax.lax.dynamic_update_slice_in_dim(sv, v_t, pos, -2)
                new_self.append((sk, sv))
                attn = _attn_bf16(q, sk, sv, heads, scale, mask=pos_mask)
            x = x + linear(block["attn"]["out"], attn)

            h = _layer_norm(block["cross_attn_ln"], x)
            q = linear(block["cross_attn"]["q"], h)
            if xkv8:
                ck8, cks, cv8, cvs = [c[i] for c in cross_state]
                attn = _attn_kv8(q, ck8, cks, cv8, cvs, heads, scale * scale,
                                 deq=deq)
            else:
                ck, cv = cross_state[0][i], cross_state[1][i]
                attn = _attn_bf16(q, ck, cv, heads, scale)
            x = x + linear(block["cross_attn"]["out"], attn)

            h = _layer_norm(block["mlp_ln"], x)
            h = linear(block["mlp"]["fc2"],
                       jax.nn.gelu(linear(block["mlp"]["fc1"], h),
                                   approximate=False))
            x = x + h

        x = _layer_norm(p["ln"], x)
        if variant in ("w8", "w8_dyn"):
            emb_t = {"w8": p["tok_emb8"], "ws": p["tok_embs"]}
            logits = (_linear_w8(emb_t, x) if variant == "w8"
                      else _linear_w8_dyn(emb_t, x)).astype(jnp.float32)
        else:
            logits = jnp.einsum("bqd,vd->bqv", x, p["tok_emb_r"],
                                preferred_element_type=jnp.float32)
        if kv8:
            stacked = tuple(jnp.stack([s[j] for s in new_self])
                            for j in range(4))
        else:
            stacked = (jnp.stack([s[0] for s in new_self]),
                       jnp.stack([s[1] for s in new_self]))
        return logits[:, 0, :], stacked

    return step


def prep(dims, params, batch, ctx, variant, rng):
    """Build the (params, self_state, cross_state) pytrees for a variant."""
    L, d, V = dims.n_text_layer, dims.n_text_state, dims.n_vocab
    s = dims.n_audio_ctx
    kv8 = variant in ("kv8", "w8", "w8_dyn")
    xkv8 = variant in ("x_kv8", "x_kv8_deq") or kv8

    dec = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.bfloat16), params["decoder"])
    # precomputed random cross K/V planes (stand-ins for encoder output @ Wk)
    cross_k = jnp.asarray(
        rng.standard_normal((L, batch, s, d)), jnp.bfloat16)
    cross_v = jnp.asarray(
        rng.standard_normal((L, batch, s, d)), jnp.bfloat16)

    p = {
        "pos": dec["pos"],
        "tok_emb_r": dec["tok_emb"],
        "ln": dec["ln"],
        "blocks": dec["blocks"],
    }
    if variant in ("w8", "w8_dyn"):
        def q_linear(lp):
            w8, ws = _quant_rows(lp["w"], axis=0)  # per-output-column
            out = {"w8": w8, "ws": ws.reshape(-1)}
            if "b" in lp:
                out["b"] = lp["b"]
            return out

        blocks = []
        for b_ in dec["blocks"]:
            nb = {
                "attn_ln": b_["attn_ln"], "mlp_ln": b_["mlp_ln"],
                "cross_attn_ln": b_["cross_attn_ln"],
                "attn": {k_: q_linear(b_["attn"][k_])
                         for k_ in ("q", "k", "v", "out")},
                "cross_attn": {k_: q_linear(b_["cross_attn"][k_])
                               for k_ in ("q", "k", "v", "out")},
                "mlp": {"fc1": q_linear(b_["mlp"]["fc1"]),
                        "fc2": q_linear(b_["mlp"]["fc2"])},
            }
            blocks.append(nb)
        p["blocks"] = blocks
        emb8, embs = _quant_rows(dec["tok_emb"].astype(jnp.float32).T, axis=0)
        p["tok_emb8"] = emb8          # (d, V) int8
        p["tok_embs"] = embs.reshape(-1)  # (V,)

    if xkv8:
        ck8, cks = _quant_rows(cross_k)
        cv8, cvs = _quant_rows(cross_v)
        cross_state = (ck8, cks, cv8, cvs)
    else:
        cross_state = (cross_k, cross_v)

    if kv8:
        self_state = (
            jnp.zeros((L, batch, ctx, d), jnp.int8),
            jnp.ones((L, batch, ctx, 1), jnp.float32),
            jnp.zeros((L, batch, ctx, d), jnp.int8),
            jnp.ones((L, batch, ctx, 1), jnp.float32),
        )
    else:
        self_state = (jnp.zeros((L, batch, ctx, d), jnp.bfloat16),
                      jnp.zeros((L, batch, ctx, d), jnp.bfloat16))
    return p, self_state, cross_state


def time_variant(dims, params, batch, variant, steps=128, iters=5, warmup=2):
    rng = np.random.default_rng(0)
    ctx = steps + 3
    p, self_state, cross_state = prep(dims, params, batch, ctx, variant, rng)
    step = make_step(dims, variant)

    @jax.jit
    def run(p, self_state, cross_state):
        def body(carry, pos):
            token, sstate = carry
            logits, sstate = step(p, token, pos, sstate, cross_state)
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return (nxt, sstate), logits[:, 0]

        (_, _), ls = jax.lax.scan(
            body, (jnp.zeros((batch,), jnp.int32), self_state),
            jnp.arange(steps))
        return jnp.sum(ls)

    for _ in range(warmup):
        float(run(p, self_state, cross_state))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(p, self_state, cross_state)
    float(out)
    dt = (time.perf_counter() - t0) / iters
    return dt * 1e3 / steps  # ms per token step


def check_variant(dims, params, batch, variant, steps=8):
    """CPU/functional sanity: greedy token trajectory + logit closeness vs
    the bf16 variant on identical random state. Returns (match_frac, rel)."""
    rng = np.random.default_rng(0)
    ctx = steps + 3

    def run(variant):
        p, self_state, cross_state = prep(dims, params, batch, ctx, variant,
                                          np.random.default_rng(7))
        step = make_step(dims, variant)

        @jax.jit
        def go(p, self_state, cross_state):
            def body(carry, pos):
                token, sstate = carry
                logits, sstate = step(p, token, pos, sstate, cross_state)
                nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                return (nxt, sstate), (nxt, logits)

            _, (toks, ls) = jax.lax.scan(
                body, (jnp.zeros((batch,), jnp.int32), self_state),
                jnp.arange(steps))
            return toks, ls

        return go(p, self_state, cross_state)

    rng  # noqa: B018 — single seed path
    t0, l0 = run("bf16")
    tv, lv = run(variant)
    match = float(jnp.mean((t0 == tv).astype(jnp.float32)))
    rel = float(jnp.linalg.norm((lv - l0).astype(jnp.float32))
                / (jnp.linalg.norm(l0.astype(jnp.float32)) + 1e-9))
    return match, rel


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="tiny")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=128)
    ap.add_argument("--variants", default="bf16,x_kv8,x_kv8_deq,kv8,w8,w8_dyn")
    ap.add_argument("--check", action="store_true",
                    help="numeric sanity vs bf16 (small steps), no timing")
    args = ap.parse_args()

    dims = dims_for(args.model)
    params = init_params(dims, seed=0)
    out = {"model": args.model, "batch": args.batch, "steps": args.steps}
    if args.check:
        for v in args.variants.split(","):
            if v == "bf16":
                continue
            match, rel = check_variant(dims, params, args.batch, v)
            out[v] = {"token_match": round(match, 4),
                      "logit_rel_err": round(rel, 5)}
            print(json.dumps({v: out[v]}), flush=True)
        print(json.dumps(out))
        return
    for v in args.variants.split(","):
        ms = time_variant(dims, params, args.batch, v, steps=args.steps)
        out[v + "_ms_per_step"] = round(ms, 4)
        print(json.dumps({**out}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
