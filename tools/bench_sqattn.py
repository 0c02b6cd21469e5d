"""Single-query (decode-step) attention: fused Pallas kernel prototype.

The decode-step probe (tools/bench_decode2.py) shows cross-attention is 58%
of the per-token cost and runs at ~2x its HBM floor; self-attention is 27%
at ~8x its floor. This prototype benchmarks a fused single-query attention
kernel against the production einsum sequence, isolated from the decode
loop.

Layout trick: with dh=64, per-head einsums waste half the 128-lane VPU/MXU
width. The kernel keeps K/V head-packed as (s, d=384) — full lanes — and
computes per-head scores with the query folded into a one-hot head-selector
(qsel = q ⊙ Sel), so K and V are each touched by exactly one matmul:
    scores(s, h) = K @ qsel          u(h, d) = softmaxᵀ @ V
    out(d)       = Σ_h (SelT ⊙ u)
bf16 numerics are BIT-EXACT vs the einsum path (one-hot fold is exact).

MEASURED VERDICT (v5e, 2026-08-17 — in-jit scan timing; isolated per-call
dispatch on the tunneled backend would swamp everything): NOT integrated.
Both the grid-per-batch and single-program variants are flat ~110-150 µs
per invocation across (s=232..1500, d=384..1280) — invocation-latency
bound, far above the 3.5-75 µs HBM floors — and the production einsum
sequence costs the same ~107-115 µs isolated at tiny shapes. Inside the
real decode loop the einsum path's MARGINAL cost is only ~45 µs/layer
(tools/bench_decode2.py: XLA overlaps it with the rest of the step), which
an opaque pallas_call would forfeit. Only the d=1280 shape shows a win
(1.3×) and it would not survive the lost overlap. The per-token decode is
at its practical floor short of a whole-step mega-kernel.
"""

from __future__ import annotations

import functools
import json
import time

import numpy as np

import freud_tpu  # noqa: F401
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def head_selectors(d: int, heads: int):
    """(d, heads) one-hot head membership and its transpose."""
    dh = d // heads
    sel = np.zeros((d, heads), np.float32)
    for h in range(heads):
        sel[h * dh:(h + 1) * dh, h] = 1.0
    return jnp.asarray(sel), jnp.asarray(sel.T)


def _sq_attn_kernel(q_ref, k_ref, v_ref, sel_ref, selt_ref, o_ref):
    # One batch element per program: q (1, 1, d), K/V (1, s, d), sel (d, h).
    # K and V are each touched by exactly ONE matmul — no (s, d) temporaries:
    #   scores(s,h) = K @ (q ⊙ Sel)         (the query folded into the
    #                                        selector: qsel[j,h] = q[j]·Sel[j,h])
    #   u(h,d)      = wᵀ @ V                (softmax weights contracted
    #                                        against V along s)
    #   out(d)      = Σ_h (SelT ⊙ u)[h,:]   (scatter heads back to columns)
    k = k_ref[0]                                # (s, d) compute dtype
    # sel is one-hot, so qsel = q ⊙ Sel keeps q's exact bf16 values and the
    # bf16-multiply/f32-accumulate MXU path matches the einsum numerics.
    # The (1,d)→(d,1) relayout must happen in f32 (Mosaic can't insert a
    # minor dim on 16-bit types); the cast back is exact (one-hot mask).
    qcol = q_ref[0].astype(jnp.float32).reshape(-1, 1)     # (d, 1)
    qsel = (sel_ref[...].astype(jnp.float32) * qcol).astype(k.dtype)
    scores = jnp.dot(k, qsel,
                     preferred_element_type=jnp.float32)   # (s, h)
    m = jnp.max(scores, axis=0, keepdims=True)
    e = jnp.exp(scores - m)
    z = jnp.sum(e, axis=0, keepdims=True)
    w = (e / z).astype(k.dtype)                 # (s, h), einsum-path dtype
    u = jax.lax.dot_general(
        w, v_ref[0],
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)     # (h, d)
    out = jnp.sum(selt_ref[...].astype(jnp.float32) * u, axis=0,
                  keepdims=True)
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("heads", "interpret"))
def sq_attention_kernel(q, k, v, heads: int, interpret: bool = False):
    """q (b, d) pre-scaled by dh**-0.5; k/v (b, s, d) → (b, d)."""
    b, s, d = k.shape
    sel, selt = head_selectors(d, heads)
    sel = sel.astype(q.dtype)
    selt = selt.astype(q.dtype)
    out = pl.pallas_call(
        _sq_attn_kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 1, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, s, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, s, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((d, heads), lambda i: (0, 0)),
            pl.BlockSpec((heads, d), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, d), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, 1, d), q.dtype),
        interpret=interpret,
    )(q[:, None, :], k, v, sel, selt)
    return out[:, 0, :]


def _sq_attn_kernel_onep(q_ref, k_ref, v_ref, sel_ref, selt_ref, o_ref):
    # whole batch in ONE program: fori over batch amortizes program launch
    b = q_ref.shape[0]
    sel32 = sel_ref[...].astype(jnp.float32)
    selt32 = selt_ref[...].astype(jnp.float32)

    def body(i, _):
        k = k_ref[i]
        qcol = q_ref[i].astype(jnp.float32).reshape(-1, 1)
        qsel = (sel32 * qcol).astype(k.dtype)
        scores = jnp.dot(k, qsel, preferred_element_type=jnp.float32)
        m = jnp.max(scores, axis=0, keepdims=True)
        e = jnp.exp(scores - m)
        z = jnp.sum(e, axis=0, keepdims=True)
        w = (e / z).astype(k.dtype)
        u = jax.lax.dot_general(
            w, v_ref[i], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[i] = jnp.sum(selt32 * u, axis=0,
                           keepdims=True).astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, b, body, 0)


@functools.partial(jax.jit, static_argnames=("heads", "interpret"))
def sq_attention_kernel_onep(q, k, v, heads: int, interpret: bool = False):
    b, s, d = k.shape
    sel, selt = head_selectors(d, heads)
    sel = sel.astype(q.dtype)
    selt = selt.astype(q.dtype)
    out = pl.pallas_call(
        _sq_attn_kernel_onep,
        out_shape=jax.ShapeDtypeStruct((b, 1, d), q.dtype),
        interpret=interpret,
    )(q[:, None, :], k, v, sel, selt)
    return out[:, 0, :]


@functools.partial(jax.jit, static_argnames=("heads",))
def sq_attention_einsum(q, k, v, heads: int):
    """The production _decode_step formulation (single query slice)."""
    b, s, d = k.shape
    dh = d // heads

    def split(t):
        *lead, dd = t.shape
        return jnp.moveaxis(t.reshape(*lead, heads, dd // heads), -2, -3)

    qh = split(q[:, None, :])             # (b, h, 1, dh) — already scaled
    kh = split(k)                         # (b, h, s, dh)
    vh = split(v)
    logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                        preferred_element_type=jnp.float32)
    w = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    attn = jnp.einsum("bhqk,bhkd->bhqd", w, vh)
    return jnp.moveaxis(attn, -3, -2).reshape(b, d)


def bench(fn, args, iters=3, warmup=1, inner=100):
    """Time ``inner`` applications INSIDE one jit (lax.scan) — per-call
    dispatch on the tunneled backend (~1 ms) would otherwise swamp
    sub-millisecond kernels. The op input depends on the carry so the loop
    body cannot be hoisted."""
    q, k, v, heads = args

    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(q, k, v, n):
        def body(c, _):
            out = fn(q + c[None, :].astype(q.dtype) * 1e-6, k, v, heads)
            return out[0].astype(jnp.float32), None
        c, _ = jax.lax.scan(body, jnp.zeros((q.shape[-1],), jnp.float32),
                            None, length=n)
        return jnp.sum(c)

    for _ in range(warmup):
        float(loop(q, k, v, n=inner))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = loop(q, k, v, n=inner)
    float(out)
    return (time.perf_counter() - t0) / (iters * inner)


def main():
    rng = np.random.default_rng(0)
    for b, s, d, heads, dtype in [
        (8, 1500, 384, 6, jnp.bfloat16),     # tiny cross-attn
        (8, 232, 384, 6, jnp.bfloat16),      # tiny self-attn ring (ctx)
        (8, 1500, 1280, 20, jnp.bfloat16),   # turbo cross-attn
        (8, 1500, 384, 6, jnp.float32),
    ]:
        q = jnp.asarray(rng.standard_normal((b, d)), dtype) * 0.1
        k = jnp.asarray(rng.standard_normal((b, s, d)), dtype) * 0.1
        v = jnp.asarray(rng.standard_normal((b, s, d)), dtype) * 0.1

        ek = sq_attention_kernel(q, k, v, heads)
        ee = sq_attention_einsum(q, k, v, heads)
        e1 = sq_attention_kernel_onep(q, k, v, heads)
        err = float(jnp.max(jnp.abs(ek.astype(jnp.float32)
                                    - ee.astype(jnp.float32))))
        err1 = float(jnp.max(jnp.abs(e1.astype(jnp.float32)
                                     - ee.astype(jnp.float32))))
        t_k = bench(sq_attention_kernel, (q, k, v, heads))
        t_1 = bench(sq_attention_kernel_onep, (q, k, v, heads))
        t_e = bench(sq_attention_einsum, (q, k, v, heads))
        hbm_floor_us = (2 * b * s * d * jnp.dtype(dtype).itemsize) / 819e3
        print(json.dumps({
            "shape": [b, s, d, heads], "dtype": jnp.dtype(dtype).name,
            "kernel_us": round(t_k * 1e6, 1),
            "oneprog_us": round(t_1 * 1e6, 1),
            "einsum_us": round(t_e * 1e6, 1),
            "speedup": round(t_e / t_k, 2),
            "speedup_onep": round(t_e / t_1, 2),
            "max_abs_err_onep": err1,
            "hbm_floor_us": round(float(hbm_floor_us), 1),
            "max_abs_err": err,
        }))


if __name__ == "__main__":
    main()
