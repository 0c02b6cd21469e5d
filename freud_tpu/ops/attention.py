"""Whisper-geometry attention kernel: K/V-resident blocked attention.

The XLA einsum path materializes the (seq × seq) score matrix per (batch,
head) in HBM — at whisper geometry (seq 1500) that is ~40 GB of HBM traffic
per 64-file encoder batch, which is exactly what bounds collection
throughput. The stock Pallas flash kernel is mis-sized here (its 128-lane
tiles pad head_dim 64 → 128, doubling the matmul work and measuring 2×
slower than einsum).

This kernel exploits what makes Whisper small: the entire K and V for one
(batch, head) — (1536 × 64) each — fit comfortably in VMEM. So each grid
step loads one query block plus the full K/V, computes scores, masks the
padded tail, softmaxes in f32 and applies V — per-step working set ~4 MB, no
online-softmax accumulation, no score matrix ever touching HBM. head_dim 64
stays native (block last-dim equals the full array dim, which Mosaic allows).

At this geometry the wall is the VPU (softmax), not the MXU — measured on
v5e, the matmul dtype does not move the kernel's time at all (9.43 vs
9.44 ms/batch-64 for f32 vs bf16 operands) — so the kernel minimizes
full-score-matrix VPU passes:
  * the dh^-½ scale is applied to the (block_q, 64) query tile, not the
    (block_q, 1536) scores;
  * the padded-tail mask is one precomputed additive (1, S_pad) bias row,
    not an iota/compare/select over the scores;
  * softmax normalization divides the (block_q, 64) output once, not the
    (block_q, S_pad) weights.

Numerics: softmax statistics always in f32. The two matmuls run in
``matmul_dtype`` (default bfloat16 on TPU — the MXU's native rate, and the
same truncation XLA's DEFAULT precision applies to f32 einsum operands on
TPU — f32 elsewhere) with f32 accumulation via ``preferred_element_type``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_Q = 512
_NEG = -0.7 * float(jnp.finfo(jnp.float32).max)  # avoids exp(-inf−(-inf)) NaN


def _kernel(q_ref, k_ref, v_ref, out_ref, *, scale: float, valid_len: int,
            matmul_dtype, stable: bool):
    q = (q_ref[0].astype(jnp.float32) * scale).astype(matmul_dtype)
    k = k_ref[0].astype(matmul_dtype)  # (S_pad, dh)
    v = v_ref[0].astype(matmul_dtype)

    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (BLOCK_Q, S_pad) f32
    s_pad = scores.shape[-1]
    if valid_len < s_pad:
        col = jax.lax.broadcasted_iota(jnp.int32, (1, s_pad), 1)
        scores = scores + jnp.where(col < valid_len, 0.0, _NEG)
    if stable:
        scores = scores - jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores)
    l = jnp.sum(p, axis=-1, keepdims=True)  # (BLOCK_Q, 1)
    out = jax.lax.dot(p.astype(matmul_dtype), v, preferred_element_type=jnp.float32)
    out_ref[0] = (out * (1.0 / l)).astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("interpret", "matmul_dtype", "block_q", "stable")
)
def whisper_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, interpret: bool = False,
    matmul_dtype=None, block_q: int = BLOCK_Q, stable: bool = True,
) -> jnp.ndarray:
    """(b, h, s, dh) q/k/v → (b, h, s, dh), softmax((q·kᵀ)·dh^-½)·v.

    ``matmul_dtype`` defaults to bfloat16 on TPU (f32 accumulate — matches
    XLA's DEFAULT matmul precision for f32 einsum operands there) and to the
    input dtype elsewhere, so CPU-run tests stay exact-f32. ``stable=False``
    drops the softmax max-subtraction (valid when |scores| is known bounded).

    Carries a GSPMD sharding rule: batch/head dims partition freely, so a
    pjit over a data-sharded batch runs one kernel per chip instead of
    all-gathering around the custom call (tests/test_attention_kernel.py
    pins the no-gather property on the 8-device CPU mesh).
    """
    if matmul_dtype is None:
        matmul_dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else q.dtype
    return _partitioned(jnp.dtype(matmul_dtype).name, block_q, stable, interpret)(
        q, k, v
    )


@functools.lru_cache(maxsize=None)
def _partitioned(matmul_dtype_name: str, block_q: int, stable: bool,
                 interpret: bool):
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    def body(q, k, v):
        return _whisper_attention_impl(
            q, k, v, interpret=interpret,
            matmul_dtype=jnp.dtype(matmul_dtype_name), block_q=block_q,
            stable=stable,
        )

    cp = custom_partitioning(body)

    def partition(mesh, arg_infos, result_infos):
        spec = arg_infos[0].sharding.spec if arg_infos[0].sharding else P()
        b = spec[0] if len(spec) > 0 else None
        h = spec[1] if len(spec) > 1 else None
        ns = NamedSharding(mesh, P(b, h, None, None))
        return mesh, body, ns, (ns, ns, ns)

    cp.def_partition(
        partition=partition,
        sharding_rule="b h s d, b h t d, b h t d -> b h s d",
        need_replication_factors=("s", "d", "t"),
    )
    # custom_partitioning lacks a batching rule; make vmap lower to a scan
    return jax.custom_batching.sequential_vmap(lambda *a: cp(*a))


def _whisper_attention_impl(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, interpret: bool,
    matmul_dtype, block_q: int, stable: bool,
) -> jnp.ndarray:
    b, h, s, dh = q.shape
    scale = dh ** -0.5
    s_pad = -(-s // block_q) * block_q

    def pad(t):
        t = t.reshape(b * h, s, dh)
        if matmul_dtype == jnp.bfloat16 and t.dtype == jnp.float32:
            # cast at the XLA level: fuses into the producing matmul's
            # epilogue and halves the kernel's HBM traffic
            t = t.astype(jnp.bfloat16)
        return jnp.pad(t, ((0, 0), (0, s_pad - s), (0, 0)))

    qp, kp, vp = pad(q), pad(k), pad(v)
    n_qblocks = s_pad // block_q

    out = pl.pallas_call(
        functools.partial(
            _kernel, scale=scale, valid_len=s, matmul_dtype=matmul_dtype,
            stable=stable,
        ),
        grid=(b * h, n_qblocks),
        in_specs=[
            pl.BlockSpec(
                (1, block_q, dh), lambda bh, t: (bh, t, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, s_pad, dh), lambda bh, t: (bh, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, s_pad, dh), lambda bh, t: (bh, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, dh), lambda bh, t: (bh, t, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, s_pad, dh), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qp, kp, vp)
    return out.reshape(b, h, s_pad, dh)[:, :, :s, :]


# --------------------------------------------------------- fused qkv + attn

def _qkv_attn_kernel(x_ref, wq_ref, wk_ref, wv_ref, bq_ref, bv_ref, out_ref,
                     *, heads: int, scale: float, valid_len: int):
    s_pad = x_ref.shape[1]
    d = x_ref.shape[2]
    dh = d // heads
    x = x_ref[0]  # (s_pad, d) bf16
    q = jnp.dot(x, wq_ref[...], preferred_element_type=jnp.float32)
    q = ((q + bq_ref[...]) * scale).astype(jnp.bfloat16)
    k = jnp.dot(x, wk_ref[...], preferred_element_type=jnp.float32
                ).astype(jnp.bfloat16)  # whisper k-projection has no bias
    v = (jnp.dot(x, wv_ref[...], preferred_element_type=jnp.float32)
         + bv_ref[...]).astype(jnp.bfloat16)

    col = jax.lax.broadcasted_iota(jnp.int32, (1, s_pad), 1)
    bias = jnp.where(col < valid_len, 0.0, _NEG)

    outs = []
    for h in range(heads):
        qh = q[:, h * dh:(h + 1) * dh]
        kh = k[:, h * dh:(h + 1) * dh]
        vh = v[:, h * dh:(h + 1) * dh]
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) + bias
        s = s - jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot(p.astype(jnp.bfloat16), vh,
                        preferred_element_type=jnp.float32)
        outs.append(o * (1.0 / l))
    out_ref[0] = jnp.concatenate(outs, axis=-1).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("heads", "interpret"))
def fused_qkv_attention(
    x: jnp.ndarray,     # (b, s, d) — post-LN block input
    wq: jnp.ndarray, bq: jnp.ndarray,
    wk: jnp.ndarray,
    wv: jnp.ndarray, bv: jnp.ndarray,
    heads: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Whisper encoder self-attention with the q/k/v projections fused in:
    one kernel step per file — q/k/v never round-trip HBM, and the per-step
    work is large enough that DMA issue latency amortizes (measured 8.1 →
    5.5 ms/batch-64 vs XLA projections + the blocked attention kernel).
    The caller applies the output projection (a plain matmul XLA handles at
    peak). Matmuls in bf16 with f32 stats — the same precision contract as
    ``whisper_attention``. Returns (b, s, d) in x's dtype.

    Sharding: batch partitions freely (custom_partitioning rule), so pjit
    collection over a data-sharded batch runs one kernel per chip."""
    return _partitioned_qkv(heads, interpret)(x, wq, bq, wk, wv, bv)


@functools.lru_cache(maxsize=None)
def _partitioned_qkv(heads: int, interpret: bool):
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    def body(x, wq, bq, wk, wv, bv):
        return _fused_qkv_attention_impl(x, wq, bq, wk, wv, bv, heads,
                                         interpret)

    cp = custom_partitioning(body)

    def partition(mesh, arg_infos, result_infos):
        spec = arg_infos[0].sharding.spec if arg_infos[0].sharding else P()
        b = spec[0] if len(spec) > 0 else None
        out = NamedSharding(mesh, P(b, None, None))
        rep = NamedSharding(mesh, P())
        return mesh, body, out, (out, rep, rep, rep, rep, rep)

    cp.def_partition(
        partition=partition,
        sharding_rule="b s d, p q, r, t u, v w, y -> b s d",
        need_replication_factors=("s", "d", "p", "q", "r", "t", "u", "v",
                                  "w", "y"),
    )
    # custom_partitioning lacks a batching rule; make vmap lower to a scan
    return jax.custom_batching.sequential_vmap(lambda *a: cp(*a))


def _fused_qkv_attention_impl(x, wq, bq, wk, wv, bv, heads, interpret):
    b, s, d = x.shape
    dh = d // heads
    s_pad = -(-s // 8) * 8
    xp = jnp.pad(x, ((0, 0), (0, s_pad - s), (0, 0))).astype(jnp.bfloat16)

    out = pl.pallas_call(
        functools.partial(
            _qkv_attn_kernel, heads=heads, scale=dh ** -0.5, valid_len=s
        ),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, s_pad, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, s_pad, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s_pad, d), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        xp, wq.astype(jnp.bfloat16), wk.astype(jnp.bfloat16),
        wv.astype(jnp.bfloat16),
        bq.astype(jnp.float32).reshape(1, -1),
        bv.astype(jnp.float32).reshape(1, -1),
    )
    return out[:, :s, :]
