"""Pallas kernel: per-row k-th-largest thresholds by VMEM-resident bisection.

TopK-SAE training needs, per (batch·time) position, the k-th largest
pre-activation (main sparsity) and the k_aux-th largest among dead latents
(AuxK). ``lax.top_k`` costs O(k) full passes (≈ 340 ms/step at AuxK scale on
v5e); XLA-level bisection re-reads the (M, n_dict) tensor from HBM every
iteration (≈ 44 GB over 24 iterations). This kernel tiles rows into VMEM once
and runs both bisections on the resident block — one HBM pass total.

Thresholds select ≥ k entries (ties admit extras, measure-zero on real
activations); they are selection boundaries, not differentiable values —
callers wrap in stop_gradient.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 128
_ITERS = 26


def _bisect(masked: jnp.ndarray, k: int, iters: int = _ITERS) -> jnp.ndarray:
    """Largest t with count(masked ≥ t) ≥ k per row; +inf if nothing finite."""
    finite = jnp.isfinite(masked)
    lo = jnp.min(jnp.where(finite, masked, jnp.inf), axis=-1, keepdims=True)
    hi = jnp.max(masked, axis=-1, keepdims=True)

    def body(_, lohi):
        lo, hi = lohi
        mid = (lo + hi) * 0.5
        ok = jnp.sum((masked >= mid).astype(jnp.float32), axis=-1, keepdims=True) >= k
        return jnp.where(ok, mid, lo), jnp.where(ok, hi, mid)

    lo, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
    return lo


def _kernel(acts_ref, dead_ref, *out_refs,
            k_main: int, k_aux: int, k_multi: int, valid_rows: int,
            iters: int, signed: bool):
    if k_multi:
        tmain_ref, taux_ref, tmulti_ref, fired_ref = out_refs
    else:
        tmain_ref, taux_ref, fired_ref = out_refs
    i = pl.program_id(0)
    dead = dead_ref[...] > 0  # (1, n_dict)
    n_dict = acts_ref.shape[-1]
    int_path = (not signed and acts_ref.dtype == jnp.bfloat16
                and n_dict < 2 ** 15 and acts_ref.shape[0] % 2 == 0)
    if int_path:
        # bf16 input: the EXACT 15-iteration row-pair SWAR integer bisection
        # (ops/topk_fused) replaces 26 f32 counting passes — at large-recipe
        # scale (48000 × 20480 latents) the f32 bisection alone is tens of
        # ms of VPU time per selection. Requires non-negative values (the
        # post-ReLU trainer latents this op exists for): bf16 bit patterns
        # are order-isomorphic to their int16 bits only on [0, +inf).
        from .topk_fused import (_BF16_INF_BITS, _GUARD, _EXCL,
                                 _bits_to_f32, _int_bisect_packed,
                                 _pack_rows, _pack_rowvec)

        ab = acts_ref[...]
        bits16 = jax.lax.bitcast_convert_type(ab, jnp.int16)
        bits = bits16.astype(jnp.int32)
        wm = _pack_rows(bits16) | _GUARD
        minb = jnp.min(bits, axis=-1, keepdims=True)
        maxb1 = jnp.max(bits, axis=-1, keepdims=True) + 1
        tp = _int_bisect_packed(
            wm, k_main, _pack_rowvec(minb), _pack_rowvec(maxb1))
        t_main_bits = pltpu.bitcast(tp, jnp.int16).astype(jnp.int32)
        tmain_ref[...] = _bits_to_f32(t_main_bits)
        dp = jnp.where(dead, jnp.int32(-1), jnp.int32(0))
        wm_aux = (wm & dp) | (jnp.invert(dp) & _EXCL)
        tp_aux = _int_bisect_packed(
            wm_aux, k_aux,
            _pack_rowvec(jnp.min(jnp.where(dead, bits, _BF16_INF_BITS),
                                 axis=-1, keepdims=True)),
            _pack_rowvec(jnp.max(jnp.where(dead, bits, -1),
                                 axis=-1, keepdims=True) + 1),
        )
        taux_ref[...] = _bits_to_f32(
            pltpu.bitcast(tp_aux, jnp.int16).astype(jnp.int32))
        if k_multi:
            tp4 = _int_bisect_packed(
                wm, k_multi, _pack_rowvec(minb), _pack_rowvec(maxb1))
            tmulti_ref[...] = _bits_to_f32(
                pltpu.bitcast(tp4, jnp.int16).astype(jnp.int32))
        # fired entirely in the integer domain — the bit-pattern order
        # isomorphism means (bits ≥ t_bits) ⇔ (acts ≥ t), so the f32 copy of
        # the tile never materializes on this path
        row = (jax.lax.broadcasted_iota(jnp.int32, bits.shape, 0)
               + i * bits.shape[0])
        keep = (bits >= t_main_bits) & (bits > 0) & (row < valid_rows)
    else:
        a = acts_ref[...].astype(jnp.float32)  # (ROWS, n_dict)
        t_main = _bisect(a, k_main, iters)
        tmain_ref[...] = t_main
        masked = jnp.where(dead, a, -jnp.inf)
        taux_ref[...] = _bisect(masked, k_aux, iters)
        if k_multi:
            # third threshold (multi_topk's 4k) in the SAME resident pass —
            # a separate kernel invocation would re-read the whole
            # (M, n_dict) latent from HBM just for this
            tmulti_ref[...] = _bisect(a, k_multi, iters)
        row = jax.lax.broadcasted_iota(jnp.int32, a.shape, 0) + i * a.shape[0]
        keep = (a >= t_main) & (a > 0) & (row < valid_rows)

    # fired[j] = did latent j cross its row threshold anywhere — the acts
    # tile is already VMEM-resident, so folding this in here saves the
    # trainer a full extra HBM pass over (M, n_dict). Padded rows (all-zero,
    # threshold 0) must not count; neither may zero activations — a row with
    # fewer than k positives converges to threshold 0, and post-ReLU every
    # latent satisfies acts >= 0, so one silent frame would otherwise mark
    # the ENTIRE dictionary as fired and permanently disable AuxK revival.
    tile_fired = jnp.max(keep.astype(jnp.float32), axis=0, keepdims=True)

    @pl.when(i == 0)
    def _init():
        fired_ref[...] = tile_fired

    @pl.when(i > 0)
    def _accum():
        fired_ref[...] = jnp.maximum(fired_ref[...], tile_fired)


@functools.partial(
    jax.jit,
    static_argnames=("k_main", "k_aux", "interpret", "rows", "iters",
                     "k_multi", "signed"),
)
def topk_thresholds_fired(
    acts: jnp.ndarray,  # (M, n_dict) — any float dtype (cast to f32 in VMEM)
    dead_mask: jnp.ndarray,  # (n_dict,) bool
    k_main: int,
    k_aux: int,
    interpret: bool = False,
    rows: int = ROWS,
    iters: int = _ITERS,
    k_multi: int = 0,
    signed: bool = False,
):
    """→ (t_main (M, 1) f32, t_aux (M, 1) f32, t_multi (M, 1) f32 | None,
    fired (n_dict,) bool). ``k_multi`` (multi_topk's 4k) adds a third
    bisection to the SAME resident pass; with the default 0, t_multi is
    None and no third output buffer is even allocated.

    bfloat16 inputs with n_dict < 2¹⁵ take the EXACT integer-bisection fast
    path (15 SWAR iterations instead of ``iters`` f32 counting passes; the
    returned thresholds are then exact bf16 k-th values). That path assumes
    NON-NEGATIVE inputs — the post-ReLU SAE latents this op serves (negative
    bf16 bit patterns are not order-isomorphic to their int16 bits); callers
    with signed bf16 data MUST pass ``signed=True`` to keep the f32
    counting path.

    Carries the same GSPMD row-partitioning rule as ops/topk_fused (one
    kernel per chip on a data-sharded batch; the fired mask pmax-es across
    the row-sharding axes inside the partition's lower_fn)."""
    outs = _partitioned_thresholds(
        k_main, k_aux, k_multi, rows, iters, interpret, signed
    )(acts, dead_mask.astype(jnp.float32))
    if k_multi:
        tm, ta, tmu, fired_f = outs
        return tm[:, None], ta[:, None], tmu[:, None], fired_f > 0
    tm, ta, fired_f = outs
    return tm[:, None], ta[:, None], None, fired_f > 0


@functools.lru_cache(maxsize=None)
def _partitioned_thresholds(k_main: int, k_aux: int, k_multi: int, rows: int,
                            iters: int, interpret: bool, signed: bool = False):
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    def body(acts, dead_f):
        return _thresholds_impl(acts, dead_f, k_main=k_main, k_aux=k_aux,
                                k_multi=k_multi, rows=rows, iters=iters,
                                interpret=interpret, signed=signed)

    cp = custom_partitioning(body)

    def partition(mesh, arg_infos, result_infos):
        spec = arg_infos[0].sharding.spec if arg_infos[0].sharding else P()
        m = spec[0] if len(spec) > 0 else None
        axes = (m,) if isinstance(m, str) else tuple(m or ())

        def lower_fn(*args):
            *ts, fired = body(*args)
            for ax in axes:
                fired = jax.lax.pmax(fired, ax)
            return (*ts, fired)

        row1 = NamedSharding(mesh, P(m))
        row2 = NamedSharding(mesh, P(m, None))
        rep = NamedSharding(mesh, P())
        n_t = 3 if k_multi else 2
        return mesh, lower_fn, (*([row1] * n_t), rep), (row2, rep)

    cp.def_partition(
        partition=partition,
        sharding_rule=("m j, j -> m, m, m, j" if k_multi
                       else "m j, j -> m, m, j"),
        need_replication_factors=("j",),
    )
    return jax.custom_batching.sequential_vmap(lambda *a: cp(*a))


def _thresholds_impl(acts, dead_f, *, k_main, k_aux, k_multi, rows, iters,
                     interpret, signed):
    """Per-shard pallas_call → (t_main (m,), t_aux (m,), [t_multi (m,)
    when k_multi], fired (n_dict,) f32)."""
    m, n_dict = acts.shape
    m_pad = -(-m // rows) * rows
    if m_pad != m:
        acts = jnp.pad(acts, ((0, m_pad - m), (0, 0)))
    dead = dead_f.reshape(1, -1)

    n_t = 3 if k_multi else 2  # threshold outputs; no dead buffer for k_multi=0
    row_spec = pl.BlockSpec((rows, 1), lambda t: (t, 0),
                            memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_kernel, k_main=k_main, k_aux=k_aux,
                          k_multi=k_multi, valid_rows=m, iters=iters,
                          signed=signed),
        grid=(m_pad // rows,),
        in_specs=[
            pl.BlockSpec((rows, n_dict), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_dict), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[row_spec] * n_t + [
            pl.BlockSpec((1, n_dict), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((m_pad, 1), jnp.float32)] * n_t + [
            jax.ShapeDtypeStruct((1, n_dict), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            # the f32 tile (rows × n_dict) plus its double buffer exceed the
            # 16 MB default scoped window at large-recipe widths (n_dict
            # 20480: 30 MB requested — the large_v1 VMEM OOM)
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(acts, dead)
    *ts, fired = outs
    return (*(t[:m, 0] for t in ts), fired[0])


def topk_thresholds(acts, dead_mask, k_main, k_aux, interpret: bool = False,
                    signed: bool = False):
    """→ (t_main (M, 1), t_aux (M, 1)), f32. (fired-less compatibility wrapper)"""
    t_main, t_aux, _, _ = topk_thresholds_fired(
        acts, dead_mask, k_main, k_aux, interpret=interpret, signed=signed
    )
    return t_main, t_aux
