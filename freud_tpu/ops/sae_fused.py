"""Fused L1-SAE train-step kernel: losses AND parameter gradients in ONE pass.

The XLA train step for the tiny_l1 recipe moves ~1.5 GB of intermediates
(latent, reconstruction, residuals, saved activations) through HBM per step —
memory-bound at ~3 ms. This kernel streams each (N, d) tile of the batch
through VMEM exactly once and produces everything the optimizer needs:

  recon_sum = Σ (x̂ − x)²              l1_sum = Σ c
  dW  = xᵀ·dpre + s·eᵀ·c  (both SAE uses of the tied weight)
  db  = Σ dpre
  with  c = relu(x·W + b),  x̂ = c·Wᵀ,  e = x̂ − x,
        dpre = (s·(e·W) + μ)·[x·W + b > 0],
        s = 2·recon_alpha/(M·d) (mse cotangent), μ = 1/M (L1 cotangent)

Accumulators live in the output blocks (constant index_map → revisited across
the sequential TPU grid). Matmuls run in bf16 with f32 accumulation — the
same autocast-style numerics as the XLA path. The caller backpropagates
through the column normalization analytically (a cheap (d, n_dict)
elementwise projection) and applies the optimizer as usual.

Semantics note: the fused path treats every element as valid (the reference's
``ignored_index=-1`` masked MSE is a no-op on real activation data); the XLA
path remains the fallback wherever that masking, multi-device batches, or
non-L1 variants are in play.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.sae.l1 import L1Params

TILE = 1024  # frames per grid step


def _kernel(x_ref, w_ref, b_ref, recon_ref, l1_ref, dw_ref, db_ref,
            *, m_total: int, d: int, n_dict: int, recon_alpha: float):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        recon_ref[...] = jnp.zeros_like(recon_ref)
        l1_ref[...] = jnp.zeros_like(l1_ref)
        dw_ref[...] = jnp.zeros_like(dw_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    remaining = m_total - t * TILE
    row = jax.lax.broadcasted_iota(jnp.int32, (TILE, 1), 0)
    valid = (row < remaining).astype(jnp.float32)  # (TILE, 1)

    x = x_ref[...] * valid  # (TILE, d) f32; padded rows zeroed
    xb = x.astype(jnp.bfloat16)
    wb = w_ref[...].astype(jnp.bfloat16)  # (d, n_dict)

    cpre = (
        jnp.dot(xb, wb, preferred_element_type=jnp.float32)
        + b_ref[...]
    )  # (TILE, n_dict) f32
    mask = (cpre > 0).astype(jnp.float32) * valid
    c = jnp.maximum(cpre, 0.0) * valid
    cb = c.astype(jnp.bfloat16)

    xhat = jax.lax.dot_general(
        cb, wb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (TILE, d) = c @ Wᵀ
    e = (xhat - x) * valid

    recon_ref[...] += jnp.sum(e * e).reshape(1, 1)
    l1_ref[...] += jnp.sum(c).reshape(1, 1)

    s = 2.0 * recon_alpha / (m_total * d)
    mu = 1.0 / m_total
    eb = e.astype(jnp.bfloat16)
    dc = jnp.dot(eb, wb, preferred_element_type=jnp.float32) * s  # (TILE, n_dict)
    dpre = (dc + mu) * mask
    dpre_b = dpre.astype(jnp.bfloat16)

    # dW = xᵀ·dpre  +  s·eᵀ·c   (contract the frame axis of both operands)
    dw_ref[...] += jax.lax.dot_general(
        xb, dpre_b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dw_ref[...] += s * jax.lax.dot_general(
        eb, cb, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    db_ref[...] += jnp.sum(dpre, axis=0, keepdims=True)


@functools.partial(
    jax.jit, static_argnames=("recon_alpha", "interpret")
)
def fused_l1_grads(
    W_normalized: jnp.ndarray,  # (d, n_dict), unit-norm columns
    encoder_bias: jnp.ndarray,  # (n_dict,)
    x: jnp.ndarray,  # (..., d) activations
    recon_alpha: float,
    interpret: bool = False,
):
    """→ (loss_recon, loss_l1, dW, db) of the L1 SAE objective.

    loss_recon = recon_alpha · mean((x̂−x)²), loss_l1 = mean-per-frame Σ|c|;
    dW/db are the gradients w.r.t. the *normalized* weight and the bias.
    """
    d = x.shape[-1]
    n_dict = W_normalized.shape[1]
    xm = x.reshape(-1, d)
    m_total = xm.shape[0]
    n_tiles = pl.cdiv(m_total, TILE)
    pad = n_tiles * TILE - m_total
    if pad:
        xm = jnp.pad(xm, ((0, pad), (0, 0)))

    kernel = functools.partial(
        _kernel, m_total=m_total, d=d, n_dict=n_dict,
        recon_alpha=float(recon_alpha),
    )
    recon_sum, l1_sum, dW, db = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((TILE, d), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, n_dict), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_dict), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, n_dict), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_dict), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((d, n_dict), jnp.float32),
            jax.ShapeDtypeStruct((1, n_dict), jnp.float32),
        ],
        interpret=interpret,
    )(xm, W_normalized, encoder_bias.reshape(1, -1))

    loss_recon = recon_alpha * recon_sum[0, 0] / (m_total * d)
    loss_l1 = l1_sum[0, 0] / m_total
    return loss_recon, loss_l1, dW, db[0]


def fused_l1_value_and_grad(
    params: L1Params, x: jnp.ndarray, recon_alpha: float, interpret: bool = False
):
    """Drop-in for value_and_grad of the XLA L1 train step: one batch pass.

    Matches the unfused step's dynamics exactly: parameters are projected to
    unit-norm columns *before* differentiation (the reference mutates the
    stored weight that way each encode), so the optimizer consumes the plain
    gradient evaluated at the normalized point — no normalization VJP.
    """
    norm = jnp.sqrt(jnp.sum(params.W * params.W, axis=0, keepdims=True))
    Wn = params.W / jnp.maximum(norm, 1e-12)
    loss_recon, loss_l1, dWn, db = fused_l1_grads(
        Wn, params.encoder_bias, x, recon_alpha, interpret=interpret
    )
    loss = loss_recon + loss_l1
    return (loss, (loss_recon, loss_l1)), L1Params(W=dWn, encoder_bias=db)
