"""L1-regularized tied-weight sparse autoencoder (functional JAX).

Behavioral spec (reference src/models/l1autoencoder.py:15-95): a single
decoder matrix W of shape (activation_size, n_dict) whose transpose is the
encoder; an encoder bias; decoder columns renormalized to unit norm at the
start of every encode (the reference mutates ``weight.data`` in-place each
call — here normalization is an explicit pure projection applied to the
parameters before each use, which yields the same training dynamics: the
forward/backward runs on the normalized weight and updates apply to it);
loss = recon_alpha · masked-MSE(x̂, x; ignore −1) + mean per-frame L1 of the
latent. Parameter names in checkpoints serialize to the reference's torch
state-dict keys (``decoder.weight``, ``encoder_bias``) via sae/serialize.py.

TPU notes: both encode and decode are single (b·s, d)×(d, n_dict) matmuls —
MXU-shaped; normalization is a cheap fused rsqrt-scale over columns.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import L1AutoEncoderConfig, get_n_dict_components


class L1EncoderOutput(NamedTuple):
    latent: jnp.ndarray


class L1ForwardOutput(NamedTuple):
    sae_out: jnp.ndarray
    encoded: L1EncoderOutput
    l1_loss: jnp.ndarray
    reconstruction_loss: jnp.ndarray


class L1Params(NamedTuple):
    # W: (activation_size, n_dict) — the torch ``decoder.weight`` layout.
    W: jnp.ndarray
    encoder_bias: jnp.ndarray


def init_l1(activation_size: int, cfg: L1AutoEncoderConfig, seed: int = 0) -> L1Params:
    n_dict = get_n_dict_components(
        activation_size, cfg.expansion_factor, cfg.n_dict_components
    )
    # Orthogonal init of the (activation_size, n_dict) matrix, as in the
    # reference's nn.init.orthogonal_ on decoder.weight.
    key = jax.random.PRNGKey(seed)
    a = jax.random.normal(key, (max(activation_size, n_dict), min(activation_size, n_dict)))
    q, _ = jnp.linalg.qr(a)
    W = q[:activation_size, :n_dict] if activation_size >= n_dict else q[:n_dict, :activation_size].T
    return L1Params(
        W=W.astype(jnp.float32),
        encoder_bias=jnp.zeros((n_dict,), jnp.float32),
    )


def normalize_columns(params: L1Params) -> L1Params:
    """Unit-norm decoder columns (dim 0), the per-encode projection."""
    norm = jnp.sqrt(jnp.sum(params.W * params.W, axis=0, keepdims=True))
    return params._replace(W=params.W / jnp.maximum(norm, 1e-12))


def encode(
    params: L1Params, x: jnp.ndarray, *, pre_normalized: bool = False,
    matmul_dtype=None,
) -> L1EncoderOutput:
    """ReLU(x @ W + b) on unit-norm columns → latent (…, n_dict).

    ``matmul_dtype=jnp.bfloat16`` runs the matmul in reduced precision (the
    analogue of the reference trainer's CUDA autocast, train_sae.py:431).
    """
    if not pre_normalized:
        params = normalize_columns(params)
    W, b = params.W, params.encoder_bias
    if matmul_dtype is not None:
        x, W = x.astype(matmul_dtype), W.astype(matmul_dtype)
    c = jax.nn.relu(x @ W + b.astype(x.dtype))
    return L1EncoderOutput(latent=c)


def decode(params: L1Params, latent: jnp.ndarray, matmul_dtype=None) -> jnp.ndarray:
    W = params.W
    if matmul_dtype is not None:
        W, latent = W.astype(matmul_dtype), latent.astype(matmul_dtype)
    return latent @ W.T


def masked_mse(pred: jnp.ndarray, target: jnp.ndarray, ignored_value: float = -1.0):
    """MSE over elements where target != ignored_value (reference mse_loss)."""
    mask = target != ignored_value
    se = jnp.where(mask, (pred - target) ** 2, 0.0)
    return jnp.sum(se) / jnp.maximum(jnp.sum(mask), 1)


def forward(
    params: L1Params, x: jnp.ndarray, cfg: L1AutoEncoderConfig,
    *, pre_normalized: bool = False, matmul_dtype=None,
) -> L1ForwardOutput:
    if not pre_normalized:
        params = normalize_columns(params)
    c = encode(params, x, pre_normalized=True, matmul_dtype=matmul_dtype).latent
    x_hat = decode(params, c, matmul_dtype=matmul_dtype).astype(x.dtype)
    # losses in f32 (autocast-style: matmuls reduced, reductions full)
    c32 = c.astype(jnp.float32)
    l1 = jnp.mean(jnp.sum(jnp.abs(c32), axis=-1))
    recon = cfg.recon_alpha * masked_mse(x_hat, x)
    return L1ForwardOutput(
        sae_out=x_hat, encoded=L1EncoderOutput(c), l1_loss=l1,
        reconstruction_loss=recon,
    )


def param_count(params: L1Params) -> int:
    return int(sum(np.prod(p.shape) for p in params))
