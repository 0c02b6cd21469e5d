"""TopK sparse autoencoder with AuxK and multi-TopK losses (functional JAX).

Behavioral spec (reference src/models/topkautoencoder.py:15-175, untied SAE in
the EleutherAI style): encoder Linear(d_in → n_dict) with zeroed bias; W_dec
initialized as the encoder weight (rows unit-normalized when
``normalize_decoder``); b_dec subtracted before encoding; ReLU pre-activations
→ top-k; losses normalized by total variance Σ(x − mean₀(x))²:

  fvu            = Σ(x̂ − x)² / tv
  auxk_loss      = min(num_dead/k_aux, 1) · Σ(ê − e)² / tv  (k_aux = d_in/2,
                   top dead-latent decode of the residual e), × auxk_alpha
  multi_topk_fvu = FVU of a 4k-sparse decode

TPU adaptations (semantics preserved, shapes static for jit):
* decode is a gather of k rows of W_dec + weighted sum (k·d_in FLOPs/frame)
  instead of the reference's dense scatter-then-matmul (n_dict·d_in).
* AuxK always takes a static ``k_aux = d_in // 2`` slots; when fewer latents
  are dead the −inf-masked entries get activation 0 and contribute nothing,
  matching the reference's dynamic ``min(k_aux, num_dead)`` exactly
  (dead count enters the loss only through the same ``scale`` factor).
* ``num_frames_since_fired`` dead-feature tracking is a carried array
  updated with a scatter, not a Python-side counter.

Divergence (documented): under ``multi_topk`` the reference returns the
4k-sparse ``sae_out``/``encoded`` in its output tuple (an apparent accident —
all shipped configs set multi_topk=false); we always return the k-sparse pair.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import TopKAutoEncoderConfig, get_n_dict_components


class TopKEncoderOutput(NamedTuple):
    top_acts: jnp.ndarray  # (…, k)
    top_indices: jnp.ndarray  # (…, k) int32


class TopKForwardOutput(NamedTuple):
    sae_out: jnp.ndarray
    encoded: TopKEncoderOutput
    fvu: jnp.ndarray
    auxk_loss: jnp.ndarray
    multi_topk_fvu: jnp.ndarray


class TopKParams(NamedTuple):
    encoder_weight: jnp.ndarray  # (n_dict, d_in) — torch Linear layout
    encoder_bias: jnp.ndarray  # (n_dict,)
    W_dec: jnp.ndarray  # (n_dict, d_in)
    b_dec: jnp.ndarray  # (d_in,)


def init_topk(activation_size: int, cfg: TopKAutoEncoderConfig, seed: int = 0) -> TopKParams:
    n_dict = get_n_dict_components(
        activation_size, cfg.expansion_factor, cfg.n_dict_components
    )
    key = jax.random.PRNGKey(seed)
    bound = 1.0 / np.sqrt(activation_size)
    enc_w = jax.random.uniform(
        key, (n_dict, activation_size), jnp.float32, -bound, bound
    )
    W_dec = enc_w
    if cfg.normalize_decoder:
        W_dec = set_decoder_norm_to_unit_norm(W_dec)
    return TopKParams(
        encoder_weight=enc_w,
        encoder_bias=jnp.zeros((n_dict,), jnp.float32),
        W_dec=W_dec,
        b_dec=jnp.zeros((activation_size,), jnp.float32),
    )


def set_decoder_norm_to_unit_norm(W_dec: jnp.ndarray) -> jnp.ndarray:
    """Row-normalize W_dec (per dictionary component)."""
    norm = jnp.sqrt(jnp.sum(W_dec * W_dec, axis=1, keepdims=True))
    return W_dec / (norm + jnp.finfo(W_dec.dtype).eps)


def remove_gradient_parallel_to_decoder_directions(
    W_dec: jnp.ndarray, W_dec_grad: jnp.ndarray
) -> jnp.ndarray:
    """Project out the gradient component parallel to each decoder row."""
    parallel = jnp.sum(W_dec_grad * W_dec, axis=1, keepdims=True)
    return W_dec_grad - parallel * W_dec


def pre_acts(params: TopKParams, x: jnp.ndarray, matmul_dtype=None) -> jnp.ndarray:
    sae_in = x - params.b_dec
    W = params.encoder_weight
    if matmul_dtype is not None:
        sae_in, W = sae_in.astype(matmul_dtype), W.astype(matmul_dtype)
    return jax.nn.relu(sae_in @ W.T + params.encoder_bias.astype(sae_in.dtype))


def select_topk(latents: jnp.ndarray, k: int) -> TopKEncoderOutput:
    vals, idx = jax.lax.top_k(latents, k)
    return TopKEncoderOutput(top_acts=vals, top_indices=idx.astype(jnp.int32))


def encode(params: TopKParams, x: jnp.ndarray, cfg: TopKAutoEncoderConfig) -> TopKEncoderOutput:
    return select_topk(pre_acts(params, x), cfg.k)


def decode(params: TopKParams, top_acts: jnp.ndarray, top_indices: jnp.ndarray) -> jnp.ndarray:
    """Sparse decode: gather k dictionary rows and sum — MXU-free, bandwidth-lean."""
    rows = jnp.take(params.W_dec, top_indices, axis=0)  # (…, k, d_in)
    y = jnp.einsum("...k,...kd->...d", top_acts, rows)
    return y + params.b_dec


def dense_latent(top_acts: jnp.ndarray, top_indices: jnp.ndarray, n_dict: int) -> jnp.ndarray:
    """Scatter an indexed activation back to a dense (…, n_dict) tensor."""
    dense = jnp.zeros((*top_acts.shape[:-1], n_dict), top_acts.dtype)
    idx = top_indices
    return dense.at[
        tuple(
            jnp.broadcast_to(
                jnp.arange(s).reshape([-1 if i == d else 1 for i in range(idx.ndim)]),
                idx.shape,
            )
            for d, s in enumerate(idx.shape[:-1])
        )
        + (idx,)
    ].add(top_acts)


def forward(
    params: TopKParams,
    x: jnp.ndarray,
    cfg: TopKAutoEncoderConfig,
    dead_mask: Optional[jnp.ndarray] = None,
    matmul_dtype=None,
) -> TopKForwardOutput:
    acts = pre_acts(params, x, matmul_dtype=matmul_dtype)
    top = select_topk(acts, cfg.k)
    sae_out = decode(params, top.top_acts, top.top_indices).astype(x.dtype)
    e = sae_out - x

    tv = jnp.sum((x - jnp.mean(x, axis=0)) ** 2)
    tv = jnp.where(tv == 0, 1.0, tv)

    if dead_mask is not None:
        d_in = x.shape[-1]
        k_aux = d_in // 2
        num_dead = jnp.sum(dead_mask)
        scale = jnp.minimum(num_dead / k_aux, 1.0)
        auxk_latents = jnp.where(dead_mask, acts, -jnp.inf)
        auxk_acts, auxk_idx = jax.lax.top_k(auxk_latents, k_aux)
        auxk_acts = jnp.where(jnp.isfinite(auxk_acts), auxk_acts, 0.0)
        e_hat = decode(params, auxk_acts, auxk_idx.astype(jnp.int32))
        auxk_loss = scale * jnp.sum((e_hat - e) ** 2) / tv
    else:
        auxk_loss = jnp.asarray(0.0, x.dtype)

    fvu = jnp.sum(e * e) / tv

    if cfg.multi_topk:
        multi = select_topk(acts, 4 * cfg.k)
        multi_out = decode(params, multi.top_acts, multi.top_indices)
        multi_topk_fvu = jnp.sum((multi_out - x) ** 2) / tv
    else:
        multi_topk_fvu = jnp.asarray(0.0, x.dtype)

    return TopKForwardOutput(
        sae_out=sae_out,
        encoded=top,
        fvu=fvu,
        auxk_loss=auxk_loss * cfg.auxk_alpha,
        multi_topk_fvu=multi_topk_fvu,
    )


def forward_with_mse(params, x, cfg, dead_mask=None):
    out = forward(params, x, cfg, dead_mask)
    return out, jnp.mean((out.sae_out - x) ** 2)


def update_fired_counters(
    num_frames_since_fired: jnp.ndarray,
    top_indices: jnp.ndarray,
    frames_in_batch,
) -> jnp.ndarray:
    """Dead-feature bookkeeping (reference train_sae.py:412-446): every latent
    ages by the batch's frame count; any latent selected this step resets."""
    did_fire = (
        jnp.zeros_like(num_frames_since_fired, dtype=bool)
        .at[top_indices.reshape(-1)]
        .set(True)
    )
    # Saturate below int32 overflow: dead_mask only tests `> threshold`, so
    # clamping far above any realistic threshold preserves semantics while the
    # counter stays a TPU-native int32.
    aged = jnp.minimum(num_frames_since_fired + frames_in_batch, 2**30)
    return jnp.where(did_fire, 0, aged)


def param_count(params: TopKParams) -> int:
    return int(sum(np.prod(p.shape) for p in params))
