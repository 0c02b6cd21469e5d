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
* decode picks its implementation by the static sparsity regime: row-gather +
  weighted sum when k·d_in ≤ n_dict (bandwidth-lean inference), dense-scatter
  + MXU matmul otherwise (training with AuxK — see ``decode``).
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

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import TopKAutoEncoderConfig, get_n_dict_components

# fused-kernel resident-weight budget: W_enc + W_dec live in VMEM for the
# whole grid; past this many bytes (bf16) the tile working set no longer
# fits the arena (large_v1/v3: 105 MB) and training_losses routes to the
# threshold-kernel formulation instead. Module-level so tests can force the
# gated path on small shapes.
KERNEL_RESIDENT_BUDGET = 64 * 1024 * 1024


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


def decode(
    params: TopKParams, top_acts: jnp.ndarray, top_indices: jnp.ndarray,
    matmul_dtype=None,
) -> jnp.ndarray:
    """Sparse decode, implementation chosen by the static sparsity regime:

    * small k·d_in (inference, small dicts): gather k dictionary rows and
      weighted-sum — bandwidth-lean, no dense latent.
    * large k (training with AuxK's k_aux = d_in/2): scatter into the dense
      latent and matmul on the MXU — XLA materializes the (…, k, d_in) gather
      otherwise, which OOMs at trainer scale (50×1500×192×384 ≈ 22 GB).
    """
    n_dict, d_in = params.W_dec.shape
    k = top_acts.shape[-1]
    if k * d_in <= n_dict:
        rows = jnp.take(params.W_dec, top_indices, axis=0)  # (…, k, d_in)
        y = jnp.einsum("...k,...kd->...d", top_acts, rows)
    else:
        dense = dense_latent(top_acts, top_indices, n_dict)
        W = params.W_dec
        if matmul_dtype is not None:
            dense, W = dense.astype(matmul_dtype), W.astype(matmul_dtype)
        y = jnp.dot(dense, W, preferred_element_type=jnp.float32)
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


def kth_threshold(
    acts: jnp.ndarray, k: int, mask=None, iters: int = 24
) -> jnp.ndarray:
    """Per-position k-th-largest threshold by bisection (TPU-friendly).

    ``lax.top_k`` costs O(k) passes over the lane dimension — at AuxK scale
    (k_aux = 192 over 6144 latents) that is ~340 ms/step on v5e, while ~24
    counting passes find the same threshold in ~30 ms. Returns the largest t
    with count(acts ≥ t) ≥ k; ties can admit slightly more than k entries
    (AuxK is a "top ~half of dead latents" heuristic — reference
    topkautoencoder.py:108-129 — so the boundary tie is immaterial).
    """
    masked = acts if mask is None else jnp.where(mask, acts, -jnp.inf)
    finite = jnp.isfinite(masked)
    lo = jnp.min(jnp.where(finite, masked, jnp.inf), axis=-1, keepdims=True)
    hi = jnp.max(masked, axis=-1, keepdims=True)

    def body(_, lohi):
        lo, hi = lohi
        mid = (lo + hi) * 0.5
        cnt = jnp.sum(masked >= mid, axis=-1, keepdims=True)
        ok = cnt >= k
        return jnp.where(ok, mid, lo), jnp.where(ok, hi, mid)

    lo, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
    return lo  # +inf when no finite candidates → selects nothing


def _masked_dense_decode(params, acts, threshold, matmul_dtype, select_mask=None):
    """Decode the latents ≥ per-position ``threshold`` as one MXU matmul.

    TPU-native equivalent of the reference's scatter-then-matmul: selecting
    the top-k of an already-dense pre-activation tensor is a per-position
    threshold compare, so the dense sparse-code tensor is a ``where`` (never a
    scatter — 14M scalar scatter-adds serialize horribly on TPU) and both the
    decode and its entire backward are plain matmuls. Gradients route to
    exactly the selected entries, matching the gather/scatter formulation.
    Tie semantics differ infinitesimally: values exactly equal to the k-th
    largest are all selected (the reference's topk keeps exactly k).
    """
    keep = acts >= threshold
    if select_mask is not None:
        keep = keep & select_mask
    dense = jnp.where(keep, acts, 0.0)
    W = params.W_dec
    if matmul_dtype is not None:
        dense, W = dense.astype(matmul_dtype), W.astype(matmul_dtype)
    y = jnp.dot(dense, W, preferred_element_type=jnp.float32)
    return y + params.b_dec


def forward(
    params: TopKParams,
    x: jnp.ndarray,
    cfg: TopKAutoEncoderConfig,
    dead_mask: Optional[jnp.ndarray] = None,
    matmul_dtype=None,
) -> TopKForwardOutput:
    return _forward_impl(params, x, cfg, dead_mask, matmul_dtype)[0]


def forward_with_fired(
    params: TopKParams,
    x: jnp.ndarray,
    cfg: TopKAutoEncoderConfig,
    dead_mask: Optional[jnp.ndarray] = None,
    matmul_dtype=None,
):
    """(forward output, fired) — ``fired[j]`` is True iff latent j was
    selected anywhere in the batch. A cheap mask reduction for the trainer's
    dead-feature bookkeeping (a scalar scatter over flattened indices, as the
    reference does with ``did_fire[...indices] = True``, serializes on TPU)."""
    return _forward_impl(params, x, cfg, dead_mask, matmul_dtype)


def _forward_impl(params, x, cfg, dead_mask, matmul_dtype):
    acts = pre_acts(params, x, matmul_dtype=matmul_dtype)
    top = select_topk(acts, cfg.k)
    thresh = jnp.min(top.top_acts, axis=-1, keepdims=True)
    keep = acts >= thresh
    # zero activations never fire (see ops/topk_threshold.py — a silent
    # frame's threshold is 0 and would otherwise fire the whole dictionary)
    fired = jnp.any((keep & (acts > 0)).reshape(-1, keep.shape[-1]), axis=0)
    sae_out = _masked_dense_decode(params, acts, thresh, matmul_dtype).astype(x.dtype)
    e = sae_out - x

    tv = jnp.sum((x - jnp.mean(x, axis=0)) ** 2)
    tv = jnp.where(tv == 0, 1.0, tv)

    if dead_mask is not None:
        d_in = x.shape[-1]
        k_aux = d_in // 2
        num_dead = jnp.sum(dead_mask)
        scale = jnp.minimum(num_dead / k_aux, 1.0)
        dead = jnp.broadcast_to(dead_mask, acts.shape)
        aux_thresh = kth_threshold(acts, k_aux, mask=dead)
        e_hat = _masked_dense_decode(
            params, acts, aux_thresh, matmul_dtype, select_mask=dead
        )
        auxk_loss = scale * jnp.sum((e_hat - e) ** 2) / tv
    else:
        auxk_loss = jnp.asarray(0.0, x.dtype)

    fvu = jnp.sum(e * e) / tv

    if cfg.multi_topk:
        multi_vals, _ = jax.lax.top_k(acts, 4 * cfg.k)
        thresh4 = jnp.min(multi_vals, axis=-1, keepdims=True)
        multi_out = _masked_dense_decode(params, acts, thresh4, matmul_dtype)
        multi_topk_fvu = jnp.sum((multi_out - x) ** 2) / tv
    else:
        multi_topk_fvu = jnp.asarray(0.0, x.dtype)

    out = TopKForwardOutput(
        sae_out=sae_out,
        encoded=top,
        fvu=fvu,
        auxk_loss=auxk_loss * cfg.auxk_alpha,
        multi_topk_fvu=multi_topk_fvu,
    )
    return out, fired


def training_losses(
    params: TopKParams,
    x: jnp.ndarray,
    cfg: TopKAutoEncoderConfig,
    dead_mask: jnp.ndarray,
    matmul_dtype=None,
    prefer_kernel: bool = True,
):
    """Loss terms + fired mask for the TRAIN step, with no lax.top_k at all.

    The train step never consumes the (top_acts, top_indices) pair — only the
    losses and which latents fired — so selection reduces to per-position
    thresholds, computed by the single-pass Pallas bisection kernel
    (freud_tpu.ops.topk_threshold), which also folds the ``fired`` reduction
    into its resident pass. The backward pass is hand-written (custom_vjp):
    thresholds are selection boundaries with no gradient, so the whole step is
    five large matmuls with every elementwise mask fused into an operand read
    — XLA autodiff of the where-masked formulation additionally materializes
    the full (M, n_dict) cotangent and a (M, d) input cotangent that only
    b_dec's gradient needs (reference loss spec:
    src/models/topkautoencoder.py:93-151). Gradients match autodiff exactly
    (tests/test_topk_threshold.py::test_training_losses_gradients_match).

    Returns ({fvu, auxk_loss, multi_topk_fvu}, fired).
    """
    if cfg.multi_topk:
        return _training_losses_xla(params, x, cfg, dead_mask, matmul_dtype)
    if params.W_dec.shape[0] >= 2 ** 15:
        # the fused kernel's row-pair SWAR bisection packs per-half counts
        # and bf16 bit values into 15-bit halves — n_dict ≥ 2¹⁵ would
        # silently overflow the packed counters, so huge dictionaries take
        # the f32-bisection formulation instead
        return _training_losses_xla(params, x, cfg, dead_mask, matmul_dtype)
    mm_name = jnp.dtype(matmul_dtype).name if matmul_dtype is not None else None
    # width gate (same failure mode as the attention kernel's d² overflow,
    # commit af6f609): the fused kernel keeps W_enc AND W_dec VMEM-resident;
    # past ~64 MB of bf16 weights (large_v1/v3 recipes: d=1280 × n_dict=20480
    # → 105 MB) the arena can't also hold the tile working set, so those
    # shapes take the threshold-kernel formulation (still one resident pass
    # for all thresholds + fired)
    resident_weight_bytes = 2 * params.W_dec.shape[0] * x.shape[-1] * 2
    fvu, auxk_loss, fired = _fused_losses(
        cfg.k, x.shape[-1] // 2, float(cfg.auxk_alpha), mm_name,
        bool(prefer_kernel) and resident_weight_bytes <= KERNEL_RESIDENT_BUDGET,
        params, x, dead_mask.astype(jnp.float32),
    )
    return {
        "fvu": fvu,
        "auxk_loss": auxk_loss,
        "multi_topk_fvu": jnp.asarray(0.0, x.dtype),
    }, fired


def _mm(a, b, mm_name, out_dtype=jnp.float32):
    if mm_name is not None:
        a, b = a.astype(mm_name), b.astype(mm_name)
    return jax.lax.dot(a, b, preferred_element_type=out_dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def _fused_losses(k, k_aux, alpha, mm_name, use_kernel, params, x, dead_f):
    out, _ = _fused_losses_fwd(k, k_aux, alpha, mm_name, use_kernel,
                               params, x, dead_f)
    return out


def _fused_losses_fwd(k, k_aux, alpha, mm_name, use_kernel, params, x, dead_f):
    d_in = x.shape[-1]
    n_dict = params.W_dec.shape[0]
    x2 = x.reshape(-1, d_in)
    interpret = jax.default_backend() == "cpu"

    if mm_name == "bfloat16" and use_kernel:
        # single-kernel forward: encode + exact integer bisection + both
        # masked decodes in one pass over x (freud_tpu.ops.topk_fused).
        # The custom call carries a GSPMD sharding rule (rows partition
        # freely), so a data-sharded batch runs one kernel per chip.
        # ``use_kernel=False`` keeps the shardable XLA ops below instead
        # (also the multi_topk path and non-bf16 precision).
        from ...ops.topk_fused import topk_sae_forward

        sae_in = x2 - params.b_dec
        acts, y_main, y_aux, t_main, t_aux, fired = topk_sae_forward(
            x2, params.encoder_weight.T, params.encoder_bias,
            params.b_dec, params.W_dec, dead_f, k, k_aux,
            interpret=interpret,
        )
    else:
        from ...ops.topk_threshold import topk_thresholds_fired

        sae_in = x2 - params.b_dec
        acts = jax.nn.relu(
            _mm(sae_in, params.encoder_weight.T, mm_name)
            .astype(mm_name or x.dtype)
            + params.encoder_bias.astype(mm_name or x.dtype)
        )  # (M, n_dict) in matmul dtype — the step's one big resident tensor

        t_main, t_aux, _, fired = topk_thresholds_fired(
            acts, dead_f > 0, k, k_aux, interpret=interpret,
        )
        af = acts.astype(jnp.float32)
        keep_main = af >= t_main
        keep_aux = (af >= t_aux) & (dead_f > 0)
        dense_main = jnp.where(keep_main, acts, 0)
        dense_aux = jnp.where(keep_aux, acts, 0)

        y_main = _mm(dense_main, params.W_dec, mm_name)
        y_aux = _mm(dense_aux, params.W_dec, mm_name)

    e = y_main + params.b_dec - x2  # = sae_out − x
    r = y_aux - y_main + x2  # = ê − e   (b_dec cancels)

    tv = jnp.sum((x - jnp.mean(x, axis=0)) ** 2)
    tv = jnp.where(tv == 0, 1.0, tv)
    num_dead = jnp.sum(dead_f)
    scale = jnp.minimum(num_dead / k_aux, 1.0)

    fvu = jnp.sum(e * e) / tv
    auxk_loss = alpha * scale * jnp.sum(r * r) / tv

    res = (params, sae_in, acts, t_main, t_aux, dead_f, e, r, tv, scale, x.shape)
    return (fvu, auxk_loss, fired), res


def _fused_losses_bwd(k, k_aux, alpha, mm_name, use_kernel, res, cts):
    g_fvu, g_aux, _ = cts  # fired is boolean — its cotangent is float0
    params, sae_in, acts, t_main, t_aux, dead_f, e, r, tv, scale, x_shape = res

    c1 = 2.0 * g_fvu / tv
    c2 = 2.0 * g_aux * alpha * scale / tv
    g_main = c1 * e - c2 * r  # ∂L/∂y_main  (M, d)
    g_auxd = c2 * r  # ∂L/∂y_aux

    # NOTE: a fused backward Pallas kernel was tried and removed — Mosaic
    # lowers the dim-0-contraction (denseᵀ @ g) accumulations through VPU
    # transposes, measuring 820 ms/step vs ~16 ms for these XLA matmuls.
    af = acts.astype(jnp.float32)
    keep_main = af >= t_main
    keep_aux = (af >= t_aux) & (dead_f > 0)
    dense_main = jnp.where(keep_main, acts, 0)
    dense_aux = jnp.where(keep_aux, acts, 0)

    # decoder grads — masks fuse into the matmul operand reads
    dW_dec = _mm(dense_main.T, g_main, mm_name) + _mm(dense_aux.T, g_auxd, mm_name)
    db_dec = c1 * jnp.sum(e, axis=0)  # Σ(∂L/∂y_main + ∂L/∂y_aux) = c1·Σe

    # route into the latent: only selected entries carry gradient. Under
    # bf16 matmuls the (M, n_dict) cotangents stay bf16 — halves the HBM
    # traffic of the three big backward tensors; reductions that cross the
    # M axis accumulate in f32 below.
    ct_dtype = jnp.bfloat16 if mm_name == "bfloat16" else jnp.float32
    d1 = _mm(g_main, params.W_dec.T, mm_name, out_dtype=ct_dtype)
    d2 = _mm(g_auxd, params.W_dec.T, mm_name, out_dtype=ct_dtype)
    relu_live = af > 0
    d_acts = (
        jnp.where(keep_main & relu_live, d1, 0)
        + jnp.where(keep_aux & relu_live, d2, 0)
    )

    # encoder grads; b_dec's encode-path term uses Σ_pos d_acts first, so the
    # (M, d) input cotangent never materializes unless the CALLER asks for
    # ∂L/∂x (the train step differentiates params only, and XLA dead-code-
    # eliminates the dx computation below in that case)
    dW_enc = _mm(d_acts.T, sae_in, mm_name)
    db_enc = jnp.sum(d_acts, axis=0, dtype=jnp.float32)
    db_dec = db_dec - _mm(db_enc[None, :], params.encoder_weight, mm_name)[0]

    # input cotangent: direct e/r terms (∂e/∂x = −1, ∂r/∂x = +1 → −g_main),
    # the encode path (d_acts @ W_enc), and the total-variance denominator
    # (∂tv/∂x = 2(x − mean₀x); the mean term cancels in the sum)
    dx2 = -g_main.astype(jnp.float32) + _mm(
        d_acts, params.encoder_weight, mm_name
    )
    x_full = (sae_in + params.b_dec).reshape(x_shape)
    k_tv = -(c1 * jnp.sum(e * e) + c2 * jnp.sum(r * r)) / (2.0 * tv)
    dx = dx2.reshape(x_shape) + k_tv * 2.0 * (
        x_full - jnp.mean(x_full, axis=0)
    )

    d_params = TopKParams(
        encoder_weight=dW_enc.astype(params.encoder_weight.dtype),
        encoder_bias=db_enc.astype(params.encoder_bias.dtype),
        W_dec=dW_dec.astype(params.W_dec.dtype),
        b_dec=db_dec.astype(params.b_dec.dtype),
    )
    return d_params, dx.astype(e.dtype), jnp.zeros_like(dead_f)


_fused_losses.defvjp(_fused_losses_fwd, _fused_losses_bwd)


def _training_losses_xla(
    params: TopKParams,
    x: jnp.ndarray,
    cfg: TopKAutoEncoderConfig,
    dead_mask: jnp.ndarray,
    matmul_dtype=None,
):
    """XLA-autodiff formulation (kept for multi_topk; same semantics)."""
    from ...ops.topk_threshold import topk_thresholds_fired

    acts = pre_acts(params, x, matmul_dtype=matmul_dtype)
    n_dict = acts.shape[-1]
    d_in = x.shape[-1]
    k_aux = d_in // 2
    flat = jax.lax.stop_gradient(acts.reshape(-1, n_dict))
    interpret = jax.default_backend() == "cpu"
    # all thresholds (k, k_aux-over-dead, and multi_topk's 4k when enabled)
    # AND the fired mask come from ONE resident pass over the latent
    t_main, t_aux, t4, fired = topk_thresholds_fired(
        flat, dead_mask, cfg.k, k_aux, interpret=interpret,
        k_multi=4 * cfg.k if cfg.multi_topk else 0,
    )
    lead = acts.shape[:-1]
    t_main = t_main.reshape(*lead, 1).astype(acts.dtype)
    t_aux = t_aux.reshape(*lead, 1).astype(acts.dtype)

    # fired comes straight from the kernel's resident pass (same
    # (a ≥ t) & (a > 0) silent-frame semantics, padded rows excluded) — an
    # XLA recompute here would re-read the whole (M, n_dict) latent from HBM
    sae_out = _masked_dense_decode(params, acts, t_main, matmul_dtype).astype(x.dtype)
    e = sae_out - x
    tv = jnp.sum((x - jnp.mean(x, axis=0)) ** 2)
    tv = jnp.where(tv == 0, 1.0, tv)
    fvu = jnp.sum(e * e) / tv

    num_dead = jnp.sum(dead_mask)
    scale = jnp.minimum(num_dead / k_aux, 1.0)
    dead = jnp.broadcast_to(dead_mask, acts.shape)
    e_hat = _masked_dense_decode(params, acts, t_aux, matmul_dtype, select_mask=dead)
    auxk_loss = cfg.auxk_alpha * scale * jnp.sum((e_hat - e) ** 2) / tv

    if cfg.multi_topk:
        thresh4 = t4.reshape(*lead, 1).astype(acts.dtype)
        multi_out = _masked_dense_decode(params, acts, thresh4, matmul_dtype)
        multi_topk_fvu = jnp.sum((multi_out - x) ** 2) / tv
    else:
        multi_topk_fvu = jnp.asarray(0.0, x.dtype)

    return {"fvu": fvu, "auxk_loss": auxk_loss, "multi_topk_fvu": multi_topk_fvu}, fired


def age_counters(
    num_frames_since_fired: jnp.ndarray, fired: jnp.ndarray, frames_in_batch
) -> jnp.ndarray:
    """Dead-feature bookkeeping from a fired mask (see update_fired_counters)."""
    aged = jnp.minimum(num_frames_since_fired + frames_in_batch, 2**30)
    return jnp.where(fired, 0, aged)


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
