"""Per-clip feature analysis: top features and on-the-fly manipulation.

Behavioral parity with the reference's ``top_activations_for_audio`` and
``manipulate_latent`` (src/utils/activations.py:135-296), as jitted
device-side programs:

* top features — the reference collects per-timestep top-k pairs and
  iteratively dedups them into the global top-n distinct features ranked by
  their observed maxima (its own sanity assert pins each reported value to
  the feature's trace max, activations.py:204-206). Equivalent closed form
  used here: per-feature max over the trimmed trace → ``lax.top_k`` → gather
  the winning traces.
* manipulation — scale one feature in the latent (L1: dense slice; TopK: edit
  where the index appears; raw: edit the activation channel), decode both the
  standard and manipulated reconstructions, splice each back into the encoder
  via substitution, and return the three transcripts + both trimmed traces.
"""

from __future__ import annotations

import re
from functools import lru_cache, partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..audio.mel import mels_from_array
from ..constants import SAMPLE_RATE, TIMESTEP_S
from ..models.sae import config as sae_config
from ..models.sae import l1 as l1_mod
from ..models.sae import topk as topk_mod
from ..models.whisper import WhisperRuntime


def activation_length_from_samples(n_samples: int) -> int:
    """Encoder frames covering an audio clip (reference activations.py:32-38)."""
    return min(int(n_samples / SAMPLE_RATE / TIMESTEP_S), 1500)


# --------------------------------------------------------------- steering taps
# Online per-position transforms for decoder-layer feature manipulation:
# applied to the block's residual-stream output at each decode position as it
# is generated (decoding._decode_step tap_fn). Module-level and reused via
# instance-cached partials so the jitted decode program is shared across
# calls. Each takes (tap_params, x) with x (b, 1, d); feat_idx and factor ride
# in tap_params as TRACED values, so the standard (factor=1) and manipulated
# transcripts share one compiled program.


def _l1_steer_tap(tap, x):
    """SAE roundtrip with one latent feature scaled (L1 variant).

    ``tap = (normalized_params, feat_idx, factor)`` — pass
    ``l1.normalize_columns(params)`` so the per-step work is the two matmuls.
    """
    nparams, feat_idx, factor = tap
    latent = l1_mod.encode(nparams, x, pre_normalized=True).latent
    scale = 1.0 + (factor - 1.0) * jax.nn.one_hot(
        feat_idx, latent.shape[-1], dtype=latent.dtype
    )
    return l1_mod.decode(nparams, latent * scale)


def _topk_steer_tap(tap, x, *, k):
    """SAE roundtrip with one feature scaled where it appears in the top-k
    (TopK variant; ``k`` is static — bind with functools.partial)."""
    params, feat_idx, factor = tap
    enc = topk_mod.select_topk(topk_mod.pre_acts(params, x), k)
    hit = enc.top_indices == feat_idx
    acts = jnp.where(hit, enc.top_acts * factor, enc.top_acts)
    return topk_mod.decode(params, acts, enc.top_indices)


def _raw_steer_tap(tap, x):
    """No-SAE channel scaling: multiply one residual-stream channel."""
    feat_idx, factor = tap
    scale = 1.0 + (factor - 1.0) * jax.nn.one_hot(
        feat_idx, x.shape[-1], dtype=x.dtype
    )
    return x * scale


@lru_cache(maxsize=None)
def _topk_steer_fn(k: int):
    return partial(_topk_steer_tap, k=k)


def sae_steer_fn(variant: str, cfg):
    """The static tap fn for an SAE (variant, cfg).

    Returns the SAME object for equal (variant, k) across all callers — the
    jitted decode program is keyed on the fn's identity, so a fresh partial
    per call would miss the jit cache and recompile the whole decode
    (minutes on remote backends)."""
    if variant == "l1":
        return _l1_steer_tap
    return _topk_steer_fn(int(cfg.k))


def sae_roundtrip_tap_params(variant: str, params):
    """Tap params for the plain SAE roundtrip (no feature edited — the
    factor-1 case): the trainer's 'substitute the reconstruction' validation
    transcript, online. Params are TRACED: pass the current training params
    each call without recompiling."""
    if variant == "l1":
        params = l1_mod.normalize_columns(params)
    return (params, jnp.int32(0), jnp.float32(1.0))


class FeatureAnalyzer:
    """Owns a WhisperRuntime + optional SAE for the upload/manipulate paths."""

    def __init__(self, runtime: WhisperRuntime, sae: Optional[tuple] = None):
        """``sae`` is (variant, cfg, params) as produced by loaders.load_sae."""
        self.runtime = runtime
        self.sae = sae

    @property
    def n_features(self) -> int:
        if self.sae is None:
            return self.runtime.activation_width
        variant, cfg, _ = self.sae
        return sae_config.get_n_dict_components(
            self.runtime.activation_width, cfg.expansion_factor, cfg.n_dict_components
        )

    # ---------------------------------------------------------- top features

    def top_features_for_audio(self, audio: np.ndarray, top_n: int):
        """(feature_indices, traces): top-n features of an uploaded clip."""
        mel = mels_from_array(audio, self.runtime.dims.n_mels)
        acts, n_valid = self.runtime.activations_with_lengths(mel)
        acts = acts[0]  # (T, width)
        if self.runtime.layer_name.startswith("decoder."):
            # decode positions, not audio frames — the decode itself reports
            # how many positions it processed (rows beyond are EOT-padding).
            # np.asarray first: int(dev_array[0]) is ad-hoc device indexing,
            # which compiles a fresh gather program per call on remote
            # backends (CLAUDE.md — minutes on the tunneled TPU)
            true_len = int(np.asarray(n_valid)[0])
        else:
            true_len = activation_length_from_samples(len(audio))

        if self.sae is not None:
            variant, cfg, params = self.sae
            if variant == "l1":
                latent = l1_mod.encode(params, acts).latent
            else:
                enc = topk_mod.encode(params, acts, cfg)
                latent = topk_mod.dense_latent(
                    enc.top_acts, enc.top_indices, self.n_features
                )
        else:
            latent = acts

        latent = np.asarray(latent)[:true_len]  # (T', n_features)
        per_feature_max = latent.max(axis=0)
        vals, idx = jax.lax.top_k(jnp.asarray(per_feature_max), top_n)
        idx = np.asarray(idx)
        traces = [latent[:, i] for i in idx]
        return [int(i) for i in idx], traces

    # ---------------------------------------------------------- manipulation

    def manipulate(
        self, audio: np.ndarray, feat_idx: int, manipulation_factor: float
    ):
        """(baseline_text, manipulated_text, standard_text,
        standard_trace, manipulated_trace)."""
        if not (0 <= int(feat_idx) < self.n_features):
            # JAX's clamp-gather semantics would otherwise silently operate
            # on the LAST feature (L1) or no-op (TopK index compare) and
            # return wrong-but-plausible results for a bogus index
            raise ValueError(
                f"feat_idx {feat_idx} out of range [0, {self.n_features})"
            )
        rt = self.runtime
        if rt.layer_name.startswith("decoder."):
            return self._manipulate_decoder(audio, feat_idx, manipulation_factor)
        mel = mels_from_array(audio, rt.dims.n_mels)
        acts = rt.activations(mel)  # (1, T, width)
        true_len = activation_length_from_samples(len(audio))

        if self.sae is not None:
            variant, cfg, params = self.sae
            if variant == "l1":
                latent = l1_mod.encode(params, acts).latent
                standard_trace = np.asarray(latent[0, :, feat_idx])
                manipulated = latent.at[:, :, feat_idx].multiply(manipulation_factor)
                standard_decoded = l1_mod.decode(
                    l1_mod.normalize_columns(params), latent
                )
                manipulated_decoded = l1_mod.decode(
                    l1_mod.normalize_columns(params), manipulated
                )
            else:
                enc = topk_mod.encode(params, acts, cfg)
                hit = enc.top_indices == feat_idx
                manipulated_acts = jnp.where(
                    hit, enc.top_acts * manipulation_factor, enc.top_acts
                )
                standard_decoded = topk_mod.decode(
                    params, enc.top_acts, enc.top_indices
                )
                manipulated_decoded = topk_mod.decode(
                    params, manipulated_acts, enc.top_indices
                )
                standard_trace = np.asarray(
                    jnp.sum(jnp.where(hit, enc.top_acts, 0.0), axis=-1)[0]
                )
            baseline_text = rt.transcribe_one(mel)
        else:
            standard_trace = np.asarray(acts[0, :, feat_idx])
            manipulated_decoded = jnp.asarray(acts).at[:, :, feat_idx].multiply(
                manipulation_factor
            )
            standard_decoded = acts
            # Reference returns the unmodified-forward transcript in every
            # path, SAE or not (src/utils/activations.py:241-242); the stock
            # GUI renders the field.
            baseline_text = rt.transcribe_one(mel)

        manipulated_trace = standard_trace * manipulation_factor

        layer = rt.layer_name
        manipulated_text = rt.transcribe_one(
            mel, substitute_layer=layer, substitute_value=manipulated_decoded
        )
        standard_text = rt.transcribe_one(
            mel, substitute_layer=layer, substitute_value=standard_decoded
        )
        return (
            baseline_text,
            manipulated_text,
            standard_text,
            standard_trace[:true_len],
            manipulated_trace[:true_len],
        )

    # ------------------------------------------------- decoder-layer steering

    def _decoder_tap(self, feat_idx, factor):
        """(layer_idx, fn, tap_params) steering the runtime's decoder layer.

        ``fn`` is cached on the instance so repeated requests (and the
        standard/manipulated pair within one request) share the jitted
        decode program; feat_idx and factor are traced members of
        tap_params."""
        layer = self.runtime.layer_name
        m = re.fullmatch(r"decoder\.blocks\.(\d+)", layer)
        if m is None:
            raise ValueError(
                "online decoder steering operates on block outputs "
                f"(decoder.blocks.N), got {layer!r}"
            )
        idx = int(m.group(1))
        fi = jnp.int32(feat_idx)
        fac = jnp.float32(factor)
        if self.sae is None:
            return idx, _raw_steer_tap, (fi, fac)
        variant, cfg, params = self.sae
        if variant == "l1":
            return idx, _l1_steer_tap, (l1_mod.normalize_columns(params), fi, fac)
        # sae_steer_fn caches per (variant, k): every analyzer instance (and
        # the trainer's validation transcriber) shares ONE fn object → ONE
        # compiled decode program
        return idx, sae_steer_fn(variant, cfg), (params, fi, fac)

    def _manipulate_decoder(self, audio, feat_idx, manipulation_factor):
        """Decoder-layer ``manipulate``: same contract as the encoder path,
        but the substitution happens ONLINE inside the autoregressive decode
        (each steered position influences every later token) — beyond the
        reference, whose precomputed-tensor hook cannot substitute into
        KV-cached incremental steps. Traces come from the captured
        teacher-forced pass over the UNsteered greedy decode, trimmed to the
        positions that decode actually processed."""
        rt = self.runtime
        mel = mels_from_array(audio, rt.dims.n_mels)
        # ONE capture program yields the traces' activations AND the
        # baseline greedy decode (decode_capture's settings mirror
        # transcribe exactly) — rendering its tokens saves a second full
        # encode+decode per request; np.asarray before indexing (ad-hoc
        # device indexing compiles a fresh program per call, CLAUDE.md)
        acts, n_valid, base_tokens = rt.activations_with_decode(mel)
        true_len = int(np.asarray(n_valid)[0])

        if self.sae is not None:
            variant, cfg, params = self.sae
            if variant == "l1":
                latent = l1_mod.encode(params, acts).latent
                standard_trace = np.asarray(latent[0, :, feat_idx])
            else:
                enc = topk_mod.encode(params, acts, cfg)
                hit = enc.top_indices == feat_idx
                standard_trace = np.asarray(
                    jnp.sum(jnp.where(hit, enc.top_acts, 0.0), axis=-1)[0]
                )
        else:
            standard_trace = np.asarray(acts[0, :, feat_idx])
        manipulated_trace = standard_trace * manipulation_factor

        baseline_text = rt.decode_tokens_text(base_tokens)[0]
        layer_idx, fn, tap_m = self._decoder_tap(feat_idx, manipulation_factor)
        _, _, tap_s = self._decoder_tap(feat_idx, 1.0)
        manipulated_text = rt.transcribe_one(
            mel, decoder_tap=(layer_idx, fn, tap_m)
        )
        standard_text = rt.transcribe_one(mel, decoder_tap=(layer_idx, fn, tap_s))
        return (
            baseline_text,
            manipulated_text,
            standard_text,
            standard_trace[:true_len],
            manipulated_trace[:true_len],
        )
