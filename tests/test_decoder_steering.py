"""Online decoder-layer steering (decoder_tap).

The reference's substituted forward hooks any module (hooked_model.py:58-69)
but replays a fixed precomputed tensor — shape-incompatible with KV-cached
incremental decode, which is why its feature-manipulation surface only ever
runs on encoder layers. Our analog is a per-position FUNCTION applied to a
decoder block's output online inside the decode loop (decoding._decode_step
tap_fn). These tests pin its semantics:

* an identity tap is a bit-exact no-op;
* the online tap equals the teacher-forced oracle — because block i's output
  at position j depends only on positions ≤ j and the tap is per-position,
  applying fn inside the incremental loop must produce the same logits as a
  full-sequence forward with fn applied to block i's captured output and the
  result substituted back in;
* FeatureAnalyzer.manipulate works end-to-end for decoder-layer SAEs (the
  /manipulate_feature serving path).
"""

import jax.numpy as jnp
import numpy as np

from freud_tpu.models.whisper import WhisperRuntime, dims_for, init_params
from freud_tpu.models.whisper.decoding import (
    _cross_kv_stacks,
    _decode_step,
    greedy_decode,
)
from freud_tpu.models.whisper.model import decoder_forward

DIMS = dims_for("test:tiny")


def _identity_tap(tp, x):
    return x


def _affine_tap(tp, x):
    return x * tp["g"] + tp["b"]


def test_identity_tap_is_noop():
    params = init_params(DIMS, seed=0)
    rng = np.random.default_rng(0)
    encoded = jnp.asarray(
        rng.standard_normal((2, 30, DIMS.n_audio_state)).astype(np.float32)
    )
    prompt = jnp.asarray(rng.integers(0, 100, (2, 3)).astype(np.int32))
    plain = greedy_decode(params, DIMS, encoded, prompt, 3, max_new=5)
    tapped = greedy_decode(
        params, DIMS, encoded, prompt, 3, max_new=5,
        decoder_tap=(1, _identity_tap, ()),
    )
    np.testing.assert_array_equal(np.asarray(plain), np.asarray(tapped))


def test_out_of_range_tap_layer_rejected():
    # an out-of-range layer index would otherwise be a SILENT no-op: the
    # "steered" decode would equal baseline with no error (e.g. an SAE
    # trained on decoder.blocks.5 served against a 4-layer model)
    import pytest

    params = init_params(DIMS, seed=0)
    rng = np.random.default_rng(0)
    encoded = jnp.asarray(
        rng.standard_normal((1, 30, DIMS.n_audio_state)).astype(np.float32)
    )
    prompt = jnp.asarray(rng.integers(0, 100, (1, 3)).astype(np.int32))
    with pytest.raises(ValueError, match="out of range"):
        greedy_decode(
            params, DIMS, encoded, prompt, 3, max_new=2,
            decoder_tap=(DIMS.n_text_layer, _identity_tap, ()),
        )


def test_online_tap_matches_teacher_forced_oracle():
    """Incremental tapped steps == full-sequence forward with the tap applied
    to the captured block output and substituted back (same tokens, no
    sampling rules in the way)."""
    params = init_params(DIMS, seed=0)
    rng = np.random.default_rng(1)
    b, T = 2, 6
    encoded = jnp.asarray(
        rng.standard_normal((b, 25, DIMS.n_audio_state)).astype(np.float32)
    )
    tokens = jnp.asarray(rng.integers(0, 200, (b, T)).astype(np.int32))
    tp = {"g": jnp.float32(0.9), "b": jnp.float32(0.03)}

    L, d = DIMS.n_text_layer, DIMS.n_text_state
    self_k = jnp.zeros((L, b, T, d), jnp.float32)
    self_v = jnp.zeros((L, b, T, d), jnp.float32)
    cross_kv = _cross_kv_stacks(params, DIMS, encoded)
    step_logits = []
    for pos in range(T):
        logits, self_k, self_v = _decode_step(
            params, DIMS, tokens[:, pos], pos, self_k, self_v, cross_kv,
            tap_layer=0, tap_fn=_affine_tap, tap_params=tp,
        )
        step_logits.append(np.asarray(logits))

    name = "decoder.blocks.0"
    _, caps = decoder_forward(params, DIMS, tokens, encoded, capture=(name,))
    sub = _affine_tap(tp, caps[name])
    oracle, _ = decoder_forward(
        params, DIMS, tokens, encoded, substitute={name: sub}
    )
    oracle = np.asarray(oracle)
    for pos in range(T):
        np.testing.assert_allclose(
            step_logits[pos], oracle[:, pos], atol=2e-3, rtol=2e-3
        )
    # and the tap genuinely changed the computation
    plain, _ = decoder_forward(params, DIMS, tokens, encoded)
    assert np.abs(oracle - np.asarray(plain)).max() > 1e-3


def _speech_like_audio(n=16000):
    return (np.random.default_rng(2).standard_normal(n) * 0.1).astype(np.float32)


def test_manipulate_decoder_topk_sae():
    from freud_tpu.analysis.features import FeatureAnalyzer
    from freud_tpu.models.sae import TopKAutoEncoderConfig, init_topk

    rt = WhisperRuntime("test:tiny", "decoder.blocks.1", max_new_tokens=3)
    cfg = TopKAutoEncoderConfig(n_dict_components=32, k=4)
    sae = ("topk", cfg, init_topk(DIMS.n_text_state, cfg, seed=0))
    an = FeatureAnalyzer(rt, sae)
    audio = _speech_like_audio()

    idx, traces = an.top_features_for_audio(audio, top_n=3)
    base, manip, std, s_tr, m_tr = an.manipulate(audio, idx[0], 4.0)
    assert isinstance(base, str) and isinstance(manip, str) and isinstance(std, str)
    np.testing.assert_allclose(m_tr, s_tr * 4.0, rtol=1e-5)
    # traces are trimmed to the positions the decode actually processed
    _, n_valid = rt.activations_with_lengths(
        np.zeros((DIMS.n_mels, 3000), np.float32)
    )
    assert s_tr.shape[0] <= rt.activation_frames

    # factor 1.0 → the steered-but-unmanipulated transcript
    _, manip1, std1, _, _ = an.manipulate(audio, idx[0], 1.0)
    assert manip1 == std1


def test_manipulate_decoder_l1_sae_and_raw():
    from freud_tpu.analysis.features import FeatureAnalyzer
    from freud_tpu.models.sae import L1AutoEncoderConfig, init_l1

    rt = WhisperRuntime("test:tiny", "decoder.blocks.0", max_new_tokens=3)
    cfg = L1AutoEncoderConfig(n_dict_components=24)
    sae = ("l1", cfg, init_l1(DIMS.n_text_state, cfg, seed=0))
    audio = _speech_like_audio(8000)

    an = FeatureAnalyzer(rt, sae)
    base, manip, std, s_tr, m_tr = an.manipulate(audio, 5, 0.0)
    assert isinstance(manip, str) and isinstance(std, str)
    np.testing.assert_allclose(m_tr, 0.0)

    # raw-channel steering (no SAE): factor 1 is the identity, so the
    # steered transcript equals the baseline decode
    an_raw = FeatureAnalyzer(rt, None)
    base, manip, std, s_tr, _ = an_raw.manipulate(audio, 7, 1.0)
    assert manip == std == base
    assert s_tr.ndim == 1


def test_manipulate_rejects_submodule_decoder_layers():
    import pytest

    from freud_tpu.analysis.features import FeatureAnalyzer

    rt = WhisperRuntime("test:tiny", "decoder.blocks.0.mlp.0", max_new_tokens=3)
    an = FeatureAnalyzer(rt, None)
    with pytest.raises(ValueError, match="block outputs"):
        an.manipulate(_speech_like_audio(8000), 2, 2.0)
