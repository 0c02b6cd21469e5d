"""Whisper model tests: shapes, capture/substitution semantics, decoding."""

import jax.numpy as jnp
import numpy as np
import pytest

from freud_tpu.models.whisper import (
    WhisperRuntime,
    dims_for,
    encoder_forward,
    init_params,
    special_tokens,
)
from freud_tpu.models.whisper.decoding import greedy_decode


@pytest.fixture(scope="module")
def tiny2():
    dims = dims_for("test:tiny")
    return init_params(dims, seed=0), dims


def _mels(batch=2, n_mels=80, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal((batch, n_mels, 3000)).astype(np.float32))


def test_encoder_shapes(tiny2):
    params, dims = tiny2
    x, caps = encoder_forward(params, dims, _mels(), capture=("encoder.blocks.1",))
    assert x.shape == (2, 1500, 384)
    assert caps["encoder.blocks.1"].shape == (2, 1500, 384)


def test_capture_points(tiny2):
    params, dims = tiny2
    names = (
        "encoder.conv1",
        "encoder.conv2",
        "encoder.blocks.0.mlp.1",
        "encoder.blocks.0",
        "encoder.ln_post",
    )
    _, caps = encoder_forward(params, dims, _mels(), capture=names)
    assert caps["encoder.conv1"].shape == (2, 3000, 384)
    assert caps["encoder.conv2"].shape == (2, 1500, 384)
    assert caps["encoder.blocks.0.mlp.1"].shape == (2, 1500, 4 * 384)
    # GELU output is non-negative-heavy: at least it differs from its input
    assert caps["encoder.blocks.0.mlp.1"].min() >= -0.2


def test_substitution_changes_downstream(tiny2):
    params, dims = tiny2
    mels = _mels()
    base, caps = encoder_forward(
        params, dims, mels, capture=("encoder.blocks.0", "encoder.blocks.1")
    )
    replacement = jnp.zeros_like(caps["encoder.blocks.0"])
    subbed, caps2 = encoder_forward(
        params, dims, mels,
        capture=("encoder.blocks.1",),
        substitute={"encoder.blocks.0": replacement},
    )
    # downstream must change, and the substituted tensor is what flows onward
    assert not np.allclose(np.asarray(base), np.asarray(subbed))
    assert not np.allclose(
        np.asarray(caps["encoder.blocks.1"]), np.asarray(caps2["encoder.blocks.1"])
    )


def test_substitution_identity_is_noop(tiny2):
    params, dims = tiny2
    mels = _mels()
    base, caps = encoder_forward(params, dims, mels, capture=("encoder.blocks.0",))
    same, _ = encoder_forward(
        params, dims, mels, substitute={"encoder.blocks.0": caps["encoder.blocks.0"]}
    )
    np.testing.assert_allclose(np.asarray(base), np.asarray(same), atol=1e-6)


def test_greedy_decode_shapes(tiny2):
    params, dims = tiny2
    encoded, _ = encoder_forward(params, dims, _mels(batch=1))
    st = special_tokens(dims.n_vocab)
    prompt = jnp.asarray([[st.sot, st.lang_base, st.transcribe]], jnp.int32)
    tokens = greedy_decode(params, dims, encoded, prompt, 3, max_new=8)
    tokens = np.asarray(tokens)
    assert tokens.shape == (1, 11)
    assert tokens[0, 0] == st.sot
    assert tokens[0, 1] == st.lang_base  # prompt preserved through prefill
    assert tokens[0, 2] == st.transcribe


def test_runtime_capture_and_transcribe():
    rt = WhisperRuntime("test:tiny", "encoder.blocks.1", max_new_tokens=4)
    mels = _mels(batch=1)
    acts = rt.activations(mels)
    assert acts.shape == (1, 1500, 384)
    text = rt.transcribe_one(mels)
    assert isinstance(text, str)
    # substituted transcribe runs and returns a string too
    text2 = rt.transcribe_one(
        mels, substitute_layer="encoder.blocks.1", substitute_value=np.asarray(acts[0])
    )
    assert isinstance(text2, str)


def test_special_token_layout():
    st = special_tokens(51865)
    assert (st.eot, st.sot, st.transcribe, st.no_timestamps, st.timestamp_begin) == (
        50257, 50258, 50359, 50363, 50364,
    )
    st3 = special_tokens(51866)
    assert st3.timestamp_begin == 50365
    sten = special_tokens(51864)
    assert sten.sot_sequence() == [sten.sot]


def test_runtime_decoder_capture():
    """decoder.* layers: greedy decode + teacher-forced captured pass
    (capability parity with the reference's module-name-agnostic hooks,
    hooked_model.py:47-56 — our runtime.decode_capture)."""
    rt = WhisperRuntime("test:tiny", "decoder.blocks.1", max_new_tokens=4)
    mels = _mels(batch=2)
    T = rt.activation_frames  # n_prompt + max_new
    n_prompt = T - 4
    assert n_prompt == 3  # <|sot|><|lang|><|transcribe|> (timestamps on)
    acts, n_valid = rt.activations_with_lengths(mels)
    assert acts.shape == (2, T, 384)
    nv = np.asarray(n_valid)
    assert nv.shape == (2,) and (nv >= n_prompt).all() and (nv <= T).all()
    # activations() is the same tensor
    assert np.array_equal(np.asarray(rt.activations(mels)), np.asarray(acts))
    assert rt.activation_width == 384


def test_runtime_decoder_capture_causal_prefix():
    """Teacher-forced capture is causal: a longer decode buffer must not
    change the activations at the shared leading positions (this is what
    makes the single captured pass equivalent to per-step incremental
    hooks)."""
    mels = _mels(batch=1, seed=3)
    rt4 = WhisperRuntime("test:tiny", "decoder.blocks.0", max_new_tokens=4)
    rt8 = WhisperRuntime("test:tiny", "decoder.blocks.0", max_new_tokens=8)
    a4 = np.asarray(rt4.activations(mels))
    a8 = np.asarray(rt8.activations(mels))
    # greedy decode is deterministic, so the first n_prompt+4 tokens agree
    # and causal masking makes their activations agree too
    np.testing.assert_allclose(a4, a8[:, : a4.shape[1]], rtol=1e-4, atol=1e-5)


def test_runtime_decoder_mlp_width():
    rt = WhisperRuntime("test:tiny", "decoder.blocks.0.mlp.1", max_new_tokens=2)
    assert rt.activation_width == 4 * 384
    acts = rt.activations(_mels(batch=1))
    assert acts.shape == (1, rt.activation_frames, 4 * 384)


def test_decoder_substitution_rejected():
    rt = WhisperRuntime("test:tiny", "decoder.blocks.1", max_new_tokens=2)
    mels = _mels(batch=1)
    acts = rt.activations(mels)
    with pytest.raises(ValueError, match="encoder layers only"):
        rt.transcribe_one(mels, substitute_layer="decoder.blocks.1",
                          substitute_value=np.asarray(acts[0]))


def test_multilayer_rejects_decoder_layers():
    from freud_tpu.data.multilayer import MultiLayerActivationLoader

    with pytest.raises(ValueError, match="decoder layers"):
        MultiLayerActivationLoader(
            "/nonexistent", "test:tiny",
            ["encoder.blocks.0", "decoder.blocks.0"], batch_size=2,
        )
