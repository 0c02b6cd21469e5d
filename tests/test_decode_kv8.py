"""int8 cross-attention KV planes for the decode loop (``kv_dtype="int8"``).

An EXPERIMENTAL decoding-level knob kept for probe reproducibility — it is
NOT wired into any product surface (runtime/CLI/server), because it is a
measured end-to-end loser on v5e: the int8 planes win under a bare fixed
scan (0.359 → 0.253 ms/step tiny, tools/bench_decode3.py) but lose inside
the product early-exit while_loop, whose bf16 body is already
cross-op-overlapped (serving 3854 → 3257 RTFx tiny b8, 455 → 262 small b8
— tools/bench_kv8.py; full verdict in ``_cross_kv_stacks``). These tests
pin the knob's exactness so the probes stay reproducible: the quantized
stacks really are int8 + per-row scales, the token stream matches the dense
path on separated test-scale logits, and the option composes with beam
search and the conditioned-prompt ``start`` offset.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from freud_tpu.models.whisper import (
    dims_for,
    encoder_forward,
    init_params,
    special_tokens,
)
from freud_tpu.models.whisper.decoding import (
    _cross_kv_stacks,
    beam_decode,
    sample_decode,
)


@pytest.fixture(scope="module")
def setup():
    dims = dims_for("test:tiny")
    params = init_params(dims, seed=3)
    rng = np.random.default_rng(0)
    mels = jnp.asarray(
        rng.standard_normal((2, dims.n_mels, 3000)).astype(np.float32) * 0.3
    )
    encoded, _ = encoder_forward(params, dims, mels)
    st = special_tokens(dims.n_vocab)
    seq = st.sot_sequence(lang_index=0, timestamps=True)
    prompt = jnp.tile(jnp.asarray(seq, jnp.int32)[None], (2, 1))
    return dims, params, encoded, st, prompt, len(seq)


def test_cross_kv_stacks_quantized_layout(setup):
    dims, params, encoded, *_ = setup
    dense = _cross_kv_stacks(params, dims, encoded)
    quant = _cross_kv_stacks(params, dims, encoded, kv_dtype="int8")
    assert len(dense) == 2 and len(quant) == 4
    k8, ks, v8, vs = quant
    assert k8.dtype == jnp.int8 and v8.dtype == jnp.int8
    assert ks.dtype == jnp.float32 and vs.dtype == jnp.float32
    assert k8.shape == dense[0].shape
    assert ks.shape == (*dense[0].shape[:-1], 1)  # per-(L, b, s) row scales
    # dequantization error bounded by one quantization step per element
    deq_k = np.asarray(k8, np.float32) * np.asarray(ks)
    ref_k = np.asarray(dense[0], np.float32)
    assert np.all(np.abs(deq_k - ref_k) <= np.asarray(ks) * 0.5 + 1e-7)


def test_unknown_kv_dtype_rejected(setup):
    dims, params, encoded, *_ = setup
    with pytest.raises(ValueError, match="kv_dtype"):
        _cross_kv_stacks(params, dims, encoded, kv_dtype="int4")


def test_int8_kv_matches_dense_token_for_token(setup):
    """Test-scale random weights separate logits far beyond the ~0.7% int8
    perturbation, so the greedy token stream must be identical; a drift here
    means the dequant leaked into the rules/statistics math."""
    dims, params, encoded, st, prompt, n_prompt = setup
    dense = sample_decode(params, dims, encoded, prompt, n_prompt, max_new=12)
    quant = sample_decode(params, dims, encoded, prompt, n_prompt, max_new=12,
                          kv_dtype="int8")
    np.testing.assert_array_equal(np.asarray(dense[0]), np.asarray(quant[0]))
    # statistics stay f32 and close to the dense path's
    assert quant[1].dtype == jnp.float32
    np.testing.assert_allclose(
        np.asarray(dense[1]), np.asarray(quant[1]), rtol=0.1, atol=0.05
    )


def test_int8_kv_composes_with_bf16_compute(setup):
    dims, params, encoded, st, prompt, n_prompt = setup
    tokens, sum_lp, n_text, nsp = sample_decode(
        params, dims, encoded, prompt, n_prompt, max_new=12,
        compute_dtype=jnp.bfloat16, kv_dtype="int8",
    )
    tokens = np.asarray(tokens)
    assert sum_lp.dtype == jnp.float32 and nsp.dtype == jnp.float32
    first = tokens[:, n_prompt]
    ts0 = st.timestamp_begin
    assert (first >= ts0).all() and (first <= ts0 + 50).all()


def test_beam_decode_int8_kv_matches_dense(setup):
    dims, params, encoded, st, prompt, n_prompt = setup
    dense = beam_decode(params, dims, encoded, prompt, n_prompt,
                        max_new=10, beam_size=2)
    quant = beam_decode(params, dims, encoded, prompt, n_prompt,
                        max_new=10, beam_size=2, kv_dtype="int8")
    np.testing.assert_array_equal(np.asarray(dense[0]), np.asarray(quant[0]))


def test_int8_kv_with_start_offset_padded_equals_unpadded(setup):
    """The conditioned-prompt left-crop must be int8-KV-invariant: the crop
    masks the SELF-attention buffer; the cross planes see the same audio."""
    dims, params, encoded, st, prompt, n_prompt = setup
    pad = 3
    padded = jnp.concatenate(
        [jnp.zeros((2, pad), jnp.int32), prompt], axis=1
    )
    start = jnp.full((2,), pad, jnp.int32)
    t_plain = sample_decode(params, dims, encoded, prompt, n_prompt,
                            max_new=8, kv_dtype="int8")[0]
    t_padded = sample_decode(params, dims, encoded, padded, n_prompt + pad,
                             max_new=8, start=start, kv_dtype="int8")[0]
    np.testing.assert_array_equal(
        np.asarray(t_plain)[:, n_prompt:], np.asarray(t_padded)[:, n_prompt + pad:]
    )


def test_kv_dtype_not_on_product_surfaces():
    """The knob is probe-only by decision (measured end-to-end loser): the
    product serving surfaces must NOT grow it back without re-measuring."""
    import inspect

    from freud_tpu.models.whisper.runtime import WhisperRuntime

    assert "kv_dtype" not in inspect.signature(WhisperRuntime.__init__).parameters
