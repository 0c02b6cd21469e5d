"""Serving-precision (bfloat16) decode path.

``compute_dtype=bfloat16`` on the decoders halves the HBM traffic that bounds
per-token decode cost (cross K/V planes + decoder weights are re-read every
generated token — see ``decoding._cast_decode_inputs``). These tests pin the
contract: any encoder/decoder dtype combination runs (the cast helper
harmonizes ``encoded`` with the decode weights so the self-attention ring
buffers never see mixed dtypes), rules/statistics stay f32, and the sampled
token stream obeys the same whisper rules as the f32 path.
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
from freud_tpu.models.whisper.decoding import beam_decode, sample_decode


@pytest.fixture(scope="module")
def setup():
    dims = dims_for("test:tiny")
    params = init_params(dims, seed=3)
    rng = np.random.default_rng(0)
    mels = jnp.asarray(
        rng.standard_normal((2, dims.n_mels, 3000)).astype(np.float32) * 0.3
    )
    st = special_tokens(dims.n_vocab)
    seq = st.sot_sequence(lang_index=0, timestamps=True)
    prompt = jnp.tile(jnp.asarray(seq, jnp.int32)[None], (2, 1))
    return dims, params, mels, st, prompt, len(seq)


@pytest.mark.parametrize(
    "enc_dt,dec_dt",
    [
        (jnp.float32, jnp.bfloat16),
        (jnp.bfloat16, jnp.bfloat16),
        # bf16-encoded + f32 decode: the harmonizing cast must upcast
        # ``encoded`` or the KV ring-buffer update gets mixed dtypes
        (jnp.bfloat16, jnp.float32),
    ],
)
def test_sample_decode_dtype_combinations(setup, enc_dt, dec_dt):
    dims, params, mels, st, prompt, n_prompt = setup
    encoded, _ = encoder_forward(params, dims, mels, compute_dtype=enc_dt)
    tokens, sum_lp, n_text, nsp = sample_decode(
        params, dims, encoded, prompt, n_prompt, max_new=16,
        compute_dtype=dec_dt,
    )
    tokens = np.asarray(tokens)
    # statistics stay f32 regardless of compute precision
    assert sum_lp.dtype == jnp.float32
    assert nsp.dtype == jnp.float32
    assert np.isfinite(np.asarray(sum_lp)).all()
    assert (np.asarray(nsp) >= 0).all() and (np.asarray(nsp) <= 1).all()
    # the whisper rules apply in reduced precision too: first sampled token
    # is a timestamp within the max_initial cap
    first = tokens[:, n_prompt]
    ts0 = st.timestamp_begin
    assert (first >= ts0).all() and (first <= ts0 + 50).all()


def test_bf16_matches_f32_token_for_token_on_separated_logits(setup):
    """With test-scale random weights the logit gaps are far above bf16
    rounding, so greedy bf16 must reproduce the f32 token stream exactly;
    a drift here means the cast leaked into the rules/argmax math."""
    dims, params, mels, st, prompt, n_prompt = setup
    encoded32, _ = encoder_forward(params, dims, mels)
    t32 = np.asarray(
        sample_decode(params, dims, encoded32, prompt, n_prompt, max_new=12)[0]
    )
    encoded16, _ = encoder_forward(
        params, dims, mels, compute_dtype=jnp.bfloat16
    )
    t16 = np.asarray(
        sample_decode(params, dims, encoded16, prompt, n_prompt, max_new=12,
                      compute_dtype=jnp.bfloat16)[0]
    )
    agree = (t32 == t16).mean()
    assert agree >= 0.75, f"bf16 decode diverged from f32: agreement {agree}"


def test_beam_decode_bf16(setup):
    dims, params, mels, st, prompt, n_prompt = setup
    encoded, _ = encoder_forward(
        params, dims, mels, compute_dtype=jnp.bfloat16
    )
    tokens, sum_lp, n_text, nsp = beam_decode(
        params, dims, encoded, prompt, n_prompt, max_new=8, beam_size=2,
        compute_dtype=jnp.bfloat16,
    )
    assert sum_lp.dtype == jnp.float32
    assert np.isfinite(np.asarray(sum_lp)).all()
    assert np.asarray(tokens).shape == (2, n_prompt + 8)


def test_runtime_bf16_transcribe():
    """End-to-end: a bfloat16 runtime transcribes (encoder AND decoder in
    bf16 — before compute_dtype threaded into the decoders this path died on
    a KV-buffer dtype mismatch)."""
    from freud_tpu.models.whisper.runtime import init_runtime

    rt = init_runtime("test:tiny", compute_dtype=jnp.bfloat16,
                      max_new_tokens=8)
    rng = np.random.default_rng(1)
    mels = jnp.asarray(
        rng.standard_normal((1, rt.dims.n_mels, 3000)).astype(np.float32) * 0.3
    )
    texts = rt.transcribe(mels)
    assert len(texts) == 1 and isinstance(texts[0], str)
