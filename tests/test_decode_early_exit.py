"""Early-exit generation loop (decoding._sample_decode_impl's while_loop).

``sample_decode`` stops as soon as every sequence in the batch has emitted
EOT instead of walking the full ``max_new`` budget. The fixed-shape output
contract must be indistinguishable from running all steps: positions after
the exit stay EOT (the buffer init — exactly what finished rows' masked
steps would have written) and every statistic freezes at its EOT value.
These tests drive the loop with a stubbed ``_decode_step`` emitting a known
script (timestamp → text → EOT forever), which makes the exit fire ~220
steps before the budget while every assertion below still holds.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from freud_tpu.models.whisper import decoding
from freud_tpu.models.whisper import dims_for, init_params, special_tokens

TEXT_TOK = 100


@pytest.fixture()
def scripted_decode_step(monkeypatch):
    """Replace _decode_step with a pos-scripted logit emitter; the jitted
    impl caches the real step, so the cache is cleared around the patch."""
    dims = dims_for("test:tiny")
    st = special_tokens(dims.n_vocab)
    ts0 = st.timestamp_begin

    def stub(params, dims_, token, pos, self_k, self_v, cross_kv, start=None,
             **tap_kwargs):
        b = token.shape[0]
        fav = jnp.where(
            pos < 3, ts0 + 5, jnp.where(pos == 3, TEXT_TOK, st.eot)
        )
        logits = jnp.full((b, dims.n_vocab), -10.0, jnp.float32)
        logits = logits.at[:, fav].set(30.0)
        return logits, self_k, self_v

    decoding._sample_decode_impl.clear_cache()
    monkeypatch.setattr(decoding, "_decode_step", stub)
    yield dims, st
    decoding._sample_decode_impl.clear_cache()


def test_early_exit_output_contract(scripted_decode_step):
    dims, st = scripted_decode_step
    params = init_params(dims, seed=0)
    rng = np.random.default_rng(0)
    encoded = jnp.asarray(
        rng.standard_normal((2, 1500, dims.n_audio_state)).astype(np.float32)
    )
    seq = st.sot_sequence(lang_index=0, timestamps=True)
    n_prompt = len(seq)
    assert n_prompt == 3  # the stub's script is keyed to this
    prompt = jnp.tile(jnp.asarray(seq, jnp.int32)[None], (2, 1))

    tokens, sum_lp, n_text, nsp = decoding.sample_decode(
        params, dims, encoded, prompt, n_prompt, max_new=224
    )
    tokens = np.asarray(tokens)
    assert tokens.shape == (2, n_prompt + 224)
    # the scripted generation: <ts0+5> <text> <eot>, then EOT-padding only
    assert (tokens[:, n_prompt] == st.timestamp_begin + 5).all()
    assert (tokens[:, n_prompt + 1] == TEXT_TOK).all()
    assert (tokens[:, n_prompt + 2:] == st.eot).all()
    # statistics freeze at EOT: two non-EOT tokens, three scored samples
    assert (np.asarray(n_text) == 2).all()
    assert np.isfinite(np.asarray(sum_lp)).all()
    # the favored token's post-rules logprob is ~0; 3 live samples ≈ 0 total
    assert (np.asarray(sum_lp) > -1.0).all()


def test_early_exit_prefix_matches_small_budget(scripted_decode_step):
    """A 224-budget decode (exits after ~3 steps) and an 8-budget decode
    agree token-for-token on the shared prefix and on every statistic."""
    dims, st = scripted_decode_step
    params = init_params(dims, seed=0)
    rng = np.random.default_rng(1)
    encoded = jnp.asarray(
        rng.standard_normal((1, 1500, dims.n_audio_state)).astype(np.float32)
    )
    seq = st.sot_sequence(lang_index=0, timestamps=True)
    prompt = jnp.tile(jnp.asarray(seq, jnp.int32)[None], (1, 1))

    big = decoding.sample_decode(params, dims, encoded, prompt, len(seq),
                                 max_new=224)
    small = decoding.sample_decode(params, dims, encoded, prompt, len(seq),
                                   max_new=8)
    nb = np.asarray(small[0]).shape[1]
    np.testing.assert_array_equal(np.asarray(big[0])[:, :nb],
                                  np.asarray(small[0]))
    for i in (1, 2, 3):
        np.testing.assert_allclose(np.asarray(big[i]), np.asarray(small[i]),
                                   rtol=1e-6)


def test_fixed_budget_equals_early_exit(scripted_decode_step):
    """early_exit=False (the benchmark's budget-calibrated serving mode)
    runs every step but must return bit-identical outputs: post-EOT steps
    write EOT and every statistic is masked frozen."""
    dims, st = scripted_decode_step
    params = init_params(dims, seed=0)
    rng = np.random.default_rng(2)
    encoded = jnp.asarray(
        rng.standard_normal((2, 1500, dims.n_audio_state)).astype(np.float32)
    )
    seq = st.sot_sequence(lang_index=0, timestamps=True)
    prompt = jnp.tile(jnp.asarray(seq, jnp.int32)[None], (2, 1))

    fast = decoding.sample_decode(params, dims, encoded, prompt, len(seq),
                                  max_new=32)
    full = decoding.sample_decode(params, dims, encoded, prompt, len(seq),
                                  max_new=32, early_exit=False)
    for i in range(4):
        np.testing.assert_array_equal(np.asarray(fast[i]),
                                      np.asarray(full[i]))
