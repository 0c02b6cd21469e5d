"""Beam search / temperature sampling / fallback schedule (random weights).

Reference line: the FREUD GUI paths call plain greedy ``model.decode``
(src/models/hooked_model.py:103-110); beam + temperature fallback mirror
whisper's DecodingOptions(beam_size=…) and transcribe.py's
``decode_with_fallback`` — the beyond-parity decode surface.
"""

import numpy as np
import pytest

from freud_tpu.models.whisper import dims_for, encoder_forward, init_params, special_tokens
from freud_tpu.models.whisper.decoding import beam_decode, greedy_decode, sample_decode

MAX_NEW = 16


@pytest.fixture(scope="module")
def setup():
    import jax.numpy as jnp

    dims = dims_for("test:tiny")
    params = init_params(dims, seed=3)
    mels = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 80, 3000)).astype(np.float32)
    )
    encoded, _ = encoder_forward(params, dims, mels)
    st = special_tokens(dims.n_vocab)
    prompt = jnp.asarray(
        np.tile([st.sot, st.lang_base, st.transcribe], (2, 1)).astype(np.int32)
    )
    return params, dims, encoded, prompt, st


def test_beam_one_equals_greedy(setup):
    """beam_size=1 must reduce exactly to greedy argmax decoding."""
    params, dims, encoded, prompt, st = setup
    greedy = np.asarray(
        greedy_decode(params, dims, encoded, prompt, 3, max_new=MAX_NEW))
    beam, _, _, nsp = beam_decode(
        params, dims, encoded, prompt, 3, max_new=MAX_NEW, beam_size=1)
    np.testing.assert_array_equal(np.asarray(beam), greedy)
    nsp = np.asarray(nsp)
    assert ((0.0 <= nsp) & (nsp <= 1.0)).all()


def test_beam_obeys_decoding_rules(setup):
    """Beam output must honor the same EOT-padding / monotonic-timestamp /
    suppression rules as greedy, and the ranking stats must be consistent."""
    params, dims, encoded, prompt, st = setup
    tokens, sum_lp, n_text, _ = beam_decode(
        params, dims, encoded, prompt, 3, max_new=MAX_NEW, beam_size=3)
    tokens = np.asarray(tokens)
    assert tokens.shape == (2, 3 + MAX_NEW)
    np.testing.assert_array_equal(tokens[:, :3], np.asarray(prompt))
    for row, slp, nt in zip(tokens, np.asarray(sum_lp), np.asarray(n_text)):
        gen = row[3:]
        ts = [int(t) for t in gen if t >= st.timestamp_begin]
        assert ts == sorted(ts)
        if st.eot in gen:
            tail = gen[list(gen).index(st.eot):]
            assert all(t == st.eot for t in tail)
        for banned in (st.sot, st.sot_prev, st.no_speech, st.no_timestamps):
            assert not (gen == banned).any()
        assert slp <= 1e-5 and np.isfinite(slp)
        assert 0 <= nt <= MAX_NEW


def test_sampled_decode_statistics(setup):
    """t=0 sample_decode == greedy (same program); t>0 yields valid tokens
    and a finite sum-logprob over the sampled prefix."""
    import jax

    params, dims, encoded, prompt, st = setup
    tok0, slp0, nt0, nsp0 = sample_decode(
        params, dims, encoded, prompt, 3, max_new=MAX_NEW, temperature=0.0)
    greedy = greedy_decode(params, dims, encoded, prompt, 3, max_new=MAX_NEW)
    np.testing.assert_array_equal(np.asarray(tok0), np.asarray(greedy))
    nsp0 = np.asarray(nsp0)
    assert ((0.0 <= nsp0) & (nsp0 <= 1.0)).all()

    tok1, slp1, nt1, _ = sample_decode(
        params, dims, encoded, prompt, 3, max_new=MAX_NEW, temperature=0.8,
        key=jax.random.PRNGKey(7))
    tok1 = np.asarray(tok1)
    assert tok1.shape == np.asarray(tok0).shape
    assert np.isfinite(np.asarray(slp1)).all()
    for row in tok1:
        gen = row[3:]
        if st.eot in gen:
            tail = gen[list(gen).index(st.eot):]
            assert all(t == st.eot for t in tail)


def test_beam_left_padded_prompt_with_start_equals_unpadded(setup):
    """beam_decode's ``start`` offset must be exact, mirroring
    test_long_audio.py's sample_decode equality: a left-padded prompt buffer
    with a start offset decodes to identical tokens/statistics as the
    unpadded prompt — the property that lets beam search compose with
    condition_on_previous_text / initial_prompt."""
    import jax.numpy as jnp

    params, dims, encoded, prompt, st = setup
    base = [st.sot_prev, 100, 101, st.sot, st.lang_base, st.transcribe]
    plain = np.tile(np.asarray(base, np.int32), (2, 1))
    tok_a, lp_a, nt_a, nsp_a = beam_decode(
        params, dims, encoded, jnp.asarray(plain), len(base),
        max_new=10, beam_size=3)

    pad_n = 5
    padded = np.tile(
        np.asarray([st.sot_prev] * pad_n + base, np.int32), (2, 1))
    start = jnp.asarray(np.full((2,), pad_n, np.int32))
    tok_b, lp_b, nt_b, nsp_b = beam_decode(
        params, dims, encoded, jnp.asarray(padded), len(base) + pad_n,
        max_new=10, beam_size=3, start=start)

    np.testing.assert_array_equal(np.asarray(tok_a),
                                  np.asarray(tok_b)[:, pad_n:])
    np.testing.assert_allclose(np.asarray(lp_a), np.asarray(lp_b),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(nt_a), np.asarray(nt_b))
    np.testing.assert_allclose(np.asarray(nsp_a), np.asarray(nsp_b),
                               rtol=1e-5, atol=1e-7)


def test_runtime_fallback_schedule():
    """Permissive thresholds accept the t=0 transcript (== plain transcribe);
    impossible thresholds walk the whole schedule and still return text."""
    from freud_tpu.models.whisper.runtime import WhisperRuntime

    rt = WhisperRuntime("test:tiny", max_new_tokens=8, language="en")
    mels = np.random.default_rng(1).standard_normal((1, 80, 3000)).astype(np.float32)

    plain = rt.transcribe(mels)
    easy = rt.transcribe_with_fallback(
        mels, compression_ratio_threshold=None, logprob_threshold=None)
    assert easy == plain

    hard = rt.transcribe_with_fallback(
        mels, temperatures=(0.0, 1.0), logprob_threshold=10.0,
        compression_ratio_threshold=None)
    assert len(hard) == 1 and isinstance(hard[0], str)
