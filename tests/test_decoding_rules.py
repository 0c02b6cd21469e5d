"""Structural checks of the timestamp decoding rules (random weights)."""

import numpy as np
import pytest

from freud_tpu.models.whisper import dims_for, encoder_forward, init_params, special_tokens
from freud_tpu.models.whisper.decoding import greedy_decode


@pytest.fixture(scope="module")
def decoded():
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
    tokens = np.asarray(greedy_decode(params, dims, encoded, prompt, 3, max_new=24))
    return tokens, st


def test_timestamps_monotonic_and_paired(decoded):
    tokens, st = decoded
    for row in tokens:
        gen = row[3:]
        ts = [int(t) for t in gen if t >= st.timestamp_begin]
        # monotonic non-decreasing timestamps
        assert ts == sorted(ts)
        # no unfinished text after EOT
        if st.eot in gen:
            tail = gen[list(gen).index(st.eot):]
            assert all(t == st.eot for t in tail)


def test_first_token_is_timestamp_within_initial_cap(decoded):
    """whisper's ApplyTimestampRules forces the FIRST sampled token to be a
    timestamp, capped at max_initial_timestamp (1.0 s → +50)."""
    tokens, st = decoded
    first = tokens[:, 3]
    for t in first:
        assert st.timestamp_begin <= t <= st.timestamp_begin + 50


def test_no_suppressed_specials(decoded):
    tokens, st = decoded
    gen = tokens[:, 3:]
    for banned in (st.sot, st.sot_prev, st.no_speech, st.no_timestamps):
        assert not (gen == banned).any()


def test_second_sampled_token_is_text():
    """whisper ApplyTimestampRules: penultimate_was_timestamp is True while
    fewer than two tokens are sampled, so the token right after the forced
    initial timestamp must be TEXT (or EOT), never a second timestamp —
    decodes must not open with a zero-length '<ts><ts>' segment."""
    import jax.numpy as jnp
    from freud_tpu.models.whisper import (dims_for, encoder_forward,
                                          init_params, special_tokens)
    from freud_tpu.models.whisper.decoding import greedy_decode

    dims = dims_for("test:tiny")
    st = special_tokens(dims.n_vocab)
    for seed in (0, 1, 2, 5):
        params = init_params(dims, seed=seed)
        mels = np.random.default_rng(seed).standard_normal(
            (2, 80, 3000)).astype(np.float32)
        encoded, _ = encoder_forward(params, dims, jnp.asarray(mels))
        prompt = jnp.asarray(np.tile(
            [st.sot, st.lang_base, st.transcribe], (2, 1)).astype(np.int32))
        tokens = np.asarray(greedy_decode(
            params, dims, encoded, prompt, 3, max_new=8))
        first, second = tokens[:, 3], tokens[:, 4]
        assert (first >= st.timestamp_begin).all()  # forced initial ts
        assert (second < st.timestamp_begin).all(), (
            f"seed {seed}: second sampled token is a timestamp: {second}")
