"""K/V-resident attention kernel vs the einsum reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from freud_tpu.ops.attention import whisper_attention

INTERPRET = jax.default_backend() == "cpu"


def _einsum_attention(q, k, v):
    dh = q.shape[-1]
    scale = dh ** -0.25
    logits = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k * scale)
    w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", w, v)


@pytest.mark.parametrize("s", [512, 700, 1500])
def test_kernel_matches_einsum(s):
    rng = np.random.default_rng(0)
    q, k, v = (
        jnp.asarray(rng.standard_normal((2, 3, s, 64)).astype(np.float32) * 0.5)
        for _ in range(3)
    )
    got = np.asarray(whisper_attention(q, k, v, interpret=INTERPRET))
    want = np.asarray(_einsum_attention(q, k, v))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_padding_does_not_leak():
    """Keys beyond the true length must never receive attention mass: feed a
    huge value in what would be the padded region if masking were wrong."""
    rng = np.random.default_rng(1)
    s = 700  # pads to 1024 internally
    q = jnp.asarray(rng.standard_normal((1, 1, s, 64)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((1, 1, s, 64)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((1, 1, s, 64)).astype(np.float32))
    out1 = np.asarray(whisper_attention(q, k, v, interpret=INTERPRET))
    want = np.asarray(_einsum_attention(q, k, v))
    np.testing.assert_allclose(out1, want, atol=2e-5, rtol=1e-4)
