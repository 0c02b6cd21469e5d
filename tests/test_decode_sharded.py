"""Data-parallel transcription serving: batch-sharded decode over the mesh.

Serving scales by chips (docs/TRANSCRIPTION.md): the whole
encode→rules→while_loop decode runs under one jit with the mel batch
sharded over the ``data`` axis — XLA turns the early-exit loop's
``all(finished)`` into a cross-chip reduction, everything else is
embarrassingly parallel. These tests pin sharded ≡ single-device on the
8-virtual-device CPU mesh, the same contract the collection and search
paths carry.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from freud_tpu.models.whisper import (
    dims_for,
    encoder_forward,
    init_params,
    special_tokens,
)
from freud_tpu.models.whisper.decoding import sample_decode
from freud_tpu.parallel.mesh import batch_sharding, make_mesh, replicated


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multiple devices")
def test_sharded_decode_matches_single_device():
    dims = dims_for("test:tiny")
    params = init_params(dims, seed=3)
    st = special_tokens(dims.n_vocab)
    rng = np.random.default_rng(0)
    batch = 8
    mels_h = rng.standard_normal(
        (batch, dims.n_mels, 3000)).astype(np.float32) * 0.3
    seq = st.sot_sequence(lang_index=0, timestamps=True)
    prompt_h = np.tile(np.asarray(seq, np.int32)[None], (batch, 1))

    def pipeline(params, mels, prompt):
        encoded, _ = encoder_forward(params, dims, mels)
        return sample_decode(params, dims, encoded, prompt, len(seq),
                             max_new=12)

    # single-device
    t0, lp0, nt0, nsp0 = jax.jit(pipeline)(
        params, jnp.asarray(mels_h), jnp.asarray(prompt_h)
    )

    # batch sharded over the data axis
    mesh = make_mesh()
    params_r = jax.device_put(params, replicated(mesh))
    mels_s = jax.device_put(mels_h, batch_sharding(mesh, 3))
    prompt_s = jax.device_put(prompt_h, batch_sharding(mesh, 2))
    t1, lp1, nt1, nsp1 = jax.jit(pipeline)(params_r, mels_s, prompt_s)
    assert len(t1.sharding.device_set) > 1, "decode output should stay sharded"

    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
    np.testing.assert_allclose(np.asarray(lp0), np.asarray(lp1),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(nt0), np.asarray(nt1))
    np.testing.assert_allclose(np.asarray(nsp0), np.asarray(nsp1),
                               rtol=1e-5, atol=1e-7)
