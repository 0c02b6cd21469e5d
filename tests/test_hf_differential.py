"""Cross-implementation differential vs HuggingFace-transformers Whisper.

The FREUD reference's whisper math is openai-whisper's torch model
(src/models/hooked_model.py:166-176); that package isn't installed here and
real checkpoints are asset-gated (tests/test_real_weights_parity.py). The
transformers WhisperModel implements the identical architecture — conv1/conv2
frontend, pre-LN residual blocks, split-scale attention, learned decoder
positions — so transplanting one random-initialized torch model's weights
into our functional pytree and comparing activations pins our whole compute
graph (encoder AND the teacher-forced decoder pass that backs decoder-layer
activation capture) against an independent torch implementation, with no
downloaded assets.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from freud_tpu.models.whisper.config import WhisperDims
from freud_tpu.models.whisper.load import params_from_hf_state_dict
from freud_tpu.models.whisper.model import decoder_forward, encoder_forward

DIMS = WhisperDims(
    n_mels=80,
    n_audio_ctx=50,
    n_audio_state=64,
    n_audio_head=2,
    n_audio_layer=2,
    n_vocab=120,
    n_text_ctx=16,
    n_text_state=64,
    n_text_head=2,
    n_text_layer=2,
)


@pytest.fixture(scope="module")
def hf_model():
    cfg = transformers.WhisperConfig(
        vocab_size=DIMS.n_vocab,
        num_mel_bins=DIMS.n_mels,
        d_model=DIMS.n_audio_state,
        encoder_layers=DIMS.n_audio_layer,
        encoder_attention_heads=DIMS.n_audio_head,
        decoder_layers=DIMS.n_text_layer,
        decoder_attention_heads=DIMS.n_text_head,
        encoder_ffn_dim=4 * DIMS.n_audio_state,
        decoder_ffn_dim=4 * DIMS.n_text_state,
        max_source_positions=DIMS.n_audio_ctx,
        max_target_positions=DIMS.n_text_ctx,
        activation_function="gelu",
        pad_token_id=0,
        bos_token_id=1,
        eos_token_id=2,
        decoder_start_token_id=3,
        dropout=0.0,
        attention_dropout=0.0,
        activation_dropout=0.0,
    )
    torch.manual_seed(0)
    model = transformers.WhisperModel(cfg).eval()
    return model


@pytest.fixture(scope="module")
def transplanted(hf_model):
    sd = {k: v.detach().numpy() for k, v in hf_model.state_dict().items()}
    return params_from_hf_state_dict(sd, DIMS)


@pytest.fixture(scope="module")
def inputs():
    rng = np.random.default_rng(7)
    # mel frames = 2 * max_source_positions (conv2's stride-2 halving)
    mels = rng.standard_normal((2, DIMS.n_mels, 2 * DIMS.n_audio_ctx)).astype(
        np.float32
    )
    tokens = rng.integers(0, DIMS.n_vocab, size=(2, 9)).astype(np.int64)
    return mels, tokens


def test_encoder_matches_hf(hf_model, transplanted, inputs):
    """Final encoder output AND the per-block capture our collection path
    stores both match torch."""
    mels, _ = inputs
    with torch.no_grad():
        hf = hf_model.encoder(
            input_features=torch.from_numpy(mels), output_hidden_states=True
        )
    encoded, caps = encoder_forward(
        transplanted, DIMS, mels, capture=("encoder.blocks.0",)
    )
    np.testing.assert_allclose(
        np.asarray(encoded), hf.last_hidden_state.numpy(), atol=2e-4, rtol=2e-4
    )
    # hidden_states[i+1] is block i's raw output for i < n_layers-1 (the last
    # entry is post-final-layernorm)
    np.testing.assert_allclose(
        np.asarray(caps["encoder.blocks.0"]),
        hf.hidden_states[1].numpy(),
        atol=2e-4,
        rtol=2e-4,
    )


def test_decoder_capture_matches_hf(hf_model, transplanted, inputs):
    """The teacher-forced decoder pass behind decoder-layer activation
    capture (runtime.py activations() for ``decoder.*`` names) matches a
    torch WhisperDecoder forward at every position, and the logits match
    the tied-embedding projection."""
    mels, tokens = inputs
    with torch.no_grad():
        hf = hf_model(
            input_features=torch.from_numpy(mels),
            decoder_input_ids=torch.from_numpy(tokens),
            output_hidden_states=True,
        )
    encoded, _ = encoder_forward(transplanted, DIMS, mels)
    logits, caps = decoder_forward(
        transplanted,
        DIMS,
        tokens,
        encoded,
        capture=("decoder.blocks.0", "decoder.blocks.1"),
    )
    np.testing.assert_allclose(
        np.asarray(caps["decoder.blocks.0"]),
        hf.decoder_hidden_states[1].numpy(),
        atol=2e-4,
        rtol=2e-4,
    )
    # the tied projection folds the post-LN state; comparing logits pins the
    # last block + final layer-norm in one shot
    hf_logits = hf.last_hidden_state.numpy() @ (
        hf_model.decoder.embed_tokens.weight.detach().numpy().T
    )
    np.testing.assert_allclose(
        np.asarray(logits), hf_logits, atol=2e-3, rtol=2e-3
    )


def test_substituted_decoder_matches_hf_spliced(hf_model, transplanted, inputs):
    """Substituting a decoder block's output mid-forward produces the same
    downstream logits as hand-splicing that tensor into the torch decoder
    (what the reference's substituted-forward hook does for any module,
    hooked_model.py:58-69)."""
    mels, tokens = inputs
    encoded, _ = encoder_forward(transplanted, DIMS, mels)
    _, caps = decoder_forward(
        transplanted, DIMS, tokens, encoded, capture=("decoder.blocks.0",)
    )
    fake = np.asarray(caps["decoder.blocks.0"]) * 0.5 + 0.1
    ours, _ = decoder_forward(
        transplanted,
        DIMS,
        tokens,
        encoded,
        substitute={"decoder.blocks.0": fake},
    )

    # torch side: run block 1 + final LN on the substituted tensor directly
    with torch.no_grad():
        hf_enc = hf_model.encoder(input_features=torch.from_numpy(mels))
        x = torch.from_numpy(fake)
        T = tokens.shape[1]
        causal = torch.full((T, T), float("-inf")).triu(1)[None, None]
        (x,) = hf_model.decoder.layers[1](
            x,
            attention_mask=causal,
            encoder_hidden_states=hf_enc.last_hidden_state,
        )[:1]
        x = hf_model.decoder.layer_norm(x)
        hf_logits = x.numpy() @ (
            hf_model.decoder.embed_tokens.weight.detach().numpy().T
        )
    np.testing.assert_allclose(np.asarray(ours), hf_logits, atol=2e-3, rtol=2e-3)
