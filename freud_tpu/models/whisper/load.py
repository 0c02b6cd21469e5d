"""Whisper weight resolution and loading.

The reference gets weights through ``whisper.load_model(name)`` (downloads an
OpenAI ``.pt`` checkpoint; src/models/hooked_model.py:166-176). This loader
reads the same ``.pt`` format from disk (no network in this environment),
converts to the functional-JAX parameter pytree of
freud_tpu.models.whisper.model, and also accepts ``random:NAME`` /
``test:NAME`` pseudo-models (seeded random init) so pipelines, tests and
benchmarks run without pretrained assets.
"""

from __future__ import annotations

import os
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from .config import MODEL_DIMS, WhisperDims, dims_for
from .model import Params, init_params, sinusoids

_SEARCH_ENV = "FREUD_WHISPER_DIR"
_DEFAULT_DIRS = ("~/.cache/whisper", "~/.cache/freud_tpu/whisper")


def find_checkpoint(name: str) -> Path | None:
    dirs = []
    if os.environ.get(_SEARCH_ENV):
        dirs.append(os.environ[_SEARCH_ENV])
    dirs.extend(_DEFAULT_DIRS)
    for d in dirs:
        p = Path(d).expanduser() / f"{name}.pt"
        if p.exists():
            return p
    return None


def _t(x) -> jnp.ndarray:
    return jnp.asarray(np.asarray(x, dtype=np.float32))


def _linear_from(sd, key):
    p = {"w": _t(sd[f"{key}.weight"]).T}
    if f"{key}.bias" in sd:
        p["b"] = _t(sd[f"{key}.bias"])
    return p


def _ln_from(sd, key):
    return {"g": _t(sd[f"{key}.weight"]), "b": _t(sd[f"{key}.bias"])}


def _block_from(sd, prefix, cross: bool):
    p = {
        "attn_ln": _ln_from(sd, f"{prefix}.attn_ln"),
        "attn": {
            "q": _linear_from(sd, f"{prefix}.attn.query"),
            "k": _linear_from(sd, f"{prefix}.attn.key"),
            "v": _linear_from(sd, f"{prefix}.attn.value"),
            "out": _linear_from(sd, f"{prefix}.attn.out"),
        },
        "mlp_ln": _ln_from(sd, f"{prefix}.mlp_ln"),
        "mlp": {
            "fc1": _linear_from(sd, f"{prefix}.mlp.0"),
            "fc2": _linear_from(sd, f"{prefix}.mlp.2"),
        },
    }
    if cross:
        p["cross_attn_ln"] = _ln_from(sd, f"{prefix}.cross_attn_ln")
        p["cross_attn"] = {
            "q": _linear_from(sd, f"{prefix}.cross_attn.query"),
            "k": _linear_from(sd, f"{prefix}.cross_attn.key"),
            "v": _linear_from(sd, f"{prefix}.cross_attn.value"),
            "out": _linear_from(sd, f"{prefix}.cross_attn.out"),
        }
    return p


def params_from_openai_state_dict(sd: dict, dims: WhisperDims) -> Params:
    """Convert an OpenAI-format Whisper state dict to our parameter pytree."""
    encoder = {
        # torch Conv1d weight is (out, in, k); our layout is (k, in, out).
        "conv1": {
            "w": _t(sd["encoder.conv1.weight"]).transpose(2, 1, 0),
            "b": _t(sd["encoder.conv1.bias"]),
        },
        "conv2": {
            "w": _t(sd["encoder.conv2.weight"]).transpose(2, 1, 0),
            "b": _t(sd["encoder.conv2.bias"]),
        },
        "pos": (
            _t(sd["encoder.positional_embedding"])
            if "encoder.positional_embedding" in sd
            else jnp.asarray(sinusoids(dims.n_audio_ctx, dims.n_audio_state))
        ),
        "blocks": [
            _block_from(sd, f"encoder.blocks.{i}", cross=False)
            for i in range(dims.n_audio_layer)
        ],
        "ln_post": _ln_from(sd, "encoder.ln_post"),
    }
    decoder = {
        "tok_emb": _t(sd["decoder.token_embedding.weight"]),
        "pos": _t(sd["decoder.positional_embedding"]),
        "blocks": [
            _block_from(sd, f"decoder.blocks.{i}", cross=True)
            for i in range(dims.n_text_layer)
        ],
        "ln": _ln_from(sd, "decoder.ln"),
    }
    return {"encoder": encoder, "decoder": decoder}


# HF per-layer tensors share the torch Linear/LayerNorm layout — the OpenAI
# helpers above apply verbatim
_hf_linear = _linear_from
_hf_ln = _ln_from


def _hf_block(sd, prefix, cross: bool):
    p = {
        "attn_ln": _hf_ln(sd, f"{prefix}.self_attn_layer_norm"),
        "attn": {
            "q": _hf_linear(sd, f"{prefix}.self_attn.q_proj"),
            "k": _hf_linear(sd, f"{prefix}.self_attn.k_proj"),
            "v": _hf_linear(sd, f"{prefix}.self_attn.v_proj"),
            "out": _hf_linear(sd, f"{prefix}.self_attn.out_proj"),
        },
        "mlp_ln": _hf_ln(sd, f"{prefix}.final_layer_norm"),
        "mlp": {
            "fc1": _hf_linear(sd, f"{prefix}.fc1"),
            "fc2": _hf_linear(sd, f"{prefix}.fc2"),
        },
    }
    if cross:
        p["cross_attn_ln"] = _hf_ln(sd, f"{prefix}.encoder_attn_layer_norm")
        p["cross_attn"] = {
            "q": _hf_linear(sd, f"{prefix}.encoder_attn.q_proj"),
            "k": _hf_linear(sd, f"{prefix}.encoder_attn.k_proj"),
            "v": _hf_linear(sd, f"{prefix}.encoder_attn.v_proj"),
            "out": _hf_linear(sd, f"{prefix}.encoder_attn.out_proj"),
        }
    return p


def params_from_hf_state_dict(sd: dict, dims: WhisperDims) -> Params:
    """Convert a HuggingFace-transformers Whisper state dict to our pytree."""
    enc, dec = "model.encoder", "model.decoder"
    if f"{enc}.conv1.weight" not in sd and "encoder.conv1.weight" in sd:
        enc, dec = "encoder", "decoder"
    encoder = {
        "conv1": {
            "w": _t(sd[f"{enc}.conv1.weight"]).transpose(2, 1, 0),
            "b": _t(sd[f"{enc}.conv1.bias"]),
        },
        "conv2": {
            "w": _t(sd[f"{enc}.conv2.weight"]).transpose(2, 1, 0),
            "b": _t(sd[f"{enc}.conv2.bias"]),
        },
        "pos": _t(sd[f"{enc}.embed_positions.weight"]),
        "blocks": [
            _hf_block(sd, f"{enc}.layers.{i}", cross=False)
            for i in range(dims.n_audio_layer)
        ],
        "ln_post": _hf_ln(sd, f"{enc}.layer_norm"),
    }
    decoder = {
        "tok_emb": _t(sd[f"{dec}.embed_tokens.weight"]),
        "pos": _t(sd[f"{dec}.embed_positions.weight"]),
        "blocks": [
            _hf_block(sd, f"{dec}.layers.{i}", cross=True)
            for i in range(dims.n_text_layer)
        ],
        "ln": _hf_ln(sd, f"{dec}.layer_norm"),
    }
    return {"encoder": encoder, "decoder": decoder}


def load_hf_dir(path: Path) -> tuple[Params, WhisperDims]:
    """Load a local HuggingFace Whisper checkpoint directory
    (config.json + model.safetensors / pytorch_model.bin)."""
    import json

    with open(path / "config.json") as f:
        hf_cfg = json.load(f)
    dims = WhisperDims(
        n_mels=hf_cfg["num_mel_bins"],
        n_audio_ctx=hf_cfg.get("max_source_positions", 1500),
        n_audio_state=hf_cfg["d_model"],
        n_audio_head=hf_cfg["encoder_attention_heads"],
        n_audio_layer=hf_cfg["encoder_layers"],
        n_vocab=hf_cfg["vocab_size"],
        n_text_ctx=hf_cfg.get("max_target_positions", 448),
        n_text_state=hf_cfg["d_model"],
        n_text_head=hf_cfg["decoder_attention_heads"],
        n_text_layer=hf_cfg["decoder_layers"],
    )
    st_path = path / "model.safetensors"
    if st_path.exists():
        from safetensors.numpy import load_file

        sd = load_file(st_path)
    else:
        import torch

        sd = {
            k: v.numpy()
            for k, v in torch.load(
                path / "pytorch_model.bin", map_location="cpu", weights_only=True
            ).items()
        }
    return params_from_hf_state_dict(sd, dims), dims


def load_model(name: str) -> tuple[Params, WhisperDims]:
    """Resolve a model name to (params, dims).

    ``random:NAME`` / ``test:NAME`` → seeded random init with NAME's geometry
    (test: shrinks to 2 layers). A path to a HuggingFace checkpoint directory
    loads that. A bare name loads the OpenAI ``.pt`` checkpoint from
    $FREUD_WHISPER_DIR or ~/.cache/whisper.
    """
    if name.startswith(("random:", "test:")):
        dims = dims_for(name)
        return init_params(dims, seed=0), dims

    as_path = Path(name).expanduser()
    if as_path.is_dir() and (as_path / "config.json").exists():
        return load_hf_dir(as_path)

    if name not in MODEL_DIMS:
        raise ValueError(f"Unknown whisper model: {name!r}")
    path = find_checkpoint(name)
    if path is None:
        raise FileNotFoundError(
            f"No checkpoint for whisper model {name!r}. Place {name}.pt under "
            f"${_SEARCH_ENV} or ~/.cache/whisper, or use 'random:{name}' for "
            "seeded random weights."
        )
    import torch  # CPU-only torch used purely as a .pt reader

    # weights_only: the OpenAI layout is a plain {dims dict, tensor state
    # dict} — full unpickling would execute arbitrary code from a tampered
    # checkpoint file
    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    dims_dict = ckpt["dims"]
    dims = WhisperDims(**{k: dims_dict[k] for k in WhisperDims.__dataclass_fields__ if k in dims_dict})
    sd = {k: v.numpy() for k, v in ckpt["model_state_dict"].items()}
    return params_from_openai_state_dict(sd, dims), dims
