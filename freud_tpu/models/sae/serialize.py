"""Torch-format SAE checkpoint I/O.

The reference persists trainer state with ``torch.save`` and rebuilds SAEs
from ``checkpoint["hparams"]`` + ``checkpoint["model"]``
(src/scripts/train_sae.py:232-251, src/dataset/activations.py:16-31). To keep
those artifacts interchangeable (GUI configs point at ``bestval.pth``), we
emit/read the identical layout — torch is used purely as a host-side
(de)serializer; all math stays in JAX.

State-dict key mapping:
  l1:   decoder.weight (activation_size, n_dict), encoder_bias (n_dict,)
  topk: encoder.weight (n_dict, d_in), encoder.bias, W_dec (n_dict, d_in), b_dec
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np

from .config import config_for_variant
from .l1 import L1Params
from .topk import TopKParams


def _torch():
    import torch

    return torch


def state_dict_from_params(variant: str, params) -> dict:
    torch = _torch()

    def t(x):
        return torch.from_numpy(np.asarray(x, dtype=np.float32).copy())

    if variant == "l1":
        return {"decoder.weight": t(params.W), "encoder_bias": t(params.encoder_bias)}
    return {
        "encoder.weight": t(params.encoder_weight),
        "encoder.bias": t(params.encoder_bias),
        "W_dec": t(params.W_dec),
        "b_dec": t(params.b_dec),
    }


def params_from_state_dict(variant: str, sd: dict):
    def a(key):
        v = sd[key]
        if hasattr(v, "numpy"):
            v = v.detach().cpu().numpy()
        return jnp.asarray(np.asarray(v, dtype=np.float32))

    if variant == "l1":
        return L1Params(W=a("decoder.weight"), encoder_bias=a("encoder_bias"))
    return TopKParams(
        encoder_weight=a("encoder.weight"),
        encoder_bias=a("encoder.bias"),
        W_dec=a("W_dec"),
        b_dec=a("b_dec"),
    )


def save_checkpoint(path: str, state: dict) -> None:
    """Save a trainer-state dict; ``model`` must already be a state dict.

    Atomic: a crash mid-write (preemption, OOM) must not destroy the
    checkpoint being overwritten — bestval.pth is often the only copy of
    the best model."""
    import os

    tmp = f"{path}.tmp"
    _torch().save(state, tmp)
    os.replace(tmp, path)


def load_checkpoint_file(path: str) -> dict:
    return _torch().load(path, map_location="cpu", weights_only=False)


def sae_from_checkpoint(path: str) -> tuple[str, Any, int, Any]:
    """(variant, cfg, activation_size, params) from a trainer checkpoint.

    Mirrors the reference's ``init_sae_from_checkpoint``
    (src/dataset/activations.py:16-31).
    """
    ckpt = load_checkpoint_file(path)
    hp = ckpt["hparams"]
    variant = hp["autoencoder_variant"]
    cfg = config_for_variant(variant, hp["autoencoder_config"])
    activation_size = hp["activation_size"]
    params = params_from_state_dict(variant, ckpt["model"])
    return variant, cfg, activation_size, params
