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


def _check_variant(variant: str) -> None:
    if variant not in ("l1", "topk"):
        raise ValueError(f"invalid autoencoder variant {variant!r} "
                         "(expected 'l1' or 'topk')")


def state_dict_from_params(variant: str, params) -> dict:
    _check_variant(variant)
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
    _check_variant(variant)
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


def _numpy_safe_globals() -> list:
    """The globals numpy's ndarray/dtype/scalar pickles reconstruct through —
    this repo's own trainer checkpoints store optimizer leaves and the RNG
    state as numpy arrays (train/checkpoint.py), which torch's weights_only
    loader rejects unless these are allowlisted. Data-only reconstructors:
    allowlisting them keeps arbitrary-code pickle payloads blocked."""
    try:
        from numpy._core import multiarray as ma  # numpy >= 2
    except ImportError:  # pragma: no cover — numpy 1.x
        from numpy.core import multiarray as ma
    allow = [np.ndarray, np.dtype, ma._reconstruct, ma.scalar]
    try:
        import numpy.dtypes as ndt

        allow += [getattr(ndt, n) for n in dir(ndt) if n.endswith("DType")]
    except ImportError:  # pragma: no cover — numpy < 1.25
        pass
    return allow


def load_checkpoint_file(path: str) -> dict:
    """torch.load with the safe loader first: the stored payload is
    tensors/ndarrays plus plain-dict hparams, so ``weights_only=True`` with
    the numpy reconstructors allowlisted covers this repo's checkpoints (and
    blocks arbitrary-code pickle payloads from a tampered file).
    Reference-written checkpoints occasionally carry extra pickled objects in
    hparams — those fall back to the legacy loader with a warning,
    preserving interchange."""
    torch = _torch()
    try:
        ser = torch.serialization
        if hasattr(ser, "safe_globals"):
            with ser.safe_globals(_numpy_safe_globals()):
                return torch.load(path, map_location="cpu", weights_only=True)
        return torch.load(path, map_location="cpu", weights_only=True)
    except Exception:  # noqa: BLE001 — pickle.UnpicklingError and friends
        print(f"warning: {path} needs the legacy (unsafe) pickle loader — "
              "only load checkpoints you trust")
        return torch.load(path, map_location="cpu", weights_only=False)


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
