"""Trainer checkpoint save/load (torch-format, resume-complete).

Layout parity with the reference's generic state-dict checkpointing
(src/scripts/train_sae.py:232-294): a ``.pth`` with keys ``model`` (SAE
state dict in the reference's key names), ``optimizer``, ``scheduler``,
``step``, ``best_val_loss``, ``hparams`` (+ RNG states). The ``model`` +
``hparams`` pair is loadable by reference-style consumers
(init_sae_from_checkpoint); ``optimizer`` holds the optax state as
treedef-free leaves restored against a freshly initialized state.
"""

from __future__ import annotations

import random
from typing import Any

import jax
import numpy as np

from ..models.sae.serialize import (
    load_checkpoint_file,
    params_from_state_dict,
    save_checkpoint,
    state_dict_from_params,
)


def opt_state_to_leaves(opt_state) -> list:
    """Optax state flattened to TORCH tensors (not numpy): torch ≥ 2.6
    defaults ``torch.load(weights_only=True)``, and reference consumers load
    checkpoints with default args (src/dataset/activations.py:19-20) — one
    numpy leaf anywhere in the pickle fails that entire load, while torch
    tensors are always admitted."""
    from ..models.sae.serialize import _torch

    torch = _torch()
    return [
        torch.from_numpy(np.asarray(x).copy())
        for x in jax.tree_util.tree_leaves(opt_state)
    ]


def opt_state_from_leaves(template_state, leaves: list) -> Any:
    treedef = jax.tree_util.tree_structure(template_state)
    expected = treedef.num_leaves
    if len(leaves) != expected:
        raise ValueError(
            f"optimizer state has {len(leaves)} leaves, expected {expected} "
            "(optimizer/scheduler config changed since the checkpoint?)"
        )
    template_leaves = jax.tree_util.tree_leaves(template_state)
    coerced = []
    for i, (leaf, tmpl) in enumerate(zip(leaves, template_leaves)):
        if hasattr(leaf, "detach"):  # torch tensor (current format)
            leaf = leaf.detach().cpu().numpy()
        arr = np.asarray(leaf, dtype=np.asarray(tmpl).dtype)
        if np.shape(arr) != np.shape(tmpl):
            # a matching leaf COUNT from a different architecture would
            # otherwise unflatten silently and fail later as an opaque jit
            # shape error instead of this actionable message
            raise ValueError(
                f"optimizer-state leaf {i} has shape {np.shape(arr)}, "
                f"expected {np.shape(tmpl)} (model config changed since "
                "the checkpoint?)"
            )
        coerced.append(arr)
    return jax.tree_util.tree_unflatten(treedef, coerced)


def save_trainer_checkpoint(
    path: str,
    variant: str,
    params,
    opt_state,
    step: int,
    best_val_loss: float,
    hparams: dict,
    extra: dict | None = None,
) -> None:
    state = {
        "model": state_dict_from_params(variant, params),
        "optimizer": {"leaves": opt_state_to_leaves(opt_state)},
        "scheduler": {"step": int(step)},
        "step": int(step),
        "best_val_loss": float(best_val_loss),
        "hparams": hparams,
        # plain-typed (no ndarray) so the checkpoint stays loadable under
        # torch.load's weights_only=True default — see opt_state_to_leaves
        "numpy_rng_state": _np_rng_to_plain(np.random.get_state()),
        "random_rng_state": random.getstate(),
    }
    if extra:
        state.update(extra)
    save_checkpoint(path, state)


def _np_rng_to_plain(state) -> list:
    """('MT19937', uint32[624], pos, has_gauss, cached) → plain lists/ints."""
    name, keys, pos, has_gauss, cached = state
    return [str(name), [int(k) for k in keys], int(pos), int(has_gauss),
            float(cached)]


def _np_rng_from_saved(saved):
    """Accepts both the plain-typed form and the raw ``np.random.get_state``
    tuple written by pre-round-3 checkpoints."""
    name, keys, pos, has_gauss, cached = saved
    return (str(name), np.asarray(keys, dtype=np.uint32), int(pos),
            int(has_gauss), float(cached))


def load_trainer_checkpoint(path: str, variant: str, template_opt_state):
    """(params, opt_state, step, best_val_loss, raw) — restores host RNGs."""
    ckpt = load_checkpoint_file(path)
    params = params_from_state_dict(variant, ckpt["model"])
    opt_state = template_opt_state
    if "optimizer" in ckpt and isinstance(ckpt["optimizer"], dict) and "leaves" in ckpt["optimizer"]:
        opt_state = opt_state_from_leaves(template_opt_state, ckpt["optimizer"]["leaves"])
    if "numpy_rng_state" in ckpt:
        np.random.set_state(_np_rng_from_saved(ckpt["numpy_rng_state"]))
    if "random_rng_state" in ckpt:
        random.setstate(ckpt["random_rng_state"])
    return params, opt_state, int(ckpt.get("step", 0)), float(
        ckpt.get("best_val_loss", float("inf"))
    ), ckpt
