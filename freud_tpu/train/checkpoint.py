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
import threading
from typing import Any, Callable

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
    rng_states: tuple | None = None,
) -> None:
    """``rng_states=(numpy_state, random_state)`` lets an asynchronous
    writer capture the host RNGs at SUBMIT time on the training thread —
    capturing them here, on a background thread, would race the training
    loop's own RNG draws."""
    if rng_states is None:
        rng_states = (np.random.get_state(), random.getstate())
    state = {
        "model": state_dict_from_params(variant, params),
        "optimizer": {"leaves": opt_state_to_leaves(opt_state)},
        "scheduler": {"step": int(step)},
        "step": int(step),
        "best_val_loss": float(best_val_loss),
        "hparams": hparams,
        # plain-typed (no ndarray) so the checkpoint stays loadable under
        # torch.load's weights_only=True default — see opt_state_to_leaves
        "numpy_rng_state": _np_rng_to_plain(rng_states[0]),
        "random_rng_state": rng_states[1],
    }
    if extra:
        state.update(extra)
    save_checkpoint(path, state)


class AsyncCheckpointWriter:
    """Write-behind trainer checkpoints.

    The slow halves of a checkpoint — the device→host parameter fetch and
    the disk write — run on a background thread while training continues.
    Submitters are responsible for snapshot consistency: the trainer's
    steps DONATE their state buffers, so ``SAETrainer.save_async`` hands
    the closure an on-device COPY, not the live references (a raw
    reference would be a deleted array one step later). This matters most
    at recipe cadence:
    the reference loop writes ``bestval.pth`` on every improved validation
    (train_sae.py:590-595), which in a converging run is EVERY validation —
    measured on the tunneled v5e, a synchronous large_v1 bestval save
    (~630 MB fetch) cost 30-60 s of the 100-step cycle, dominating the
    whole campaign wall (ROADMAP round-4 close).

    One save may be queued while one is in flight (bounded staging — at
    most two parameter snapshots alive beyond the live state). A third
    ``submit`` normally blocks: checkpoints are ordered, never silently
    lost. The exception is COALESCING: a submit carrying the same
    ``coalesce`` key as the still-queued (not yet started) item REPLACES
    it — both writes target the same path(s) and the new snapshot is
    strictly newer, so the final disk state is identical and only a
    transient intermediate file is skipped. This is the bestval cadence
    fix: a converging run improves on EVERY validation
    (train_sae.py:590-595), and when the link is slower than the
    validation cadence (the 2500-step large_v1 campaign measured 57 s per
    630 MB bestval fetch against a ~70 s cycle — ROADMAP round-5) the
    writer otherwise stalls training while superseded snapshots drain.
    Dropping a queued snapshot also frees its on-device staging copy
    immediately. Errors surface on the next ``submit``/``flush`` — a
    silently dead writer would end a 100k-step run with stale
    checkpoints."""

    def __init__(self):
        self._cv = threading.Condition()
        self._queued: tuple[object, Callable[[], None]] | None = None
        self._busy = False
        self._closed = False
        self._error: BaseException | None = None
        self.dropped = 0  # superseded (coalesced-away) snapshots
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        while True:
            with self._cv:
                while self._queued is None and not self._closed:
                    self._cv.wait()
                if self._queued is None:
                    return
                _, work = self._queued
                self._queued = None
                self._busy = True
                self._cv.notify_all()
            try:
                work()
            except BaseException as e:
                self._error = e
            finally:
                with self._cv:
                    self._busy = False
                    self._cv.notify_all()

    def _raise_pending(self):
        if self._error is not None:
            err, self._error = self._error, None
            raise RuntimeError("async checkpoint write failed") from err

    def submit(self, work: Callable[[], None], coalesce=None) -> None:
        """Queue a write. ``coalesce``: an optional key; if the queued
        (unstarted) item carries the same key, it is superseded by this
        one instead of being waited for. Only pass a key when the two
        writes are interchangeable-except-newer (same target paths)."""
        self._raise_pending()
        with self._cv:
            if (coalesce is not None and self._queued is not None
                    and self._queued[0] == coalesce):
                self._queued = (coalesce, work)
                self.dropped += 1
                return
            while self._queued is not None:
                self._cv.wait()
            self._queued = (coalesce, work)
            self._cv.notify_all()

    def flush(self) -> None:
        """Block until every submitted checkpoint is on disk."""
        with self._cv:
            while self._queued is not None or self._busy:
                self._cv.wait()
        self._raise_pending()

    def close(self) -> None:
        """Flush, stop the thread, and surface any pending error."""
        with self._cv:
            while self._queued is not None or self._busy:
                self._cv.wait()
            self._closed = True
            self._cv.notify_all()
        self._thread.join(timeout=60)
        self._raise_pending()


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
