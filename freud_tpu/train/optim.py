"""Optimizers and LR schedules for SAE training.

Parity targets (reference src/scripts/train_sae.py:374-394):
  optimizer "radam" → torch RAdam(eps=1e-5, lr, weight_decay)  [L2-style]
  optimizer "adam"  → torch Adam(lr)
  scheduler "cosine" → CosineAnnealingLR(T_max=steps, eta_min=0)
  scheduler "linear" → HF linear schedule with warmup (factor 0 at step 0)
plus clip_grad_norm_(clip_thresh) applied before the update.

Expressed as one optax chain: global-norm clip → (L2 weight decay) →
scale_by_radam/adam → schedule. Schedules are pure functions of the update
count, so "scheduler state" in checkpoints is just the step.
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def make_schedule(scheduler: str, lr: float, steps: int, scheduler_params: dict):
    """The returned callable is the optax schedule (device math, consumed by
    the optimizer chain); its ``.host`` attribute evaluates the SAME formula
    in pure Python for logging callers — fetching the device scalar costs
    one link round-trip per call, which compounds at the reference's
    log_tb_every=10 cadence on tunneled backends."""
    import math

    if scheduler == "cosine":
        sched = optax.cosine_decay_schedule(
            init_value=lr, decay_steps=steps, alpha=0.0)

        def host(count: int) -> float:
            c = min(max(float(count), 0.0), float(steps))
            return lr * 0.5 * (1.0 + math.cos(math.pi * c / steps))

        sched.host = host
        return sched
    if scheduler == "linear":
        # reference configs always carry num_warmup_steps; default to 0
        # (plain linear decay) so callers without params get a sane schedule
        # instead of a KeyError
        warmup = int((scheduler_params or {}).get("num_warmup_steps", 0))

        def schedule(count):
            count = jnp.asarray(count, jnp.float32)
            warm = count / jnp.maximum(warmup, 1)
            decay = (steps - count) / jnp.maximum(steps - warmup, 1)
            return lr * jnp.where(count < warmup, warm, jnp.maximum(decay, 0.0))

        def host_linear(count: int) -> float:
            c = float(count)
            if c < warmup:
                return lr * c / max(warmup, 1)
            return lr * max((steps - c) / max(steps - warmup, 1), 0.0)

        schedule.host = host_linear
        return schedule
    raise ValueError(f"Invalid scheduler: {scheduler!r}, must be 'cosine' or 'linear'")


def make_optimizer(
    optimizer: str,
    scheduler: str,
    lr: float,
    steps: int,
    weight_decay: float = 0.0,
    clip_thresh: float = 1.0,
    scheduler_params: dict | None = None,
) -> tuple[optax.GradientTransformation, "optax.Schedule"]:
    schedule = make_schedule(scheduler, lr, steps, scheduler_params or {})
    parts = [optax.clip_by_global_norm(clip_thresh)]
    if optimizer == "radam":
        if weight_decay:
            parts.append(optax.add_decayed_weights(weight_decay))
        parts.append(optax.scale_by_radam(eps=1e-5))
    elif optimizer == "adam":
        parts.append(optax.scale_by_adam())
    else:
        raise ValueError(f"Invalid optimizer: {optimizer!r}, must be 'radam' or 'adam'")
    parts.append(optax.scale_by_learning_rate(schedule))
    return optax.chain(*parts), schedule
