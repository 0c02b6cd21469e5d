"""Phase split of the tiny_topk train step: fwd / fwd+bwd / full step.

Finds where the non-matmul residual lives (fwd kernel measured separately in
bench_topk10; backward matmuls are ~9 ms at bf16 peak; what's left is
optimizer + clip + dead-counter + metrics + donation overhead).
"""

from __future__ import annotations

import json
import time

import numpy as np

import freud_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from freud_tpu.models.sae import TopKAutoEncoderConfig, topk
from freud_tpu.train.trainer import SAETrainer


def timeit(name, fn, *args, iters=15, warmup=3):
    for _ in range(warmup):
        float(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(out)
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({"probe": name, "ms": round(dt * 1e3, 2)}))


def main():
    rng = np.random.default_rng(0)
    batch = 50
    x = jnp.asarray(rng.standard_normal((batch, 1500, 384)).astype(np.float32))
    cfg = TopKAutoEncoderConfig(expansion_factor=16, k=32, auxk_alpha=0.03125)
    tr = SAETrainer(
        "topk",
        {"expansion_factor": 16, "k": 32, "auxk_alpha": 0.03125,
         "dead_feature_threshold": 1e6},
        384, optimizer="adam", scheduler="linear",
        scheduler_params={"num_warmup_steps": 1000}, lr=1e-4, steps=100_000,
    )
    params = tr.params
    dead = (tr.num_frames_since_fired > 1e6)

    @jax.jit
    def fwd_only(p, x):
        terms, fired = topk.training_losses(
            p, x, cfg, dead, matmul_dtype=jnp.bfloat16)
        return terms["fvu"] + terms["auxk_loss"]

    timeit("fwd_losses", fwd_only, params, x)

    @jax.jit
    def fwd_bwd(p, x):
        def loss(p):
            terms, fired = topk.training_losses(
                p, x, cfg, dead, matmul_dtype=jnp.bfloat16)
            return terms["fvu"] + terms["auxk_loss"]
        l, g = jax.value_and_grad(loss)(p)
        # consume EVERY gradient leaf via full sums — anything less lets XLA
        # dead-code-eliminate whole backward matmuls (slicing a dW row prunes
        # the contraction to that row)
        return l + sum(jnp.sum(leaf.astype(jnp.float32))
                       for leaf in jax.tree_util.tree_leaves(g))

    timeit("fwd_bwd", fwd_bwd, params, x)

    state = (tr.params, tr.opt_state, tr.num_frames_since_fired)

    def full_step(x):
        nonlocal state
        *state_, m = tr._train_step(*state, x)
        state = state_
        return m["loss"]

    timeit("full_step", full_step, x)


if __name__ == "__main__" and len(__import__("sys").argv) == 1:
    main()


def scanned():
    """Pure device time: 5 steps as one lax.scan — removes per-step python
    dispatch from the measurement (run via `python bench_topk11.py scanned`)."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((50, 1500, 384)).astype(np.float32))
    tr = SAETrainer(
        "topk",
        {"expansion_factor": 16, "k": 32, "auxk_alpha": 0.03125,
         "dead_feature_threshold": 1e6},
        384, optimizer="adam", scheduler="linear",
        scheduler_params={"num_warmup_steps": 1000}, lr=1e-4, steps=100_000,
    )
    from freud_tpu.models.sae import topk as topk_mod

    cfg, tx = tr.cfg, tr.tx

    @jax.jit
    def five(params, opt_state, counter, x):
        def body(carry, _):
            params, opt_state, counter = carry
            dead_mask = counter > 1e6

            def loss_fn(p):
                terms, fired = topk_mod.training_losses(
                    p, x, cfg, dead_mask, matmul_dtype=jnp.bfloat16)
                return terms["fvu"] + terms["auxk_loss"], fired

            (loss, fired), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            import optax
            params = optax.apply_updates(params, updates)
            counter = topk_mod.age_counters(counter, fired,
                                            x.shape[0] * x.shape[1])
            return (params, opt_state, counter), loss

        carry, losses = jax.lax.scan(
            body, (params, opt_state, counter), None, length=5)
        return jnp.sum(losses)

    state = (tr.params, tr.opt_state, tr.num_frames_since_fired)
    for _ in range(2):
        float(five(*state, x))
    t0 = time.perf_counter()
    for _ in range(6):
        out = five(*state, x)
    float(out)
    dt = (time.perf_counter() - t0) / (6 * 5)
    print(json.dumps({"probe": "scanned_step", "ms": round(dt * 1e3, 2)}))


if __name__ == "__main__" and len(__import__("sys").argv) > 1:
    scanned()
