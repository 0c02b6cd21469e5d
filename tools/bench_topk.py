"""Microbench: tiny_topk train-step variants on the TPU.

Run:  PYTHONPATH=/root/repo:/root/.axon_site nohup python tools/bench_topk.py > /tmp/bench_topk.log 2>&1 &
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

import freud_tpu  # noqa: F401
import jax
import jax.numpy as jnp


def timeit(name, fn, *args, iters=40, warmup=3, **meta):
    try:
        for _ in range(warmup):
            out = fn(*args)
        float(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        float(out)
        dt = (time.perf_counter() - t0) / iters
        rec = {"name": name, "ms": round(dt * 1e3, 3),
               "steps_per_sec": round(1.0 / dt, 1), **meta}
    except Exception as e:  # noqa: BLE001
        rec = {"name": name, "error": repr(e)[:300], **meta}
    print(json.dumps(rec))
    sys.stdout.flush()


def main():
    from freud_tpu.models.sae import topk as topk_mod
    from freud_tpu.models.sae.config import TopKAutoEncoderConfig

    cfg = TopKAutoEncoderConfig(expansion_factor=16, k=32, auxk_alpha=0.03125)
    d_in, n_dict = 384, 6144
    params = topk_mod.init_topk(d_in, cfg, seed=0)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((50, 1500, d_in)).astype(np.float32))
    dead = jnp.zeros((n_dict,), bool).at[jnp.arange(0, n_dict, 3)].set(True)

    # bare loss fwd+bwd: fused custom-vjp vs XLA autodiff, bf16 and f32 matmuls
    for mm, tag in ((jnp.bfloat16, "bf16"), (None, "f32")):
        @jax.jit
        def fused_vg(p, x, mm=mm):
            def loss(p):
                terms, fired = topk_mod.training_losses(p, x, cfg, dead, matmul_dtype=mm)
                return terms["fvu"] + terms["auxk_loss"], fired
            (l, f), g = jax.value_and_grad(loss, has_aux=True)(p)
            return l + jnp.sum(g.b_dec[:1])

        @jax.jit
        def xla_vg(p, x, mm=mm):
            def loss(p):
                terms, fired = topk_mod._training_losses_xla(
                    p, x, cfg, dead, matmul_dtype=mm)
                return terms["fvu"] + terms["auxk_loss"], fired
            (l, f), g = jax.value_and_grad(loss, has_aux=True)(p)
            return l + jnp.sum(g.b_dec[:1])

        timeit(f"fused_vjp_{tag}", fused_vg, params, x)
        timeit(f"xla_autodiff_{tag}", xla_vg, params, x)

    # forward-only fused losses (headroom check)
    @jax.jit
    def fwd_only(p, x):
        terms, fired = topk_mod.training_losses(
            p, x, cfg, dead, matmul_dtype=jnp.bfloat16)
        return terms["fvu"] + terms["auxk_loss"]
    timeit("fused_fwd_only_bf16", fwd_only, params, x)

    # full trainer step (the headline number's path)
    from freud_tpu.train.trainer import SAETrainer

    trainer = SAETrainer(
        "topk",
        {"expansion_factor": 16, "k": 32, "auxk_alpha": 0.03125,
         "dead_feature_threshold": 1e6},
        d_in,
        optimizer="adam",
        scheduler="linear",
        scheduler_params={"num_warmup_steps": 1000},
        lr=1e-4,
        steps=100_000,
    )

    def full_steps(n):
        state = (trainer.params, trainer.opt_state, trainer.num_frames_since_fired)
        for _ in range(3):
            *state, m = trainer._train_step(*state, x)
        float(m["loss"])
        t0 = time.perf_counter()
        for _ in range(n):
            *state, m = trainer._train_step(*state, x)
        float(m["loss"])
        return (time.perf_counter() - t0) / n

    dt = full_steps(60)
    print(json.dumps({"name": "trainer_step_tiny_topk", "ms": round(dt * 1e3, 3),
                      "steps_per_sec": round(1.0 / dt, 1)}))
    print(json.dumps({"name": "done", "backend": jax.default_backend()}))


if __name__ == "__main__":
    main()
