"""Probe: where the fused TopK forward and trainer step spend time."""

from __future__ import annotations

import json
import sys
import time

import numpy as np

import freud_tpu  # noqa: F401
import jax
import jax.numpy as jnp
import optax


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
        rec = {"name": name, "ms": round(dt * 1e3, 3), **meta}
    except Exception as e:  # noqa: BLE001
        rec = {"name": name, "error": repr(e)[:200], **meta}
    print(json.dumps(rec))
    sys.stdout.flush()


def main():
    from freud_tpu.models.sae import topk as topk_mod
    from freud_tpu.models.sae.config import TopKAutoEncoderConfig
    from freud_tpu.ops import topk_fused

    cfg = TopKAutoEncoderConfig(expansion_factor=16, k=32, auxk_alpha=0.03125)
    d_in, n_dict = 384, 6144
    params = topk_mod.init_topk(d_in, cfg, seed=0)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((50, 1500, d_in)).astype(np.float32))
    x2 = x.reshape(-1, d_in)
    dead = jnp.zeros((n_dict,), bool).at[jnp.arange(0, n_dict, 3)].set(True)
    dead_f = dead.astype(jnp.float32)

    def fwd_kernel(x2):
        acts, ym, ya, tm, ta, fired = topk_fused.topk_sae_forward(
            x2, params.encoder_weight.T, params.encoder_bias, params.b_dec,
            params.W_dec, dead_f, cfg.k, d_in // 2)
        return (jnp.sum(ym) + jnp.sum(ya) + jnp.sum(tm)
                + jnp.sum(acts[0].astype(jnp.float32)))

    for iters_ in (16, 8, 1):
        topk_fused._ITERS = iters_
        topk_fused.topk_sae_forward._clear_cache()
        timeit(f"kernel_iters{iters_}", jax.jit(fwd_kernel), x2, iters=30)
    topk_fused._ITERS = 16

    for rows in (256, 512):
        topk_fused.ROWS = rows
        topk_fused.topk_sae_forward._clear_cache()
        timeit(f"kernel_rows{rows}", jax.jit(fwd_kernel), x2, iters=30)
    topk_fused.ROWS = 128
    topk_fused.topk_sae_forward._clear_cache()

    # ---- step decomposition ----
    def loss(p):
        terms, fired = topk_mod.training_losses(
            p, x, cfg, dead, matmul_dtype=jnp.bfloat16)
        return terms["fvu"] + terms["auxk_loss"], (terms, fired)

    @jax.jit
    def vjp_only(p, x):
        (l, _), g = jax.value_and_grad(loss, has_aux=True)(p)
        return l + jnp.sum(g.b_dec[:1])
    timeit("vjp_only", vjp_only, params, x)

    tx = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adam(1e-4),
    )
    opt_state = tx.init(params)

    @jax.jit
    def vjp_opt(p, s, x):
        (l, _), g = jax.value_and_grad(loss, has_aux=True)(p)
        updates, s = tx.update(g, s, p)
        p = optax.apply_updates(p, updates)
        return jnp.sum(p.b_dec[:1]) + l
    timeit("vjp_opt", vjp_opt, params, opt_state, x)

    counter = jnp.zeros((n_dict,), jnp.int32)

    @jax.jit
    def vjp_opt_counter(p, s, c, x):
        dead_mask = c > 1e6
        def loss2(p):
            terms, fired = topk_mod.training_losses(
                p, x, cfg, dead_mask, matmul_dtype=jnp.bfloat16)
            return terms["fvu"] + terms["auxk_loss"], (terms, fired)
        (l, (terms, fired)), g = jax.value_and_grad(loss2, has_aux=True)(p)
        updates, s = tx.update(g, s, p)
        p = optax.apply_updates(p, updates)
        c = topk_mod.age_counters(c, fired, x.shape[0] * x.shape[1])
        return jnp.sum(p.b_dec[:1]) + l + jnp.sum(c[:1]).astype(jnp.float32)
    timeit("vjp_opt_counter", vjp_opt_counter, params, opt_state, counter, x)

    print(json.dumps({"name": "done"}))


if __name__ == "__main__":
    main()
