"""One-stop round bench: mel v2, encoder, pipeline RTFx, topk trainer step."""

from __future__ import annotations

import json
import sys
import time

import numpy as np

import freud_tpu  # noqa: F401
import jax
import jax.numpy as jnp


def timeit(name, fn, *args, iters=12, warmup=3, **meta):
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
        rec = {"name": name, "error": repr(e)[:250], **meta}
    print(json.dumps(rec))
    sys.stdout.flush()


def main():
    from freud_tpu.audio.mel import batched_log_mel
    from freud_tpu.models.whisper import dims_for, encoder_forward, init_params

    rng = np.random.default_rng(0)
    dims = dims_for("tiny")
    params = init_params(dims, seed=0)
    audio64 = jnp.asarray(rng.standard_normal((64, 480_000)).astype(np.float32) * 0.1)

    @jax.jit
    def mel_only(a):
        m = batched_log_mel(a, dims.n_mels)
        return jnp.sum(m[:, 0, :].astype(jnp.float32))

    timeit("mel_v2_b64", mel_only, audio64)

    layer = "encoder.blocks.2"
    for batch in (64, 128):
        aud = jnp.asarray(
            rng.standard_normal((batch, 480_000)).astype(np.float32) * 0.1)
        for dt, tag in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
            @jax.jit
            def pipe(p, a, dt=dt):
                m = batched_log_mel(a, dims.n_mels)
                _, caps = encoder_forward(p, dims, m, capture=(layer,),
                                          compute_dtype=dt)
                acts = caps[layer]
                return jnp.sum(acts[:, 0, 0].astype(jnp.float32))
            try:
                for _ in range(2):
                    out = pipe(params, aud)
                float(out)
                t0 = time.perf_counter()
                iters = 10
                for _ in range(iters):
                    out = pipe(params, aud)
                float(out)
                dt_s = (time.perf_counter() - t0) / iters
                print(json.dumps({
                    "name": f"pipeline_{tag}_b{batch}",
                    "ms": round(dt_s * 1e3, 2),
                    "rtfx": round(batch * 30.0 / dt_s)}))
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"name": f"pipeline_{tag}_b{batch}",
                                  "error": repr(e)[:250]}))
            sys.stdout.flush()

    from freud_tpu.train.trainer import SAETrainer

    trainer = SAETrainer(
        "topk",
        {"expansion_factor": 16, "k": 32, "auxk_alpha": 0.03125,
         "dead_feature_threshold": 1e6},
        384,
        optimizer="adam", scheduler="linear",
        scheduler_params={"num_warmup_steps": 1000}, lr=1e-4, steps=100_000,
    )
    x = jnp.asarray(rng.standard_normal((50, 1500, 384)).astype(np.float32))
    state = (trainer.params, trainer.opt_state, trainer.num_frames_since_fired)
    for _ in range(3):
        *state, m = trainer._train_step(*state, x)
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(60):
        *state, m = trainer._train_step(*state, x)
    float(m["loss"])
    dt = (time.perf_counter() - t0) / 60
    print(json.dumps({"name": "trainer_step_tiny_topk", "ms": round(dt * 1e3, 2),
                      "steps_per_sec": round(1 / dt, 1)}))
    print(json.dumps({"name": "done", "backend": jax.default_backend()}))


if __name__ == "__main__":
    main()
