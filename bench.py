"""Benchmark: the two headline metrics (BASELINE.json).

1. Whisper-tiny block-2 activation-collection throughput, as RTFx (audio
   seconds processed per wall second) of the on-device pipeline
   (mel → encoder → capture). North-star target: ≥100× realtime per chip.
2. tiny_l1 SAE training steps/sec/chip (batch 100 × 1500 × 384, n_dict 200,
   RAdam + cosine — the configs/train/tiny_l1.json recipe).

Prints ONE JSON line:
  {"metric", "value", "unit", "vs_baseline", ...extra}
vs_baseline is RTFx / 100 (the north-star target; the reference publishes no
numbers of its own — BASELINE.md).

Random weights are used (identical FLOPs/memory traffic to pretrained; no
network in this environment). Run with no JAX_PLATFORMS override to use the
TPU.
"""

from __future__ import annotations

import json
import time

import numpy as np

import freud_tpu  # noqa: F401  (platform/compile-cache setup)
import jax
import jax.numpy as jnp


def bench_collection(
    batch: int = 128, iters: int = 8, warmup: int = 2, dtype=jnp.float32
) -> dict:
    from freud_tpu.audio.mel import batched_log_mel
    from freud_tpu.models.whisper import dims_for, encoder_forward, init_params

    dims = dims_for("tiny")
    params = init_params(dims, seed=0)
    layer = "encoder.blocks.2"

    # The pipeline returns the activations PLUS an in-jit checksum scalar;
    # fetching the checksum forces execution without a separate slice program
    # (block_until_ready is unreliable on tunneled backends) and without
    # pulling the full activation tensor over the measurement path.
    @jax.jit
    def pipeline(params, audio):
        mels = batched_log_mel(audio, dims.n_mels)
        _, caps = encoder_forward(
            params, dims, mels, capture=(layer,), compute_dtype=dtype
        )
        acts = caps[layer]
        return acts, jnp.sum(acts[:, 0, 0].astype(jnp.float32))

    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((batch, 480_000)).astype(np.float32) * 0.1)

    for _ in range(warmup):
        float(pipeline(params, audio)[1])
    t0 = time.perf_counter()
    for _ in range(iters):
        _, checksum = pipeline(params, audio)
    float(checksum)  # device executes in order; last checksum ⇒ all done
    elapsed = time.perf_counter() - t0
    audio_seconds = batch * iters * 30.0
    return {
        "rtfx": audio_seconds / elapsed,
        "files_per_sec": batch * iters / elapsed,
        "elapsed_s": elapsed,
        "batch": batch,
    }


def _bench_train(variant: str, cfg: dict, d_in: int, batch: int,
                 optimizer: str, scheduler: str, iters: int, warmup: int,
                 scheduler_params=None, lr: float = 1e-4,
                 steps: int = 100_000) -> dict:
    """One trainer recipe's steps/s. All timing goes through this single
    helper so the axon-backend discipline (force a scalar computed IN the
    jit — block_until_ready is a no-op on tunneled backends) lives in one
    place."""
    from freud_tpu.train.trainer import SAETrainer

    trainer = SAETrainer(
        variant, cfg, d_in,
        optimizer=optimizer, scheduler=scheduler,
        scheduler_params=scheduler_params, lr=lr, steps=steps,
        clip_thresh=1.0,
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, 1500, d_in)).astype(np.float32))
    state = (trainer.params, trainer.opt_state, trainer.num_frames_since_fired)
    for _ in range(warmup):
        *state, m = trainer._train_step(*state, x)
    float(m["loss"])  # force (in-order device execution)
    t0 = time.perf_counter()
    for _ in range(iters):
        *state, m = trainer._train_step(*state, x)
    float(m["loss"])
    elapsed = time.perf_counter() - t0
    return {
        "steps_per_sec": iters / elapsed,
        "elapsed_s": elapsed,
        "batch": batch,
        "final_loss": float(m["loss"]),
    }


def bench_sae_train(batch: int = 100, iters: int = 200, warmup: int = 5) -> dict:
    """tiny_l1 recipe (configs/train/tiny_l1.json)."""
    return _bench_train(
        "l1", {"n_dict_components": 200, "recon_alpha": 1e4}, 384, batch,
        "radam", "cosine", iters, warmup, lr=4e-4,
    )


def bench_topk_train(batch: int = 50, iters: int = 60, warmup: int = 3) -> dict:
    """tiny_topk recipe: expansion 16 (dict 6144), k 32, AuxK live."""
    return _bench_train(
        "topk",
        {"expansion_factor": 16, "k": 32, "auxk_alpha": 0.03125,
         "dead_feature_threshold": 1e6},
        384, batch, "adam", "linear", iters, warmup,
        scheduler_params={"num_warmup_steps": 1000},
    )


def bench_large_topk_train(batch: int = 32, iters: int = 30, warmup: int = 3) -> dict:
    """large_v1_audioset recipe (configs/train/large_v1_audioset.json:1-34):
    d=1280, expansion 16 (n_dict 20480), k 32, AuxK live, adam+linear,
    batch 32 files. n_dict·d here exceeds the fused kernel's resident-weight
    VMEM gate, so this exercises the threshold-kernel formulation."""
    return _bench_train(
        "topk",
        {"expansion_factor": 16, "k": 32, "auxk_alpha": 0.03125,
         "dead_feature_threshold": 1e6},
        1280, batch, "adam", "linear", iters, warmup,
        scheduler_params={"num_warmup_steps": 1000}, steps=25_000,
    )


def bench_large_l1_train(batch: int = 16, iters: int = 30, warmup: int = 3) -> dict:
    """large_v3_l1 recipe (configs/train/large_v3_l1.json:1-27): d=1280,
    expansion 16 (n_dict 20480), recon_alpha 1e4, radam+cosine, batch 16."""
    return _bench_train(
        "l1", {"expansion_factor": 16, "recon_alpha": 1e4}, 1280, batch,
        "radam", "cosine", iters, warmup, steps=25_000,
    )


def bench_serving(batch: int = 8, max_new: int = 224, iters: int = 5,
                  warmup: int = 2) -> dict:
    """Batched greedy transcription serving RTFx (tiny, bf16 decode, the
    tools/bench_transcribe.py headline configuration: EOT early exit live,
    full token budget)."""
    from freud_tpu.models.whisper import dims_for, encoder_forward, init_params
    from freud_tpu.models.whisper.decoding import sample_decode
    from freud_tpu.models.whisper.tokenizer import special_tokens

    dims = dims_for("tiny")
    params = init_params(dims, seed=0)
    st = special_tokens(dims.n_vocab)
    rng = np.random.default_rng(0)
    mels = jnp.asarray(
        rng.standard_normal((batch, dims.n_mels, 3000)).astype(np.float32) * 0.3)

    @jax.jit
    def pipeline(params, mels):
        encoded, _ = encoder_forward(
            params, dims, mels, compute_dtype=jnp.bfloat16)
        seq = st.sot_sequence(lang_index=0, timestamps=True)
        prompt = jnp.tile(jnp.asarray(seq, jnp.int32)[None], (batch, 1))
        tokens, sum_lp, _, _ = sample_decode(
            params, dims, encoded, prompt, len(seq), max_new=max_new,
            compute_dtype=jnp.bfloat16)
        return jnp.sum(tokens[:, -1].astype(jnp.float32)) + jnp.sum(sum_lp)

    for _ in range(warmup):
        float(pipeline(params, mels))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = pipeline(params, mels)
    float(out)
    dt = (time.perf_counter() - t0) / iters
    return {"rtfx": batch * 30.0 / dt, "clips_per_sec": batch / dt}


def main():
    backend = jax.default_backend()
    coll = bench_collection()
    coll_bf16 = bench_collection(dtype=jnp.bfloat16)
    sae = bench_sae_train()
    topk = bench_topk_train()
    large_topk = bench_large_topk_train()
    large_l1 = bench_large_l1_train()
    try:
        serving = bench_serving()
    except Exception:  # the headline metrics must never die on the extra row
        serving = None
    result = {
        "metric": "whisper_tiny_block2_collection_rtfx",
        "value": round(coll["rtfx"], 1),
        "unit": "x_realtime_per_chip",
        "vs_baseline": round(coll["rtfx"] / 100.0, 3),
        "tiny_l1_steps_per_sec": round(sae["steps_per_sec"], 2),
        "tiny_topk_steps_per_sec": round(topk["steps_per_sec"], 2),
        "large_v1_topk_steps_per_sec": round(large_topk["steps_per_sec"], 2),
        "large_v3_l1_steps_per_sec": round(large_l1["steps_per_sec"], 2),
        "collection_files_per_sec": round(coll["files_per_sec"], 2),
        "collection_rtfx_bf16": round(coll_bf16["rtfx"], 1),
        "backend": backend,
    }
    if serving is not None:
        result["serving_transcribe_rtfx_bf16"] = round(serving["rtfx"], 1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
