"""TopK training-dynamics sanity on synthetic dictionary data.

Ground truth: 32 orthonormal atoms in R^32, 8-sparse nonnegative codes. A TopK SAE
(dict 128, k=8, AuxK live) must drive FVU to ~noise and keep the dead
fraction bounded — the end-to-end check that the fused kernel + hand-written
VJP + fired/dead-counter bookkeeping actually LEARN, re-run after any change
to selection/fired semantics. Prints JSON lines; final line has the verdict.
"""

from __future__ import annotations

import json
import sys

import numpy as np

import freud_tpu  # noqa: F401
import jax.numpy as jnp

from freud_tpu.train.trainer import SAETrainer


def main(steps: int = 1500, batch: int = 16, t: int = 64):
    rng = np.random.default_rng(0)
    # orthonormal ground truth: with n_atoms > d_in (coherent dictionaries) a
    # LINEAR encoder cannot select the right atoms and FVU floors near 0.1 —
    # that measures the encoder class, not the trainer. Orthonormal atoms
    # make exact recovery achievable, so the floor is the noise level.
    d_in, n_atoms, spars = 32, 32, 8
    atoms = np.linalg.qr(
        rng.standard_normal((d_in, n_atoms)))[0].T.astype(np.float32)

    def make_batch():
        codes = np.zeros((batch * t, n_atoms), np.float32)
        for r in codes:
            idx = rng.choice(n_atoms, spars, replace=False)
            r[idx] = np.abs(rng.standard_normal(spars)) + 0.1
        x = codes @ atoms + 0.01 * rng.standard_normal((batch * t, d_in))
        return jnp.asarray(x.reshape(batch, t, d_in).astype(np.float32))

    trainer = SAETrainer(
        "topk",
        {"expansion_factor": 4, "k": spars, "auxk_alpha": 0.03125,
         "dead_feature_threshold": 30_000.0},
        d_in, optimizer="adam", scheduler="linear",
        scheduler_params={"num_warmup_steps": 50}, lr=3e-3,
        steps=8 * steps,  # schedule decays over 8x the run: lr stays useful throughout
    )
    import time
    print(json.dumps({"built": time.strftime("%H:%M:%S")})); sys.stdout.flush()
    first = None
    t0 = time.time()
    for i in range(steps):
        m = trainer.train_step(make_batch())
        if i == 0:
            first = float(m["fvu"])
        if i % 100 == 0:
            print(json.dumps({"step": i, "fvu": round(float(m["fvu"]), 4),
                              "dead_pct": round(float(m["dead_pct"]), 3),
                              "elapsed": round(time.time() - t0, 1)}))
            sys.stdout.flush()
    final_fvu = float(m["fvu"])
    dead = float(m["dead_pct"])
    # dead_pct is EXPECTED to be high here: 128 latents for 32 true atoms —
    # once the dictionary is recovered the ~96 surplus latents never fire
    # (AuxK can't revive them against a pure-noise residual). FVU is the
    # verdict; measured on v5e 2026-08-17: 0.6162 → 0.00035, exactly the
    # analytic noise floor (noise_var/signal_var ≈ 3.4e-4).
    ok = final_fvu < 0.05
    print(json.dumps({"first_fvu": round(first, 4),
                      "final_fvu": round(final_fvu, 5),
                      "dead_pct": round(dead, 3), "converged": ok}))


if __name__ == "__main__":
    main()
