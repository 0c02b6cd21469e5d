"""Recipe-scale TopK convergence-parity artifact (VERDICT r4 weak-6).

Runs the tiny_topk hyperparameters (Adam lr 1e-4, linear schedule with
1k-step warmup, expansion 16, k=32, auxk_alpha=1/32, clip 1.0 — the recipe
verbatim except dead_feature_threshold, lowered 1e6 → 10k frames so the
dead-counter/AuxK dynamics actually engage within the horizon) for N steps
through BOTH the reference torch loop (/root/reference
src/scripts/train_sae.py:417-452, executed in place) and SAETrainer, from
the same init over the same synthetic data stream, at the FULL tiny shapes
(d_act=384, n_dict=6144), and records the two loss curves + divergence
summary to tools/convergence_parity_topk.json.

The harness is the ONE in
tests/test_reference_differential.py::_topk_convergence_curves (imported
here, not duplicated) — this script is only the inspectable curve RECORD of
what the in-suite assertion checks (the suite run shrinks d_act to 96 for
the single CPU core).

Usage: python tools/convergence_parity_topk.py [steps=1000]
"""

from __future__ import annotations

import importlib.machinery
import json
import os
import sys
import time
import types

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def _install_stub(name, attrs=None):
    if name in sys.modules:
        return

    class _Stub(types.ModuleType):
        def __getattr__(self, key):
            if key.startswith("__"):
                raise AttributeError(key)
            return _Stub(self.__name__ + "." + key)

    mod = _Stub(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    for k, v in (attrs or {}).items():
        setattr(mod, k, v)
    sys.modules[name] = mod


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    _install_stub("simple_parsing",
                  {"Serializable": type("Serializable", (), {})})
    _install_stub("whisper")
    sys.path.insert(0, REFERENCE)
    from src.models import topkautoencoder as ref_topk

    import test_reference_differential as trd

    ref = types.SimpleNamespace(topk=ref_topk)
    t0 = time.perf_counter()
    losses, ref_losses, dead_pct = trd._topk_convergence_curves(
        ref, steps=steps)
    wall = time.perf_counter() - t0

    L, R = np.asarray(losses), np.asarray(ref_losses)
    rel = np.abs(L - R) / np.abs(R)
    stride = max(1, steps // 200)
    record = {
        "steps": steps,
        "hparams": {"d_act": 384, "n_dict": 6144, "k": 32,
                    "auxk_alpha": 1 / 32, "lr": 1e-4,
                    "optimizer": "adam", "scheduler": "linear warmup=1000",
                    "clip": 1.0, "rows_per_step": 128,
                    "dead_feature_threshold": 10_000.0,
                    "harness":
                        "tests/test_reference_differential.py::"
                        "_topk_convergence_curves"},
        "wall_s": round(wall, 1),
        "max_rel_per_step": float(rel.max()),
        "mean_rel": float(rel.mean()),
        "final100_ours": float(L[-100:].mean()),
        "final100_ref": float(R[-100:].mean()),
        "final100_rel": float(abs(L[-100:].mean() - R[-100:].mean())
                              / R[-100:].mean()),
        "final_dead_pct": float(dead_pct[-1]),
        "curve_stride": stride,
        "curve_ours": [round(float(v), 4) for v in L[::stride]],
        "curve_ref": [round(float(v), 4) for v in R[::stride]],
        "curve_dead_pct": [round(float(v), 4) for v in dead_pct[::stride]],
    }
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "convergence_parity_topk.json")
    with open(out_path, "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps({k: v for k, v in record.items()
                      if not k.startswith("curve")}, indent=1))


if __name__ == "__main__":
    main()
