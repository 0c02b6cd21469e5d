"""Recipe-scale convergence-parity artifact (VERDICT r3 item 3).

Runs the tiny_l1 hyperparameters (recon_alpha 1e4, RAdam eps 1e-5 + cosine,
clip 1.0, lr 4e-4) for N steps through BOTH the reference torch loop
(/root/reference src/scripts/train_sae.py:417-451 semantics, executed in
place) and SAETrainer, from the same init over the same synthetic data
stream, and records the two loss curves + divergence summary to
tools/convergence_parity.json. The in-suite assertion lives in
tests/test_reference_differential.py::test_l1_convergence_parity_recipe_scale;
this script is the inspectable curve record.

Usage: python tools/convergence_parity.py [steps=2000]
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
import torch

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"
sys.path.insert(0, REPO)


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
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    _install_stub("simple_parsing",
                  {"Serializable": type("Serializable", (), {})})
    _install_stub("whisper")
    sys.path.insert(0, REFERENCE)
    from src.models import l1autoencoder as ref_l1

    from freud_tpu.models.sae import L1Params
    from freud_tpu.train.trainer import SAETrainer
    import jax.numpy as jnp

    d_act, n_dict, recon_alpha, lr = 384, 200, 1e4, 4e-4
    torch.manual_seed(0)
    cfg = ref_l1.L1AutoEncoderConfig(
        n_dict_components=n_dict, recon_alpha=recon_alpha)
    model = ref_l1.L1AutoEncoder(d_act, cfg)
    t_opt = torch.optim.RAdam(
        model.parameters(), eps=1e-5, lr=lr, weight_decay=0.0)
    t_sched = torch.optim.lr_scheduler.CosineAnnealingLR(
        t_opt, T_max=steps, eta_min=0)

    trainer = SAETrainer(
        "l1", {"n_dict_components": n_dict, "recon_alpha": recon_alpha},
        d_act, optimizer="radam", scheduler="cosine", lr=lr, steps=steps,
        clip_thresh=1.0, amp=False,
    )
    trainer.params = L1Params(
        W=jnp.asarray(model.decoder.weight.detach().numpy().copy()),
        encoder_bias=jnp.asarray(
            model.encoder_bias.detach().numpy().copy()),
    )

    gt = np.random.default_rng(42).standard_normal((32, d_act)).astype(
        np.float32)
    gt /= np.linalg.norm(gt, axis=1, keepdims=True)

    def batch(step):
        r = np.random.default_rng((42, step))
        codes = r.exponential(1.0, (2, 64, 32)).astype(np.float32)
        codes[r.random((2, 64, 32)) < 0.85] = 0.0
        return (codes @ gt + 0.01 * r.standard_normal(
            (2, 64, d_act)).astype(np.float32)).astype(np.float32)

    losses, ref_losses = [], []
    t0 = time.perf_counter()
    for s in range(steps):
        x = batch(s)
        t_opt.zero_grad()
        out = model(torch.from_numpy(x))
        t_loss = out.reconstruction_loss + out.l1_loss
        t_loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 1.0)
        t_opt.step()
        t_sched.step()
        ref_losses.append(t_loss.item())
        losses.append(float(trainer.train_step(x)["loss"]))
    wall = time.perf_counter() - t0

    L, R = np.asarray(losses), np.asarray(ref_losses)
    rel = np.abs(L - R) / np.abs(R)
    stride = max(1, steps // 200)
    record = {
        "steps": steps,
        "hparams": {"d_act": d_act, "n_dict": n_dict,
                    "recon_alpha": recon_alpha, "lr": lr,
                    "optimizer": "radam eps=1e-5", "scheduler": "cosine",
                    "clip": 1.0, "rows_per_step": 128},
        "wall_s": round(wall, 1),
        "max_rel_per_step": float(rel.max()),
        "mean_rel": float(rel.mean()),
        "final100_ours": float(L[-100:].mean()),
        "final100_ref": float(R[-100:].mean()),
        "final100_rel": float(abs(L[-100:].mean() - R[-100:].mean())
                              / R[-100:].mean()),
        "curve_stride": stride,
        "curve_ours": [round(float(v), 4) for v in L[::stride]],
        "curve_ref": [round(float(v), 4) for v in R[::stride]],
    }
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "convergence_parity.json")
    with open(out_path, "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps({k: v for k, v in record.items()
                      if not k.startswith("curve")}, indent=1))


if __name__ == "__main__":
    main()
