"""Concurrent per-layer SAE sweep: K SAEs trained in ONE vmapped jit step.

New capability beyond the reference (BASELINE.json "per-layer SAE sweep
(4 layers trained concurrently, data-parallel)"): the same SAE recipe applied
to K different capture layers trains as a single device program — parameters,
optimizer state and dead-feature counters carry a leading layer axis, the
per-layer batches stack to (K, B, T, d), and ``jax.vmap`` of the train step
runs all K updates concurrently (each still data-parallel over the mesh
batch axis underneath).
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.loaders import MemoryMappedActivationLoader
from ..data.prefetch import prefetch_iter as _prefetch
from ..models.sae import config as sae_config
from ..models.sae import l1 as l1_mod
from ..models.sae import topk as topk_mod
from ..models.sae.serialize import state_dict_from_params
from .optim import make_optimizer


class SAESweepTrainer:
    """K identical-recipe SAEs over K activation streams, one jit step."""

    def __init__(
        self,
        variant: str,
        autoencoder_config: dict,
        activation_size: int,
        n_models: int,
        optimizer: str = "radam",
        scheduler: str = "cosine",
        scheduler_params: Optional[dict] = None,
        lr: float = 1e-4,
        weight_decay: float = 0.0,
        steps: int = 1000,
        clip_thresh: float = 1.0,
        seed: int = 0,
        amp: bool = True,
        mesh=None,
    ):
        assert variant in ("l1", "topk")
        self.variant = variant
        self.raw_config = dict(autoencoder_config)
        self.cfg = sae_config.config_for_variant(variant, autoencoder_config)
        self.n_models = n_models
        self.activation_size = activation_size
        self.n_dict_components = sae_config.get_n_dict_components(
            activation_size, self.cfg.expansion_factor, self.cfg.n_dict_components
        )
        threshold = float(autoencoder_config.get("dead_feature_threshold", 1e6))
        mm_dtype = jnp.bfloat16 if amp else None

        from ..parallel import mesh as mesh_lib

        self.mesh = mesh if mesh is not None else mesh_lib.make_mesh()
        init = l1_mod.init_l1 if variant == "l1" else topk_mod.init_topk
        singles = [init(activation_size, self.cfg, seed=seed + i) for i in range(n_models)]
        self.params = jax.tree_util.tree_map(
            lambda *leaves: jnp.stack(leaves), *singles
        )
        # replicate stacked params/opt-state/counters over the mesh; the
        # per-layer BATCH axis (axis 1 of the (K, B, T, d) stack) shards over
        # ``data`` in train_step — without explicit placement the whole sweep
        # silently ran on the default device only
        self.params = jax.device_put(self.params, mesh_lib.replicated(self.mesh))
        self.tx, self.schedule = make_optimizer(
            optimizer, scheduler, lr, steps,
            weight_decay=weight_decay, clip_thresh=clip_thresh,
            scheduler_params=scheduler_params,
        )
        self.opt_state = jax.device_put(
            jax.vmap(self.tx.init)(self.params), mesh_lib.replicated(self.mesh))
        self.counters = jax.device_put(
            jnp.zeros((n_models, self.n_dict_components), jnp.int32),
            mesh_lib.replicated(self.mesh))
        self.step = 0
        cfg, tx = self.cfg, self.tx

        if variant == "l1":

            def one(params, opt_state, counter, batch):
                params = l1_mod.normalize_columns(params)

                def loss_fn(p):
                    out = l1_mod.forward(
                        p, batch, cfg, pre_normalized=True, matmul_dtype=mm_dtype
                    )
                    return out.reconstruction_loss + out.l1_loss, out

                (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return params, opt_state, counter, {
                    "loss": loss,
                    "loss_recon": out.reconstruction_loss,
                    "loss_l1": out.l1_loss,
                }

        else:

            def one(params, opt_state, counter, batch):
                dead_mask = counter > threshold

                def loss_fn(p):
                    terms, fired = topk_mod.training_losses(
                        p, batch, cfg, dead_mask, matmul_dtype=mm_dtype
                    )
                    loss = terms["fvu"] + terms["auxk_loss"] + terms["multi_topk_fvu"] / 8
                    return loss, (terms, fired)

                (loss, (out, fired)), grads = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(params)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                counter = topk_mod.age_counters(
                    counter, fired, batch.shape[0] * batch.shape[1]
                )
                return params, opt_state, counter, {"loss": loss, "fvu": out["fvu"]}

        self._step = jax.jit(jax.vmap(one), donate_argnums=(0, 1, 2))

    def train_step(self, batches: np.ndarray) -> dict:
        """``batches``: (K, B, T, activation_size) — the per-layer batch axis
        (axis 1) shards over the mesh's data axis when divisible."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel import mesh as mesh_lib

        assert batches.shape[0] == self.n_models
        batches = np.asarray(batches)
        n_data = self.mesh.shape[mesh_lib.DATA_AXIS]
        spec = (P(None, mesh_lib.DATA_AXIS, None, None)
                if batches.shape[1] % n_data == 0 else P())
        dev = jax.device_put(batches, NamedSharding(self.mesh, spec))
        self.params, self.opt_state, self.counters, metrics = self._step(
            self.params, self.opt_state, self.counters, dev
        )
        self.step += 1
        return metrics

    def save_all(self, out_dir: str, layer_names: Sequence[str], hparams: dict) -> None:
        """One reference-format checkpoint per layer."""
        from ..models.sae.serialize import save_checkpoint

        out = Path(out_dir)
        out.mkdir(parents=True, exist_ok=True)
        for i, layer in enumerate(layer_names):
            single = jax.tree_util.tree_map(lambda leaf: leaf[i], self.params)
            save_checkpoint(
                str(out / f"{layer}.pth"),
                {
                    "model": state_dict_from_params(self.variant, single),
                    "step": self.step,
                    "best_val_loss": float("inf"),
                    "hparams": {**hparams, "layer_name": layer},
                },
            )


def train_sweep(
    data_path: str,
    layer_names: Sequence[str],
    variant: str,
    autoencoder_config: dict,
    steps: int,
    batch_size: int,
    out_dir: str,
    lr: float = 1e-4,
    optimizer: str = "adam",
    scheduler: str = "linear",
    scheduler_params: Optional[dict] = None,
    seed: int = 0,
    verbose: bool = True,
) -> dict:
    """Train one SAE per layer store (all under ``data_path``) concurrently."""
    loaders = [
        MemoryMappedActivationLoader(
            data_path, layer, batch_size, shuffle=True, drop_last=True, seed=seed
        )
        for layer in layer_names
    ]
    act_size = loaders[0].activation_shape[-1]
    assert all(ld.activation_shape[-1] == act_size for ld in loaders), (
        "sweep layers must share an activation width"
    )
    trainer = SAESweepTrainer(
        variant, autoencoder_config, act_size, len(layer_names),
        optimizer=optimizer, scheduler=scheduler, scheduler_params=scheduler_params,
        lr=lr, steps=steps, seed=seed,
    )
    for ld in loaders:
        if len(ld) == 0:
            raise ValueError(
                f"layer store yields no batches at batch_size={batch_size} "
                "(fewer files than one batch with drop_last) — shrink the "
                "batch or grow the store"
            )
    # double-buffered prefetch per layer stream: disk reads + host staging of
    # batch N+1 overlap step N (same discipline as the single trainer)
    iters = [_prefetch(iter(ld)) for ld in loaders]
    metrics = {}
    last = {}
    while trainer.step < steps:
        batch = []
        for i, (ld, it) in enumerate(zip(loaders, iters)):
            try:
                arrays = next(it)
            except StopIteration:
                iters[i] = it = _prefetch(iter(ld))
                arrays = next(it)
            batch.append(np.asarray(arrays[0], np.float32))
        metrics = trainer.train_step(np.stack(batch))
        if verbose and trainer.step % 10 == 0:
            # metric fetch only on the log interval — an unconditional
            # device→host conversion would sync every step (RTT-bound on
            # tunneled backends)
            last = {k: np.asarray(v).tolist()
                    for k, v in jax.device_get(metrics).items()}
            print(f"sweep step {trainer.step}: loss {last['loss']}")
    if metrics:
        last = {k: np.asarray(v).tolist()
                for k, v in jax.device_get(metrics).items()}
    hparams = {
        "autoencoder_variant": variant,
        "autoencoder_config": autoencoder_config,
        "activation_size": act_size,
    }
    trainer.save_all(out_dir, layer_names, hparams)
    return {"steps": trainer.step, "final": last, "out_dir": out_dir}
