"""Concurrent SAE sweep: K SAEs trained in ONE vmapped jit step.

New capability beyond the reference (BASELINE.json "per-layer SAE sweep
(4 layers trained concurrently, data-parallel)"): parameters, optimizer
state and dead-feature counters carry a leading model axis, the per-model
batches stack to (K, B, T, d), and ``jax.vmap`` of the train step runs all
K updates concurrently (each still data-parallel over the mesh batch axis
underneath). Two sweep shapes share the machinery:

* **per-layer** (``train_sweep``): the same recipe over K capture-layer
  streams — one model per activation store.
* **hyperparameter grid** (``train_hparam_sweep`` / ``model_hparams=``):
  K models with DISTINCT lr / recon_alpha / auxk_alpha over ONE stream.
  These hparams enter the vmapped step as traced per-model scalars — the
  alphas weight separately-returned loss terms (computed with unit alphas,
  so the default path is bit-identical) and lr scales the optax updates
  after the chain (updates are linear in the schedule's lr). ``k`` changes
  the selection SHAPE and must stay static: the grid driver groups models
  by k, one compiled vmapped program per k-group.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.device_cache import sample_rows
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
        model_hparams: Optional[Sequence[dict]] = None,
    ):
        """``model_hparams``: one dict per model with any of
        {"lr", "recon_alpha"} (l1) / {"lr", "auxk_alpha", "k"} (topk);
        missing keys inherit the trainer-level value. All models in ONE
        trainer must share ``k`` (it is a selection shape); use
        ``train_hparam_sweep`` to grid over k via k-groups."""
        assert variant in ("l1", "topk")
        self.variant = variant
        self.raw_config = dict(autoencoder_config)
        self.cfg = sae_config.config_for_variant(variant, autoencoder_config)
        self.model_hparams = None
        if model_hparams is not None:
            if len(model_hparams) != n_models:
                raise ValueError(
                    f"{len(model_hparams)} hparam dicts for {n_models} models")
            allowed = ({"lr", "recon_alpha"} if variant == "l1"
                       else {"lr", "auxk_alpha", "k"})
            for hp in model_hparams:
                bad = set(hp) - allowed
                if bad:
                    raise ValueError(
                        f"unsupported sweep hparam(s) {sorted(bad)}; "
                        f"{variant} sweeps vary {sorted(allowed)}")
            ks = {hp.get("k", self.cfg.k) for hp in model_hparams} \
                if variant == "topk" else set()
            if len(ks) > 1:
                raise ValueError(
                    f"models in one sweep trainer must share k (got {sorted(ks)});"
                    " group by k (train_hparam_sweep does)")
            if ks:
                self.cfg.k = int(next(iter(ks)))
                self.raw_config["k"] = self.cfg.k
            self.model_hparams = [dict(hp) for hp in model_hparams]
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
        # per-model lr rides OUTSIDE the optax chain (updates are linear in
        # the schedule's lr: chain = clip → radam/adam → lr·shape(count)·u),
        # so the chain is built at unit lr and each model's updates scale by
        # its absolute lr in the vmapped step
        self.tx, self.schedule = make_optimizer(
            optimizer, scheduler,
            1.0 if self.model_hparams is not None else lr, steps,
            weight_decay=weight_decay, clip_thresh=clip_thresh,
            scheduler_params=scheduler_params,
        )
        self._hp = None
        if self.model_hparams is not None:
            hp = {"lr": jnp.asarray(
                [h.get("lr", lr) for h in self.model_hparams], jnp.float32)}
            if variant == "l1":
                hp["recon_alpha"] = jnp.asarray(
                    [h.get("recon_alpha", self.cfg.recon_alpha)
                     for h in self.model_hparams], jnp.float32)
            else:
                hp["auxk_alpha"] = jnp.asarray(
                    [h.get("auxk_alpha", self.cfg.auxk_alpha)
                     for h in self.model_hparams], jnp.float32)
            self._hp = hp
        self.opt_state = jax.device_put(
            jax.vmap(self.tx.init)(self.params), mesh_lib.replicated(self.mesh))
        self.counters = jax.device_put(
            jnp.zeros((n_models, self.n_dict_components), jnp.int32),
            mesh_lib.replicated(self.mesh))
        self.step = 0
        cfg, tx = self.cfg, self.tx
        has_hp = self._hp is not None
        if has_hp:
            # unit-alpha config: loss TERMS come out unweighted and the
            # traced per-model alphas weight them in the loss — multiplying
            # by the default alpha afterwards is the same arithmetic the
            # baked-in path performs, so defaults stay bit-identical
            import dataclasses

            cfg = (dataclasses.replace(cfg, recon_alpha=1.0)
                   if variant == "l1"
                   else dataclasses.replace(cfg, auxk_alpha=1.0))

        def scaled_apply(params, grads, opt_state, hp):
            updates, opt_state = tx.update(grads, opt_state, params)
            if has_hp:
                updates = jax.tree_util.tree_map(
                    lambda u: u * hp["lr"], updates)
            return optax.apply_updates(params, updates), opt_state

        if variant == "l1":

            def one(params, opt_state, counter, batch, hp):
                params = l1_mod.normalize_columns(params)

                def loss_fn(p):
                    out = l1_mod.forward(
                        p, batch, cfg, pre_normalized=True, matmul_dtype=mm_dtype
                    )
                    recon = out.reconstruction_loss
                    if has_hp:
                        recon = hp["recon_alpha"] * recon
                    return recon + out.l1_loss, (out, recon)

                ((loss, (out, recon)), grads) = jax.value_and_grad(
                    loss_fn, has_aux=True)(params)
                params, opt_state = scaled_apply(params, grads, opt_state, hp)
                return params, opt_state, counter, {
                    "loss": loss,
                    "loss_recon": recon,
                    "loss_l1": out.l1_loss,
                }

        else:

            def one(params, opt_state, counter, batch, hp):
                dead_mask = counter > threshold

                def loss_fn(p):
                    terms, fired = topk_mod.training_losses(
                        p, batch, cfg, dead_mask, matmul_dtype=mm_dtype
                    )
                    auxk = terms["auxk_loss"]
                    if has_hp:
                        auxk = hp["auxk_alpha"] * auxk
                    loss = terms["fvu"] + auxk + terms["multi_topk_fvu"] / 8
                    return loss, (terms, fired)

                (loss, (out, fired)), grads = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(params)
                params, opt_state = scaled_apply(params, grads, opt_state, hp)
                counter = topk_mod.age_counters(
                    counter, fired, batch.shape[0] * batch.shape[1]
                )
                return params, opt_state, counter, {"loss": loss, "fvu": out["fvu"]}

        self._one = one
        self._chunk_fns: dict = {}
        self._step = jax.jit(jax.vmap(one), donate_argnums=(0, 1, 2))
        # shared-batch variant: ONE (B, T, d) batch feeds every model
        # (batch in_axes=None — no K× host copy, no K× transfer; the
        # hyperparameter grid's whole point is K recipes over one stream)
        self._step_shared = jax.jit(
            jax.vmap(one, in_axes=(0, 0, 0, None, 0)),
            donate_argnums=(0, 1, 2))
        # hp placeholder so the vmapped arity is fixed; the no-hparam path
        # never reads it
        if self._hp is None:
            self._hp = {"lr": jnp.ones((n_models,), jnp.float32)}
        self._hp = jax.device_put(self._hp, mesh_lib.replicated(self.mesh))

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
            self.params, self.opt_state, self.counters, dev, self._hp
        )
        self.step += 1
        return metrics

    def train_step_shared(self, batch: np.ndarray) -> dict:
        """One (B, T, activation_size) batch trains ALL K models (the
        hyperparameter-grid stream): the batch is device_put ONCE (sharded
        over ``data`` when divisible) and broadcast to the model axis inside
        the vmapped step — no K× host copy or transfer."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel import mesh as mesh_lib

        batch = np.asarray(batch)
        n_data = self.mesh.shape[mesh_lib.DATA_AXIS]
        spec = (P(mesh_lib.DATA_AXIS, None, None)
                if batch.shape[0] % n_data == 0 else P())
        dev = jax.device_put(batch, NamedSharding(self.mesh, spec))
        self.params, self.opt_state, self.counters, metrics = (
            self._step_shared(
                self.params, self.opt_state, self.counters, dev, self._hp))
        self.step += 1
        return metrics

    def _build_chunk_shared(self, n_steps: int, batch_size: int):
        from ..parallel import mesh as mesh_lib

        one, mesh = self._one, self.mesh
        constrain = (
            mesh is not None and mesh.size > 1
            and batch_size % mesh.shape[mesh_lib.DATA_AXIS] == 0
        )
        vstep = jax.vmap(one, in_axes=(0, 0, 0, None, 0))

        def chunk_fn(params, opt_state, counters, cache, key, hp):
            def body(carry, _):
                params, opt_state, counters, key = carry
                # THE sampling sequence (device_cache.sample_rows): the
                # fused stream is bit-identical to per-step next_batch
                x, key = sample_rows(cache, key, batch_size)
                if constrain:
                    x = jax.lax.with_sharding_constraint(
                        x, mesh_lib.batch_sharding(mesh, x.ndim))
                params, opt_state, counters, metrics = vstep(
                    params, opt_state, counters, x, hp)
                return (params, opt_state, counters, key), metrics

            (params, opt_state, counters, key), ms = jax.lax.scan(
                body, (params, opt_state, counters, key), xs=None,
                length=n_steps)
            last = jax.tree_util.tree_map(lambda m: m[-1], ms)
            return params, opt_state, counters, key, last

        return jax.jit(chunk_fn, donate_argnums=(0, 1, 2))

    def train_chunk_shared(self, cache_state, batch_size: int,
                           n_steps: int) -> tuple:
        """``n_steps`` fused shared-batch steps sampling from a device
        shuffle cache INSIDE one scanned program (the same split/randint/
        take stream as ``DeviceShuffleCache.next_batch``). ``cache_state``
        is the ``(cache, key)`` pair from ``cache.sample_state()`` — the
        grid driver snapshots it ONCE per chunk so every k-group trains on
        the identical stream, then hands the returned key back via
        ``cache.set_key``. Returns ``(last-step metrics, advanced key)``."""
        fn = self._chunk_fns.get((n_steps, batch_size))
        if fn is None:
            fn = self._chunk_fns[(n_steps, batch_size)] = (
                self._build_chunk_shared(n_steps, batch_size))
        cache_arr, key = cache_state
        (self.params, self.opt_state, self.counters, key, metrics) = fn(
            self.params, self.opt_state, self.counters, cache_arr, key,
            self._hp)
        self.step += n_steps
        return metrics, key

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


def expand_grid(grid: dict) -> list[dict]:
    """{"lr": [a, b], "k": [2, 4]} → the 4 combination dicts (sorted keys,
    row-major over the given value orders)."""
    keys = sorted(grid)
    combos = [{}]
    for key in keys:
        vals = grid[key]
        if not isinstance(vals, (list, tuple)):
            vals = [vals]
        combos = [{**c, key: v} for c in combos for v in vals]
    return combos


def _hp_tag(hp: dict) -> str:
    return "_".join(f"{k}{hp[k]:g}" if isinstance(hp[k], float)
                    else f"{k}{hp[k]}" for k in sorted(hp)) or "base"


def train_hparam_sweep(
    data_path: str,
    layer_name: str,
    variant: str,
    autoencoder_config: dict,
    grid: dict,
    steps: int,
    batch_size: int,
    out_dir: str,
    lr: float = 1e-4,
    optimizer: str = "adam",
    scheduler: str = "linear",
    scheduler_params: Optional[dict] = None,
    seed: int = 0,
    verbose: bool = True,
    device_cache_files: int = 0,
    fused_steps: int = 10,
    device_cache_dtype: str = "float32",
) -> dict:
    """Hyperparameter-grid sweep over ONE layer store: every grid point is a
    model in a vmapped trainer, all fed the SAME batch stream (one mmap read
    per step regardless of K). ``k`` (topk) is a selection shape, so models
    group by k — one compiled vmapped program per k value; lr / recon_alpha /
    auxk_alpha vary as traced per-model scalars inside each program.
    Checkpoints land at ``<out_dir>/<hparam-tag>.pth`` (reference format).

    ``device_cache_files > 0`` feeds the sweep from a device shuffle cache
    with ``fused_steps`` steps fused per dispatch (train_chunk_shared);
    every k-group consumes the identical sampled stream (the cache key is
    snapshotted per chunk and advanced once).
    """
    combos = expand_grid(grid)
    groups: dict[object, list[dict]] = {}
    for hp in combos:
        groups.setdefault(hp.get("k"), []).append(hp)

    loader = MemoryMappedActivationLoader(
        data_path, layer_name, batch_size, shuffle=True, drop_last=True,
        seed=seed, resample_padding=layer_name.startswith("decoder."))
    if len(loader) == 0:
        raise ValueError(
            f"layer store yields no batches at batch_size={batch_size}")
    act_size = loader.activation_shape[-1]

    trainers = {
        k: SAESweepTrainer(
            variant, autoencoder_config, act_size, len(hps),
            optimizer=optimizer, scheduler=scheduler,
            scheduler_params=scheduler_params, lr=lr, steps=steps, seed=seed,
            model_hparams=hps,
        )
        for k, hps in groups.items()
    }

    # k-group -> device array of per-model last-step losses, held lazily
    # (no fetch) every step; ONE device_get at the end feeds the returned
    # per-model ``final_loss`` regardless of ``verbose``
    last: dict = {}

    def _shown() -> dict:
        return {str(k): np.asarray(jax.device_get(v)).tolist()
                for k, v in last.items()}

    step = 0
    if device_cache_files:
        from ..data.device_cache import DeviceShuffleCache

        fused = max(int(fused_steps), 1)
        cache = DeviceShuffleCache(
            data_path, layer_name, device_cache_files, seed=seed,
            cache_dtype=device_cache_dtype)
        try:
            while step < steps:
                if steps - step >= fused and fused > 1:
                    state = cache.sample_state()
                    for k, tr in trainers.items():
                        m, new_key = tr.train_chunk_shared(
                            state, batch_size, fused)
                        last[k] = m["loss"]
                    cache.set_key(new_key)
                    step += fused
                else:
                    # tail shorter than a chunk: per-step (a tail-sized
                    # chunk would compile a fresh program per k-group)
                    x = cache.next_batch(batch_size)
                    for k, tr in trainers.items():
                        m = tr.train_step_shared(np.asarray(x))
                        last[k] = m["loss"]
                    step += 1
                if verbose:
                    print(f"hparam sweep step {step}: loss {_shown()}")
        finally:
            cache.close()
    else:
        it = _prefetch(iter(loader))
        while step < steps:
            try:
                arrays = next(it)
            except StopIteration:
                it = _prefetch(iter(loader))
                arrays = next(it)
            x = np.asarray(arrays[0], np.float32)
            for k, tr in trainers.items():
                m = tr.train_step_shared(x)
                last[k] = m["loss"]
            step += 1
            if verbose and step % 10 == 0:
                print(f"hparam sweep step {step}: loss {_shown()}")
    from ..models.sae.serialize import save_checkpoint

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    final_losses = {k: np.asarray(jax.device_get(v)).reshape(-1)
                    for k, v in last.items()}
    results = []
    for k, tr in trainers.items():
        for i, hp in enumerate(groups[k]):
            tag = _hp_tag(hp)
            single = jax.tree_util.tree_map(lambda leaf: leaf[i], tr.params)
            # the stored config carries THIS model's grid values so a later
            # sae_from_checkpoint reconstructs the exact recipe
            cfg_out = {**tr.raw_config,
                       **{kk: v for kk, v in hp.items() if kk != "lr"}}
            save_checkpoint(
                str(out / f"{tag}.pth"),
                {
                    "model": state_dict_from_params(variant, single),
                    "step": tr.step,
                    "best_val_loss": float("inf"),
                    "hparams": {
                        "autoencoder_variant": variant,
                        "autoencoder_config": cfg_out,
                        "activation_size": act_size,
                        "layer_name": layer_name,
                        "lr": hp.get("lr", lr),
                    },
                },
            )
            row = {"tag": tag, **hp}
            if k in final_losses:
                row["final_loss"] = float(final_losses[k][i])
            results.append(row)
    return {"steps": step, "models": results, "out_dir": out_dir}


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
            data_path, layer, batch_size, shuffle=True, drop_last=True,
            seed=seed, resample_padding=layer.startswith("decoder."),
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
