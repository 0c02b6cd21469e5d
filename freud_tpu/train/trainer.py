"""pjit data-parallel SAE trainer.

Behavioral parity with the reference trainer (src/scripts/train_sae.py:297-602)
— same config surface, loss arithmetic, optimizer/scheduler recipes,
dead-feature bookkeeping, TensorBoard scalar/histogram/text/audio layout,
periodic + best-val checkpointing — redesigned for TPU:

* the hot loop is ONE donated jit program (forward, losses, backward, clip,
  optimizer, dead-counter scatter) with the batch sharded over the mesh's
  ``data`` axis; XLA inserts the gradient all-reduce over ICI. The reference
  runs eager torch with autocast + per-step host sync.
* host input is a double-buffered prefetch thread over the mmap store, so
  device-put of batch N+1 overlaps step N.
* validation is a vmapped batch-of-files program computing the reference's
  per-file (batch-size-1) statistics in one dispatch per chunk.
* ``num_frames_since_fired`` lives on device as part of the carried state.

Quirks *not* replicated (documented divergences): the stray whole-module
pickle at ``run_dir + "/mo.bestval"`` (reference train_sae.py:370,594 —
a ``model_out[:-3]`` path bug) and CUDA-autocast-specific dtype behavior
(precision here is explicit: f32 params, configurable compute dtype).
"""

from __future__ import annotations

import json
import os
import random
import time
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .. import profiling
from ..constants import get_n_mels
from ..audio.mel import mels_from_array
from ..audio.decode import load_audio
from ..data import device_cache as device_cache_mod
from ..data.loaders import init_dataloader, resample_padding_rows
from ..data.prefetch import prefetch_iter as _prefetch
from ..models.sae import config as sae_config
from ..models.sae import l1 as l1_mod
from ..models.sae import topk as topk_mod
from ..parallel import mesh as mesh_lib
from .checkpoint import (
    AsyncCheckpointWriter,
    load_trainer_checkpoint,
    save_trainer_checkpoint,
)
from .optim import make_optimizer

N_TRANSCRIPTS = 4


@jax.jit
def _snapshot_tree(tree):
    """Fresh device buffers for every leaf (see SAETrainer.save_async).
    ``jnp.copy`` under jit lowers to an XLA copy whose output cannot alias
    the non-donated input, so the result survives a later step's buffer
    donation."""
    return jax.tree_util.tree_map(jnp.copy, tree)


def _to_torch(arr: np.ndarray):
    from ..models.sae.serialize import _torch

    return _torch().from_numpy(np.asarray(arr).copy())


def set_seeds(seed: int = 42) -> None:
    np.random.seed(seed)
    random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)


class SAETrainer:
    """Owns params/opt-state and the compiled train/val steps for one SAE."""

    def __init__(
        self,
        variant: str,
        autoencoder_config: dict,
        activation_size: int,
        optimizer: str = "radam",
        scheduler: str = "cosine",
        scheduler_params: Optional[dict] = None,
        lr: float = 1e-4,
        weight_decay: float = 0.0,
        steps: int = 1000,
        clip_thresh: float = 1.0,
        seed: int = 0,
        mesh=None,
        shard_dict: bool = False,
        amp: bool = True,
    ):
        assert variant in ("l1", "topk"), (
            f"Invalid autoencoder variant: {variant}, must be 'l1' or 'topk'"
        )
        self.variant = variant
        self.raw_config = dict(autoencoder_config)
        self.cfg = sae_config.config_for_variant(variant, autoencoder_config)
        self.activation_size = activation_size
        self.mesh = mesh if mesh is not None else mesh_lib.make_mesh()
        self.dead_feature_threshold = float(
            autoencoder_config.get("dead_feature_threshold", 1e6)
        )
        self.amp = amp

        if variant == "l1":
            self.params = l1_mod.init_l1(activation_size, self.cfg, seed=seed)
        else:
            self.params = topk_mod.init_topk(activation_size, self.cfg, seed=seed)
        self.n_dict_components = sae_config.get_n_dict_components(
            activation_size, self.cfg.expansion_factor, self.cfg.n_dict_components
        )

        self.tx, self.schedule = make_optimizer(
            optimizer, scheduler, lr, steps,
            weight_decay=weight_decay, clip_thresh=clip_thresh,
            scheduler_params=scheduler_params,
        )
        self.num_frames_since_fired = jnp.zeros((self.n_dict_components,), jnp.int32)
        self.step = 0
        self.best_val_loss = float("inf")

        self._replicate = mesh_lib.replicated(self.mesh)
        self._param_sharding = self._replicate
        if shard_dict:
            # Tensor-parallel over the dictionary axis (model axis of the
            # mesh): L1 W is (act, n_dict) → shard axis 1; TopK weights are
            # (n_dict, d_in) → shard axis 0. XLA inserts the gathers/psums.
            if variant == "l1":
                self._param_sharding = type(self.params)(
                    W=mesh_lib.dict_sharding(self.mesh, 1, 2),
                    encoder_bias=mesh_lib.dict_sharding(self.mesh, 0, 1),
                )
            else:
                self._param_sharding = type(self.params)(
                    encoder_weight=mesh_lib.dict_sharding(self.mesh, 0, 2),
                    encoder_bias=mesh_lib.dict_sharding(self.mesh, 0, 1),
                    W_dec=mesh_lib.dict_sharding(self.mesh, 0, 2),
                    b_dec=self._replicate,
                )
        self.params = jax.device_put(self.params, self._param_sharding)
        # Explicitly place every opt-state leaf: moment buffers (the
        # param-mirroring subtrees optax builds, e.g. ScaleByAdamState.mu/nu)
        # take their parameter's sharding LEAF-FOR-LEAF via treedef matching
        # — a shape-keyed lookup would collide when two params share a shape
        # with different shardings (n_dict == d_in under shard_dict) and
        # silently place one's moments on the other's sharding. Scalars and
        # anything non-mirroring replicate.
        flat_params, param_treedef = jax.tree_util.tree_flatten(self.params)
        param_shapes = [np.shape(p) for p in flat_params]
        sharding_mirror = jax.tree_util.tree_unflatten(
            param_treedef, [p.sharding for p in flat_params]
        )

        def _is_param_mirror(node):
            try:
                flat, td = jax.tree_util.tree_flatten(node)
            except Exception:  # noqa: BLE001 — unflattenable → not a mirror
                return False
            return (td == param_treedef
                    and [np.shape(a) for a in flat] == param_shapes)

        raw_state = self.tx.init(self.params)
        self.opt_state = jax.device_put(
            raw_state,
            jax.tree_util.tree_map(
                lambda n: sharding_mirror if _is_param_mirror(n)
                else self._replicate,
                raw_state, is_leaf=_is_param_mirror,
            ),
        )

        self._step_fn = self._build_step_fn()
        self._train_step = jax.jit(self._step_fn, donate_argnums=(0, 1, 2))
        self._chunk_fns: dict = {}
        self._pod_samplers: dict = {}
        self._pod_chunk_fns: dict = {}
        self._val_step = self._build_val_step()

    # ------------------------------------------------------------- compile

    def _build_step_fn(self):
        cfg, tx, variant = self.cfg, self.tx, self.variant
        threshold = self.dead_feature_threshold
        # bf16 matmuls in the train step — the analogue of the reference's
        # CUDA autocast (train_sae.py:431); losses/updates stay f32.
        mm_dtype = jnp.bfloat16 if self.amp else None

        if variant == "l1":

            def step_fn(params, opt_state, counter, batch):
                params = l1_mod.normalize_columns(params)

                def loss_fn(p):
                    out = l1_mod.forward(
                        p, batch, cfg, pre_normalized=True, matmul_dtype=mm_dtype
                    )
                    return out.reconstruction_loss + out.l1_loss, out

                (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                metrics = {
                    "loss": loss,
                    "loss_recon": out.reconstruction_loss,
                    "loss_l1": out.l1_loss,
                }
                return params, opt_state, counter, metrics

        else:

            def step_fn(params, opt_state, counter, batch):
                dead_mask = counter > threshold

                def loss_fn(p):
                    # the fused forward kernel carries a GSPMD sharding rule
                    # (rows partition over the data axis), so it is preferred
                    # on any mesh; training_losses falls back to the XLA
                    # formulation for multi_topk / non-bf16 precision
                    terms, fired = topk_mod.training_losses(
                        p, batch, cfg, dead_mask, matmul_dtype=mm_dtype,
                    )
                    loss = terms["fvu"] + terms["auxk_loss"] + terms["multi_topk_fvu"] / 8
                    return loss, (terms, fired)

                (loss, (out, fired)), grads = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(params)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                frames = batch.shape[0] * batch.shape[1]
                counter = topk_mod.age_counters(counter, fired, frames)
                metrics = {
                    "loss": loss,
                    "fvu": out["fvu"],
                    "auxk_loss": out["auxk_loss"],
                    "multi_topk_fvu": out["multi_topk_fvu"],
                    "dead_pct": jnp.mean(dead_mask.astype(jnp.float32)),
                }
                return params, opt_state, counter, metrics

        return step_fn

    def _build_train_chunk(self, n_steps: int, batch_size: int):
        """ONE compiled program running ``n_steps`` train steps with the
        batch sampled from a device-resident cache INSIDE a ``lax.scan`` —
        the per-step host dispatch (the floor of the through-cache rate on
        slow-dispatch backends; ROADMAP round-3 cadence fixes) is paid once
        per chunk. The sample is the same split/randint/take sequence as
        ``device_cache._sample``, chained through the scan carry, so the
        fused path draws the identical batch stream as per-step training."""
        step_fn = self._step_fn
        mesh = self.mesh
        constrain = (
            mesh is not None and mesh.size > 1
            and batch_size % mesh.shape[mesh_lib.DATA_AXIS] == 0
        )

        def chunk_fn(params, opt_state, counter, cache, key):
            def body(carry, _):
                params, opt_state, counter, key = carry
                # THE sampling sequence (device_cache.sample_rows): the
                # fused stream is bit-identical to per-step next_batch
                x, key = device_cache_mod.sample_rows(cache, key, batch_size)
                if constrain:
                    # keep the step data-parallel: the gather from the
                    # replicated cache is local-per-device, the constraint
                    # splits the batch over the data axis exactly as
                    # put_batch does on the per-step path
                    x = jax.lax.with_sharding_constraint(
                        x, mesh_lib.batch_sharding(mesh, x.ndim))
                params, opt_state, counter, metrics = step_fn(
                    params, opt_state, counter, x)
                return (params, opt_state, counter, key), metrics

            (params, opt_state, counter, key), ms = jax.lax.scan(
                body, (params, opt_state, counter, key), xs=None,
                length=n_steps)
            # the FULL (n_steps,) metric stack comes back (a few scalars per
            # step — trivial D2H): TB log events at log_tb_every need not
            # align with chunk boundaries, the host logs interior steps from
            # the stack, so the chunk can grow to gcd(save, val) cadences
            return params, opt_state, counter, key, ms

        return jax.jit(chunk_fn, donate_argnums=(0, 1, 2))

    def _build_val_step(self):
        cfg, variant = self.cfg, self.variant
        n_dict = self.n_dict_components

        if variant == "l1":

            def per_file(params, x):  # x: (T, d) — one file, batch-size-1 semantics
                out = l1_mod.forward(params, x[None], cfg, pre_normalized=True)
                mse = jnp.mean((out.sae_out[0] - x) ** 2)
                mag = jnp.max(jnp.abs(out.encoded.latent[0]), axis=0)
                return {
                    "recon": out.reconstruction_loss,
                    "l1": out.l1_loss,
                    "mse": mse,
                    "mag": mag,
                    "sae_out": out.sae_out[0],
                }

            def val_fn(params, batch):
                params = l1_mod.normalize_columns(params)
                return jax.vmap(lambda x: per_file(params, x))(batch)

        else:

            def per_file(params, x):
                out = topk_mod.forward(params, x[None], cfg)
                mse = jnp.mean((out.sae_out[0] - x) ** 2)
                # per-feature max |top activation| (reference
                # topk_feature_extraction, train_sae.py:70-118)
                acts = jnp.abs(out.encoded.top_acts[0])  # (T, k)
                idx = out.encoded.top_indices[0]
                mag = jnp.zeros((n_dict,), acts.dtype).at[idx.reshape(-1)].max(
                    acts.reshape(-1)
                )
                return {
                    "fvu": out.fvu,
                    "auxk_loss": out.auxk_loss,
                    "multi_topk_fvu": out.multi_topk_fvu,
                    "mse": mse,
                    "mag": mag,
                    "sae_out": out.sae_out[0],
                }

            def val_fn(params, batch):
                return jax.vmap(lambda x: per_file(params, x))(batch)

        def val_full(params, batch):
            out = val_fn(params, batch)
            # transcript transport head: only the first N_TRANSCRIPTS files'
            # reconstructions ever feed transcripts (validate()), so the
            # fetchable copy is sliced ON DEVICE and cast to bf16 — at
            # large_v1 val shapes this is 61 MB → 15 MB per validation on
            # the host link. The full-precision ``sae_out`` stays available
            # as a device handle for the on-demand fallback (load-audio
            # failures pushing transcript slots past the head).
            out["sae_out_head"] = (
                out["sae_out"][:N_TRANSCRIPTS].astype(jnp.bfloat16))
            return out

        return jax.jit(val_full)

    # -------------------------------------------------------------- public

    def train_step(self, batch: np.ndarray, host_local: bool = False) -> dict:
        if host_local:
            # pod input path: ``batch`` is THIS host's shard of the global
            # batch (loader striding via mesh_lib.host_shard_bounds);
            # assembly is zero-copy-per-host (parallel/mesh.py
            # put_host_batch). Shape/divisibility is enforced by
            # make_array_from_process_local_data itself.
            batch = mesh_lib.put_host_batch(self.mesh, batch)
            (self.params, self.opt_state, self.num_frames_since_fired,
             metrics) = self._train_step(
                self.params, self.opt_state, self.num_frames_since_fired,
                batch)
            self.step += 1
            return metrics
        if self.mesh is not None:
            n_data = self.mesh.shape[mesh_lib.DATA_AXIS]
            b = np.shape(batch)[0]
            if n_data > 1 and b >= n_data and b % n_data:
                # fail loudly: the put_batch replicated fallback is correct
                # but a TRAINING step hitting it every step means the whole
                # run silently loses data parallelism (n_data× memory, 1×
                # speed) — a misconfigured pod batch. Batches SMALLER than
                # the data axis cannot shard at all and stay allowed (smoke
                # runs, tiny recipes) — put_batch still warns once there.
                raise ValueError(
                    f"training batch of {b} is not divisible by the mesh's "
                    f"data axis ({n_data}); pick a divisible train batch "
                    "size (validation tails may be ragged, training batches "
                    "must not be)")
        batch = mesh_lib.put_batch(self.mesh, batch)
        self.params, self.opt_state, self.num_frames_since_fired, metrics = (
            self._train_step(
                self.params, self.opt_state, self.num_frames_since_fired, batch
            )
        )
        self.step += 1
        return metrics

    def train_chunk(self, cache, batch_size: int, n_steps: int) -> dict:
        """Run ``n_steps`` fused train steps sampling from a
        ``DeviceShuffleCache`` in ONE device dispatch (see
        ``_build_train_chunk``). Background cache refresh applies at chunk
        boundaries. Returns the stacked per-step metrics — each value is an
        ``(n_steps,)`` device array (row i = step ``self.step - n_steps +
        1 + i``)."""
        fn = self._chunk_fns.get((n_steps, batch_size))
        if fn is None:
            fn = self._chunk_fns[(n_steps, batch_size)] = (
                self._build_train_chunk(n_steps, batch_size))
        cache_arr, rng = cache.sample_state()
        (self.params, self.opt_state, self.num_frames_since_fired, rng,
         metrics) = fn(
            self.params, self.opt_state, self.num_frames_since_fired,
            cache_arr, rng)
        cache.set_key(rng)
        self.step += n_steps
        return metrics

    def _build_pod_sampler(self, n_steps: int, batch_size: int):
        """HOST-LOCAL program: draw ``n_steps`` consecutive cache batches in
        one dispatch — the identical split/randint/take chain as per-step
        ``next_batch``, stacked on a leading step axis. Rows stay in the
        cache's storage dtype (sample_rows_raw): a bf16 cache stages half
        the bytes; the global chunk program upcasts after slicing."""

        def sampler(cache, key):
            def body(key, _):
                x, key = device_cache_mod.sample_rows_raw(
                    cache, key, batch_size)
                return key, x

            key, xs = jax.lax.scan(body, key, xs=None, length=n_steps)
            return xs, key

        return jax.jit(sampler)

    def _build_train_chunk_pod(self, n_steps: int):
        """GLOBAL program for pod fused training: scan the train step over a
        pre-sampled ``(n_steps, global_batch, T, d)`` stack (axis 1 sharded
        over ``data`` — mesh_lib.put_host_chunk). Sampling cannot fuse into
        this program on a pod: each host's cache holds a DIFFERENT file
        stratum (process-local data), so the sample runs in the host-local
        sampler program and only the step loop is global."""
        step_fn = self._step_fn
        mesh = self.mesh

        def chunk_fn(params, opt_state, counter, batches):
            constrain = (
                mesh is not None and mesh.size > 1
                and batches.shape[1] % mesh.shape[mesh_lib.DATA_AXIS] == 0
            )

            def body(carry, x):
                params, opt_state, counter = carry
                x = x.astype(jnp.float32)
                if constrain:
                    x = jax.lax.with_sharding_constraint(
                        x, mesh_lib.batch_sharding(mesh, x.ndim))
                params, opt_state, counter, metrics = step_fn(
                    params, opt_state, counter, x)
                return (params, opt_state, counter), metrics

            (params, opt_state, counter), ms = jax.lax.scan(
                body, (params, opt_state, counter), xs=batches)
            return params, opt_state, counter, ms

        return jax.jit(chunk_fn, donate_argnums=(0, 1, 2))

    def train_chunk_pod(self, cache, local_batch: int, n_steps: int) -> dict:
        """Pod counterpart of ``train_chunk``: ONE host-local dispatch draws
        this host's ``n_steps`` stratum batches, ONE global assembly per
        chunk (put_host_chunk) and one scanned global step program — pod
        training amortizes the per-step dispatch and per-step batch assembly
        exactly like the single-host fused path. The per-host sample stream
        is bit-identical to per-step ``next_batch``. Returns the stacked
        per-step metrics like ``train_chunk``. Works on single-process
        meshes too (the local stack IS the global stack)."""
        sampler = self._pod_samplers.get((n_steps, local_batch))
        if sampler is None:
            sampler = self._pod_samplers[(n_steps, local_batch)] = (
                self._build_pod_sampler(n_steps, local_batch))
        cache_arr, rng = cache.sample_state()
        stack, rng = sampler(cache_arr, rng)
        cache.set_key(rng)
        batches = mesh_lib.put_host_chunk(self.mesh, stack)
        fn = self._pod_chunk_fns.get(n_steps)
        if fn is None:
            fn = self._pod_chunk_fns[n_steps] = (
                self._build_train_chunk_pod(n_steps))
        (self.params, self.opt_state, self.num_frames_since_fired,
         metrics) = fn(self.params, self.opt_state,
                       self.num_frames_since_fired, batches)
        self.step += n_steps
        return metrics

    def current_lr(self, step: Optional[int] = None) -> float:
        # pure-Python evaluation (make_schedule's .host mirror of the same
        # formula): the eager optax call dispatched its ops one by one
        # (~0.3 s per call on tunneled backends), taxing every 10th step at
        # the reference's log_tb_every=10 cadence; even one jitted device
        # call still pays a fetch round-trip per log. ``step`` overrides the
        # trainer's position (fused chunks log interior steps post hoc).
        count = max((self.step if step is None else step) - 1, 0)
        host = getattr(self.schedule, "host", None)
        if host is not None:
            return float(host(count))
        return float(self.schedule(count))

    def validate_files(self, batch: np.ndarray) -> dict:
        params = self.params
        if mesh_lib.is_multiprocess(self.mesh):
            # the val program is a LOCAL jit (validation runs on process 0
            # only — train() gates it); a multi-process global array cannot
            # feed it, so take the host copy of the replicated params once
            # per step and let the jit re-put it on local devices
            if getattr(self, "_local_params_step", None) != self.step:
                self._local_params = jax.device_get(params)
                self._local_params_step = self.step
            params = self._local_params
        return self._val_step(params, jnp.asarray(batch))

    def hparams(self, **extra) -> dict:
        hp = {
            "autoencoder_variant": self.variant,
            "autoencoder_config": self.raw_config,
            "activation_size": self.activation_size,
        }
        hp.update(extra)
        return hp

    def save(self, path: str, hparams: dict) -> None:
        save_trainer_checkpoint(
            path, self.variant, jax.device_get(self.params),
            jax.device_get(self.opt_state), self.step, self.best_val_loss, hparams,
            extra={
                # torch-typed so the whole .pth stays weights_only-loadable
                # (checkpoint.opt_state_to_leaves has the full rationale)
                "num_frames_since_fired": _to_torch(
                    np.asarray(self.num_frames_since_fired)),
            },
        )

    def save_async(self, paths: list[str], hparams: dict,
                   writer: "AsyncCheckpointWriter") -> None:
        """Queue a write-behind checkpoint of the CURRENT state to every
        path in ``paths`` (one device fetch, N disk writes — the cadence
        step where ``step_K.pth`` and ``bestval.pth`` coincide would
        otherwise fetch the ~GB state twice).

        The state is snapshotted as an ON-DEVICE copy first: the train
        step DONATES its params/opt_state buffers, so holding the raw
        references would hand the writer deleted arrays one step later.
        The copy is one dispatched program executing in device-stream
        order — i.e. before any later-dispatched donating step can reuse
        the buffers — and costs HBM bandwidth, not a host round-trip.
        Host RNG states are captured here, on the training thread."""
        import random as _random

        snap_params, snap_opt, snap_fired = _snapshot_tree(
            (self.params, self.opt_state, self.num_frames_since_fired))
        step, best = self.step, self.best_val_loss
        variant = self.variant
        rng_states = (np.random.get_state(), _random.getstate())

        def work():
            # spanned so campaign decompositions see the background D2H
            # volume (the fetch overlaps training but still serializes the
            # host link — at recipe cadence the large_v1 bestval is ~630 MB
            # per improving validation); the d2h/disk sub-spans split the
            # link cost from the torch.save cost
            with profiling.span("checkpoint_write"):
                with profiling.span("checkpoint_d2h"):
                    host_params = jax.device_get(snap_params)
                    host_opt = jax.device_get(snap_opt)
                with profiling.span("checkpoint_disk"):
                    extra = {
                        "num_frames_since_fired": _to_torch(
                            np.asarray(snap_fired))}
                    for path in paths:
                        save_trainer_checkpoint(
                            path, variant, host_params, host_opt, step, best,
                            hparams, extra=extra, rng_states=rng_states,
                        )

        # pure-bestval writes coalesce: a queued superseded snapshot is
        # replaced by the newer one (same path, strictly better loss — the
        # final disk state is identical; see AsyncCheckpointWriter). Writes
        # that include a step checkpoint are never dropped.
        coalesce = ("bestval" if all(
            p.endswith("bestval.pth") for p in paths) else None)
        writer.submit(work, coalesce=coalesce)

    def load(self, path: str) -> None:
        params, opt_state, step, best, ckpt = load_trainer_checkpoint(
            path, self.variant, jax.device_get(self.opt_state)
        )
        self.params = jax.device_put(params, self._param_sharding)
        # place restored opt-state leaves with the same shardings as the
        # freshly initialized template state
        shardings = jax.tree_util.tree_map(lambda x: x.sharding, self.opt_state)
        self.opt_state = jax.device_put(opt_state, shardings)
        self.step = step
        self.best_val_loss = best
        if "num_frames_since_fired" in ckpt:
            self.num_frames_since_fired = jnp.asarray(
                np.asarray(ckpt["num_frames_since_fired"]), jnp.int32
            )

    def param_count(self) -> int:
        mod = l1_mod if self.variant == "l1" else topk_mod
        return mod.param_count(self.params)


class _NullTB:
    """TensorBoard stand-in for non-main pod hosts: every host runs the
    identical train() control flow (the SPMD steps must stay in lockstep)
    but only process 0 writes host-side artifacts."""

    def _noop(self, *a, **k):
        return None

    add_scalar = add_text = add_histogram = add_audio = close = _noop


# ---------------------------------------------------------------------------
# Full training entry point (reference train(**config) surface)


def _val_batches(loader, val_batch: int):
    """Yield ``(x_padded, n_valid, filenames)`` per loader batch — ragged
    tails zero-padded to the loader's bucket shape (one compiled program
    for the whole set; padded files are sliced away by the caller)."""
    bucket = getattr(loader, "batch_size", val_batch)
    for batch in loader:
        *arrays, filenames = batch
        x = np.asarray(arrays[0], np.float32)
        if loader.activation_type == "indexed":
            # stores built from a TopK SAE hold (acts, indices); validation
            # operates on dense activations only, as in the reference
            raise ValueError("validation expects dense activation stores")
        n_valid = x.shape[0]
        if n_valid < bucket:
            x = np.pad(x, ((0, bucket - n_valid), (0, 0), (0, 0)))
        yield x, n_valid, list(filenames)


class DeviceValSet:
    """Device-resident validation set: the val store uploads ONCE and every
    validation runs on the resident arrays. At the reference's real cadence
    (val_every=100 → 1000 validations per tiny_l1 recipe) the per-call
    H2D re-upload of the whole store dominates validation wall on slow
    links (~13 s per 200-file call, tools/bench_cadence.py); resident it
    is pure device compute. ``ok`` is False when the set exceeds the
    byte budget — callers fall back to the streaming loader.

    ``mesh``: a multi-device single-process mesh SHARDS each resident batch
    over the data axis (batch_sharding — the val program partitions the
    per-file stats across chips), and ``max_bytes`` becomes a PER-DEVICE
    cap: a large_v3-scale set (hundreds of 1500×1280 files, multi-GB) that
    would blow a single chip's budget fits resident once it spreads over
    the mesh. Pod validation runs on process 0 with a local program, so a
    multiprocess mesh keeps the single-device placement."""

    def __init__(self, loader, val_batch: int = 8,
                 max_bytes: int = 1 << 30, mesh=None):
        self.batches = []
        self.ok = False
        if getattr(loader, "activation_type", "tensor") == "indexed":
            return
        put = jnp.asarray
        n_shards = 1
        if (mesh is not None and mesh.size > 1
                and not mesh_lib.is_multiprocess(mesh)):
            bucket = getattr(loader, "batch_size", val_batch)
            n_data = mesh.shape[mesh_lib.DATA_AXIS]
            if bucket % n_data == 0:
                put = lambda a: jax.device_put(  # noqa: E731
                    a, mesh_lib.batch_sharding(mesh, a.ndim))
                n_shards = n_data
        if hasattr(loader, "set_position"):
            loader.set_position(0)
        total = 0
        for x, n_valid, filenames in _val_batches(loader, val_batch):
            total += x.nbytes
            if total > max_bytes * n_shards:
                self.batches = []
                return
            self.batches.append((put(x), n_valid, filenames))
        self.ok = True

    def __iter__(self):
        return iter(self.batches)


def validate(
    trainer: SAETrainer,
    val_folder: str,
    layer_name: str,
    whisper_model: str,
    from_disk: bool,
    log_base_transcripts: bool,
    val_batch: int = 8,
    transcriber=None,
    loader=None,
    device_set: Optional[DeviceValSet] = None,
    substitute_rows: bool = True,
):
    """Reference ``validate`` semantics (train_sae.py:121-221): per-file
    losses/MSE (batch-size-1 math, vmapped), per-feature magnitude maxes, and
    substituted transcripts for the first N_TRANSCRIPTS files. Pass a
    ``loader`` to reuse one across validation calls (a fresh fly loader
    re-loads Whisper and re-jits its encode per call otherwise), or a
    ``device_set`` (DeviceValSet) to validate on resident device arrays
    with no per-call H2D at all.

    ``transcriber`` is BATCHED: ``transcriber(mels, substitute_values=None)
    -> list[str]`` over stacked ``(B, n_mels, T)`` mels (and ``(B, s, d)``
    replacement activations) — all transcript slots decode in one device
    program instead of B sequential batch-1 decodes (the reference loops
    per file, train_sae.py:183-200; one batched decode is the TPU shape
    of the same observability).

    ``substitute_rows=False``: the transcriber rebuilds the reconstruction
    itself (decoder-layer online steering) and only needs subbed-vs-baseline
    signalling — no ``sae_out``/``sae_out_head`` rows are fetched from the
    device (they are the dominant validation transport otherwise) and
    ``substitute_values`` is passed as a bare ``True`` sentinel."""
    if device_set is not None and device_set.ok:
        source = device_set
    else:
        if loader is None:
            loader, _, _ = init_dataloader(
                from_disk, val_folder, whisper_model, None, layer_name,
                batch_size=val_batch, shuffle=False,
                resample_padding=layer_name.startswith("decoder."),
            )
        if hasattr(loader, "set_position"):
            loader.set_position(0)  # a reused loader must scan from the start
        source = _val_batches(loader, val_batch)
    sums: dict[str, float] = {}
    counts = 0
    mags = []
    subbed_transcripts: list[str] = []
    base_transcripts: list[str] = []
    base_filenames: list[str] = []
    n_transcribed = 0

    # (padding to the bucket shape happens in _val_batches / at DeviceValSet
    # build: one compiled program for the whole set — a second remote
    # compile costs minutes on the tunneled TPU; padded files are sliced
    # away from every per-file output below)
    # ``sae_out`` (the full (B, T, d) f32 reconstruction, ~18 MB/batch tiny,
    # 61 MB/batch large_v1) NEVER rides the batched fetch: batches that feed
    # transcripts fetch ``sae_out_head`` — the first N_TRANSCRIPTS rows,
    # bf16, sliced/cast inside the jitted val program (_build_val_step) —
    # and everything else fetches stats only. Fetching the full f32 tensor
    # per batch dominated validation wall-clock on the tunneled link
    # (measured ~35-45 s per 200-file validation; the reference cadence is
    # val_every=100, so per-call cost is the whole ballgame). Per-key
    # device slices/sums OUTSIDE the jit would each compile a fresh program
    # remotely (CLAUDE.md's ad-hoc-indexing rule) — all post-processing is
    # numpy.
    def results():
        if device_set is not None and device_set.ok:
            # resident path: dispatch EVERY batch's program first (async),
            # then one blocking device_get for all the stats — per-batch
            # blocking fetches pay a link round-trip each
            trios = list(device_set)
            outs_dev = [trainer.validate_files(x) for x, _, _ in trios]
            keeps, budget = [], 0
            for _, n_valid, _ in trios:
                # keep sae_out while slots could remain ASSUMING every
                # offered file transcribes; load_audio failures can push
                # the horizon further — the consumption loop re-fetches a
                # dropped sae_out on demand from the live device handle
                keeps.append(transcriber is not None and substitute_rows
                             and budget < N_TRANSCRIPTS)
                budget += n_valid
            with profiling.span("val_fetch"):
                outs_host = jax.device_get(
                    [{k: v for k, v in od.items()
                      if k != "sae_out" and (k != "sae_out_head" or keep)}
                     for od, keep in zip(outs_dev, keeps)])
            for out, od, (_, n_valid, fnames) in zip(outs_host, outs_dev,
                                                     trios):
                yield out, n_valid, fnames, od
        else:
            for x, n_valid, fnames in source:
                out_dev = trainer.validate_files(x)
                need = (transcriber is not None and substitute_rows
                        and n_transcribed < N_TRANSCRIPTS)
                # per-batch need check: sae_out is always present here
                # whenever the transcript loop can run
                yield jax.device_get(
                    {k: v for k, v in out_dev.items()
                     if k != "sae_out" and (k != "sae_out_head" or need)
                     }), n_valid, fnames, out_dev

    pending_transcripts: list[tuple] = []  # (mel, sae_out_row, filename)
    for out, n_valid, filenames, dev_out in results():
        out = {k: np.asarray(v)[:n_valid] for k, v in out.items()}
        for key in ("recon", "l1", "fvu", "auxk_loss", "multi_topk_fvu", "mse"):
            if key in out:
                sums[key] = sums.get(key, 0.0) + float(np.sum(out[key]))
        counts += n_valid
        mags.append(np.asarray(out["mag"]))

        if transcriber is not None and n_transcribed < N_TRANSCRIPTS:
            head = out.get("sae_out_head")  # bf16 transport rows (≤4)
            full = None
            # bound by the VALID file count, not the padded batch — indexing
            # filenames past n_valid would IndexError on a tiny val set
            for j in range(n_valid):
                if n_transcribed >= N_TRANSCRIPTS:
                    break
                try:
                    audio = load_audio(filenames[j])
                except RuntimeError:
                    continue  # store built from synthetic/moved files —
                    # skipped files must NOT consume transcript slots
                mel = np.asarray(
                    mels_from_array(audio, get_n_mels(whisper_model)))
                if not substitute_rows:
                    # online-steering transcribers rebuild the
                    # reconstruction from the live SAE params — no row
                    # transport at all
                    row = None
                elif head is not None and j < head.shape[0]:
                    row = np.asarray(head[j], np.float32)
                else:
                    # transcript slots ran past the transport head: batches
                    # whose head was dropped from the batched pre-fetch
                    # (load failures earlier in the set), or failures within
                    # this batch pushing slots past N_TRANSCRIPTS rows —
                    # fetch the f32 reconstruction on demand
                    if full is None:
                        full = np.asarray(
                            jax.device_get(dev_out["sae_out"]))[:n_valid]
                    row = full[j]
                pending_transcripts.append((mel, row, filenames[j]))
                n_transcribed += 1

    if pending_transcripts:
        # ONE batched decode for all transcript slots instead of a
        # sequential batch-1 decode per file: at recipe cadence the
        # transcripts dominate validation wall-clock (large-v1: 4 × ~1.5 s
        # sequential decodes per call, 250 validations per 25k-step recipe).
        # Padded to the N_TRANSCRIPTS bucket so every validation reuses ONE
        # compiled decode shape (a fresh remote compile costs minutes).
        n_real = len(pending_transcripts)
        padded = pending_transcripts + (
            [pending_transcripts[-1]] * (N_TRANSCRIPTS - n_real))
        mels_stack = np.stack([p[0] for p in padded])
        subs_stack = (np.stack([p[1] for p in padded])
                      if substitute_rows else True)
        with profiling.span("val_transcripts"):
            subbed_transcripts = list(
                transcriber(mels_stack, substitute_values=subs_stack))[:n_real]
            if log_base_transcripts:
                base_transcripts = list(transcriber(mels_stack))[:n_real]
                base_filenames = [p[2] for p in pending_transcripts]

    mag_matrix = np.concatenate(mags, axis=0) if mags else np.zeros((0, 1))
    losses = {k: v / max(counts, 1) for k, v in sums.items()}
    losses = {
        "l1": losses.get("l1"),
        "recon": losses.get("recon"),
        "fvu": losses.get("fvu"),
        "auxk_loss": losses.get("auxk_loss"),
        "multi_topk_fvu": losses.get("multi_topk_fvu"),
        "mse": losses.get("mse", 0.0),
    }
    return (
        losses,
        subbed_transcripts,
        base_transcripts,
        base_filenames,
        mag_matrix.max(axis=0) if len(mag_matrix) else np.zeros(1),
        mag_matrix.std(axis=0) if len(mag_matrix) else np.zeros(1),
    )


def train(
    seed: int,
    train_folder: str,
    val_folder: str,
    run_dir: str,
    lr: float,
    weight_decay: float,
    steps: int,
    clip_thresh: float,
    batch_size: int,
    log_tb_every: int,
    save_every: int,
    val_every: int,
    whisper_config: dict,
    optimizer: str,
    scheduler: str,
    scheduler_params: dict,
    autoencoder_variant: str,
    autoencoder_config: dict,
    from_disk: bool = True,
    start_checkpoint: Optional[str] = None,
    device: Optional[str] = None,  # accepted for config parity; placement is JAX's
    dl_max_workers: int = 0,  # accepted for config parity
    mesh=None,
    enable_transcripts: bool = True,
    max_transcript_tokens: int = 224,
    verbose: bool = True,
    device_cache_files: int = 0,
    fused_steps: Optional[int] = None,
    device_cache_dtype: str = "float32",
    val_device_cache: Optional[bool] = None,
) -> dict:
    """``device_cache_files > 0`` (with ``from_disk``) trains from a
    device-resident shuffle cache of that many files — batches become
    on-device gathers with background refresh instead of per-step H2D
    transfers (freud_tpu.data.device_cache).

    ``fused_steps``: chunk size of the fused multi-step program (cache
    sampling + train step scanned on device, one dispatch per chunk —
    SAETrainer.train_chunk). ``None`` auto-picks gcd(save_every, val_every)
    capped at 100 — checkpoint/validation events must land on chunk
    boundaries; TB logging needs no alignment (interior steps log from the
    chunk's per-step metric stack). ``0``/``1`` disables fusion; an
    explicit value must divide save_every and val_every. On pods the fused
    path samples per host and assembles ONE global batch stack per chunk
    (SAETrainer.train_chunk_pod); the auto chunk is additionally capped so
    the staging stack stays within ~1 GB of HBM per host.

    ``device_cache_dtype="bfloat16"`` stores the cache window in bf16 (2×
    capacity, half the gather/refresh bytes; samples upcast to f32).

    ``val_device_cache``: keep the validation set resident on device so
    each validation runs with no per-call H2D (at the reference cadence,
    val_every=100, the re-upload dominates validation wall on slow links).
    ``None`` auto-enables when the set fits in 1 GB; ``True`` forces
    (no size cap); ``False`` streams from the loader every call."""
    set_seeds(seed)
    layer_name = whisper_config["layer_name"]
    whisper_model = whisper_config["model"]
    # decoder-layer stores are EOT-padded past each file's valid decode
    # positions (runtime.decode_capture): training must not consume the
    # padding rows as data — loaders resample them from valid rows
    # (loaders.resample_padding_rows); search/analysis mask positionally
    # via n_frames instead
    decoder_store = layer_name.startswith("decoder.")

    # Pod input path (jax.process_count() > 1 after
    # parallel.distributed.initialize): every host computes the same
    # (seed, epoch) shuffle order but loads ONLY its own contiguous slice of
    # each global batch (host_shard_bounds), assembled shard-to-local-chip
    # by put_host_batch — no host ever materializes the full global batch.
    # Host-side artifacts (TensorBoard, checkpoints, validation,
    # transcripts) run on process 0 only.
    host_bounds = None
    the_mesh = mesh if mesh is not None else mesh_lib.make_mesh()
    multihost = mesh_lib.is_multiprocess(the_mesh)
    is_main = jax.process_index() == 0
    if multihost:
        if not from_disk:
            raise SystemExit(
                "multi-host training requires a collected store "
                "(from_disk); fly-mode pod training is not supported — "
                "collect with data_parallel + per-host shards first")
        host_bounds = mesh_lib.host_shard_bounds(batch_size, the_mesh)

    loader, feat_dim, dset_len = init_dataloader(
        from_disk, train_folder, whisper_model, None, layer_name,
        batch_size=batch_size, shuffle=True, drop_last=True, seed=seed,
        host_bounds=host_bounds, resample_padding=decoder_store,
    )
    if getattr(loader, "activation_type", "tensor") == "indexed":
        # an indexed (acts, indices) store comes from collecting WITH an SAE
        # attached — there is nothing to train on; without this check the
        # (T, k) pair rows reach the model as if dense and die in a shape
        # error deep inside the first step
        raise SystemExit(
            f"{train_folder!r} holds an SAE-indexed store (TopK pairs), not "
            "raw activations — training needs a store collected WITHOUT "
            "sae_model")
    if (from_disk and val_folder
            and not (Path(val_folder)
                     / f"{layer_name}_tensors.npy").exists()
            and (Path(val_folder)
                 / f"{layer_name}_activation_values.npy").exists()):
        # same guard for the VALIDATION store, checked NOW: the val loader
        # is built lazily at the first val_every step, which would burn
        # val_every steps of training before dying on the dense-store check
        # in _val_batches
        raise SystemExit(
            f"{val_folder!r} holds an SAE-indexed store (TopK pairs) — "
            "validation needs a store collected WITHOUT sae_model")

    trainer = SAETrainer(
        autoencoder_variant, autoencoder_config, feat_dim,
        optimizer=optimizer, scheduler=scheduler, scheduler_params=scheduler_params,
        lr=lr, weight_decay=weight_decay, steps=steps, clip_thresh=clip_thresh,
        seed=seed, mesh=the_mesh,
    )

    hparam_dict = {
        "autoencoder_variant": autoencoder_variant,
        "autoencoder_config": autoencoder_config,
        "lr": lr,
        "weight_decay": weight_decay,
        "steps": steps,
        "clip_thresh": clip_thresh,
        "batch_size": batch_size,
        "whisper_config": whisper_config,
        "activation_size": feat_dim,
        "train_folder": train_folder,
        "val_folder": val_folder,
        "optimizer": optimizer,
        "scheduler": scheduler,
        "scheduler_params": scheduler_params,
    }

    os.makedirs(run_dir, exist_ok=True)
    ckpt_dir = Path(run_dir) / "checkpoints"
    ckpt_dir.mkdir(parents=True, exist_ok=True)

    verbose = verbose and is_main
    if is_main:
        from torch.utils.tensorboard import SummaryWriter

        tb = SummaryWriter(run_dir, flush_secs=10)
    else:
        tb = _NullTB()  # non-main pod hosts write no host-side artifacts
    tb.add_text("hparams", json.dumps(hparam_dict, indent=4))
    if verbose:
        print("Model: %.2fM" % (trainer.param_count() / 1e6))

    if start_checkpoint:
        if verbose:
            print(f"Checkpoint: {start_checkpoint}")
        trainer.load(start_checkpoint)
        # Deterministic resume: one batch is consumed per step and the
        # shuffle order is a pure function of (seed, epoch), so the step
        # count positions the loader exactly where the interrupted run's
        # stream left off (reference restores pickled RNG states instead,
        # train_sae.py:265-294).
        if hasattr(loader, "set_position"):
            loader.set_position(trainer.step)

    transcriber = None
    decoder_steer_layer = None
    if enable_transcripts and is_main and layer_name.startswith("decoder."):
        import re as _re

        m = _re.fullmatch(r"decoder\.blocks\.(\d+)", layer_name)
        if m is None:
            # sub-module decoder layers (mlp.0, attn_ln, …) have no online
            # steering point in the decode loop; tensor substitution splices
            # the ENCODER forward only, so a run here would crash at the
            # first validation — disable instead
            enable_transcripts = False
            if verbose:
                print("transcript logging disabled: decoder-layer "
                      "transcripts steer block outputs (decoder.blocks.N) "
                      f"only, got {layer_name!r}")
        else:
            decoder_steer_layer = int(m.group(1))
    if enable_transcripts and is_main:
        try:
            from ..models.whisper import WhisperRuntime

            rt = WhisperRuntime(
                whisper_model, layer_name, max_new_tokens=max_transcript_tokens
            )

            if decoder_steer_layer is not None:
                from ..analysis.features import (
                    sae_roundtrip_tap_params,
                    sae_steer_fn,
                )

                # ONE fn object for the whole run — the decode program is
                # keyed on it (see decoding.sample_decode)
                steer_fn = sae_steer_fn(trainer.variant, trainer.cfg)

                def transcriber(mels, substitute_values=None):
                    # decoder stores: the "substituted" transcript splices
                    # the CURRENT SAE's reconstruction ONLINE inside the
                    # decode (per position, as generated) — validate()
                    # passes substitute_values as a bare subbed-vs-baseline
                    # flag here (substitute_rows=False): stored sae_out rows
                    # are encoder-splice transport and carry no meaning for
                    # autoregressive steps
                    if substitute_values is None:
                        return rt.transcribe(mels)
                    sae_params = trainer.params
                    if multihost:
                        # the decode is a LOCAL jit (transcripts run on
                        # process 0 only) — params committed to the global
                        # multi-process mesh cannot feed it; take the host
                        # copy (replicated → fully addressable) and let the
                        # jit re-put it on local devices
                        sae_params = jax.device_get(sae_params)
                    tp = sae_roundtrip_tap_params(
                        trainer.variant, sae_params)
                    return rt.transcribe(
                        mels,
                        decoder_tap=(decoder_steer_layer, steer_fn, tp),
                    )
            else:
                def transcriber(mels, substitute_values=None):
                    # batched contract (see validate()): mels (B, n_mels, T),
                    # substitute_values (B, s, d) or None → list of B strings
                    if substitute_values is None:
                        return rt.transcribe(mels)
                    return rt.transcribe(
                        mels, substitute_layer=layer_name,
                        substitute_value=substitute_values,
                    )
        except (FileNotFoundError, ValueError) as e:
            if verbose:
                print(f"transcript logging disabled: {e}")

    logged_base_transcripts = False
    val_loader = None
    val_set = None
    t_start = time.perf_counter()
    steps_done_at_start = trainer.step

    cache = None
    if device_cache_files and from_disk:
        from ..data.device_cache import DeviceShuffleCache

        # pod mode: each host caches + samples its own strided file
        # stratum; the per-host samples assemble into the global batch via
        # the host_local path (device arrays pass through put_host_batch
        # without a host round-trip)
        cache = DeviceShuffleCache(
            train_folder, layer_name, device_cache_files, seed=seed,
            start_step=trainer.step,
            process_shard=((jax.process_index(), jax.process_count())
                           if multihost else None),
            mesh=the_mesh,
            cache_dtype=device_cache_dtype,
        )

    cache_batch = batch_size
    if multihost and cache is not None:
        pc = jax.process_count()
        if batch_size % pc:
            raise SystemExit(
                f"batch_size {batch_size} must divide by the process "
                f"count {pc} for pod device-cache training")
        cache_batch = batch_size // pc

    fused = 0
    if cache is not None:
        import math

        # log events need no chunk alignment (the chunk returns the full
        # per-step metric stack and interior steps are logged from it);
        # save/val DO — they run host code against the trainer state. The
        # auto chunk is capped: scan length directly scales program size /
        # compile time, and past ~100 the dispatch is fully amortized. The
        # cap must stay a DIVISOR of the cadence gcd — a plain min() could
        # land chunk ends off the save/val steps and silently skip them.
        cap = 100
        if multihost:
            # the pod fused path stages a whole chunk's per-host samples
            # (n_steps, local_batch, T, d) through one global assembly —
            # cap the chunk so that staging stack stays within ~1 GB of
            # HBM per host (it exists ALONGSIDE the resident cache window)
            _, t_frames, d_feat = cache.cache.shape
            step_bytes = (cache_batch * t_frames * d_feat
                          * cache.cache.dtype.itemsize)
            cap = min(cap, max(int((1 << 30) // max(step_bytes, 1)), 1))
        g = math.gcd(save_every, val_every)
        auto = g if g <= cap else max(
            (k for k in range(1, cap + 1) if g % k == 0), default=1)
        if fused_steps is None:
            fused = auto if auto > 1 else 0
        elif fused_steps and fused_steps > 1:
            for name, cadence in (("save_every", save_every),
                                  ("val_every", val_every)):
                if cadence % fused_steps:
                    raise ValueError(
                        f"fused_steps={fused_steps} must divide {name}="
                        f"{cadence} (checkpoint/validation events must land "
                        "on chunk boundaries)")
            fused = fused_steps

    def batch_stream():
        if cache is not None:
            while True:
                yield cache.next_batch(cache_batch)
        if decoder_store and not from_disk:
            # fly-mode decoder training: the capture program EOT-pads each
            # file's rows past its valid decode positions (n_frames, last
            # yield element) — resample them from valid rows exactly like
            # the disk loaders, keyed per filename for determinism
            import zlib

            while True:
                for b in _prefetch(loader.iter_with_lengths()):
                    x = np.asarray(b[0], np.float32)
                    ids = [zlib.crc32(str(n).encode()) for n in b[-2]]
                    yield resample_padding_rows(x, ids, b[-1], seed)
        while True:
            for b in _prefetch(iter(loader)):
                yield np.asarray(b[0], np.float32)

    def log_train(m: dict, step: int) -> None:
        tb.add_scalar("train/loss", m["loss"], step)
        if autoencoder_variant == "l1":
            tb.add_scalar("train/loss_recon", m["loss_recon"], step)
            tb.add_scalar("train/loss_l1", m["loss_l1"], step)
        else:
            tb.add_scalar("train/fvu", m["fvu"], step)
            tb.add_scalar("train/auxk_loss", m["auxk_loss"], step)
            tb.add_scalar("train/multi_topk_fvu", m["multi_topk_fvu"], step)
            tb.add_scalar("train/dead_pct", m["dead_pct"], step)
        tb.add_scalar("train/lr", trainer.current_lr(step), step)
        if verbose:
            print(f"step {step}: loss {m['loss']:.4f}")

    stream = batch_stream()
    ckpt_writer = AsyncCheckpointWriter()
    try:
        while trainer.step < steps:
            if (fused and trainer.step % fused == 0
                    and steps - trainer.step >= fused):
                # fused path: sampling + `fused` steps in one dispatch;
                # resume from a non-aligned checkpoint step runs per-step
                # until a chunk boundary, the tail (< fused steps) runs
                # per-step too
                first = trainer.step + 1
                with profiling.span("train_chunk"):
                    metrics = (
                        trainer.train_chunk_pod(cache, cache_batch, fused)
                        if multihost
                        else trainer.train_chunk(cache, cache_batch, fused))
                log_steps = [s for s in range(first, trainer.step + 1)
                             if s % log_tb_every == 0]
                if log_steps:
                    # ONE fetch of the whole (fused,) stack per chunk. This
                    # fetch is where the chunk's device EXECUTION surfaces
                    # on backends whose block_until_ready is a no-op (axon):
                    # the train_chunk span above times only the dispatch, so
                    # campaign decompositions read chunk wall from THIS span
                    with profiling.span("train_chunk_wait"):
                        stack = jax.device_get(metrics)
                    for s in log_steps:
                        log_train({k: float(v[s - first])
                                   for k, v in stack.items()}, s)
            else:
                x = next(stream)
                with profiling.span("train_step"):
                    metrics = trainer.train_step(x, host_local=multihost)
                if trainer.step % log_tb_every == 0:
                    # ONE batched fetch (device_get issues every copy async
                    # before blocking) — a float(v) loop is one serial RTT
                    # per metric, which compounds at the reference's
                    # log_tb_every=10 cadence on tunneled backends
                    log_train({k: float(v)
                               for k, v in jax.device_get(metrics).items()},
                              trainer.step)

            ckpt_paths: list[str] = []
            if trainer.step % save_every == 0 and is_main:
                ckpt_paths.append(str(ckpt_dir / f"step{trainer.step}.pth"))

            if trainer.step % val_every == 0 and is_main:
                if val_loader is None:
                    # built once and reused: a fly val loader re-loads Whisper
                    # and re-jits its encode program per construction
                    val_loader, _, _ = init_dataloader(
                        from_disk, val_folder, whisper_model, None,
                        layer_name, batch_size=8, shuffle=False,
                        resample_padding=decoder_store,
                    )
                    if val_device_cache is not False:
                        vs = DeviceValSet(
                            val_loader,
                            max_bytes=((1 << 62) if val_device_cache
                                       else (1 << 30)),
                            mesh=the_mesh)
                        if vs.ok:
                            val_set = vs
                with profiling.span("validate"):
                    (
                        losses_dict, subbed, base_ts, base_files,
                        mag_maxes, mag_stds,
                    ) = validate(
                        trainer, val_folder, layer_name, whisper_model,
                        from_disk, not logged_base_transcripts,
                        transcriber=transcriber,
                        loader=val_loader, device_set=val_set,
                        substitute_rows=decoder_steer_layer is None,
                    )
                logged_base_transcripts = True
                # an EMPTY validation set leaves every loss None — warn and skip
                # the scalar logging instead of crashing the run on
                # add_scalar(None) at the first val step
                if autoencoder_variant == "l1":
                    val_keys = ("recon", "l1")
                else:
                    val_keys = ("fvu", "auxk_loss", "multi_topk_fvu")
                if any(losses_dict.get(k) is None for k in val_keys):
                    print(f"{trainer.step}: validation set empty — skipping "
                          "val logging")
                else:
                    if autoencoder_variant == "l1":
                        tb.add_scalar("val/loss_recon", losses_dict["recon"], trainer.step)
                        tb.add_scalar("val/loss_l1", losses_dict["l1"], trainer.step)
                    else:
                        tb.add_scalar("val/fvu", losses_dict["fvu"], trainer.step)
                        tb.add_scalar("val/auxk_loss", losses_dict["auxk_loss"], trainer.step)
                        tb.add_scalar("val/multi_topk_fvu", losses_dict["multi_topk_fvu"], trainer.step)
                    tb.add_scalar("val/mse", losses_dict["mse"], trainer.step)
                tb.add_histogram("val/encoded/magnitude_maxes", mag_maxes, trainer.step)
                tb.add_histogram("val/encoded/magnitude_stds", mag_stds, trainer.step)
                num_dead = int(np.count_nonzero(mag_maxes <= 0))
                tb.add_scalar("val/encoded/num_dead", num_dead, trainer.step)
                tb.add_scalar(
                    "val/encoded/percent_dead", num_dead / mag_maxes.shape[-1],
                    trainer.step,
                )
                for i, t in enumerate(subbed):
                    tb.add_text(f"val/transcripts/reconstructed_{i}", t, trainer.step)
                for i, t in enumerate(base_ts):
                    tb.add_text(f"val/transcripts/base_{i}", t, trainer.step)
                for i, fname in enumerate(base_files):
                    audio = load_audio(fname)
                    tb.add_audio(
                        f"val/transcripts/audio_{i}",
                        audio.reshape(1, -1), trainer.step, sample_rate=16000,
                    )
                save_loss = (
                    losses_dict["recon"] if autoencoder_variant == "l1"
                    else losses_dict["fvu"]
                )
                if verbose:
                    print(f"{trainer.step} validation: {losses_dict}")
                if save_loss is not None and save_loss < trainer.best_val_loss:
                    trainer.best_val_loss = float(save_loss)
                    ckpt_paths.append(str(ckpt_dir / "bestval.pth"))

            if ckpt_paths:
                # write-behind: the fetch + disk write overlap the next
                # chunk (the synchronous bestval save was 30-60 s of every
                # 100-step cycle on the tunneled backend — see
                # AsyncCheckpointWriter)
                trainer.save_async(ckpt_paths, hparam_dict, ckpt_writer)

    finally:
        # exception-safe: a failed run must not leak the refresh
        # thread (it would keep reading the store until process exit);
        # close() flushes queued checkpoints so an interrupted run's
        # resume point is whatever was last SUBMITTED, never a torn file
        if cache is not None:
            cache.close()
        ckpt_writer.close()
    if is_main:
        trainer.save(str(ckpt_dir / f"step{trainer.step}.pth"), hparam_dict)
    elapsed = time.perf_counter() - t_start
    done = trainer.step - steps_done_at_start
    tb.close()
    return {
        "steps": trainer.step,
        "steps_per_sec": done / max(elapsed, 1e-9),
        "best_val_loss": trainer.best_val_loss,
        "run_dir": run_dir,
    }
