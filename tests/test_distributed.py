"""Two-process jax.distributed integration (parallel/distributed.py).

The multi-host path is exercised for real: two OS processes, each owning two
virtual CPU devices, initialize through ``freud_tpu.parallel.distributed``
into one 4-device global mesh, run one dp SAE train step and one sharded
collection batch, and the results must match a single-process run over an
identically-shaped mesh. (The reference has no distributed backend at all —
SURVEY.md §5.8; this pins the pod-initialization story the TPU design adds.)
"""

import json
import os
import socket
import subprocess
import sys
import wave

import numpy as np
import pytest

_WORKER = r'''
import os, sys, json
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
pid = int(sys.argv[1]); port = sys.argv[2]; audio_dir = sys.argv[3]
out_dir = sys.argv[4]
import jax
jax.config.update("jax_platforms", "cpu")
from freud_tpu.parallel import distributed as dist
dist.initialize(f"127.0.0.1:{port}", 2, pid)
import numpy as np
from freud_tpu.parallel import mesh as mesh_lib
info = dist.process_info()
assert info["process_count"] == 2, info
assert info["global_devices"] == 4, info
mesh = mesh_lib.make_mesh()

from freud_tpu.train.trainer import SAETrainer
tr = SAETrainer("l1", {"expansion_factor": 2, "l1_alpha": 1e-3}, 16,
                steps=4, seed=0, mesh=mesh, amp=False)
batch = np.random.default_rng(0).standard_normal((8, 16)).astype(np.float32)
tr.train_step(batch)
m = tr.train_step(batch)
param_sum = float(sum(np.float64(np.asarray(p)).sum()
                      for p in jax.tree_util.tree_leaves(tr.params)))

from freud_tpu.data.loaders import FlyActivationLoader
loader = FlyActivationLoader(audio_dir, "test:tiny", None,
                             "encoder.blocks.1", 4, mesh=mesh)
chunk, files = next(iter(loader))
# the batch axis is sharded across BOTH processes: gather to host-global
from jax.experimental import multihost_utils
acts = np.asarray(multihost_utils.process_allgather(chunk, tiled=True),
                  np.float64)

# the REAL multi-host collection path: process_count > 1 routes
# get_activations to per-host file shards + local-device meshes, each host
# writing <out>/shard<i> (merged/verified by the parent test)
from freud_tpu.scripts.collect_activations import get_activations
get_activations(
    data_path=audio_dir, layer_name="encoder.blocks.1",
    whisper_model="test:tiny", sae_model=None, batch_size=2,
    out_folder=out_dir, verbose=False, data_parallel=True,
)
"""Pod train() over a pre-collected store (argv[5]): per-host loader slices
(host_shard_bounds) + put_host_batch assembly + process-0-only artifacts."""
store_dir = sys.argv[5]
run_dir = sys.argv[6] + f"/p{pid}"
from freud_tpu.train.trainer import train
stats = train(
    seed=7, train_folder=store_dir, val_folder=store_dir, run_dir=run_dir,
    lr=1e-3, weight_decay=0.0, steps=6, clip_thresh=1.0, batch_size=4,
    log_tb_every=100, save_every=100, val_every=3,
    whisper_config={"layer_name": "encoder.blocks.1", "model": "test:tiny"},
    optimizer="radam", scheduler="cosine", scheduler_params=None,
    autoencoder_variant="l1",
    autoencoder_config={"expansion_factor": 2, "recon_alpha": 2.0},
    from_disk=True, enable_transcripts=False, verbose=False, mesh=mesh,
)
import glob
ckpts = sorted(os.path.basename(p)
               for p in glob.glob(run_dir + "/checkpoints/*.pth"))

# pod device-cache mode: per-host strided stratum caches, device-resident
# samples assembled host-locally; stream is stochastic by construction, so
# this pins "runs + finite + process-0-only artifacts", not equality
stats_c = train(
    seed=7, train_folder=store_dir, val_folder=store_dir,
    run_dir=run_dir + "_cache", lr=1e-3, weight_decay=0.0, steps=4,
    clip_thresh=1.0, batch_size=4, log_tb_every=100, save_every=100,
    val_every=100,
    whisper_config={"layer_name": "encoder.blocks.1", "model": "test:tiny"},
    optimizer="adam", scheduler="linear",
    scheduler_params={"num_warmup_steps": 1},
    autoencoder_variant="l1",
    autoencoder_config={"expansion_factor": 2, "recon_alpha": 2.0},
    from_disk=True, enable_transcripts=False, verbose=False, mesh=mesh,
    device_cache_files=2,
)
cache_ckpts = sorted(os.path.basename(p) for p in
                     glob.glob(run_dir + "_cache/checkpoints/*.pth"))

# pod FUSED device-cache mode (train_chunk_pod): per-host fused sampling +
# one global assembly per chunk. With the cache covering each host's whole
# stratum (no refresh) the fused stream is bit-identical to the per-step
# pod-cache run above — the parent compares their final checkpoints.
stats_f = train(
    seed=7, train_folder=store_dir, val_folder=store_dir,
    run_dir=run_dir + "_fused", lr=1e-3, weight_decay=0.0, steps=4,
    clip_thresh=1.0, batch_size=4, log_tb_every=100, save_every=100,
    val_every=100,
    whisper_config={"layer_name": "encoder.blocks.1", "model": "test:tiny"},
    optimizer="adam", scheduler="linear",
    scheduler_params={"num_warmup_steps": 1},
    autoencoder_variant="l1",
    autoencoder_config={"expansion_factor": 2, "recon_alpha": 2.0},
    from_disk=True, enable_transcripts=False, verbose=False, mesh=mesh,
    device_cache_files=2, fused_steps=2,
)
fused_ckpts = sorted(os.path.basename(p) for p in
                     glob.glob(run_dir + "_fused/checkpoints/*.pth"))

print("DISTJSON " + json.dumps({
    "pid": pid,
    "param_sum": param_sum,
    "loss": float(m["loss"]),
    "act_sum": float(acts.sum()),
    "act_shape": list(acts.shape),
    "files": [str(f) for f in files],
    "train_steps": stats["steps"],
    "ckpts": ckpts,
    "cache_steps": stats_c["steps"],
    "cache_ckpts": cache_ckpts,
    "fused_steps_done": stats_f["steps"],
    "fused_ckpts": fused_ckpts,
}), flush=True)
'''


def _write_wav(path, audio):
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes((audio * 32767).astype(np.int16).tobytes())


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed_matches_single(tmp_path):
    audio_dir = tmp_path / "audio"
    audio_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(4):
        _write_wav(audio_dir / f"c{i}.wav",
                   (rng.standard_normal(8000) * 0.1).astype(np.float32))

    # pre-collect the train store the workers' pod train() will stream from
    from freud_tpu.scripts.collect_activations import get_activations

    store_dir = tmp_path / "train_store"
    get_activations(
        data_path=str(audio_dir), layer_name="encoder.blocks.1",
        whisper_model="test:tiny", sae_model=None, batch_size=2,
        out_folder=str(store_dir), verbose=False,
    )

    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    port = _free_port()
    env = dict(os.environ)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    # the workers set their own JAX_PLATFORMS/XLA_FLAGS before touching jax
    env.pop("XLA_FLAGS", None)

    out_dir = tmp_path / "acts"
    run_root = tmp_path / "runs"
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), str(port), str(audio_dir),
             str(out_dir), str(store_dir), str(run_root)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=900)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("distributed workers timed out:\n" + "\n".join(outs))
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}"

    results = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("DISTJSON "):
                r = json.loads(line[len("DISTJSON "):])
                results[r["pid"]] = r
    assert set(results) == {0, 1}, f"missing worker output:\n{outs}"

    # both processes observe the SAME replicated training result
    assert results[0]["param_sum"] == pytest.approx(
        results[1]["param_sum"], rel=1e-6)
    assert results[0]["loss"] == pytest.approx(results[1]["loss"], rel=1e-6)
    assert results[0]["act_shape"] == results[1]["act_shape"]

    # single-process reference over an identically-shaped (4-way data) mesh
    import jax

    from freud_tpu.data.loaders import FlyActivationLoader
    from freud_tpu.parallel import mesh as mesh_lib
    from freud_tpu.train.trainer import SAETrainer

    mesh = mesh_lib.make_mesh(n_devices=4)
    tr = SAETrainer("l1", {"expansion_factor": 2, "l1_alpha": 1e-3}, 16,
                    steps=4, seed=0, mesh=mesh, amp=False)
    batch = np.random.default_rng(0).standard_normal((8, 16)).astype(np.float32)
    tr.train_step(batch)
    m = tr.train_step(batch)
    param_sum = float(sum(np.float64(np.asarray(p)).sum()
                          for p in jax.tree_util.tree_leaves(tr.params)))
    assert results[0]["param_sum"] == pytest.approx(param_sum, rel=1e-5)
    assert results[0]["loss"] == pytest.approx(float(m["loss"]), rel=1e-5)

    loader = FlyActivationLoader(str(audio_dir), "test:tiny", None,
                                 "encoder.blocks.1", 4, mesh=mesh)
    chunk, files = next(iter(loader))
    acts = np.asarray(chunk, np.float64)
    assert results[0]["act_shape"] == list(acts.shape)
    assert results[0]["files"] == [str(f) for f in files]
    assert results[0]["act_sum"] == pytest.approx(float(acts.sum()), rel=1e-4)

    # pod train(): both hosts ran 6 steps; only process 0 wrote checkpoints
    assert results[0]["train_steps"] == results[1]["train_steps"] == 6
    assert "step6.pth" in results[0]["ckpts"]
    assert results[1]["ckpts"] == []
    # pod device-cache mode ran its 4 steps with process-0-only artifacts
    assert results[0]["cache_steps"] == results[1]["cache_steps"] == 4
    assert "step4.pth" in results[0]["cache_ckpts"]
    assert results[1]["cache_ckpts"] == []
    # pod FUSED device-cache mode (train_chunk_pod): ran, process-0-only
    # artifacts, and — with refresh disabled — the fused per-host sampling
    # chain is bit-identical to per-step next_batch, so the two pod cache
    # runs land on the same parameters
    assert results[0]["fused_steps_done"] == results[1]["fused_steps_done"] == 4
    assert "step4.pth" in results[0]["fused_ckpts"]
    assert results[1]["fused_ckpts"] == []
    import torch as _torch_mod

    ck_step = _torch_mod.load(
        run_root / "p0_cache" / "checkpoints" / "step4.pth",
        weights_only=True)
    ck_fused = _torch_mod.load(
        run_root / "p0_fused" / "checkpoints" / "step4.pth",
        weights_only=True)
    for k in ck_step["model"]:
        np.testing.assert_allclose(
            ck_step["model"][k].numpy(), ck_fused["model"][k].numpy(),
            rtol=2e-5, atol=2e-6)
    # ...and the per-host-sliced pod run equals a single-process run of the
    # SAME recipe over an identically-shaped (4-way data) mesh
    from freud_tpu.train.trainer import train as train_fn

    single_run = tmp_path / "single_run"
    train_fn(
        seed=7, train_folder=str(store_dir), val_folder=str(store_dir),
        run_dir=str(single_run), lr=1e-3, weight_decay=0.0, steps=6,
        clip_thresh=1.0, batch_size=4, log_tb_every=100, save_every=100,
        val_every=3,
        whisper_config={"layer_name": "encoder.blocks.1",
                        "model": "test:tiny"},
        optimizer="radam", scheduler="cosine", scheduler_params=None,
        autoencoder_variant="l1",
        autoencoder_config={"expansion_factor": 2, "recon_alpha": 2.0},
        from_disk=True, enable_transcripts=False, verbose=False, mesh=mesh,
    )
    import torch

    pod_ck = torch.load(run_root / "p0" / "checkpoints" / "step6.pth",
                        weights_only=True)
    single_ck = torch.load(single_run / "checkpoints" / "step6.pth",
                           weights_only=True)
    for k in pod_ck["model"]:
        np.testing.assert_allclose(
            pod_ck["model"][k].numpy(), single_ck["model"][k].numpy(),
            rtol=1e-5, atol=1e-6)

    # multi-host collection: the workers wrote disjoint shard stores; the
    # merged store must equal a single-process collection of the same files
    from freud_tpu.data.store import ActivationStoreReader
    from freud_tpu.scripts.merge_stores import merge_shards

    assert (out_dir / "shard0").exists() and (out_dir / "shard1").exists()
    merge_shards(out_dir, "encoder.blocks.1", verbose=False)
    single = tmp_path / "acts_single"
    get_activations(
        data_path=str(audio_dir), layer_name="encoder.blocks.1",
        whisper_model="test:tiny", sae_model=None, batch_size=2,
        out_folder=str(single), verbose=False,
    )
    rm = ActivationStoreReader(out_dir, "encoder.blocks.1")
    rs = ActivationStoreReader(single, "encoder.blocks.1")
    assert rm.filenames == rs.filenames
    am, _ = rm.batch(np.arange(len(rm)))
    as_, _ = rs.batch(np.arange(len(rs)))
    np.testing.assert_allclose(am, as_, rtol=1e-4, atol=1e-5)
