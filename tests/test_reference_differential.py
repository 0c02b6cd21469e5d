"""Differential parity against the reference's OWN torch code (oracle tests).

The rest of the suite pins freud_tpu against the reference's *published
rules* (re-derived specs, golden files, synthetic fixtures). These tests are
stronger: they execute ksadov/FREUD's actual SAE modules
(src/models/l1autoencoder.py, src/models/topkautoencoder.py — torch, CPU)
side by side with freud_tpu on IDENTICAL weights and inputs, and require
numerical agreement of

  - forward outputs and every loss term,
  - parameter gradients (torch autograd vs our hand-written VJPs),
  - full optimizer trajectories (torch RAdam/Adam + clip + LR schedules vs
    the optax chain), and
  - multi-step trainer runs (reference train loop semantics
    src/scripts/train_sae.py:425-452 vs SAETrainer's donated-jit step).

The reference tree is read-only and optional: everything here skips cleanly
when /root/reference is absent, so the suite still runs outside this
sandbox. Two inert import stubs (``simple_parsing``, ``whisper``) satisfy
reference imports not present in this environment; they are removed again in
fixture teardown so the asset-gated real-weights suite's ``find_spec``
detection is unaffected. Nothing from the reference is copied — its code is
executed in place as a test oracle only.
"""

from __future__ import annotations

import dataclasses
import importlib.machinery
import os
import sys
import types

import numpy as np
import pytest

from conftest import REFERENCE

torch = pytest.importorskip("torch")

_REF_SRC = os.path.join(REFERENCE, "src", "models")


def _install_stub(name: str, attrs: dict | None = None) -> bool:
    """Register an inert module stub; returns True if WE added it."""
    if name in sys.modules:
        return False

    class _Stub(types.ModuleType):
        def __getattr__(self, key):
            if key.startswith("__"):
                raise AttributeError(key)
            return _Stub(self.__name__ + "." + key)

    mod = _Stub(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    for key, val in (attrs or {}).items():
        setattr(mod, key, val)
    sys.modules[name] = mod
    return True


@pytest.fixture(scope="module")
def ref():
    """The reference SAE modules, imported from /root/reference in place."""
    if not os.path.isdir(_REF_SRC):
        pytest.skip("reference tree unavailable")
    added = []
    if _install_stub("simple_parsing", {"Serializable": type("Serializable", (), {})}):
        added.append("simple_parsing")
    if _install_stub("whisper"):
        added.append("whisper")
    path_added = REFERENCE not in sys.path
    if path_added:
        sys.path.insert(0, REFERENCE)
    try:
        from src.models import l1autoencoder as ref_l1
        from src.models import topkautoencoder as ref_topk

        yield types.SimpleNamespace(l1=ref_l1, topk=ref_topk)
    finally:
        if path_added:
            sys.path.remove(REFERENCE)
        for name in added:
            sys.modules.pop(name, None)


# --------------------------------------------------------------------- L1


def _make_ref_l1(ref, d_act=24, n_dict=40, recon_alpha=11.0, seed=0):
    torch.manual_seed(seed)
    cfg = ref.l1.L1AutoEncoderConfig(
        n_dict_components=n_dict, recon_alpha=recon_alpha
    )
    model = ref.l1.L1AutoEncoder(d_act, cfg)
    with torch.no_grad():
        model.encoder_bias.copy_(0.05 * torch.randn(n_dict))
    return model, cfg


def _l1_params_from_ref(model):
    from freud_tpu.models.sae import L1Params
    import jax.numpy as jnp

    return L1Params(
        W=jnp.asarray(model.decoder.weight.detach().numpy().copy()),
        encoder_bias=jnp.asarray(model.encoder_bias.detach().numpy().copy()),
    )


def test_l1_forward_matches_reference(ref):
    """Same weights + input → same latent, sae_out, and both loss terms as
    the reference forward (l1autoencoder.py:69-95), including the in-place
    decoder-column renormalization at encode time."""
    from freud_tpu.models.sae import L1AutoEncoderConfig, l1 as l1_mod

    model, _ = _make_ref_l1(ref)
    params = _l1_params_from_ref(model)
    cfg = L1AutoEncoderConfig(n_dict_components=40, recon_alpha=11.0)

    rng = np.random.default_rng(1)
    x = rng.standard_normal((3, 7, 24)).astype(np.float32)

    ref_out = model(torch.from_numpy(x))
    out = l1_mod.forward(params, x, cfg)

    np.testing.assert_allclose(
        np.asarray(out.encoded.latent),
        ref_out.encoded.latent.detach().numpy(),
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out.sae_out), ref_out.sae_out.detach().numpy(),
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        float(out.l1_loss), ref_out.l1_loss.item(), rtol=1e-5)
    np.testing.assert_allclose(
        float(out.reconstruction_loss), ref_out.reconstruction_loss.item(),
        rtol=1e-5)


def test_l1_gradients_match_reference(ref):
    """∂(recon+l1)/∂{W, bias} via torch autograd on the reference model ==
    our grads w.r.t. the normalized parameters (the reference's ``.data``
    mutation makes the normalized weight the autograd leaf — trainer.py
    mirrors that by normalizing OUTSIDE the differentiated function)."""
    import jax
    import jax.numpy as jnp

    from freud_tpu.models.sae import L1AutoEncoderConfig, l1 as l1_mod

    model, _ = _make_ref_l1(ref)
    cfg = L1AutoEncoderConfig(n_dict_components=40, recon_alpha=11.0)
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 9, 24)).astype(np.float32)

    ref_out = model(torch.from_numpy(x))
    (ref_out.reconstruction_loss + ref_out.l1_loss).backward()
    # after forward, model.decoder.weight.data HAS been normalized — grads
    # are w.r.t. that leaf
    ref_dW = model.decoder.weight.grad.numpy()
    ref_db = model.encoder_bias.grad.numpy()

    params = l1_mod.normalize_columns(_l1_params_from_ref(model))

    def loss_fn(p):
        out = l1_mod.forward(p, jnp.asarray(x), cfg, pre_normalized=True)
        return out.reconstruction_loss + out.l1_loss

    grads = jax.grad(loss_fn)(params)
    np.testing.assert_allclose(np.asarray(grads.W), ref_dW, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(grads.encoder_bias), ref_db, rtol=2e-4, atol=2e-4)


# ------------------------------------------------------------------- TopK


def _make_ref_topk(ref, d_act=20, n_dict=96, k=4, auxk_alpha=1 / 32,
                   multi_topk=False, seed=0):
    torch.manual_seed(seed)
    cfg = ref.topk.TopKAutoEncoderConfig(
        n_dict_components=n_dict, k=k, auxk_alpha=auxk_alpha,
        multi_topk=multi_topk,
    )
    model = ref.topk.TopKAutoEncoder(d_act, cfg)
    with torch.no_grad():
        model.encoder.bias.copy_(0.05 * torch.randn(n_dict))
        model.b_dec.copy_(0.05 * torch.randn(d_act))
    return model, cfg


def _topk_params_from_ref(model):
    import jax.numpy as jnp

    from freud_tpu.models.sae import TopKParams

    return TopKParams(
        encoder_weight=jnp.asarray(model.encoder.weight.detach().numpy().copy()),
        encoder_bias=jnp.asarray(model.encoder.bias.detach().numpy().copy()),
        W_dec=jnp.asarray(model.W_dec.detach().numpy().copy()),
        b_dec=jnp.asarray(model.b_dec.detach().numpy().copy()),
    )


def _topk_batch(d_act, rows=(2, 8), seed=3):
    # a mild positive shift keeps ≥ k latents strictly positive per frame, so
    # the reference's exact-k topk and our ≥-threshold selection pick the
    # same set (ties on post-ReLU zeros decode to zero either way, but the
    # reference's did_fire WOULD see them — keep the comparison clean)
    rng = np.random.default_rng(seed)
    return (rng.standard_normal((*rows, d_act)) * 0.7 + 0.15).astype(np.float32)


@pytest.mark.parametrize("num_dead,multi_topk", [
    (0, False),        # no dead latents → auxk term inert
    (48, False),       # num_dead > k_aux (= d_in//2 = 10)
    (6, False),        # num_dead < k_aux → reference shrinks k_aux
    (48, True),        # multi-topk live
])
def test_topk_forward_matches_reference(ref, num_dead, multi_topk):
    """forward (topkautoencoder.py:93-151): fvu, scaled auxk, multi-topk fvu
    and sae_out must match the reference's gather/scatter formulation — ours
    decodes via threshold-masked dense matmuls instead (no TPU scatter)."""
    from freud_tpu.models.sae import TopKAutoEncoderConfig, topk as topk_mod

    model, _ = _make_ref_topk(ref, multi_topk=multi_topk)
    params = _topk_params_from_ref(model)
    cfg = TopKAutoEncoderConfig(
        n_dict_components=96, k=4, auxk_alpha=1 / 32, multi_topk=multi_topk)

    x = _topk_batch(20)
    if num_dead:
        dead = np.zeros(96, bool)
        dead[np.random.default_rng(4).choice(96, num_dead, replace=False)] = True
        ref_out = model(torch.from_numpy(x), dead_mask=torch.from_numpy(dead))
        out = topk_mod.forward(params, x, cfg, dead_mask=dead)
    else:
        ref_out = model(torch.from_numpy(x))
        out = topk_mod.forward(params, x, cfg)

    if multi_topk:
        # reference quirk (topkautoencoder.py:135-139): under multi_topk the
        # local ``sae_out`` is overwritten by the 4k decode before the output
        # tuple is built, so forward().sae_out is the multi-topk decode even
        # though fvu and return_mse are computed from the top-k decode. No
        # reference pipeline reads .sae_out under multi_topk (validate uses
        # return_mse), so freud_tpu keeps sae_out = top-k decode; compare
        # against the reference's own encode→decode instead.
        ref_sae_out = model.decode(*model.encode(torch.from_numpy(x)))
    else:
        ref_sae_out = ref_out.sae_out
    np.testing.assert_allclose(
        np.asarray(out.sae_out), ref_sae_out.detach().numpy(),
        rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(float(out.fvu), ref_out.fvu.item(), rtol=1e-5)
    np.testing.assert_allclose(
        float(out.auxk_loss), ref_out.auxk_loss.item(), rtol=1e-4, atol=1e-7)
    np.testing.assert_allclose(
        float(out.multi_topk_fvu), ref_out.multi_topk_fvu.item(), rtol=1e-5,
        atol=1e-7)


@pytest.mark.parametrize("multi_topk", [False, True])
def test_topk_training_gradients_match_reference(ref, multi_topk):
    """∂(fvu + auxk + multi/8)/∂params (the reference train loss,
    train_sae.py:441) — torch autograd through topk/scatter vs our
    training_losses: the hand-written VJP (multi_topk=False) and the
    XLA-autodiff threshold formulation (multi_topk=True)."""
    import jax

    from freud_tpu.models.sae import TopKAutoEncoderConfig, topk as topk_mod

    model, _ = _make_ref_topk(ref, multi_topk=multi_topk)
    cfg = TopKAutoEncoderConfig(
        n_dict_components=96, k=4, auxk_alpha=1 / 32, multi_topk=multi_topk)
    params = _topk_params_from_ref(model)

    x = _topk_batch(20, rows=(3, 6), seed=5)
    dead = np.zeros(96, bool)
    dead[np.random.default_rng(6).choice(96, 40, replace=False)] = True

    ref_out = model(torch.from_numpy(x), dead_mask=torch.from_numpy(dead))
    ref_loss = ref_out.fvu + ref_out.auxk_loss + ref_out.multi_topk_fvu / 8
    ref_loss.backward()
    ref_grads = {
        "encoder_weight": model.encoder.weight.grad.numpy(),
        "encoder_bias": model.encoder.bias.grad.numpy(),
        "W_dec": model.W_dec.grad.numpy(),
        "b_dec": model.b_dec.grad.numpy(),
    }

    def loss_fn(p):
        # keep x in its (b, s, d) shape: total_variance subtracts the mean
        # over axis 0, so reshaping here would silently change the loss scale
        terms, _ = topk_mod.training_losses(p, x, cfg, jax.numpy.asarray(dead))
        return terms["fvu"] + terms["auxk_loss"] + terms["multi_topk_fvu"] / 8

    grads = jax.grad(loss_fn)(params)
    for name, ref_g in ref_grads.items():
        np.testing.assert_allclose(
            np.asarray(getattr(grads, name)), ref_g, rtol=5e-4, atol=5e-5,
            err_msg=f"grad mismatch: {name} (multi_topk={multi_topk})")


def test_topk_maintenance_ops_match_reference(ref):
    """set_decoder_norm_to_unit_norm + remove_gradient_parallel_to_decoder_
    directions (topkautoencoder.py:154-180) against our pure versions."""
    from freud_tpu.models.sae import topk as topk_mod

    model, _ = _make_ref_topk(ref)
    params = _topk_params_from_ref(model)
    rng = np.random.default_rng(7)
    grad = rng.standard_normal(model.W_dec.shape).astype(np.float32)

    model.W_dec.grad = torch.from_numpy(grad.copy())
    model.remove_gradient_parallel_to_decoder_directions()
    ours = topk_mod.remove_gradient_parallel_to_decoder_directions(
        params.W_dec, grad)
    np.testing.assert_allclose(
        np.asarray(ours), model.W_dec.grad.numpy(), rtol=1e-5, atol=1e-6)

    with torch.no_grad():
        model.W_dec.mul_(3.7)
    model.set_decoder_norm_to_unit_norm()
    scaled = topk_mod.set_decoder_norm_to_unit_norm(params.W_dec * 3.7)
    np.testing.assert_allclose(
        np.asarray(scaled), model.W_dec.detach().numpy(), rtol=1e-5, atol=1e-6)


# -------------------------------------------------- optimizers / schedules


@pytest.mark.parametrize("opt_name,sched_name", [
    ("radam", "cosine"),
    ("adam", "linear"),
])
def test_optimizer_trajectory_matches_torch(opt_name, sched_name):
    """30 updates with identical gradient sequences: the optax chain (clip →
    RAdam/Adam → schedule) must track torch's RAdam(eps=1e-5)/Adam +
    clip_grad_norm_ + CosineAnnealingLR / linear-warmup stepping order
    (optimizer.step() then scheduler.step(), train_sae.py:448-451) —
    including RAdam's rectification warmup, where early steps fall back to
    un-adapted SGD-with-momentum."""
    import jax.numpy as jnp

    from freud_tpu.train.optim import make_optimizer

    steps, lr = 30, 0.03
    shapes = [(8, 4), (6,)]
    rng = np.random.default_rng(8)
    init = [rng.standard_normal(s).astype(np.float32) for s in shapes]
    grads = [
        [rng.standard_normal(s).astype(np.float32) * 3.0 for s in shapes]
        for _ in range(steps)
    ]

    # ---- torch trajectory (the reference's exact construction)
    t_params = [torch.nn.Parameter(torch.from_numpy(p.copy())) for p in init]
    if opt_name == "radam":
        t_opt = torch.optim.RAdam(t_params, eps=1e-5, lr=lr, weight_decay=0.0)
        t_sched = torch.optim.lr_scheduler.CosineAnnealingLR(
            t_opt, T_max=steps, eta_min=0)
    else:
        t_opt = torch.optim.Adam(t_params, lr=lr)
        from torch.optim.lr_scheduler import LambdaLR

        warmup = 5

        def lr_lambda(current_step):  # transformers' linear schedule
            if current_step < warmup:
                return float(current_step) / float(max(1, warmup))
            return max(
                0.0,
                float(steps - current_step) / float(max(1, steps - warmup)))

        t_sched = LambdaLR(t_opt, lr_lambda)
    for g in grads:
        t_opt.zero_grad()
        for p, gi in zip(t_params, g):
            p.grad = torch.from_numpy(gi.copy())
        torch.nn.utils.clip_grad_norm_(t_params, 1.0)
        t_opt.step()
        t_sched.step()

    # ---- optax trajectory
    tx, _ = make_optimizer(
        opt_name, sched_name, lr, steps, clip_thresh=1.0,
        scheduler_params={"num_warmup_steps": 5},
    )
    params = [jnp.asarray(p) for p in init]
    state = tx.init(params)
    for g in grads:
        updates, state = tx.update([jnp.asarray(gi) for gi in g], state, params)
        params = [p + u for p, u in zip(params, updates)]

    for ours, theirs in zip(params, t_params):
        np.testing.assert_allclose(
            np.asarray(ours), theirs.detach().numpy(), rtol=1e-4, atol=1e-5)


# ------------------------------------------------------- full train loops


def test_l1_trainer_tracks_reference_loop(ref):
    """Five full steps: SAETrainer's donated-jit L1 step vs a hand-rolled
    torch loop over the reference model with the reference's optimizer,
    clip, and scheduler — final parameters must agree."""
    from freud_tpu.train.trainer import SAETrainer

    d_act, n_dict, steps = 24, 40, 5
    model, _ = _make_ref_l1(ref, d_act=d_act, n_dict=n_dict, recon_alpha=11.0)
    t_opt = torch.optim.RAdam(
        model.parameters(), eps=1e-5, lr=1e-3, weight_decay=0.0)
    t_sched = torch.optim.lr_scheduler.CosineAnnealingLR(
        t_opt, T_max=100, eta_min=0)

    trainer = SAETrainer(
        "l1", {"n_dict_components": n_dict, "recon_alpha": 11.0}, d_act,
        optimizer="radam", scheduler="cosine", lr=1e-3, steps=100,
        clip_thresh=1.0, amp=False,
    )
    trainer.params = _l1_params_from_ref(model)

    rng = np.random.default_rng(9)
    losses, ref_losses = [], []
    for _ in range(steps):
        x = rng.standard_normal((2, 12, d_act)).astype(np.float32)

        t_opt.zero_grad()
        out = model(torch.from_numpy(x))
        t_loss = out.reconstruction_loss + out.l1_loss
        t_loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 1.0)
        t_opt.step()
        t_sched.step()
        ref_losses.append(t_loss.item())

        metrics = trainer.train_step(x)
        losses.append(float(metrics["loss"]))

    np.testing.assert_allclose(losses, ref_losses, rtol=1e-4)
    # the reference leaves the stored weight normalized after its last
    # forward; normalize ours for the comparison
    from freud_tpu.models.sae import l1 as l1_mod

    final = l1_mod.normalize_columns(trainer.params)
    with torch.no_grad():
        ref_w = torch.nn.functional.normalize(model.decoder.weight, dim=0)
    np.testing.assert_allclose(
        np.asarray(final.W), ref_w.numpy(), rtol=5e-4, atol=5e-5)
    np.testing.assert_allclose(
        np.asarray(final.encoder_bias), model.encoder_bias.detach().numpy(),
        rtol=5e-4, atol=5e-5)


def test_topk_trainer_tracks_reference_loop(ref):
    """Five full steps of the TopK recipe, dead-feature counters live
    (dead_feature_threshold=0 → AuxK active from step 2): SAETrainer vs the
    reference loop (train_sae.py:425-452, including did_fire → counter
    reset semantics). Final params and per-step losses must agree."""
    from freud_tpu.train.trainer import SAETrainer

    d_act, n_dict, k, steps = 20, 96, 4, 5
    model, _ = _make_ref_topk(ref, d_act=d_act, n_dict=n_dict, k=k)
    t_opt = torch.optim.Adam(model.parameters(), lr=1e-3)
    warmup, total = 2, 100
    from torch.optim.lr_scheduler import LambdaLR

    t_sched = LambdaLR(
        t_opt,
        lambda s: (s / warmup if s < warmup
                   else max(0.0, (total - s) / (total - warmup))))

    trainer = SAETrainer(
        "topk",
        {"n_dict_components": n_dict, "k": k, "auxk_alpha": 1 / 32,
         "dead_feature_threshold": 0.0},
        d_act,
        optimizer="adam", scheduler="linear",
        scheduler_params={"num_warmup_steps": warmup},
        lr=1e-3, steps=total, clip_thresh=1.0, amp=False,
    )
    trainer.params = _topk_params_from_ref(model)

    counters = torch.zeros(n_dict)
    rng = np.random.default_rng(10)
    losses, ref_losses = [], []
    for _ in range(steps):
        x = _topk_batch(d_act, rows=(2, 10), seed=int(rng.integers(1 << 30)))

        dead = counters > 0.0
        did_fire = torch.zeros(n_dict, dtype=torch.bool)
        t_opt.zero_grad()
        out = model(
            torch.from_numpy(x),
            dead_mask=dead if int(dead.sum()) else None)
        t_loss = out.fvu + out.auxk_loss + out.multi_topk_fvu / 8
        t_loss.backward()
        did_fire[out.encoded.top_indices.flatten()] = True
        counters += x.shape[0] * x.shape[1]
        counters[did_fire] = 0
        torch.nn.utils.clip_grad_norm_(model.parameters(), 1.0)
        t_opt.step()
        t_sched.step()
        ref_losses.append(t_loss.item())

        metrics = trainer.train_step(x)
        losses.append(float(metrics["loss"]))

    np.testing.assert_allclose(losses, ref_losses, rtol=2e-4)
    final = trainer.params
    np.testing.assert_allclose(
        np.asarray(final.encoder_weight), model.encoder.weight.detach().numpy(),
        rtol=5e-4, atol=5e-5)
    np.testing.assert_allclose(
        np.asarray(final.W_dec), model.W_dec.detach().numpy(),
        rtol=5e-4, atol=5e-5)
    np.testing.assert_allclose(
        np.asarray(final.b_dec), model.b_dec.detach().numpy(),
        rtol=5e-4, atol=5e-5)


def _l1_convergence_curves(ref, steps, rows=(2, 64), d_act=384, n_dict=200,
                           recon_alpha=1e4, lr=4e-4):
    """The tiny_l1 recipe's hyperparameters at CPU-affordable batch shapes:
    run the reference torch loop (train_sae.py:417-451 semantics) and
    SAETrainer over the SAME synthetic-speech-like data stream (sparse
    positive codes over a ground-truth dictionary) from the SAME init.
    → (our losses, ref losses) per step."""
    import jax.numpy as jnp

    from freud_tpu.train.trainer import SAETrainer

    torch.manual_seed(0)
    cfg = ref.l1.L1AutoEncoderConfig(
        n_dict_components=n_dict, recon_alpha=recon_alpha)
    model = ref.l1.L1AutoEncoder(d_act, cfg)
    t_opt = torch.optim.RAdam(
        model.parameters(), eps=1e-5, lr=lr, weight_decay=0.0)
    t_sched = torch.optim.lr_scheduler.CosineAnnealingLR(
        t_opt, T_max=steps, eta_min=0)

    trainer = SAETrainer(
        "l1", {"n_dict_components": n_dict, "recon_alpha": recon_alpha},
        d_act, optimizer="radam", scheduler="cosine", lr=lr, steps=steps,
        clip_thresh=1.0, amp=False,
    )
    trainer.params = _l1_params_from_ref(model)

    gt_rng = np.random.default_rng(42)
    gt = gt_rng.standard_normal((32, d_act)).astype(np.float32)
    gt /= np.linalg.norm(gt, axis=1, keepdims=True)

    def batch(step):
        r = np.random.default_rng((42, step))
        codes = r.exponential(1.0, (*rows, 32)).astype(np.float32)
        codes[r.random((*rows, 32)) < 0.85] = 0.0
        x = codes @ gt + 0.01 * r.standard_normal(
            (*rows, d_act)).astype(np.float32)
        return x.astype(np.float32)

    losses, ref_losses = [], []
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
    return np.asarray(losses), np.asarray(ref_losses)


def _topk_convergence_curves(ref, steps, rows=(2, 64), d_act=384,
                             expansion=16, k=32, auxk_alpha=1 / 32,
                             dead_threshold=10_000.0, lr=1e-4,
                             warmup=1000):
    """The tiny_topk recipe's hyperparameters (Adam, linear schedule with
    1k-step warmup, expansion 16, k=32, auxk_alpha=1/32, clip 1.0 —
    configs/train/tiny_topk.json) at CPU-affordable batch shapes: run the
    reference torch loop (train_sae.py:417-452, INCLUDING the dead-counter
    did_fire/reset dynamics and the dead-mask AuxK term) and SAETrainer over
    the SAME synthetic data stream from the SAME init. ``dead_threshold``
    defaults to 10k frames instead of the recipe's 1e6 so dead features
    actually appear within a 1k-step horizon (128 frames/step → first
    possible death at step ~79) and the AuxK path stays LIVE for most of
    the run — everything else is the recipe verbatim.
    → (our losses, ref losses, our dead-pct curve) per step."""
    from freud_tpu.train.trainer import SAETrainer

    n_dict = d_act * expansion
    model, _ = _make_ref_topk(ref, d_act=d_act, n_dict=n_dict, k=k)
    t_opt = torch.optim.Adam(model.parameters(), lr=lr, weight_decay=0.0)
    from torch.optim.lr_scheduler import LambdaLR

    # the reference's get_linear_schedule_with_warmup formula
    t_sched = LambdaLR(
        t_opt,
        lambda s: (s / warmup if s < warmup
                   else max(0.0, (steps - s) / max(1, steps - warmup))))

    trainer = SAETrainer(
        "topk",
        {"expansion_factor": expansion, "normalize_decoder": True, "k": k,
         "multi_topk": False, "auxk_alpha": auxk_alpha,
         "dead_feature_threshold": dead_threshold},
        d_act,
        optimizer="adam", scheduler="linear",
        scheduler_params={"num_warmup_steps": warmup},
        lr=lr, steps=steps, clip_thresh=1.0, amp=False,
    )
    trainer.params = _topk_params_from_ref(model)

    gt_rng = np.random.default_rng(43)
    gt = gt_rng.standard_normal((64, d_act)).astype(np.float32)
    gt /= np.linalg.norm(gt, axis=1, keepdims=True)

    def batch(step):
        r = np.random.default_rng((43, step))
        codes = r.exponential(1.0, (*rows, 64)).astype(np.float32)
        codes[r.random((*rows, 64)) < 0.9] = 0.0
        x = codes @ gt + 0.01 * r.standard_normal(
            (*rows, d_act)).astype(np.float32)
        return x.astype(np.float32)

    counters = torch.zeros(n_dict, dtype=torch.long)
    losses, ref_losses, dead_pct = [], [], []
    for s in range(steps):
        x = batch(s)
        dead = counters > dead_threshold
        did_fire = torch.zeros(n_dict, dtype=torch.bool)
        t_opt.zero_grad()
        out = model(torch.from_numpy(x), dead_mask=dead)
        t_loss = out.fvu + out.auxk_loss + out.multi_topk_fvu / 8
        t_loss.backward()
        did_fire[out.encoded.top_indices.flatten()] = True
        counters += x.shape[0] * x.shape[1]
        counters[did_fire] = 0
        torch.nn.utils.clip_grad_norm_(model.parameters(), 1.0)
        t_opt.step()
        t_sched.step()
        ref_losses.append(t_loss.item())
        m = trainer.train_step(x)
        losses.append(float(m["loss"]))
        dead_pct.append(float(m["dead_pct"]))
    return (np.asarray(losses), np.asarray(ref_losses),
            np.asarray(dead_pct))


def test_topk_convergence_parity_recipe_scale(ref):
    """Recipe-scale convergence parity for the TopK variant (VERDICT r4
    weak-6): 1000 steps of the tiny_topk hyperparameters — the variant with
    the most hand-written machinery (custom VJP, SWAR bisection,
    dead-counter dynamics) must track the reference loop's loss CURVE, with
    the AuxK/dead path live for most of the horizon, not just 5
    parameter-exact steps. tools/convergence_parity_topk.py records the
    curve artifact at the full tiny shapes (d_act=384, n_dict=6144); the
    in-suite run shrinks only d_act (one CPU core — ~0.2 s/step at
    n_dict=1536 vs ~6× that at 6144), every recipe hyperparameter and the
    loop semantics identical."""
    losses, ref_losses, dead_pct = _topk_convergence_curves(
        ref, steps=1000, d_act=96)
    # real convergence happened and the dead/AuxK dynamics actually engaged
    assert ref_losses[-100:].mean() < 0.5 * ref_losses[:10].mean()
    assert dead_pct[-1] > 0.0, "dead features never appeared — AuxK untested"
    rel = np.abs(losses - ref_losses) / np.abs(ref_losses)
    assert rel.max() < 0.02, f"per-step divergence {rel.max():.4f}"
    final = abs(losses[-100:].mean() - ref_losses[-100:].mean())
    assert final / ref_losses[-100:].mean() < 0.01


def test_l1_convergence_parity_recipe_scale(ref):
    """Recipe-scale convergence parity (VERDICT r3 item 3): 1000 steps of
    the tiny_l1 hyperparameters (recon_alpha 1e4, RAdam eps 1e-5 + cosine,
    clip 1.0, lr 4e-4) — the loss CURVE must track the reference loop, not
    just 5 parameter-exact steps. Measured divergence is ≲0.6% per step and
    ≲0.3% on the final window (tools/convergence_parity.py records the
    curve artifact); the bounds below are 3× that."""
    losses, ref_losses = _l1_convergence_curves(ref, steps=1000)
    # real convergence must have happened (the curve is meaningful)
    assert ref_losses[-100:].mean() < 0.25 * ref_losses[0]
    rel = np.abs(losses - ref_losses) / np.abs(ref_losses)
    assert rel.max() < 0.02, f"per-step divergence {rel.max():.4f}"
    final = abs(losses[-100:].mean() - ref_losses[-100:].mean())
    assert final / ref_losses[-100:].mean() < 0.01


@pytest.mark.skipif(not os.environ.get("FREUD_SLOW"),
                    reason="set FREUD_SLOW=1 for the 2k-step full check")
def test_l1_convergence_parity_full(ref):
    """Slow full-tolerance variant: 2000 steps, final dictionary loss within
    0.5% — the ≥5×-A100 north star's 'same loss' leg, CPU-verifiable."""
    losses, ref_losses = _l1_convergence_curves(ref, steps=2000)
    final = abs(losses[-100:].mean() - ref_losses[-100:].mean())
    assert final / ref_losses[-100:].mean() < 0.005
    assert np.abs(losses - ref_losses).max() / ref_losses[0] < 0.02


# ------------------------------------------------- artifact interchange


@pytest.fixture(scope="module")
def ref_ds(ref):
    """The reference's store-reading code (src/dataset/activations.py),
    imported in place. Depends on ``ref`` so the stubs/path are live."""
    from src.dataset import activations as ref_acts

    return ref_acts


def test_reference_reads_our_dense_store(ref_ds, tmp_path):
    """A dense store written by ActivationStoreWriter must be readable by
    the reference's MemoryMappedActivationsDataset byte-for-byte
    (src/dataset/activations.py:117-175): same tensors, filenames, length,
    and activation_shape — including rows appended across two flushes."""
    from freud_tpu.data.store import ActivationStoreReader, ActivationStoreWriter

    layer, T, d = "encoder.blocks.2", 12, 8
    rng = np.random.default_rng(11)
    data = rng.standard_normal((5, T, d)).astype(np.float32)
    names = [f"clip_{i}.flac" for i in range(5)]
    with ActivationStoreWriter(tmp_path, layer, (T, d), (T, d)) as w:
        w.append_batch(names[:3], data[:3], n_frames=[T, T - 2, T])
        w.flush()  # exercise the append-grown NPY header across a flush
        w.append_batch(names[3:], data[3:], n_frames=[T - 5, T])

    ds = ref_ds.MemoryMappedActivationsDataset(str(tmp_path), layer)
    assert len(ds) == 5
    assert ds.activation_type == "tensor"
    assert list(ds.activation_shape) == [T, d]
    ours = ActivationStoreReader(tmp_path, layer)
    for i in range(5):
        tensor, fname = ds[i]
        assert fname == names[i]
        np.testing.assert_array_equal(tensor.numpy(), data[i])
        our_tensor, our_name = ours[i]
        np.testing.assert_array_equal(tensor.numpy(), our_tensor)
        assert our_name == fname


def test_reference_reads_our_float16_store(ref_ds, tmp_path):
    """The opt-in float16 store stays a standard NPY the reference's reader
    opens unchanged (its pipeline then carries torch.float16 tensors — the
    documented divergence of opting in; data/store.py)."""
    import torch

    from freud_tpu.data.store import ActivationStoreWriter

    layer, T, d = "encoder.blocks.2", 6, 4
    rng = np.random.default_rng(13)
    data = rng.standard_normal((3, T, d)).astype(np.float16)
    names = [f"h{i}.wav" for i in range(3)]
    with ActivationStoreWriter(tmp_path, layer, (T, d), (T, d),
                               store_dtype=np.float16) as w:
        w.append_batch(names, data, n_frames=[T] * 3)

    ds = ref_ds.MemoryMappedActivationsDataset(str(tmp_path), layer)
    assert len(ds) == 3
    for i in range(3):
        tensor, fname = ds[i]
        assert fname == names[i]
        assert tensor.dtype == torch.float16
        np.testing.assert_array_equal(tensor.numpy(), data[i])


def test_reference_reads_our_indexed_store(ref_ds, tmp_path):
    """Indexed (TopK) layout: the reference autodetects it from the absence
    of {layer}_tensors.npy and reads value/index planes separately."""
    from freud_tpu.data.store import ActivationStoreWriter

    layer, T, k = "encoder.blocks.3", 9, 4
    rng = np.random.default_rng(12)
    vals = rng.standard_normal((4, T, k)).astype(np.float32)
    idx = rng.integers(0, 640, size=(4, T, k)).astype(np.int64)
    names = [f"f{i}.wav" for i in range(4)]
    with ActivationStoreWriter(
        tmp_path, layer, (T, k), (T, 640), indexed=True
    ) as w:
        w.append_batch(names, vals, idx, n_frames=[T] * 4)

    ds = ref_ds.MemoryMappedActivationsDataset(str(tmp_path), layer)
    assert ds.activation_type == "indexed"
    assert len(ds) == 4
    for i in range(4):
        act, indices, fname = ds[i]
        assert fname == names[i]
        np.testing.assert_array_equal(act.numpy(), vals[i])
        np.testing.assert_array_equal(indices.numpy(), idx[i])


@pytest.mark.parametrize("variant", ["l1", "topk"])
def test_reference_module_loads_our_trainer_checkpoint(ref, tmp_path, variant):
    """End-to-end checkpoint interchange THROUGH the reference's own code
    path: a stock ``torch.load(path, map_location=...)`` — torch ≥ 2.6
    defaults weights_only=True, so every leaf we write must be
    weights_only-safe (src/dataset/activations.py:19) — followed by
    ``load_state_dict(strict=True)`` into the reference nn.Module, then a
    forward agreement check against our own params."""
    from freud_tpu.models.sae import (
        L1AutoEncoderConfig, TopKAutoEncoderConfig, init_l1, init_topk,
        l1 as l1_mod, topk as topk_mod,
    )
    from freud_tpu.train.checkpoint import save_trainer_checkpoint

    d_act = 16
    if variant == "l1":
        cfg = L1AutoEncoderConfig(n_dict_components=24, recon_alpha=7.0)
        params = init_l1(d_act, cfg, seed=3)
    else:
        cfg = TopKAutoEncoderConfig(n_dict_components=48, k=4, auxk_alpha=0.0)
        params = init_topk(d_act, cfg, seed=3)

    path = tmp_path / "ckpt.pth"
    hparams = {
        "autoencoder_variant": variant,
        "autoencoder_config": dataclasses.asdict(cfg),
        "activation_size": d_act,
    }
    save_trainer_checkpoint(
        str(path), variant, params, opt_state=(), step=7,
        best_val_loss=1.25, hparams=hparams)

    # the reference's exact load call (init_sae_from_checkpoint line 19):
    # stock torch.load, no weights_only escape hatch
    ckpt = torch.load(str(path), map_location="cpu")
    assert ckpt["hparams"]["autoencoder_variant"] == variant
    assert ckpt["hparams"]["activation_size"] == d_act
    assert ckpt["step"] == 7

    x = np.random.default_rng(13).standard_normal((2, 5, d_act)).astype(np.float32)
    if variant == "l1":
        ref_cfg = ref.l1.L1AutoEncoderConfig(n_dict_components=24, recon_alpha=7.0)
        model = ref.l1.L1AutoEncoder(d_act, ref_cfg)
        model.load_state_dict(ckpt["model"], strict=True)
        model.eval()
        ref_out = model(torch.from_numpy(x))
        out = l1_mod.forward(params, x, cfg)
        np.testing.assert_allclose(
            np.asarray(out.sae_out), ref_out.sae_out.detach().numpy(),
            rtol=1e-5, atol=1e-5)
    else:
        ref_cfg = ref.topk.TopKAutoEncoderConfig(
            n_dict_components=48, k=4, auxk_alpha=0.0)
        model = ref.topk.TopKAutoEncoder(d_act, ref_cfg)
        model.load_state_dict(ckpt["model"], strict=True)
        model.eval()
        ref_out = model(torch.from_numpy(x))
        out = topk_mod.forward(params, x, cfg)
        np.testing.assert_allclose(
            np.asarray(out.sae_out), ref_out.sae_out.detach().numpy(),
            rtol=1e-5, atol=1e-5)


# -------------------------------------------------------- search oracle


@pytest.fixture(scope="module")
def ref_search(ref):
    """The reference's search code (src/utils/activations.py). Its
    trim_activation reads audio durations through torchaudio, which is not
    in this environment — a faithful WAV-backed shim (stdlib ``wave``)
    provides exactly the two calls it makes: load()[0] → (channels, n)
    float tensor, and info().sample_rate."""
    import wave as wave_mod

    class _Info:
        def __init__(self, sample_rate):
            self.sample_rate = sample_rate

    def _load(path):
        with wave_mod.open(path, "rb") as w:
            frames = w.readframes(w.getnframes())
            arr = np.frombuffer(frames, np.int16).astype(np.float32) / 32768.0
            arr = arr.reshape(-1, w.getnchannels()).T
            return torch.from_numpy(arr.copy()), w.getframerate()

    def _info(path):
        with wave_mod.open(path, "rb") as w:
            return _Info(w.getframerate())

    added = _install_stub("torchaudio")
    sys.modules["torchaudio"].load = _load
    sys.modules["torchaudio"].info = _info
    try:
        from src.utils import activations as ref_search_mod

        yield ref_search_mod
    finally:
        if added:
            sys.modules.pop("torchaudio", None)


@pytest.fixture(scope="module")
def search_store(tmp_path_factory):
    """A dense store + matching WAV files with NON-UNIFORM durations, so the
    per-file trim actually changes which frame wins."""
    import wave as wave_mod

    from freud_tpu.constants import TIMESTEP_S
    from freud_tpu.data.store import ActivationStoreWriter

    root = tmp_path_factory.mktemp("search_oracle")
    audio_dir = root / "audio"
    audio_dir.mkdir()
    layer, T, d, n = "encoder.blocks.1", 40, 6, 8
    rng = np.random.default_rng(21)
    durations = rng.uniform(0.2, T * TIMESTEP_S, size=n)
    names, n_frames = [], []
    for i, dur in enumerate(durations):
        path = str(audio_dir / f"clip{i}.wav")
        samples = int(dur * 16000)
        with wave_mod.open(path, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes(
                (rng.standard_normal(samples) * 1000).astype(np.int16).tobytes())
        names.append(path)
        n_frames.append(int((samples / 16000) / TIMESTEP_S))
    data = rng.standard_normal((n, T, d)).astype(np.float32)
    with ActivationStoreWriter(root, layer, (T, d), (T, d)) as w:
        w.append_batch(names, data, n_frames=n_frames)
    return types.SimpleNamespace(root=root, layer=layer, names=names,
                                 n_frames=n_frames, data=data, T=T, d=d)


@pytest.mark.parametrize("kwargs", [
    dict(feature_idx=2, n_files=4),
    dict(feature_idx=0, n_files=3, min_val=-0.5, max_val=1.2),
    dict(feature_idx=4, n_files=5, absolute_magnitude=True),
])
def test_search_matches_reference(ref_search, search_store, kwargs):
    """top_activations vs the reference's scan (utils/activations.py:60-133)
    over the SAME store and audio files: result ordering, file identity,
    max values, trimmed traces, report times, and the max-per-file
    histogram list. One documented divergence: in absolute_magnitude mode
    the reference reports the time of the SIGNED argmax while returning the
    absolute max value (its trimmed_activation.argmax() is not abs'd —
    line 120-121); freud_tpu reports the time of the value it returns, so
    times are only compared in plain mode."""
    from freud_tpu.analysis.search import top_activations
    from freud_tpu.data.loaders import MemoryMappedActivationLoader

    s = search_store
    ref_loader = ref_search.MemoryMappedActivationDataLoader(
        str(s.root), s.layer, batch_size=3, dl_max_workers=0)
    ref_results, ref_maxes = ref_search.top_activations(
        ref_loader,
        kwargs["feature_idx"], kwargs["n_files"],
        kwargs.get("max_val"), kwargs.get("min_val"),
        kwargs.get("absolute_magnitude", False),
        True,
    )

    loader = MemoryMappedActivationLoader(str(s.root), s.layer, batch_size=3)
    results, maxes = top_activations(
        loader, return_max_per_file=True, **kwargs)

    assert len(results) == len(ref_results)
    for ours, theirs in zip(results, ref_results):
        fname, trace, value, time_s = ours
        ref_fname, ref_trace, ref_value, ref_time = theirs
        assert fname == ref_fname
        np.testing.assert_allclose(value, ref_value, rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(trace), ref_trace.numpy(), rtol=1e-6)
        if not kwargs.get("absolute_magnitude"):
            np.testing.assert_allclose(time_s, ref_time, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(maxes), np.asarray(ref_maxes),
                               rtol=1e-6)


@pytest.fixture(scope="module")
def indexed_search_store(tmp_path_factory):
    """An INDEXED (TopK-SAE layout) store + non-uniform-duration WAVs.
    Indices are distinct within each frame — the reference's densify does
    ``(row == feature_idx).nonzero().item()``, which requires a feature to
    appear at most once per timestep (true of real top-k output)."""
    import wave as wave_mod

    from freud_tpu.constants import TIMESTEP_S
    from freud_tpu.data.store import ActivationStoreWriter

    root = tmp_path_factory.mktemp("search_oracle_idx")
    audio_dir = root / "audio"
    audio_dir.mkdir()
    layer, T, k, n_feat, n = "encoder.blocks.2", 30, 4, 12, 6
    rng = np.random.default_rng(31)
    names, n_frames = [], []
    for i in range(n):
        dur = rng.uniform(0.2, T * TIMESTEP_S)
        path = str(audio_dir / f"clip{i}.wav")
        samples = int(dur * 16000)
        with wave_mod.open(path, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes(
                (rng.standard_normal(samples) * 1000).astype(np.int16).tobytes())
        names.append(path)
        n_frames.append(int((samples / 16000) / TIMESTEP_S))
    vals = rng.standard_normal((n, T, k)).astype(np.float32)
    idx = np.stack([
        np.stack([rng.choice(n_feat, size=k, replace=False) for _ in range(T)])
        for _ in range(n)
    ]).astype(np.int64)
    # metadata activation_shape is (T, n_dict) for indexed stores (the
    # fly loader's probe shape), while stored rows are (T, k) pairs
    with ActivationStoreWriter(root, layer, (T, k), [T, n_feat],
                               indexed=True) as w:
        w.append_batch(names, vals, idx, n_frames=n_frames)
    return types.SimpleNamespace(root=root, layer=layer, names=names)


@pytest.mark.parametrize("kwargs", [
    dict(feature_idx=3, n_files=4),
    dict(feature_idx=7, n_files=3, absolute_magnitude=True),
])
def test_indexed_search_matches_reference(ref_search, indexed_search_store,
                                          kwargs):
    """The INDEXED store path: the reference densifies each row with its
    nested-loop activation_tensor_from_indexed (utils/activations.py:41-57);
    ours densifies on device (_densify_indexed). Ordering, values, traces,
    and the histogram list must agree."""
    from freud_tpu.analysis.search import top_activations
    from freud_tpu.data.loaders import MemoryMappedActivationLoader

    s = indexed_search_store
    ref_loader = ref_search.MemoryMappedActivationDataLoader(
        str(s.root), s.layer, batch_size=2, dl_max_workers=0)
    ref_results, ref_maxes = ref_search.top_activations(
        ref_loader, kwargs["feature_idx"], kwargs["n_files"],
        None, None, kwargs.get("absolute_magnitude", False), True,
    )

    loader = MemoryMappedActivationLoader(str(s.root), s.layer, batch_size=2)
    results, maxes = top_activations(
        loader, return_max_per_file=True, **kwargs)

    assert len(results) == len(ref_results)
    for ours, theirs in zip(results, ref_results):
        fname, trace, value, time_s = ours
        ref_fname, ref_trace, ref_value, ref_time = theirs
        assert fname == ref_fname
        np.testing.assert_allclose(value, ref_value, rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(trace), ref_trace.numpy(), rtol=1e-6)
        if not kwargs.get("absolute_magnitude"):
            np.testing.assert_allclose(time_s, ref_time, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(maxes), np.asarray(ref_maxes),
                               rtol=1e-6)


# ----------------------------------------------------------- mel oracle


@pytest.fixture(scope="module")
def ref_audio_utils(ref):
    from src.utils import audio_utils as ref_audio

    return ref_audio


def test_mel_matches_reference_on_speech(ref_audio_utils, example_flac):
    """get_mels_from_np_array (audio_utils.py:117-123, its own torch.stft +
    bundled filterbank + whisper epilogue) vs our framed-matmul DFT on the
    real speech clip — the exact array every reference pipeline feeds the
    encoder."""
    from freud_tpu.audio.decode import load_audio
    from freud_tpu.audio.mel import mels_from_array

    audio = load_audio(example_flac)
    ref_mels = ref_audio_utils.get_mels_from_np_array("cpu", audio, 80)
    ours = mels_from_array(audio, 80)
    assert tuple(ours.shape) == tuple(ref_mels.shape) == (80, 3000)
    np.testing.assert_allclose(
        np.asarray(ours), ref_mels.numpy(), atol=3e-4, rtol=0)


def test_mel_matches_reference_on_noise(ref_audio_utils):
    """Same comparison on short noise (exercises the pad path: 1.7 s →
    padded to 30 s; the dynamic-range floor then depends on the global max,
    so agreement here pins the epilogue ordering too)."""
    from freud_tpu.audio.mel import mels_from_array

    rng = np.random.default_rng(30)
    audio = (rng.standard_normal(int(1.7 * 16000)) * 0.2).astype(np.float32)
    ref_mels = ref_audio_utils.get_mels_from_np_array("cpu", audio, 80)
    ours = mels_from_array(audio, 80)
    np.testing.assert_allclose(
        np.asarray(ours), ref_mels.numpy(), atol=3e-4, rtol=0)
