"""Fused L1 train-step kernel vs the reference XLA autodiff path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from freud_tpu.models.sae import L1AutoEncoderConfig, init_l1, l1
from freud_tpu.ops.sae_fused import fused_l1_grads, fused_l1_value_and_grad

INTERPRET = jax.default_backend() == "cpu"


def _unfused_value_and_grad(params, x, cfg):
    params = l1.normalize_columns(params)

    def loss_fn(p):
        out = l1.forward(p, x, cfg, pre_normalized=True)
        return out.reconstruction_loss + out.l1_loss, out

    (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    return loss, out, grads


@pytest.mark.parametrize("shape", [(4, 16, 8), (3, 100, 8)])
def test_fused_matches_autodiff(shape):
    rng = np.random.default_rng(0)
    cfg = L1AutoEncoderConfig(n_dict_components=24, recon_alpha=50.0)
    params = init_l1(shape[-1], cfg, seed=1)
    params = params._replace(
        encoder_bias=jnp.asarray(rng.standard_normal(24).astype(np.float32) * 0.1)
    )
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))

    loss_ref, out_ref, grads_ref = _unfused_value_and_grad(params, x, cfg)
    (loss, (lr_, ll_)), grads = fused_l1_value_and_grad(
        params, x, cfg.recon_alpha, interpret=INTERPRET
    )

    np.testing.assert_allclose(float(lr_), float(out_ref.reconstruction_loss),
                               rtol=2e-2)
    np.testing.assert_allclose(float(ll_), float(out_ref.l1_loss), rtol=2e-2)
    # gradients: bf16 matmuls vs f32 autodiff → loose relative tolerance
    gW, gW_ref = np.asarray(grads.W), np.asarray(grads_ref.W)
    scale = np.abs(gW_ref).max()
    np.testing.assert_allclose(gW, gW_ref, atol=3e-2 * scale)
    gb, gb_ref = np.asarray(grads.encoder_bias), np.asarray(grads_ref.encoder_bias)
    np.testing.assert_allclose(gb, gb_ref, atol=3e-2 * max(np.abs(gb_ref).max(), 1e-6))


def test_fused_partial_tile_masking():
    """A batch that is not a multiple of the kernel tile must match exactly
    the same data processed as separate calls (padded rows contribute 0)."""
    rng = np.random.default_rng(2)
    cfg = L1AutoEncoderConfig(n_dict_components=16, recon_alpha=10.0)
    params = init_l1(8, cfg, seed=0)
    Wn = l1.normalize_columns(params).W

    x_small = jnp.asarray(rng.standard_normal((1, 7, 8)).astype(np.float32))
    lr1, ll1, dW1, db1 = fused_l1_grads(
        Wn, params.encoder_bias, x_small, 10.0, interpret=INTERPRET
    )
    # golden with plain numpy (f32/f64 — bf16 error is far below tolerance
    # at these magnitudes)
    xm = np.asarray(x_small).reshape(-1, 8).astype(np.float64)
    W = np.asarray(Wn, np.float64)
    c = np.maximum(xm @ W, 0.0)
    xh = c @ W.T
    e = xh - xm
    np.testing.assert_allclose(
        float(lr1), 10.0 * (e ** 2).mean(), rtol=2e-2
    )
    np.testing.assert_allclose(float(ll1), np.abs(c).sum(1).mean(), rtol=2e-2)


def test_trainer_fused_path_runs():
    from freud_tpu.train.trainer import SAETrainer

    trainer = SAETrainer(
        "l1", {"n_dict_components": 16, "recon_alpha": 10.0}, 8,
        optimizer="adam", scheduler="linear",
        scheduler_params={"num_warmup_steps": 2}, lr=1e-3, steps=10,
        fused=True,
    )
    rng = np.random.default_rng(0)
    basis = rng.standard_normal((3, 8)).astype(np.float32)
    recons = []
    for _ in range(30):
        codes = rng.standard_normal((8, 12, 3)).astype(np.float32)
        m = trainer.train_step(codes @ basis)
        recons.append(float(m["loss_recon"]))
    assert np.isfinite(recons).all()
    assert np.mean(recons[-5:]) < np.mean(recons[:5])
