"""Threshold-kernel and training_losses parity vs exact top-k formulation."""

import jax
import jax.numpy as jnp
import numpy as np

from freud_tpu.models.sae import TopKAutoEncoderConfig, init_topk, topk
from freud_tpu.ops.topk_threshold import topk_thresholds

INTERPRET = jax.default_backend() == "cpu"


def test_thresholds_match_exact_topk():
    rng = np.random.default_rng(0)
    acts = jnp.asarray(np.abs(rng.standard_normal((300, 256))).astype(np.float32))
    dead = np.zeros(256, bool)
    dead[rng.choice(256, 40, replace=False)] = True
    t_main, t_aux = topk_thresholds(acts, jnp.asarray(dead), 8, 16,
                                    interpret=INTERPRET)
    # main: exactly 8 selected per row (continuous values, no ties)
    counts = np.asarray((np.asarray(acts) >= np.asarray(t_main)).sum(axis=1))
    np.testing.assert_array_equal(counts, 8)
    # aux: min(16, n_dead=40) = 16 dead latents selected
    masked = np.where(dead, np.asarray(acts), -np.inf)
    counts_aux = (masked >= np.asarray(t_aux)).sum(axis=1)
    np.testing.assert_array_equal(counts_aux, 16)
    # the selected sets equal exact top-k sets
    exact_vals, _ = jax.lax.top_k(acts, 8)
    np.testing.assert_allclose(
        np.asarray(t_main)[:, 0], np.asarray(exact_vals)[:, -1], rtol=1e-5
    )


def test_thresholds_few_dead():
    acts = jnp.asarray(np.abs(np.random.default_rng(1).standard_normal((16, 64))
                              ).astype(np.float32))
    dead = np.zeros(64, bool)
    dead[[3, 9]] = True  # fewer dead than k_aux
    _, t_aux = topk_thresholds(acts, jnp.asarray(dead), 4, 10, interpret=INTERPRET)
    masked = np.where(dead, np.asarray(acts), -np.inf)
    counts = (masked >= np.asarray(t_aux)).sum(axis=1)
    np.testing.assert_array_equal(counts, 2)  # all dead selected
    # no dead at all → +inf threshold → nothing selected
    _, t_none = topk_thresholds(acts, jnp.zeros(64, bool), 4, 10,
                                interpret=INTERPRET)
    assert np.isinf(np.asarray(t_none)).all()


def test_training_losses_match_forward():
    rng = np.random.default_rng(2)
    cfg = TopKAutoEncoderConfig(expansion_factor=4, k=5, auxk_alpha=0.25)
    params = init_topk(16, cfg, seed=0)
    x = jnp.asarray(rng.standard_normal((3, 8, 16)).astype(np.float32))
    dead = np.zeros(64, bool)
    dead[[1, 7, 20, 33]] = True

    out = topk.forward(params, x, cfg, dead_mask=jnp.asarray(dead))
    terms, fired = topk.training_losses(params, x, cfg, jnp.asarray(dead))
    np.testing.assert_allclose(float(terms["fvu"]), float(out.fvu), rtol=1e-5)
    np.testing.assert_allclose(
        float(terms["auxk_loss"]), float(out.auxk_loss), rtol=1e-4, atol=1e-7
    )
    # fired agrees with the exact top-k index set
    idx = np.unique(np.asarray(out.encoded.top_indices).reshape(-1))
    fired_np = np.asarray(fired)
    assert set(np.nonzero(fired_np)[0]) == set(idx.tolist())


def test_training_losses_gradients_match():
    rng = np.random.default_rng(3)
    cfg = TopKAutoEncoderConfig(expansion_factor=2, k=3, auxk_alpha=0.5)
    params = init_topk(8, cfg, seed=1)
    x = jnp.asarray(rng.standard_normal((4, 6, 8)).astype(np.float32))
    dead = jnp.zeros(16, bool).at[2].set(True)

    def loss_exact(p):
        out = topk.forward(p, x, cfg, dead_mask=dead)
        return out.fvu + out.auxk_loss + out.multi_topk_fvu / 8

    def loss_fast(p):
        terms, _ = topk.training_losses(p, x, cfg, dead)
        return terms["fvu"] + terms["auxk_loss"] + terms["multi_topk_fvu"] / 8

    g1 = jax.grad(loss_exact)(params)
    g2 = jax.grad(loss_fast)(params)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_training_losses_input_gradient_matches():
    """∂L/∂x through the hand-written VJP must match autodiff of the exact
    forward (direct e/r terms + encode path + the total-variance
    denominator) — regression: the custom backward used to return zeros."""
    rng = np.random.default_rng(5)
    cfg = TopKAutoEncoderConfig(expansion_factor=2, k=3, auxk_alpha=0.5)
    params = init_topk(8, cfg, seed=1)
    x = jnp.asarray(rng.standard_normal((4, 6, 8)).astype(np.float32))
    dead = jnp.zeros(16, bool).at[2].set(True)

    def loss_exact(xx):
        out = topk.forward(params, xx, cfg, dead_mask=dead)
        return out.fvu + out.auxk_loss

    def loss_fast(xx):
        terms, _ = topk.training_losses(params, xx, cfg, dead)
        return terms["fvu"] + terms["auxk_loss"]

    g1 = jax.grad(loss_exact)(x)
    g2 = jax.grad(loss_fast)(x)
    assert np.abs(np.asarray(g2)).max() > 0  # not the old silent zeros
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-6)


def test_thresholds_partition_without_gather():
    """Data-sharded rows must partition the threshold kernel (no all-gather);
    fired is the one all-reduced output."""
    import pytest
    from jax.sharding import NamedSharding, PartitionSpec as P

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    from freud_tpu.parallel.mesh import make_mesh
    from freud_tpu.ops.topk_threshold import topk_thresholds_fired

    rng = np.random.default_rng(7)
    acts = jnp.asarray(rng.standard_normal((8 * 16, 32)).astype(np.float32))
    dead = jnp.zeros(32, bool).at[3].set(True).at[9].set(True)
    mesh = make_mesh()
    ash = jax.device_put(acts, NamedSharding(mesh, P("data", None)))

    fn = jax.jit(lambda a: topk_thresholds_fired(a, dead, 4, 2,
                                                 interpret=True,
                                                 k_multi=8))
    tm_s, ta_s, tmu_s, f_s = fn(ash)
    tm_p, ta_p, tmu_p, f_p = topk_thresholds_fired(acts, dead, 4, 2,
                                                    interpret=True, k_multi=8)
    np.testing.assert_allclose(np.asarray(tm_s), np.asarray(tm_p), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ta_s), np.asarray(ta_p), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(tmu_s), np.asarray(tmu_p), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(f_s), np.asarray(f_p))
    txt = fn.lower(ash).compile().as_text().lower()
    assert "all-gather" not in txt


def test_silent_frames_do_not_fire_everything():
    """A row with fewer than k positive activations converges to threshold 0;
    post-ReLU every latent is >= 0, so without the acts > 0 qualifier one
    silent frame would mark the ENTIRE dictionary as fired and permanently
    disable AuxK dead-latent revival."""
    from freud_tpu.ops.topk_threshold import topk_thresholds_fired
    import jax

    interp = jax.default_backend() == "cpu"
    rng = np.random.default_rng(9)
    acts = np.abs(rng.standard_normal((8, 32)).astype(np.float32))
    acts[3] = 0.0  # silent frame
    dead = np.zeros(32, bool)
    _, _, _, fired = topk_thresholds_fired(
        jnp.asarray(acts), jnp.asarray(dead), 4, 2, interpret=interp)
    fired = np.asarray(fired)
    assert fired.sum() < 32  # the zero row must not fire every latent
    # latents that genuinely crossed a positive threshold still fire
    assert fired.sum() >= 4

    # same property through the fused bf16 kernel
    from freud_tpu.models.sae import TopKAutoEncoderConfig, init_topk
    from freud_tpu.ops.topk_fused import topk_sae_forward

    cfg = TopKAutoEncoderConfig(expansion_factor=2, k=4, auxk_alpha=0.1)
    params = init_topk(16, cfg, seed=0)
    x = rng.standard_normal((12, 16)).astype(np.float32)
    x[5] = 0.0  # zero input → acts = relu(0 @ W + 0) = all zeros
    _, _, _, _, _, fired_k = topk_sae_forward(
        jnp.asarray(x), params.encoder_weight.T, params.encoder_bias,
        params.b_dec, params.W_dec, jnp.zeros(32, jnp.float32), cfg.k, 8,
        interpret=interp)
    assert np.asarray(fired_k).sum() < 32

    # and through the XLA forward (forward_with_fired)
    from freud_tpu.models.sae import topk as topk_mod

    _, fired_f = topk_mod.forward_with_fired(
        params, jnp.asarray(x[None]), cfg)
    assert np.asarray(fired_f).sum() < 32


def test_training_losses_multi_topk_single_pass():
    """multi_topk's 4k threshold now rides the SAME kernel pass; the XLA
    training branch must still match the exact forward's multi_topk_fvu."""
    cfg = TopKAutoEncoderConfig(expansion_factor=2, k=2, auxk_alpha=0.5,
                                multi_topk=True)
    params = init_topk(8, cfg, seed=2)
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((3, 4, 8)).astype(np.float32))
    dead = jnp.zeros(16, bool).at[5].set(True)

    terms, fired = topk.training_losses(params, x, cfg, dead)
    out = topk.forward(params, x, cfg, dead_mask=dead)
    np.testing.assert_allclose(float(terms["multi_topk_fvu"]),
                               float(out.multi_topk_fvu), rtol=1e-4)
    np.testing.assert_allclose(float(terms["fvu"]), float(out.fvu), rtol=1e-4)
    assert np.asarray(fired).shape == (16,)


def test_bf16_integer_fast_path_matches_f32_selection():
    """bf16 inputs take the exact SWAR integer bisection; its thresholds are
    exact bf16 k-th values and must produce the SAME selection sets as the
    f32 counting path on the same (bf16-valued) data."""
    import jax

    from freud_tpu.ops.topk_threshold import topk_thresholds_fired

    interpret = jax.default_backend() == "cpu"
    rng = np.random.default_rng(11)
    acts_b = jnp.asarray(
        np.abs(rng.standard_normal((64, 256))).astype(np.float32)
    ).astype(jnp.bfloat16)
    dead = np.zeros(256, bool)
    dead[rng.choice(256, 80, replace=False)] = True
    dead = jnp.asarray(dead)

    tm_i, ta_i, t4_i, f_i = topk_thresholds_fired(
        acts_b, dead, 7, 13, interpret=interpret, k_multi=28)
    tm_f, ta_f, t4_f, f_f = topk_thresholds_fired(
        acts_b.astype(jnp.float32), dead, 7, 13, interpret=interpret,
        k_multi=28)

    af = np.asarray(acts_b, np.float32)
    d = np.asarray(dead)
    np.testing.assert_array_equal(af >= np.asarray(tm_i),
                                  af >= np.asarray(tm_f))
    np.testing.assert_array_equal((af >= np.asarray(ta_i)) & d,
                                  (af >= np.asarray(ta_f)) & d)
    np.testing.assert_array_equal(af >= np.asarray(t4_i),
                                  af >= np.asarray(t4_f))
    np.testing.assert_array_equal(np.asarray(f_i), np.asarray(f_f))
    # the integer path's thresholds are ATTAINED bf16 values
    assert np.isin(np.asarray(tm_i).ravel(), af).all()

    # no dead latents: aux threshold is the +inf sentinel on both paths
    none_dead = jnp.zeros((256,), bool)
    _, ta0, _, _ = topk_thresholds_fired(
        acts_b, none_dead, 7, 13, interpret=interpret)
    assert np.isposinf(np.asarray(ta0)).all()
