"""Fused TopK forward kernel vs the separate-ops XLA formulation (bf16)."""

import jax
import jax.numpy as jnp
import numpy as np

from freud_tpu.models.sae import TopKAutoEncoderConfig, init_topk, topk

INTERPRET = jax.default_backend() == "cpu"


def _setup(seed=0, d_in=16, exp=8, M=40):
    rng = np.random.default_rng(seed)
    cfg = TopKAutoEncoderConfig(expansion_factor=exp, k=5, auxk_alpha=0.25)
    params = init_topk(d_in, cfg, seed=1)
    x = jnp.asarray(rng.standard_normal((4, M // 4, d_in)).astype(np.float32))
    n_dict = d_in * exp
    dead = np.zeros(n_dict, bool)
    dead[rng.choice(n_dict, n_dict // 3, replace=False)] = True
    return cfg, params, x, jnp.asarray(dead)


def test_kernel_fwd_matches_xla_branch():
    cfg, params, x, dead = _setup()
    from freud_tpu.ops.topk_fused import topk_sae_forward
    from freud_tpu.ops.topk_threshold import topk_thresholds_fired

    d_in = x.shape[-1]
    x2 = x.reshape(-1, d_in)
    acts_k, ym_k, ya_k, tm_k, ta_k, fired_k = topk_sae_forward(
        x2, params.encoder_weight.T, params.encoder_bias, params.b_dec,
        params.W_dec, dead.astype(jnp.float32), cfg.k, d_in // 2,
        interpret=INTERPRET,
    )

    # XLA formulation at the same (bf16) precision
    sae_in = (x2 - params.b_dec).astype(jnp.bfloat16)
    acts_x = jax.nn.relu(
        jax.lax.dot(sae_in, params.encoder_weight.T.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        + params.encoder_bias.astype(jnp.bfloat16)
    )
    np.testing.assert_array_equal(np.asarray(acts_k), np.asarray(acts_x))

    tm_x, ta_x, _, fired_x = topk_thresholds_fired(
        acts_x, dead, cfg.k, d_in // 2, interpret=INTERPRET)
    af = np.asarray(acts_x, np.float32)
    # identical SELECTION SETS (thresholds themselves may differ inside the
    # same inter-value gap: integer bisection returns the exact bf16 k-th
    # value, float bisection a point just below it)
    np.testing.assert_array_equal(
        af >= np.asarray(tm_k), af >= np.asarray(tm_x))
    keep_aux_k = (af >= np.asarray(ta_k)) & np.asarray(dead)
    keep_aux_x = (af >= np.asarray(ta_x)) & np.asarray(dead)
    np.testing.assert_array_equal(keep_aux_k, keep_aux_x)
    np.testing.assert_array_equal(np.asarray(fired_k), np.asarray(fired_x))

    # decodes agree
    dm = np.where(af >= np.asarray(tm_k), np.asarray(acts_x, np.float32), 0)
    ym_ref = dm.astype(np.float32) @ np.asarray(
        params.W_dec.astype(jnp.bfloat16), np.float32)
    np.testing.assert_allclose(np.asarray(ym_k), ym_ref, rtol=2e-2, atol=1e-4)


def test_kernel_exact_counts():
    """The integer bisection returns the EXACT k-th value: selection counts
    are ≥ k everywhere and exactly k wherever the k-th and (k+1)-th values
    are distinct (bf16 ties legitimately admit extras — the same semantics
    as the dense where-mask decode)."""
    cfg, params, x, dead = _setup(seed=3)
    from freud_tpu.ops.topk_fused import topk_sae_forward

    d_in = x.shape[-1]
    x2 = x.reshape(-1, d_in)
    acts, ym, ya, tm, ta, fired = topk_sae_forward(
        x2, params.encoder_weight.T, params.encoder_bias, params.b_dec,
        params.W_dec, dead.astype(jnp.float32), cfg.k, d_in // 2,
        interpret=INTERPRET,
    )
    af = np.asarray(acts, np.float32)
    counts = (af >= np.asarray(tm)).sum(axis=1)
    # bf16 rounding can tie values; counts must be ≥ k and == k wherever the
    # k-th and (k+1)-th values differ
    assert (counts >= cfg.k).all()
    srt = np.sort(af, axis=1)[:, ::-1]
    distinct = srt[:, cfg.k - 1] > srt[:, cfg.k]
    np.testing.assert_array_equal(counts[distinct], cfg.k)


def test_training_losses_kernel_path_matches_xla_path():
    cfg, params, x, dead = _setup(seed=4)

    terms_k, fired_k = topk.training_losses(
        params, x, cfg, dead, matmul_dtype=jnp.bfloat16)

    # force the XLA branch by name-mangling the dtype argument path
    from freud_tpu.models.sae.topk import _fused_losses_fwd
    (fvu_x, aux_x, fired_x), _ = _fused_losses_fwd(
        cfg.k, x.shape[-1] // 2, float(cfg.auxk_alpha), "float32", True,
        params, x, dead.astype(jnp.float32))

    # bf16 vs f32 matmuls: loose tolerance; the point is same structure
    assert np.isfinite(float(terms_k["fvu"]))
    np.testing.assert_allclose(float(terms_k["fvu"]), float(fvu_x),
                               rtol=0.05, atol=1e-3)
    np.testing.assert_allclose(float(terms_k["auxk_loss"]), float(aux_x),
                               rtol=0.08, atol=1e-3)


def test_grads_kernel_path_match_numpy_backward():
    """Grads through the kernel path vs an independent numpy
    reimplementation of the hand-derived backward, driven by the kernel's
    own forward outputs. (bf16 selection can legitimately differ from f32
    top-k on boundary rows, so autodiff-of-f32-forward is NOT the oracle —
    the oracle is the backward math at the kernel's actual selection.)"""
    cfg, params, x, dead = _setup(seed=5, M=24)
    d_in = x.shape[-1]
    k_aux = d_in // 2

    def loss_fast(p):
        terms, _ = topk.training_losses(p, x, cfg, dead,
                                        matmul_dtype=jnp.bfloat16)
        return terms["fvu"] + terms["auxk_loss"]

    g = jax.grad(loss_fast)(params)

    from freud_tpu.ops.topk_fused import topk_sae_forward

    x2 = np.asarray(x.reshape(-1, d_in), np.float32)
    acts, ym, ya, tm, ta, fired = topk_sae_forward(
        jnp.asarray(x2), params.encoder_weight.T, params.encoder_bias,
        params.b_dec, params.W_dec, dead.astype(jnp.float32), cfg.k, k_aux,
        interpret=INTERPRET,
    )
    af = np.asarray(acts, np.float32)
    b_dec = np.asarray(params.b_dec)
    e = np.asarray(ym) + b_dec - x2
    r = np.asarray(ya) - np.asarray(ym) + x2
    x3 = np.asarray(x)
    tv = ((x3 - x3.mean(axis=0)) ** 2).sum()
    scale = min(np.asarray(dead).sum() / k_aux, 1.0)
    c1 = 2.0 / tv
    c2 = 2.0 * float(cfg.auxk_alpha) * scale / tv
    g_main = c1 * e - c2 * r
    g_aux = c2 * r
    keep_m = af >= np.asarray(tm)
    keep_a = (af >= np.asarray(ta)) & np.asarray(dead)
    dm = np.where(keep_m, af, 0)
    da = np.where(keep_a, af, 0)
    W_dec = np.asarray(params.W_dec)
    dW_dec = dm.T @ g_main + da.T @ g_aux
    d_acts = np.where(keep_m & (af > 0), g_main @ W_dec.T, 0) + np.where(
        keep_a & (af > 0), g_aux @ W_dec.T, 0)
    dW_enc = d_acts.T @ (x2 - b_dec)
    db_enc = d_acts.sum(axis=0)
    db_dec = c1 * e.sum(axis=0) - db_enc @ np.asarray(params.encoder_weight)

    for got, want in [(g.W_dec, dW_dec), (g.encoder_weight, dW_enc),
                      (g.encoder_bias, db_enc), (g.b_dec, db_dec)]:
        got = np.asarray(got)
        denom = max(np.abs(want).max(), 1e-8)
        assert np.max(np.abs(got - want)) / denom < 0.03, (
            np.max(np.abs(got - want)) / denom)


def test_kernel_partitions_without_gather():
    """A data-sharded row dim must partition the custom call (one kernel per
    device, no all-gather); the ``fired`` cross-row reduction is the only
    collective (an all-reduce OR outside the call)."""
    import pytest
    from jax.sharding import NamedSharding, PartitionSpec as P

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    from freud_tpu.parallel.mesh import make_mesh
    from freud_tpu.ops.topk_fused import topk_sae_forward

    cfg, params, x, dead = _setup(seed=6, M=8 * 16)
    d_in = x.shape[-1]
    x2 = x.reshape(-1, d_in)
    mesh = make_mesh()
    xs = jax.device_put(x2, NamedSharding(mesh, P("data", None)))

    fn = jax.jit(lambda a: topk_sae_forward(
        a, params.encoder_weight.T, params.encoder_bias, params.b_dec,
        params.W_dec, dead.astype(jnp.float32), cfg.k, d_in // 2,
        interpret=INTERPRET,
    ))
    out_s = fn(xs)
    out_p = topk_sae_forward(
        x2, params.encoder_weight.T, params.encoder_bias, params.b_dec,
        params.W_dec, dead.astype(jnp.float32), cfg.k, d_in // 2,
        interpret=INTERPRET,
    )
    for got, want in zip(out_s, out_p):
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(want, np.float32),
                                   rtol=1e-5, atol=1e-6)
    txt = fn.lower(xs).compile().as_text().lower()
    assert "all-gather" not in txt


def test_kernel_threshold_edge_cases():
    """Adversarial inputs for the SWAR bisection: duplicated (tied) values,
    all-zero rows (fewer than k positives), no dead latents, fewer dead than
    k_aux."""
    from freud_tpu.ops.topk_fused import topk_sae_forward
    from freud_tpu.models.sae import TopKAutoEncoderConfig, init_topk

    d_in, exp = 16, 8
    n_dict = d_in * exp
    cfg = TopKAutoEncoderConfig(expansion_factor=exp, k=5, auxk_alpha=0.25)
    params = init_topk(d_in, cfg, seed=2)

    rng = np.random.default_rng(7)
    x = rng.standard_normal((40, d_in)).astype(np.float32)
    x[3] = 0.0           # all-zero row: acts = relu(b) with b=0 → all zeros
    x[7] = x[6]          # duplicate row → ties across rows (harmless)

    for dead_idx in ([], [5], list(range(0, n_dict, 2))):
        dead = np.zeros(n_dict, bool)
        dead[dead_idx] = True
        acts, ym, ya, tm, ta, fired = topk_sae_forward(
            jnp.asarray(x), params.encoder_weight.T, params.encoder_bias,
            params.b_dec, params.W_dec, jnp.asarray(dead, jnp.float32),
            cfg.k, d_in // 2, interpret=INTERPRET,
        )
        af = np.asarray(acts, np.float32)
        tm_np, ta_np = np.asarray(tm), np.asarray(ta)

        # main threshold == exact k-th largest value per row (ties may admit
        # extra, but the THRESHOLD is the k-th value exactly)
        kth = np.sort(af, axis=1)[:, ::-1][:, cfg.k - 1:cfg.k]
        np.testing.assert_array_equal(tm_np, kth)
        assert ((af >= tm_np).sum(axis=1) >= cfg.k).all()

        if not dead_idx:
            assert np.isinf(ta_np).all()  # nothing selectable
            assert ((af >= ta_np) & dead).sum() == 0
        else:
            masked = np.where(dead, af, -np.inf)
            n_sel = min(d_in // 2, len(dead_idx))
            kth_aux = np.sort(masked, axis=1)[:, ::-1][:, n_sel - 1:n_sel]
            np.testing.assert_array_equal(ta_np, kth_aux)

        # decode of the all-zero row reconstructs from zero code
        np.testing.assert_allclose(np.asarray(ym)[3], 0.0, atol=1e-5)


def test_two_stage_bisection_matches_single_stage():
    """The (default-off) byte-packed two-stage bisection must stay
    bit-identical to the single-stage path — CI coverage so the shared SWAR
    helpers can't drift under it (it's re-evaluated on new hardware via
    tools/bench_topk10.py)."""
    from freud_tpu.ops import topk_fused

    cfg, params, x, dead = _setup(seed=7, d_in=16, exp=8, M=48)
    d_in = x.shape[-1]
    x2 = x.reshape(-1, d_in)
    args = (x2, params.encoder_weight.T, params.encoder_bias, params.b_dec,
            params.W_dec, dead.astype(jnp.float32), cfg.k, d_in // 2)

    def run():
        topk_fused._partitioned_forward.cache_clear()
        topk_fused.topk_sae_forward.clear_cache()
        return topk_fused.topk_sae_forward(*args, interpret=INTERPRET)

    prev = topk_fused._TWO_STAGE
    try:
        topk_fused._TWO_STAGE = False
        _, _, _, tm1, ta1, f1 = run()
        topk_fused._TWO_STAGE = True
        _, _, _, tm2, ta2, f2 = run()
    finally:
        topk_fused._TWO_STAGE = prev
        topk_fused._partitioned_forward.cache_clear()
        topk_fused.topk_sae_forward.clear_cache()

    np.testing.assert_array_equal(np.asarray(tm1), np.asarray(tm2))
    np.testing.assert_array_equal(np.asarray(ta1), np.asarray(ta2))
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))

    # no-dead sentinel: both paths return +inf aux thresholds
    none = jnp.zeros_like(dead.astype(jnp.float32))
    try:
        topk_fused._TWO_STAGE = True
        topk_fused._partitioned_forward.cache_clear()
        topk_fused.topk_sae_forward.clear_cache()
        _, _, _, _, ta_n, _ = topk_fused.topk_sae_forward(
            x2, params.encoder_weight.T, params.encoder_bias, params.b_dec,
            params.W_dec, none, cfg.k, d_in // 2, interpret=INTERPRET)
    finally:
        topk_fused._TWO_STAGE = prev
        topk_fused._partitioned_forward.cache_clear()
        topk_fused.topk_sae_forward.clear_cache()
    assert np.isposinf(np.asarray(ta_n)).all()


def test_width_gate_path_matches_kernel_path(monkeypatch):
    """The large-recipe VMEM width gate routes training_losses to the
    threshold-kernel formulation; forcing the gate on small shapes must give
    the same losses, fired mask, and gradients as the fused-kernel path
    (both selections are exact, so only matmul rounding can differ)."""
    import jax

    cfg, params, x, dead = _setup(seed=9, M=32)

    def run():
        def loss(p):
            terms, fired = topk.training_losses(
                p, x, cfg, dead, matmul_dtype=jnp.bfloat16)
            return terms["fvu"] + terms["auxk_loss"], fired

        (l, fired), g = jax.value_and_grad(loss, has_aux=True)(params)
        return l, fired, g

    l_k, fired_k, g_k = run()
    monkeypatch.setattr(topk, "KERNEL_RESIDENT_BUDGET", 0)
    l_x, fired_x, g_x = run()

    np.testing.assert_allclose(float(l_k), float(l_x), rtol=2e-2, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(fired_k), np.asarray(fired_x))
    for a, b in zip(g_k, g_x):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-2, atol=5e-3)
