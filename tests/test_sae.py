"""SAE math tests against independently derived numpy goldens."""

import numpy as np
import pytest

from freud_tpu.models.sae import (
    L1AutoEncoderConfig,
    TopKAutoEncoderConfig,
    init_l1,
    init_topk,
    l1,
    sae_from_checkpoint,
    state_dict_from_params,
    topk,
)
from freud_tpu.models.sae.config import config_for_variant, get_n_dict_components


def test_n_dict_rule():
    assert get_n_dict_components(384, 32, 0) == 384 * 32
    assert get_n_dict_components(384, 32, 200) == 200


def test_config_from_dict_drops_unknown_keys():
    cfg = config_for_variant(
        "topk", {"expansion_factor": 16, "k": 32, "dead_feature_threshold": 1e6}
    )
    assert cfg.expansion_factor == 16 and cfg.k == 32
    assert not hasattr(cfg, "dead_feature_threshold")
    with pytest.raises(ValueError):
        config_for_variant("bogus", {})


# ---------------------------------------------------------------------- L1


def test_l1_shapes_and_unit_norm():
    cfg = L1AutoEncoderConfig(n_dict_components=50)
    params = init_l1(16, cfg, seed=0)
    assert params.W.shape == (16, 50)
    normed = l1.normalize_columns(params)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(normed.W), axis=0), np.ones(50), atol=1e-6
    )


def test_l1_forward_golden():
    rng = np.random.default_rng(0)
    d, n_dict = 8, 12
    cfg = L1AutoEncoderConfig(n_dict_components=n_dict, recon_alpha=3.0)
    W = rng.standard_normal((d, n_dict)).astype(np.float32)
    b = rng.standard_normal(n_dict).astype(np.float32) * 0.1
    params = l1.L1Params(W=W, encoder_bias=b)
    x = rng.standard_normal((2, 5, d)).astype(np.float32)

    out = l1.forward(params, x, cfg)

    Wn = W / np.linalg.norm(W, axis=0, keepdims=True)
    c = np.maximum(x @ Wn + b, 0.0)
    x_hat = c @ Wn.T
    np.testing.assert_allclose(np.asarray(out.sae_out), x_hat, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.encoded.latent), c, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        float(out.l1_loss), np.abs(c).sum(-1).mean(), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(out.reconstruction_loss), 3.0 * ((x_hat - x) ** 2).mean(), rtol=1e-5
    )


def test_l1_masked_mse_ignores_minus_one():
    pred = np.array([[1.0, 2.0, 3.0]], np.float32)
    target = np.array([[1.5, -1.0, 3.0]], np.float32)
    got = float(l1.masked_mse(pred, target))
    assert abs(got - (0.25 + 0.0) / 2) < 1e-6


# -------------------------------------------------------------------- TopK


def _topk_golden_decode(top_acts, top_idx, W_dec, b_dec):
    out = np.zeros((*top_acts.shape[:-1], W_dec.shape[1]), np.float32)
    it = np.ndindex(*top_acts.shape[:-1])
    for pos in it:
        for j in range(top_acts.shape[-1]):
            out[pos] += top_acts[pos + (j,)] * W_dec[top_idx[pos + (j,)]]
    return out + b_dec


def test_topk_encode_decode_golden():
    rng = np.random.default_rng(1)
    d, n_dict, k = 8, 24, 4
    cfg = TopKAutoEncoderConfig(n_dict_components=n_dict, k=k)
    params = topk.TopKParams(
        encoder_weight=rng.standard_normal((n_dict, d)).astype(np.float32),
        encoder_bias=rng.standard_normal(n_dict).astype(np.float32) * 0.1,
        W_dec=rng.standard_normal((n_dict, d)).astype(np.float32),
        b_dec=rng.standard_normal(d).astype(np.float32) * 0.1,
    )
    x = rng.standard_normal((2, 3, d)).astype(np.float32)

    pre = np.maximum((x - np.asarray(params.b_dec)) @ np.asarray(params.encoder_weight).T
                     + np.asarray(params.encoder_bias), 0.0)
    enc = topk.encode(params, x, cfg)
    got_pre = np.asarray(topk.pre_acts(params, x))
    np.testing.assert_allclose(got_pre, pre, rtol=1e-5, atol=1e-5)

    # top-k selects the k largest pre-activations
    acts, idx = np.asarray(enc.top_acts), np.asarray(enc.top_indices)
    for pos in np.ndindex(2, 3):
        expect = np.sort(pre[pos])[-k:]
        np.testing.assert_allclose(np.sort(acts[pos]), expect, rtol=1e-5, atol=1e-6)

    dec = np.asarray(topk.decode(params, enc.top_acts, enc.top_indices))
    golden = _topk_golden_decode(acts, idx, np.asarray(params.W_dec), np.asarray(params.b_dec))
    np.testing.assert_allclose(dec, golden, rtol=1e-4, atol=1e-5)


def test_topk_fvu_and_auxk_golden():
    rng = np.random.default_rng(2)
    d, n_dict, k = 6, 20, 3
    cfg = TopKAutoEncoderConfig(n_dict_components=n_dict, k=k, auxk_alpha=0.5)
    params = init_topk(d, cfg, seed=0)
    x = rng.standard_normal((4, 2, d)).astype(np.float32)

    # dead mask with 2 dead latents (< k_aux = 3)
    dead = np.zeros(n_dict, bool)
    dead[[5, 11]] = True
    out = topk.forward(params, x, cfg, dead_mask=dead)

    pre = np.asarray(topk.pre_acts(params, x))
    enc = topk.encode(params, x, cfg)
    sae_out = np.asarray(topk.decode(params, enc.top_acts, enc.top_indices))
    e = sae_out - x
    tv = ((x - x.mean(0)) ** 2).sum()
    np.testing.assert_allclose(float(out.fvu), (e ** 2).sum() / tv, rtol=1e-4)

    # golden AuxK: only dead latents available; both dead latents selected
    k_aux = d // 2
    scale = min(dead.sum() / k_aux, 1.0)
    masked = np.where(dead, pre, -np.inf)
    e_hat = np.zeros_like(e) + np.asarray(params.b_dec)
    for pos in np.ndindex(4, 2):
        order = np.argsort(masked[pos])[::-1][:k_aux]
        for j in order:
            if np.isfinite(masked[pos][j]):
                e_hat[pos] += masked[pos][j] * np.asarray(params.W_dec)[j]
    golden_auxk = 0.5 * scale * ((e_hat - e) ** 2).sum() / tv
    np.testing.assert_allclose(float(out.auxk_loss), golden_auxk, rtol=1e-4)


def test_topk_auxk_zero_when_no_dead():
    cfg = TopKAutoEncoderConfig(n_dict_components=16, k=2, auxk_alpha=1.0)
    params = init_topk(4, cfg)
    x = np.random.default_rng(0).standard_normal((3, 2, 4)).astype(np.float32)
    out = topk.forward(params, x, cfg, dead_mask=np.zeros(16, bool))
    assert float(out.auxk_loss) == 0.0


def test_topk_multi_topk():
    cfg = TopKAutoEncoderConfig(n_dict_components=32, k=2, multi_topk=True)
    params = init_topk(8, cfg)
    x = np.random.default_rng(3).standard_normal((2, 2, 8)).astype(np.float32)
    out = topk.forward(params, x, cfg)
    enc8 = topk.select_topk(topk.pre_acts(params, x), 8)
    dec8 = np.asarray(topk.decode(params, enc8.top_acts, enc8.top_indices))
    tv = ((x - x.mean(0)) ** 2).sum()
    np.testing.assert_allclose(
        float(out.multi_topk_fvu), ((dec8 - x) ** 2).sum() / tv, rtol=1e-4
    )
    # output keeps the k-sparse encoding
    assert out.encoded.top_acts.shape[-1] == 2


def test_fired_counter_update():
    counter = np.full(10, 100, np.int64)
    idx = np.array([[1, 3], [3, 7]], np.int32)
    updated = np.asarray(topk.update_fired_counters(counter, idx, 50))
    assert list(updated[[1, 3, 7]]) == [0, 0, 0]
    assert list(updated[[0, 2]]) == [150, 150]


def test_dense_latent_scatter():
    acts = np.array([[[2.0, 1.0]]], np.float32)
    idx = np.array([[[4, 0]]], np.int32)
    dense = np.asarray(topk.dense_latent(acts, idx, 6))
    assert dense.shape == (1, 1, 6)
    assert dense[0, 0, 4] == 2.0 and dense[0, 0, 0] == 1.0 and dense.sum() == 3.0


# --------------------------------------------------------------- serialize


@pytest.mark.parametrize("variant", ["l1", "topk"])
def test_checkpoint_roundtrip(tmp_path, variant):
    import torch

    if variant == "l1":
        cfg = L1AutoEncoderConfig(n_dict_components=20, recon_alpha=2.0)
        params = init_l1(8, cfg, seed=1)
    else:
        cfg = TopKAutoEncoderConfig(expansion_factor=4, k=3)
        params = init_topk(8, cfg, seed=1)

    sd = state_dict_from_params(variant, params)
    path = tmp_path / "ck.pth"
    torch.save(
        {
            "model": sd,
            "hparams": {
                "autoencoder_variant": variant,
                "autoencoder_config": cfg.to_dict(),
                "activation_size": 8,
            },
            "step": 7,
            "best_val_loss": 0.5,
        },
        path,
    )
    v2, cfg2, act_size, params2 = sae_from_checkpoint(str(path))
    assert v2 == variant and act_size == 8
    for a, b in zip(params, params2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # state-dict keys match the reference torch module layout
    keys = set(sd.keys())
    if variant == "l1":
        assert keys == {"decoder.weight", "encoder_bias"}
    else:
        assert keys == {"encoder.weight", "encoder.bias", "W_dec", "b_dec"}
