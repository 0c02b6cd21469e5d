"""K/V-resident attention kernel vs the einsum reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from freud_tpu.ops.attention import whisper_attention

INTERPRET = jax.default_backend() == "cpu"


def _einsum_attention(q, k, v):
    dh = q.shape[-1]
    scale = dh ** -0.25
    logits = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k * scale)
    w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", w, v)


@pytest.mark.parametrize("s", [512, 700, 1500])
def test_kernel_matches_einsum(s):
    rng = np.random.default_rng(0)
    q, k, v = (
        jnp.asarray(rng.standard_normal((2, 3, s, 64)).astype(np.float32) * 0.5)
        for _ in range(3)
    )
    got = np.asarray(whisper_attention(q, k, v, interpret=INTERPRET))
    want = np.asarray(_einsum_attention(q, k, v))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_padding_parity_at_non_multiple_length():
    """A length that forces internal padding (700 → 1024) must still match
    einsum exactly — the additive pad bias keeps the zero-filled tail out of
    the softmax. (The pad region is created inside the kernel from jnp.pad,
    so garbage values can't be injected from outside; this pins the masked
    result, not an adversarial fill.)"""
    rng = np.random.default_rng(1)
    s = 700  # pads to 1024 internally
    q = jnp.asarray(rng.standard_normal((1, 1, s, 64)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((1, 1, s, 64)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((1, 1, s, 64)).astype(np.float32))
    out1 = np.asarray(whisper_attention(q, k, v, interpret=INTERPRET))
    want = np.asarray(_einsum_attention(q, k, v))
    np.testing.assert_allclose(out1, want, atol=2e-5, rtol=1e-4)


def test_kernel_partitions_without_gather():
    """Data-sharded q/k/v through the kernel must partition (one kernel per
    device), not all-gather around the custom call."""
    import jax
    import jax.numpy as jnp
    import pytest
    from jax.sharding import NamedSharding, PartitionSpec as P

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    from freud_tpu.parallel.mesh import make_mesh
    from freud_tpu.ops.attention import whisper_attention

    mesh = make_mesh()
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.standard_normal((8, 2, 64, 16)).astype(np.float32))
               for _ in range(3))
    shard = NamedSharding(mesh, P("data"))
    qs, ks, vs = (jax.device_put(t, shard) for t in (q, k, v))

    fn = jax.jit(lambda a, b, c: whisper_attention(a, b, c, interpret=True,
                                                   block_q=64))
    out_sharded = fn(qs, ks, vs)
    out_plain = whisper_attention(q, k, v, interpret=True, block_q=64)
    np.testing.assert_allclose(np.asarray(out_sharded), np.asarray(out_plain),
                               rtol=1e-5, atol=1e-5)
    txt = fn.lower(qs, ks, vs).compile().as_text().lower()
    assert "all-gather" not in txt


def test_fused_qkv_attention_matches_reference_math():
    import jax
    import jax.numpy as jnp
    from freud_tpu.ops.attention import fused_qkv_attention

    rng = np.random.default_rng(3)
    b, s, d, h = 2, 40, 32, 4
    dh = d // h
    x = jnp.asarray(rng.standard_normal((b, s, d)).astype(np.float32) * 0.5)
    wq, wk, wv = (jnp.asarray(rng.standard_normal((d, d)).astype(np.float32) * 0.2)
                  for _ in range(3))
    bq, bv = (jnp.asarray(rng.standard_normal((d,)).astype(np.float32) * 0.1)
              for _ in range(2))

    got = np.asarray(fused_qkv_attention(x, wq, bq, wk, wv, bv, h,
                                         interpret=True), np.float32)

    q = np.asarray(x) @ np.asarray(wq) + np.asarray(bq)
    k = np.asarray(x) @ np.asarray(wk)
    v = np.asarray(x) @ np.asarray(wv) + np.asarray(bv)
    qh = q.reshape(b, s, h, dh).transpose(0, 2, 1, 3) * dh ** -0.5
    kh = k.reshape(b, s, h, dh).transpose(0, 2, 1, 3)
    vh = v.reshape(b, s, h, dh).transpose(0, 2, 1, 3)
    sc = np.einsum("bhsd,bhtd->bhst", qh, kh)
    sc = sc - sc.max(-1, keepdims=True)
    p = np.exp(sc)
    ref = np.einsum("bhst,bhtd->bhsd", p / p.sum(-1, keepdims=True), vh)
    ref = ref.transpose(0, 2, 1, 3).reshape(b, s, d)

    # kernel matmuls run bf16 (f32 accumulate): ~0.4% relative tolerance
    denom = np.abs(ref).max()
    assert np.max(np.abs(got - ref)) / denom < 2e-2


def test_attention_impl_gates_wide_models_off_fused():
    """The fused qkv kernel's VMEM working set grows with d²; at d=1280
    (large-v3) the compiler needs ~150 MB vs the 128 MB arena — wide models
    must take the K/V-resident blocked kernel (regression: large-v3
    collection failed to compile when 'auto' chose fused for every d)."""
    import jax.numpy as jnp
    from freud_tpu.models.whisper import model as m

    orig = m.jax.default_backend
    m.jax.default_backend = lambda: "tpu"
    try:
        assert m._attention_impl(384) == "fused"   # tiny
        assert m._attention_impl(768) == "fused"   # small
        assert m._attention_impl(1024) == "kernel"  # medium
        assert m._attention_impl(1280) == "kernel"  # large
    finally:
        m.jax.default_backend = orig


def test_fused_qkv_attention_partitions_without_gather():
    import jax
    import jax.numpy as jnp
    import pytest
    from jax.sharding import NamedSharding, PartitionSpec as P

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    from freud_tpu.parallel.mesh import make_mesh
    from freud_tpu.ops.attention import fused_qkv_attention

    mesh = make_mesh()
    rng = np.random.default_rng(4)
    b, s, d, h = 8, 24, 16, 2
    x = jnp.asarray(rng.standard_normal((b, s, d)).astype(np.float32))
    wq, wk, wv = (jnp.asarray(rng.standard_normal((d, d)).astype(np.float32) * 0.2)
                  for _ in range(3))
    bq, bv = (jnp.asarray(np.zeros(d, np.float32)) for _ in range(2))
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))

    fn = jax.jit(lambda a: fused_qkv_attention(a, wq, bq, wk, wv, bv, h,
                                               interpret=True))
    out_s = fn(xs)
    out_p = fused_qkv_attention(x, wq, bq, wk, wv, bv, h, interpret=True)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_p),
                               rtol=1e-5, atol=1e-5)
    txt = fn.lower(xs).compile().as_text().lower()
    assert "all-gather" not in txt
