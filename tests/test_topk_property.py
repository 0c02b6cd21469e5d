"""Property-based exactness of the SWAR integer bisection (hypothesis).

The packed-guard bit tricks in ops/topk_fused/_int_bisect_packed are the most
intricate code in the repo; beyond the fixed-seed unit tests, this drives the
bf16 threshold path with adversarial value patterns (ties, zeros, denormal-
adjacent values, all-equal rows) and checks the defining property of the
exact k-th threshold directly against the float ordering:

    t is an ATTAINED value,  count(a >= t) >= k,  count(a > t) < k.
"""

import numpy as np
from hypothesis import given, settings, strategies as st

import jax
import jax.numpy as jnp

from freud_tpu.ops.topk_threshold import topk_thresholds_fired

INTERPRET = jax.default_backend() == "cpu"
ROWS, N = 6, 40
K_MAIN, K_AUX = 4, 7

# bf16-representable non-negative values with heavy tie/zero mass
_value = st.one_of(
    st.just(0.0),
    st.sampled_from([0.5, 0.5, 1.0, 1.5, 2.0, 1e-3, 3e4]),
    st.floats(min_value=0.0, max_value=100.0, allow_nan=False, width=32),
)


@settings(max_examples=30, deadline=None, derandomize=True)
@given(
    data=st.lists(_value, min_size=ROWS * N, max_size=ROWS * N),
    dead_seed=st.integers(0, 2**31 - 1),
)
def test_bf16_threshold_is_exact_kth(data, dead_seed):
    a = (np.asarray(data, np.float32)
         .astype(jnp.bfloat16)  # the values under selection ARE bf16
         .reshape(ROWS, N))
    af = np.asarray(a, np.float32)
    rng = np.random.default_rng(dead_seed)
    dead = rng.random(N) < 0.4

    tm, ta, _, fired = topk_thresholds_fired(
        jnp.asarray(a), jnp.asarray(dead), K_MAIN, K_AUX,
        interpret=INTERPRET)
    tm = np.asarray(tm)[:, 0]
    ta = np.asarray(ta)[:, 0]

    for r in range(ROWS):
        # main: exact k-th largest value semantics
        assert tm[r] in af[r]
        assert (af[r] >= tm[r]).sum() >= K_MAIN
        assert (af[r] > tm[r]).sum() < K_MAIN

        # aux over the dead subset
        dv = af[r][dead]
        if dead.sum() >= K_AUX:
            assert ta[r] in dv
            assert (dv >= ta[r]).sum() >= K_AUX
            assert (dv > ta[r]).sum() < K_AUX
        elif dead.sum() > 0:
            # fewer dead than k_aux: select ALL dead (threshold ≤ their min)
            assert ta[r] <= dv.min()
        else:
            assert np.isposinf(ta[r])

    # fired: latent selected anywhere with a strictly positive value
    want_fired = ((af >= tm[:, None]) & (af > 0)).any(axis=0)
    np.testing.assert_array_equal(np.asarray(fired), want_fired)
