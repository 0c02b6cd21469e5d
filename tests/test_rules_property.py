"""Property-based invariants of whisper's logit rules (_apply_rules).

tests/test_decoding_rules.py pins the rules through full decodes; these
properties hit `_apply_rules` directly with randomized logits and decoder
states, asserting the invariants whisper's SuppressTokens / SuppressBlank /
ApplyTimestampRules guarantee for ANY state — sharper than what reachable
decode trajectories alone can cover (e.g. arbitrary max_ts / prev-token
combinations).
"""

import numpy as np
from hypothesis import assume, given, settings, strategies as st_

from freud_tpu.models.whisper.decoding import _apply_rules, _suppress_tables
from freud_tpu.models.whisper.config import dims_for
from freud_tpu.models.whisper.tokenizer import special_tokens

DIMS = dims_for("test:tiny")
ST = special_tokens(DIMS.n_vocab)
SUPPRESS, SUPPRESS_BLANK = _suppress_tables(DIMS)
SUP_NP = np.asarray(SUPPRESS)
TS0 = ST.timestamp_begin
V = DIMS.n_vocab


def _apply(logits, token, prev, max_ts, at_first, at_second):
    out = _apply_rules(
        logits, np.asarray([token]), np.asarray([prev]),
        np.asarray([max_ts]), at_first, ST, SUPPRESS, SUPPRESS_BLANK,
        at_second=at_second,
    )
    return np.asarray(out)[0]


@settings(max_examples=25, deadline=None, derandomize=True)
@given(
    seed=st_.integers(0, 2**31 - 1),
    token=st_.integers(0, V - 1),
    prev=st_.integers(0, V - 1),
    max_ts=st_.integers(0, V - 1),
    at_first=st_.booleans(),
)
def test_rule_invariants(seed, token, prev, max_ts, at_first):
    # restrict to REACHABLE decoder states: before the first sampled token
    # no timestamp can have been recorded (at_first ⇒ max_ts < ts0). In the
    # unreachable combination whisper's own rules also silence everything
    # (initial cap ts0+50 vs min_allowed > ts0+50), so the always-samplable
    # invariant only holds on the reachable space.
    assume(not (at_first and max_ts >= TS0))
    rng = np.random.default_rng(seed)
    logits = rng.standard_normal((1, V)).astype(np.float32) * 3
    # at_second=True exactly when NOT at_first mirrors step 2; also exercise
    # the generic (False, False) later-step case via at_first=False draws
    at_second = not at_first and bool(seed % 2)
    out = _apply(logits, token, prev, max_ts, at_first, at_second)

    # 1. the suppression list is always silenced
    assert np.all(np.isneginf(out[SUP_NP == -np.inf]))

    # 2. at the first sampled position only timestamps within the
    #    max_initial cap survive
    if at_first:
        finite = np.flatnonzero(np.isfinite(out))
        assert len(finite) > 0
        assert finite.min() >= TS0 and finite.max() <= TS0 + 50

    ids = np.arange(V)
    is_ts = ids >= TS0
    last_was_ts = token >= TS0
    penult_was_ts = (prev >= TS0) or at_second

    # 3. paired-timestamp rule: <ts><ts> → no third timestamp;
    #    lone <ts> → no text (EOT stays allowed)
    if not at_first and last_was_ts and penult_was_ts:
        assert np.all(np.isneginf(out[is_ts]))
    if not at_first and last_was_ts and not penult_was_ts:
        text = (~is_ts) & (ids != ST.eot)
        assert np.all(np.isneginf(out[text]))

    # 4. monotonic timestamps: once max_ts is a timestamp, earlier
    #    timestamps never survive (strictly earlier-or-equal when the
    #    segment closed)
    if max_ts >= TS0:
        open_seg = last_was_ts and not penult_was_ts
        lo = max_ts if open_seg else max_ts + 1
        blocked = is_ts & (ids < lo)
        if not at_first:
            assert np.all(np.isneginf(out[blocked]))

    # 5. something always remains samplable
    assert np.isfinite(out).any()


@settings(max_examples=10, deadline=None, derandomize=True)
@given(seed=st_.integers(0, 2**31 - 1))
def test_timestamp_mass_forcing(seed):
    """When total timestamp probability outweighs the best text token,
    every text token is silenced (whisper's sum-vs-max forcing rule)."""
    rng = np.random.default_rng(seed)
    logits = rng.standard_normal((1, V)).astype(np.float32)
    logits[0, TS0:] += 8.0  # make timestamp mass dominate
    out = _apply(logits, TS0 + 3, 100, 0, False, False)
    ids = np.arange(V)
    text = (ids < TS0) & (ids != ST.eot)
    assert np.all(np.isneginf(out[text]))
