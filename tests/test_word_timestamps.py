"""Word-timestamp alignment: DTW machinery + runtime surface (random weights)."""

import numpy as np

from freud_tpu.models.whisper import timing


def test_dtw_identity_diagonal():
    """A strongly diagonal similarity matrix must align token i ~ frame i."""
    n = 8
    sim = np.full((n, n), -1.0)
    np.fill_diagonal(sim, 1.0)
    text_idx, time_idx = timing.dtw(-sim)
    # monotonic full-coverage path hitting every diagonal cell
    assert text_idx[0] == 0 and time_idx[0] == 0
    assert text_idx[-1] == n - 1 and time_idx[-1] == n - 1
    diag = {(i, j) for i, j in zip(text_idx, time_idx)}
    assert all((i, i) in diag for i in range(n))


def test_median_filter_matches_naive_reflect():
    """Independent oracle with whisper's REFLECT padding (timing.py uses
    F.pad(mode='reflect'), NOT edge replication — the prefix of [a,b,c,…]
    at width 5 is [c,b], so boundary medians differ whenever a != c)."""
    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, 20))
    got = timing.median_filter(x, 5)
    pad = np.concatenate(
        [x[:, 2:0:-1], x, x[:, -2:-4:-1]], axis=1)  # reflect: [c,b] | x | …
    want = np.stack(
        [np.median(pad[:, j:j + 5], axis=1) for j in range(20)], axis=1
    )
    np.testing.assert_allclose(got, want)
    # boundary value is NOT the edge-replication result when a != c
    edge_pad = np.concatenate([x[:, :1]] * 2 + [x] + [x[:, -1:]] * 2, axis=1)
    edge0 = np.median(edge_pad[:, 0:5], axis=1)
    assert not np.allclose(got[:, 0], edge0)

    # short sequences pass through unchanged (whisper's edge case)
    short = rng.standard_normal((2, 2))
    np.testing.assert_array_equal(timing.median_filter(short, 7), short)


def test_token_times_monotonic_synthetic():
    """Synthetic attention marching left→right over frames must produce
    non-decreasing, in-range times."""
    rng = np.random.default_rng(1)
    heads, toks, frames = 4, 10, 100
    w = np.zeros((heads, toks, frames))
    centers = np.linspace(5, 90, toks).astype(int)
    for t, c in enumerate(centers):
        w[:, t, c - 3:c + 3] = 1.0
    w += rng.random(w.shape) * 0.01
    w /= w.sum(-1, keepdims=True)
    starts, ends = timing.token_times(w, list(range(toks)))
    assert (np.diff(starts) >= 0).all()
    assert (ends >= starts).all()
    assert starts.min() >= 0 and ends.max() <= frames / timing.TOKENS_PER_SECOND


def test_runtime_word_timestamps_structural():
    from freud_tpu.models.whisper.runtime import WhisperRuntime

    rt = WhisperRuntime("test:tiny", max_new_tokens=8, language="en")
    mels = np.random.default_rng(2).standard_normal((2, 80, 3000)).astype(np.float32)
    texts, words = rt.transcribe_with_word_timestamps(mels)
    assert len(texts) == len(words) == 2
    for ws in words:
        for wd in ws:
            assert set(wd) == {"word", "start", "end", "probability"}
            assert 0.0 <= wd["probability"] <= 1.0
            assert 0.0 <= wd["start"] <= wd["end"] <= 30.0
        starts = [wd["start"] for wd in ws]
        assert starts == sorted(starts)

    # trimming to real frames keeps times within the shorter window
    texts2, words2 = rt.transcribe_with_word_timestamps(
        mels, num_frames=np.array([750, 750]))
    for ws in words2:
        for wd in ws:
            assert wd["end"] <= 15.0 + 1e-6


def test_load_alignment_heads_table(tmp_path, monkeypatch):
    """Curated-mask shim: an alignment_heads.json in the asset dir overrides
    the upper-half fallback — both the pair-list form and whisper's
    base85-gzip boolean dump form; absent/unknown models fall back."""
    import base64
    import gzip
    import json

    n_layers, n_heads = 4, 6
    pairs = [[1, 2], [3, 0]]
    mask = np.zeros((n_layers, n_heads), bool)
    mask[2, 1] = mask[3, 5] = True
    dump = base64.b85encode(gzip.compress(mask.tobytes())).decode()
    (tmp_path / "alignment_heads.json").write_text(json.dumps({
        "tiny": pairs,
        "base": dump,
    }))
    monkeypatch.setenv("FREUD_WHISPER_DIR", str(tmp_path))

    # pair-list entry (with the synthetic-model prefix stripped for lookup)
    assert timing.load_alignment_heads("test:tiny", n_layers, n_heads) == [
        (1, 2), (3, 0)]
    # whisper-format dump entry
    assert timing.load_alignment_heads("base", n_layers, n_heads) == [
        (2, 1), (3, 5)]
    # unknown model: upper-half fallback
    assert timing.load_alignment_heads("large-v3", n_layers, n_heads) == \
        timing.default_alignment_heads(n_layers, n_heads)

    # and the runtime path consumes the curated pairs end-to-end
    from freud_tpu.models.whisper.runtime import WhisperRuntime

    rt = WhisperRuntime("test:tiny", max_new_tokens=6, language="en")
    # test:tiny has 2 decoder layers / 6 heads; point the table at it
    (tmp_path / "alignment_heads.json").write_text(json.dumps({
        "tiny": [[1, 0], [1, 3]],
    }))
    mels = np.random.default_rng(3).standard_normal(
        (1, 80, 3000)).astype(np.float32)
    texts, words = rt.transcribe_with_word_timestamps(mels)
    assert len(texts) == 1
    for wd in words[0]:
        assert set(wd) == {"word", "start", "end", "probability"}
        assert 0.0 <= wd["probability"] <= 1.0


def test_merge_punctuations():
    """whisper timing.py merge_punctuations: lone prepending marks fuse onto
    the following word, lone appending marks onto the previous; the absorber
    keeps its own times/probability and emptied entries drop."""
    from freud_tpu.models.whisper.timing import merge_punctuations

    words = [
        {"word": " \"", "start": 0.0, "end": 0.1, "probability": 0.5},
        {"word": " hello", "start": 0.1, "end": 0.5, "probability": 0.9},
        {"word": ",", "start": 0.5, "end": 0.6, "probability": 0.4},
        {"word": " world", "start": 0.6, "end": 1.0, "probability": 0.8},
        {"word": ".", "start": 1.0, "end": 1.1, "probability": 0.3},
    ]
    out = merge_punctuations(words)
    assert [w["word"] for w in out] == [' " hello,', " world."]
    # absorbers keep their own timing and probability
    assert out[0]["start"] == 0.1 and out[0]["end"] == 0.5
    assert out[0]["probability"] == 0.9
    assert out[1]["end"] == 1.0 and out[1]["probability"] == 0.8

    # words that are not lone punctuation pass through untouched
    plain = [{"word": " a", "start": 0.0, "end": 0.1, "probability": 1.0},
             {"word": " b", "start": 0.1, "end": 0.2, "probability": 1.0}]
    assert merge_punctuations([dict(w) for w in plain]) == plain
