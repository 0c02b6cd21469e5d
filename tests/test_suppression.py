"""Decoder suppression parity: the non-speech list derived from a tiktoken
rank table must match whisper's published rule (whisper/tokenizer.py
non_speech_tokens + decoding.py _get_suppress_tokens/SuppressBlank; the
reference reaches it via DecodingOptions defaults, hooked_model.py:103-110).
"""

import base64

import numpy as np
import pytest

from freud_tpu.models.whisper import tokenizer as tok


@pytest.fixture()
def synthetic_ranks(tmp_path, monkeypatch):
    """A tiny tiktoken table: all 256 single bytes (rank = byte value) plus
    hand-picked merges, written in multilingual.tiktoken format."""
    merges = [
        b" -",          # 256
        b" '",          # 257
        b"((",          # 258
        b"<<",          # 259
        b"\xe2\x99",    # 260 — first two bytes of U+2640..267F misc symbols
        b"\xe2\x99\xaa",  # 261 — ♪
        b" (",          # 262
        b"  ",          # 263 (double space, irrelevant)
    ]
    lines = []
    for b in range(256):
        lines.append(base64.b64encode(bytes([b])) + b" " + str(b).encode())
    for i, m in enumerate(merges):
        lines.append(base64.b64encode(m) + b" " + str(256 + i).encode())
    (tmp_path / "multilingual.tiktoken").write_bytes(b"\n".join(lines))
    monkeypatch.setenv("FREUD_TOKENIZER_DIR", str(tmp_path))
    tok.clear_asset_caches()
    yield
    tok.clear_asset_caches()


def test_non_speech_ids_match_published_rule(synthetic_ranks):
    got = set(tok.non_speech_token_ids(51865))

    # hand-derived expectation for this table:
    # single-char ASCII symbols encode to their byte id both bare and with a
    # leading space (" X" has no merge except " -", " '", " (") → bare ids in;
    expected = set('"#()*+/:;<=>@[\\]^_`{|}~')
    expected = {ord(c) for c in expected}
    # " -" / " '" first tokens are the merged ids 256, 257
    expected |= {256, 257}
    # " (" merges to 262 (encode(" (")... "(" alone is byte id 40 (in via
    # bare form); the rule adds encode(" "+sym)[0] only when single-token:
    # " (" IS single-token here → 262 joins
    expected |= {262}
    # multi-char sequences: "((" merges → 258; "<<" → 259; their
    # space-prefixed forms are 2 tokens → only bare merged ids join.
    expected |= {258, 259}
    # "((( " → [258, 40] len 2 → out; ">>" has no merge → out; "--" no merge
    # → out; "-(" no merge → out. BUT single chars of those pairs are already
    # in via the ASCII list.
    # CJK brackets 「」『』 are 3-byte sequences with no merges → multi-token,
    # not in misc → out.
    # misc symbols ♩♪♫♬♭♮♯: first token added even when multi-token.
    # ♪ = e2 99 aa → [261] single via merge → 261; others e2 99 xx →
    # [260, xx] → first token 260.
    expected |= {260, 261}
    # "♪♪" = [261, 261] → first 261 (already in); "♪♪♪" same.
    # For misc symbols the rule adds encode(" "+sym)[0] even when multi-token
    # (whisper tokenizer.py: "In case they're multiple tokens, suppress the
    # first token"); with this table " ♩" = [32, 260, ...] → adds the bare
    # space 32. (The real vocab fuses the space, so 32 ≙ "Ġ♪"-style ids.)
    expected |= {32}

    assert got == expected


def test_suppress_set_includes_specials(synthetic_ranks):
    st = tok.special_tokens(51865)
    ids = set(tok.suppress_token_ids(51865))
    for t in (st.transcribe, st.translate, st.sot, st.sot_prev,
              st.sot_prev - 1, st.no_speech):
        assert t in ids
    assert st.eot not in ids  # EOT is never in the per-step suppress set
    assert set(tok.non_speech_token_ids(51865)) <= ids


def test_blank_token(synthetic_ranks):
    assert tok.blank_token_id(51865) == 32  # " " single byte in this table


def test_degrades_without_assets(monkeypatch, tmp_path):
    monkeypatch.setenv("FREUD_TOKENIZER_DIR", str(tmp_path / "empty"))
    tok.clear_asset_caches()
    try:
        assert tok.non_speech_token_ids(51865) is None
        assert tok.blank_token_id(51865) is None
        st = tok.special_tokens(51865)
        ids = set(tok.suppress_token_ids(51865))
        assert st.no_speech in ids and st.sot in ids
    finally:
        tok.clear_asset_caches()


def test_encode_text_roundtrip(synthetic_ranks):
    ids = tok.encode_text(" hi -there", 51865)
    assert ids is not None
    # decodes back to the same text
    assert tok.decode_text(np.asarray(ids), 51865) == " hi -there"
    # the " -" merge from the table is used
    assert 256 in ids


def test_encode_text_none_without_assets(monkeypatch, tmp_path):
    monkeypatch.setenv("FREUD_TOKENIZER_DIR", str(tmp_path / "empty"))
    tok.clear_asset_caches()
    try:
        assert tok.encode_text("hello", 51865) is None
    finally:
        tok.clear_asset_caches()
