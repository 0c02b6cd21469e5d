"""Whisper special-token layout and (optional) text detokenization.

The reference relies on the ``openai-whisper`` package's tiktoken-based
tokenizer for transcript text (the ``.text`` field consumed by validation and
the GUI endpoints). Special-token ids are fixed by vocabulary size, so the id
arithmetic lives here with no external assets; BPE *text* decoding needs the
tiktoken rank files, which we load when present (``$FREUD_TOKENIZER_DIR`` /
package assets) and otherwise degrade to a ``<tok:...>`` rendering so every
pipeline still runs in a zero-download environment.
"""

from __future__ import annotations

import base64
import os
from dataclasses import dataclass
from functools import lru_cache
from pathlib import Path

# Language-token order of the multilingual vocab (public Whisper layout);
# index i ⇒ token id lang_base + i. large-v3 appends "yue".
LANGUAGES = (
    "en", "zh", "de", "es", "ru", "ko", "fr", "ja", "pt", "tr", "pl", "ca",
    "nl", "ar", "sv", "it", "id", "hi", "fi", "vi", "he", "uk", "el", "ms",
    "cs", "ro", "da", "hu", "ta", "no", "th", "ur", "hr", "bg", "lt", "la",
    "mi", "ml", "cy", "sk", "te", "fa", "lv", "bn", "sr", "az", "sl", "kn",
    "et", "mk", "br", "eu", "is", "hy", "ne", "mn", "bs", "kk", "sq", "sw",
    "gl", "mr", "pa", "si", "km", "sn", "yo", "so", "af", "oc", "ka", "be",
    "tg", "sd", "gu", "am", "yi", "lo", "uz", "fo", "ht", "ps", "tk", "nn",
    "mt", "sa", "lb", "my", "bo", "tl", "mg", "as", "tt", "haw", "ln", "ha",
    "ba", "jw", "su", "yue",
)
_N_LANGS_V2 = 99
_N_LANGS_V3 = 100


def language_index(code: str, n_vocab: int) -> int:
    st = special_tokens(n_vocab)
    try:
        idx = LANGUAGES.index(code)
    except ValueError:
        raise ValueError(f"Unknown language code {code!r}")
    if idx >= st.n_langs:
        raise ValueError(f"{code!r} not in this model's {st.n_langs}-language vocab")
    return idx


@dataclass(frozen=True)
class SpecialTokens:
    n_vocab: int
    eot: int
    sot: int
    lang_base: int  # first language token (<|en|>)
    n_langs: int
    translate: int
    transcribe: int
    sot_prev: int
    no_speech: int
    no_timestamps: int
    timestamp_begin: int

    @property
    def multilingual(self) -> bool:
        return self.n_vocab >= 51865

    def lang_token(self, lang_index: int = 0) -> int:
        return self.lang_base + lang_index

    def sot_sequence(self, lang_index: int = 0, task_translate: bool = False,
                     timestamps: bool = True) -> list[int]:
        """The decoder prompt: <|sot|> [<|lang|> <|task|>] [<|notimestamps|>].

        Matches the reference's default DecodingOptions
        (without_timestamps=False → timestamps on, hooked_model.py:103-110).
        """
        if not self.multilingual:
            seq = [self.sot]
        else:
            seq = [
                self.sot,
                self.lang_token(lang_index),
                self.translate if task_translate else self.transcribe,
            ]
        if not timestamps:
            seq.append(self.no_timestamps)
        return seq


@lru_cache(maxsize=None)
def special_tokens(n_vocab: int) -> SpecialTokens:
    if n_vocab == 51864:  # English-only models
        base, n_langs = 50256, _N_LANGS_V2
    elif n_vocab == 51865:  # multilingual v1/v2
        base, n_langs = 50257, _N_LANGS_V2
    elif n_vocab == 51866:  # large-v3 family
        base, n_langs = 50257, _N_LANGS_V3
    else:
        raise ValueError(f"Unknown whisper vocab size {n_vocab}")
    eot = base
    sot = base + 1
    lang_base = base + 2
    after_langs = lang_base + n_langs
    return SpecialTokens(
        n_vocab=n_vocab,
        eot=eot,
        sot=sot,
        lang_base=lang_base,
        n_langs=n_langs,
        translate=after_langs,
        transcribe=after_langs + 1,
        sot_prev=after_langs + 3,
        no_speech=after_langs + 4,
        no_timestamps=after_langs + 5,
        timestamp_begin=after_langs + 6,
    )


def _rank_file_candidates(multilingual: bool) -> list[Path]:
    name = "multilingual.tiktoken" if multilingual else "gpt2.tiktoken"
    dirs = []
    if os.environ.get("FREUD_TOKENIZER_DIR"):
        dirs.append(Path(os.environ["FREUD_TOKENIZER_DIR"]))
    dirs.append(Path(__file__).parent / "assets")
    dirs.append(Path("~/.cache/freud_tpu/tokenizers").expanduser())
    return [d / name for d in dirs]


@lru_cache(maxsize=4)
def _byte_decoder(multilingual: bool) -> dict[int, bytes] | None:
    """token id → bytes table from a tiktoken rank file, if available."""
    for path in _rank_file_candidates(multilingual):
        if path.exists():
            table: dict[int, bytes] = {}
            with open(path, "rb") as f:
                for line in f:
                    if not line.strip():
                        continue
                    tok_b64, rank = line.split()
                    table[int(rank)] = base64.b64decode(tok_b64)
            return table
    return None


def decode_text(tokens, n_vocab: int) -> str:
    """Render token ids as text (BPE assets permitting) below the special ids."""
    st = special_tokens(n_vocab)
    content = [int(t) for t in tokens if int(t) < st.eot]
    table = _byte_decoder(st.multilingual)
    if table is None:
        return "".join(f"<tok:{t}>" for t in content)
    data = b"".join(table.get(t, b"?") for t in content)
    return data.decode("utf-8", errors="replace")


def tokenizer_available(n_vocab: int) -> bool:
    return _byte_decoder(special_tokens(n_vocab).multilingual) is not None
