"""Whisper model geometry.

Dims follow the published Whisper architecture family (the reference consumes
the stock ``openai-whisper`` package; model names in configs/features/*.json
select these sizes — e.g. "tiny", "large-v3"). d_model per family matches
SURVEY.md §2 (tiny=384, large=1280); v3 models use 128 mel bands.
"""

from dataclasses import dataclass, replace


@dataclass(frozen=True)
class WhisperDims:
    n_mels: int
    n_audio_ctx: int
    n_audio_state: int
    n_audio_head: int
    n_audio_layer: int
    n_vocab: int
    n_text_ctx: int
    n_text_state: int
    n_text_head: int
    n_text_layer: int

    @property
    def head_dim(self) -> int:
        return self.n_audio_state // self.n_audio_head


def _dims(width: int, heads: int, layers: int, n_mels: int = 80,
          n_vocab: int = 51865, text_layers: int | None = None) -> WhisperDims:
    return WhisperDims(
        n_mels=n_mels,
        n_audio_ctx=1500,
        n_audio_state=width,
        n_audio_head=heads,
        n_audio_layer=layers,
        n_vocab=n_vocab,
        n_text_ctx=448,
        n_text_state=width,
        n_text_head=heads,
        n_text_layer=layers if text_layers is None else text_layers,
    )


MODEL_DIMS: dict[str, WhisperDims] = {
    "tiny": _dims(384, 6, 4),
    "tiny.en": _dims(384, 6, 4, n_vocab=51864),
    "base": _dims(512, 8, 6),
    "base.en": _dims(512, 8, 6, n_vocab=51864),
    "small": _dims(768, 12, 12),
    "small.en": _dims(768, 12, 12, n_vocab=51864),
    "medium": _dims(1024, 16, 24),
    "medium.en": _dims(1024, 16, 24, n_vocab=51864),
    "large": _dims(1280, 20, 32),
    "large-v1": _dims(1280, 20, 32),
    "large-v2": _dims(1280, 20, 32),
    "large-v3": _dims(1280, 20, 32, n_mels=128, n_vocab=51866),
    "large-v3-turbo": _dims(1280, 20, 32, n_mels=128, n_vocab=51866, text_layers=4),
    "turbo": _dims(1280, 20, 32, n_mels=128, n_vocab=51866, text_layers=4),
}


def dims_for(model_name: str) -> WhisperDims:
    """Dims for a model name; ``random:`` / ``test:`` prefixes are stripped.

    ``test:NAME`` additionally shrinks the layer stack to 2 encoder / 2
    decoder layers so CPU test runs stay fast while keeping real geometry.
    """
    name = model_name.split(":", 1)[-1]
    base = MODEL_DIMS[name]
    if model_name.startswith("test:"):
        return replace(base, n_audio_layer=2, n_text_layer=2)
    return base
