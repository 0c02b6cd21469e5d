from .config import MODEL_DIMS, WhisperDims, dims_for
from .load import load_model
from .model import decoder_forward, encoder_forward, init_params
from .runtime import WhisperRuntime, init_runtime
from .tokenizer import decode_text, special_tokens, tokenizer_available

__all__ = [
    "MODEL_DIMS",
    "WhisperDims",
    "dims_for",
    "load_model",
    "encoder_forward",
    "decoder_forward",
    "init_params",
    "WhisperRuntime",
    "init_runtime",
    "decode_text",
    "special_tokens",
    "tokenizer_available",
]
