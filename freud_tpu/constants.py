"""Audio geometry constants for Whisper-family models.

Behavioral parity with the reference framework's constant table
(reference: src/utils/constants.py:1-23): identical sample rate, FFT size,
hop length, chunk length and derived frame counts, so that activation
timestamps, mel shapes and file formats are interchangeable.
"""

SAMPLE_RATE = 16_000
N_FFT = 400
HOP_LENGTH = 160
CHUNK_LENGTH = 30
N_SAMPLES = CHUNK_LENGTH * SAMPLE_RATE  # 480_000 samples per 30-second window
N_FRAMES = N_SAMPLES // HOP_LENGTH  # 3000 mel frames per window

N_SAMPLES_PER_TOKEN = HOP_LENGTH * 2  # encoder stride-2 conv halves the frame rate
FRAMES_PER_SECOND = SAMPLE_RATE // HOP_LENGTH  # 100 mel frames / second
TOKENS_PER_SECOND = SAMPLE_RATE // N_SAMPLES_PER_TOKEN  # 50 encoder frames / second
N_ENCODER_FRAMES = N_FRAMES // 2  # 1500 encoder positions per window
TIMESTEP_S = CHUNK_LENGTH / N_ENCODER_FRAMES  # 0.02 s per encoder frame

AUDIO_FILE_EXTENSIONS = (".wav", ".flac", ".mp3", ".m4a", ".ogg")


def exact_div(x: int, y: int) -> int:
    assert x % y == 0
    return x // y


def get_n_mels(whisper_model_name: str) -> int:
    """Mel-band count by model family: 128 for v3 models, else 80.

    Mirrors the reference's model-name heuristic (src/utils/constants.py:20-23).
    """
    if "v3" in whisper_model_name:
        return 128
    return 80


def is_audio_file(file: str) -> bool:
    # case-insensitive: portable recorders produce CLIP.WAV / song.MP3, and
    # the decode layer already matches extensions case-insensitively
    return any(file.lower().endswith(ext) for ext in AUDIO_FILE_EXTENSIONS)
