"""freud_tpu — TPU-native audio-interpretability framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of ksadov/FREUD
(see SURVEY.md): Whisper activation capture, SAE training (L1 / TopK+AuxK),
a high-throughput collection pipeline, on-device activation search, feature
manipulation, and the GUI-compatible HTTP API + file formats.
"""

import os

# Persistent compilation cache: CLI entry points are separate processes; the
# cache makes repeated invocations skip XLA recompiles (TPU and CPU).
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.expanduser("~/.cache/freud_tpu/jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_ENABLE_XLA_CACHES", "all")

# Some sandboxes pre-import jax and pin a platform before user code runs,
# which silently overrides the standard JAX_PLATFORMS env contract. Re-assert
# the user's env choice through the live config.
if os.environ.get("JAX_PLATFORMS"):
    import jax as _jax

    try:
        _jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    except Exception:
        pass

__version__ = "0.1.0"
