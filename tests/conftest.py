"""Test harness: force an 8-device virtual CPU mesh before JAX initializes.

This is the TPU-native answer to multi-node testing without a pod —
``--xla_force_host_platform_device_count`` gives N XLA devices on one host so
pjit/shard_map paths compile and execute with real collectives.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# The sandbox image pre-imports jax (sitecustomize) with JAX_PLATFORMS=axon
# pointing at the tunneled TPU; override through the live config as well so
# tests always run on the virtual 8-device CPU mesh.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE = "/root/reference"


@pytest.fixture(scope="session")
def reference_mel_filters():
    path = os.path.join(REFERENCE, "src/assets/mel_filters.npz")
    if not os.path.exists(path):
        pytest.skip("reference mel filter asset unavailable")
    with np.load(path, allow_pickle=False) as f:
        return {k: f[k].copy() for k in f.files}


@pytest.fixture(scope="session")
def example_flac():
    # bundled fixture (freud_tpu/assets) so the suite runs outside this
    # sandbox; fall back to the reference copy if the package asset is gone
    bundled = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "freud_tpu", "assets", "example_audio.flac",
    )
    if os.path.exists(bundled):
        return bundled
    path = os.path.join(REFERENCE, "pretrained/example_audio/8280-266249-0065.flac")
    if not os.path.exists(path):
        pytest.skip("example audio unavailable")
    return path
