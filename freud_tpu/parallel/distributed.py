"""Multi-host initialization for TPU pods/slices.

The reference has no distributed backend at all (SURVEY.md §5.8). The
TPU-native equivalent is trivial by design: call ``initialize()`` once per
host process before any mesh construction; JAX wires the hosts into one
global device list (ICI within a slice, DCN across slices), and every
``freud_tpu.parallel.mesh`` helper then spans the full pod. Collectives stay
XLA-inserted — there is no custom comm layer to configure.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize jax.distributed (no-op on single-process runs).

    On Cloud TPU the arguments auto-detect from the metadata server; set them
    explicitly (or via JAX_COORDINATOR_ADDRESS etc.) elsewhere.
    """
    # already-initialized check WITHOUT touching the XLA backend:
    # jax.process_count() would initialize it, after which
    # jax.distributed.initialize() unconditionally raises — and the swallow
    # below would leave every host silently un-distributed. The private-API
    # probe is fully guarded so a jax upgrade degrades to the try/except.
    state = getattr(getattr(getattr(jax, "_src", None), "distributed", None),
                    "global_state", None)
    if state is not None and getattr(state, "client", None) is not None:
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (ValueError, RuntimeError) as e:
        # a host that was TOLD it is part of a pod must never proceed alone
        pod_signals = (
            coordinator_address,
            os.environ.get("JAX_COORDINATOR_ADDRESS"),
            os.environ.get("COORDINATOR_ADDRESS"),
        )
        if num_processes not in (None, 1) or any(pod_signals):
            raise
        # single-process environments (tests, one chip) proceed
        # un-distributed — but say so, a silent swallow here once masked a
        # whole pod running N independent trainings
        print(f"jax.distributed not initialized (single-process): {e}")


def process_info() -> dict:
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }
