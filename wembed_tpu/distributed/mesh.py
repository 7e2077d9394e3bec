"""Device-mesh construction.

The reference has no distributed backend at all (SURVEY.md §2.13 — OpenMP
shared memory only); scale-out here is graph partitioning over a JAX device
mesh: work (edge ranges, candidate blocks, dense row ranges) is sharded
across devices and force partials are reduced with a single ``psum`` per
step over ICI.
"""

from __future__ import annotations

import os

import jax
from jax.sharding import Mesh


DATA_AXIS = "data"

_initialized = False


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Multi-host entry point: call ``jax.distributed.initialize`` so that
    ``jax.devices()`` (and every mesh built from it) spans all hosts of
    the slice.  Safe to call multiple times (no-op after the first).

    Configuration, in priority order:
      1. explicit arguments,
      2. ``WEMBED_COORDINATOR`` / ``WEMBED_NUM_PROCESSES`` /
         ``WEMBED_PROCESS_ID`` environment variables,
      3. JAX auto-detection (TPU pods provide all three natively).

    Returns True if a multi-process runtime was initialized.  The
    reference has no distributed backend at all (SURVEY.md §2.13); this
    plus the sharded backends is the framework's scale-out story —
    vertex/edge/work-tile partitions ride ICI within a host and DCN
    across hosts through the same ``jax.sharding`` collectives."""
    global _initialized
    if _initialized:
        return True
    coordinator_address = coordinator_address or os.environ.get(
        "WEMBED_COORDINATOR"
    )
    if num_processes is None and os.environ.get("WEMBED_NUM_PROCESSES"):
        num_processes = int(os.environ["WEMBED_NUM_PROCESSES"])
    if process_id is None and os.environ.get("WEMBED_PROCESS_ID"):
        process_id = int(os.environ["WEMBED_PROCESS_ID"])
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _initialized = True
    return True


def make_mesh(num_devices: int | None = None, axis_name: str = DATA_AXIS) -> Mesh:
    """1-D mesh over the first ``num_devices`` devices (default: all).

    After ``init_distributed`` the device list is GLOBAL (all hosts);
    meshes spanning it shard state across hosts, and XLA routes the
    step's collectives over ICI within a host and DCN across hosts."""
    devices = jax.devices()
    if num_devices is not None:
        if num_devices > len(devices):
            raise ValueError(
                f"requested {num_devices} devices, only {len(devices)} available"
            )
        devices = devices[:num_devices]
    import numpy as np

    return Mesh(np.asarray(devices), (axis_name,))
