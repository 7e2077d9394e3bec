"""Device-mesh construction.

The reference has no distributed backend at all (SURVEY.md §2.13 — OpenMP
shared memory only); scale-out here is graph partitioning over a JAX device
mesh: work (edge ranges, candidate blocks, dense row ranges) is sharded
across devices and force partials are reduced with a single ``psum`` per
step over ICI.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh


DATA_AXIS = "data"


def make_mesh(num_devices: int | None = None, axis_name: str = DATA_AXIS) -> Mesh:
    """1-D mesh over the first ``num_devices`` devices (default: all)."""
    devices = jax.devices()
    if num_devices is not None:
        if num_devices > len(devices):
            raise ValueError(
                f"requested {num_devices} devices, only {len(devices)} available"
            )
        devices = devices[:num_devices]
    import numpy as np

    return Mesh(np.asarray(devices), (axis_name,))
