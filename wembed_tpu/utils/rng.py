"""Seed management.

The reference uses one global mt19937 (reference src/utilLib/src/Rand.cpp:8-21,
``Rand::setSeed``).  The TPU framework uses keyed ``jax.random`` on device and
a numpy Generator on host; ``set_seed`` reseeds both.  Cross-implementation
seed-for-seed equality with the reference is out of scope (SURVEY.md §7) —
parity is established by injecting identical initial coordinates/weights.
"""

from __future__ import annotations

import numpy as np

_host_rng = np.random.default_rng()
_seed: int | None = None


def set_seed(seed: int) -> None:
    """Reseed host RNG; device keys derive from this via ``new_key``."""
    global _host_rng, _seed
    _seed = int(seed)
    _host_rng = np.random.default_rng(seed)


def host_rng() -> np.random.Generator:
    return _host_rng


def new_key():
    """A fresh jax PRNG key derived from the global seed stream."""
    import jax

    return jax.random.key(int(_host_rng.integers(0, 2**63 - 1)))
