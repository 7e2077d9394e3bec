"""Device-resident graph arrays and the embedding state pytree.

The TPU-native data model (SURVEY.md §7 design stance): *graph = arrays,
step = pure jitted function over a state pytree*.  Replaces the reference's
Graph/VecList/EmbedderParameters object graph
(reference: src/embeddingLib/include/embedder/EmbedderParameters.hpp:12-39,
src/embeddingLib/include/dVec/VecList.hpp:8-91).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..graphs.csr import CSRGraph


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclass(frozen=True)
class DeviceGraph:
    """Static per-embedder device arrays describing the graph.

    Directed edges are padded to a multiple of 512 so edge-count changes
    between similarly-sized graphs reuse compiled code.  Padded entries
    point at vertex 0 with ``edge_mask`` False.
    """

    n: int
    num_edges: int  # undirected edge count (directed count = 2 * num_edges)
    max_degree: int  # static bound for neighbor-membership binary search
    edge_src: jax.Array  # (E_pad,) int32
    edge_dst: jax.Array  # (E_pad,) int32 — CSR col_idx (per-row sorted) + padding
    edge_mask: jax.Array  # (E_pad,) bool
    row_ptr: jax.Array  # (n+1,) int32 CSR offsets into edge_dst
    colors: jax.Array  # (n,) int32
    degrees: jax.Array  # (n,) int32

    @staticmethod
    def build(g: CSRGraph) -> "DeviceGraph":
        n = g.num_vertices
        src = g.edge_src
        dst = g.col_idx
        e = src.shape[0]
        e_pad = max(512, _round_up(e, 512))
        pad = e_pad - e
        # padding src = n-1 keeps the array src-sorted (CSR order), which
        # attraction's segment_sum asserts via indices_are_sorted; padded
        # rows are masked so they contribute exact zeros either way
        src_p = np.concatenate([src, np.full(pad, max(n - 1, 0), np.int32)])
        dst_p = np.concatenate([dst, np.zeros(pad, np.int32)])
        mask = np.concatenate([np.ones(e, bool), np.zeros(pad, bool)])
        degrees = g.degrees
        return DeviceGraph(
            n=n,
            num_edges=g.num_edges,
            max_degree=int(degrees.max(initial=0)),
            edge_src=jnp.asarray(src_p),
            edge_dst=jnp.asarray(dst_p),
            edge_mask=jnp.asarray(mask),
            row_ptr=jnp.asarray(g.row_ptr.astype(np.int32)),
            colors=jnp.asarray(g.colors),
            degrees=jnp.asarray(degrees),
        )


class EmbedState(NamedTuple):
    """Everything that changes across iterations — one checkpointable pytree.

    The reference splits this across EmbedderInterface members and
    AdamOptimizer internals (m, v, t); here it is a single functional value,
    which also makes checkpoint/resume exact (SURVEY.md §5.4: the reference
    loses optimizer state on resume; we do not).
    """

    positions: jax.Array  # (n, d)
    adam_m: jax.Array  # (n, d)
    adam_v: jax.Array  # (n, d)
    iteration: jax.Array  # int32 scalar — reference currentIteration / Adam t
    key: jax.Array  # PRNG key for coincident-point kicks & sampling
    attract_loss: jax.Array  # f32 scalar, loss from the most recent step
    repel_loss: jax.Array  # f32 scalar
    pos_change: jax.Array  # f32 scalar, mean squared displacement last step
    num_rep_forces: jax.Array  # int32 scalar, candidate pairs last step
    overflow: jax.Array  # int32 scalar, truncated candidates last step


def init_state(
    positions: np.ndarray | jax.Array, key: jax.Array, dtype=jnp.float32
) -> EmbedState:
    positions = jnp.asarray(positions, dtype=dtype)
    zeros = jnp.zeros_like(positions)
    f = jnp.float32
    return EmbedState(
        positions=positions,
        adam_m=zeros,
        adam_v=zeros,
        iteration=jnp.asarray(0, jnp.int32),
        key=key,
        attract_loss=jnp.asarray(0.0, f),
        repel_loss=jnp.asarray(0.0, f),
        pos_change=jnp.asarray(jnp.inf, f),
        num_rep_forces=jnp.asarray(0, jnp.int32),
        overflow=jnp.asarray(0, jnp.int32),
    )


def random_positions(n: int, dim: int, rng: np.random.Generator) -> np.ndarray:
    """Uniform init in a cube of side n^(1/dim) (reference
    EmbedderInterface.hpp:70-74)."""
    side = float(n) ** (1.0 / dim)
    return rng.uniform(0.0, side, size=(n, dim))
