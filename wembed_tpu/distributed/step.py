"""Multi-chip embedding step via shard_map.

Parallelization scheme (the graph-partitioning analogue of data
parallelism, SURVEY.md §5.8): the embedding state (positions, weights,
optimizer moments) is replicated on every device; per step each device
computes force PARTIALS on its share of the work —

  * attraction: a contiguous range of the directed edge array
  * bucketed repulsion: a contiguous range of the sorted query blocks,
    plus slices of the correction edge groups and heavy dense rows
  * dense repulsion: a contiguous range of vertex rows

— and one ``psum`` over the mesh reduces forces/losses/counters.  The Adam
update, gravity recentering, and convergence metric then run identically
(replicated) on every device, so state never diverges.

Replicated state costs O(n) memory per device but scales compute by 1/P
and needs exactly one all-reduce of (n, d) floats per step over ICI.  A
vertex-sharded variant (halo exchange of boundary positions) is the
planned follow-up for memory-bound graph sizes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..core import candidates as cand_mod
from ..core import step as step_mod
from ..core.options import EmbedderOptions, RepulsionMode
from ..core.state import DeviceGraph, EmbedState
from ..graphs.csr import CSRGraph
from .mesh import DATA_AXIS


def build_multichip_step(
    graph: CSRGraph,
    opts: EmbedderOptions,
    weights_np,
    mesh: Mesh,
    axis_name: str = DATA_AXIS,
):
    """Returns (jitted_step, device_graph, index) where ``jitted_step`` has
    the same (state, weights, inv_w) -> state signature as the single-chip
    step but executes sharded over ``mesh``."""
    num_devices = mesh.devices.size
    dg = DeviceGraph.build(graph)
    index = None
    mode = opts.resolve_repulsion_mode(graph.num_vertices)
    if opts.num_negative_samples < 0 and mode is RepulsionMode.BUCKET:
        index = cand_mod.BucketIndex.build(
            weights_np, opts, graph.edge_src, graph.col_idx
        )
    step_fn = step_mod.build_step(dg, opts, index, shard=(axis_name, num_devices))

    replicated = NamedSharding(mesh, P())

    sharded = shard_map(
        step_fn,
        mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    jitted = jax.jit(sharded)

    def run(state: EmbedState, weights, inv_w) -> EmbedState:
        state = jax.device_put(state, replicated)
        weights = jax.device_put(weights, replicated)
        inv_w = jax.device_put(inv_w, replicated)
        return jitted(state, weights, inv_w)

    run.step_fn = sharded  # for the while-loop driver
    return run, dg, index


@partial(
    jax.jit, static_argnames=("sharded_step", "max_iterations", "position_min_change")
)
def multichip_run_embedding(
    sharded_step,
    state: EmbedState,
    weights,
    inv_w,
    max_iterations: int,
    position_min_change: float,
) -> EmbedState:
    """Full multi-chip calculateEmbedding as one device-side while-loop."""

    def cond(s: EmbedState):
        return (s.iteration < max_iterations) & (
            s.pos_change >= position_min_change
        )

    def body(s: EmbedState):
        return sharded_step(s, weights, inv_w)

    return lax.while_loop(cond, body, state)
