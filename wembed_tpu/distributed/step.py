"""Multi-chip embedding step via shard_map (replicated-state backend).

Parallelization scheme (the graph-partitioning analogue of data
parallelism, SURVEY.md §5.8): the embedding state (positions, weights,
optimizer moments) is replicated on every device; per step each device
computes force PARTIALS on its share of the work —

  * attraction: a contiguous range of the directed edge array
  * fused span repulsion: a contiguous chunk of the pallas work-tile
    list (span_sparse._shard_work_tiles) + a range of correction edges
  * jnp bucketed repulsion: a contiguous range of the sorted query
    blocks, plus slices of the correction edge groups and heavy rows
  * dense repulsion: a contiguous range of vertex rows

— and one ``psum`` over the mesh reduces forces/losses/counters.  The Adam
update, gravity recentering, and convergence metric then run identically
(replicated) on every device, so state never diverges.

Replicated state costs O(n) memory per device but scales compute by 1/P
and needs exactly one all-reduce of (n, d) floats per step over ICI.  The
vertex-sharded halo backend (distributed/halo.py) is the memory-scalable
variant.

``MultiChipEmbedder`` is the host driver: the same surface as the
single-chip ``WEmbedEmbedder`` (calculate_step / calculate_embedding /
get_loss / get_timings / checkpointable state) including the
overflow-driven span growth protocol — the reference's exact radius index
never truncates (WeightedIndex.cpp:65-100), so neither may a converged
distributed run.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..core import candidates as cand_mod
from ..core import step as step_mod
from ..core import weights as weights_mod
from ..core.options import EmbedderOptions, RepulsionMode
from ..core.span_driver import SpanGrowthMixin
from ..core.state import DeviceGraph, EmbedState, init_state, random_positions
from ..graphs.csr import CSRGraph
from ..kernels import span_sparse as span_mod
from ..utils import rng as rng_mod
from ..utils.timer import Timer, TimingResult
from .mesh import DATA_AXIS


def _build_index(graph, opts, weights_np, dg, shard, span_scale=1.0):
    """Index for the sharded step: same selection logic as the single-chip
    embedder (core/embedder.py _rebuild_step) — the fused span skeleton
    when the span kernel applies, else the jnp BucketIndex."""
    mode = opts.resolve_repulsion_mode(graph.num_vertices)
    if opts.num_negative_samples >= 0 or mode is not RepulsionMode.BUCKET:
        return None
    if step_mod.resolve_fused_span(dg, opts) is not None:
        return span_mod.SpanIndex.build(
            weights_np, opts, graph.edge_src, graph.col_idx,
            span_scale=span_scale,
        )
    return cand_mod.BucketIndex.build(
        weights_np, opts, graph.edge_src, graph.col_idx,
        span_scale=span_scale,
    )


def build_multichip_step(
    graph: CSRGraph,
    opts: EmbedderOptions,
    weights_np,
    mesh: Mesh,
    axis_name: str = DATA_AXIS,
    index=None,
):
    """Returns (run, dg, index) where ``run`` has the same
    (state, weights, inv_w, tables) -> state signature as the single-chip
    step but executes sharded over ``mesh``.  ``index`` may be passed in
    (span growth rebuilds) or is built here."""
    num_devices = mesh.devices.size
    shard = (axis_name, num_devices)
    dg = DeviceGraph.build(graph)
    if index is None:
        index = _build_index(graph, opts, weights_np, dg, shard)
    step_fn = step_mod.build_step(dg, opts, index, shard=shard)

    replicated = NamedSharding(mesh, P())

    sharded = shard_map(
        step_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    jitted = jax.jit(sharded)

    def run(state: EmbedState, weights, inv_w, tables=None) -> EmbedState:
        state = jax.device_put(state, replicated)
        weights = jax.device_put(weights, replicated)
        inv_w = jax.device_put(inv_w, replicated)
        return jitted(state, weights, inv_w, tables)

    run.step_fn = sharded  # for the while-loop driver
    return run, dg, index


@partial(jax.jit, static_argnames=("sharded_step",))
def multichip_run_embedding(
    sharded_step,
    state: EmbedState,
    weights,
    inv_w,
    max_iterations,
    position_min_change,
    stop_on_overflow=False,
    tables=None,
) -> EmbedState:
    """Full multi-chip calculateEmbedding as one device-side while-loop.

    Loop parameters are TRACED (iteration-budget changes, span-growth
    continuation, and table swaps all reuse the compiled loop).  With
    ``stop_on_overflow`` the loop exits as soon as a step truncates
    candidate windows so the host can widen them (same protocol as the
    single-chip ``run_embedding``)."""
    stop_on_overflow = jnp.asarray(stop_on_overflow, bool)

    def cond(s: EmbedState):
        return (
            (s.iteration < max_iterations)
            & (s.pos_change >= position_min_change)
            & (~stop_on_overflow | (s.overflow == 0))
        )

    def body(s: EmbedState):
        return sharded_step(s, weights, inv_w, tables)

    return lax.while_loop(cond, body, state)


class MultiChipEmbedder(SpanGrowthMixin):
    """Host driver for the replicated-state sharded backend: the
    multi-device counterpart of ``WEmbedEmbedder`` with the same public
    surface (reference include/wembed.h:105-145)."""

    def __init__(
        self,
        graph: CSRGraph,
        opts: EmbedderOptions | None = None,
        mesh: Mesh | None = None,
        timer: Timer | None = None,
        initial_coordinates: np.ndarray | None = None,
        initial_weights: np.ndarray | None = None,
        verbose: bool = True,
    ):
        from .mesh import make_mesh

        self.graph = graph
        self.opts = opts or EmbedderOptions()
        self.mesh = mesh or make_mesh()
        self.timer = timer or Timer()
        self.verbose = verbose
        self._dtype = jnp.float64 if self.opts.dtype == "float64" else jnp.float32
        n, dim = graph.num_vertices, self.opts.embedding_dimension
        if initial_weights is None:
            initial_weights = weights_mod.initial_weights(graph, self.opts)
        if initial_coordinates is None:
            initial_coordinates = random_positions(n, dim, rng_mod.host_rng())
        self._weights_np = np.asarray(initial_weights, dtype=np.float64)
        self._weights = jnp.asarray(self._weights_np, dtype=self._dtype)
        self._inv_w = jnp.asarray(
            weights_mod.inv_exp_weights(self._weights_np, dim), dtype=self._dtype
        )
        self._span_scale = 1.0
        self._growth_events = 0
        self._run, self._dg, self._index = build_multichip_step(
            graph, self.opts, self._weights_np, self.mesh
        )
        self._tables = (
            self._index.device_tables()
            if isinstance(self._index, span_mod.SpanIndex)
            else None
        )
        self._state = init_state(
            np.asarray(initial_coordinates, dtype=np.float64),
            rng_mod.new_key(),
            dtype=self._dtype,
        )
        self._presize_spans()

    # span growth protocol: SpanGrowthMixin (core/span_driver.py)
    def _span_positions_np(self):
        return np.asarray(self._state.positions, np.float64)

    def _span_device_args(self):
        # replicated state: the single-device needs measurement applies
        return (
            self._state.positions, self._inv_w, self._weights,
            self._dg.colors,
        )

    def _swap_index(self, new_index) -> None:
        """Install a regrown span index; rebuild the sharded step only when
        the work list outgrew its padding bucket (shape change)."""
        same_bucket = new_index.w_pad == self._index.w_pad
        self._index = new_index
        self._tables = new_index.device_tables()
        if not same_bucket:
            self._run, self._dg, self._index = build_multichip_step(
                self.graph, self.opts, self._weights_np, self.mesh,
                index=new_index,
            )

    # ------------------------------------------------------------ embedding
    def calculate_step(self) -> None:
        with self.timer.phase("step", "Embedding step"):
            self._state = self._run(
                self._state, self._weights, self._inv_w, self._tables
            )
            self._state.positions.block_until_ready()
        if int(self._state.overflow) > 0 and self._grow_spans():
            self._announce_growth(int(self._state.overflow))
            self._state = self._state._replace(
                overflow=jnp.asarray(0, jnp.int32)
            )

    def calculate_embedding(self, max_iterations: int | None = None) -> None:
        """Run to convergence; on truncated candidate windows, exit the
        device loop, widen the windows from measured needs, and resume
        (core/embedder.py:410-448 protocol — never converge silently
        under truncation)."""
        cap = (
            self.opts.max_iterations
            if max_iterations is None
            else max_iterations
        )
        with self.timer.phase("embedding_all", "Embedding"):
            # shared growth/shrink protocol: SpanGrowthMixin._drive_device_loop
            def run_segment(seg_cap, stop_on_overflow):
                self._state = multichip_run_embedding(
                    self._run.step_fn,
                    self._state,
                    self._weights,
                    self._inv_w,
                    seg_cap,
                    self.opts.position_min_change,
                    stop_on_overflow,
                    self._tables,
                )
                self._state.positions.block_until_ready()

            self._drive_device_loop(run_segment, cap)

    def is_finished(self) -> bool:
        return int(self._state.iteration) >= self.opts.max_iterations or (
            int(self._state.iteration) > 0
            and float(self._state.pos_change) < self.opts.position_min_change
        )

    # ------------------------------------------------------------- accessors
    @property
    def state(self) -> EmbedState:
        return self._state

    @state.setter
    def state(self, s: EmbedState) -> None:
        self._state = s

    def get_coordinates(self) -> np.ndarray:
        return np.asarray(self._state.positions, dtype=np.float64)

    def get_weights(self) -> np.ndarray:
        return self._weights_np.copy()

    def set_coordinates(self, coordinates: np.ndarray) -> None:
        coordinates = np.asarray(coordinates, dtype=np.float64)
        n, d = self.graph.num_vertices, self.opts.embedding_dimension
        if coordinates.shape != (n, d):
            raise ValueError(f"expected ({n}, {d}) coordinates")
        self._state = self._state._replace(
            positions=jnp.asarray(coordinates, dtype=self._dtype)
        )
        self._presize_spans()

    def set_weights(self, w: np.ndarray) -> None:
        """New weights change the bucket structure: rebuild the sharded
        step (checkpoint-restore path, core/checkpoint.py)."""
        w = np.asarray(w, dtype=np.float64)
        if w.shape != (self.graph.num_vertices,):
            raise ValueError(f"weights shape {w.shape}")
        self._weights_np = w
        d = self.opts.embedding_dimension
        self._weights = jnp.asarray(w, dtype=self._dtype)
        self._inv_w = jnp.asarray(
            weights_mod.inv_exp_weights(w, d), dtype=self._dtype
        )
        self._span_scale = 1.0
        self._growth_events = 0
        self._run, self._dg, self._index = build_multichip_step(
            self.graph, self.opts, self._weights_np, self.mesh
        )
        self._tables = (
            self._index.device_tables()
            if isinstance(self._index, span_mod.SpanIndex)
            else None
        )
        self._presize_spans()

    def get_timings(self) -> list[TimingResult]:
        return self.timer.results()

    def get_loss(self):
        from ..core.embedder import Loss

        return Loss(
            float(self._state.attract_loss), float(self._state.repel_loss)
        )

    @property
    def iteration(self) -> int:
        return int(self._state.iteration)

    @property
    def num_vertices(self) -> int:
        return self.graph.num_vertices

    @property
    def embedding_dimension(self) -> int:
        return self.opts.embedding_dimension
