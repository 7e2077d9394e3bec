"""Host-level embedder drivers.

``WEmbedEmbedder`` mirrors the reference's NewWEmbedEmbedder surface
(reference: src/embeddingLib/include/embedder/EmbedderInterface.hpp:15-158,
src/embeddingLib/src/embedder/NewWEmbedEmbedder.cpp) on top of the jitted
step: ``calculate_step`` runs one iteration (host-visible metrics),
``calculate_embedding`` runs the whole device-side while-loop.

``LayeredEmbedder`` is the multilevel driver (reference
src/embeddingLib/src/embedder/LayeredEmbedder.cpp): embed the coarsest
layer, then expand child positions from parents layer by layer with a fresh
optimizer per layer.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..graphs.csr import CSRGraph
from ..utils import rng as rng_mod
from ..utils.timer import Timer, TimingResult
from . import candidates as cand_mod
from . import step as step_mod
from ..kernels import span_compact as cell_mod
from ..kernels import span_sparse as span_mod
from . import weights as weights_mod
from .options import EmbedderOptions, RepulsionMode
from .span_driver import SpanGrowthMixin
from .state import DeviceGraph, EmbedState, init_state, random_positions


class Loss:
    """Loss triple from the most recent step (reference include/wembed.h:43-48)."""

    def __init__(self, attractive: float, repulsive: float):
        self.attractive = float(attractive)
        self.repulsive = float(repulsive)

    @property
    def total(self) -> float:
        return self.attractive + self.repulsive

    def __repr__(self) -> str:
        return (
            f"Loss(attractive={self.attractive}, repulsive={self.repulsive}, "
            f"total={self.total})"
        )


class WEmbedEmbedder(SpanGrowthMixin):
    """Flat (single-level) embedder."""

    def __init__(
        self,
        graph: CSRGraph,
        opts: EmbedderOptions | None = None,
        timer: Timer | None = None,
        initial_coordinates: np.ndarray | None = None,
        initial_weights: np.ndarray | None = None,
        verbose: bool = True,
        profile: bool = False,
    ):
        self.graph = graph
        self.opts = opts or EmbedderOptions()
        self.timer = timer or Timer()
        self.verbose = verbose
        # profiled mode: phase-split jits with block_until_ready between
        # phases, so getTimings() yields the reference's per-phase tree
        # (NewWEmbedEmbedder.cpp:38-91) at the cost of lost XLA fusion
        # across phases and one host sync per phase
        self.profile = profile
        self._phase_fns = None
        self._dtype = jnp.float64 if self.opts.dtype == "float64" else jnp.float32
        self._dg = DeviceGraph.build(graph)
        n, d = graph.num_vertices, self.opts.embedding_dimension

        if initial_weights is None:
            initial_weights = weights_mod.initial_weights(graph, self.opts)
        if initial_coordinates is None:
            initial_coordinates = random_positions(n, d, rng_mod.host_rng())

        if self.opts.debug_checks:
            # reference EMBEDDING_USE_ASSERTIONS equivalent (Macros.hpp:7-11):
            # jit raises at the op that produced a NaN.  Global JAX config by
            # necessity — documented side effect of the debug flag.
            jax.config.update("jax_debug_nans", True)

        self._state = init_state(
            np.asarray(initial_coordinates, dtype=np.float64),
            rng_mod.new_key(),
            dtype=self._dtype,
        )
        self._set_weights_internal(np.asarray(initial_weights, dtype=np.float64))
        self._presize_spans()

    # span growth protocol: SpanGrowthMixin (core/span_driver.py) —
    # needs are measured on HOST (numpy mirror of the device searchsorted
    # logic; the eager device version cost ~80s of one-time remote
    # compiles per source revision at 100K vertices)
    def _span_positions_np(self) -> np.ndarray:
        return np.asarray(self._state.positions, np.float64)

    def _span_device_args(self):
        return (
            self._state.positions, self._inv_w, self._weights,
            self._dg.colors,
        )

    def _swap_index(self, new_index) -> None:
        """Install a resized span index; rebuild the step closure only
        when the work list outgrew its padding bucket (shape change —
        the only growth case that recompiles)."""
        same_bucket = new_index.w_pad == self._index.w_pad
        self._index = new_index
        self._tables = new_index.device_tables()
        if not same_bucket:
            self._step_fn = step_mod.build_step(self._dg, self.opts, new_index)
            self._jitted_step = jax.jit(self._step_fn)
        self._phase_fns = None

    # -------------------------------------------------------------- internals
    def _set_weights_internal(self, w: np.ndarray) -> None:
        if w.shape != (self.graph.num_vertices,):
            raise ValueError(
                f"weights shape {w.shape} != ({self.graph.num_vertices},)"
            )
        self._weights_np = w
        d = self.opts.embedding_dimension
        self._weights = jnp.asarray(w, dtype=self._dtype)
        self._inv_w = jnp.asarray(
            weights_mod.inv_exp_weights(w, d), dtype=self._dtype
        )
        self._span_scale = 1.0
        self._growth_events = 0
        self._rebuild_step()

    def _rebuild_step(self) -> None:
        self._index = None
        mode = self.opts.resolve_repulsion_mode(self.graph.num_vertices)
        if self.opts.num_negative_samples < 0 and mode is RepulsionMode.BUCKET:
            if step_mod.resolve_fused_span(self._dg, self.opts) is not None:
                # fused Pallas span path: the windowed layout by
                # default (auto — see options.span_layout for the d4
                # hardware comparison), the cell-compact layout
                # (kernels/span_compact.py) on request
                use_cells = self.opts.span_layout == "cells"
                index_cls = (
                    cell_mod.CellIndex if use_cells else span_mod.SpanIndex
                )
                self._index = index_cls.build(
                    self._weights_np,
                    self.opts,
                    self.graph.edge_src,
                    self.graph.col_idx,
                    span_scale=self._span_scale,
                )
            else:
                self._index = cand_mod.BucketIndex.build(
                    self._weights_np,
                    self.opts,
                    self.graph.edge_src,
                    self.graph.col_idx,
                    span_scale=self._span_scale,
                )
        from .span_driver import SPAN_TYPES

        self._tables = (
            self._index.device_tables()
            if isinstance(self._index, SPAN_TYPES)
            else None
        )
        self._step_fn = step_mod.build_step(self._dg, self.opts, self._index)
        self._jitted_step = jax.jit(self._step_fn)
        self._phase_fns = None  # rebuilt lazily on the next profiled step

    def _grow_spans_fallback(self) -> bool:
        """BucketIndex growth: scale-doubling rebuild (recompiles, so the
        cap stays tight; the span path never reaches here)."""
        if self._index is None or self._span_scale >= 1024:
            return False
        if all(
            b.span >= b.sample_size for b in self._index.buckets
        ):
            return False  # spans already cover every bucket entirely
        self._span_scale *= 2.0
        self._rebuild_step()
        return True

    # ------------------------------------------------------------ embedding
    def calculate_step(self) -> None:
        """One iteration with host-visible metrics
        (reference NewWEmbedEmbedder.cpp:14-92)."""
        if self.graph.num_vertices <= 1:
            # coarsest-hierarchy-layer short-circuit
            # (NewWEmbedEmbedder.cpp:25-28)
            self._state = self._state._replace(
                iteration=self._state.iteration + 1,
                pos_change=jnp.asarray(0.0, jnp.float32),
            )
            return
        if self.profile:
            self._calculate_step_profiled()
        else:
            with self.timer.phase("step", "Embedding step"):
                self._state = self._jitted_step(
                    self._state, self._weights, self._inv_w, self._tables
                )
                self._state.positions.block_until_ready()
        it = int(self._state.iteration)
        if self.opts.debug_checks:
            self._debug_validate()
        if self.opts.dump_weights:
            self._dump_weights(it)
        if self.verbose and (it == 1 or (it > 0 and it % 10 == 0)):
            print(
                f"(Iteration {it}: #rep forces {int(self._state.num_rep_forces)}, "
                f"relative pos change: {float(self._state.pos_change)})"
            )

    def _calculate_step_profiled(self) -> None:
        """One step as phase-split jits, timed like the reference's
        calculateStep (index / attracting_forces / repelling_forces /
        apply_forces / gravity / position_change,
        NewWEmbedEmbedder.cpp:38-91).  Results match the unfused jnp step
        up to XLA fusion-order rounding (same RNG splits, same math, only
        the jit boundaries differ)."""
        if self._phase_fns is None:
            self._phase_fns = step_mod.build_phase_fns(
                self._dg, self.opts, self._index
            )
        fns = self._phase_fns
        st = self._state
        keys = jax.block_until_ready(fns["split4"](st.key))
        key_next, att_key, rep_key, kick_key = keys[0], keys[1], keys[2], keys[3]
        old_positions = st.positions

        structures = None
        if fns["index"] is not None:
            with self.timer.phase("index"):
                structures = jax.block_until_ready(
                    fns["index"](old_positions, self._weights, self._inv_w, rep_key)
                )
        with self.timer.phase("attracting_forces"):
            force_att, att_loss = jax.block_until_ready(
                fns["attract"](old_positions, self._inv_w, att_key)
            )
        with self.timer.phase("repelling_forces"):
            if fns["kind"] == "bucket":
                rep = fns["repel"](
                    old_positions, self._weights, self._inv_w, rep_key, structures
                )
            elif fns["kind"] == "dense":
                rep = fns["repel"](old_positions, self._inv_w)
            else:
                rep = fns["repel"](old_positions, self._inv_w, rep_key)
            rep_force, rep_loss, rep_count, overflow, zero_count = (
                jax.block_until_ready(rep)
            )
        with self.timer.phase("apply_forces"):
            positions, m, v, t = jax.block_until_ready(
                fns["apply"](st, force_att, rep_force, zero_count, kick_key)
            )
        with self.timer.phase("gravity"):
            positions = jax.block_until_ready(fns["gravity"](positions))
        with self.timer.phase("position_change"):
            pos_change = jax.block_until_ready(
                fns["pos_change"](old_positions, positions)
            )
        self._state = EmbedState(
            positions=positions,
            adam_m=m,
            adam_v=v,
            iteration=t,
            key=key_next,
            attract_loss=att_loss,
            repel_loss=rep_loss,
            pos_change=pos_change,
            num_rep_forces=rep_count,
            overflow=overflow,
        )

    def _debug_validate(self) -> None:
        """Raise FloatingPointError if any state leaf went non-finite —
        the runtime analogue of the reference's deep ASSERT/NaN-poisoning
        machinery (DVec.hpp:89-94,693-697)."""
        s = self._state
        for name, arr in [
            ("positions", s.positions),
            ("adam_m", s.adam_m),
            ("adam_v", s.adam_v),
            ("attract_loss", s.attract_loss),
            ("repel_loss", s.repel_loss),
            ("pos_change", s.pos_change),
        ]:
            a = np.asarray(arr)
            bad = ~np.isfinite(a)
            # pos_change is inf before the first step by construction
            if name == "pos_change" and int(s.iteration) == 0:
                continue
            if bad.any():
                raise FloatingPointError(
                    f"debug_checks: {int(bad.sum())} non-finite entries in "
                    f"{name} at iteration {int(s.iteration)}"
                )

    def _dump_weights(self, iteration: int) -> None:
        """Append the current weights to weight_dump.txt — truncate on the
        first iteration (reference NewWEmbedEmbedder.cpp:161-186)."""
        mode = "w" if iteration <= 1 else "a"
        with open("weight_dump.txt", mode) as f:
            f.write(" ".join(repr(float(w)) for w in self._weights_np) + " \n")

    def is_finished(self) -> bool:
        return int(self._state.iteration) >= self.opts.max_iterations or (
            int(self._state.iteration) > 0
            and float(self._state.pos_change) < self.opts.position_min_change
        )

    def calculate_embedding(self, max_iterations: int | None = None) -> None:
        """Full embedding via the device-side while-loop — no per-iteration
        host round-trips.

        ``max_iterations`` optionally caps this CALL below the configured
        budget (segmented runs: benchmarking steady-state windows,
        checkpoint-every-K driving).  The loop bound is a traced scalar, so
        different caps reuse the compiled while-loop."""
        cap = self.opts.max_iterations if max_iterations is None else min(
            max_iterations, self.opts.max_iterations
        )
        if self.graph.num_vertices <= 1:
            self._state = self._state._replace(
                pos_change=jnp.asarray(0.0, jnp.float32)
            )
            return
        if self.opts.dump_weights or self.profile:
            # host-side per-step loop: weight dumping needs a host action
            # per iteration (reference NewWEmbedEmbedder.cpp:36), and
            # profiled mode needs per-phase host syncs.  Span growth on
            # overflow works the same as the device-loop path below.
            with self.timer.phase("embedding_all", "Embedding"):
                while True:
                    while (
                        not self.is_finished()
                        and int(self._state.iteration) < cap
                    ):
                        self.calculate_step()
                        # widen truncated windows immediately (same
                        # protocol as the device-loop path below)
                        if int(self._state.overflow) > 0 and self._grow_spans():
                            self._announce_growth(int(self._state.overflow))
                            self._state = self._state._replace(
                                overflow=jnp.asarray(0, jnp.int32)
                            )
                    if int(self._state.iteration) >= cap:
                        break
                    if int(self._state.overflow) == 0 or not self._grow_spans():
                        break
                    self._state = self._state._replace(
                        pos_change=jnp.asarray(jnp.inf, jnp.float32),
                        overflow=jnp.asarray(0, jnp.int32),
                    )
            return
        with self.timer.phase("embedding_all", "Embedding"):
            # shared growth/shrink protocol around the device loop:
            # SpanGrowthMixin._drive_device_loop (core/span_driver.py)
            def run_segment(seg_cap, stop_on_overflow):
                self._state = step_mod.run_embedding(
                    self._step_fn,
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
        if self.opts.debug_checks:
            self._debug_validate()

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
        if coordinates.shape[0] != n:
            raise ValueError(f"expected {n} coordinate rows, got {coordinates.shape[0]}")
        if coordinates.shape[1] != d:
            # reference warns and copies the overlapping prefix
            # (NewWEmbedEmbedder.cpp:125-140)
            current = self.get_coordinates()
            k = min(d, coordinates.shape[1])
            current[:, :k] = coordinates[:, :k]
            coordinates = current
        self._state = self._state._replace(
            positions=jnp.asarray(coordinates, dtype=self._dtype)
        )
        self._presize_spans()

    def set_weights(self, w: np.ndarray) -> None:
        self._set_weights_internal(np.asarray(w, dtype=np.float64))
        self._presize_spans()

    def get_timings(self) -> list[TimingResult]:
        return self.timer.results()

    def get_loss(self) -> Loss:
        return Loss(float(self._state.attract_loss), float(self._state.repel_loss))

    @property
    def iteration(self) -> int:
        return int(self._state.iteration)

    @property
    def num_vertices(self) -> int:
        return self.graph.num_vertices

    @property
    def embedding_dimension(self) -> int:
        return self.opts.embedding_dimension
