"""Shared span-window growth protocol for all embedder drivers.

The single-chip, replicated-sharded, and halo drivers all run the same
protocol around their device loops — presize windows from measured needs,
exit the loop on overflow, widen, resume — with backend-specific index
installation.  One implementation here keeps the three backends from
drifting (they had already started to).

The protocol (reference contract: the exact radius index can NEVER
truncate, WeightedIndex.cpp:65-100):

  * PRESIZE (construction / set_coordinates / set_weights / restore):
    measure per-window needs at the current positions on the HOST
    (span_sparse.measure_needs_host, zero device compiles), grow until
    covered, then two-sided resize so no window is over-provisioned.
  * GROWTH (device loop reported overflow): grow starved windows from
    fresh host needs; if the host measurement disagrees with the device
    (independent projection axes), fall back to blind doubling.
  * The guard counts growth EVENTS (each a cheap traced-table swap) and
    exists only to stop runaways; coverage termination is ``can_grow``.

Drivers provide:
  * ``_span_positions_np()`` — current positions as a host (n, d) array
  * ``_swap_index(new_index)`` — install a resized index (and rebuild
    backend machinery when the work list outgrew its padding bucket)
plus the attributes ``_index``, ``opts``, ``_weights_np``,
``_growth_events``, ``verbose``.
"""

from __future__ import annotations

import numpy as np

from ..kernels import span_compact as cell_mod
from ..kernels import span_sparse as span_mod

_MAX_GROWTH_EVENTS = 200  # runaway guard only; see module docstring

# index types driven by the adaptive window/capacity protocol: the
# windowed SpanIndex (d <= 2 and all distributed backends) and the
# cell-compact CellIndex (d >= 3 single-chip) share its entire surface
SPAN_TYPES = (span_mod.SpanIndex, cell_mod.CellIndex)


def structures_builder(idx):
    """The per-step structures constructor for a span-protocol index."""
    if isinstance(idx, cell_mod.CellIndex):
        return cell_mod.build_cell_structures
    return span_mod.build_span_structures


def needs_mirror(idx):
    """The host-side needs measurement for a span-protocol index."""
    if isinstance(idx, cell_mod.CellIndex):
        return cell_mod.measure_cell_needs_host
    return span_mod.measure_needs_host


class SpanGrowthMixin:
    def _drive_device_loop(self, run_segment, cap: int) -> None:
        """The shared calculateEmbedding protocol around a backend's
        device-side while-loop (single-chip / replicated / halo):

          * exit the loop the moment a step truncates candidate windows,
            widen them from measured needs, resume (the reference's exact
            index never truncates, WeightedIndex.cpp:65-100; once growth
            caps out, run to convergence accepting residual truncation)
          * additionally SEGMENT the loop every
            ``opts.span_resize_interval`` iterations so over-provisioned
            windows can shrink (the mid-run candidate bulge inflates
            windows that overflow-driven growth alone never deflates)

        ``run_segment(iter_cap, stop_on_overflow)`` runs the backend's
        jitted loop, updating ``self._state``; overflow-exit only pays
        off for the SpanIndex (zero-recompile table swaps), so other
        indexes run one uninterrupted loop with grow-at-convergence."""
        span = isinstance(self._index, SPAN_TYPES)
        stop_on_overflow = span
        interval = int(getattr(self.opts, "span_resize_interval", 0) or 0)
        seg_growth = 0  # growth events since the last segment boundary
        while True:
            it_now = int(self._state.iteration)
            # segment boundaries sit at GLOBAL multiples of the interval,
            # so segmented callers (benchmark windows, checkpoint-every-K)
            # still cross them — an iteration-relative boundary would
            # never fire for calls shorter than the interval
            seg_cap = (
                min(cap, (it_now // interval + 1) * interval)
                if span and interval > 0
                else cap
            )
            run_segment(seg_cap, stop_on_overflow)
            it = int(self._state.iteration)
            if it >= cap:
                break
            if int(self._state.overflow) == 0:
                self._spurious_resumes = 0
                if float(self._state.pos_change) < self.opts.position_min_change:
                    break  # genuinely converged, no truncation
                # segment boundary: shrink only after a GROWTH-FREE
                # segment — while needs are still rising (the expansion
                # phase), trimming windows to the current need guarantees
                # starvation a few steps later, and every starvation is a
                # costly device-loop exit
                if seg_growth == 0:
                    self._maybe_shrink_spans()
                seg_growth = 0
                continue
            if self._grow_spans():
                seg_growth += 1
                self._announce_growth(int(self._state.overflow))
            else:
                if not stop_on_overflow:
                    break  # already converged under residual truncation
                stop_on_overflow = False
            # force at least one more step under the new spans
            self._state = self._state._replace(
                pos_change=self._inf_pos_change(),
                overflow=self._state.overflow * 0,
            )

    @staticmethod
    def _inf_pos_change():
        import jax.numpy as jnp

        return jnp.asarray(jnp.inf, jnp.float32)

    def _maybe_shrink_spans(self) -> None:
        """Shrink over-provisioned windows to freshly measured needs
        (hysteresis in SpanIndex.shrink_to_needs keeps this from fighting
        the overflow-driven growth).  Always a zero-recompile table swap."""
        if not isinstance(self._index, SPAN_TYPES):
            return
        shrunk = self._index.shrink_to_needs(self._current_needs())
        if shrunk is not None:
            self._swap_index(shrunk)

    # ---- needs measurement: device when possible, numpy mirror otherwise
    def _span_device_args(self):
        """(positions, inv_w, weights, colors) as replicated device arrays
        for the in-jit needs measurement, or None when the driver has no
        replicated view (the vertex-sharded halo backend)."""
        return None

    def _current_needs(self) -> np.ndarray:
        """Mid-run window needs at the current positions.  Prefers the
        DEVICE measurement: it shares the sweep's exact projection axes
        (no host/device f32 power-iteration divergence) and runs ~4x
        faster than the numpy mirror at 1M vertices — growth events sit
        on the critical path of every overflow exit.  The host mirror
        remains for presize (no device compiles before the first step)
        and for drivers without a replicated device view."""
        args = self._span_device_args()
        idx = self._index
        self._needs_from_device = args is not None and isinstance(
            idx, SPAN_TYPES
        )
        if not self._needs_from_device:
            return self._measure_needs()[0]
        # the jitted closure bakes the index's STATIC layout (identical
        # across window swaps — dataclasses.replace shares the arrays);
        # window tables enter as traced inputs, so every growth/shrink
        # reuses the compiled program
        # src_of_q identifies the static layout for BOTH index types
        # (dataclasses.replace shares it across capacity/window swaps)
        if getattr(self, "_needs_fn_src", None) is not idx.src_of_q:
            import jax

            opts = self.opts
            idx0 = idx
            build_fn = structures_builder(idx0)

            @jax.jit
            def needs_fn(pos, inv_w, w, colors, tables):
                s = build_fn(
                    pos, inv_w, w, colors, idx0, opts, tables=tables
                )
                return s.need

            self._needs_fn = needs_fn
            self._needs_fn_src = idx.src_of_q
        pos, inv_w, w, colors = args
        return np.asarray(
            self._needs_fn(pos, inv_w, w, colors, self._tables), np.int64
        )
    def _measure_needs(self):
        """Host-side window needs at the current positions."""
        return needs_mirror(self._index)(
            self._span_positions_np(), self._weights_np, self._index, self.opts
        )

    def _presize_spans(self) -> None:
        """Size windows for the CURRENT positions before stepping, so runs
        start untruncated (windows starve most at spread-out inits)."""
        if not isinstance(self._index, SPAN_TYPES):
            return
        needs = None
        for _ in range(6):
            needs, overflow = self._measure_needs()
            if overflow == 0:
                break
            grown = self._index.grow_from_needs(needs)
            if grown is None:
                break
            self._swap_index(grown)
        if needs is not None:
            # two-sided: the initial heuristic leaves most windows
            # over-provisioned (~3x total tiles measured on girg100k)
            resized = self._index.resize_to_needs(needs)
            if resized is not None:
                self._swap_index(resized)

    def _grow_spans(self) -> bool:
        """Widen truncated windows; returns True if the device loop
        should resume (windows grew, or the overflow is stale — see
        below)."""
        if not isinstance(self._index, SPAN_TYPES):
            return self._grow_spans_fallback()
        if self._growth_events >= _MAX_GROWTH_EVENTS:
            return False
        if not self._index.can_grow():
            return False  # every window already spans its whole group
        needs = self._current_needs()
        grown = self._index.grow_from_needs(needs, headroom=1.5)
        if grown is None:
            # the overflowing step's positions are ONE update behind the
            # measurement: when the measurement is the DEVICE's (same
            # projection axes as the sweep), "covered" means the current
            # windows fit the current positions — the overflow is stale
            # (bulge turnaround: needs crested between the overflowing
            # step and the exit), so just resume.  Bounded: persistent
            # overflow-despite-covered (or the host mirror's divergent
            # axes) falls through to the additive grow_all, restricted
            # to live windows.
            if getattr(self, "_needs_from_device", False):
                self._spurious_resumes = getattr(
                    self, "_spurious_resumes", 0
                ) + 1
                if self._spurious_resumes <= 3:
                    return True
            grown = self._index.grow_all(needs)
        if grown is None:
            return False
        self._growth_events += 1
        self._swap_index(grown)
        return True

    def _grow_spans_fallback(self) -> bool:
        """Non-span index growth (only the single-chip embedder has one)."""
        return False

    def _announce_growth(self, overflow: int) -> None:
        if self.verbose:
            print(
                f"(growing candidate spans after overflow {overflow}; "
                f"event {self._growth_events})"
            )
