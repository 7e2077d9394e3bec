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

from ..kernels import span_sparse as span_mod

_MAX_GROWTH_EVENTS = 200  # runaway guard only; see module docstring


class SpanGrowthMixin:
    def _measure_needs(self):
        """Host-side window needs at the current positions."""
        return span_mod.measure_needs_host(
            self._span_positions_np(), self._weights_np, self._index, self.opts
        )

    def _presize_spans(self) -> None:
        """Size windows for the CURRENT positions before stepping, so runs
        start untruncated (windows starve most at spread-out inits)."""
        if not isinstance(self._index, span_mod.SpanIndex):
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
        """Widen truncated windows; returns True if anything grew."""
        if not isinstance(self._index, span_mod.SpanIndex):
            return self._grow_spans_fallback()
        if self._growth_events >= _MAX_GROWTH_EVENTS:
            return False
        if not self._index.can_grow():
            return False  # every window already spans its whole group
        grown = self._index.grow_from_needs(
            self._measure_needs()[0], headroom=1.5
        )
        if grown is None:
            # device reported overflow but host needs say covered: the
            # independent projection axes diverged — defer to device truth
            grown = self._index.grow_all()
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
