"""Fused sparse repulsion: ONE Pallas kernel for the whole bucketed
candidate sweep.

This is the TPU-native replacement for the reference's per-iteration
spatial-index machinery (the weight-bucketed radius index
src/embeddingLib/src/spacialQuery/WeightedIndex.cpp:10-100 over the SNN
projected-sort index src/SNN/src/snn.cpp:97-160 / the Rust ``sprk``
crate), superseding the pure-jnp blocked sort-merge passes in
``core/candidates.py`` on the f32 TPU path.  The jnp path materialized
every (block x span) coefficient tensor through HBM; here the entire
distance/mask/coefficient/reduce pipeline for one work tile lives in
VMEM, so HBM traffic drops to the query/span operand streams.

Structure:

  1. Vertices are partitioned into *merged* doubling weight buckets
     ("groups"): consecutive doubling classes (WeightedIndex.cpp:51-63)
     are greedily merged until a group holds >= _GROUP_MIN members, so
     power-law tails don't fragment the work list.  Merging only widens
     the conservative candidate radius (never drops a candidate), and the
     radius filter is redundant for forces: the active condition
     dist*ws <= L implies dist <= L*(w_u*w_v)^(1/d) <= L*(w_u*bmax)^(1/d)
     = the candidate radius.  Group membership is static (weights are
     constant), giving every shape below compile-time values.
  2. Each group is further split into ROWS — equal-population bins of
     the group's members by FIRST-principal-axis rank, with static
     512-aligned sizes (population ~ sqrt(_Q * group_size), the swept-
     area minimizer).  Per step, two device lexsorts order all vertices
     (group, first axis) then (row, second axis); the same order yields
     BOTH the per-row sorted member arrays (span side, padded to _ST
     tiles) and the query blocks (padded to _Q rows per row).  Candidate
     windows prune in BOTH axes: rows beyond a block's conservative
     first-axis reach need no window, in-reach rows get a second-axis
     searchsorted window.  (The single-level r03 layout measured
     ~0.1-0.4% sweep occupancy at 100K-1M; two-level binning cuts the
     swept area per block from O(extent * r) to O((block + r)^2).)
  3. The work list is a STATIC flattening of (query block i, target
     row g, span tile t): for each pair the span tile count T[i,g]
     is sized from measured needs, while the tile *positions*
     (which part of row g's sorted members block i scans) are dynamic
     searchsorted window starts, fed to the kernel as a scalar-prefetch
     array that BlockSpec index maps consume.  One pallas_call walks all
     work tiles; output blocks are revisited across consecutive tiles of
     the same query block and stay resident in VMEM.
  4. Window truncation is surfaced via the overflow counter computed
     from the exact searchsorted bounds (SURVEY.md §7 hard part #1); the
     embedder grows spans and rebuilds when convergence was reached with
     overflow (core/embedder.py _grow_spans).
  5. Graph neighbors must not repel (reference filters candidates with
     areNeighbors, NewWEmbedEmbedder.cpp:328).  Like the jnp path we
     repel every in-window pair and subtract neighbor contributions in
     an O(E) correction pass (merged with attraction into one edge pass
     in ``span_fused_forces`` — both act along pos_dst - pos_src).  The
     cancellation against the kernel's term is exact in EXACT arithmetic
     and carries an f32 rounding residual of O(eps * |position| * coeff)
     per corrected edge — the kernel reduces in q*rowsum - acc form
     while the correction sums coeff*(dst - src) directly.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_Q = 256  # queries per block
_ST = 256  # span elements per work tile (256: window needs average
# a few hundred members, so 512-wide tiles paid ~2x quantization waste)
_GROUP_MIN = 2048  # merge doubling classes until a group has this many
_Q_SENTINEL = 1e15  # padded query position (far positive)
_S_SENTINEL = -1e15  # padded member position (far negative; never coincides
# with a query sentinel, so sentinel x padding pairs keep dist2 > 0)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _bucket_size(w: int, headroom: float) -> int:
    """Canonical work-list bucket for W tiles: 512 * 2^k >= headroom*W.
    A geometric LADDER (not headroom-proportional rounding) so that a
    list shrinking back to a pre-bulge size lands on the EXACT bucket it
    compiled with before — a persistent-cache hit instead of a fresh
    ~40s+ tunnel compile.  Padding tiles only pay the pallas grid-step
    cost (same-block DMA, compute skipped)."""
    need = max(512, int(np.ceil(w * headroom)))
    k = max(0, int(np.ceil(np.log2(need / 512.0))))
    return 512 << k


def _assemble_work_tiles(nb, b, blk_t, row_pad_off, pad_to=None, headroom=1.6):
    """Static (W, qblk, pair, off, first) work-tile tables from per-block
    tile counts — the flattened pallas grid order (block-major so output
    blocks are revisited on consecutive grid steps).  ``b`` is the width
    of the second window axis (target ROWS since r04).

    The list is PADDED to a bucketed length (1.6x headroom rounded to
    512): the pallas grid size is a compile-time shape, but the table
    VALUES are traced kernel inputs, so window growth that stays within
    the bucket swaps tables without any recompile.  Padding tiles carry
    qblk == nb (the dummy output block) and are skipped by the kernel;
    consecutive padding tiles revisit the same input/output blocks, so
    they cost no extra DMA either.  The headroom is sized for the
    mid-run candidate bulge (positions contract before spreading, and
    windows grow to cover it): a bucket crossing there recompiles the
    step, which dwarfs the padding cost."""
    # vectorized flattening (the list is rebuilt on every growth event and
    # reaches ~1e5+ tiles at million-vertex scale — a python loop here was
    # a visible slice of embedder-build time)
    tile_off = (np.asarray(row_pad_off) // _ST).astype(np.int64)
    blk_t = np.asarray(blk_t, np.int64)  # (nb, b)
    flat_t = blk_t.reshape(-1)  # pair-major: i * b + g
    w = int(flat_t.sum())
    # pair id of every tile, then per-tile rank within its pair
    pair_of_tile = np.repeat(np.arange(nb * b, dtype=np.int64), flat_t)
    pair_starts = np.concatenate([[0], np.cumsum(flat_t)[:-1]])
    t_within = np.arange(w, dtype=np.int64) - pair_starts[pair_of_tile]
    qblk = (pair_of_tile // b).astype(np.int64)
    g_of_tile = pair_of_tile % b
    off = tile_off[g_of_tile] + t_within
    # first tile of each query block == first tile position of the block
    first = np.zeros(w, np.int64)
    blk_sizes = blk_t.sum(axis=1)
    blk_starts = np.concatenate([[0], np.cumsum(blk_sizes)[:-1]])
    first[blk_starts[blk_sizes > 0]] = 1

    if pad_to is not None and w <= pad_to:
        w_pad = pad_to  # fits the existing bucket: keep shapes identical
    else:
        w_pad = _bucket_size(w, headroom)
    pad = w_pad - w
    wt_qblk = np.concatenate([qblk, np.full(pad, nb, np.int64)])
    wt_pair = np.concatenate([pair_of_tile, np.zeros(pad, np.int64)])
    wt_off = np.concatenate([off, np.zeros(pad, np.int64)])
    first_tail = np.zeros(pad, np.int64)
    if pad:
        first_tail[0] = 1
    wt_first = np.concatenate([first, first_tail])
    return (
        w,
        wt_qblk.astype(np.int32),
        wt_pair.astype(np.int32),
        wt_off.astype(np.int32),
        wt_first.astype(np.int32),
    )


# ----------------------------------------------------------------- skeleton


def _merge_weight_groups(weights: np.ndarray, opts):
    """Merged doubling weight groups (the shared skeleton base of the
    windowed SpanIndex and the cell-compact CellIndex): consecutive
    doubling classes (WeightedIndex.cpp:51-63) greedily merged until a
    group holds >= _GROUP_MIN members.  Returns (group_of (n,) i32,
    group_sizes (B,) i64, bmaxpow (B,) f32 = groupmax^(1/d),
    class_bm2 (n,) f32 = per-CLASS max^(2/d), B)."""
    from ..core.candidates import doubling_weight_buckets

    d = int(opts.embedding_dimension)
    thresholds = doubling_weight_buckets(weights, opts.doubling_factor)
    assignment = np.searchsorted(thresholds, weights, side="right")
    class_max = np.concatenate([thresholds, [float(np.max(weights))]])
    num_classes = thresholds.shape[0] + 1
    class_sizes = np.bincount(assignment, minlength=num_classes)

    class_group = np.zeros(num_classes, np.int32)
    sizes, maxes = [], []
    acc = 0
    for c in range(num_classes):
        if acc >= _GROUP_MIN and sizes:
            sizes.append(0)
            acc = 0
        if not sizes:
            sizes.append(0)
        class_group[c] = len(sizes) - 1
        sizes[-1] += int(class_sizes[c])
        acc += int(class_sizes[c])
        if len(maxes) < len(sizes):
            maxes.append(0.0)
        if class_sizes[c]:
            maxes[-1] = float(class_max[c])
        else:
            maxes[-1] = max(maxes[-1], float(class_max[c]))
    # drop empty groups (possible when trailing classes are empty)
    keep = [i for i, s in enumerate(sizes) if s > 0]
    remap = {old: new for new, old in enumerate(keep)}
    group_sizes = np.asarray([sizes[i] for i in keep], np.int64)
    bmaxpow = np.asarray([maxes[i] ** (1.0 / d) for i in keep], np.float32)
    b = len(keep)
    group_of = np.asarray(
        [remap[class_group[c]] for c in assignment], np.int32
    )
    class_bm2 = (class_max[assignment] ** (2.0 / d)).astype(np.float32)
    return group_of, group_sizes, bmaxpow, class_bm2, b


def _edge_correction_tables(
    n: int, edge_src: np.ndarray, edge_dst: np.ndarray, class_bm2: np.ndarray
):
    """Padded directed-edge tables for the O(E) neighbor correction —
    shared by both span layouts.  Returns (esrc_p, edst_p, emask,
    edge_bmaxpow, edge_row_ptr)."""
    esrc = np.asarray(edge_src, np.int32)
    edst = np.asarray(edge_dst, np.int32)
    e = esrc.shape[0]
    e_pad = max(512, _round_up(e, 512))
    pad = e_pad - e
    emask = np.concatenate([np.ones(e, bool), np.zeros(pad, bool)])
    # padding src = n-1 keeps the directed array src-sorted (CSR order),
    # so the correction's segment_sums may use indices_are_sorted; the
    # padded rows contribute exact zeros (mask -> coeff 0)
    esrc_p = np.concatenate([esrc, np.full(pad, n - 1, np.int32)])
    edst_p = np.concatenate([edst, np.zeros(pad, np.int32)])
    edge_bmaxpow = np.sqrt(class_bm2[edst_p]).astype(np.float32)
    edge_row_ptr = np.searchsorted(esrc_p, np.arange(n + 1)).astype(np.int32)
    return esrc_p, edst_p, emask, edge_bmaxpow, edge_row_ptr


@dataclass(frozen=True)
class SpanIndex:
    """Static skeleton of the fused span index (host-built once per
    embedder / span growth).  All fields are numpy or python — nothing
    here depends on positions.

    TWO-LEVEL layout (r04): each merged weight group is split into ROWS —
    equal-population bins of the group's members by their rank along the
    FIRST principal axis, with every row size a multiple of 512 except
    the group's last (so rows never straddle query blocks or span
    tiles).  Per step, members are binned by first-axis rank (row
    membership is a STATIC function of that rank) and sorted within each
    row by the SECOND principal axis; candidate windows live per
    (query block, target row) and prune in BOTH axes: rows outside the
    conservative first-axis reach need no window at all, and in-reach
    rows get a second-axis searchsorted window.  The 1-D layout (one row
    per group) measured ~0.1-0.4% sweep occupancy at 100K-1M because a
    256-query block's conservative window had to span every member
    within radius along a single axis; two-level binning cuts the swept
    area from O(extent * r) to O((block + r)^2) per block.

    Row population rule: sqrt(_Q * group_size) rounded to 512 — the
    minimizer of per-block swept members (window rows x row width) for
    uniform density, independent of the radius."""

    n: int
    d: int
    num_channels: int  # C: channel/row count of qdata / sdata / out
    num_groups: int  # B: merged weight groups (radius semantics)
    num_rows: int  # R: total rows (window granularity)
    nb: int  # NB: total query blocks
    w: int  # W: total work tiles (pallas grid size)
    # row tables (R,)
    row_group: np.ndarray  # group of each row
    row_sizes: np.ndarray  # members per row
    row_moff: np.ndarray  # member offset of row in sorted order
    row_qoff: np.ndarray  # query offset (padded to _Q blocks)
    row_pad_off: np.ndarray  # member offset in ST-padded layout
    row_tiles: np.ndarray  # n_tiles per row
    # group tables (B,)
    bmaxpow: np.ndarray  # f32 bmax_g^(1/d)
    # per-vertex static
    group_of: np.ndarray  # (n,) int32
    class_bm2: np.ndarray  # (n,) f32: per-DOUBLING-CLASS max^(2/d) — the
    # reference's candidate radius factor (WeightedIndex.cpp:65-81); used
    # for the kernel's count/radius channel so num_rep_forces matches the
    # per-class counts of the reference/jnp paths (group merging and row
    # binning only affect window COVERAGE, not the counted candidate set)
    # sorted-order static vectors (n,): the row occupying sorted rank j
    # is a STATIC function of j (rows are fixed rank ranges)
    row_of_sorted: np.ndarray  # row id of sorted position j
    sorted_moff: np.ndarray  # row_moff of the row of sorted position j
    sorted_shift_pad: np.ndarray  # pad_off - m_off per sorted position
    sorted_shift_q: np.ndarray  # q_off - m_off per sorted position
    # padded-slot -> sorted-rank gather maps (static; rank n = sentinel)
    src_of_pad: np.ndarray  # (NPA,)
    src_of_q: np.ndarray  # (NQ,)
    # per-block static member-rank extents (first/last rank in block)
    blk_first: np.ndarray  # (NB,)
    blk_last: np.ndarray  # (NB,)
    # member-padded static rows
    bmaxpow_padded: np.ndarray  # (NPA,) f32: bmaxpow of each padded slot
    # work-tile static tables (W,)
    wt_qblk: np.ndarray  # query block per work tile
    wt_pair: np.ndarray  # flattened (qblk * R + row) per work tile
    wt_off: np.ndarray  # tile_off[row] + t per work tile (static part of stile)
    wt_first: np.ndarray  # 1 on the first tile of each query block
    # per-block static
    blk_t: np.ndarray  # (NB, R) T of each (block, row)
    blk_row: np.ndarray  # (NB,) query row of each block
    # directed-edge correction arrays (padded to 512)
    edge_src: np.ndarray
    edge_dst: np.ndarray
    edge_mask: np.ndarray
    edge_bmaxpow: np.ndarray  # per-class max^(1/d) of dst, static
    edge_row_ptr: np.ndarray  # (n+1,) CSR offsets into the padded edges
    span_scale: float

    @property
    def npa(self) -> int:  # padded member array length
        return int(self.row_pad_off[-1] + self.row_tiles[-1] * _ST)

    @property
    def w_pad(self) -> int:  # bucketed work-list length == pallas grid size
        return int(self.wt_qblk.shape[0])

    def device_tables(self) -> "SpanTables":
        """The growth-dependent tables as device arrays.  These are TRACED
        kernel/step inputs: growth within the same w_pad bucket swaps these
        values with ZERO recompilation (grid size, block shapes, and every
        other skeleton field stay identical)."""
        return SpanTables(
            wt_qblk=jnp.asarray(self.wt_qblk),
            wt_pair=jnp.asarray(self.wt_pair),
            wt_off=jnp.asarray(self.wt_off),
            wt_first=jnp.asarray(self.wt_first),
            blk_t=jnp.asarray(self.blk_t),
        )

    @property
    def nq(self) -> int:  # padded query array length, incl. the dummy block
        # one extra all-sentinel block at index nb: padding work tiles in
        # the bucketed grid write there, and the kernel skips their compute
        return int((self.nb + 1) * _Q)

    def can_grow(self) -> bool:
        """False once every (query block, target row) window already
        scans the whole target row — growth could not add candidates."""
        return bool(np.any(self.blk_t < self.row_tiles[None, :]))

    def grow_from_needs(
        self, needs: np.ndarray, headroom: float = 1.3
    ) -> "SpanIndex | None":
        """Adaptive growth: widen each (query BLOCK, target row) window
        to its own MEASURED searchsorted need (``SpanStructures.need``,
        (NB, R) member counts).  The reference never truncates (its radius
        index is exact, WeightedIndex.cpp:65-100); this converges to the
        same no-truncation guarantee while only widening the windows that
        actually overflowed.

        Sizing is PER BLOCK, not per (row, row) max: blocks are fixed
        rank ranges of a row's sorted members, and need varies strongly
        along the axis (dense middle, sparse tails) — collapsing to the
        group max cost ~3x the total work tiles on girg100k (measured).
        A block's need profile is stable across steps because its RANK
        range is static even though its member set churns.

        Needs are a MOVING target (clusters densify along the projection
        as the embedding evolves), so each growth takes ``headroom`` slack
        on the measured need AND at least doubles the starved window —
        total growth events per window are O(log tiles), not O(steps).

        Returns the regrown index, or None if already fully covering."""
        needs = np.asarray(needs, np.int64)
        # a window of t tiles only guarantees coverage of (t-1)*ST+1
        # members in the worst tile alignment, so the starvation test and
        # the sizing both carry the +1 quantization tile — EXCEPT for
        # windows with zero measured need, which require zero tiles
        # (otherwise every growth event would resurrect all
        # shrink_empty'd windows)
        min_tiles = np.where(needs > 0, -(-needs // _ST), 0)
        starved = min_tiles > self.blk_t
        # sizing carries +2 tiles (quantization + ~_ST members of churn
        # margin: block membership shifts along the projection between
        # steps, and re-starving a window costs a device-loop exit)
        # +2 margin tiles: needs RISE steadily through the expansion
        # phase, and every starvation costs a device-loop exit + host
        # round trip (~0.3-0.5s via the tunnel) — two extra 256-member
        # tiles per starved window buy far fewer repeat events
        need_tiles = -(-(needs * headroom).astype(np.int64) // _ST) + 2
        # windows sitting exactly AT capacity ("tight") are the next
        # starvations (needs rise steadily mid-bulge; r04's 1M layered
        # trajectory logged a growth event every ~2 iterations) — give
        # them one proactive spare tile per event, far cheaper than the
        # loop exits they would otherwise cause
        tight = (min_tiles == self.blk_t) & (self.blk_t > 0)
        t_new = np.where(
            starved,
            np.maximum(need_tiles, 2 * self.blk_t),
            np.where(tight, self.blk_t + 1, self.blk_t),
        )
        t_new = np.minimum(t_new, self.row_tiles[None, :])
        if np.array_equal(t_new, self.blk_t):
            return None
        return self._with_blk_t(t_new)

    def grow_all(self, needs: np.ndarray | None = None) -> "SpanIndex | None":
        """Widen every LIVE window by one tile.

        Divergence fallback: the growth protocol sizes windows from a
        needs measurement — when that measurement is the HOST mirror (a
        numpy replica of the device's f32 power iteration), the axes can
        diverge (rounding on near-equal top eigenvalues) and the host can
        report full coverage while the device overflows.  Callers use
        this when ``grow_from_needs`` returns None but the device
        reported overflow.  ADDITIVE on purpose: the divergence case
        needs a margin around every window, and a multiplicative fallback
        was measured doubling the whole work list (2.4x step cost) on one
        bad event.

        LIVE = nonzero width or nonzero measured need.  An unrestricted
        +1 resurrected every overlap-but-empty window: on the r04 1M
        layered trajectory two such events grew 546K zero-need windows
        to 1.8M work tiles (real need: 143K) and the following bucket
        recompile (2^22 tiles) died in the compile service — the mid-run
        'TPU device error' that killed the layered 1M run."""
        live = self.blk_t > 0
        if needs is not None:
            live = live | (np.asarray(needs) > 0)
        t_new = np.minimum(
            self.blk_t.astype(np.int64) + live.astype(np.int64),
            self.row_tiles[None, :],
        )
        if np.array_equal(t_new, self.blk_t):
            return None
        return self._with_blk_t(t_new)

    def resize_to_needs(
        self, needs: np.ndarray, headroom: float = 1.3
    ) -> "SpanIndex | None":
        """Two-sided resize: size EVERY (query block, target row) window
        to its measured need — shrinking over-provisioned windows as well
        as growing starved ones (zero-need windows drop to 0 tiles).

        Used at PRESIZE time only, where shrinking is safe: a window that
        later needs more coverage reports overflow and regrows
        (one-sided ``grow_from_needs``, which never shrinks, handles the
        mid-run moving target without thrash).  Re-buckets the work list
        from scratch (``keep_bucket=False``): the construction-time
        sizing heuristic knows nothing about the second-level row
        pruning, so its bucket can be several times the resized need —
        and padding tiles are only ~free in small numbers (the grid
        still steps through them)."""
        needs = np.asarray(needs, np.int64)
        # +1 quantization tile only: presize windows regrow cheaply if the
        # run starves them, while an extra blanket tile costs one tile per
        # nonzero window (~38K tiles at million-vertex scale)
        t_new = np.where(
            needs > 0,
            -(-(needs * headroom).astype(np.int64) // _ST),
            0,
        )
        t_new = np.minimum(t_new, self.row_tiles[None, :])
        if np.array_equal(t_new, self.blk_t):
            return None
        return self._with_blk_t(t_new, keep_bucket=False)

    def shrink_to_needs(
        self, needs: np.ndarray, headroom: float = 1.5, slack: int = 2
    ) -> "SpanIndex | None":
        """One-sided SHRINK for mid-run segment boundaries: windows more
        than ``slack`` tiles above the grow_from_needs sizing drop to it,
        and zero-need windows (rows that drifted out of first-axis
        reach) drop to 0 tiles.  Healthy and starved windows are
        untouched — overflow-driven growth owns starvation.

        Rationale: the mid-run candidate bulge (positions contract before
        spreading) inflates windows that one-sided growth never deflates
        — measured 6x work-tile inflation at 100K under the two-level
        layout, whose many small windows each carry quantization + churn
        margins.  The slack is ADDITIVE (one spare tile): most windows
        are 1-3 tiles, so any multiplicative band would never fire for
        them (the r04 first-cut x2 band shrank nothing on real runs).
        Thrash-free by construction: a freshly grown window sits exactly
        at the shrink target.  Shrink-only => always fits the current
        w_pad bucket; when the bucket itself is >= 4x oversized for the
        shrunk list (bulge-era growth blew it up: padding tiles still
        pay grid steps), re-bucket down — the geometric bucket ladder
        makes the smaller bucket a previously-compiled size, so the
        recompile is a persistent-cache hit."""
        needs = np.asarray(needs, np.int64)
        target = np.where(
            needs > 0,
            -(-(needs * headroom).astype(np.int64) // _ST) + 1,
            0,
        )
        target = np.minimum(target, self.row_tiles[None, :])
        t_new = np.where(
            needs == 0,
            0,
            np.where(self.blk_t > target + slack, target, self.blk_t),
        )
        if np.array_equal(t_new, self.blk_t):
            return None
        # >= 2 ladder rungs oversized -> re-bucket down (cache-hit compile)
        oversized = _bucket_size(int(t_new.sum()), 1.6) * 4 <= self.w_pad
        return self._with_blk_t(t_new, keep_bucket=not oversized)

    def _with_blk_t(
        self, blk_t: np.ndarray, keep_bucket: bool = True
    ) -> "SpanIndex":
        """Same row skeleton, new per-(block, row) window widths:
        reassemble the static work-tile list.  With ``keep_bucket`` the
        current w_pad bucket is kept when the new list fits, so the
        regrown index reuses every compiled executable; presize passes
        False to drop an oversized construction-time bucket (recompiles
        are free before the first compile)."""
        from dataclasses import replace

        blk_t = np.asarray(blk_t, np.int64)
        # a regrow that outgrew its bucket is a MID-RUN event (needs are a
        # moving target): take extra bucket headroom so the next growth
        # stays a zero-recompile table swap — padding tiles are ~free,
        # a step recompile costs ~40s+
        wt = _assemble_work_tiles(
            self.nb, self.num_rows, blk_t, self.row_pad_off,
            pad_to=self.w_pad if keep_bucket else None,
            headroom=2.0 if keep_bucket else 1.6,
        )
        return replace(
            self,
            blk_t=blk_t.astype(np.int32),
            w=wt[0],
            wt_qblk=wt[1],
            wt_pair=wt[2],
            wt_off=wt[3],
            wt_first=wt[4],
        )

    @staticmethod
    def build(
        weights: np.ndarray,
        opts,
        edge_src: np.ndarray,
        edge_dst: np.ndarray,
        span_scale: float = 1.0,
    ) -> "SpanIndex":
        n = int(weights.shape[0])
        d = int(opts.embedding_dimension)
        L = float(opts.edge_length)
        group_of, group_sizes, bmaxpow, class_bm2, b = _merge_weight_groups(
            weights, opts
        )

        # ---- split each group into equal-population ROWS (first-axis
        # rank bins).  Row population ~ sqrt(_Q * group_size) rounded to
        # a 512 multiple (tile/block alignment) minimizes per-block swept
        # members for uniform density; the last row of a group takes the
        # remainder.  d == 1 has no second axis — one row per group
        # reproduces the r03 single-level behavior exactly.
        row_group_l, row_sizes_l = [], []
        for g in range(b):
            sz = int(group_sizes[g])
            if d >= 2 and sz > 1024:
                pop = _round_up(max(512, int(np.sqrt(_Q * sz))), 512)
            else:
                pop = _round_up(max(sz, 1), 512)
            k = max(1, _cdiv(sz, pop))
            for r in range(k):
                row_group_l.append(g)
                row_sizes_l.append(pop if r < k - 1 else sz - (k - 1) * pop)
        rr = len(row_sizes_l)
        row_group = np.asarray(row_group_l, np.int32)
        row_sizes = np.asarray(row_sizes_l, np.int64)
        row_moff = np.concatenate([[0], np.cumsum(row_sizes)[:-1]])
        row_tiles = np.maximum(1, -(-row_sizes // _ST))
        row_pad_off = np.concatenate([[0], np.cumsum(row_tiles * _ST)[:-1]])
        q_blocks = np.maximum(1, -(-row_sizes // _Q))
        row_qoff = np.concatenate([[0], np.cumsum(q_blocks * _Q)[:-1]])
        nb = int(np.sum(q_blocks))
        blk_row = np.repeat(np.arange(rr, dtype=np.int32), q_blocks)

        # ---- initial per-(block, row) window sizing: the r03 per-group
        # heuristic (expected block overlap + base window + conservative-
        # radius fraction of the target) applied at row granularity.  It
        # knows nothing about first-axis row pruning, so it OVER-provisions
        # by ~the row count; the presize protocol immediately resizes to
        # measured needs (and re-buckets), so only direct-build users pay.
        spread = max(float(n) ** (1.0 / d), 1e-9)
        qg = row_group[blk_row]  # (NB,)
        frac = np.minimum(
            1.0,
            2.0 * L * bmaxpow[qg][:, None].astype(np.float64)
            * bmaxpow[row_group][None, :].astype(np.float64) / spread,
        )
        s_target = span_scale * (
            3.0 * _Q * row_sizes[None, :] / max(n, 1)
            + opts.window_capacity
            + frac * row_sizes[None, :]
        )
        blk_t = np.minimum(
            np.maximum(1, -(-np.ceil(s_target).astype(np.int64) // _ST)),
            row_tiles[None, :],
        )

        # ---- static work-tile tables
        w, wt_qblk, wt_pair, wt_off, wt_first = _assemble_work_tiles(
            nb, rr, blk_t, row_pad_off
        )

        # channel count: [pos(d), invw, Lwpow|colorpad, bmaxpow, ...] and the
        # output needs d + 4 channels — both padded to a multiple of 8
        c = _round_up(max(d + 4, 8), 8)

        # ---- directed-edge correction tables (shared helper)
        esrc_p, edst_p, emask, edge_bmaxpow, edge_row_ptr = (
            _edge_correction_tables(n, edge_src, edge_dst, class_bm2)
        )

        row_of_sorted = np.repeat(
            np.arange(rr, dtype=np.int32), row_sizes
        )
        sorted_moff = np.repeat(row_moff, row_sizes).astype(np.int32)
        sorted_shift_pad = np.repeat(
            row_pad_off - row_moff, row_sizes
        ).astype(np.int32)
        sorted_shift_q = np.repeat(
            row_qoff - row_moff, row_sizes
        ).astype(np.int32)
        npa = int(row_pad_off[-1] + row_tiles[-1] * _ST)
        nq = (nb + 1) * _Q
        bmaxpow_padded = np.zeros(npa, np.float32)
        src_of_pad = np.full(npa, n, np.int64)
        src_of_q = np.full(nq, n, np.int64)
        blk_first_l, blk_last_l = [], []
        for r in range(rr):
            o, sz = int(row_moff[r]), int(row_sizes[r])
            po, qo = int(row_pad_off[r]), int(row_qoff[r])
            bmaxpow_padded[po : po + sz] = bmaxpow[row_group[r]]
            src_of_pad[po : po + sz] = np.arange(o, o + sz)
            src_of_q[qo : qo + sz] = np.arange(o, o + sz)
            for li in range(_cdiv(sz, _Q)):
                blk_first_l.append(o + li * _Q)
                blk_last_l.append(o + min((li + 1) * _Q, sz) - 1)
        assert len(blk_first_l) == nb

        return SpanIndex(
            n=n,
            d=d,
            num_channels=c,
            num_groups=b,
            num_rows=rr,
            nb=nb,
            w=w,
            row_group=row_group,
            row_sizes=row_sizes,
            row_moff=row_moff.astype(np.int64),
            row_qoff=row_qoff.astype(np.int64),
            row_pad_off=row_pad_off.astype(np.int64),
            row_tiles=row_tiles.astype(np.int64),
            bmaxpow=bmaxpow,
            group_of=group_of,
            class_bm2=class_bm2,
            row_of_sorted=row_of_sorted,
            sorted_moff=sorted_moff,
            sorted_shift_pad=sorted_shift_pad,
            sorted_shift_q=sorted_shift_q,
            src_of_pad=src_of_pad,
            src_of_q=src_of_q,
            blk_first=np.asarray(blk_first_l, np.int32),
            blk_last=np.asarray(blk_last_l, np.int32),
            bmaxpow_padded=bmaxpow_padded,
            wt_qblk=wt_qblk,
            wt_pair=wt_pair,
            wt_off=wt_off,
            wt_first=wt_first,
            blk_t=blk_t.astype(np.int32),
            blk_row=blk_row,
            edge_src=esrc_p,
            edge_dst=edst_p,
            edge_mask=emask,
            # correction radius factor: per-CLASS max of the dst, matching
            # the kernel's count channel (reference WeightedIndex.cpp:65-81)
            edge_bmaxpow=edge_bmaxpow,
            edge_row_ptr=edge_row_ptr,
            span_scale=float(span_scale),
        )


def gather_rows_transposed(values, indices, chunk: int = 1 << 19):
    """``values[indices].T`` without the padded-intermediate blowup.

    A direct row gather materializes (M, C) with XLA's (8, 128) tiling —
    the C-channel minor dim pads to 128 lanes, a 14-16x memory expansion
    that OOM'd the d4 full run at M = 33M (16 GB for 1.1 GB of data).
    Gathering in bounded chunks and writing each chunk TRANSPOSED into
    the (C, M) output caps the padded transient at chunk x 128 lanes
    (~256 MB at the default chunk) while the output stays unpadded
    (minor dim M)."""
    m = indices.shape[0]
    c = values.shape[1]
    if m <= chunk:
        return values[indices].T
    nch = _cdiv(m, chunk)
    pad = nch * chunk - m
    idx_p = jnp.concatenate(
        [indices, jnp.full((pad,), values.shape[0] - 1, indices.dtype)]
    )

    def body(i, out):
        rows = values[lax.dynamic_slice_in_dim(idx_p, i * chunk, chunk)]
        return lax.dynamic_update_slice(out, rows.T, (0, i * chunk))

    out = lax.fori_loop(
        0, nch, body, jnp.zeros((c, nch * chunk), values.dtype)
    )
    return out[:, :m]


def _host_axes2(positions: np.ndarray, d: int):
    """Numpy f32 mirror of candidates._principal_axes2 — the host MUST
    track the device's axes as closely as possible: with near-equal top
    eigenvalues (isotropic clouds, common at d >= 3) the power iterate
    converges slowly and precision differences compound into materially
    different axes — an f64 host axis once measured needs along a
    different projection than the device scans, starving windows the
    host believed covered."""
    pos32 = np.asarray(positions, np.float32)
    centered32 = pos32 - pos32.mean(axis=0)
    cov = (centered32.T @ centered32).astype(np.float32)

    def piter(c):
        v = (np.full((d,), 1.0) + np.arange(d) * 1e-3).astype(np.float32)
        v /= np.linalg.norm(v)
        for _ in range(12):
            w2 = c @ v
            nv = np.linalg.norm(w2)
            if nv > 0:
                v = (w2 / nv).astype(np.float32)
        return v

    v1 = piter(cov)
    lam = np.float32(v1 @ (cov @ v1))
    v2 = piter((cov - lam * np.outer(v1, v1)).astype(np.float32))
    v2 = (v2 - np.float32(v2 @ v1) * v1).astype(np.float32)
    nv = np.linalg.norm(v2)
    if nv > 1e-12:
        v2 = (v2 / nv).astype(np.float32)
    return v1, v2


def measure_needs_host(
    positions: np.ndarray, weights: np.ndarray, idx: SpanIndex, opts
) -> tuple[np.ndarray, int]:
    """Host-side (numpy) window-need measurement: the (NB, R) searchsorted
    member counts and total overflow that ``build_span_structures`` would
    report for these positions, WITHOUT touching the device.

    Used by the presize/growth protocols, which run on host-resident
    positions anyway — the eager device version cost ~80s of one-time
    remote compiles per source revision (the dominant embedder-build
    cost at 100K vertices) for what is an O(n log n) numpy job.  The
    projection axes are an independent power iteration, so needs can
    differ from the device's by a handful of members near window edges;
    the growth headroom absorbs this, and the in-step overflow counter
    remains the ground truth."""
    n, d = positions.shape
    pos = np.asarray(positions, np.float64)
    w = np.asarray(weights, np.float64)
    L = float(opts.edge_length)
    rr, nb = idx.num_rows, idx.nb

    v1, v2 = _host_axes2(pos, d)
    centered = pos - pos.mean(axis=0)
    y = centered @ v1.astype(np.float64)
    x = centered @ v2.astype(np.float64) if d >= 2 else y

    group = idx.group_of
    order1 = np.lexsort((y, group))
    x_s1 = x[order1]
    order = order1[np.lexsort((x_s1, idx.row_of_sorted))]
    x_s = x[order]
    y_ord = y[order]
    y_s1 = y[order1]
    lw_s = (L * np.power(w, 1.0 / d))[order]

    # per-block second-axis extrema (blocks are contiguous _Q chunks of
    # each row's x-sorted members — same layout as the kernel), max lw,
    # and first-axis extrema (y is NOT sorted within a block)
    firsts = idx.blk_first
    lasts = idx.blk_last
    minx = x_s[firsts]
    maxx = x_s[lasts]
    maxlw = np.empty(nb)
    ymin_blk = np.empty(nb)
    ymax_blk = np.empty(nb)
    for bi in range(nb):
        sl = slice(int(firsts[bi]), int(lasts[bi]) + 1)
        maxlw[bi] = lw_s[sl].max()
        ymin_blk[bi] = y_ord[sl].min()
        ymax_blk[bi] = y_ord[sl].max()

    # row first-axis intervals: rows are contiguous rank ranges of the
    # y-sorted order, so their extrema sit at static rank boundaries
    row_ymin = y_s1[idx.row_moff]
    row_ymax = y_s1[idx.row_moff + idx.row_sizes - 1]

    bmax_row = idx.bmaxpow[idx.row_group]
    reach = maxlw[:, None] * bmax_row[None, :]  # (NB, R)
    overlap = (ymin_blk[:, None] - reach <= row_ymax[None, :]) & (
        ymax_blk[:, None] + reach >= row_ymin[None, :]
    )
    lo = minx[:, None] - reach
    hi = maxx[:, None] + reach
    start = np.empty((nb, rr), np.int64)
    stop = np.empty((nb, rr), np.int64)
    for r in range(rr):
        o, sz = int(idx.row_moff[r]), int(idx.row_sizes[r])
        seg = x_s[o : o + sz]
        start[:, r] = np.searchsorted(seg, lo[:, r], side="left")
        stop[:, r] = np.searchsorted(seg, hi[:, r], side="right")
    start = np.where(overlap, start, 0)
    stop = np.where(overlap, stop, 0)
    # ALIGNED need: members from the tile-aligned window start — sizing
    # by ceil(need/_ST) tiles then GUARANTEES coverage at start_tile =
    # floor(start/_ST) (the un-aligned count needed a +1 margin tile per
    # window for worst-case alignment: ~5.8K pure-waste tiles at 100K).
    # Empty windows (start == stop) must report 0, not start's offset.
    need = np.where(stop > start, stop - (start // _ST) * _ST, 0)

    t_blk = idx.blk_t.astype(np.int64)
    tiles = idx.row_tiles[None, :].astype(np.int64)
    start_tile = np.clip(
        np.minimum(-(-stop // _ST) - t_blk, start // _ST), 0, tiles - t_blk
    )
    cov_end = (start_tile + t_blk) * _ST
    overflow = int(
        np.maximum(np.minimum(stop - cov_end, stop - start), 0).sum()
    )
    return need.astype(np.int64), overflow


# ----------------------------------------------------- per-step structures


class SpanTables(NamedTuple):
    """Growth-dependent window tables as TRACED device arrays (see
    SpanIndex.device_tables)."""

    wt_qblk: jax.Array  # (W_pad,) i32, nb marks a padding tile
    wt_pair: jax.Array  # (W_pad,) i32
    wt_off: jax.Array  # (W_pad,) i32
    wt_first: jax.Array  # (W_pad,) i32
    blk_t: jax.Array  # (NB, B) i32


class EdgeChunk(NamedTuple):
    """One device's slice of the directed correction-edge tables — the
    memory-scalable alternative to baking the full O(E) tables into every
    device's program.  Built host-side by ``build_edge_chunks`` as
    (P, E_dev) stacked arrays, device_put with row sharding, and unwrapped
    to (E_dev,) slices inside shard_map.  All members are STATIC (window
    coverage is derived in-trace from the traced blk_t tables)."""

    src: jax.Array  # (E_dev,) i32
    dst: jax.Array  # (E_dev,) i32
    mask: jax.Array  # (E_dev,) bool
    bmaxpow: jax.Array  # (E_dev,) f32


def build_edge_chunks(idx: SpanIndex, num_shards: int):
    """(P, E_dev) stacked numpy edge tables for sharded device_put —
    chunk p covers global edge rows [p*E_dev, (p+1)*E_dev), tail-padded
    by repeating the last edge row masked out (keeps chunks src-sorted,
    mirroring the in-trace slicing path)."""
    e_full = int(idx.edge_src.shape[0])
    e_dev = -(-e_full // num_shards)

    def stack(a):
        a = np.asarray(a)
        pad = num_shards * e_dev - e_full
        tail = np.repeat(a[-1:], pad, axis=0)
        return np.concatenate([a, tail]).reshape(num_shards, e_dev)

    mask = np.concatenate(
        [idx.edge_mask, np.zeros(num_shards * e_dev - e_full, bool)]
    ).reshape(num_shards, e_dev)
    return EdgeChunk(
        src=stack(idx.edge_src),
        dst=stack(idx.edge_dst),
        mask=mask,
        bmaxpow=stack(idx.edge_bmaxpow),
    )


class SpanStructures(NamedTuple):
    """Per-iteration sorted structures consumed by the kernel — the output
    of the index REBUILD phase (the reference's updateIndex + SnnModel
    constructor: projection + sort, NewWEmbedEmbedder.cpp:258-286,
    snn.cpp:97-147)."""

    qdata: jax.Array  # (NB, _Q, C) f32
    qcol: jax.Array  # (NB, _Q, 1) i32
    sdata: jax.Array  # (C, NPA) f32
    scol: jax.Array  # (1, NPA) i32
    stile: jax.Array  # (W,) i32 — global span tile per work tile
    start_tile: jax.Array  # (NB, R) i32 — local window start tiles
    q_ids: jax.Array  # (NQ,) i32 — vertex per query slot, sentinel n
    rank_of: jax.Array  # (n,) i32 — local sorted rank within own row
    block_of: jax.Array  # (n,) i32 — query block per vertex
    slot_of: jax.Array  # (n,) i32 — query SLOT per vertex (inverse q_ids)
    row_of: jax.Array  # (n,) i32 — row of each vertex (dynamic per step)
    lwpow: jax.Array  # (n,) f32 — L * w^(1/d)
    overflow: jax.Array  # i32 scalar — candidates beyond the tile windows
    need: jax.Array  # (NB, R) i32 — window members needed per (block, row)
    # RESIDENT mode (halo backend, opts.halo_resident_structures): the
    # per-device kernel inputs shrink to this device's 1/P block range —
    # qdata/qcol are (NB_dev+1, _Q, C) local slices (last local block =
    # this device's own sentinel/dummy), and sdata/scol carry the
    # UNGATHERED sorted value matrix (n+1, C) / (1, n+1) from which
    # span_query assembles a per-work-tile compact buffer
    # (C, W_dev*_ST).  resident_b0 is this device's global block offset.
    resident_b0: jax.Array | None = None


def build_span_structures(
    positions: jax.Array,
    inv_w: jax.Array,
    weights: jax.Array,
    colors: jax.Array,
    idx: SpanIndex,
    opts,
    tables: "SpanTables | None" = None,
    shard: tuple[str, int] | None = None,
    resident_blocks: int | None = None,
) -> SpanStructures:
    """Two-level sort: bin every group's members into equal-population
    rows by FIRST-principal-axis rank, sort each row by the SECOND axis;
    derive the dynamic per-(block, row) windows from conservative bounds
    in BOTH axes (rows beyond the first-axis reach get empty windows).

    ``tables`` supplies the growth-dependent window tables as traced
    arrays (default: this index's own, baked as constants).

    Compile-friendly by construction: ONE matrix scatter per side (not one
    per channel), per-block extrema read by STATIC gather indices or one
    masked reshape reduction, and all 2·NB·R window bounds located by a
    single vectorized branchless binary search (a 14-searchsorted-HLO
    version of this function took >10min to compile on the TPU compile
    service).

    With ``shard=(axis_name, P)`` (inside shard_map, replicated inputs)
    the REBUILD WORK is partitioned across the mesh: each device runs
    the padded-layout gathers, the window binary search, and the
    inverse-map scatter on a 1/P chunk, and one tiled ``all_gather`` /
    ``psum`` per structure reassembles the full (replicated) result —
    bitwise identical to the unsharded build, at O(n·C/P) gather compute
    per device (the r03 halo backend replicated this whole O(n·C) build
    on every device; VERDICT r3 item 7).  The sorts stay replicated —
    measured at ~1% of the build (4.5ms of 169ms at 1M vertices), a
    distributed sample-sort is not worth its complexity."""
    from ..core.candidates import _principal_axes2

    n, d = positions.shape
    f32 = jnp.float32
    positions = positions.astype(f32)
    rr, nb = idx.num_rows, idx.nb
    c = idx.num_channels
    npa, nq = idx.npa, idx.nq
    L = float(opts.edge_length)

    def sharded_rows(fn, m):
        """Evaluate ``fn(offsets) -> rows`` over [0, m) in per-device
        contiguous chunks and reassemble with one tiled all_gather —
        bitwise identical to ``fn(arange(m))`` (clamped tail duplicates
        land past row m and are sliced off)."""
        if shard is None:
            return fn(jnp.arange(m))
        axis_name, num_shards = shard
        per = -(-m // num_shards)
        offs = lax.axis_index(axis_name) * per + jnp.arange(per)
        part = fn(jnp.minimum(offs, m - 1))
        full = lax.all_gather(part, axis_name, tiled=True)
        return full[:m]

    centered = positions - jnp.mean(positions, axis=0)
    v1, v2 = _principal_axes2(centered)
    y = centered @ v1  # (n,) binning axis
    # d == 1 has no second axis: search on the projection itself (the
    # r03 single-level behavior; rows are whole groups there)
    x = (centered @ v2) if d >= 2 else y

    group = jnp.asarray(idx.group_of)
    # sort 1: (group, y) — establishes each vertex's first-axis rank,
    # hence its ROW (a static function of that rank).  sort 2: (row, x)
    # — expressed as a permutation COMPOSITION so no inverse scatter is
    # needed: row_of_sorted is a static constant over sort-1 positions.
    order1 = jnp.lexsort((y, group))
    x_s1 = x[order1]
    row_static = jnp.asarray(idx.row_of_sorted)
    order = order1[jnp.lexsort((x_s1, row_static))]

    lwpow = (L * jnp.power(weights.astype(f32), f32(1.0 / d))).astype(f32)
    # ONE packed gather for every per-vertex channel the build reads in
    # sorted order (TPU gathers are row-LATENCY-bound: eight separate
    # n-row gathers cost ~8x one wide gather regardless of row width);
    # integer channels ride as exact f32 bitcasts
    vmat = jnp.concatenate(
        [
            positions,  # [:d]
            inv_w.astype(f32)[:, None],  # d
            lwpow[:, None],  # d+1
            lax.bitcast_convert_type(colors.astype(jnp.int32), f32)[
                :, None
            ],  # d+2
            x[:, None],  # d+3
            y[:, None],  # d+4
            jnp.asarray(idx.class_bm2)[:, None],  # d+5
        ],
        axis=1,
    )
    vs = vmat[order]
    pos_s = vs[:, :d]
    invw_s = vs[:, d]
    lwpow_s = vs[:, d + 1]
    col_s = lax.bitcast_convert_type(vs[:, d + 2], jnp.int32)
    x_s = vs[:, d + 3]
    y_ord = vs[:, d + 4]
    bm2_s = vs[:, d + 5]

    j = jnp.arange(n, dtype=jnp.int32)
    q_idx = j + jnp.asarray(idx.sorted_shift_q)

    # ---- padded layouts via GATHER, never scatter: XLA-TPU scatter (and
    # especially column-sliced scatter) serializes to ~ms-per-100K-rows,
    # while row gathers stream at HBM speed.  Both padded sides read
    # through a STATIC (padded slot -> sorted position) map whose padding
    # slots point at a sentinel row appended to the value matrix.
    src_of_pad = idx.src_of_pad
    src_of_q = idx.src_of_q

    # ---- span-side padded rows (C, NPA):
    # [pos(d), invw, classmax^(2/d), ones, rawexp] — the radius factor
    # SQUARED so the kernel's radius test is one multiply; the ones row
    # turns the MXU reduction dot into the rowsum; rawexp = 1/invw so
    # L/ws is a product.  The radius channel carries each member's
    # per-DOUBLING-CLASS max (not the merged group's), so the counted
    # candidate set matches the reference's per-class radius queries
    # (WeightedIndex.cpp:65-81); it rides the same dynamic gather as the
    # positions (class membership is static per vertex, not per slot).
    sent_s = np.zeros((1, c), np.float32)
    sent_s[0, :d] = _S_SENTINEL
    sent_s[0, d] = 1.0
    svals = jnp.concatenate(
        [
            pos_s,
            invw_s[:, None],
            bm2_s[:, None],
            jnp.ones((n, 1), f32),
            (1.0 / invw_s)[:, None],
            jnp.zeros((n, c - (d + 4)), f32),
        ],
        axis=1,
    )
    svals_ext = jnp.concatenate([svals, jnp.asarray(sent_s)], axis=0)
    col_ext = jnp.concatenate([col_s, jnp.asarray([-3], jnp.int32)])
    if resident_blocks is None:
        # color rides the value gather as a bitcast channel: NPA-row
        # gathers are latency-bound, so a separate scol gather doubled
        # this phase's cost for 4 bytes/row
        src_pad = jnp.asarray(src_of_pad)
        sc_ext = jnp.concatenate(
            [svals_ext, lax.bitcast_convert_type(col_ext, f32)[:, None]],
            axis=1,
        )
        packed_s = sharded_rows(lambda o: sc_ext[src_pad[o]], npa)
        sdata = packed_s[:, :c].T
        scol = lax.bitcast_convert_type(packed_s[:, c], jnp.int32)[None, :]
    else:
        # RESIDENT mode: no global padded span layout — span_query
        # gathers each device's compact (C, W_dev*_ST) buffer from the
        # raw sorted values (the O(n*C) matrix stays a build transient;
        # the sweep-resident buffers are O(work/P))
        sdata = svals_ext
        scol = col_ext[None, :]

    # ---- query-side blocks (NB, _Q, C): [pos(d), invw, (L*w^(1/d))^2, rawexp]
    sent_q = np.zeros((1, c), np.float32)
    sent_q[0, :d] = _Q_SENTINEL
    sent_q[0, d] = 1.0
    qvals = jnp.concatenate(
        [
            pos_s,
            invw_s[:, None],
            jnp.square(lwpow_s)[:, None],
            (1.0 / invw_s)[:, None],
            jnp.zeros((n, c - (d + 3)), f32),
        ],
        axis=1,
    )
    qvals_ext = jnp.concatenate([qvals, jnp.asarray(sent_q)], axis=0)
    src_q = jnp.asarray(src_of_q)
    # auxiliary per-slot channels [color, vertex id, L*w^(1/d), first-axis
    # y], integer channels as BITCAST f32 (exact transport) — built here
    # so the replicated path can fuse them into ONE packed gather with
    # qdata below (TPU gathers are row-latency-bound: two separate NQ-row
    # gathers cost 2x one regardless of row width)
    aux = jnp.stack(
        [
            lax.bitcast_convert_type(
                jnp.concatenate([col_s, jnp.asarray([-2], jnp.int32)]), f32
            ),
            lax.bitcast_convert_type(
                jnp.concatenate(
                    [order.astype(jnp.int32), jnp.asarray([n], jnp.int32)]
                ),
                f32,
            ),
            jnp.concatenate([lwpow_s, jnp.zeros((1,), f32)]),
            jnp.concatenate([y_ord, jnp.zeros((1,), f32)]),
        ],
        axis=1,
    )  # (n+1, 4)
    if resident_blocks is None:
        qa_ext = jnp.concatenate([qvals_ext, aux], axis=1)  # (n+1, c+4)
        packed_q = sharded_rows(lambda o: qa_ext[src_q[o]], nq)
        qdata = packed_q[:, :c].reshape(nb + 1, _Q, c)
        aux_q = packed_q[:, c:]
        resident_b0 = None
    else:
        # RESIDENT mode: this device's contiguous block range only, plus
        # one local sentinel/dummy block for skipped tiles
        assert shard is not None
        axis_name, num_shards = shard
        nb_dev = resident_blocks
        resident_b0 = lax.axis_index(axis_name) * nb_dev
        offs = resident_b0 * _Q + jnp.arange(nb_dev * _Q, dtype=jnp.int32)
        in_nq = offs < nq
        rows = qvals_ext[
            jnp.where(in_nq, src_q[jnp.minimum(offs, nq - 1)], n)
        ]
        sentinel_blk = jnp.broadcast_to(
            jnp.asarray(sent_q, jnp.float32), (_Q, c)
        )
        qdata = jnp.concatenate([rows, sentinel_blk], axis=0).reshape(
            nb_dev + 1, _Q, c
        )
    if resident_blocks is not None:
        # resident mode keeps aux global (window bounds need every
        # block's extrema) while qdata stayed a local slice above
        aux_q = sharded_rows(lambda o: aux[src_q[o]], nq)
    qcol_full = lax.bitcast_convert_type(aux_q[:, 0], jnp.int32)
    if resident_blocks is None:
        qcol = qcol_full.reshape(nb + 1, _Q, 1)
    else:
        local = lax.dynamic_slice_in_dim(
            jnp.concatenate(
                [qcol_full, jnp.full((resident_blocks * _Q,), -2, jnp.int32)]
            ),
            resident_b0 * _Q,
            resident_blocks * _Q,
        )
        qcol = jnp.concatenate(
            [local, jnp.full((_Q,), -2, jnp.int32)]
        ).reshape(resident_blocks + 1, _Q, 1)
    q_ids = lax.bitcast_convert_type(aux_q[:, 1], jnp.int32)

    # ---- per-block conservative windows in BOTH axes -> dynamic start
    # tiles.  A block is a CONTIGUOUS rank range of its row, so its
    # second-axis extrema are x_s at static first/last-rank indices; its
    # first-axis extrema need a masked reduction (y is not sorted within
    # a block).  Row first-axis intervals sit at static rank boundaries
    # of the y-sorted order.
    minx = x_s[jnp.asarray(idx.blk_first)]  # (NB,)
    maxx = x_s[jnp.asarray(idx.blk_last)]
    maxlw = jnp.max(aux_q[:, 2].reshape(nb + 1, _Q)[:nb], axis=1)
    qmask = (q_ids < n).reshape(nb + 1, _Q)[:nb]
    y_q = aux_q[:, 3].reshape(nb + 1, _Q)[:nb]
    big = f32(np.float32(np.finfo(np.float32).max))
    ymin_blk = jnp.min(jnp.where(qmask, y_q, big), axis=1)
    ymax_blk = jnp.max(jnp.where(qmask, y_q, -big), axis=1)

    # row first-axis extrema sit at STATIC rank boundaries of the
    # y-sorted order: compose the tiny (R,) gathers through order1
    # instead of materializing the full y[order1] n-row gather
    r_lo = jnp.asarray(idx.row_moff.astype(np.int64))
    r_hi = jnp.asarray((idx.row_moff + idx.row_sizes - 1).astype(np.int64))
    row_ymin = y[order1[r_lo]]
    row_ymax = y[order1[r_hi]]

    bmax_row = jnp.asarray(idx.bmaxpow[idx.row_group])  # (R,)
    reach = maxlw[:, None] * bmax_row[None, :]  # (NB, R)
    overlap = (ymin_blk[:, None] - reach <= row_ymax[None, :]) & (
        ymax_blk[:, None] + reach >= row_ymin[None, :]
    )
    lo = minx[:, None] - reach
    hi = maxx[:, None] + reach

    # one branchless binary search for all 2*NB*R bounds at once, each
    # search confined to its target row's sorted rank range
    moff = jnp.asarray(idx.row_moff.astype(np.int32))[None, :]  # (1, R)
    mend = jnp.asarray(
        (idx.row_moff + idx.row_sizes).astype(np.int32)
    )[None, :]
    max_sz = int(np.max(idx.row_sizes))

    def bsearch(value, right: bool):
        lo_i = jnp.broadcast_to(moff, value.shape)
        hi_i = jnp.broadcast_to(mend, value.shape)

        def body(_, carry):
            lo_i, hi_i = carry
            active = lo_i < hi_i
            mid = (lo_i + hi_i) // 2
            v = x_s[jnp.minimum(mid, n - 1)]
            pred = (v <= value) if right else (v < value)
            lo_i = jnp.where(active & pred, mid + 1, lo_i)
            hi_i = jnp.where(active & ~pred, mid, hi_i)
            return lo_i, hi_i

        lo_i, _ = lax.fori_loop(
            0, max_sz.bit_length() + 1, body, (lo_i, hi_i)
        )
        return lo_i - moff

    zero32 = jnp.asarray(0, jnp.int32)

    def windows_chunk(o):
        # both bounds for a chunk of query blocks (sharded_rows chunks
        # the NB axis; the fori_loop work then scales 1/P per device)
        s = jnp.where(
            overlap[o], bsearch(lo[o], right=False).astype(jnp.int32), zero32
        )
        e = jnp.where(
            overlap[o], bsearch(hi[o], right=True).astype(jnp.int32), zero32
        )
        return jnp.stack([s, e], axis=1)  # (chunk, 2, R)

    bounds = sharded_rows(windows_chunk, nb)
    start, stop = bounds[:, 0], bounds[:, 1]  # (NB, R) local ranks

    if tables is None:
        tables = idx.device_tables()
    t_blk = tables.blk_t  # (NB, R) traced
    tiles = jnp.asarray(idx.row_tiles.astype(np.int32))[None, :]
    # slide the T-tile window to cover [start, stop) when possible: prefer
    # ending at ceil(stop/ST), never starting after floor(start/ST), clamp
    # into the row
    start_tile = jnp.clip(
        jnp.minimum(-(-stop // _ST) - t_blk, start // _ST),
        0,
        tiles - t_blk,
    ).astype(jnp.int32)
    cov_end = (start_tile + t_blk) * _ST
    # bound per-pair overflow by the real need (stop - start): a pair shrunk
    # to 0 tiles with zero members in range must not report its rank offset
    # (stop mod _ST) as phantom overflow — that would spuriously exit the
    # device loop and waste one of the capped growth events
    overflow = jnp.sum(
        jnp.maximum(jnp.minimum(stop - cov_end, stop - start), 0),
        dtype=jnp.int32,
    )

    stile = (
        start_tile.reshape(-1)[tables.wt_pair] + tables.wt_off
    ).astype(jnp.int32)

    # ONE wide scatter builds all four inverse maps (XLA-TPU scatter cost
    # is per ROW, so separate (n,) scatters cost proportionally more):
    # row-local sorted rank, query block, query SLOT, and ROW of each
    # vertex — the slot map lets the accumulator unsort kernel outputs by
    # GATHER instead of an (NQ, d) scatter-add; the row map feeds the
    # edge-correction coverage lookup (row membership is dynamic under
    # two-level binning).  ``order`` is a permutation, hence unique.
    # Sharded: each device scatters its chunk of sorted ranks into zeros
    # (duplicate clamped tail rows masked to the all-zero row n) and one
    # psum merges the disjoint partials.
    inv_vals = jnp.stack(
        [
            j - jnp.asarray(idx.sorted_moff),
            q_idx // _Q,
            q_idx,
            jnp.asarray(idx.row_of_sorted),
        ],
        axis=1,
    )

    if shard is None:
        inv = (
            jnp.zeros((n, 4), jnp.int32)
            .at[order]
            .set(inv_vals, unique_indices=True, mode="promise_in_bounds")
        )
    else:
        axis_name, num_shards = shard
        per = -(-n // num_shards)
        offs = lax.axis_index(axis_name) * per + jnp.arange(per)
        valid = offs < n
        o = jnp.minimum(offs, n - 1)
        tgt = jnp.where(valid, order[o], n)  # spill row for clamped dups
        part = (
            jnp.zeros((n + 1, 4), jnp.int32)
            .at[tgt]
            .set(inv_vals[o], unique_indices=True, mode="promise_in_bounds")
        )
        inv = lax.psum(part, axis_name)[:n]

    return SpanStructures(
        qdata=qdata,
        qcol=qcol,
        sdata=sdata,
        scol=scol,
        stile=stile,
        start_tile=start_tile,
        q_ids=q_ids,
        rank_of=inv[:, 0],
        block_of=inv[:, 1],
        slot_of=inv[:, 2],
        row_of=inv[:, 3],
        lwpow=lwpow,
        overflow=overflow,
        need=jnp.where(
            stop > start, stop - (start // _ST) * _ST, 0
        ),  # aligned (see measure_needs_host)
        resident_b0=resident_b0,
    )


# ------------------------------------------------------------------ kernel


def _span_kernel(
    qblk_ref,  # scalar prefetch (W,) i32
    stile_ref,  # scalar prefetch (W,) i32
    first_ref,  # scalar prefetch (W,) i32
    qdata_ref,  # (1, _Q, C) f32
    qcol_ref,  # (1, _Q, 1) i32
    sdata_ref,  # (C, _ST) f32
    scol_ref,  # (1, _ST) i32
    out_ref,  # (1, _Q, C) f32, accumulated across a query block's tiles
    *,
    d: int,
    c: int,
    nb: int,
    L: float,
    rep_scale: float,
    additive: bool,
):
    w = pl.program_id(0)
    f32 = jnp.float32

    @pl.when(first_ref[w] == 1)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    # bucket-padding tiles (qblk == nb, the dummy block) skip all compute:
    # they only pay their DMA, so the padded grid is nearly free
    @pl.when(qblk_ref[w] < nb)
    def _compute():
        _span_tile_body(
            q=qdata_ref[0],
            s=sdata_ref[:],
            qcol=qcol_ref[0],
            scol=scol_ref[:],
            out_ref=out_ref,
            d=d,
            c=c,
            L=L,
            rep_scale=rep_scale,
            additive=additive,
        )


def _span_tile_body(*, q, s, qcol, scol, out_ref, d, c, L, rep_scale, additive):
    """One (_Q x _ST) work tile: q (_Q, C), s (C, _ST), colors alongside."""
    f32 = jnp.float32

    # dist^2 by per-dimension accumulation — full relative precision (the
    # gram form loses ~|p|^2*eps to cancellation, flipping dead zones)
    dist2 = jnp.zeros((_Q, _ST), f32)
    for k in range(d):
        diff_k = q[:, k : k + 1] - s[k : k + 1, :]
        dist2 += diff_k * diff_k

    # radius test with pre-squared channels: dist2 <= (L w_q^(1/d))^2 * bmax^(2/d)
    colorok = qcol != scol
    valid = (dist2 <= q[:, d + 1 : d + 2] * s[d + 1 : d + 2, :]) & colorok
    iw_q = q[:, d : d + 1]
    iw_s = s[d : d + 1, :]
    ws = (iw_q + iw_s) if additive else (iw_q * iw_s)

    posd = dist2 > f32(0.0)
    active = valid & (dist2 * (ws * ws) <= f32(L * L)) & posd

    # rsqrt + one Newton step recovers ~1ulp precision at a fraction of
    # the sqrt+divide cost (the summed losses are compared against the
    # dense oracle at 1e-4)
    inv = lax.rsqrt(jnp.maximum(dist2, f32(1e-30)))
    inv = inv * (f32(1.5) - f32(0.5) * dist2 * inv * inv)
    dist = dist2 * inv
    coeff = jnp.where(active, f32(rep_scale) * ws * inv, f32(0.0))

    # L/ws = L * rawexp_q * rawexp_s in the multiplicative default (one
    # multiply); additive weights keep the divide
    if additive:
        l_over_ws = f32(L) / ws
    else:
        l_over_ws = f32(L) * q[:, d + 2 : d + 3] * s[d + 3 : d + 4, :]
    lossel = jnp.where(active, l_over_ws - dist, f32(0.0))

    # ALL row reductions in one MXU dot: [coeff; lossel; valid; zero]
    # (4_Q, _ST) contracted with s (C, _ST) -> (4_Q, C).  The coeff rows
    # yield the weighted position accumulators on the pos channels and the
    # rowsum on the constant-ones channel; the other three only need the
    # ones channel.
    stack = jnp.concatenate(
        [
            coeff,
            lossel,
            valid.astype(f32),
            (valid & ~posd).astype(f32),
        ],
        axis=0,
    )
    dots = lax.dot_general(
        stack,
        s,
        (((1,), (1,)), ((), ())),
        preferred_element_type=f32,
    )  # (4_Q, C)
    ones_ch = d + 2
    acc = dots[:_Q]  # pos channels + rowsum
    cols = [
        acc[:, :d],
        acc[:, ones_ch : ones_ch + 1],
        dots[_Q : 2 * _Q, ones_ch : ones_ch + 1],
        dots[2 * _Q : 3 * _Q, ones_ch : ones_ch + 1],
        dots[3 * _Q : 4 * _Q, ones_ch : ones_ch + 1],
    ]
    if d + 4 < c:
        cols.append(jnp.zeros((_Q, c - (d + 4)), f32))
    out_ref[0] += jnp.concatenate(cols, axis=1)


def _shard_work_tiles(structures, idx, tables, shard):
    """Per-device slice of the work-tile list for shard_map execution.

    Returns (qblk, stile, first, grid_w): with ``shard=(axis_name, P)``
    each device takes a CONTIGUOUS chunk of ceil(W_pad/P) tiles — the
    chunk offset is ``lax.axis_index`` (traced), the chunk length is
    static, so all P devices compile the same pallas program.  Because
    the list is query-block-major, the per-chunk ``first`` flags are the
    block-change positions within the chunk (each device initializes its
    own output block on the chunk's first tile of that block; partial
    accumulators are psum'd by the caller).  Out-of-range slots become
    padding tiles (qblk == nb) that the kernel skips."""
    if shard is None:
        return tables.wt_qblk, structures.stile, tables.wt_first, idx.w_pad
    axis_name, num_shards = shard
    w_dev = -(-idx.w_pad // num_shards)
    sidx = lax.axis_index(axis_name)
    offs = sidx * w_dev + jnp.arange(w_dev, dtype=jnp.int32)
    in_range = offs < idx.w_pad
    cl = jnp.minimum(offs, idx.w_pad - 1)
    qblk = jnp.where(in_range, tables.wt_qblk[cl], idx.nb)
    stile = jnp.where(in_range, structures.stile[cl], 0)
    prev = jnp.concatenate([jnp.full((1,), -1, jnp.int32), qblk[:-1]])
    first = (qblk != prev).astype(jnp.int32)
    return qblk, stile, first, w_dev


# scalar-prefetch tables live in SMEM (~1MB on v5e): bound the per-call
# work-tile count so the tables stay well inside the budget; larger
# lists run as several calls of ONE compiled executable whose masked
# partial outputs are summed.  When the skeleton fits (qblk < 2^15,
# stile < 2^15 — up to ~8M vertices), the three per-tile values pack
# into ONE i32 [bit30: first | bits 15..29: qblk | bits 0..14: stile],
# tripling the per-call budget (fewer calls = fewer per-chunk
# (NB+1, Q, C) mask+sum passes, the dominant chunking cost at 1M).
_W_SMEM = 32768
_W_SMEM_PACKED = 98304


def _span_kernel_packed(
    packed_ref,  # scalar prefetch (W,) i32: first<<30 | qblk<<15 | stile
    qdata_ref,
    qcol_ref,
    sdata_ref,
    scol_ref,
    out_ref,
    *,
    d: int,
    c: int,
    nb: int,
    L: float,
    rep_scale: float,
    additive: bool,
):
    w = pl.program_id(0)
    word = packed_ref[w]

    @pl.when(((word >> 30) & 1) == 1)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(((word >> 15) & 0x7FFF) < nb)
    def _compute():
        _span_tile_body(
            q=qdata_ref[0],
            s=sdata_ref[:],
            qcol=qcol_ref[0],
            scol=scol_ref[:],
            out_ref=out_ref,
            d=d,
            c=c,
            L=L,
            rep_scale=rep_scale,
            additive=additive,
        )


def _resident_sweep(
    structures: SpanStructures,
    idx: SpanIndex,
    opts,
    tables: SpanTables,
    interpret: bool,
    shard: tuple[str, int],
    nb_dev: int,
):
    """RESIDENT-mode sweep (halo backend): this device owns the
    contiguous global block range [b0, b0 + nb_dev) and sweeps exactly
    those blocks' work tiles from a per-work-tile COMPACT span buffer
    (C, W_dev*_ST) gathered out of the raw sorted values — per-device
    sweep-resident bytes are O(n*C/P + work/P) instead of the replicated
    O(n*C).  Returns (out (nb_dev+1, _Q, C) local accumulators,
    partition_overflow): tiles beyond the static per-device budget
    W_dev = ceil(W_pad/P) are counted (in members) into the overflow
    channel — the growth protocol's bucket resize raises the budget.

    Trade-offs vs the replicated sweep (documented, not hidden): the
    equal-BLOCK partition balances queries, not tiles, so skewed window
    distributions can overflow the budget (surfaced, never silent); the
    compact gather re-pays ~W_dev*_ST row-latency per step; the sorts
    and the O(n*C) sorted-value matrix remain replicated build
    transients (a distributed sample-sort is the remaining follow-up)."""
    axis_name, num_shards = shard
    c, d = idx.num_channels, idx.d
    nb = idx.nb
    b0 = structures.resident_b0
    w_dev = _cdiv(idx.w_pad, num_shards)

    # this device's tile range: tiles are block-major, so the range is
    # the [T(b0), T(b1)) slice of the REAL (non-padding) tile list
    tb = jnp.sum(tables.blk_t, axis=1)  # (NB,) tiles per block
    ct = jnp.cumsum(tb)  # inclusive
    total = ct[nb - 1]
    t_at = lambda b: jnp.where(
        b > 0, ct[jnp.clip(b - 1, 0, nb - 1)], 0
    )  # exclusive cumsum with clamp
    t0 = jnp.where(b0 < nb, t_at(b0), total)
    b1 = jnp.minimum(b0 + nb_dev, nb)
    t1 = jnp.where(b1 < nb, t_at(b1), total)
    part_ovf = jnp.maximum(t1 - t0 - w_dev, 0) * _ST

    offs = t0 + jnp.arange(w_dev, dtype=jnp.int32)
    in_range = offs < t1
    cl = jnp.minimum(offs, idx.w_pad - 1)
    qblk_g = tables.wt_qblk[cl]
    qblk = jnp.where(
        in_range & (qblk_g < nb), qblk_g - b0, nb_dev
    ).astype(jnp.int32)
    stile_g = jnp.where(in_range, structures.stile[cl], 0)
    prev = jnp.concatenate([jnp.full((1,), -1, jnp.int32), qblk[:-1]])
    first = (qblk != prev).astype(jnp.int32)
    w_real = jnp.clip(t1 - t0, 0, w_dev)

    # compact span buffer: slot (t, k) reads padded-layout position
    # stile_g[t]*_ST + k through the static src_of_pad map into the raw
    # sorted values (svals_ext rides in structures.sdata in this mode)
    pad_idx = (
        stile_g[:, None] * _ST + jnp.arange(_ST, dtype=jnp.int32)[None, :]
    ).reshape(-1)
    pad_idx = jnp.where(
        jnp.repeat(in_range, _ST, total_repeat_length=w_dev * _ST),
        pad_idx,
        idx.npa - 1,
    )
    src = jnp.asarray(idx.src_of_pad)[jnp.clip(pad_idx, 0, idx.npa - 1)]
    svals_ext = structures.sdata  # (n+1, C) raw sorted values
    col_ext = structures.scol[0]  # (n+1,)
    sdata_c = gather_rows_transposed(svals_ext, src)  # (C, W_dev*_ST)
    scol_c = col_ext[src][None, :]

    out = sweep_work_tiles(
        structures.qdata,
        structures.qcol,
        sdata_c,
        scol_c,
        qblk,
        jnp.arange(w_dev, dtype=jnp.int32),  # compact tile t IS span tile t
        first,
        w_dev,
        w_real,
        nb_dev,
        c,
        d,
        opts,
        interpret,
    )
    return out, part_ovf


def span_query(
    structures: SpanStructures,
    idx: SpanIndex,
    opts,
    tables: "SpanTables | None" = None,
    interpret: bool = False,
    shard: tuple[str, int] | None = None,
):
    """Run the fused candidate sweep.  Returns per-query-slot channel
    accumulators (NB+1, _Q, C): [acc_pos(d), rowsum, loss, count, zero]
    (the last block is the bucket-padding dummy), with rows of blocks the
    sweep never visited zeroed.  With ``shard`` each device sweeps its
    chunk of the work-tile list (partial output)."""
    if tables is None:
        tables = idx.device_tables()
    c, d = idx.num_channels, idx.d
    qblk, stile, first, grid_w = _shard_work_tiles(
        structures, idx, tables, shard
    )
    w_real = jnp.sum(tables.blk_t, dtype=jnp.int32)  # real tiles, traced
    if shard is not None:
        axis_name, num_shards = shard
        w_dev = -(-idx.w_pad // num_shards)
        w_real = jnp.clip(
            w_real - lax.axis_index(axis_name) * w_dev, 0, w_dev
        )
    return sweep_work_tiles(
        structures.qdata,
        structures.qcol,
        structures.sdata,
        structures.scol,
        qblk,
        stile,
        first,
        grid_w,
        w_real,
        idx.nb,
        c,
        d,
        opts,
        interpret,
    )


def sweep_work_tiles(
    qdata,
    qcol,
    sdata,
    scol,
    qblk,
    stile,
    first,
    grid_w: int,
    w_real,
    nb: int,
    c: int,
    d: int,
    opts,
    interpret: bool,
):
    """The pallas sweep over an explicit work-tile list — the shared core
    of the windowed (``span_query``) and compacted (span_compact) paths.
    ``qblk``/``stile``/``first`` may be traced values; ``grid_w`` is the
    static list length and ``w_real`` the traced count of live tiles
    (chunks past it never execute)."""
    kernel_args = dict(
        d=d,
        c=c,
        nb=nb,
        L=float(opts.edge_length),
        rep_scale=float(opts.repulsion_scale),
        additive=bool(opts.additive_weights),
    )
    common_call = dict(
        out_shape=jax.ShapeDtypeStruct((nb + 1, _Q, c), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )

    def cost(grid_c):
        return pl.CostEstimate(
            flops=grid_c * _Q * _ST * (3 * d + 16),
            bytes_accessed=grid_c * (_ST * (c + 1) + _Q * (c + 1)) * 4,
            transcendentals=grid_c * _Q * _ST,
        )

    def masked(out, qblk_c):
        visited = (
            jnp.zeros((nb + 1,), bool)
            .at[qblk_c]
            .set(True)
            .at[nb]
            .set(False)
        )
        return jnp.where(visited[:, None, None], out, 0.0)

    def one_call(qblk_c, stile_c, first_c, grid_c):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(grid_c,),
            in_specs=[
                pl.BlockSpec(
                    (1, _Q, c),
                    lambda w, qblk, stile, first: (qblk[w], 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, _Q, 1),
                    lambda w, qblk, stile, first: (qblk[w], 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (c, _ST),
                    lambda w, qblk, stile, first: (0, stile[w]),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, _ST),
                    lambda w, qblk, stile, first: (0, stile[w]),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, _Q, c),
                lambda w, qblk, stile, first: (qblk[w], 0, 0),
                memory_space=pltpu.VMEM,
            ),
        )
        out = pl.pallas_call(
            functools.partial(_span_kernel, **kernel_args),
            grid_spec=grid_spec,
            cost_estimate=cost(grid_c),
            **common_call,
        )(
            qblk_c,
            stile_c,
            first_c,
            qdata,
            qcol,
            sdata,
            scol,
        )
        return masked(out, qblk_c)

    def one_call_packed(qblk_c, stile_c, first_c, grid_c):
        packed = (first_c << 30) | (qblk_c << 15) | stile_c
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid_c,),
            in_specs=[
                pl.BlockSpec(
                    (1, _Q, c),
                    lambda w, p: ((p[w] >> 15) & 0x7FFF, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, _Q, 1),
                    lambda w, p: ((p[w] >> 15) & 0x7FFF, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (c, _ST),
                    lambda w, p: (0, p[w] & 0x7FFF),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, _ST),
                    lambda w, p: (0, p[w] & 0x7FFF),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, _Q, c),
                lambda w, p: ((p[w] >> 15) & 0x7FFF, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        )
        out = pl.pallas_call(
            functools.partial(_span_kernel_packed, **kernel_args),
            grid_spec=grid_spec,
            cost_estimate=cost(grid_c),
            **common_call,
        )(
            packed,
            qdata,
            qcol,
            sdata,
            scol,
        )
        return masked(out, qblk_c)

    # packed layout fits when block and tile indices fit 15 bits
    # (~8M vertices); nb is the dummy-block id, hence nb + 1 values.
    # stile values are bounded by the span-side tile count == the sdata
    # lane length / _ST for both the windowed and compacted layouts.
    packable = (nb + 1) < 2**15 and _cdiv(sdata.shape[1], _ST) < 2**15
    call = one_call_packed if packable else one_call
    w_budget = _W_SMEM_PACKED if packable else _W_SMEM

    if grid_w <= w_budget:
        return call(qblk, stile, first, grid_w)

    # multi-chunk sweep as a fori_loop with a TRACED trip count:
    #   * bounded memory — ONE accumulator + one in-flight chunk output
    #     regardless of bucket size (an unrolled python loop materialized
    #     every chunk's (NB+1, Q, C) output: the compiled step at a
    #     bulge-grown 2^22-tile bucket demanded 21.3 GB of HBM and the
    #     compile itself died, surfacing as a mid-run TPU device error
    #     on the 1M layered trajectory)
    #   * chunks past the REAL tile count never execute: the trip count
    #     derives from the traced window tables, so a mostly-padding
    #     bucket costs nothing beyond its last real chunk
    n_chunks = _cdiv(grid_w, w_budget)
    pad = n_chunks * w_budget - grid_w
    qblk_p = jnp.concatenate([qblk, jnp.full((pad,), nb, jnp.int32)])
    stile_p = jnp.concatenate([stile, jnp.zeros((pad,), jnp.int32)])
    trip = (w_real + w_budget - 1) // w_budget

    def body(ci, acc):
        lo = ci * w_budget
        qblk_c = lax.dynamic_slice_in_dim(qblk_p, lo, w_budget)
        stile_c = lax.dynamic_slice_in_dim(stile_p, lo, w_budget)
        # per-chunk first flags by block-change detection: each chunk
        # initializes its own output blocks; cross-chunk continuation of
        # a block accumulates via the summed partials
        prev = jnp.concatenate([jnp.full((1,), -1, jnp.int32), qblk_c[:-1]])
        first_c = (qblk_c != prev).astype(jnp.int32)
        return acc + call(qblk_c, stile_c, first_c, w_budget)

    return lax.fori_loop(
        0,
        trip,
        body,
        jnp.zeros((nb + 1, _Q, c), jnp.float32),
    )


def _csr_segment_sum(values, row_ptr, offset=None):
    """Segment sum of src-sorted edge rows (see forces.csr_segment_sum)."""
    from ..core.forces import csr_segment_sum

    return csr_segment_sum(values, row_ptr, offset)


class _EdgeSlice(NamedTuple):
    """This device's view of the directed correction-edge tables (the
    whole table when unsharded)."""

    src: jax.Array
    dst: jax.Array
    mask: jax.Array
    bmaxpow: jax.Array
    e_off: jax.Array | None  # global position of row 0 (traced; None = 0)
    e_sel: jax.Array | None  # global row per slot (for kick parity)
    overflow: jax.Array  # device-0-only overflow scalar


def _slice_edge_tables(idx, structures, shard, edge_chunk=None) -> _EdgeSlice:
    """Resolve the correction pass's edge tables for this device: the
    pre-sharded O(E/P) chunk when provided, an in-trace contiguous slice
    under shard_map otherwise, or the full tables single-chip.  The
    clamped tail of an in-trace slice repeats the LAST edge (src = n-1,
    the sorted max) so chunks stay src-sorted for the segment sums;
    repeated rows are masked out.  ``overflow`` (identical on every
    device) is zeroed off device 0 so the caller's psum totals once."""
    overflow = structures.overflow
    if edge_chunk is not None:
        assert shard is not None, "edge_chunk requires shard"
        axis_name, _ = shard
        sidx = lax.axis_index(axis_name)
        return _EdgeSlice(
            src=edge_chunk.src,
            dst=edge_chunk.dst,
            mask=edge_chunk.mask,
            bmaxpow=edge_chunk.bmaxpow,
            e_off=sidx * edge_chunk.src.shape[0],
            e_sel=None,
            overflow=jnp.where(sidx == 0, overflow, 0),
        )
    esrc = jnp.asarray(idx.edge_src)
    edst = jnp.asarray(idx.edge_dst)
    emask = jnp.asarray(idx.edge_mask)
    bmaxpow = jnp.asarray(idx.edge_bmaxpow)
    if shard is None:
        return _EdgeSlice(esrc, edst, emask, bmaxpow, None, None, overflow)
    axis_name, num_shards = shard
    e_full = int(esrc.shape[0])
    e_dev = -(-e_full // num_shards)
    sidx = lax.axis_index(axis_name)
    e_off = sidx * e_dev
    offs = e_off + jnp.arange(e_dev, dtype=jnp.int32)
    in_range = offs < e_full
    e_sel = jnp.minimum(offs, e_full - 1)
    return _EdgeSlice(
        src=esrc[e_sel],
        dst=edst[e_sel],
        mask=emask[e_sel] & in_range,
        bmaxpow=bmaxpow[e_sel],
        e_off=e_off,
        e_sel=e_sel,
        overflow=jnp.where(sidx == 0, overflow, 0),
    )


def _edge_sides(positions, inv_w, colors, structures, es: _EdgeSlice, d):
    """Per-edge endpoint values via ONE packed gather per side.

    TPU gathers are row-LATENCY-bound (~25ms per 9M-row gather on v5e
    regardless of row width), so the correction's ~10 separate per-vertex
    lookups cost ~10x two packed ones.  The dynamic per-vertex channels
    [pos(d), invw, lwpow, rank, block, color, row] ride one (n, d+6) f32
    matrix; integer channels are exact as floats below 2^24, so the pack
    applies for n < 2^24 (~16.7M vertices) with the per-array fallback
    above that.

    Returns (psrc, pdst, iw_src, iw_dst, lwpow_src, block_src, rank_dst,
    row_dst, colneq)."""
    n = positions.shape[0]
    f32 = jnp.float32
    pos32 = positions.astype(f32)
    iw32 = inv_w.astype(f32)
    if n < 2**24:
        vpack = jnp.concatenate(
            [
                pos32,
                iw32[:, None],
                structures.lwpow[:, None],
                structures.rank_of.astype(f32)[:, None],
                structures.block_of.astype(f32)[:, None],
                colors.astype(f32)[:, None],
                structures.row_of.astype(f32)[:, None],
            ],
            axis=1,
        )
        sp = vpack[es.src]
        dp = vpack[es.dst]
        return (
            sp[:, :d],
            dp[:, :d],
            sp[:, d],
            dp[:, d],
            sp[:, d + 1],
            sp[:, d + 3].astype(jnp.int32),
            dp[:, d + 2].astype(jnp.int32),
            dp[:, d + 5].astype(jnp.int32),
            sp[:, d + 4] != dp[:, d + 4],
        )
    return (
        pos32[es.src],
        pos32[es.dst],
        iw32[es.src],
        iw32[es.dst],
        structures.lwpow[es.src],
        structures.block_of[es.src],
        structures.rank_of[es.dst],
        structures.row_of[es.dst],
        colors[es.src] != colors[es.dst],
    )


def _edge_inclusion(
    structures, tables, es: _EdgeSlice, rr, lwpow_src, block_src, rank_dst,
    row_dst, colneq, dist2,
):
    """Which edges' endpoints the kernel counted as candidates — the
    correction must mirror the kernel's inclusion EXACTLY (same per-class
    radius product, same covered tile windows, same color filter).
    Coverage start AND length both come from traced per-(block, row)
    tables, so every window resize is a zero-recompile swap; the dst ROW
    is a dynamic per-step channel (two-level binning)."""
    r_e = lwpow_src * es.bmaxpow
    cov_pair = block_src * rr + row_dst
    # one packed lookup for (window start, window length) — two separate
    # 9M-row gathers cost 2x one, even from this small table
    covtab = jnp.stack(
        [structures.start_tile.reshape(-1), tables.blk_t.reshape(-1)],
        axis=1,
    )
    cov = covtab[cov_pair] * _ST
    return (
        es.mask
        & (dist2 <= r_e * r_e)
        & (rank_dst >= cov[:, 0])
        & (rank_dst < cov[:, 0] + cov[:, 1])
        & colneq
    )


# ------------------------------------------------------------ full wrapper


def _kernel_accumulate(
    structures, idx, opts, tables, interpret, shard=None,
    resident_blocks=None,
):
    """Run the pallas sweep and unsort its per-query accumulators:
    (force (n,d) f32, repel_loss, candidate count, zero_count (n,),
    extra_overflow).  With ``shard`` every return value is this device's
    PARTIAL (the caller psums across the mesh); ``extra_overflow`` is the
    resident-mode partition overflow (0 otherwise)."""
    d = idx.d
    n = idx.n
    f32 = jnp.float32
    if tables is None:
        tables = idx.device_tables()
    c = idx.num_channels
    zero_i32 = jnp.asarray(0, jnp.int32)
    if resident_blocks is not None:
        nb_dev = resident_blocks
        out, part_ovf = _resident_sweep(
            structures, idx, opts, tables, interpret, shard, nb_dev
        )
        nq_loc = (nb_dev + 1) * _Q
        flat = out.reshape(nq_loc, c)
        qpos = structures.qdata.reshape(nq_loc, c)[:, :d]
        force_q = qpos * flat[:, d : d + 1] - flat[:, :d]
        # each vertex's query slot lives on exactly ONE device: local
        # gather with a validity mask; the caller's psum merges shards
        local_slot = structures.slot_of - structures.resident_b0 * _Q
        valid = (local_slot >= 0) & (local_slot < nb_dev * _Q)
        cl = jnp.clip(local_slot, 0, nq_loc - 1)
        fz = jnp.concatenate(
            [force_q, flat[:, d + 3 : d + 4]], axis=1
        )[cl]  # one packed gather (row latency, see below)
        force = jnp.where(valid[:, None], fz[:, :d], 0.0).astype(f32)
        loss = jnp.sum(flat[:, d + 1], dtype=f32)
        count = jnp.sum(flat[:, d + 2].astype(jnp.int32), dtype=jnp.int32)
        zero_count = jnp.where(valid, fz[:, d], 0.0).astype(jnp.int32)
        return force, loss, count, zero_count, part_ovf
    # span_query zeroes the rows of blocks the sweep never visited (every
    # window shrunk to 0, the dummy padding block, or — under sharding —
    # blocks owned by other devices' chunks), so the reshape below reads
    # no uninitialized memory
    out = span_query(
        structures, idx, opts, tables=tables, interpret=interpret, shard=shard
    )
    flat = out.reshape(idx.nq, c)
    qpos = structures.qdata.reshape(idx.nq, c)[:, :d]
    force_q = qpos * flat[:, d : d + 1] - flat[:, :d]  # q*rowsum - acc
    # unsort by ONE packed GATHER through the inverse slot map (each
    # vertex occupies exactly one query slot) — an (NQ, d) scatter-add
    # here cost ~100ms at million-vertex scale, and a separate
    # zero-count gather re-paid the same row latency
    slot_of = structures.slot_of
    fz = jnp.concatenate([force_q, flat[:, d + 3 : d + 4]], axis=1)[slot_of]
    force = fz[:, :d].astype(f32)
    loss = jnp.sum(flat[:, d + 1], dtype=f32)
    # each per-slot count is an exactly-representable small float; round to
    # integer BEFORE summing so the reduction is exact past 2^24 total
    # candidates (int32 ceiling ~2.1e9 documented; forces are unaffected)
    count = jnp.sum(flat[:, d + 2].astype(jnp.int32), dtype=jnp.int32)
    zero_count = fz[:, d].astype(jnp.int32)
    return force, loss, count, zero_count, zero_i32


def span_fused_forces(
    positions: jax.Array,
    inv_w: jax.Array,
    weights: jax.Array,
    colors: jax.Array,
    idx: SpanIndex,
    opts,
    att_key,
    interpret: bool = False,
    structures: SpanStructures | None = None,
    tables: "SpanTables | None" = None,
    shard: tuple[str, int] | None = None,
    resident_blocks: int | None = None,
):
    """Kernel repulsion + ONE merged edge pass doing attraction AND the
    neighbor-repulsion correction.

    Attraction (forces.attraction_forces) and the O(E) correction walk the
    same directed edge array with the same gathers (positions, inverse
    weights) and the same segment sums — running them as separate passes
    measured ~40ms/step slower on the TPU than their individual costs.
    Both force contributions act along (pos_dst - pos_src) with a scalar
    per-edge coefficient, so they share one (E,d) segment_sum:
    attraction pulls src toward dst past the hinge
    (NewWEmbedEmbedder.cpp:188-219), and removing a neighbor pair's kernel
    repulsion is the same-direction pull.

    Returns (force (n,d), att_loss, rep_loss, rep_count, overflow,
    zero_count) — everything the step needs from both force passes.

    With ``shard=(axis_name, P)`` (inside shard_map over replicated
    inputs) every device builds the IDENTICAL sorted structures, sweeps
    its contiguous chunk of the work-tile list, and walks its contiguous
    range of the directed edge array; all returns are partials for the
    caller's single psum.  ``overflow`` (computed identically everywhere)
    is reported by device 0 only, so the psum'd total matches the
    single-chip value.
    """
    n, d = positions.shape
    dtype = positions.dtype
    f32 = jnp.float32
    L = float(opts.edge_length)

    if tables is None:
        tables = idx.device_tables()
    if structures is None:
        structures = build_span_structures(
            positions, inv_w, weights, colors, idx, opts, tables=tables,
            shard=shard, resident_blocks=resident_blocks,
        )
    force_k, rep_loss, rep_count, zero_count, part_ovf = _kernel_accumulate(
        structures, idx, opts, tables, interpret, shard=shard,
        resident_blocks=resident_blocks,
    )

    es = _slice_edge_tables(idx, structures, shard)
    es = es._replace(overflow=es.overflow + part_ovf)
    kick_shape = int(idx.edge_src.shape[0])
    row_ptr = jnp.asarray(idx.edge_row_ptr)

    psrc, pdst, iw_src, iw_dst, lwpow_src, block_src, rank_dst, row_dst, colneq = (
        _edge_sides(positions, inv_w, colors, structures, es, d)
    )
    diff = pdst - psrc
    dist2 = jnp.sum(diff * diff, axis=-1)
    ws = (iw_src + iw_dst) if opts.additive_weights else (iw_src * iw_dst)
    posd = dist2 > 0
    dist = jnp.sqrt(dist2)
    inv_dist = f32(1.0) / jnp.maximum(dist, f32(1e-30))

    # attraction hinge (strictly beyond edge length pulls)
    act_a = (dist * ws > f32(L)) & es.mask
    ca = jnp.where(act_a, f32(opts.attraction_scale) * ws * inv_dist, 0.0)
    att_loss = jnp.sum(
        jnp.where(act_a, dist - f32(L) / ws, 0.0), dtype=f32
    )

    included = _edge_inclusion(
        structures, tables, es, idx.num_rows, lwpow_src, block_src,
        rank_dst, row_dst, colneq, dist2,
    )
    act_r = included & (dist2 * (ws * ws) <= f32(L * L)) & posd
    cr = jnp.where(act_r, f32(opts.repulsion_scale) * ws * inv_dist, 0.0)
    rep_loss = rep_loss - jnp.sum(
        jnp.where(act_r, f32(L) / ws - dist, 0.0), dtype=f32
    )
    rep_count = rep_count - jnp.sum(included, dtype=jnp.int32)

    net_e = (ca + cr)[:, None] * diff
    # coincident edge endpoints: random unit kick on the attraction side
    # (NewWEmbedEmbedder.cpp:197-200); the correction is zero there (the
    # kernel's active set requires positive distance)
    zero_e = (~posd) & es.mask

    def with_kicks(f):
        from ..core import forces as forces_mod

        # kicks are keyed by GLOBAL edge index (generate the full array,
        # slice this device's chunk) so sharded trajectories match the
        # single-chip path bit-for-bit even through coincident kicks
        kicks = forces_mod.random_unit_vectors(att_key, (kick_shape,), d, f32)
        if es.e_sel is not None:
            kicks = kicks[es.e_sel]
        return jnp.where(zero_e[:, None], kicks, f)

    net_e = lax.cond(jnp.any(zero_e), with_kicks, lambda f: f, net_e)
    # src-sorted edges: cumsum + CSR boundary diff instead of the scatter
    # that segment_sum lowers to (XLA-TPU scatter serializes per row)
    force_e = _csr_segment_sum(net_e, row_ptr, es.e_off)
    # coincident neighbor pairs are measure-zero configurations: pay the
    # extra cumsum pass over E only when one exists
    corr_zero_mask = included & ~posd

    def subtract_zero_corr(zc):
        return zc - _csr_segment_sum(
            corr_zero_mask.astype(jnp.int32), row_ptr, es.e_off
        )

    zero_count = lax.cond(
        jnp.any(corr_zero_mask), subtract_zero_corr, lambda zc: zc, zero_count
    )
    force = (force_k + force_e).astype(dtype)
    return (
        force,
        att_loss,
        rep_loss,
        rep_count,
        es.overflow,
        zero_count,
    )


def span_repulsion_forces(
    positions: jax.Array,
    inv_w: jax.Array,
    weights: jax.Array,
    colors: jax.Array,
    idx: SpanIndex,
    opts,
    interpret: bool = False,
    structures: SpanStructures | None = None,
    tables: "SpanTables | None" = None,
    shard: tuple[str, int] | None = None,
    edge_chunk: "EdgeChunk | None" = None,
    resident_blocks: int | None = None,
):
    """Sparse repulsion via the fused span kernel + O(E) edge correction.

    Returns (force (n, d), repel_loss, num_rep_candidates, overflow,
    zero_count (n,)) with the same contract as
    ``candidates.bucket_repulsion_forces`` (the jnp path): the caller
    applies coincident-point kicks from ``zero_count``; ``overflow``
    counts true in-radius candidates beyond the tile windows.  The
    count channel uses each member's per-DOUBLING-CLASS max radius, so
    ``num_rep_candidates`` matches the reference's/jnp path's per-class
    counts exactly when no window truncates (group merging only widens
    window COVERAGE; forces are radius-independent either way).

    With ``shard=(axis_name, P)`` (inside shard_map; positions/weights
    replicated) all returns are per-device partials for the caller's
    psum — work-tile chunks for the kernel, edge ranges for the
    correction, overflow reported by device 0 only.  By default each
    device slices its edge range out of the full (replicated-constant)
    tables; pass ``edge_chunk`` (pre-sharded per-device slices, see
    ``EdgeChunk``/``build_edge_chunks``) to keep per-device edge memory
    at O(E/P) — the memory-scalable halo configuration.
    """
    n, d = positions.shape
    dtype = positions.dtype
    f32 = jnp.float32
    L = float(opts.edge_length)

    if tables is None:
        tables = idx.device_tables()
    if structures is None:
        structures = build_span_structures(
            positions, inv_w, weights, colors, idx, opts, tables=tables,
            shard=shard, resident_blocks=resident_blocks,
        )
    force, loss, count, zero_count, part_ovf = _kernel_accumulate(
        structures, idx, opts, tables, interpret, shard=shard,
        resident_blocks=resident_blocks,
    )

    # ---- O(E) neighbor correction (reference filters candidates by
    # areNeighbors at query time, NewWEmbedEmbedder.cpp:328).  Inclusion
    # mirrors the kernel exactly (see _edge_inclusion); the force is
    # removed in the kernel's own algebraic form (q*rowsum_corr -
    # acc_corr).
    es = _slice_edge_tables(idx, structures, shard, edge_chunk)
    es = es._replace(overflow=es.overflow + part_ovf)
    row_ptr = jnp.asarray(idx.edge_row_ptr)

    psrc, pdst, iw_src, iw_dst, lwpow_src, block_src, rank_dst, row_dst, colneq = (
        _edge_sides(positions, inv_w, colors, structures, es, d)
    )
    diff = psrc - pdst
    dist2 = jnp.sum(diff * diff, axis=-1)
    included = _edge_inclusion(
        structures, tables, es, idx.num_rows, lwpow_src, block_src,
        rank_dst, row_dst, colneq, dist2,
    )
    ws = (iw_src + iw_dst) if opts.additive_weights else (iw_src * iw_dst)
    posd = dist2 > 0
    active = included & (dist2 * (ws * ws) <= f32(L * L)) & posd
    dist = jnp.sqrt(dist2)
    inv_dist = f32(1.0) / jnp.maximum(dist, f32(1e-30))
    coeff = jnp.where(active, f32(opts.repulsion_scale) * ws * inv_dist, 0.0)
    # src-sorted edges: cumsum + CSR boundary diff replaces the scatters
    rc = _csr_segment_sum(coeff, row_ptr, es.e_off)
    ac = _csr_segment_sum(coeff[:, None] * pdst, row_ptr, es.e_off)
    force = force - (positions.astype(f32) * rc[:, None] - ac)
    loss = loss - jnp.sum(jnp.where(active, f32(L) / ws - dist, 0.0), dtype=f32)
    count = count - jnp.sum(included, dtype=jnp.int32)
    zero_count = zero_count - _csr_segment_sum(
        (included & ~posd).astype(jnp.int32), row_ptr, es.e_off
    )
    return (
        force.astype(dtype),
        loss,
        count,
        es.overflow,
        zero_count,
    )
