"""Cell-compacted sparse repulsion for d >= 3: three-level binning plus
per-query-block candidate compaction.

The windowed span layout (span_sparse.py) prunes candidates on the first
TWO principal axes only; at d >= 3 the unpruned axes leave windows whose
members overwhelmingly fail the radius test (measured r04: girg100k d=4
sweep occupancy 0.075%, ~52 real candidates per 256x256 tile), and every
(query block, target row) window pays a >= 1-tile quantization floor (the
heavy weight groups are windowed by EVERY block).  This module is the
TPU-native analogue of the reference's output-sensitive exact filter
(reference: src/SNN/src/snn.cpp:149-160 — window by projection, then keep
only true in-radius members): it cannot filter by exact distance before
the distance pass, but it can (a) prune THREE axes instead of two and
(b) GATHER the surviving window members of each query block into dense,
contiguous tiles, so the sweep pays member count, not window-count
quantization.

Layout:

  1. Merged weight groups as in span_sparse (shared helper).
  2. Each group splits into equal-population ROWS by FIRST-principal-axis
     rank, each row into equal-population CELLS by SECOND-axis rank, and
     each cell's members are sorted by the THIRD axis.  Level populations
     follow the geometric rule rho = (size/_Q)^(1/3): row ~ size/rho,
     cell ~ size/rho^2 — each pruning level cuts the swept extent by the
     same factor.  (No 512 alignment is needed: the compacted span side
     has no static per-row padded layout.)
  3. Per step, candidate windows live per (query block, target cell):
     rows outside the block's first-axis reach and cells outside its
     second-axis reach are pruned outright; in-reach cells get a
     third-axis searchsorted window.
  4. COMPACTION: each block's surviving window members (concatenated
     cell-major) are gathered into a per-block slice of one dense
     (C, NCA) buffer.  The pallas sweep then walks per-block capacity
     tiles — work tile j IS compact tile j, so the whole work list
     (block ids, tile offsets, first flags) is derived in-trace from the
     traced per-block capacities: capacity growth within the same
     bucketed NCA is a zero-recompile swap, exactly like the windowed
     path's table swaps.
  5. Per-block capacities follow the same adaptive protocol as the
     windowed layout (presize / overflow-grow / segment shrink,
     core/span_driver.py) with needs measured in MEMBERS per block —
     truncation drops the TAIL of a block's concatenated member list and
     is surfaced through the overflow counter (never silently).

Single-chip only: the distributed backends keep the windowed layout
(their work-tile chunking and halo machinery are built on it)."""

from __future__ import annotations

from dataclasses import dataclass, replace

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from typing import NamedTuple

from . import span_sparse as sp
from .span_sparse import _Q, _ST, _bucket_size, _cdiv, _round_up

_CELL_MIN = 512  # groups below this stay a single row/cell (merged
# groups are >= span_sparse._GROUP_MIN = 2048 in practice, so every
# group gets split; the floor only guards degenerate tiny graphs)


def _level_populations(sz: int) -> tuple[int, int]:
    """(row_pop, cell_pop) for a group of ``sz`` members: geometric ladder
    sz -> row -> cell -> _Q with ratio rho = (sz/_Q)^(1/3)."""
    rho = max((sz / _Q) ** (1.0 / 3.0), 1.0)
    row_pop = int(np.clip(round(sz / rho), _Q, sz))
    cell_pop = int(np.clip(round(sz / (rho * rho)), _Q, row_pop))
    return row_pop, cell_pop


class CellTables(NamedTuple):
    """Growth-dependent per-block capacities as a TRACED device array."""

    cap_t: jax.Array  # (NB,) i32 tiles


class CellStructures(NamedTuple):
    """Per-iteration structures for the compacted sweep."""

    qdata: jax.Array  # (NB+1, _Q, C) f32
    qcol: jax.Array  # (NB+1, _Q, 1) i32
    sdata: jax.Array  # (C, NCA) f32 — compacted span side
    scol: jax.Array  # (1, NCA) i32
    qblk: jax.Array  # (W_pad,) i32 — in-trace work list (block per tile)
    stile: jax.Array  # (W_pad,) i32 — compact tile index (== slot index)
    first: jax.Array  # (W_pad,) i32
    w_real: jax.Array  # () i32 — live tile count (chunk trip bound)
    q_ids: jax.Array  # (NQ,) i32
    rank_of: jax.Array  # (n,) i32 — rank within own CELL
    block_of: jax.Array  # (n,) i32
    slot_of: jax.Array  # (n,) i32
    row_of: jax.Array  # (n,) i32 — CELL id (named for _edge_sides reuse)
    lwpow: jax.Array  # (n,) f32
    overflow: jax.Array  # () i32
    need: jax.Array  # (NB,) i64 — window members per block
    covtab: jax.Array  # (NB*CE, 4) i32 [start, stop, prefix, cap_slots]


@dataclass(frozen=True)
class CellIndex:
    """Static skeleton of the cell-compact index.  All fields numpy or
    python; nothing depends on positions.  Growth state = ``cap_t``."""

    n: int
    d: int
    num_channels: int  # C
    num_groups: int  # B
    num_rows: int  # R
    num_cells: int  # CE
    nb: int  # NB query blocks
    w_pad: int  # bucketed work-list length == compact tile capacity
    # row tables (R,)
    row_group: np.ndarray
    row_sizes: np.ndarray
    row_moff: np.ndarray  # member offset (global rank space)
    # cell tables (CE,)
    cell_row: np.ndarray
    cell_group: np.ndarray
    cell_sizes: np.ndarray
    cell_moff: np.ndarray
    # group tables (B,)
    bmaxpow: np.ndarray
    # per-vertex static
    group_of: np.ndarray
    class_bm2: np.ndarray
    # static per-rank vectors (n,)
    row_of_sorted1: np.ndarray  # sort-1 rank -> row
    cell_of_sorted2: np.ndarray  # sort-2/3 rank -> cell
    cell_moff_of_sorted: np.ndarray  # sort-3 rank -> its cell's moff
    sorted_shift_q: np.ndarray  # q slot shift per sort-3 rank
    # query-side static
    src_of_q: np.ndarray  # (NQ,)
    blk_cell: np.ndarray  # (NB,)
    blk_first: np.ndarray  # (NB,) global rank of block's first member
    blk_last: np.ndarray  # (NB,)
    # adaptive per-block capacities (tiles)
    cap_t: np.ndarray  # (NB,) i64
    # directed-edge correction tables (shared layout with SpanIndex)
    edge_src: np.ndarray
    edge_dst: np.ndarray
    edge_mask: np.ndarray
    edge_bmaxpow: np.ndarray
    edge_row_ptr: np.ndarray
    span_scale: float

    # ---- properties mirroring SpanIndex's surface
    @property
    def w(self) -> int:  # live work tiles (capacity actually allocated)
        return int(self.cap_t.sum())

    @property
    def nq(self) -> int:
        return int((self.nb + 1) * _Q)

    @property
    def nca(self) -> int:  # compacted span-side slot count
        return self.w_pad * _ST

    def device_tables(self) -> CellTables:
        return CellTables(cap_t=jnp.asarray(self.cap_t, jnp.int32))

    # ---- adaptive capacity protocol (per-block needs in MEMBERS)
    def can_grow(self) -> bool:
        return bool(np.any(self.cap_t < _cdiv(self.n, _ST)))

    def grow_from_needs(
        self, needs: np.ndarray, headroom: float = 1.3
    ) -> "CellIndex | None":
        """Same contract as SpanIndex.grow_from_needs, per BLOCK: starved
        capacities at least double and take headroom + 2 margin tiles;
        capacities exactly at need get one proactive spare tile."""
        needs = np.asarray(needs, np.int64)
        min_tiles = np.where(needs > 0, -(-needs // _ST), 0)
        starved = min_tiles > self.cap_t
        need_tiles = -(-(needs * headroom).astype(np.int64) // _ST) + 2
        tight = (min_tiles == self.cap_t) & (self.cap_t > 0)
        t_new = np.where(
            starved,
            np.maximum(need_tiles, 2 * self.cap_t),
            np.where(tight, self.cap_t + 1, self.cap_t),
        )
        t_new = np.minimum(t_new, _cdiv(self.n, _ST))
        if np.array_equal(t_new, self.cap_t):
            return None
        return self._with_caps(t_new)

    def grow_all(self, needs: np.ndarray | None = None) -> "CellIndex | None":
        live = self.cap_t > 0
        if needs is not None:
            live = live | (np.asarray(needs) > 0)
        t_new = np.minimum(
            self.cap_t + live.astype(np.int64), _cdiv(self.n, _ST)
        )
        if np.array_equal(t_new, self.cap_t):
            return None
        return self._with_caps(t_new)

    def resize_to_needs(
        self, needs: np.ndarray, headroom: float = 1.3
    ) -> "CellIndex | None":
        needs = np.asarray(needs, np.int64)
        t_new = np.where(
            needs > 0, -(-(needs * headroom).astype(np.int64) // _ST), 0
        )
        t_new = np.minimum(t_new, _cdiv(self.n, _ST))
        if np.array_equal(t_new, self.cap_t):
            return None
        return self._with_caps(t_new, keep_bucket=False)

    def shrink_to_needs(
        self, needs: np.ndarray, headroom: float = 1.5, slack: int = 2
    ) -> "CellIndex | None":
        needs = np.asarray(needs, np.int64)
        target = np.where(
            needs > 0, -(-(needs * headroom).astype(np.int64) // _ST) + 1, 0
        )
        target = np.minimum(target, _cdiv(self.n, _ST))
        t_new = np.where(
            needs == 0,
            0,
            np.where(self.cap_t > target + slack, target, self.cap_t),
        )
        if np.array_equal(t_new, self.cap_t):
            return None
        oversized = _bucket_size(int(t_new.sum()), 1.6) * 4 <= self.w_pad
        return self._with_caps(t_new, keep_bucket=not oversized)

    def _with_caps(
        self, cap_t: np.ndarray, keep_bucket: bool = True
    ) -> "CellIndex":
        cap_t = np.asarray(cap_t, np.int64)
        w = int(cap_t.sum())
        if keep_bucket and w <= self.w_pad:
            w_pad = self.w_pad
        else:
            w_pad = _bucket_size(w, 2.0 if keep_bucket else 1.6)
        return replace(self, cap_t=cap_t, w_pad=w_pad)

    # ------------------------------------------------------------- build
    @staticmethod
    def build(
        weights: np.ndarray,
        opts,
        edge_src: np.ndarray,
        edge_dst: np.ndarray,
        span_scale: float = 1.0,
    ) -> "CellIndex":
        n = int(weights.shape[0])
        d = int(opts.embedding_dimension)
        group_of, group_sizes, bmaxpow, class_bm2, b = (
            sp._merge_weight_groups(weights, opts)
        )

        # rows / cells: equal-population splits, no alignment constraints
        row_group_l, row_sizes_l = [], []
        cell_row_l, cell_sizes_l = [], []
        for g in range(b):
            sz = int(group_sizes[g])
            if sz <= _CELL_MIN:
                row_pop, cell_pop = sz, sz
            else:
                row_pop, cell_pop = _level_populations(sz)
            nrows = max(1, _cdiv(sz, row_pop))
            base, extra = divmod(sz, nrows)
            for r in range(nrows):
                rsz = base + (1 if r < extra else 0)
                row_group_l.append(g)
                row_sizes_l.append(rsz)
                ncells = max(1, _cdiv(rsz, cell_pop))
                cbase, cextra = divmod(rsz, ncells)
                for ci in range(ncells):
                    cell_row_l.append(len(row_sizes_l) - 1)
                    cell_sizes_l.append(cbase + (1 if ci < cextra else 0))
        rr = len(row_sizes_l)
        ce = len(cell_sizes_l)
        row_group = np.asarray(row_group_l, np.int32)
        row_sizes = np.asarray(row_sizes_l, np.int64)
        row_moff = np.concatenate([[0], np.cumsum(row_sizes)[:-1]])
        cell_row = np.asarray(cell_row_l, np.int32)
        cell_group = row_group[cell_row]
        cell_sizes = np.asarray(cell_sizes_l, np.int64)
        cell_moff = np.concatenate([[0], np.cumsum(cell_sizes)[:-1]])

        # query blocks: _Q-chunks per cell
        q_blocks = np.maximum(1, -(-cell_sizes // _Q))
        nb = int(q_blocks.sum())
        blk_cell = np.repeat(np.arange(ce, dtype=np.int32), q_blocks)
        cell_qoff = np.concatenate([[0], np.cumsum(q_blocks * _Q)[:-1]])

        row_of_sorted1 = np.repeat(np.arange(rr, dtype=np.int32), row_sizes)
        cell_of_sorted2 = np.repeat(np.arange(ce, dtype=np.int32), cell_sizes)
        cell_moff_of_sorted = np.repeat(cell_moff, cell_sizes).astype(np.int32)
        sorted_shift_q = np.repeat(
            cell_qoff - cell_moff, cell_sizes
        ).astype(np.int32)

        nq = (nb + 1) * _Q
        src_of_q = np.full(nq, n, np.int64)
        blk_first_l, blk_last_l = [], []
        for c_ in range(ce):
            o, sz = int(cell_moff[c_]), int(cell_sizes[c_])
            qo = int(cell_qoff[c_])
            src_of_q[qo : qo + sz] = np.arange(o, o + sz)
            for li in range(max(1, _cdiv(sz, _Q))):
                blk_first_l.append(o + min(li * _Q, max(sz - 1, 0)))
                blk_last_l.append(o + min((li + 1) * _Q, sz) - 1 if sz else o)
        assert len(blk_first_l) == nb

        # initial capacities: a coarse constant — the embedder's presize
        # protocol resizes to measured needs before the first step
        cap_t = np.full(nb, 4, np.int64)
        w_pad = _bucket_size(int(cap_t.sum()), 1.6)

        c = _round_up(max(d + 4, 8), 8)
        esrc_p, edst_p, emask, edge_bmaxpow, edge_row_ptr = (
            sp._edge_correction_tables(n, edge_src, edge_dst, class_bm2)
        )
        return CellIndex(
            n=n,
            d=d,
            num_channels=c,
            num_groups=b,
            num_rows=rr,
            num_cells=ce,
            nb=nb,
            w_pad=w_pad,
            row_group=row_group,
            row_sizes=row_sizes,
            row_moff=row_moff.astype(np.int64),
            cell_row=cell_row,
            cell_group=cell_group,
            cell_sizes=cell_sizes,
            cell_moff=cell_moff.astype(np.int64),
            bmaxpow=bmaxpow,
            group_of=group_of,
            class_bm2=class_bm2,
            row_of_sorted1=row_of_sorted1,
            cell_of_sorted2=cell_of_sorted2,
            cell_moff_of_sorted=cell_moff_of_sorted,
            sorted_shift_q=sorted_shift_q,
            src_of_q=src_of_q,
            blk_cell=blk_cell,
            blk_first=np.asarray(blk_first_l, np.int64),
            blk_last=np.asarray(blk_last_l, np.int64),
            cap_t=cap_t,
            edge_src=esrc_p,
            edge_dst=edst_p,
            edge_mask=emask,
            edge_bmaxpow=edge_bmaxpow,
            edge_row_ptr=edge_row_ptr,
            span_scale=float(span_scale),
        )


def _piecewise_fill(positions, deltas, length):
    """out[s] = sum of deltas at positions <= s — the scatter+cumsum
    piecewise-constant fill used throughout the compact build.
    ``positions`` must be clampable into [0, length-1]; coincident
    positions telescope through the add."""
    z = jnp.zeros((length,), deltas.dtype)
    z = z.at[jnp.clip(positions, 0, length - 1)].add(deltas)
    return jnp.cumsum(z)


def build_cell_structures(
    positions: jax.Array,
    inv_w: jax.Array,
    weights: jax.Array,
    colors: jax.Array,
    idx: CellIndex,
    opts,
    tables: "CellTables | None" = None,
    shard=None,
) -> CellStructures:
    """Three sorts, per-(block, cell) windows pruned in all three leading
    axes, and the compaction gather — everything the sweep consumes."""
    assert shard is None, "the cell-compact layout is single-chip"
    from ..core.candidates import _principal_axes3

    n, d = positions.shape
    f32 = jnp.float32
    positions = positions.astype(f32)
    ce, nb = idx.num_cells, idx.nb
    c = idx.num_channels
    nca, nq = idx.nca, idx.nq
    L = float(opts.edge_length)
    if tables is None:
        tables = idx.device_tables()

    centered = positions - jnp.mean(positions, axis=0)
    v1, v2, v3 = _principal_axes3(centered)
    y = centered @ v1
    x = centered @ v2
    z = centered @ v3

    group = jnp.asarray(idx.group_of)
    order1 = jnp.lexsort((y, group))
    x_s1 = x[order1]
    order2 = order1[jnp.lexsort((x_s1, jnp.asarray(idx.row_of_sorted1)))]
    z_s2 = z[order2]
    order = order2[jnp.lexsort((z_s2, jnp.asarray(idx.cell_of_sorted2)))]

    pos_s = positions[order]
    invw_s = inv_w.astype(f32)[order]
    lwpow = (L * jnp.power(weights.astype(f32), f32(1.0 / d))).astype(f32)
    lwpow_s = lwpow[order]
    col_s = colors[order].astype(jnp.int32)
    z_s = z[order]
    y_ord = y[order]
    x_ord = x[order]
    y_s1 = y[order1]
    x_s2 = x[order2]

    j = jnp.arange(n, dtype=jnp.int32)
    q_idx = j + jnp.asarray(idx.sorted_shift_q)

    # ---- query-side blocks: [pos(d), invw, (L*w^(1/d))^2, rawexp]
    sent_q = np.zeros((1, c), np.float32)
    sent_q[0, :d] = sp._Q_SENTINEL
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
    src_q = jnp.asarray(idx.src_of_q)
    qdata = qvals_ext[src_q].reshape(nb + 1, _Q, c)
    # packed aux gather: [color, id, lwpow, y, x]
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
            jnp.concatenate([x_ord, jnp.zeros((1,), f32)]),
        ],
        axis=1,
    )  # (n+1, 5)
    aux_q = aux[src_q]
    qcol = lax.bitcast_convert_type(aux_q[:, 0], jnp.int32).reshape(
        nb + 1, _Q, 1
    )
    q_ids = lax.bitcast_convert_type(aux_q[:, 1], jnp.int32)

    # ---- per-block extrema: z at static first/last ranks (blocks are
    # z-sorted chunks of their cell), y/x/lw by masked reduction
    minz = z_s[jnp.asarray(idx.blk_first)]
    maxz = z_s[jnp.asarray(idx.blk_last)]
    qmask = (q_ids < n).reshape(nb + 1, _Q)[:nb]
    big = f32(np.float32(np.finfo(np.float32).max))

    def blk_reduce(ch):
        v = aux_q[:, ch].reshape(nb + 1, _Q)[:nb]
        return (
            jnp.min(jnp.where(qmask, v, big), axis=1),
            jnp.max(jnp.where(qmask, v, -big), axis=1),
        )

    maxlw = jnp.max(
        jnp.where(qmask, aux_q[:, 2].reshape(nb + 1, _Q)[:nb], 0.0), axis=1
    )
    ymin_blk, ymax_blk = blk_reduce(3)
    xmin_blk, xmax_blk = blk_reduce(4)

    # row / cell intervals at static rank boundaries of their sort orders
    row_ymin = y_s1[jnp.asarray(idx.row_moff)]
    row_ymax = y_s1[jnp.asarray(idx.row_moff + idx.row_sizes - 1)]
    cell_xmin = x_s2[jnp.asarray(idx.cell_moff)]
    cell_xmax = x_s2[jnp.asarray(idx.cell_moff + idx.cell_sizes - 1)]

    bmax_cell = jnp.asarray(idx.bmaxpow[idx.cell_group])  # (CE,)
    reach = maxlw[:, None] * bmax_cell[None, :]  # (NB, CE)
    cr = idx.cell_row
    overlap = (
        (ymin_blk[:, None] - reach <= row_ymax[jnp.asarray(cr)][None, :])
        & (ymax_blk[:, None] + reach >= row_ymin[jnp.asarray(cr)][None, :])
        & (xmin_blk[:, None] - reach <= cell_xmax[None, :])
        & (xmax_blk[:, None] + reach >= cell_xmin[None, :])
    )
    lo = minz[:, None] - reach
    hi = maxz[:, None] + reach

    # branchless binary search for all 2*NB*CE bounds, each confined to
    # its cell's rank range (mirrors span_sparse.build_span_structures)
    moff = jnp.asarray(idx.cell_moff.astype(np.int32))[None, :]
    mend = jnp.asarray((idx.cell_moff + idx.cell_sizes).astype(np.int32))[
        None, :
    ]
    max_sz = int(np.max(idx.cell_sizes))

    def bsearch(value, right: bool):
        lo_i = jnp.broadcast_to(moff, value.shape)
        hi_i = jnp.broadcast_to(mend, value.shape)

        def body(_, carry):
            lo_i, hi_i = carry
            active = lo_i < hi_i
            mid = (lo_i + hi_i) // 2
            v = z_s[jnp.minimum(mid, n - 1)]
            pred = (v <= value) if right else (v < value)
            lo_i = jnp.where(active & pred, mid + 1, lo_i)
            hi_i = jnp.where(active & ~pred, mid, hi_i)
            return lo_i, hi_i

        lo_i, _ = lax.fori_loop(
            0, max_sz.bit_length() + 1, body, (lo_i, hi_i)
        )
        return lo_i - moff

    zero32 = jnp.asarray(0, jnp.int32)
    start = jnp.where(overlap, bsearch(lo, right=False), zero32)
    stop = jnp.where(overlap, bsearch(hi, right=True), zero32)
    sizes = (stop - start).astype(jnp.int32)  # (NB, CE) local ranks

    cap_t = tables.cap_t.astype(jnp.int32)  # (NB,)
    cap_slots = cap_t * _ST
    m_blk = jnp.sum(sizes, axis=1)  # (NB,) members
    overflow = jnp.sum(jnp.maximum(m_blk - cap_slots, 0), dtype=jnp.int32)
    need = jnp.sum(sizes, axis=1).astype(jnp.int64)

    # ---- compaction gather map via scatter + cumsum (no NCA-row gathers
    # of small tables: those are row-latency-bound on TPU)
    prefix = jnp.cumsum(sizes, axis=1) - sizes  # exclusive, (NB, CE)
    kept_prefix = jnp.minimum(prefix, cap_slots[:, None])
    cap_off = jnp.cumsum(cap_t) - cap_t  # (NB,) tiles
    base_slot = cap_off * _ST
    g_flat = (base_slot[:, None] + kept_prefix).reshape(-1)  # (NB*CE,)
    a_flat = (
        jnp.asarray(idx.cell_moff.astype(np.int32))[None, :] + start
    ).reshape(-1)
    off_flat = a_flat - g_flat  # value the fill must hold in segment k
    off_prev = jnp.concatenate([jnp.zeros((1,), jnp.int32), off_flat[:-1]])
    off_of_slot = _piecewise_fill(g_flat, off_flat - off_prev, nca)

    kept_tot = jnp.minimum(m_blk, cap_slots)  # (NB,)
    kt_prev = jnp.concatenate([jnp.zeros((1,), jnp.int32), kept_tot[:-1]])
    kept_of_slot = _piecewise_fill(base_slot, kept_tot - kt_prev, nca)
    bs_prev = jnp.concatenate([jnp.zeros((1,), jnp.int32), base_slot[:-1]])
    base_of_slot = _piecewise_fill(base_slot, base_slot - bs_prev, nca)

    slot = jnp.arange(nca, dtype=jnp.int32)
    valid = (slot - base_of_slot) < kept_of_slot
    compact_src = jnp.where(
        valid, jnp.clip(slot + off_of_slot, 0, n), n
    )

    # ---- ONE compact gather: span channels + color (bitcast) in a
    # single (n+1, C+1) matrix, then split/transpose
    sent_s = np.zeros((1, c + 1), np.float32)
    sent_s[0, :d] = sp._S_SENTINEL
    sent_s[0, d] = 1.0
    sent_s[0, c] = np.frombuffer(
        np.asarray([-3], np.int32).tobytes(), np.float32
    )[0]
    svals = jnp.concatenate(
        [
            pos_s,
            invw_s[:, None],
            jnp.asarray(idx.class_bm2)[order][:, None],
            jnp.ones((n, 1), f32),
            (1.0 / invw_s)[:, None],
            jnp.zeros((n, c - (d + 4)), f32),
            lax.bitcast_convert_type(col_s, f32)[:, None],
        ],
        axis=1,
    )
    svals_ext = jnp.concatenate([svals, jnp.asarray(sent_s)], axis=0)
    # chunked transposed gather: a direct (NCA, C+1) row gather pads the
    # channel minor dim to 128 lanes (16 GB at the d4 full-run presize)
    gathered_t = sp.gather_rows_transposed(svals_ext, compact_src)
    sdata = gathered_t[:c]
    scol = lax.bitcast_convert_type(gathered_t[c], jnp.int32)[None, :]

    # ---- in-trace work list: block of tile j by piecewise fill; tiles
    # past a block's kept data (or past the total capacity) become the
    # dummy block nb and are skipped by the kernel
    w_pad = idx.w_pad
    tile_pos = jnp.concatenate(
        [cap_off[1:], jnp.sum(cap_t, keepdims=True)]
    )  # block boundaries (NB,) + terminator
    tile_delta = jnp.concatenate(
        [
            jnp.ones((nb - 1,), jnp.int32),
            jnp.asarray([1], jnp.int32),  # terminator -> nb at total cap
        ]
    )
    qblk = _piecewise_fill(tile_pos, tile_delta, w_pad)
    # dead capacity tiles (beyond the block's kept members): skip compute
    ko_prev = jnp.concatenate([jnp.zeros((1,), jnp.int32), kept_tot[:-1]])
    kept_of_tile = _piecewise_fill(cap_off, kept_tot - ko_prev, w_pad)
    co_prev = jnp.concatenate([jnp.zeros((1,), jnp.int32), cap_off[:-1]])
    capoff_of_tile = _piecewise_fill(cap_off, cap_off - co_prev, w_pad)
    tile_j = jnp.arange(w_pad, dtype=jnp.int32)
    live = ((tile_j - capoff_of_tile) * _ST < kept_of_tile) & (qblk < nb)
    qblk = jnp.where(live, qblk, nb).astype(jnp.int32)
    stile = tile_j  # compact tile j IS span tile j
    prev = jnp.concatenate([jnp.full((1,), -1, jnp.int32), qblk[:-1]])
    first = (qblk != prev).astype(jnp.int32)
    w_real = jnp.sum(cap_t, dtype=jnp.int32)

    # ---- inverse maps in ONE wide scatter (order is a permutation)
    inv_vals = jnp.stack(
        [
            j - jnp.asarray(idx.cell_moff_of_sorted),
            q_idx // _Q,
            q_idx,
            jnp.asarray(idx.cell_of_sorted2),
        ],
        axis=1,
    )
    inv = (
        jnp.zeros((n, 4), jnp.int32)
        .at[order]
        .set(inv_vals, unique_indices=True, mode="promise_in_bounds")
    )

    covtab = jnp.stack(
        [
            start.reshape(-1),
            stop.reshape(-1),
            prefix.reshape(-1),
            jnp.broadcast_to(cap_slots[:, None], (nb, ce)).reshape(-1),
        ],
        axis=1,
    )

    return CellStructures(
        qdata=qdata,
        qcol=qcol,
        sdata=sdata,
        scol=scol,
        qblk=qblk,
        stile=stile,
        first=first,
        w_real=w_real,
        q_ids=q_ids,
        rank_of=inv[:, 0],
        block_of=inv[:, 1],
        slot_of=inv[:, 2],
        row_of=inv[:, 3],
        lwpow=lwpow,
        overflow=overflow,
        need=need,
        covtab=covtab,
    )


def _host_axes3(positions: np.ndarray, d: int):
    """Numpy f32 mirror of candidates._principal_axes3 (same contract as
    span_sparse._host_axes2: track the device's axes bit-for-bit)."""
    pos32 = np.asarray(positions, np.float32)
    centered32 = pos32 - pos32.mean(axis=0)
    cov = (centered32.T @ centered32).astype(np.float32)

    def piter(c_):
        v = (np.full((d,), 1.0) + np.arange(d) * 1e-3).astype(np.float32)
        v /= np.linalg.norm(v)
        for _ in range(12):
            w2 = c_ @ v
            nv = np.linalg.norm(w2)
            if nv > 0:
                v = (w2 / nv).astype(np.float32)
        return v

    v1 = piter(cov)
    lam1 = np.float32(v1 @ (cov @ v1))
    cov1 = (cov - lam1 * np.outer(v1, v1)).astype(np.float32)
    v2 = piter(cov1)
    v2 = (v2 - np.float32(v2 @ v1) * v1).astype(np.float32)
    nv = np.linalg.norm(v2)
    if nv > 1e-12:
        v2 = (v2 / nv).astype(np.float32)
    lam2 = np.float32(v2 @ (cov1 @ v2))
    v3 = piter((cov1 - lam2 * np.outer(v2, v2)).astype(np.float32))
    v3 = (v3 - np.float32(v3 @ v1) * v1 - np.float32(v3 @ v2) * v2).astype(
        np.float32
    )
    nv3 = np.linalg.norm(v3)
    if nv3 > 1e-12:
        v3 = (v3 / nv3).astype(np.float32)
    return v1, v2, v3


def measure_cell_needs_host(
    positions: np.ndarray, weights: np.ndarray, idx: CellIndex, opts
) -> tuple[np.ndarray, int]:
    """Host-side (numpy) per-block member needs + overflow — the presize
    mirror of ``build_cell_structures`` (same windows, independent f32
    power-iteration axes; the in-step overflow counter stays the ground
    truth)."""
    n, d = positions.shape
    pos = np.asarray(positions, np.float64)
    w = np.asarray(weights, np.float64)
    L = float(opts.edge_length)
    ce, nb = idx.num_cells, idx.nb

    v1, v2, v3 = _host_axes3(pos, d)
    centered = pos - pos.mean(axis=0)
    y = centered @ v1.astype(np.float64)
    x = centered @ v2.astype(np.float64)
    z = centered @ v3.astype(np.float64)

    order1 = np.lexsort((y, idx.group_of))
    order2 = order1[np.lexsort((x[order1], idx.row_of_sorted1))]
    order = order2[np.lexsort((z[order2], idx.cell_of_sorted2))]
    z_s = z[order]
    y_ord = y[order]
    x_ord = x[order]
    y_s1 = y[order1]
    x_s2 = x[order2]
    lw_s = (L * np.power(w, 1.0 / d))[order]

    firsts = idx.blk_first
    lasts = idx.blk_last
    minz = z_s[firsts]
    maxz = z_s[lasts]
    maxlw = np.empty(nb)
    ymin_blk = np.empty(nb)
    ymax_blk = np.empty(nb)
    xmin_blk = np.empty(nb)
    xmax_blk = np.empty(nb)
    for bi in range(nb):
        sl = slice(int(firsts[bi]), int(lasts[bi]) + 1)
        maxlw[bi] = lw_s[sl].max()
        ymin_blk[bi] = y_ord[sl].min()
        ymax_blk[bi] = y_ord[sl].max()
        xmin_blk[bi] = x_ord[sl].min()
        xmax_blk[bi] = x_ord[sl].max()

    row_ymin = y_s1[idx.row_moff]
    row_ymax = y_s1[idx.row_moff + idx.row_sizes - 1]
    cell_xmin = x_s2[idx.cell_moff]
    cell_xmax = x_s2[idx.cell_moff + idx.cell_sizes - 1]

    bmax_cell = idx.bmaxpow[idx.cell_group]
    reach = maxlw[:, None] * bmax_cell[None, :]
    cr = idx.cell_row
    overlap = (
        (ymin_blk[:, None] - reach <= row_ymax[cr][None, :])
        & (ymax_blk[:, None] + reach >= row_ymin[cr][None, :])
        & (xmin_blk[:, None] - reach <= cell_xmax[None, :])
        & (xmax_blk[:, None] + reach >= cell_xmin[None, :])
    )
    lo = minz[:, None] - reach
    hi = maxz[:, None] + reach
    start = np.empty((nb, ce), np.int64)
    stop = np.empty((nb, ce), np.int64)
    for c_ in range(ce):
        o, sz = int(idx.cell_moff[c_]), int(idx.cell_sizes[c_])
        seg = z_s[o : o + sz]
        start[:, c_] = np.searchsorted(seg, lo[:, c_], side="left")
        stop[:, c_] = np.searchsorted(seg, hi[:, c_], side="right")
    sizes = np.where(overlap, stop - start, 0)
    m_blk = sizes.sum(axis=1)
    cap_slots = idx.cap_t * _ST
    overflow = int(np.maximum(m_blk - cap_slots, 0).sum())
    return m_blk.astype(np.int64), overflow


# ------------------------------------------------------------------ sweep


def _cell_accumulate(structures: CellStructures, idx: CellIndex, opts,
                     interpret: bool):
    """Sweep + unsort (mirror of span_sparse._kernel_accumulate)."""
    d, n, c = idx.d, idx.n, idx.num_channels
    f32 = jnp.float32
    out = sp.sweep_work_tiles(
        structures.qdata,
        structures.qcol,
        structures.sdata,
        structures.scol,
        structures.qblk,
        structures.stile,
        structures.first,
        idx.w_pad,
        structures.w_real,
        idx.nb,
        c,
        d,
        opts,
        interpret,
    )
    flat = out.reshape(idx.nq, c)
    qpos = structures.qdata.reshape(idx.nq, c)[:, :d]
    force_q = qpos * flat[:, d : d + 1] - flat[:, :d]
    slot_of = structures.slot_of
    # one packed unsort gather (row-latency-bound, like span_sparse)
    fz = jnp.concatenate([force_q, flat[:, d + 3 : d + 4]], axis=1)[slot_of]
    force = fz[:, :d].astype(f32)
    loss = jnp.sum(flat[:, d + 1], dtype=f32)
    count = jnp.sum(flat[:, d + 2].astype(jnp.int32), dtype=jnp.int32)
    zero_count = fz[:, d].astype(jnp.int32)
    return force, loss, count, zero_count


def _cell_edge_inclusion(
    structures: CellStructures, es, ce, lwpow_src, block_src, rank_dst,
    cell_dst, colneq, dist2,
):
    """Which edges the compacted sweep counted: dst within its cell's
    [start, stop) window for src's block AND not truncated by the block's
    capacity (truncation drops the tail of the concatenated list)."""
    r_e = lwpow_src * es.bmaxpow
    cov = structures.covtab[block_src * ce + cell_dst]  # (E, 4)
    start, stop, prefix, cap = cov[:, 0], cov[:, 1], cov[:, 2], cov[:, 3]
    return (
        es.mask
        & (dist2 <= r_e * r_e)
        & (rank_dst >= start)
        & (rank_dst < stop)
        & (prefix + (rank_dst - start) < cap)
        & colneq
    )


def cell_fused_forces(
    positions: jax.Array,
    inv_w: jax.Array,
    weights: jax.Array,
    colors: jax.Array,
    idx: CellIndex,
    opts,
    att_key,
    interpret: bool = False,
    structures: CellStructures | None = None,
    tables: "CellTables | None" = None,
    shard=None,
):
    """Compacted-sweep counterpart of span_sparse.span_fused_forces: the
    kernel repulsion + ONE merged edge pass (attraction + neighbor
    correction).  Same return contract."""
    assert shard is None, "the cell-compact layout is single-chip"
    n, d = positions.shape
    dtype = positions.dtype
    f32 = jnp.float32
    L = float(opts.edge_length)

    if tables is None:
        tables = idx.device_tables()
    if structures is None:
        structures = build_cell_structures(
            positions, inv_w, weights, colors, idx, opts, tables=tables
        )
    force_k, rep_loss, rep_count, zero_count = _cell_accumulate(
        structures, idx, opts, interpret
    )

    es = sp._slice_edge_tables(idx, structures, None)
    kick_shape = int(idx.edge_src.shape[0])
    row_ptr = jnp.asarray(idx.edge_row_ptr)

    (psrc, pdst, iw_src, iw_dst, lwpow_src, block_src, rank_dst, cell_dst,
     colneq) = sp._edge_sides(positions, inv_w, colors, structures, es, d)
    diff = pdst - psrc
    dist2 = jnp.sum(diff * diff, axis=-1)
    ws = (iw_src + iw_dst) if opts.additive_weights else (iw_src * iw_dst)
    posd = dist2 > 0
    dist = jnp.sqrt(dist2)
    inv_dist = f32(1.0) / jnp.maximum(dist, f32(1e-30))

    act_a = (dist * ws > f32(L)) & es.mask
    ca = jnp.where(act_a, f32(opts.attraction_scale) * ws * inv_dist, 0.0)
    att_loss = jnp.sum(jnp.where(act_a, dist - f32(L) / ws, 0.0), dtype=f32)

    included = _cell_edge_inclusion(
        structures, es, idx.num_cells, lwpow_src, block_src, rank_dst,
        cell_dst, colneq, dist2,
    )
    act_r = included & (dist2 * (ws * ws) <= f32(L * L)) & posd
    cr_ = jnp.where(act_r, f32(opts.repulsion_scale) * ws * inv_dist, 0.0)
    rep_loss = rep_loss - jnp.sum(
        jnp.where(act_r, f32(L) / ws - dist, 0.0), dtype=f32
    )
    rep_count = rep_count - jnp.sum(included, dtype=jnp.int32)

    net_e = (ca + cr_)[:, None] * diff
    zero_e = (~posd) & es.mask

    def with_kicks(f):
        from ..core import forces as forces_mod

        kicks = forces_mod.random_unit_vectors(att_key, (kick_shape,), d, f32)
        return jnp.where(zero_e[:, None], kicks, f)

    net_e = lax.cond(jnp.any(zero_e), with_kicks, lambda f: f, net_e)
    force_e = sp._csr_segment_sum(net_e, row_ptr, es.e_off)
    corr_zero_mask = included & ~posd

    def subtract_zero_corr(zc):
        return zc - sp._csr_segment_sum(
            corr_zero_mask.astype(jnp.int32), row_ptr, es.e_off
        )

    zero_count = lax.cond(
        jnp.any(corr_zero_mask), subtract_zero_corr, lambda zc: zc, zero_count
    )
    force = (force_k + force_e).astype(dtype)
    return force, att_loss, rep_loss, rep_count, structures.overflow, zero_count


def cell_repulsion_forces(
    positions: jax.Array,
    inv_w: jax.Array,
    weights: jax.Array,
    colors: jax.Array,
    idx: CellIndex,
    opts,
    interpret: bool = False,
    structures: CellStructures | None = None,
    tables: "CellTables | None" = None,
):
    """Repulsion-only compacted sweep + O(E) neighbor correction — the
    profiled-step counterpart of span_sparse.span_repulsion_forces.
    Returns (force, repel_loss, count, overflow, zero_count)."""
    n, d = positions.shape
    dtype = positions.dtype
    f32 = jnp.float32
    L = float(opts.edge_length)

    if tables is None:
        tables = idx.device_tables()
    if structures is None:
        structures = build_cell_structures(
            positions, inv_w, weights, colors, idx, opts, tables=tables
        )
    force, loss, count, zero_count = _cell_accumulate(
        structures, idx, opts, interpret
    )

    es = sp._slice_edge_tables(idx, structures, None)
    row_ptr = jnp.asarray(idx.edge_row_ptr)
    (psrc, pdst, iw_src, iw_dst, lwpow_src, block_src, rank_dst, cell_dst,
     colneq) = sp._edge_sides(positions, inv_w, colors, structures, es, d)
    diff = psrc - pdst
    dist2 = jnp.sum(diff * diff, axis=-1)
    included = _cell_edge_inclusion(
        structures, es, idx.num_cells, lwpow_src, block_src, rank_dst,
        cell_dst, colneq, dist2,
    )
    ws = (iw_src + iw_dst) if opts.additive_weights else (iw_src * iw_dst)
    posd = dist2 > 0
    active = included & (dist2 * (ws * ws) <= f32(L * L)) & posd
    dist = jnp.sqrt(dist2)
    inv_dist = f32(1.0) / jnp.maximum(dist, f32(1e-30))
    coeff = jnp.where(active, f32(opts.repulsion_scale) * ws * inv_dist, 0.0)
    rc = sp._csr_segment_sum(coeff, row_ptr, es.e_off)
    ac = sp._csr_segment_sum(coeff[:, None] * pdst, row_ptr, es.e_off)
    force = force - (positions.astype(f32) * rc[:, None] - ac)
    loss = loss - jnp.sum(jnp.where(active, f32(L) / ws - dist, 0.0), dtype=f32)
    count = count - jnp.sum(included, dtype=jnp.int32)
    zero_count = zero_count - sp._csr_segment_sum(
        (included & ~posd).astype(jnp.int32), row_ptr, es.e_off
    )
    return force.astype(dtype), loss, count, structures.overflow, zero_count
