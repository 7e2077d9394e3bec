"""Memory-scalable multi-device embedding: vertex-range sharded state with
static halo exchange of boundary positions.

This is the scale-out design of SURVEY.md §5.8 (the reference has no
distributed backend at all — OpenMP shared memory only,
src/embeddingLib/src/embedder/NewWEmbedEmbedder.cpp:309):

  * The STATE is sharded: positions, Adam moments (the large per-vertex
    arrays) live as (n_pad, d) arrays sharded by vertex range over a 1-D
    device mesh — per-device memory O(n/P).  Scalar weights / inv-weights /
    colors stay replicated (O(n) scalars, not O(n*d)).
  * The directed EDGE arrays are sharded by source-vertex range (CSR order
    makes those contiguous slices) and device_put with the mesh sharding —
    per-device memory O(E/P).
  * Per step, each device sends the positions of the boundary vertices its
    peers' edges reference (static send lists, computed once from the graph)
    through ONE ``lax.all_to_all`` — the halo exchange.  Attraction is then
    entirely local: every directed edge is owned by its source's shard, so
    force writes never cross devices.
  * Repulsion still needs global geometry: positions are all-gathered
    (transient O(n*d) per device, freed after the pass), the candidate
    pass runs partitioned — the fused span kernel by work-tile chunks
    (span_sparse._shard_work_tiles), the jnp bucket path by query blocks —
    and the partial force field is reduced straight back to vertex shards
    with ``lax.psum_scatter`` — half the wire cost of a full all-reduce.
    The O(E) correction-edge tables are SHARDED by edge range
    (``EdgeChunk``: O(E/P) live bytes per device).  With
    ``opts.halo_resident_structures`` the sweep-RESIDENT sorted
    structures are block-range sharded as well: each device holds its
    1/P slice of the query blocks and a compact per-work-tile span
    buffer (O(work/P)) instead of the replicated (NB+1, Q, C) qdata /
    (C, NPA) sdata (span_sparse._resident_sweep; partition overflow of
    the per-device tile budget is surfaced through the overflow
    counter).  Per-device memory is then O(n·d transient + n scalars +
    n·C build transient + work/P resident + E/P) — the remaining O(n)
    terms are the replicated position gather/sorts and the sorted-value
    build transient; a distributed sample-sort (rank-range ownership +
    boundary-span exchange) is the documented follow-up.
  * Optimizer update, gravity recentring (mean via scalar psum), and the
    convergence metric run on local rows only.

Collectives per step (bucket mode): 1 all_to_all (halo, O(H*d)),
1 all_gather (O(n*d)), 1 psum_scatter (O(n*d)), scalar psums.  Attraction
contributes NO O(n) collective.  Cost model in BASELINE.md row 5.

Semantics match the single-chip step up to summation-order rounding,
including the coincident-point kicks (keyed by global vertex/edge index,
so a sphere-radius-0 layered expansion — which starts siblings coincident
— follows the identical trajectory on every backend).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..core import candidates as cand_mod
from ..core import forces
from ..core import step as step_mod
from ..core.optim import AdamParams
from ..core.options import EmbedderOptions, RepulsionMode
from ..core.span_driver import SpanGrowthMixin
from ..core.state import DeviceGraph, EmbedState, init_state, random_positions
from ..graphs.csr import CSRGraph
from ..kernels import span_sparse as span_mod
from ..utils import rng as rng_mod
from ..utils.timer import Timer, TimingResult
from .mesh import DATA_AXIS


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclass(frozen=True)
class HaloPlan:
    """Static partition of vertices and edges over P shards.

    Vertex v is owned by shard v // R (R = n_pad / P).  Edge arrays are
    stacked (P, E_s) so axis 0 can be sharded over the mesh; ``ext`` index
    space of shard p is [0, R) local rows followed by P blocks of H
    received halo rows (block q = rows owned by shard q that p needs)."""

    n: int
    n_pad: int
    R: int
    P: int
    H: int  # halo rows exchanged per (owner, requester) pair
    E_s: int  # padded directed-edge count per shard
    edge_src_local: np.ndarray  # (P, E_s) int32, src - p*R
    edge_dst_ext: np.ndarray  # (P, E_s) int32 index into the ext table
    edge_dst_global: np.ndarray  # (P, E_s) int32 (for replicated inv_w/color)
    edge_mask: np.ndarray  # (P, E_s) bool
    send_idx: np.ndarray  # (P, P, H) int32: [owner, requester] -> local rows
    local_row_ptr: np.ndarray  # (P, R+1) int32 CSR offsets into the shard's
    # local edge slice (edges are local-src-sorted; enables the cumsum
    # segment reduction instead of a serializing scatter)

    edge_goff: np.ndarray  # (P, 1) int32: global directed-edge index of each
    # shard's slice start (kick parity with the single-chip edge order)

    @staticmethod
    def build(graph: CSRGraph, num_shards: int) -> "HaloPlan":
        n = graph.num_vertices
        Pn = num_shards
        R = _round_up(max(n, Pn), Pn) // Pn
        n_pad = R * Pn
        src = graph.edge_src  # nondecreasing (CSR)
        dst = graph.col_idx
        bounds = np.searchsorted(src, np.arange(Pn + 1) * R)
        E_s = max(256, _round_up(int(np.max(bounds[1:] - bounds[:-1])), 256))

        halo_lists = []  # [p][q] sorted unique dst ids owned by q, needed by p
        for p in range(Pn):
            lo, hi = bounds[p], bounds[p + 1]
            d_p = np.unique(dst[lo:hi])
            owners = d_p // R
            halo_lists.append(
                [d_p[(owners == q)] for q in range(Pn)]
            )
        H = max(
            8,
            _round_up(
                max(
                    (h.shape[0] for p in range(Pn) for q, h in enumerate(halo_lists[p]) if q != p),
                    default=1,
                ),
                8,
            ),
        )

        esrc_l = np.zeros((Pn, E_s), np.int32)
        edst_ext = np.zeros((Pn, E_s), np.int32)
        edst_g = np.zeros((Pn, E_s), np.int32)
        emask = np.zeros((Pn, E_s), bool)
        send_idx = np.zeros((Pn, Pn, H), np.int32)
        local_row_ptr = np.zeros((Pn, R + 1), np.int32)
        for p in range(Pn):
            lo, hi = bounds[p], bounds[p + 1]
            k = hi - lo
            esrc_l[p, :k] = src[lo:hi] - p * R
            local_row_ptr[p] = np.searchsorted(
                esrc_l[p, :k], np.arange(R + 1)
            )
            edst_g[p, :k] = dst[lo:hi]
            emask[p, :k] = True
            ext = np.zeros(k, np.int64)
            d_slice = dst[lo:hi]
            owners = d_slice // R
            own = owners == p
            ext[own] = d_slice[own] - p * R
            for q in range(Pn):
                if q == p:
                    continue
                hq = halo_lists[p][q]
                if hq.shape[0] > H:
                    raise AssertionError("halo capacity miscomputed")
                send_idx[q, p, : hq.shape[0]] = hq - q * R
                sel = owners == q
                ext[sel] = R + q * H + np.searchsorted(hq, d_slice[sel])
            edst_ext[p, :k] = ext
        return HaloPlan(
            n=n, n_pad=n_pad, R=R, P=Pn, H=H, E_s=E_s,
            edge_src_local=esrc_l, edge_dst_ext=edst_ext,
            edge_dst_global=edst_g, edge_mask=emask, send_idx=send_idx,
            local_row_ptr=local_row_ptr,
            edge_goff=bounds[:-1].astype(np.int32).reshape(Pn, 1),
        )


def build_halo_step(
    graph: CSRGraph,
    opts: EmbedderOptions,
    weights_np: np.ndarray,
    mesh: Mesh,
    axis_name: str = DATA_AXIS,
    index=None,
):
    """Returns (jitted_step, plan, dg, index, shard_state) — the vertex-
    sharded step.  ``jitted_step(state, weights, inv_w, tables) -> state``
    where the state's per-vertex arrays are (n_pad, d) sharded by rows;
    ``shard_state(state)`` device_puts a replicated/host state into that
    layout.  ``index`` may be passed in (span growth rebuilds)."""
    Pn = mesh.devices.size
    shard = (axis_name, Pn)
    plan = HaloPlan.build(graph, Pn)
    dg = DeviceGraph.build(graph)
    mode = opts.resolve_repulsion_mode(graph.num_vertices)
    use_sampling = opts.num_negative_samples >= 0
    dense_adj = None
    span_mode = None
    if not use_sampling and mode is RepulsionMode.BUCKET:
        span_mode = step_mod.resolve_fused_span(dg, opts)
        if index is None:
            if span_mode is not None:
                # fused span kernel for the repulsion pass: work-tile
                # chunks per device, partial forces reduce-scattered back
                # to vertex shards like the jnp bucket path
                index = span_mod.SpanIndex.build(
                    weights_np, opts, graph.edge_src, graph.col_idx
                )
            else:
                index = cand_mod.BucketIndex.build(
                    weights_np, opts, graph.edge_src, graph.col_idx
                )
        elif not isinstance(index, span_mod.SpanIndex):
            span_mode = None
    elif not use_sampling and mode is RepulsionMode.DENSE:
        dense_adj = forces.build_dense_adjacency(dg)
    hp = AdamParams(opts.learning_rate, opts.cooling_factor)
    n, n_pad, R, H, E_s = plan.n, plan.n_pad, plan.R, plan.H, plan.E_s
    d = opts.embedding_dimension

    row_sharding = NamedSharding(mesh, P(axis_name))
    replicated = NamedSharding(mesh, P())
    plan_dev = jax.tree.map(
        lambda a: jax.device_put(jnp.asarray(a), row_sharding),
        (plan.edge_src_local, plan.edge_dst_ext, plan.edge_dst_global,
         plan.edge_mask, plan.send_idx, plan.local_row_ptr, plan.edge_goff),
    )
    # single-chip padded directed-edge count: the kick arrays are drawn at
    # this length so coincident-edge kicks match the single-chip step
    # bit-for-bit (keyed by global edge index, not per-shard slot)
    e_pad_global = int(dg.edge_src.shape[0])

    def halo_step(state, weights, inv_w, tables, echunk, esrc_l, edst_ext, edst_g, emask, send_idx, row_ptr_l, e_goff):
        """Runs per device inside shard_map.  state arrays are the LOCAL
        row slices (R, ...); weights/inv_w/tables are replicated;
        ``echunk`` (span path) is this device's O(E/P) slice of the
        correction-edge tables."""
        esrc_l, edst_ext, edst_g = esrc_l[0], edst_ext[0], edst_g[0]
        emask, send_idx, row_ptr_l = emask[0], send_idx[0], row_ptr_l[0]
        e_goff = e_goff[0, 0]
        if echunk is not None:
            echunk = span_mod.EdgeChunk(*(a[0] for a in echunk))
        p = lax.axis_index(axis_name)
        pos_l = state.positions  # (R, d)
        dtype = pos_l.dtype
        key, att_key, rep_key, kick_key = jax.random.split(state.key, 4)
        rows_global = p * R + jnp.arange(R)
        real_row = rows_global < n

        # ---- halo exchange: one all_to_all of boundary positions.
        # send[j] = the rows shard j's edges need from us; after the
        # exchange recv[q] = the rows we need from shard q.
        send = pos_l[send_idx]  # (P, H, d)
        recv = lax.all_to_all(send, axis_name, split_axis=0, concat_axis=0, tiled=False)
        ext = jnp.concatenate([pos_l, recv.reshape(Pn * H, d)])  # (R + P*H, d)

        # ---- attraction: src-local edges, local force writes only
        # (NewWEmbedEmbedder.cpp:306-316 semantics, see forces.attraction_forces)
        psrc = pos_l[esrc_l]
        pdst = ext[edst_ext]
        diff = pdst - psrc
        dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1))
        src_g = p * R + esrc_l
        ws = forces._weight_scaling(
            inv_w[jnp.minimum(src_g, n - 1)], inv_w[edst_g], opts.additive_weights
        )
        zero = (dist <= 0) & emask
        safe = jnp.where(dist > 0, dist, 1.0)
        att_active = (dist * ws > opts.edge_length) & emask
        coeff = jnp.where(att_active, opts.attraction_scale * ws / safe, 0.0)
        force_e = coeff[:, None].astype(dtype) * diff

        def with_edge_kicks(f):
            # kicks keyed by GLOBAL directed-edge index (draw the full
            # array, gather this shard's slice): transient O(E*d), paid
            # only on the measure-zero-but-real coincidence steps (e.g.
            # the first step after a sphere-radius-0 layered expansion),
            # in exchange for bit-exact parity with the single-chip step
            kicks_full = forces.random_unit_vectors(
                att_key, (e_pad_global,), d, dtype
            )
            rows = jnp.minimum(e_goff + jnp.arange(E_s), e_pad_global - 1)
            return jnp.where(zero[:, None], kicks_full[rows], f)

        force_e = lax.cond(
            lax.psum(jnp.any(zero).astype(jnp.int32), axis_name) > 0,
            with_edge_kicks, lambda f: f, force_e,
        )
        # local edges are local-src-sorted: cumsum + CSR boundary diff
        # instead of the scatter segment_sum lowers to
        force_l = forces.csr_segment_sum(force_e, row_ptr_l)
        att_loss = lax.psum(
            jnp.sum(
                jnp.where(att_active, dist - opts.edge_length / ws, 0.0),
                dtype=jnp.float32,
            ),
            axis_name,
        )

        # ---- repulsion: transient global gather, block-partitioned pass,
        # reduce-scatter straight back to vertex shards
        pos_full = lax.all_gather(pos_l, axis_name, tiled=True)[:n]
        overflow = jnp.asarray(0, jnp.int32)
        if use_sampling:
            if opts.num_negative_samples == 0:
                rep_force = jnp.zeros((n, d), dtype)
                rep_loss = jnp.asarray(0.0, jnp.float32)
                rep_count = jnp.asarray(0, jnp.int32)
                zero_n = jnp.zeros((n,), jnp.int32)
            else:
                rep_force, rep_loss, rep_count, zero_n = (
                    forces.sampled_repulsion_forces(
                        pos_full, inv_w, dg, opts, rep_key,
                        shard=(axis_name, Pn),
                    )
                )
        elif mode is RepulsionMode.DENSE:
            rep_force, rep_loss, rep_count, zero_n = forces.dense_repulsion_forces(
                pos_full, inv_w, dense_adj, dg.colors, opts, shard=(axis_name, Pn)
            )
        elif span_mode is not None:
            # every device builds the IDENTICAL sorted structures from the
            # replicated gathered positions, then sweeps its chunk of the
            # work-tile list (span_sparse._shard_work_tiles); the O(E)
            # correction tables arrive pre-sharded (O(E/P) per device)
            resident = (
                -(-(index.nb + 1) // Pn)
                if opts.halo_resident_structures
                else None
            )
            rep_force, rep_loss, rep_count, overflow, zero_n = (
                span_mod.span_repulsion_forces(
                    pos_full.astype(jnp.float32),
                    inv_w.astype(jnp.float32),
                    weights.astype(jnp.float32),
                    dg.colors,
                    index,
                    opts,
                    interpret=(span_mode == "interpret"),
                    tables=tables,
                    shard=(axis_name, Pn),
                    edge_chunk=echunk,
                    resident_blocks=resident,
                )
            )
            rep_force = rep_force.astype(dtype)
        else:
            rep_force, rep_loss, rep_count, overflow, zero_n = (
                cand_mod.bucket_repulsion_forces(
                    pos_full, inv_w, weights, dg, index, opts, rep_key,
                    shard=(axis_name, Pn),
                )
            )
        rep_pad = jnp.zeros((n_pad, d), dtype).at[:n].set(rep_force)
        zero_pad = jnp.zeros((n_pad,), jnp.int32).at[:n].set(zero_n)
        rep_l = lax.psum_scatter(rep_pad, axis_name, scatter_dimension=0, tiled=True)
        zero_l = lax.psum_scatter(zero_pad, axis_name, scatter_dimension=0, tiled=True)
        rep_loss, rep_count, overflow = lax.psum(
            (rep_loss, rep_count, overflow), axis_name
        )
        force_l = force_l + rep_l

        # coincident-point kicks, drawn with the single-chip shape (n, d)
        # and gathered to local rows — bit-exact parity with the
        # single-chip step (a sphere-radius-0 layered expansion starts
        # siblings coincident, so this path fires on real runs)
        def with_kicks(f):
            kicks_full = forces.random_unit_vectors(kick_key, (n,), d, dtype)
            kicks_l = kicks_full[jnp.minimum(rows_global, n - 1)]
            return f + kicks_l * zero_l[:, None].astype(dtype)

        force_l = lax.cond(
            lax.psum(jnp.sum(zero_l), axis_name) > 0, with_kicks, lambda f: f,
            force_l,
        )
        if opts.centre_scale != 0.0:
            force_l = force_l + forces.centre_forces(pos_l, opts)

        t = state.iteration + 1
        new_pos_l, m_l, v_l = step_mod._apply_optimizer(
            opts, hp, pos_l, force_l, state, t
        )
        # gravity: global centroid via scalar psum; padded rows pinned at 0
        mean = lax.psum(
            jnp.sum(jnp.where(real_row[:, None], new_pos_l, 0.0), axis=0), axis_name
        ) / n
        new_pos_l = jnp.where(real_row[:, None], new_pos_l - mean, new_pos_l)
        delta = jnp.where(
            real_row[:, None], (new_pos_l - pos_l).astype(jnp.float32), 0.0
        )
        pos_change = lax.psum(jnp.sum(delta * delta), axis_name) / n

        return EmbedState(
            positions=new_pos_l,
            adam_m=m_l,
            adam_v=v_l,
            iteration=t,
            key=key,
            attract_loss=att_loss,
            repel_loss=rep_loss,
            pos_change=pos_change,
            num_rep_forces=rep_count,
            overflow=overflow,
        )

    state_specs = EmbedState(
        positions=P(axis_name), adam_m=P(axis_name), adam_v=P(axis_name),
        iteration=P(), key=P(), attract_loss=P(), repel_loss=P(),
        pos_change=P(), num_rep_forces=P(), overflow=P(),
    )
    sharded = shard_map(
        halo_step,
        mesh=mesh,
        in_specs=(state_specs, P(), P(), P(), P(axis_name))
        + (P(axis_name),) * 7,
        out_specs=state_specs,
        check_vma=False,
    )

    def step(state, weights, inv_w, tables=None, echunk=None):
        return sharded(state, weights, inv_w, tables, echunk, *plan_dev)

    jitted = jax.jit(step)

    def shard_state(state: EmbedState) -> EmbedState:
        """Pad per-vertex arrays to n_pad and device_put with row sharding."""
        def pad_rows(a):
            a = np.asarray(a)
            out = np.zeros((n_pad,) + a.shape[1:], a.dtype)
            out[: a.shape[0]] = a
            return out

        return EmbedState(
            positions=jax.device_put(pad_rows(state.positions), row_sharding),
            adam_m=jax.device_put(pad_rows(state.adam_m), row_sharding),
            adam_v=jax.device_put(pad_rows(state.adam_v), row_sharding),
            iteration=jax.device_put(state.iteration, replicated),
            key=jax.device_put(state.key, replicated),
            attract_loss=jax.device_put(state.attract_loss, replicated),
            repel_loss=jax.device_put(state.repel_loss, replicated),
            pos_change=jax.device_put(state.pos_change, replicated),
            num_rep_forces=jax.device_put(state.num_rep_forces, replicated),
            overflow=jax.device_put(state.overflow, replicated),
        )

    step.sharded = sharded  # raw shard_map step for the while-loop driver
    jitted.row_sharding = row_sharding  # for (re)building sharded echunks
    return jitted, plan, dg, index, shard_state


@partial(jax.jit, static_argnames=("step",))
def halo_run_embedding(
    step,
    state,
    weights,
    inv_w,
    max_iterations,
    position_min_change,
    stop_on_overflow=False,
    tables=None,
    echunk=None,
):
    """Full vertex-sharded calculateEmbedding as one device-side while-loop.

    Loop parameters are TRACED; with ``stop_on_overflow`` the loop exits
    as soon as a step truncates candidate windows so the host can widen
    them (same protocol as the single-chip ``run_embedding``)."""
    stop_on_overflow = jnp.asarray(stop_on_overflow, bool)

    def cond(s):
        return (
            (s.iteration < max_iterations)
            & (s.pos_change >= position_min_change)
            & (~stop_on_overflow | (s.overflow == 0))
        )

    return lax.while_loop(
        cond, lambda s: step(s, weights, inv_w, tables, echunk), state
    )


class HaloEmbedder(SpanGrowthMixin):
    """Host driver for the vertex-sharded backend — the multi-device
    counterpart of WEmbedEmbedder for graphs whose state exceeds one
    device's memory.  Public surface mirrors the reference Embedder
    (include/wembed.h:105-145): calculate_step / calculate_embedding /
    get_loss / get_timings / set_coordinates, plus full-state
    checkpointability (core/checkpoint.py)."""

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
        from ..core import weights as weights_mod
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
        self._step, self.plan, self._dg, self._index, self._shard_state = (
            build_halo_step(graph, self.opts, self._weights_np, self.mesh)
        )
        self._tables = (
            self._index.device_tables()
            if isinstance(self._index, span_mod.SpanIndex)
            else None
        )
        self._echunk = self._build_echunk()
        self._state = self._shard_state(
            init_state(
                np.asarray(initial_coordinates, dtype=np.float64),
                rng_mod.new_key(),
                dtype=self._dtype,
            )
        )
        self._presize_spans()

    def _build_echunk(self):
        """Device-put the sharded (P, E_dev) correction-edge tables —
        O(E/P) live bytes per device (the memory-scalable configuration).
        Fully STATIC: window coverage is derived in-trace from the traced
        blk_t tables, so growth never touches these."""
        if not isinstance(self._index, span_mod.SpanIndex):
            return None
        chunks = span_mod.build_edge_chunks(
            self._index, self.mesh.devices.size
        )
        rs = self._step.row_sharding
        return span_mod.EdgeChunk(
            *(jax.device_put(jnp.asarray(a), rs) for a in chunks)
        )

    # span growth protocol: SpanGrowthMixin (core/span_driver.py)
    def _span_positions_np(self):
        return self.get_coordinates()

    def _swap_index(self, new_index) -> None:
        same_bucket = new_index.w_pad == self._index.w_pad
        self._index = new_index
        self._tables = new_index.device_tables()
        if not same_bucket:
            self._step, self.plan, self._dg, self._index, self._shard_state = (
                build_halo_step(
                    self.graph, self.opts, self._weights_np, self.mesh,
                    index=new_index,
                )
            )

    # ------------------------------------------------------------ embedding
    @property
    def state(self) -> EmbedState:
        return self._state

    @state.setter
    def state(self, s: EmbedState) -> None:
        """Accepts a HOST/replicated state with (n, ...) per-vertex arrays
        (checkpoint restore) and re-shards it; sharded states pass through."""
        if s.positions.shape[0] == self.plan.n_pad:
            self._state = s
        else:
            self._state = self._shard_state(s)

    @property
    def host_state(self) -> EmbedState:
        """The state with per-vertex arrays gathered and trimmed to (n, ...)
        — the checkpointable (device-count-independent) layout."""
        n = self.graph.num_vertices
        return self._state._replace(
            positions=jnp.asarray(np.asarray(self._state.positions)[:n]),
            adam_m=jnp.asarray(np.asarray(self._state.adam_m)[:n]),
            adam_v=jnp.asarray(np.asarray(self._state.adam_v)[:n]),
        )

    def calculate_step(self) -> None:
        with self.timer.phase("step", "Embedding step"):
            self._state = self._step(
                self._state, self._weights, self._inv_w, self._tables,
                self._echunk,
            )
            self._state.positions.block_until_ready()
        if int(self._state.overflow) > 0 and self._grow_spans():
            self._announce_growth(int(self._state.overflow))
            self._state = self._state._replace(
                overflow=jnp.asarray(0, jnp.int32)
            )

    def calculate_embedding(self, max_iterations: int | None = None) -> None:
        """Run to convergence; on truncated candidate windows, exit the
        device loop, widen them from measured needs, and resume — never
        converge silently under truncation (the reference's exact index
        cannot truncate, WeightedIndex.cpp:65-100)."""
        cap = (
            self.opts.max_iterations
            if max_iterations is None
            else max_iterations
        )
        with self.timer.phase("embedding_all", "Embedding"):
            # shared growth/shrink protocol: SpanGrowthMixin._drive_device_loop
            def run_segment(seg_cap, stop_on_overflow):
                self._state = halo_run_embedding(
                    self._step, self._state, self._weights, self._inv_w,
                    seg_cap, self.opts.position_min_change,
                    stop_on_overflow, self._tables, self._echunk,
                )
                self._state.positions.block_until_ready()

            self._drive_device_loop(run_segment, cap)

    def is_finished(self) -> bool:
        return int(self._state.iteration) >= self.opts.max_iterations or (
            int(self._state.iteration) > 0
            and float(self._state.pos_change) < self.opts.position_min_change
        )

    # ------------------------------------------------------------- accessors
    def get_coordinates(self) -> np.ndarray:
        return np.asarray(self._state.positions, dtype=np.float64)[
            : self.graph.num_vertices
        ]

    def get_weights(self) -> np.ndarray:
        return self._weights_np.copy()

    def set_coordinates(self, coordinates: np.ndarray) -> None:
        coordinates = np.asarray(coordinates, dtype=np.float64)
        n, d = self.graph.num_vertices, self.opts.embedding_dimension
        if coordinates.shape != (n, d):
            raise ValueError(f"expected ({n}, {d}) coordinates")
        host = self.host_state._replace(
            positions=jnp.asarray(coordinates, self._dtype)
        )
        self._state = self._shard_state(host)
        self._presize_spans()

    def set_weights(self, w: np.ndarray) -> None:
        """New weights change the bucket structure: rebuild the sharded
        step (checkpoint-restore path, core/checkpoint.py)."""
        from ..core import weights as weights_mod

        w = np.asarray(w, dtype=np.float64)
        if w.shape != (self.graph.num_vertices,):
            raise ValueError(f"weights shape {w.shape}")
        self._weights_np = w
        dim = self.opts.embedding_dimension
        self._weights = jnp.asarray(w, dtype=self._dtype)
        self._inv_w = jnp.asarray(
            weights_mod.inv_exp_weights(w, dim), dtype=self._dtype
        )
        self._span_scale = 1.0
        self._growth_events = 0
        self._step, self.plan, self._dg, self._index, self._shard_state = (
            build_halo_step(self.graph, self.opts, self._weights_np, self.mesh)
        )
        self._tables = (
            self._index.device_tables()
            if isinstance(self._index, span_mod.SpanIndex)
            else None
        )
        self._echunk = self._build_echunk()
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
