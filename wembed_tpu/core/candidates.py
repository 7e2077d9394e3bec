"""Weight-bucketed repulsion-candidate generation — the TPU spatial index.

Re-design of the reference's performance-critical repulsion machinery
(reference: src/embeddingLib/src/spacialQuery/WeightedIndex.cpp:10-100, the
vendored SNN exact radius index src/SNN/src/snn.cpp:97-160, and the external
Rust ``sprk`` crate) as an on-device blocked sort-merge candidate kernel:

  1. Vertices are partitioned once per embedder into geometric weight
     buckets (doubling thresholds, WeightedIndex.cpp:51-63).  Weights are
     constant across iterations, so bucket membership is STATIC — computed
     host-side at build time, giving every bucket static shapes.
  2. Per iteration, all positions are projected onto one global principal
     axis (power iteration on the (d, d) covariance — the moral equivalent
     of SNN's SVD projection, snn.cpp:97-147).  Queries are sorted by
     projection once; each bucket's members are sorted by the same
     projection.
  3. Every vertex queries every bucket with the conservative radius
     edgeLength * (w_v * bucketMaxWeight)^(1/d) (WeightedIndex.cpp:65-81).
     Queries are processed in blocks of Q consecutive sorted projections;
     each block reads ONE contiguous span of the bucket's sorted members
     that covers all its windows, then applies the exact distance filter.
     Contiguous spans mean the hot loop does block-level slices instead of
     per-candidate random gathers — the difference between HBM streaming
     and pointer chasing on TPU.  Fixed span sizes keep all shapes static;
     truncation is surfaced via an overflow counter (SURVEY.md §7 hard
     part #1).

Neighbor filtering (the reference's areNeighbors check at candidate time,
NewWEmbedEmbedder.cpp:328) is NOT done per candidate — that costs
O(n*K*log deg) random gathers.  Instead the candidate pass repels every
in-radius pair and an O(E) edge-correction pass subtracts exactly the
contributions of pairs that are graph neighbors, reproducing the filtered
semantics bit-for-bit (each directed edge recomputes whether its endpoint
fell inside the candidate span, including truncation).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .forces import _weight_scaling, random_unit_vectors
from .options import EmbedderOptions
from .state import DeviceGraph


_NO_RANK = np.int32(2**30)  # rank sentinel: never inside any span
_QUERY_BLOCK = 256  # queries per block (Q)
_SENTINEL_POS = 1e15  # padded query coordinate; far from everything, finite


def doubling_weight_buckets(weights: np.ndarray, doubling_factor: float) -> np.ndarray:
    """Bucket thresholds min*f, min*f^2, ... < max
    (reference WeightedIndex.cpp:51-63)."""
    wmin, wmax = float(np.min(weights)), float(np.max(weights))
    buckets = []
    current = wmin * doubling_factor
    while current < wmax:
        buckets.append(current)
        current *= doubling_factor
    return np.asarray(buckets, dtype=np.float64)


def _pad_to(x: np.ndarray, multiple: int, fill) -> tuple[np.ndarray, np.ndarray]:
    n = x.shape[0]
    target = max(multiple, ((n + multiple - 1) // multiple) * multiple)
    mask = np.zeros(target, bool)
    mask[:n] = True
    return np.concatenate([x, np.full(target - n, fill, dtype=x.dtype)]), mask


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclass(frozen=True)
class Bucket:
    """Static description of one weight class of the index."""

    members: np.ndarray  # (n_b,) int32 global vertex ids
    max_weight: float  # conservative weight bound for query radii
    span: int  # per-query-block member span size (static)
    sample_size: int  # members inserted per step (IndexSize < 1 subsamples)
    # directed edges whose DST lies in this bucket, padded (for correction)
    edge_src: np.ndarray
    edge_dst: np.ndarray
    edge_mask: np.ndarray


@dataclass(frozen=True)
class BucketIndex:
    """The static skeleton of the weighted spatial index."""

    buckets: tuple[Bucket, ...]
    n: int

    @staticmethod
    def build(
        weights: np.ndarray,
        opts: EmbedderOptions,
        edge_src: np.ndarray | None = None,
        edge_dst: np.ndarray | None = None,
    ) -> "BucketIndex":
        """``edge_src``/``edge_dst`` are the directed edge arrays of the
        graph; they are grouped by destination bucket for the correction
        pass.  Omit them only for index-only uses (tests)."""
        n = weights.shape[0]
        thresholds = doubling_weight_buckets(weights, opts.doubling_factor)
        # upper_bound: first threshold strictly greater than w
        # (WeightedIndex.cpp:22-28)
        assignment = np.searchsorted(thresholds, weights, side="right")
        max_of_bucket = np.concatenate([thresholds, [float(np.max(weights))]])
        if edge_src is None:
            edge_src = np.empty(0, np.int32)
            edge_dst = np.empty(0, np.int32)
        dst_bucket = assignment[edge_dst] if edge_dst.size else edge_dst

        buckets = []
        for b in range(thresholds.shape[0] + 1):
            members = np.flatnonzero(assignment == b).astype(np.int32)
            if members.shape[0] == 0:
                continue
            n_b = members.shape[0]
            sample = n_b
            if opts.index_size < 1.0:
                sample = max(1, int(np.ceil(n_b * opts.index_size)))
            # span: expected members under a block of Q sorted queries
            # (Q * density * safety) plus the radius window width knob
            expected = _QUERY_BLOCK * sample / max(n, 1)
            span = _round_up(int(3 * expected) + opts.window_capacity, 64)
            span = min(span, _round_up(sample, 8))
            sel = np.flatnonzero(dst_bucket == b)
            esrc, _ = _pad_to(edge_src[sel].astype(np.int32), 512, 0)
            edst, emask = _pad_to(edge_dst[sel].astype(np.int32), 512, 0)
            buckets.append(
                Bucket(
                    members=members,
                    max_weight=float(max_of_bucket[b]),
                    span=int(span),
                    sample_size=int(sample),
                    edge_src=esrc,
                    edge_dst=edst,
                    edge_mask=emask,
                )
            )
        return BucketIndex(buckets=tuple(buckets), n=n)


def _principal_axis(x_centered: jax.Array, iters: int = 12) -> jax.Array:
    """First principal axis of centered rows via power iteration on the
    (d, d) covariance — replaces SNN's BDCSVD (reference
    src/SNN/src/eign.cpp:32-43) with a few tiny matmuls."""
    d = x_centered.shape[1]
    cov = x_centered.T @ x_centered  # (d, d)
    v = jnp.full((d,), 1.0, dtype=x_centered.dtype) + jnp.arange(
        d, dtype=x_centered.dtype
    ) * jnp.asarray(1e-3, x_centered.dtype)
    v = v / jnp.linalg.norm(v)

    def body(_, v):
        w = cov @ v
        norm = jnp.linalg.norm(w)
        return jnp.where(norm > 0, w / jnp.where(norm > 0, norm, 1.0), v)

    return lax.fori_loop(0, iters, body, v)


def bucket_repulsion_forces(
    positions: jax.Array,
    inv_w: jax.Array,
    weights: jax.Array,
    dg: DeviceGraph,
    index: BucketIndex,
    opts: EmbedderOptions,
    key: jax.Array,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Sparse repulsion over bucketed candidate spans.

    Returns (force (n, d), repel_loss, num_rep_candidates, overflow).
    ``num_rep_candidates`` counts exact-radius candidates that pass the
    neighbor/color filters — the analogue of the reference's
    numRepForceCalculations (NewWEmbedEmbedder.cpp:321-332).  ``overflow``
    counts members dropped by span truncation (zero when spans suffice;
    surfaced because the reference's exact index cannot truncate).
    """
    n, d = positions.shape
    dtype = positions.dtype
    L = opts.edge_length
    inv_d = 1.0 / d
    L2 = jnp.asarray(L * L, dtype)

    colors = dg.colors
    key_iter = jax.random.split(key, len(index.buckets) + 1)
    kick_key = key_iter[0]

    # ---- global projection axis + sorted queries (shared by all buckets)
    mean = jnp.mean(positions, axis=0)
    centered = positions - mean
    axis = _principal_axis(centered)
    qproj = centered @ axis  # (n,)
    radius_all = (L * jnp.power(weights * jnp.asarray(1.0, dtype), inv_d)).astype(dtype)
    del radius_all  # per-bucket radii computed below

    n_pad = _round_up(n, _QUERY_BLOCK)
    nblocks = n_pad // _QUERY_BLOCK
    pad = n_pad - n
    qproj_p = jnp.concatenate([qproj, jnp.full((pad,), _SENTINEL_POS, dtype)])
    qorder = jnp.argsort(qproj_p)  # sentinels sort to the end
    # sorted query-side arrays (contiguous per block after this one gather)
    qpos_s = jnp.concatenate(
        [positions, jnp.full((pad, d), _SENTINEL_POS, dtype)]
    )[qorder]
    qproj_s = qproj_p[qorder]
    qw_s = jnp.concatenate([weights.astype(dtype), jnp.ones((pad,), dtype)])[qorder]
    qinvw_s = jnp.concatenate([inv_w.astype(dtype), jnp.ones((pad,), dtype)])[qorder]
    qcolor_s = jnp.concatenate([colors, jnp.full((pad,), -2, colors.dtype)])[qorder]
    qreal_s = qorder < n

    # per-query block id, for the correction pass (scatter; drop sentinels)
    block_of = jnp.zeros((n,), jnp.int32)
    block_ids_sorted = (
        jnp.arange(n_pad, dtype=jnp.int32) // _QUERY_BLOCK
    )
    block_of = block_of.at[qorder].set(block_ids_sorted, mode="drop")

    force_sorted = jnp.zeros((n_pad, d), dtype)
    loss = jnp.asarray(0.0, jnp.float32)
    count = jnp.asarray(0, jnp.int32)
    overflow = jnp.asarray(0, jnp.int32)
    zero_sorted = jnp.zeros((n_pad,), jnp.int32)

    # ---- per-bucket member structures + per-block span starts
    structs = []
    rank_of = jnp.full((n,), _NO_RANK, jnp.int32)
    for bi, bucket in enumerate(index.buckets):
        members = jnp.asarray(bucket.members)
        if bucket.sample_size < bucket.members.shape[0]:
            # IndexSize < 1: re-sample the inserted members each step
            # (reference NewWEmbedEmbedder.cpp:271-285; stratified per bucket
            # here so shapes stay static — documented deviation)
            perm = jax.random.permutation(key_iter[bi + 1], members.shape[0])
            members = members[perm[: bucket.sample_size]]
        mproj = qproj[members]
        order = jnp.argsort(mproj)
        sids = members[order]
        sproj = mproj[order]
        spos = positions[sids]
        rank_of = rank_of.at[sids].set(jnp.arange(sids.shape[0], dtype=jnp.int32))

        # per-block conservative window bounds over this bucket
        radius = (L * jnp.power(qw_s * bucket.max_weight, inv_d)).astype(dtype)
        qlo = jnp.where(qreal_s, qproj_s - radius, jnp.asarray(np.inf, dtype))
        qhi = jnp.where(qreal_s, qproj_s + radius, jnp.asarray(-np.inf, dtype))
        block_lo = jnp.min(qlo.reshape(nblocks, _QUERY_BLOCK), axis=1)
        block_hi = jnp.max(qhi.reshape(nblocks, _QUERY_BLOCK), axis=1)
        start = jnp.searchsorted(sproj, block_lo).astype(jnp.int32)  # (nblocks,)
        stop = jnp.searchsorted(sproj, block_hi, side="right").astype(jnp.int32)
        overflow += jnp.sum(
            jnp.maximum(stop - start - bucket.span, 0), dtype=jnp.int32
        )
        structs.append((bucket, sids, sproj, spos, radius, start))

    # ---- candidate pass: block x span interactions (color filter only —
    # neighbors are handled by the correction pass below).  Blocks are
    # processed in groups via lax.map so peak memory stays bounded for
    # large graphs.
    qp_blocks = qpos_s.reshape(nblocks, _QUERY_BLOCK, d)
    qcolor_blocks = qcolor_s.reshape(nblocks, _QUERY_BLOCK)
    qinvw_blocks = qinvw_s.reshape(nblocks, _QUERY_BLOCK)

    for bucket, sids, sproj, spos, radius, start in structs:
        S = bucket.span
        n_b = sids.shape[0]
        r_blocks = radius.reshape(nblocks, _QUERY_BLOCK)

        def process_blocks(args, *, S=S, n_b=n_b, sids=sids, spos=spos):
            start_g, qp_g, r_g, qcolor_g, qinvw_g = args  # leading dim: group
            span_idx = start_g[:, None] + jnp.arange(S, dtype=jnp.int32)[None, :]
            span_ok = span_idx < n_b
            idx = jnp.minimum(span_idx, n_b - 1)
            # contiguous block-level reads of the sorted member arrays
            span_pos = spos[idx]  # (G, S, d)
            span_ids = sids[idx]
            span_invw = inv_w[span_ids].astype(dtype)
            span_color = colors[span_ids]

            diff = qp_g[:, :, None, :] - span_pos[:, None, :, :]  # (G, Q, S, d)
            dist2 = jnp.sum(diff * diff, axis=-1)
            valid = (
                span_ok[:, None, :]
                & (dist2 <= (r_g * r_g)[:, :, None])
                & (span_color[:, None, :] != qcolor_g[:, :, None])
            )
            ws = _weight_scaling(
                qinvw_g[:, :, None], span_invw[:, None, :], opts.additive_weights
            )
            pos_dist2 = dist2 > 0
            active = valid & (dist2 * ws * ws <= L2) & pos_dist2
            inv_dist = lax.rsqrt(jnp.maximum(dist2, jnp.asarray(1e-30, dtype)))
            coeff = jnp.where(
                active, opts.repulsion_scale * ws * inv_dist, 0.0
            ).astype(dtype)
            f_g = jnp.einsum("bqs,bqsd->bqd", coeff, diff)
            loss_g = jnp.sum(
                jnp.where(active, L / ws - jnp.sqrt(dist2), 0.0), dtype=jnp.float32
            )
            count_g = jnp.sum(valid, dtype=jnp.int32)
            zero_g = jnp.sum(valid & ~pos_dist2, axis=2, dtype=jnp.int32)
            return f_g, loss_g, count_g, zero_g

        # group size: keep (G, Q, S) work arrays around ~4M elements
        group = max(1, min(nblocks, 2**22 // (_QUERY_BLOCK * S)))
        ngroups = (nblocks + group - 1) // group
        if ngroups <= 1:
            f_all, loss_b, count_b, zero_b = process_blocks(
                (start, qp_blocks, r_blocks, qcolor_blocks, qinvw_blocks)
            )
            force_sorted = force_sorted + f_all.reshape(n_pad, d)
            loss += loss_b
            count += count_b
            zero_sorted += zero_b.reshape(n_pad)
        else:
            # pad the block axis with inert blocks (start=n_b masks the span,
            # sentinel queries are beyond every radius)
            bpad = ngroups * group - nblocks

            def pad_blocks(x, fill):
                shape = (bpad,) + x.shape[1:]
                return jnp.concatenate([x, jnp.full(shape, fill, x.dtype)])

            stacked = (
                pad_blocks(start, n_b).reshape(ngroups, group),
                pad_blocks(qp_blocks, _SENTINEL_POS).reshape(
                    ngroups, group, _QUERY_BLOCK, d
                ),
                pad_blocks(r_blocks, 0.0).reshape(ngroups, group, _QUERY_BLOCK),
                pad_blocks(qcolor_blocks, -2).reshape(ngroups, group, _QUERY_BLOCK),
                pad_blocks(qinvw_blocks, 1.0).reshape(ngroups, group, _QUERY_BLOCK),
            )
            f_all, loss_b, count_b, zero_b = lax.map(process_blocks, stacked)
            force_sorted = force_sorted + f_all.reshape(-1, d)[:n_pad]
            loss += jnp.sum(loss_b)
            count += jnp.sum(count_b)
            zero_sorted += zero_b.reshape(-1)[:n_pad]

    # unsort query-side accumulators back to vertex order
    force = jnp.zeros((n, d), dtype).at[qorder].add(force_sorted, mode="drop")
    zero_count = jnp.zeros((n,), jnp.int32).at[qorder].add(zero_sorted, mode="drop")

    # ---- O(E) correction — subtract neighbor pairs the spans wrongly
    # repelled (reference filters them at candidate time,
    # NewWEmbedEmbedder.cpp:328)
    for bucket, sids, sproj, spos, radius, start in structs:
        if bucket.edge_src.shape[0] == 0:
            continue
        esrc = jnp.asarray(bucket.edge_src)
        edst = jnp.asarray(bucket.edge_dst)
        emask = jnp.asarray(bucket.edge_mask)
        psrc = positions[esrc]
        pdst = positions[edst]
        r_e = (L * jnp.power(weights[esrc] * bucket.max_weight, inv_d)).astype(dtype)
        rank = rank_of[edst]
        span_start = start[block_of[esrc]]
        diff = psrc - pdst
        dist2 = jnp.sum(diff * diff, axis=-1)
        # (rank - span_start) in [0, S) mirrors the candidate pass's span
        # exactly (same searchsorted-derived starts), so float-boundary
        # pairs are treated consistently in both passes
        included = (
            emask
            & (dist2 <= r_e * r_e)
            & (rank >= span_start)
            & (rank < span_start + bucket.span)
            & (colors[esrc] != colors[edst])
        )
        ws = _weight_scaling(inv_w[esrc], inv_w[edst], opts.additive_weights)
        pos_dist2 = dist2 > 0
        active = included & (dist2 * ws * ws <= L2) & pos_dist2
        inv_dist = lax.rsqrt(jnp.maximum(dist2, jnp.asarray(1e-30, dtype)))
        coeff = jnp.where(active, opts.repulsion_scale * ws * inv_dist, 0.0)
        force = force - jax.ops.segment_sum(
            coeff[:, None].astype(dtype) * diff, esrc, num_segments=n
        )
        loss -= jnp.sum(
            jnp.where(active, L / ws - jnp.sqrt(dist2), 0.0), dtype=jnp.float32
        )
        count -= jnp.sum(included, dtype=jnp.int32)
        zero_count -= jax.ops.segment_sum(
            (included & ~pos_dist2).astype(jnp.int32), esrc, num_segments=n
        )

    def with_kicks(f):
        kicks = random_unit_vectors(kick_key, (n,), d, dtype)
        return f + kicks * zero_count[:, None].astype(dtype)

    force = lax.cond(jnp.any(zero_count > 0), with_kicks, lambda f: f, force)
    return force, loss, count, overflow
