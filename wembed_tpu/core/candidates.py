"""Weight-bucketed repulsion-candidate generation — the TPU spatial index.

Re-design of the reference's performance-critical repulsion machinery
(reference: src/embeddingLib/src/spacialQuery/WeightedIndex.cpp:10-100, the
vendored SNN exact radius index src/SNN/src/snn.cpp:97-160, and the external
Rust ``sprk`` crate) as an on-device projected-sort candidate kernel:

  1. Vertices are partitioned once per embedder into geometric weight
     buckets (doubling thresholds, WeightedIndex.cpp:51-63).  Weights are
     constant across iterations, so bucket membership is STATIC — computed
     host-side at build time, giving every bucket static shapes.
  2. Per iteration, per bucket: center the member positions, find the first
     principal axis by power iteration on the (d, d) covariance (the moral
     equivalent of SNN's one-shot SVD projection, snn.cpp:97-147), sort
     members by their projection.
  3. Every vertex queries every bucket with the conservative radius
     edgeLength * (w_v * bucketMaxWeight)^(1/d) (WeightedIndex.cpp:65-81):
     a searchsorted window over the sorted projections, gathered at a fixed
     per-bucket capacity, then exact-distance filtered.  Fixed capacities
     keep all shapes static; truncation is surfaced via an overflow counter
     (SURVEY.md §7 hard part #1).

Repulsion forces are accumulated directly from the windows — the candidate
list is never materialized as a ragged structure.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .forces import _edge_membership, _weight_scaling, random_unit_vectors
from .options import EmbedderOptions
from .state import DeviceGraph


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


@dataclass(frozen=True)
class Bucket:
    """Static description of one weight class of the index."""

    members: np.ndarray  # (n_b,) int32 global vertex ids
    max_weight: float  # conservative weight bound for query radii
    capacity: int  # candidate window size (== n_b when fully scanned)
    sample_size: int  # members inserted per step (IndexSize < 1 subsamples)


@dataclass(frozen=True)
class BucketIndex:
    """The static skeleton of the weighted spatial index."""

    buckets: tuple[Bucket, ...]

    @staticmethod
    def build(weights: np.ndarray, opts: EmbedderOptions) -> "BucketIndex":
        thresholds = doubling_weight_buckets(weights, opts.doubling_factor)
        # upper_bound: first threshold strictly greater than w
        # (WeightedIndex.cpp:22-28)
        assignment = np.searchsorted(thresholds, weights, side="right")
        max_of_bucket = np.concatenate([thresholds, [float(np.max(weights))]])
        buckets = []
        for b in range(thresholds.shape[0] + 1):
            members = np.flatnonzero(assignment == b).astype(np.int32)
            if members.shape[0] == 0:
                continue
            n_b = members.shape[0]
            sample = n_b
            if opts.index_size < 1.0:
                sample = max(1, int(np.ceil(n_b * opts.index_size)))
            capacity = min(sample, opts.window_capacity)
            # tiny buckets (the heavy-weight tail) are scanned exhaustively —
            # the reference replicates this effect because its top buckets
            # hold few nodes (SURVEY.md §5.8)
            if sample <= 2 * opts.window_capacity:
                capacity = sample
            buckets.append(
                Bucket(
                    members=members,
                    max_weight=float(max_of_bucket[b]),
                    capacity=int(capacity),
                    sample_size=int(sample),
                )
            )
        return BucketIndex(buckets=tuple(buckets))


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
    """Sparse repulsion over bucketed candidate windows.

    Returns (force (n, d), repel_loss, num_rep_candidates, overflow).
    ``num_rep_candidates`` counts exact-radius candidates that pass the
    neighbor/color filters — the analogue of the reference's
    numRepForceCalculations (NewWEmbedEmbedder.cpp:321-332).  ``overflow``
    counts candidates lost to window truncation (zero when capacity
    suffices; surfaced because the reference's exact index cannot truncate).
    """
    n, d = positions.shape
    dtype = positions.dtype
    L = opts.edge_length
    inv_d = 1.0 / d

    force = jnp.zeros_like(positions)
    loss = jnp.asarray(0.0, jnp.float32)
    count = jnp.asarray(0, jnp.int32)
    overflow = jnp.asarray(0, jnp.int32)
    zero_count = jnp.zeros((n,), jnp.int32)

    row_ids = jnp.arange(n, dtype=jnp.int32)[:, None]
    key_iter = jax.random.split(key, len(index.buckets) + 1)
    kick_key = key_iter[0]

    for bi, bucket in enumerate(index.buckets):
        members = jnp.asarray(bucket.members)
        if bucket.sample_size < bucket.members.shape[0]:
            # IndexSize < 1: re-sample the inserted members each step
            # (reference NewWEmbedEmbedder.cpp:271-285; stratified per bucket
            # here so shapes stay static — documented deviation)
            perm = jax.random.permutation(key_iter[bi + 1], members.shape[0])
            members = members[perm[: bucket.sample_size]]
        xb = positions[members]  # (n_b, d)
        mean = jnp.mean(xb, axis=0)
        xc = xb - mean
        axis = _principal_axis(xc)
        proj = xc @ axis  # (n_b,)
        order = jnp.argsort(proj)
        sproj = proj[order]
        sids = members[order]
        spos = xb[order]

        qproj = (positions - mean) @ axis  # (n,)
        radius = L * jnp.power(weights * bucket.max_weight, inv_d)  # (n,)
        lo = jnp.searchsorted(sproj, qproj - radius)
        hi = jnp.searchsorted(sproj, qproj + radius, side="right")

        cap = bucket.capacity
        window = lo[:, None] + jnp.arange(cap, dtype=lo.dtype)[None, :]
        in_window = window < hi[:, None]
        idx = jnp.clip(window, 0, sids.shape[0] - 1)
        cand = sids[idx]  # (n, cap) global vertex ids
        cpos = spos[idx]  # (n, cap, d)

        diff = positions[:, None, :] - cpos
        dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1))
        within = in_window & (dist <= radius[:, None])
        not_nbr = ~_edge_membership(dg, jnp.broadcast_to(row_ids, cand.shape), cand)
        valid = within & not_nbr & (dg.colors[cand] != dg.colors[row_ids])

        ws = _weight_scaling(inv_w[:, None], inv_w[cand], opts.additive_weights)
        active = valid & (dist * ws <= L) & (dist > 0)
        coeff = jnp.where(active, opts.repulsion_scale * ws / dist, 0.0)
        force = force + jnp.sum(coeff[..., None].astype(dtype) * diff, axis=1)
        loss += jnp.sum(jnp.where(active, L / ws - dist, 0.0), dtype=jnp.float32)
        count += jnp.sum(valid, dtype=jnp.int32)
        overflow += jnp.sum(jnp.maximum(hi - lo - cap, 0), dtype=jnp.int32)
        zero_count += jnp.sum((dist <= 0) & valid, axis=1, dtype=jnp.int32)

    def with_kicks(f):
        kicks = random_unit_vectors(kick_key, (n,), d, dtype)
        return f + kicks * zero_count[:, None].astype(dtype)

    force = lax.cond(jnp.any(zero_count > 0), with_kicks, lambda f: f, force)
    return force, loss, count, overflow
