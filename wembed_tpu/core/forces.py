"""Force computation: attraction over edges, repulsion, centre, gravity.

TPU-native re-design of the reference's force loops
(reference: src/embeddingLib/src/embedder/NewWEmbedEmbedder.cpp:188-363).

Semantics reproduced exactly (SURVEY.md §7 "quirks as spec"):
  * weighted distance = dist * invw_v * invw_u  (invw = w^(-1/d)); the
    ``additive_weights`` option swaps the product for a sum
    (NewWEmbedEmbedder.cpp:205-207,239-240)
  * dead-zone hinge forces: attraction only when dist*ws > edgeLength
    (force = attractionScale * ws toward the neighbor,
    NewWEmbedEmbedder.cpp:210-215); repulsion only when dist*ws <= edgeLength
    (force = repulsionScale * ws away, NewWEmbedEmbedder.cpp:242-247)
  * losses: attraction sums (dist - L/ws) over active edges, repulsion sums
    (L/ws - dist) over active pairs
  * coincident points (dist == 0) get a random unit-vector kick
    (NewWEmbedEmbedder.cpp:197-200,229-233)
  * forces are ASCENT directions — the optimizer adds them

The all-pairs repulsion is expressed as two MXU matmuls per row-block
(Gram matrix for distances; coefficient-matrix times positions for the
force), instead of the reference's per-node query loops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from .options import EmbedderOptions
from .state import DeviceGraph


def _weight_scaling(inv_w_a, inv_w_b, additive: bool):
    return inv_w_a + inv_w_b if additive else inv_w_a * inv_w_b


def random_unit_vectors(key, shape_prefix, dim, dtype):
    """Gaussian direction normalized to unit length (reference
    DVec.hpp:408-427 setToRandomUnitVector)."""
    g = jax.random.normal(key, (*shape_prefix, dim), dtype=dtype)
    norm = jnp.linalg.norm(g, axis=-1, keepdims=True)
    return g / jnp.where(norm > 0, norm, 1.0)


# ---------------------------------------------------------------- attraction


def attraction_forces(
    positions: jax.Array,
    inv_w: jax.Array,
    dg: DeviceGraph,
    opts: EmbedderOptions,
    key: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Edge-gradient SDDMM + segment-sum scatter.

    Returns (force (n, d), attract_loss scalar).  Each undirected edge is
    stored in both directions, so the per-directed-edge contribution
    accumulates into its source row only — race-free by construction, like
    the reference's loop-owned writes (NewWEmbedEmbedder.cpp:217).
    """
    dtype = positions.dtype
    src, dst, mask = dg.edge_src, dg.edge_dst, dg.edge_mask
    pv = positions[src]
    pu = positions[dst]
    diff = pu - pv  # attraction pulls v toward u
    dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1))
    ws = _weight_scaling(inv_w[src], inv_w[dst], opts.additive_weights)

    zero = (dist <= 0) & mask
    safe = jnp.where(dist > 0, dist, 1.0)
    active = (dist * ws > opts.edge_length) & mask
    coeff = jnp.where(active, opts.attraction_scale * ws / safe, 0.0)
    force_e = coeff[:, None].astype(dtype) * diff

    # coincident endpoints: random unit kick.  Generated lazily — the branch
    # only pays for RNG when a coincidence actually occurred.
    def with_kicks(f):
        kicks = random_unit_vectors(key, (src.shape[0],), positions.shape[1], dtype)
        return jnp.where(zero[:, None], kicks, f)

    force_e = lax.cond(jnp.any(zero), with_kicks, lambda f: f, force_e)

    force = jax.ops.segment_sum(
        force_e, src, num_segments=dg.n, indices_are_sorted=True
    )
    loss = jnp.sum(
        jnp.where(active, dist - opts.edge_length / ws, 0.0), dtype=jnp.float32
    )
    return force, loss


# ----------------------------------------------------- dense (exact) repulsion


def dense_repulsion_forces(
    positions: jax.Array,
    inv_w: jax.Array,
    adjacency: jax.Array,  # (n, n) bool, True where an edge exists
    colors: jax.Array,
    opts: EmbedderOptions,
    key: jax.Array,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Exact all-pairs repulsion in row blocks of two MXU matmuls each.

    This computes the reference's ideal candidate set (every pair whose
    weighted distance is within edgeLength repels; the spatial index merely
    approximates this superset-then-filter, WeightedIndex.cpp:65-81).
    Returns (force (n, d), repel_loss, num_rep_pairs).
    """
    n, d = positions.shape
    dtype = positions.dtype
    L = opts.edge_length
    block = min(opts.block_size, n)

    sq = jnp.sum(positions * positions, axis=-1)  # (n,)
    force = jnp.zeros_like(positions)
    loss = jnp.asarray(0.0, jnp.float32)
    count = jnp.asarray(0, jnp.int32)
    any_zero_rows = []

    for start in range(0, n, block):
        stop = min(start + block, n)
        rows = slice(start, stop)
        x = positions[rows]  # (B, d)
        gram = x @ positions.T  # (B, n) — MXU
        dist2 = sq[rows, None] + sq[None, :] - 2.0 * gram
        dist = jnp.sqrt(jnp.maximum(dist2, 0.0))
        ws = _weight_scaling(
            inv_w[rows, None], inv_w[None, :], opts.additive_weights
        )
        row_ids = jnp.arange(start, stop)
        valid = (
            ~adjacency[rows]
            & (colors[rows, None] != colors[None, :])
        )
        # colors default to unique ids, so same-color covers u == v; guard
        # the diagonal anyway for caller-supplied colorings
        valid &= row_ids[:, None] != jnp.arange(n)[None, :]

        in_range = (dist * ws <= L) & valid
        active = in_range & (dist > 0)
        coeff = jnp.where(active, opts.repulsion_scale * ws / dist, 0.0).astype(dtype)
        # F_v = sum_u coeff * (pos_v - pos_u) = pos_v * rowsum - coeff @ pos
        rowsum = jnp.sum(coeff, axis=1)
        fblock = x * rowsum[:, None] - coeff @ positions  # MXU
        force = force.at[rows].add(fblock)
        loss += jnp.sum(jnp.where(active, L / ws - dist, 0.0), dtype=jnp.float32)
        count += jnp.sum(in_range, dtype=jnp.int32)
        any_zero_rows.append(((dist <= 0) & valid).sum(axis=1))

    zero_counts = jnp.concatenate(any_zero_rows)  # (n,) coincident partners

    def with_kicks(f):
        kicks = random_unit_vectors(key, (n,), d, dtype)
        return f + kicks * zero_counts[:, None].astype(dtype)

    force = lax.cond(jnp.any(zero_counts > 0), with_kicks, lambda f: f, force)
    return force, loss, count


def build_dense_adjacency(dg: DeviceGraph) -> jax.Array:
    """(n, n) bool adjacency from the padded directed edge list.

    Dense mode is only used for small graphs (opts.dense_threshold), so
    int32 flat indices cannot overflow."""
    n = dg.n
    if n > 46340:  # n*n would overflow int32; dense mode never goes there
        raise ValueError(f"dense adjacency unsupported for n={n}")
    flat = jnp.zeros((n * n,), dtype=bool)
    idx = dg.edge_src * n + dg.edge_dst
    idx = jnp.where(dg.edge_mask, idx, 0)
    flat = flat.at[idx].max(dg.edge_mask)
    return flat.reshape(n, n)


# ------------------------------------------------ negative-sampling repulsion


def sampled_repulsion_forces(
    positions: jax.Array,
    inv_w: jax.Array,
    dg: DeviceGraph,
    opts: EmbedderOptions,
    key: jax.Array,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Random-negative-sample repulsion (numNegativeSamples > 0 path,
    reference NewWEmbedEmbedder.cpp:250-252,292-295).

    Each vertex repels ``k`` uniformly sampled vertices, forces scaled by
    n/k.  Deviation from the reference (documented): sampling is with
    replacement (the reference uses Floyd's without-replacement sampling);
    indistinguishable for k << n.
    """
    n, d = positions.shape
    dtype = positions.dtype
    k = min(int(opts.num_negative_samples), n)
    L = opts.edge_length
    kick_key, sample_key = jax.random.split(key)

    cand = jax.random.randint(sample_key, (n, k), 0, n)
    cpos = positions[cand]  # (n, k, d)
    diff = positions[:, None, :] - cpos
    dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1))
    ws = _weight_scaling(inv_w[:, None], inv_w[cand], opts.additive_weights)

    row_ids = jnp.arange(n)[:, None]
    is_nbr = _edge_membership(dg, row_ids, cand)
    valid = (dg.colors[row_ids] != dg.colors[cand]) & ~is_nbr

    scale = float(n) / float(k)
    in_range = (dist * ws <= L) & valid
    active = in_range & (dist > 0)
    coeff = jnp.where(active, opts.repulsion_scale * ws * scale / dist, 0.0)
    force = jnp.sum(coeff[..., None].astype(dtype) * diff, axis=1)
    loss = jnp.sum(jnp.where(active, L / ws - dist, 0.0), dtype=jnp.float32)
    count = jnp.sum(valid, dtype=jnp.int32)

    zero = (dist <= 0) & valid

    def with_kicks(f):
        kicks = random_unit_vectors(kick_key, (n,), d, dtype)
        return f + kicks * jnp.sum(zero, axis=1)[:, None].astype(dtype)

    force = lax.cond(jnp.any(zero), with_kicks, lambda f: f, force)
    return force, loss, count


def _edge_membership(dg: DeviceGraph, src_ids, dst_ids) -> jax.Array:
    """Vectorized areNeighbors: fixed-depth binary search of ``dst`` within
    the per-row-sorted CSR neighbor range of ``src`` (TPU replacement for
    the reference's linear CSR scan, Graph.cpp:67-83).  Depth is the static
    ceil(log2(max_degree + 1)), so the loop unrolls at trace time and never
    touches 64-bit keys."""
    src_ids = jnp.asarray(src_ids, jnp.int32)
    dst_ids = jnp.asarray(dst_ids, jnp.int32)
    lo = dg.row_ptr[src_ids]
    hi = dg.row_ptr[src_ids + 1]
    depth = max(1, int(dg.max_degree).bit_length())
    for _ in range(depth):
        mid = (lo + hi) // 2
        mid_safe = jnp.minimum(mid, dg.edge_dst.shape[0] - 1)
        val = dg.edge_dst[mid_safe]
        go_right = (val < dst_ids) & (mid < hi)
        lo = jnp.where(go_right, mid + 1, lo)
        hi = jnp.where(go_right | (mid >= hi), hi, mid)
    end = dg.row_ptr[src_ids + 1]
    found_idx = jnp.minimum(lo, dg.edge_dst.shape[0] - 1)
    return (lo < end) & (dg.edge_dst[found_idx] == dst_ids)


# ------------------------------------------------------------ centre, gravity


def centre_forces(positions: jax.Array, opts: EmbedderOptions) -> jax.Array:
    """force += -centreScale * pos (reference NewWEmbedEmbedder.cpp:338-343)."""
    return -opts.centre_scale * positions


def apply_gravity_centre(positions: jax.Array) -> jax.Array:
    """Subtract the centroid (reference NewWEmbedEmbedder.cpp:345-363)."""
    return positions - jnp.mean(positions, axis=0, keepdims=True)


def mean_squared_displacement(old: jax.Array, new: jax.Array) -> jax.Array:
    """Convergence metric: mean over vertices of squared displacement norm
    (reference NewWEmbedEmbedder.cpp:69-89)."""
    delta = (old - new).astype(jnp.float32)
    return jnp.sum(delta * delta) / old.shape[0]
