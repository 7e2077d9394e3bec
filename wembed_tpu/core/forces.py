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


def csr_segment_sum(values, row_ptr, offset=None):
    """Segment sum of src-sorted edge rows via cumsum + boundary diff.

    XLA-TPU scatter (what segment_sum lowers to) serializes per row; the
    log-depth parallel prefix streams at HBM speed.  ``values`` are the
    rows for global edge positions [offset, offset+K) (offset may be
    traced — the sharded-chunk case; None means 0); ``row_ptr`` is the
    (n+1,) CSR boundary array.  Rows outside every [row_ptr[v],
    row_ptr[v+1]) — e.g. the padded tail — are excluded by construction.

    Integer inputs are exact.  A boundary diff's float error scales with
    the GLOBAL prefix magnitude (~typ*sqrt(E) random walk), not the
    per-vertex degree a direct scatter would give, so when x64 is
    enabled (parity/CPU mode, where exactness is the point) the prefix
    accumulates in f64 and casts back — error below f32 resolution at
    any scale.  In f32 production mode the relative error is
    ~eps32*sqrt(E)/degree (≈7e-5 of a low-degree vertex's force at
    E=2e8): documented noise of the same order as the hinge-force f32
    chaos, traded for removing the serializing scatter."""
    k = values.shape[0]
    acc_dtype = (
        jnp.float64
        if jnp.issubdtype(values.dtype, jnp.floating)
        and values.dtype != jnp.float64
        and jax.config.jax_enable_x64
        else values.dtype
    )
    cz = jnp.concatenate(
        [
            jnp.zeros((1,) + values.shape[1:], acc_dtype),
            jnp.cumsum(values.astype(acc_dtype), axis=0),
        ]
    )
    if offset is None:
        lo = jnp.clip(row_ptr[:-1], 0, k)
        hi = jnp.clip(row_ptr[1:], 0, k)
    else:
        lo = jnp.clip(row_ptr[:-1] - offset, 0, k)
        hi = jnp.clip(row_ptr[1:] - offset, 0, k)
    return (cz[hi] - cz[lo]).astype(values.dtype)


# ---------------------------------------------------------------- attraction


def attraction_forces(
    positions: jax.Array,
    inv_w: jax.Array,
    dg: DeviceGraph,
    opts: EmbedderOptions,
    key: jax.Array,
    shard: tuple[str, int] | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Edge-gradient SDDMM + segment-sum scatter.

    Returns (force (n, d), attract_loss scalar).  Each undirected edge is
    stored in both directions, so the per-directed-edge contribution
    accumulates into its source row only — race-free by construction, like
    the reference's loop-owned writes (NewWEmbedEmbedder.cpp:217).

    With ``shard=(axis_name, P)`` (inside shard_map), each device processes
    its contiguous slice of the padded edge array and returns a PARTIAL
    force/loss for the caller to psum.  The edge padding must be a multiple
    of P (DeviceGraph.build pad_multiple).
    """
    dtype = positions.dtype
    src, dst, mask = dg.edge_src, dg.edge_dst, dg.edge_mask
    e_pad = src.shape[0]
    e_off = None
    eidx = None
    if shard is not None:
        axis_name, P = shard
        per = -(-e_pad // P)
        e_off = lax.axis_index(axis_name) * per
        rows = e_off + jnp.arange(per)
        valid = rows < e_pad
        eidx = jnp.minimum(rows, e_pad - 1)
        src = src[eidx]
        dst = dst[eidx]
        mask = mask[eidx] & valid
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
    # only pays for RNG when a coincidence actually occurred.  Kicks are
    # keyed by GLOBAL edge index (draw the full array, slice this device's
    # chunk) so sharded trajectories match the single-chip path bit-for-bit
    # — the replicated key would otherwise hand every device the SAME kick
    # rows for different edges (caught by the layered x distributed
    # equivalence test: sphere-radius-0 expansion starts siblings
    # coincident, so the kick path fires on real runs, not just
    # measure-zero configurations).
    def with_kicks(f):
        kicks = random_unit_vectors(key, (e_pad,), positions.shape[1], dtype)
        if eidx is not None:
            kicks = kicks[eidx]
        return jnp.where(zero[:, None], kicks, f)

    force_e = lax.cond(jnp.any(zero), with_kicks, lambda f: f, force_e)

    force = csr_segment_sum(force_e, dg.row_ptr, e_off)
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
    shard: tuple[str, int] | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Exact all-pairs repulsion in row blocks of two MXU matmuls each.

    This computes the reference's ideal candidate set (every pair whose
    weighted distance is within edgeLength repels; the spatial index merely
    approximates this superset-then-filter, WeightedIndex.cpp:65-81).
    Returns (force (n, d), repel_loss, num_rep_pairs, zero_count (n,)) —
    the caller applies the coincident-point kicks from ``zero_count``.

    With ``shard=(axis_name, P)`` each device computes its contiguous row
    range; all outputs are PARTIAL and must be psummed by the caller.
    """
    n, d = positions.shape
    dtype = positions.dtype
    L = opts.edge_length

    if shard is not None:
        axis_name, P = shard
        rows_per = -(-n // P)
        row_off = lax.axis_index(axis_name) * rows_per
    else:
        rows_per = n
        row_off = 0
    block = min(opts.block_size, rows_per)

    force = jnp.zeros_like(positions)
    loss = jnp.asarray(0.0, jnp.float32)
    count = jnp.asarray(0, jnp.int32)
    zero_count = jnp.zeros((n,), jnp.int32)
    all_ids = jnp.arange(n)

    for start in range(0, rows_per, block):
        rows = row_off + start + jnp.arange(min(block, rows_per - start))
        row_valid = rows < n
        rid = jnp.minimum(rows, n - 1)
        x = positions[rid]  # (B, d)
        # dist^2 from explicit per-dimension differences: the gram form
        # |a|^2+|b|^2-2<a,b> loses ~|p|^2*eps to cancellation, enough to flip
        # dead-zone decisions and fabricate zero distances for close pairs
        dist2 = jnp.zeros((x.shape[0], n), dtype)
        for k in range(d):
            diff_k = x[:, k][:, None] - positions[:, k][None, :]
            dist2 += diff_k * diff_k
        dist = jnp.sqrt(dist2)
        ws = _weight_scaling(
            inv_w[rid][:, None], inv_w[None, :], opts.additive_weights
        )
        valid = (
            ~adjacency[rid]
            & (colors[rid][:, None] != colors[None, :])
            & row_valid[:, None]
        )
        # colors default to unique ids, so same-color covers u == v; guard
        # the diagonal anyway for caller-supplied colorings
        valid &= rid[:, None] != all_ids[None, :]

        in_range = (dist * ws <= L) & valid
        active = in_range & (dist > 0)
        coeff = jnp.where(active, opts.repulsion_scale * ws / dist, 0.0).astype(dtype)
        # F_v = sum_u coeff * (pos_v - pos_u) = pos_v * rowsum - coeff @ pos
        rowsum = jnp.sum(coeff, axis=1)
        fblock = x * rowsum[:, None] - coeff @ positions  # MXU
        force = force.at[rid].add(jnp.where(row_valid[:, None], fblock, 0.0))
        loss += jnp.sum(jnp.where(active, L / ws - dist, 0.0), dtype=jnp.float32)
        count += jnp.sum(in_range, dtype=jnp.int32)
        zero_count = zero_count.at[rid].add(
            jnp.where(
                row_valid,
                jnp.sum((dist <= 0) & valid, axis=1, dtype=jnp.int32),
                0,
            )
        )

    return force, loss, count, zero_count


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
    shard: tuple[str, int] | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Random-negative-sample repulsion (numNegativeSamples > 0 path,
    reference NewWEmbedEmbedder.cpp:250-252,292-295).

    Each vertex repels ``k`` uniformly sampled vertices, forces scaled by
    n/k.  Deviation from the reference (documented): sampling is with
    replacement (the reference uses Floyd's without-replacement sampling);
    indistinguishable for k << n.  Returns (force, loss, count,
    zero_count); kicks are applied by the caller.  With ``shard`` each
    device handles its row range (partial outputs; caller psums).
    """
    n, d = positions.shape
    dtype = positions.dtype
    k = min(int(opts.num_negative_samples), n)
    L = opts.edge_length

    if shard is not None:
        axis_name, P = shard
        rows_per = -(-n // P)
        row_off = lax.axis_index(axis_name) * rows_per
        key = jax.random.fold_in(key, lax.axis_index(axis_name))
    else:
        rows_per = n
        row_off = 0

    rows = row_off + jnp.arange(rows_per)
    row_valid = rows < n
    rid = jnp.minimum(rows, n - 1)

    cand = jax.random.randint(key, (rows_per, k), 0, n)
    cpos = positions[cand]  # (R, k, d)
    diff = positions[rid][:, None, :] - cpos
    dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1))
    ws = _weight_scaling(inv_w[rid][:, None], inv_w[cand], opts.additive_weights)

    is_nbr = _edge_membership(dg, rid[:, None], cand)
    valid = (
        (dg.colors[rid][:, None] != dg.colors[cand])
        & ~is_nbr
        & row_valid[:, None]
    )

    scale = float(n) / float(k)
    in_range = (dist * ws <= L) & valid
    active = in_range & (dist > 0)
    coeff = jnp.where(active, opts.repulsion_scale * ws * scale / dist, 0.0)
    f_rows = jnp.sum(coeff[..., None].astype(dtype) * diff, axis=1)
    force = jnp.zeros_like(positions).at[rid].add(
        jnp.where(row_valid[:, None], f_rows, 0.0)
    )
    loss = jnp.sum(jnp.where(active, L / ws - dist, 0.0), dtype=jnp.float32)
    count = jnp.sum(valid, dtype=jnp.int32)
    zero_count = jnp.zeros((n,), jnp.int32).at[rid].add(
        jnp.where(row_valid, jnp.sum((dist <= 0) & valid, axis=1, dtype=jnp.int32), 0)
    )
    return force, loss, count, zero_count


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
