"""Fused all-pairs force kernel: attraction + repulsion in one Pallas pass.

Replaces three separate device programs (edge-gather attraction with its
segment-sum scatter, blocked dense repulsion, and the O(E) neighbor
filtering) with ONE kernel over (row-block x col-block) tiles:

  dist2  = |p_v|^2 + |p_u|^2 - 2 <p_v, p_u>          (one MXU matmul)
  ws     = invw_v * invw_u  (or sum, additive mode)
  repel  : non-neighbor, colors differ, dist*ws <= L  (dead zone,
           reference NewWEmbedEmbedder.cpp:242-247)
  attract: neighbor pairs with dist*ws > L            (hinge,
           reference NewWEmbedEmbedder.cpp:210-215)
  coeff  = rep_scale*ws*[repel]/dist - att_scale*ws*[attract]/dist
  force_v = p_v * rowsum(coeff) - coeff @ P           (second MXU matmul)

Neighborhood comes from a dense uint8 adjacency tile (the reference's
areNeighbors CSR scan, Graph.cpp:67-83, becomes a byte load).  Losses,
the repulsion-candidate counter (numRepForceCalculations,
NewWEmbedEmbedder.cpp:321-332) and per-vertex coincident-pair counts
(for the random kicks, NewWEmbedEmbedder.cpp:197-200,229-233) accumulate
in the same pass.

This is the exact candidate set (every pair within weighted radius) —
what the reference's SNN/sprk radius index approximates.  Intended for
graphs up to the dense threshold; the bucketed path covers larger n.

Positions are padded to (n_pad, 128): the MXU contracts K=128 at the same
cost as K=d, and the padding columns are zero so they contribute nothing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


DPAD = 128  # padded feature dim = one MXU contraction
_TILE_B = 256  # query rows per tile
_TILE_C = 1024  # target cols per tile


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(
    pos_r_ref,  # (B, DPAD) f32 — row block of padded positions
    pos_c_ref,  # (C, DPAD) f32 — col block of padded positions
    pos_ct_ref,  # (DPAD, C) f32 — transposed col block (for the gram matmul)
    invw_r_ref,  # (B, 1) f32
    invw_c_ref,  # (1, C) f32
    col_r_ref,  # (B, 1) i32 — color classes
    col_c_ref,  # (1, C) i32
    adj_ref,  # (B, C) u8
    force_ref,  # out (B, DPAD) f32, accumulated over col blocks
    zero_ref,  # out (B, 1) f32 — coincident-pair counts per row
    att_loss_ref,  # out (1, 1) f32, SMEM
    rep_loss_ref,  # out (1, 1) f32, SMEM
    rep_cnt_ref,  # out (1, 1) f32, SMEM
    *,
    n: int,
    L: float,
    att_scale: float,
    rep_scale: float,
    additive: bool,
    dim: int,
    tile_b: int,
    tile_c: int,
):
    i = pl.program_id(0)
    j = pl.program_id(1)

    f32 = jnp.float32

    @pl.when((i == 0) & (j == 0))
    def _init_scalars():
        att_loss_ref[0, 0] = f32(0.0)
        rep_loss_ref[0, 0] = f32(0.0)
        rep_cnt_ref[0, 0] = f32(0.0)

    @pl.when(j == 0)
    def _init_rows():
        force_ref[:] = jnp.zeros_like(force_ref)
        zero_ref[:] = jnp.zeros_like(zero_ref)

    pr = pos_r_ref[:]  # (B, DPAD)
    pct = pos_ct_ref[:]  # (DPAD, C)

    # dist^2 from explicit per-dimension differences (d VPU passes).  The
    # gram-matrix form |a|^2+|b|^2-2<a,b> loses ~|p|^2 * eps absolutely to
    # cancellation — enough to flip dead-zone decisions for short pairs —
    # while the direct form keeps full relative precision.
    dist2 = jnp.zeros((tile_b, tile_c), jnp.float32)
    for k in range(dim):
        diff_k = pr[:, k : k + 1] - pct[k : k + 1, :]  # (B, C)
        dist2 += diff_k * diff_k

    iw_r = invw_r_ref[:]
    iw_c = invw_c_ref[:]
    ws = (iw_r + iw_c) if additive else (iw_r * iw_c)  # (B, C)

    row_ids = i * tile_b + jax.lax.broadcasted_iota(jnp.int32, (tile_b, 1), 0)
    col_ids = j * tile_c + jax.lax.broadcasted_iota(jnp.int32, (1, tile_c), 1)
    pairmask = (row_ids < n) & (col_ids < n)

    differ = col_r_ref[:] != col_c_ref[:]
    nbr = adj_ref[:] != 0

    wdist2 = dist2 * (ws * ws)
    L2 = L * L
    # dead zones (strict/inclusive split exactly as the reference:
    # repulsion when dist*ws <= L, attraction when dist*ws > L)
    rep_cand = (~nbr) & differ & pairmask & (wdist2 <= L2)
    att_act = nbr & pairmask & (wdist2 > L2)

    posd = dist2 > f32(0.0)
    # full-precision sqrt/divide: lax.rsqrt is a ~2^-12 approximation whose
    # bias is visible in the summed losses
    dist = jnp.sqrt(dist2)
    inv_dist = f32(1.0) / jnp.maximum(dist, f32(1e-30))

    c_rep = jnp.where(rep_cand & posd, f32(rep_scale) * ws * inv_dist, f32(0.0))
    c_att = jnp.where(att_act, f32(att_scale) * ws * inv_dist, f32(0.0))
    coeff = c_rep - c_att  # force_v += coeff * (p_v - p_u)

    rowsum = jnp.sum(coeff, axis=1, keepdims=True)  # (B, 1)
    f = pr * rowsum - jnp.dot(coeff, pos_c_ref[:], preferred_element_type=jnp.float32)
    force_ref[:] += f

    linvws = f32(L) / ws
    att_loss_ref[0, 0] += jnp.sum(jnp.where(att_act, dist - linvws, f32(0.0)))
    rep_loss_ref[0, 0] += jnp.sum(
        jnp.where(rep_cand & posd, linvws - dist, f32(0.0))
    )
    rep_cnt_ref[0, 0] += jnp.sum(rep_cand.astype(jnp.float32))

    # coincident pairs kick: attraction kicks on every zero-distance edge,
    # repulsion on every zero-distance candidate
    zero_pair = ~posd & pairmask & (nbr | rep_cand)
    zero_ref[:] += jnp.sum(zero_pair.astype(jnp.float32), axis=1, keepdims=True)


@functools.partial(
    jax.jit,
    static_argnames=(
        "n", "dim", "L", "att_scale", "rep_scale", "additive", "interpret",
    ),
)
def fused_dense_forces(
    pos_pad: jax.Array,  # (n_pad, DPAD) f32, zero-padded
    invw_pad: jax.Array,  # (n_pad,) f32, padding = 1
    colors_pad: jax.Array,  # (n_pad,) i32, padding = -1
    adj: jax.Array,  # (n_pad, n_pad) u8
    *,
    n: int,
    dim: int,
    L: float,
    att_scale: float,
    rep_scale: float,
    additive: bool,
    interpret: bool = False,
):
    """Returns (force (n_pad, DPAD), zero_count (n_pad,), att_loss, rep_loss,
    rep_count) — the complete force pass for one embedding step."""
    n_pad = pos_pad.shape[0]
    tile_b = min(_TILE_B, n_pad)
    tile_c = min(_TILE_C, n_pad)
    grid = (n_pad // tile_b, n_pad // tile_c)

    kern = functools.partial(
        _kernel,
        n=n,
        L=float(L),
        att_scale=float(att_scale),
        rep_scale=float(rep_scale),
        additive=bool(additive),
        dim=dim,
        tile_b=tile_b,
        tile_c=tile_c,
    )

    invw_col = invw_pad.reshape(1, n_pad)
    invw_row = invw_pad.reshape(n_pad, 1)
    col_col = colors_pad.reshape(1, n_pad)
    col_row = colors_pad.reshape(n_pad, 1)
    pos_t = pos_pad.T  # (DPAD, n_pad)

    force, zero, att_loss, rep_loss, rep_cnt = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_b, DPAD), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_c, DPAD), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((DPAD, tile_c), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_c), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_c), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, tile_c), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_b, DPAD), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, DPAD), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * n_pad * n_pad * DPAD,
            bytes_accessed=n_pad * n_pad + 2 * n_pad * DPAD * 4,
            transcendentals=n_pad * n_pad,
        ),
        interpret=interpret,
    )(pos_pad, pos_pad, pos_t, invw_row, invw_col, col_row, col_col, adj)

    return (
        force,
        zero.reshape(n_pad),
        att_loss[0, 0],
        rep_loss[0, 0],
        rep_cnt[0, 0].astype(jnp.int32),
    )
