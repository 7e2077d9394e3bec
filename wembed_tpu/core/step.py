"""The jitted embedding step and device-side embedding loop.

One pure function reproduces NewWEmbedEmbedder::calculateStep
(reference: src/embeddingLib/src/embedder/NewWEmbedEmbedder.cpp:14-92):

  index rebuild -> attraction -> repulsion -> centre -> Adam+cooling ->
  gravity recenter -> mean-squared-displacement convergence metric

``build_step`` closes over the static graph/index structure and returns a
``step(state, weights, inv_w) -> state`` plus a device-side ``run`` that
wraps it in ``lax.while_loop`` so a full ``calculateEmbedding`` executes
with zero per-iteration host round-trips (BASELINE.json north star).

With ``shard=(axis_name, P)`` the step is meant to run inside
``shard_map`` over a P-device mesh: every force pass computes a partial
contribution on its slice of the work (edge ranges, query blocks, dense
rows), a single ``psum`` reduces them, and the (replicated) optimizer
update proceeds identically on every device.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax

from . import candidates as cand_mod
from . import forces
from ..kernels import fused_dense as fused_mod
from ..kernels import span_compact as cell_mod
from ..kernels import span_sparse as span_mod
from .optim import AdamParams, adam_update, simple_update
from .options import EmbedderOptions, OptimizerType, RepulsionMode
from .state import DeviceGraph, EmbedState


def _tpu_backend() -> bool:
    try:
        if jax.default_backend() in ("tpu", "axon"):
            return True
        return "tpu" in str(jax.devices()[0]).lower()
    except Exception:
        return False


def resolve_fused(dg: DeviceGraph, opts: EmbedderOptions, shard) -> str | None:
    """Whether the step should use the fused Pallas force kernel.

    Returns None (off), "compiled", or "interpret".  Auto mode requires:
    dense repulsion, no negative sampling, unsharded, f32, TPU backend.
    """
    mode = opts.resolve_repulsion_mode(dg.n)
    applicable = (
        mode is RepulsionMode.DENSE
        and opts.num_negative_samples < 0
        and shard is None
        and opts.dtype == "float32"
    )
    if opts.fused_dense == "off" or not applicable:
        return None
    if opts.fused_dense == "interpret":
        return "interpret"
    if opts.fused_dense == "on":
        return "compiled"
    return "compiled" if _tpu_backend() else None


def resolve_fused_span(dg: DeviceGraph, opts: EmbedderOptions) -> str | None:
    """Whether the bucket path should use the fused span kernel.

    Returns None (off), "compiled", or "interpret".  Auto mode requires:
    bucket repulsion, no negative sampling, f32, full index
    (index_size == 1), TPU backend.  Applicability is shard-independent:
    sharded steps partition the work-tile list across the mesh
    (span_sparse._shard_work_tiles).
    """
    mode = opts.resolve_repulsion_mode(dg.n)
    applicable = (
        mode is RepulsionMode.BUCKET
        and opts.num_negative_samples < 0
        and opts.dtype == "float32"
        and opts.index_size >= 1.0
    )
    if opts.fused_span == "off" or not applicable:
        return None
    if opts.fused_span == "interpret":
        return "interpret"
    if opts.fused_span == "on":
        return "compiled"
    return "compiled" if _tpu_backend() else None


def _apply_optimizer(opts, hp, old_positions, force, state, t):
    """Positions + fresh moment arrays after one optimizer update.

    SIMPLE is the reference's clip-then-cooled-LR optimizer
    (SimpleOptimizer.cpp:17-41, maxDisplacement=1); it keeps the
    (unused) Adam moments untouched."""
    if opts.optimizer_type is OptimizerType.SIMPLE:
        positions = simple_update(
            old_positions, force, t, opts.learning_rate, opts.cooling_factor
        )
        return positions, state.adam_m, state.adam_v
    return adam_update(old_positions, force, state.adam_m, state.adam_v, t, hp)


def build_phase_fns(
    dg: DeviceGraph,
    opts: EmbedderOptions,
    index: cand_mod.BucketIndex | None,
) -> dict:
    """Phase-split jitted functions for the PROFILED step.

    One normal step is a single fused jit — XLA overlaps everything and no
    per-phase breakdown exists.  The profiled mode instead runs one jit per
    reference phase (index / attracting_forces / repelling_forces /
    apply_forces / gravity / position_change,
    NewWEmbedEmbedder.cpp:38-91) with block_until_ready between them, so
    ``getTimings()`` can produce the reference's tree.  Semantics are
    identical to the unfused jnp step (same RNG key splits); the fused
    Pallas kernel is bypassed (it cannot be split), so profiled trajectories
    match the ``fused_dense="off"`` step bit-for-bit, not the fused one.
    """
    mode = opts.resolve_repulsion_mode(dg.n)
    use_sampling = opts.num_negative_samples >= 0
    dense_adj = None
    if not use_sampling and mode is RepulsionMode.DENSE:
        dense_adj = forces.build_dense_adjacency(dg)
    hp = AdamParams(opts.learning_rate, opts.cooling_factor)

    split4 = jax.jit(lambda key: jax.random.split(key, 4))

    index_fn = None
    repel_kind = "sampled" if use_sampling else (
        "dense" if mode is RepulsionMode.DENSE else "bucket"
    )
    span_mode = (
        resolve_fused_span(dg, opts)
        if repel_kind == "bucket"
        and isinstance(index, (span_mod.SpanIndex, cell_mod.CellIndex))
        else None
    )
    if repel_kind == "bucket" and span_mode is not None:
        _build_structs = (
            cell_mod.build_cell_structures
            if isinstance(index, cell_mod.CellIndex)
            else span_mod.build_span_structures
        )

        @jax.jit
        def index_fn(positions, weights, inv_w, rep_key):
            return _build_structs(
                positions, inv_w, weights, dg.colors, index, opts
            )

    elif repel_kind == "bucket":

        @jax.jit
        def index_fn(positions, weights, inv_w, rep_key):
            return cand_mod.build_structures(
                positions, inv_w, weights, dg.colors, index, opts, rep_key
            )

    @jax.jit
    def attract_fn(positions, inv_w, att_key):
        return forces.attraction_forces(positions, inv_w, dg, opts, att_key)

    if repel_kind == "bucket" and span_mode is not None:

        _repulsion = (
            cell_mod.cell_repulsion_forces
            if isinstance(index, cell_mod.CellIndex)
            else span_mod.span_repulsion_forces
        )

        @jax.jit
        def repel_fn(positions, weights, inv_w, rep_key, structures):
            return _repulsion(
                positions, inv_w, weights, dg.colors, index, opts,
                interpret=(span_mode == "interpret"), structures=structures,
            )

    elif repel_kind == "bucket":

        @jax.jit
        def repel_fn(positions, weights, inv_w, rep_key, structures):
            return cand_mod.bucket_repulsion_forces(
                positions, inv_w, weights, dg, index, opts, rep_key,
                structures=structures,
            )

    elif repel_kind == "dense":

        @jax.jit
        def repel_fn(positions, inv_w):
            f, loss, cnt, zero = forces.dense_repulsion_forces(
                positions, inv_w, dense_adj, dg.colors, opts
            )
            return f, loss, cnt, jnp.asarray(0, jnp.int32), zero

    else:

        @jax.jit
        def repel_fn(positions, inv_w, rep_key):
            if opts.num_negative_samples == 0:
                n = positions.shape[0]
                return (
                    jnp.zeros_like(positions),
                    jnp.asarray(0.0, jnp.float32),
                    jnp.asarray(0, jnp.int32),
                    jnp.asarray(0, jnp.int32),
                    jnp.zeros((n,), jnp.int32),
                )
            f, loss, cnt, zero = forces.sampled_repulsion_forces(
                positions, inv_w, dg, opts, rep_key
            )
            return f, loss, cnt, jnp.asarray(0, jnp.int32), zero

    @jax.jit
    def apply_fn(state, force_att, force_rep, zero_count, kick_key):
        force = force_att + force_rep

        def with_kicks(f):
            kicks = forces.random_unit_vectors(
                kick_key, (dg.n,), state.positions.shape[1], state.positions.dtype
            )
            return f + kicks * zero_count[:, None].astype(state.positions.dtype)

        force = lax.cond(jnp.any(zero_count > 0), with_kicks, lambda f: f, force)
        if opts.centre_scale != 0.0:
            force = force + forces.centre_forces(state.positions, opts)
        t = state.iteration + 1
        positions, m, v = _apply_optimizer(opts, hp, state.positions, force, state, t)
        return positions, m, v, t

    gravity_fn = jax.jit(forces.apply_gravity_centre)
    pos_change_fn = jax.jit(forces.mean_squared_displacement)

    return {
        "kind": repel_kind,
        "split4": split4,
        "index": index_fn,
        "attract": attract_fn,
        "repel": repel_fn,
        "apply": apply_fn,
        "gravity": gravity_fn,
        "pos_change": pos_change_fn,
    }


def build_step(
    dg: DeviceGraph,
    opts: EmbedderOptions,
    index: cand_mod.BucketIndex | None,
    shard: tuple[str, int] | None = None,
) -> Callable[[EmbedState, jax.Array, jax.Array], EmbedState]:
    """Compile-ready step closure for a fixed graph + bucket skeleton.

    ``weights``/``inv_w`` are traced arguments so ``setWeights`` only
    requires a rebuild when the bucket structure changes.
    """
    mode = opts.resolve_repulsion_mode(dg.n)
    use_sampling = opts.num_negative_samples >= 0
    fused = resolve_fused(dg, opts, shard)
    fused_span = resolve_fused_span(dg, opts)
    if not isinstance(index, (span_mod.SpanIndex, cell_mod.CellIndex)):
        # the caller built a jnp BucketIndex (or none) — the span kernel
        # needs its own skeleton, so fall back to the jnp bucket path
        fused_span = None
    span_forces_fn = (
        cell_mod.cell_fused_forces
        if isinstance(index, cell_mod.CellIndex)
        else span_mod.span_fused_forces
    )
    dense_adj = None
    adj_bytes = None
    colors_pad = None
    n_pad = 0
    if fused is not None:
        n_pad = fused_mod._round_up(max(dg.n, 256), 256)
        # built on DEVICE from the (already resident) edge list — an n^2
        # host build + transfer would dominate embedder construction.
        # Padding edges scatter max(..., 0): a no-op wherever they land.
        adj_bytes = (
            jnp.zeros((n_pad, n_pad), jnp.uint8)
            .at[dg.edge_src, dg.edge_dst]
            .max(dg.edge_mask.astype(jnp.uint8))
        )
        colors_pad = (
            jnp.full((n_pad,), -1, jnp.int32).at[: dg.n].set(dg.colors)
        )
    elif not use_sampling and mode is RepulsionMode.DENSE:
        dense_adj = forces.build_dense_adjacency(dg)
    hp = AdamParams(opts.learning_rate, opts.cooling_factor)

    apply_optimizer = partial(_apply_optimizer, opts, hp)

    def fused_step(
        state: EmbedState, weights: jax.Array, inv_w: jax.Array, tables=None
    ) -> EmbedState:
        """Whole force pass (attraction + repulsion + losses + kick counts)
        in one Pallas kernel; optimizer/gravity identical to the jnp path."""
        key, kick_key = jax.random.split(state.key, 2)
        old_positions = state.positions
        n, d = old_positions.shape

        pos_pad = (
            jnp.zeros((n_pad, fused_mod.DPAD), jnp.float32)
            .at[:n, :d]
            .set(old_positions)
        )
        invw_pad = jnp.ones((n_pad,), jnp.float32).at[:n].set(inv_w)
        force_pad, zero_f, att_loss, rep_loss, rep_count = (
            fused_mod.fused_dense_forces(
                pos_pad,
                invw_pad,
                colors_pad,
                adj_bytes,
                n=dg.n,
                dim=d,
                L=opts.edge_length,
                att_scale=opts.attraction_scale,
                rep_scale=opts.repulsion_scale,
                additive=opts.additive_weights,
                interpret=(fused == "interpret"),
            )
        )
        force = force_pad[:n, :d]
        zero_count = zero_f[:n].astype(jnp.int32)

        def with_kicks(f):
            kicks = forces.random_unit_vectors(kick_key, (n,), d, f.dtype)
            return f + kicks * zero_count[:, None].astype(f.dtype)

        force = lax.cond(jnp.any(zero_count > 0), with_kicks, lambda f: f, force)

        if opts.centre_scale != 0.0:
            force = force + forces.centre_forces(old_positions, opts)

        t = state.iteration + 1
        positions, m, v = apply_optimizer(old_positions, force, state, t)
        positions = forces.apply_gravity_centre(positions)
        pos_change = forces.mean_squared_displacement(old_positions, positions)
        return EmbedState(
            positions=positions,
            adam_m=m,
            adam_v=v,
            iteration=t,
            key=key,
            attract_loss=att_loss,
            repel_loss=rep_loss,
            pos_change=pos_change,
            num_rep_forces=rep_count,
            overflow=jnp.asarray(0, jnp.int32),
        )

    if fused is not None:
        return fused_step

    def step(
        state: EmbedState,
        weights: jax.Array,
        inv_w: jax.Array,
        tables=None,
    ) -> EmbedState:
        # graphSize() <= 1 short-circuits (NewWEmbedEmbedder.cpp:25-28):
        # handled host-side in the embedder, where n is static.
        # ``tables`` (span path only) carries the growth-dependent window
        # tables as TRACED arrays: adaptive growth within the same bucket
        # swaps them with zero recompilation.
        key, att_key, rep_key, kick_key = jax.random.split(state.key, 4)

        old_positions = state.positions

        if fused_span is not None:
            # combined path: pallas kernel + ONE merged edge pass doing
            # attraction and the neighbor correction together (separate
            # passes measured ~40ms/step slower than their parts)
            force, att_loss, rep_loss, rep_count, overflow, zero_count = (
                span_forces_fn(
                    state.positions, inv_w, weights, dg.colors, index, opts,
                    att_key, interpret=(fused_span == "interpret"),
                    tables=tables, shard=shard,
                )
            )
        else:
            force, att_loss = forces.attraction_forces(
                state.positions, inv_w, dg, opts, att_key, shard=shard
            )

            overflow = jnp.asarray(0, jnp.int32)
            if use_sampling:
                if opts.num_negative_samples == 0:
                    rep_force = jnp.zeros_like(force)
                    rep_loss = jnp.asarray(0.0, jnp.float32)
                    rep_count = jnp.asarray(0, jnp.int32)
                    zero_count = jnp.zeros((dg.n,), jnp.int32)
                else:
                    rep_force, rep_loss, rep_count, zero_count = (
                        forces.sampled_repulsion_forces(
                            state.positions, inv_w, dg, opts, rep_key,
                            shard=shard,
                        )
                    )
            elif mode is RepulsionMode.DENSE:
                rep_force, rep_loss, rep_count, zero_count = (
                    forces.dense_repulsion_forces(
                        state.positions, inv_w, dense_adj, dg.colors, opts,
                        shard=shard,
                    )
                )
            else:
                rep_force, rep_loss, rep_count, overflow, zero_count = (
                    cand_mod.bucket_repulsion_forces(
                        state.positions, inv_w, weights, dg, index, opts,
                        rep_key, shard=shard,
                    )
                )
            force = force + rep_force

        if shard is not None:
            axis_name = shard[0]
            force, att_loss, rep_loss, rep_count, overflow, zero_count = (
                lax.psum(
                    (force, att_loss, rep_loss, rep_count, overflow, zero_count),
                    axis_name,
                )
            )

        # coincident-point kicks (NewWEmbedEmbedder.cpp:229-233), applied
        # once after the cross-device reduction; the RNG branch only pays
        # when a coincidence actually occurred.
        # DOCUMENTED DEVIATION: the reference draws an independent random
        # unit vector per coincident PAIR (expected kick magnitude ~sqrt(k)
        # for k coincidences); we draw ONE unit vector per vertex scaled by
        # its coincident-pair count (magnitude exactly k).  Both are
        # arbitrary symmetry-breaking noise on measure-zero configurations;
        # per-vertex keying keeps the kick independent of candidate
        # enumeration order and needs no (pair -> rng) scatter.
        def with_kicks(f):
            kicks = forces.random_unit_vectors(
                kick_key, (dg.n,), state.positions.shape[1], state.positions.dtype
            )
            return f + kicks * zero_count[:, None].astype(state.positions.dtype)

        force = lax.cond(jnp.any(zero_count > 0), with_kicks, lambda f: f, force)

        if opts.centre_scale != 0.0:
            force = force + forces.centre_forces(state.positions, opts)

        t = state.iteration + 1
        positions, m, v = apply_optimizer(state.positions, force, state, t)
        positions = forces.apply_gravity_centre(positions)
        pos_change = forces.mean_squared_displacement(old_positions, positions)

        return EmbedState(
            positions=positions,
            adam_m=m,
            adam_v=v,
            iteration=t,
            key=key,
            attract_loss=att_loss,
            repel_loss=rep_loss,
            pos_change=pos_change,
            num_rep_forces=rep_count,
            overflow=overflow,
        )

    return step


@partial(jax.jit, static_argnames=("step_fn",))
def run_embedding(
    step_fn,
    state: EmbedState,
    weights: jax.Array,
    inv_w: jax.Array,
    max_iterations,
    position_min_change,
    stop_on_overflow=False,
    tables=None,
) -> EmbedState:
    """Device-side calculateEmbedding: while-loop until convergence.

    Continuation condition mirrors !isFinished()
    (NewWEmbedEmbedder.cpp:94-96): iteration < maxIterations AND the last
    step moved vertices by at least positionMinChange on average.

    With ``stop_on_overflow`` the loop ALSO exits as soon as a step reports
    truncated candidate windows, so the host can widen them (adaptive
    ``_grow_spans``) immediately instead of refining under truncated
    repulsion until convergence — the reference's exact index never
    truncates, and early iterations (the most spread-out positions) are
    where windows starve.

    ``max_iterations`` / ``position_min_change`` / ``stop_on_overflow``
    are TRACED scalars, so changing the iteration budget (benchmark
    segments, span-growth continuation, checkpoint-resume with a new cap)
    reuses the compiled loop — only ``step_fn`` identity keys the jit
    cache.
    """
    stop_on_overflow = jnp.asarray(stop_on_overflow, bool)

    def cond(state: EmbedState):
        return (
            (state.iteration < max_iterations)
            & (state.pos_change >= position_min_change)
            & (~stop_on_overflow | (state.overflow == 0))
        )

    def body(state: EmbedState):
        if tables is not None:
            return step_fn(state, weights, inv_w, tables)
        return step_fn(state, weights, inv_w)

    return lax.while_loop(cond, body, state)
