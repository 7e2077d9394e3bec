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
from .optim import AdamParams, adam_update
from .options import EmbedderOptions, RepulsionMode
from .state import DeviceGraph, EmbedState


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
    dense_adj = None
    if not use_sampling and mode is RepulsionMode.DENSE:
        dense_adj = forces.build_dense_adjacency(dg)
    hp = AdamParams(opts.learning_rate, opts.cooling_factor)

    def step(state: EmbedState, weights: jax.Array, inv_w: jax.Array) -> EmbedState:
        # graphSize() <= 1 short-circuits (NewWEmbedEmbedder.cpp:25-28):
        # handled host-side in the embedder, where n is static.
        key, att_key, rep_key, kick_key = jax.random.split(state.key, 4)

        old_positions = state.positions

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
                        state.positions, inv_w, dg, opts, rep_key, shard=shard
                    )
                )
        elif mode is RepulsionMode.DENSE:
            rep_force, rep_loss, rep_count, zero_count = (
                forces.dense_repulsion_forces(
                    state.positions, inv_w, dense_adj, dg.colors, opts, shard=shard
                )
            )
        else:
            rep_force, rep_loss, rep_count, overflow, zero_count = (
                cand_mod.bucket_repulsion_forces(
                    state.positions, inv_w, weights, dg, index, opts, rep_key,
                    shard=shard,
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
        # when a coincidence actually occurred
        def with_kicks(f):
            kicks = forces.random_unit_vectors(
                kick_key, (dg.n,), state.positions.shape[1], state.positions.dtype
            )
            return f + kicks * zero_count[:, None].astype(state.positions.dtype)

        force = lax.cond(jnp.any(zero_count > 0), with_kicks, lambda f: f, force)

        if opts.centre_scale != 0.0:
            force = force + forces.centre_forces(state.positions, opts)

        t = state.iteration + 1
        positions, m, v = adam_update(
            state.positions, force, state.adam_m, state.adam_v, t, hp
        )
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


@partial(jax.jit, static_argnames=("step_fn", "max_iterations", "position_min_change"))
def run_embedding(
    step_fn,
    state: EmbedState,
    weights: jax.Array,
    inv_w: jax.Array,
    max_iterations: int,
    position_min_change: float,
) -> EmbedState:
    """Device-side calculateEmbedding: while-loop until convergence.

    Continuation condition mirrors !isFinished()
    (NewWEmbedEmbedder.cpp:94-96): iteration < maxIterations AND the last
    step moved vertices by at least positionMinChange on average.
    """

    def cond(state: EmbedState):
        return (state.iteration < max_iterations) & (
            state.pos_change >= position_min_change
        )

    def body(state: EmbedState):
        return step_fn(state, weights, inv_w)

    return lax.while_loop(cond, body, state)
