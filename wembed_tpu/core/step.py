"""The jitted embedding step and device-side embedding loop.

One pure function reproduces NewWEmbedEmbedder::calculateStep
(reference: src/embeddingLib/src/embedder/NewWEmbedEmbedder.cpp:14-92):

  index rebuild -> attraction -> repulsion -> centre -> Adam+cooling ->
  gravity recenter -> mean-squared-displacement convergence metric

``build_step`` closes over the static graph/index structure and returns a
jitted ``step(state, weights, inv_w) -> state`` plus a device-side
``run(state, ...)`` that wraps it in ``lax.while_loop`` so a full
``calculateEmbedding`` executes with zero per-iteration host round-trips
(BASELINE.json north star).
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
        key, att_key, rep_key = jax.random.split(state.key, 3)
        old_positions = state.positions

        force, att_loss = forces.attraction_forces(
            state.positions, inv_w, dg, opts, att_key
        )

        overflow = jnp.asarray(0, jnp.int32)
        if use_sampling:
            if opts.num_negative_samples == 0:
                rep_force = jnp.zeros_like(force)
                rep_loss = jnp.asarray(0.0, jnp.float32)
                rep_count = jnp.asarray(0, jnp.int32)
            else:
                rep_force, rep_loss, rep_count = forces.sampled_repulsion_forces(
                    state.positions, inv_w, dg, opts, rep_key
                )
        elif mode is RepulsionMode.DENSE:
            rep_force, rep_loss, rep_count = forces.dense_repulsion_forces(
                state.positions, inv_w, dense_adj, dg.colors, opts, rep_key
            )
        else:
            rep_force, rep_loss, rep_count, overflow = (
                cand_mod.bucket_repulsion_forces(
                    state.positions, inv_w, weights, dg, index, opts, rep_key
                )
            )
        force = force + rep_force

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
