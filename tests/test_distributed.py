"""Multi-chip sharding tests on the 8-virtual-device CPU mesh
(SURVEY.md §4: the standard way to test pjit/shard_map logic without a
pod).  The sharded step must produce results equivalent to the
single-chip step."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wembed_tpu.core import EmbedderOptions, RepulsionMode, WEmbedEmbedder
from wembed_tpu.core import weights as weights_mod
from wembed_tpu.distributed import build_multichip_step, make_mesh, multichip_run_embedding
from wembed_tpu.graphs import generators, io
from wembed_tpu.utils import set_seed


pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _setup(mode, n=300, d=2, seed=5):
    rng = np.random.default_rng(seed)
    g, _ = generators.geometric_graph(n, rng=rng)
    n = g.num_vertices
    opts = EmbedderOptions(
        embedding_dimension=d, dtype="float64", repulsion_mode=mode,
        max_iterations=30, position_min_change=0.0,
    )
    coords = rng.uniform(0, n ** (1 / d), size=(n, d))
    w = weights_mod.initial_weights(g, opts)
    return g, opts, coords, w


@pytest.mark.parametrize(
    "mode", [RepulsionMode.DENSE, RepulsionMode.BUCKET]
)
def test_sharded_step_matches_single_chip(mode):
    g, opts, coords, w = _setup(mode)
    mesh = make_mesh(8)

    set_seed(33)
    single = WEmbedEmbedder(
        g, opts, initial_coordinates=coords, initial_weights=w, verbose=False
    )

    set_seed(33)
    ref_state_holder = WEmbedEmbedder(
        g, opts, initial_coordinates=coords, initial_weights=w, verbose=False
    )
    run, dg, index = build_multichip_step(g, opts, w, mesh)
    state = ref_state_holder.state

    for _ in range(5):
        single.calculate_step()
        state = run(state, ref_state_holder._weights, ref_state_holder._inv_w)

    np.testing.assert_allclose(
        np.asarray(state.positions), single.get_coordinates(), rtol=1e-9, atol=1e-9
    )
    np.testing.assert_allclose(
        float(state.attract_loss), float(single.state.attract_loss), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(state.repel_loss), float(single.state.repel_loss), rtol=1e-5, atol=1e-6
    )
    assert int(state.num_rep_forces) == int(single.state.num_rep_forces)


def test_sharded_while_loop_runs():
    g, opts, coords, w = _setup(RepulsionMode.BUCKET, n=200, seed=9)
    mesh = make_mesh(8)
    set_seed(44)
    holder = WEmbedEmbedder(
        g, opts, initial_coordinates=coords, initial_weights=w, verbose=False
    )
    run, dg, index = build_multichip_step(g, opts, w, mesh)
    final = multichip_run_embedding(
        run.step_fn, holder.state, holder._weights, holder._inv_w, 10, 0.0
    )
    assert int(final.iteration) == 10
    assert np.isfinite(np.asarray(final.positions)).all()


def test_sharded_negative_sampling_runs():
    rng = np.random.default_rng(3)
    g, _ = generators.geometric_graph(150, rng=rng)
    opts = EmbedderOptions(
        embedding_dimension=2, num_negative_samples=5, max_iterations=5,
        position_min_change=0.0,
    )
    mesh = make_mesh(8)
    set_seed(55)
    holder = WEmbedEmbedder(g, opts, verbose=False)
    run, *_ = build_multichip_step(g, opts, holder.get_weights(), mesh)
    state = run(holder.state, holder._weights, holder._inv_w)
    assert np.isfinite(np.asarray(state.positions)).all()
    assert int(state.num_rep_forces) > 0
