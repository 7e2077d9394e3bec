"""Fused Pallas force-kernel parity: interpret-mode kernel vs the jnp
dense path must produce identical trajectories (same forces, losses,
counters) since both compute the exact all-pairs candidate set."""

import numpy as np
import pytest

from wembed_tpu.core import EmbedderOptions, RepulsionMode, WEmbedEmbedder
from wembed_tpu.core import weights as weights_mod
from wembed_tpu.graphs import from_edges, generators, io
from wembed_tpu.utils import set_seed


def _embedder(g, opts, coords, w):
    return WEmbedEmbedder(
        g, opts, initial_coordinates=coords, initial_weights=w, verbose=False
    )


def _pair(g, d, rng, **kw):
    """Build (fused-interpret, jnp) embedders with identical inits."""
    n = g.num_vertices
    coords = rng.uniform(0, n ** (1 / d), size=(n, d))
    base = dict(
        embedding_dimension=d,
        dtype="float32",
        repulsion_mode=RepulsionMode.DENSE,
        **kw,
    )
    opts_f = EmbedderOptions(fused_dense="interpret", **base)
    opts_j = EmbedderOptions(fused_dense="off", **base)
    w = weights_mod.initial_weights(g, opts_j)
    return _embedder(g, opts_f, coords, w), _embedder(g, opts_j, coords, w)


@pytest.mark.parametrize("additive", [False, True])
def test_fused_matches_jnp_dense(additive):
    set_seed(3)
    rng = np.random.default_rng(7)
    g, _ = generators.geometric_graph(120, rng=rng)
    emb_f, emb_j = _pair(g, 3, rng, additive_weights=additive)
    for _ in range(5):
        emb_f.calculate_step()
        emb_j.calculate_step()
        np.testing.assert_allclose(
            emb_f.get_coordinates(), emb_j.get_coordinates(), rtol=3e-4, atol=2e-5
        )
        assert int(emb_f.state.num_rep_forces) == int(emb_j.state.num_rep_forces)
        np.testing.assert_allclose(
            float(emb_f.state.attract_loss),
            float(emb_j.state.attract_loss),
            rtol=1e-4,
        )
        np.testing.assert_allclose(
            float(emb_f.state.repel_loss),
            float(emb_j.state.repel_loss),
            rtol=1e-4,
            atol=1e-5,
        )


def test_fused_respects_colors():
    """Bipartite color classes: same-color pairs never repel (the kernel's
    color filter must match the jnp path, reference NewWEmbedEmbedder.cpp:328)."""
    set_seed(4)
    rng = np.random.default_rng(9)
    # complete bipartite K_{6,6}
    edges = [(a, 6 + b) for a in range(6) for b in range(6)]
    colors = np.array([0] * 6 + [1] * 6, np.int32)
    g = from_edges(edges, colors=colors)
    emb_f, emb_j = _pair(g, 2, rng)
    for _ in range(5):
        emb_f.calculate_step()
        emb_j.calculate_step()
        np.testing.assert_allclose(
            emb_f.get_coordinates(), emb_j.get_coordinates(), rtol=3e-4, atol=2e-5
        )
        assert int(emb_f.state.num_rep_forces) == int(emb_j.state.num_rep_forces)


def test_fused_small_graph_converges_like_jnp():
    """Full embeddings diverge step-for-step in f32 (hinge forces are
    discontinuous), so compare qualitatively: both converge before the
    iteration cap, to near-zero loss."""
    set_seed(5)
    rng = np.random.default_rng(13)
    g = io.read_edge_list("assets/small_graph.edg")
    emb_f, emb_j = _pair(g, 2, rng)
    emb_f.calculate_embedding()
    emb_j.calculate_embedding()
    for emb in (emb_f, emb_j):
        assert emb.iteration < emb.opts.max_iterations
        loss = emb.get_loss()
        assert loss.total < 0.5, loss
