"""Multilevel stack tests: label propagation invariants, native==python
differential check, hierarchy counts, layered embedding end-to-end.
Restores the intent of the reference's disabled TestHierarchy.cpp
(weight-sum / containment invariants)."""

import numpy as np
import pytest

from wembed_tpu import _native
from wembed_tpu.core import EmbedderOptions, PartitionerOptions
from wembed_tpu.graphs import from_edges, generators
from wembed_tpu.multilevel import (
    ExpansionMode,
    GraphHierarchy,
    LayeredEmbedder,
    coarsen_all_layers,
    compact_cluster_ids,
)
from wembed_tpu.multilevel import label_prop as lp
from wembed_tpu.utils import set_seed


def _random_graph(n=300, seed=3):
    rng = np.random.default_rng(seed)
    g, _ = generators.geometric_graph(n, rng=rng)
    return g


def test_native_lib_builds():
    assert _native.get_lib() is not None, "native extension failed to build"


def test_native_matches_python_label_propagation():
    g = _random_graph(200)
    ew = np.random.default_rng(0).uniform(0.5, 2.0, size=g.num_directed_edges)
    order = lp.label_propagation_order(g, 0, np.random.default_rng(0))
    opts = PartitionerOptions()
    py = lp._label_propagation_python(g, ew, order, opts.max_iterations, opts.max_cluster_size)
    nat = lp._run_label_propagation(g, ew, order, opts)
    if _native.get_lib() is not None:
        np.testing.assert_array_equal(py, nat)


def test_native_matches_python_aggressive():
    g = _random_graph(150, seed=5)
    ew = np.ones(g.num_directed_edges)
    prev = np.random.default_rng(1).integers(0, g.num_vertices, size=400)
    py = lp._aggressive_python(g, ew, prev)
    nat = lp._run_aggressive(g, ew, prev)
    if _native.get_lib() is not None:
        np.testing.assert_array_equal(py, nat)


def test_compact_cluster_ids():
    raw = np.asarray([5, 5, 2, 7, 2, 5])
    compact = compact_cluster_ids(raw)
    assert compact.tolist() == [0, 0, 1, 2, 1, 0]
    vec = lp._compact_vectorized(raw)
    np.testing.assert_array_equal(compact, vec)


def test_cluster_size_cap_respected():
    g = _random_graph(400, seed=7)
    ew = np.ones(g.num_directed_edges)
    opts = PartitionerOptions(max_cluster_size=6)
    order = lp.label_propagation_order(g, 0, np.random.default_rng(0))
    raw = lp._run_label_propagation(g, ew, order, opts)
    sizes = np.bincount(lp._compact_vectorized(raw))
    # a cluster can have at most max_cluster_size members via moves, plus
    # potentially its founding member that never moved
    assert sizes.max() <= opts.max_cluster_size + 1


def test_coarsen_all_layers_structure():
    g = _random_graph(500, seed=11)
    result = coarsen_all_layers(g)
    opts = PartitionerOptions()
    assert result.graphs[-1].num_vertices <= max(
        opts.final_graph_size, result.graphs[-2].num_vertices // 2 + 1
    )
    # strictly decreasing layer sizes
    sizes = [gr.num_vertices for gr in result.graphs]
    assert all(a > b for a, b in zip(sizes, sizes[1:]))
    # tail mappings: all-into-one then {-1}
    assert (result.parent_pointers[-2] == 0).all()
    assert result.parent_pointers[-1].tolist() == [-1]
    # every mapping is gap-free
    for layer_g, mapping in zip(result.graphs, result.parent_pointers[:-2]):
        assert mapping.shape[0] == layer_g.num_vertices
        assert set(np.unique(mapping)) == set(range(int(mapping.max()) + 1))


def test_hierarchy_contained_counts():
    g = _random_graph(300, seed=13)
    result = coarsen_all_layers(g)
    h = GraphHierarchy.build(result)
    n0 = g.num_vertices
    for layer in h.layers:
        assert int(layer.contained.sum()) == n0
    assert h.layers[0].contained.tolist() == [1] * n0


def test_disconnected_graph_coarsens():
    # two components + isolated vertices exercise aggressivePropagation's
    # degree-zero pairing
    g = from_edges([(0, 1), (1, 2), (3, 4)], num_vertices=8)
    result = coarsen_all_layers(g, opts=PartitionerOptions(final_graph_size=2))
    assert result.graphs[-1].num_vertices >= 1


def test_layered_embedding_end_to_end():
    set_seed(21)
    g = _random_graph(400, seed=17)
    opts = EmbedderOptions(embedding_dimension=2, max_iterations=150)
    emb = LayeredEmbedder(g, opts, verbose=False)
    emb.calculate_embedding()
    assert emb.is_finished()
    assert emb.current_layer == 0
    pos = emb.get_coordinates()
    assert pos.shape == (g.num_vertices, 2)
    assert np.isfinite(pos).all()
    # quality: better than random — edges shorter than random pairs
    from wembed_tpu.eval import spaces

    w = emb.get_weights()
    sp = spaces.WeightedGeometric(pos, weights=w)
    el = g.edge_list()
    rng = np.random.default_rng(0)
    rand_pairs = rng.integers(0, g.num_vertices, size=(2000, 2))
    rand_pairs = rand_pairs[rand_pairs[:, 0] != rand_pairs[:, 1]]
    edge_sim = sp.pairs(el[:, 0], el[:, 1]).mean()
    rand_sim = sp.pairs(rand_pairs[:, 0], rand_pairs[:, 1]).mean()
    assert edge_sim < rand_sim


def test_layered_sibling_sphere_mode():
    set_seed(22)
    g = _random_graph(200, seed=19)
    opts = EmbedderOptions(embedding_dimension=2, max_iterations=60)
    emb = LayeredEmbedder(
        g, opts, expansion_mode=ExpansionMode.SIBLING_SPHERE, verbose=False
    )
    emb.calculate_embedding()
    assert np.isfinite(emb.get_coordinates()).all()


def test_layered_step_by_step():
    set_seed(23)
    g = _random_graph(120, seed=23)
    opts = EmbedderOptions(embedding_dimension=2, max_iterations=30)
    emb = LayeredEmbedder(g, opts, verbose=False)
    guard = 0
    while not emb.is_finished() and guard < 10000:
        emb.calculate_step()
        guard += 1
    assert emb.is_finished()
    assert emb.get_coordinates().shape[0] == g.num_vertices


def test_set_coordinates_warns():
    set_seed(24)
    g = _random_graph(60, seed=29)
    emb = LayeredEmbedder(g, EmbedderOptions(embedding_dimension=2), verbose=False)
    with pytest.warns(UserWarning):
        emb.set_coordinates(np.zeros((60, 2)))
