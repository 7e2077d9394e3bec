"""Graph layer tests, modeled on the reference's TestGraph.cpp /
TestGraphAlgorithm.cpp / TestGeometricGraphSampler.cpp coverage."""

import numpy as np
import pytest

from wembed_tpu.graphs import algorithms, from_adjacency, from_edges, generators, io


def test_empty_graph():
    g = from_edges(np.empty((0, 2)))
    assert g.num_vertices == 0
    assert g.num_edges == 0


def test_from_edges_basic():
    g = from_edges([(0, 1), (1, 2), (2, 0)])
    assert g.num_vertices == 3
    assert g.num_edges == 3
    assert sorted(g.neighbors(0).tolist()) == [1, 2]
    assert g.are_neighbors(0, 1) and g.are_neighbors(1, 0)
    assert not g.are_neighbors(0, 0)


def test_self_loops_dropped_and_duplicates_merged():
    g = from_edges([(0, 0), (0, 1), (1, 0), (0, 1)])
    assert g.num_vertices == 2
    assert g.num_edges == 1


def test_missing_ids_filled():
    g = from_edges([(0, 5)])
    assert g.num_vertices == 6
    assert g.num_neighbors(3) == 0


def test_from_adjacency():
    g = from_adjacency({0: [1, 2], 3: []})
    assert g.num_vertices == 4
    assert g.num_edges == 2
    assert g.are_neighbors(2, 0)


def test_edge_list_each_edge_once():
    g = from_edges([(0, 1), (1, 2), (2, 3), (3, 4), (1, 3), (2, 4)])
    el = g.edge_list()
    assert el.shape == (6, 2)
    assert (el[:, 0] < el[:, 1]).all()


def test_colors_default_unique():
    g = from_edges([(0, 1), (1, 2)])
    assert not g.same_color(0, 1)
    assert g.same_color(1, 1)
    g2 = g.with_colors(np.asarray([0, 0, 1]))
    assert g2.same_color(0, 1)


def test_connected_components():
    g = from_edges([(0, 1), (2, 3), (3, 4), (5, 5)], num_vertices=7)
    comp, sizes = algorithms.connected_components(g)
    assert comp[0] == comp[1]
    assert comp[2] == comp[3] == comp[4]
    assert comp[0] != comp[2]
    assert sizes.sum() == 7
    assert sorted(sizes.tolist(), reverse=True)[0] == 3
    # ids compacted in order of first occurrence
    assert comp[0] == 0 and comp[2] == 1 and comp[5] == 2


def test_largest_component_with_mapping():
    g = from_edges([(0, 1), (2, 3), (3, 4)])
    sub, mapping = algorithms.largest_component_with_mapping(g)
    assert sub.num_vertices == 3
    assert sub.num_edges == 2
    assert mapping.tolist() == [2, 3, 4]


def test_coarsen_graph():
    # path 0-1-2-3, clusters {0,1} and {2,3}
    g = from_edges([(0, 1), (1, 2), (2, 3)])
    coarse, edge_map = algorithms.coarsen_graph(g, np.asarray([0, 0, 1, 1]))
    assert coarse.num_vertices == 2
    assert coarse.num_edges == 1
    # intra-cluster directed edges map to -1, inter-cluster map to real edges
    src, dst = g.edge_src, g.col_idx
    for e in range(g.num_directed_edges):
        cs, cd = [0, 0, 1, 1][src[e]], [0, 0, 1, 1][dst[e]]
        if cs == cd:
            assert edge_map[e] == -1
        else:
            ce = edge_map[e]
            assert coarse.edge_src[ce] == cs and coarse.col_idx[ce] == cd


def test_coarsen_edge_map_consistency():
    # like the reference's full consistency check (TestGraphAlgorithm.cpp:59-73)
    rng = np.random.default_rng(0)
    g = from_edges(rng.integers(0, 30, size=(120, 2)))
    clusters = np.asarray(rng.integers(0, 6, size=g.num_vertices))
    # compact cluster ids
    _, clusters = np.unique(clusters, return_inverse=True)
    coarse, edge_map = algorithms.coarsen_graph(g, clusters)
    for e in range(g.num_directed_edges):
        v, u = g.edge_src[e], g.col_idx[e]
        if clusters[v] == clusters[u]:
            assert edge_map[e] == -1
        else:
            ce = edge_map[e]
            assert coarse.edge_src[ce] == clusters[v]
            assert coarse.col_idx[ce] == clusters[u]


def test_bfs_and_apsp():
    g = from_edges([(0, 1), (1, 2), (2, 3)], num_vertices=5)
    dist = algorithms.bfs_distances(g, 0)
    assert dist.tolist() == [0, 1, 2, 3, -1]
    apsp = algorithms.all_pairs_shortest_paths(g)
    assert apsp[3, 0] == 3
    assert apsp[4, 0] == -1


def test_geometric_graph_stats():
    # avg degree ~= 20 +- 1 on a 4000-vertex graph, connected
    # (reference TestGeometricGraphSampler.cpp:7-42)
    rng = np.random.default_rng(7)
    g, coords = generators.geometric_graph(4000, rng=rng)
    avg_deg = 2.0 * g.num_edges / g.num_vertices
    assert 18.0 < avg_deg < 22.0
    assert algorithms.is_connected(g)
    assert coords.shape == (g.num_vertices, 2)
    # edges really connect points within the radius
    radius = np.sqrt(20.0 / np.pi)
    el = g.edge_list()
    d = np.linalg.norm(coords[el[:, 0]] - coords[el[:, 1]], axis=1)
    assert (d < radius + 1e-9).all()


def test_girg_threshold_model():
    rng = np.random.default_rng(3)
    g, pos, w = generators.girg(2000, ple=2.5, avg_degree=10.0, dim=2, rng=rng)
    avg_deg = 2.0 * g.num_edges / g.num_vertices
    assert 6.0 < avg_deg < 16.0  # scaled degree within tolerance
    assert algorithms.is_connected(g)
    # threshold model: every edge satisfies dist <= (w_u w_v / n)^(1/d)
    el = g.edge_list()
    d = generators._torus_distance(pos[el[:, 0]], pos[el[:, 1]])
    thresh = (w[el[:, 0]] * w[el[:, 1]] / 2000) ** 0.5
    assert (d <= thresh + 1e-12).all()


def test_girg_binomial_model():
    rng = np.random.default_rng(4)
    g, pos, w = generators.girg(
        1500, ple=2.8, avg_degree=8.0, dim=2, temperature=0.5, connected=False, rng=rng
    )
    avg_deg = 2.0 * g.num_edges / g.num_vertices
    assert 4.0 < avg_deg < 14.0


def test_edge_list_roundtrip(tmp_path):
    g = from_edges([(0, 1), (1, 2), (2, 3), (1, 3)])
    p = tmp_path / "g.edg"
    io.write_edge_list(str(p), g)
    g2 = io.read_edge_list(str(p))
    assert np.array_equal(g.row_ptr, g2.row_ptr)
    assert np.array_equal(g.col_idx, g2.col_idx)


def test_small_graph_asset():
    g = io.read_edge_list("assets/small_graph.edg")
    assert g.num_vertices == 5
    assert g.num_edges == 6


def test_bipartite_edge_list(tmp_path):
    p = tmp_path / "b.edg"
    p.write_text("#psizes 2 2\n0 2\n0 3\n1 2\n")
    g = io.read_bipartite_edge_list(str(p))
    assert g.num_vertices == 4
    assert g.colors.tolist() == [0, 0, 1, 1]
    assert g.same_color(0, 1) and not g.same_color(0, 2)


def test_coordinates_roundtrip(tmp_path):
    pos = np.asarray([[0.12345678901234567, -2.0], [3.5, 4.25]])
    w = np.asarray([1.5, 0.75])
    p = tmp_path / "c.csv"
    io.write_coordinates(str(p), pos, w)
    back = io.read_coordinates(str(p))
    coords, weights = io.split_last_column(back)
    np.testing.assert_array_equal(coords, pos)
    np.testing.assert_array_equal(weights, w)


def test_native_parser_matches_python_loop(tmp_path):
    """The native C edge-list parser and the pure-Python fallback must
    produce identical graphs (incl. comments, blank lines, junk lines)."""
    from wembed_tpu.graphs.io import _read_pairs_native

    p = tmp_path / "g.edg"
    p.write_text(
        "# a comment line\n"
        "0 1\n"
        "1 2\n"
        "\n"
        "junk\n"
        "2 3\n"
        "  3   4 trailing tokens\n"
        "# another\n"
        "4 0\n"
    )
    native = _read_pairs_native(str(p), "#")
    if native is None:
        pytest.skip("native library unavailable")
    expected = np.asarray([[0, 1], [1, 2], [2, 3], [3, 4], [4, 0]])
    assert np.array_equal(native, expected)
    g = io.read_edge_list(str(p))
    assert g.num_vertices == 5 and g.num_edges == 5
