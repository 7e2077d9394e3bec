"""Evaluation metric tests, modeled on the reference's TestMetrics.cpp
hand-computed cases plus formula checks for all 10 spaces."""

import numpy as np
import pytest

from wembed_tpu.eval import (
    EmbeddingType,
    edge_detection_metrics,
    parse_embedding,
    reconstruction_metrics,
)
from wembed_tpu.eval import spaces as sp
from wembed_tpu.graphs import from_edges


# ------------------------------------------------------------------- spaces


def test_weighted_geometric_formula():
    pos = np.asarray([[0.0, 0.0], [3.0, 4.0]])
    w = np.asarray([4.0, 9.0])
    s = sp.WeightedGeometric(pos, weights=w)
    # |p0-p1| = 5, (w0*w1)^(1/2) = 6
    assert s.similarity(0, 1) == pytest.approx(5.0 / 6.0)
    np.testing.assert_allclose(s.rows(np.asarray([0]))[0, 1], 5.0 / 6.0)


def test_euclidean_and_infnorm():
    pos = np.asarray([[0.0, 0.0], [3.0, 4.0]])
    assert sp.Euclidean(pos).similarity(0, 1) == pytest.approx(5.0)
    assert sp.InfNorm(pos).similarity(0, 1) == pytest.approx(4.0)


def test_dot_and_cosine():
    pos = np.asarray([[1.0, 0.0], [1.0, 1.0]])
    assert sp.DotProduct(pos).similarity(0, 1) == pytest.approx(-1.0)
    assert sp.Cosine(pos).similarity(0, 1) == pytest.approx(-np.cos(np.pi / 4))


def test_weighted_no_dim_and_additive():
    pos = np.asarray([[0.0], [2.0]])
    w = np.asarray([2.0, 4.0])
    assert sp.WeightedNoDim(pos, weights=w).similarity(0, 1) == pytest.approx(2 / 8)
    assert sp.Additive(pos, weights=w).similarity(0, 1) == pytest.approx(2 / 6.0)


def test_poincare_distance():
    pos = np.asarray([[0.0, 0.0], [0.5, 0.0]])
    s = sp.Poincare(pos)
    # x = 2*0.25/(1*(1-0.25)) + 1 = 5/3 ; dist = log(x + sqrt(x^2-1))
    x = 0.25 / 0.75 * 2 + 1
    assert s.similarity(0, 1) == pytest.approx(np.log(x + np.sqrt(x * x - 1)))
    assert s.similarity(0, 0) == pytest.approx(0.0)


def test_mercator_s1():
    s = sp.Mercator(radii=np.asarray([1.0, 1.0]), angular=np.asarray([0.0, np.pi / 2]))
    dt = np.pi / 2
    x = 0.5 * ((1 - np.cos(dt)) * np.cosh(2.0) + (1 + np.cos(dt)) * np.cosh(0.0))
    assert s.similarity(0, 1) == pytest.approx(np.arccosh(x))
    assert s.similarity(0, 0) == 0.0


def test_mercator_sd():
    radii = np.asarray([1.0, 2.0])
    vecs = np.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    s = sp.Mercator(radii=radii, angular=vecs)
    dt = np.pi / 2
    x = 0.5 * ((1 - np.cos(dt)) * np.cosh(3.0) + (1 + np.cos(dt)) * np.cosh(-1.0))
    assert s.similarity(0, 1) == pytest.approx(np.arccosh(x))


@pytest.mark.parametrize(
    "etype,cols",
    [
        (EmbeddingType.WEIGHTED, 3),
        (EmbeddingType.EUCLIDEAN, 2),
        (EmbeddingType.DOT_PRODUCT, 2),
        (EmbeddingType.COSINE, 2),
        (EmbeddingType.WEIGHTED_NO_DIM, 3),
        (EmbeddingType.WEIGHTED_INF, 3),
        (EmbeddingType.POINCARE, 2),
        (EmbeddingType.INF_NORM, 2),
        (EmbeddingType.ADDITIVE, 3),
    ],
)
def test_parse_embedding_types(etype, cols):
    rng = np.random.default_rng(0)
    coords = rng.uniform(0.1, 0.5, size=(6, cols))
    space = parse_embedding(etype, coords)
    assert space.n == 6
    v = space.similarity(0, 1)
    assert np.isfinite(v)
    # symmetric
    assert space.similarity(1, 0) == pytest.approx(v)


def test_parse_mercator():
    coords = np.asarray([[1.0, 0.0, 1.0], [1.0, np.pi, 1.0]])  # kappa, theta, r
    space = parse_embedding(EmbeddingType.MERCATOR, coords)
    assert isinstance(space, sp.Mercator)
    assert space.similarity(0, 1) > 0


# ------------------------------------------------- reconstruction / edge F1


def _path3_good():
    """3-vertex path 0-1-2 with a good embedding (TestMetrics.cpp:12-93)."""
    g = from_edges([(0, 1), (1, 2)])
    pos = np.asarray([[0.0, 0.0], [1.0, 0.0], [2.0, 0.0]])
    return g, sp.Euclidean(pos)


def _path3_bad():
    g = from_edges([(0, 1), (1, 2)])
    # 0 and 2 are closest although not connected
    pos = np.asarray([[0.0, 0.0], [3.0, 0.0], [0.5, 0.0]])
    return g, sp.Euclidean(pos)


def test_reconstruction_perfect():
    g, space = _path3_good()
    m = reconstruction_metrics(g, space, 3, np.random.default_rng(0))
    assert m["constructDeg"] == pytest.approx(1.0)
    assert m["MAP"] == pytest.approx(1.0)


def test_reconstruction_bad():
    g, space = _path3_bad()
    m = reconstruction_metrics(g, space, 3, np.random.default_rng(0))
    assert m["MAP"] < 1.0


def test_edge_detection_perfect():
    g, space = _path3_good()
    m = edge_detection_metrics(g, space, 10.0, np.random.default_rng(0))
    # edges (dist 1) separate perfectly from the only non-edge (dist 2)
    assert m["edgeF1"] == pytest.approx(1.0)
    assert m["precision"] == pytest.approx(1.0)
    assert m["recall"] == pytest.approx(1.0)


def test_edge_detection_imperfect():
    g, space = _path3_bad()
    m = edge_detection_metrics(g, space, 10.0, np.random.default_rng(0))
    assert m["edgeF1"] < 1.0


def test_edge_detection_larger():
    rng = np.random.default_rng(5)
    from wembed_tpu.graphs import generators

    g, coords = generators.geometric_graph(500, rng=rng)
    space = sp.Euclidean(coords)
    m = edge_detection_metrics(g, space, 10.0, rng)
    # true geometric coordinates detect edges nearly perfectly
    assert m["edgeF1"] > 0.95


def test_reconstruction_on_true_geometry():
    rng = np.random.default_rng(6)
    from wembed_tpu.graphs import generators

    g, coords = generators.geometric_graph(400, rng=rng)
    space = sp.Euclidean(coords)
    m = reconstruction_metrics(g, space, 50, rng)
    assert m["MAP"] > 0.8


@pytest.mark.parametrize("etype", list(range(10)))
def test_device_reconstruction_matches_host(etype):
    """The batched device ranking kernel (eval/device.py) must reproduce
    the host NodeSampler exactly: same sampling, same (similarity, id)
    tie-breaking, same precision curves."""
    from wembed_tpu.eval.device import sample_node_entries_device
    from wembed_tpu.eval.reconstruction import sample_node_entries
    from wembed_tpu.graphs import generators

    rng = np.random.default_rng(5)
    g, _ = generators.geometric_graph(150, rng=rng)
    n = g.num_vertices
    d = 2
    coords = rng.uniform(-1, 1, size=(n, d)) * 0.5  # inside Poincare ball
    weights = np.exp(rng.normal(size=n))
    if etype == 4:  # mercator: kappa, radius, positions
        cols = np.concatenate(
            [np.ones((n, 1)), np.abs(coords[:, :1]) * 3, coords], axis=1
        )
    elif etype in (0, 5, 6, 9):  # weighted formats carry weight last
        cols = np.concatenate([coords, weights[:, None]], axis=1)
    else:
        cols = coords
    space = sp.parse_embedding(etype, cols)

    host = sample_node_entries(g, space, 40, rng=np.random.default_rng(3))
    dev = sample_node_entries_device(g, space, 40, rng=np.random.default_rng(3))
    assert len(host) == len(dev)
    for h, d_ in zip(host, dev):
        assert h.v == d_.v and h.deg == d_.deg
        np.testing.assert_allclose(h.deg_precision, d_.deg_precision, rtol=1e-9)
        np.testing.assert_allclose(h.average_precision, d_.average_precision, rtol=1e-9)


def test_pinned_node_ids():
    """``node_ids`` pins the reconstruction sample set exactly (host and
    device paths), so cross-implementation MAP comparisons can feed the
    reference NodeSampler's own permutation prefix
    (baselines/refbuild/dump_samples.cpp); measured r05: with pinned ids
    our evaluator reproduces the reference evaluationLib's MAP on the
    same 100K embedding to 1e-5 (0.508086 vs 0.5081)."""
    from wembed_tpu.eval.device import sample_node_entries_device
    from wembed_tpu.eval.reconstruction import sample_node_entries
    from wembed_tpu.graphs import generators

    rng = np.random.default_rng(9)
    g, coords = generators.geometric_graph(120, rng=rng)
    space = sp.Euclidean(coords)
    ids = np.asarray([5, 0, 17, 42, 3])

    host = sample_node_entries(g, space, 999, node_ids=ids)
    assert [e.v for e in host] == list(ids)
    dev = sample_node_entries_device(g, space, 999, node_ids=ids)
    assert [e.v for e in dev] == list(ids)
    for h, d_ in zip(host, dev):
        np.testing.assert_allclose(h.average_precision, d_.average_precision, rtol=1e-9)

    m = reconstruction_metrics(g, space, 999, node_ids=ids, method="host")
    m2 = reconstruction_metrics(g, space, 999, node_ids=ids, method="device")
    np.testing.assert_allclose(m["MAP"], m2["MAP"], rtol=1e-9)
