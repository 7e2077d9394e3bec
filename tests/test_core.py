"""Core embedder tests: per-iteration parity against the numpy oracle,
dense vs bucket repulsion equivalence, Adam semantics, convergence and
embedding quality on small graphs."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wembed_tpu.core import EmbedderOptions, RepulsionMode, WeightType, WEmbedEmbedder
from wembed_tpu.core import weights as weights_mod
from wembed_tpu.core.candidates import BucketIndex, doubling_weight_buckets
from wembed_tpu.core.embedder import Loss
from wembed_tpu.graphs import from_edges, generators, io
from wembed_tpu.utils import set_seed

from reference_oracle import OracleAdam, oracle_step


def _small_graph():
    return io.read_edge_list("assets/small_graph.edg")


def _embedder(g, opts, coords, w):
    return WEmbedEmbedder(
        g, opts, initial_coordinates=coords, initial_weights=w, verbose=False
    )


# ------------------------------------------------------------------ parity


@pytest.mark.parametrize("mode", [RepulsionMode.DENSE, RepulsionMode.BUCKET])
@pytest.mark.parametrize("additive", [False, True])
def test_step_matches_oracle(mode, additive):
    """Same init => same trajectory as the reference-semantics oracle."""
    set_seed(1)
    g = _small_graph()
    opts = EmbedderOptions(
        embedding_dimension=2,
        dtype="float64",
        repulsion_mode=mode,
        additive_weights=additive,
        window_capacity=64,  # window covers everything => exact candidates
    )
    rng = np.random.default_rng(11)
    coords = rng.uniform(0, 5 ** 0.5, size=(5, 2))
    w = weights_mod.initial_weights(g, opts)

    emb = _embedder(g, opts, coords, w)
    adam = OracleAdam(5, 2, opts.learning_rate, opts.cooling_factor)
    pos = coords.copy()
    for i in range(25):
        emb.calculate_step()
        pos, att, rep, change = oracle_step(pos, w, g, opts, adam)
        np.testing.assert_allclose(emb.get_coordinates(), pos, rtol=1e-9, atol=1e-9)
        np.testing.assert_allclose(float(emb.state.attract_loss), att, rtol=1e-5)
        np.testing.assert_allclose(
            float(emb.state.repel_loss), rep, rtol=1e-5, atol=1e-7
        )
        np.testing.assert_allclose(
            float(emb.state.pos_change), change, rtol=1e-5, atol=1e-12
        )


def test_step_matches_oracle_larger_graph():
    set_seed(2)
    rng = np.random.default_rng(5)
    g, _ = generators.geometric_graph(150, rng=rng)
    n = g.num_vertices
    opts = EmbedderOptions(
        embedding_dimension=3,
        dtype="float64",
        repulsion_mode=RepulsionMode.DENSE,
    )
    coords = rng.uniform(0, n ** (1 / 3), size=(n, 3))
    w = weights_mod.initial_weights(g, opts)
    emb = _embedder(g, opts, coords, w)
    adam = OracleAdam(n, 3, opts.learning_rate, opts.cooling_factor)
    pos = coords.copy()
    for _ in range(5):
        emb.calculate_step()
        pos, att, rep, _ = oracle_step(pos, w, g, opts, adam)
    np.testing.assert_allclose(emb.get_coordinates(), pos, rtol=1e-8, atol=1e-8)


def test_centre_force_matches_oracle():
    set_seed(3)
    g = _small_graph()
    opts = EmbedderOptions(
        embedding_dimension=2, dtype="float64", centre_scale=0.3,
        repulsion_mode=RepulsionMode.DENSE,
    )
    rng = np.random.default_rng(13)
    coords = rng.uniform(0, 2, size=(5, 2))
    w = weights_mod.initial_weights(g, opts)
    emb = _embedder(g, opts, coords, w)
    adam = OracleAdam(5, 2, opts.learning_rate, opts.cooling_factor)
    pos = coords.copy()
    for _ in range(10):
        emb.calculate_step()
        pos, *_ = oracle_step(pos, w, g, opts, adam)
    np.testing.assert_allclose(emb.get_coordinates(), pos, rtol=1e-9, atol=1e-9)


# ------------------------------------------------ dense == bucket equivalence


def test_bucket_equals_dense_repulsion():
    """With windows large enough to never truncate, the bucketed candidate
    path must produce exactly the dense (ideal) forces."""
    set_seed(4)
    rng = np.random.default_rng(21)
    g, _ = generators.geometric_graph(300, rng=rng)
    n = g.num_vertices
    coords = rng.uniform(0, n ** 0.5, size=(n, 2))
    results = {}
    for mode in [RepulsionMode.DENSE, RepulsionMode.BUCKET]:
        set_seed(4)
        opts = EmbedderOptions(
            embedding_dimension=2, dtype="float64", repulsion_mode=mode,
            window_capacity=n,
        )
        w = weights_mod.initial_weights(g, opts)
        emb = _embedder(g, opts, coords, w)
        for _ in range(8):
            emb.calculate_step()
        results[mode] = (emb.get_coordinates(), int(emb.state.overflow))
    np.testing.assert_allclose(
        results[RepulsionMode.DENSE][0], results[RepulsionMode.BUCKET][0],
        rtol=1e-8, atol=1e-8,
    )
    assert results[RepulsionMode.BUCKET][1] == 0  # no overflow


def test_bucket_candidates_are_superset_of_active_pairs():
    """Property test (SURVEY.md §4): the candidate structure must cover every
    pair within the exact weighted-distance threshold, as the reference's
    conservative per-bucket radius guarantees (WeightedIndex.cpp:65-81)."""
    rng = np.random.default_rng(33)
    n, d = 200, 2
    w = np.exp(rng.normal(size=n))  # wide weight spread
    w = w * n / w.sum()
    thresholds = doubling_weight_buckets(w, 2.0)
    assignment = np.searchsorted(thresholds, w, side="right")
    max_of_bucket = np.concatenate([thresholds, [w.max()]])
    pos = rng.uniform(0, 3, size=(n, d))
    inv_w = w ** (-1 / d)
    # exact active pairs
    dist = np.linalg.norm(pos[:, None] - pos[None, :], axis=-1)
    ws = inv_w[:, None] * inv_w[None, :]
    active = (dist * ws <= 1.0) & ~np.eye(n, dtype=bool)
    # conservative radii: for (v, u), u in bucket b(u):
    radius_vu = (w[:, None] * max_of_bucket[assignment][None, :]) ** (1 / d)
    assert (dist[active] <= radius_vu[active] + 1e-12).all()


def test_overflow_counter_reports_truncation():
    set_seed(5)
    rng = np.random.default_rng(8)
    g, _ = generators.geometric_graph(4000, rng=rng)
    n = g.num_vertices
    # all points crammed into a tiny ball: every pair is within radius, but
    # the span (sized for the expected local density) cannot cover the
    # whole bucket => truncation must be surfaced
    coords = rng.uniform(0, 1e-3, size=(n, 2))
    opts = EmbedderOptions(
        embedding_dimension=2, repulsion_mode=RepulsionMode.BUCKET,
        weight_type=WeightType.UNIT,  # single weight bucket
        window_capacity=4,
    )
    w = weights_mod.unit_weights(n)
    emb = _embedder(g, opts, coords, w)
    emb.calculate_step()
    assert int(emb.state.overflow) > 0


# ------------------------------------------------------------ special modes


def test_negative_sampling_mode_runs():
    set_seed(6)
    g = _small_graph()
    opts = EmbedderOptions(
        embedding_dimension=2, num_negative_samples=3, max_iterations=30
    )
    emb = WEmbedEmbedder(g, opts, verbose=False)
    emb.calculate_embedding()
    assert emb.iteration > 0
    assert np.isfinite(emb.get_coordinates()).all()


def test_index_size_subsampling_runs():
    set_seed(7)
    rng = np.random.default_rng(9)
    g, _ = generators.geometric_graph(300, rng=rng)
    opts = EmbedderOptions(
        embedding_dimension=2, repulsion_mode=RepulsionMode.BUCKET,
        index_size=0.5, max_iterations=10,
    )
    emb = WEmbedEmbedder(g, opts, verbose=False)
    emb.calculate_embedding()
    assert np.isfinite(emb.get_coordinates()).all()


def test_coincident_points_get_kicked_apart():
    set_seed(8)
    g = from_edges([(0, 1), (1, 2), (0, 2)])
    coords = np.zeros((3, 2))  # all coincident
    opts = EmbedderOptions(embedding_dimension=2, max_iterations=5)
    emb = _embedder(g, opts, coords, weights_mod.initial_weights(g, opts))
    emb.calculate_step()
    c = emb.get_coordinates()
    assert np.isfinite(c).all()
    # points must have separated
    assert np.abs(c).max() > 0


def test_single_vertex_graph_short_circuits():
    g = from_edges(np.empty((0, 2)), num_vertices=1)
    opts = EmbedderOptions(embedding_dimension=2)
    emb = WEmbedEmbedder(g, opts, verbose=False)
    emb.calculate_step()
    assert emb.is_finished()


def test_bipartite_colors_prevent_repulsion():
    # two same-color vertices placed on top of each other must not repel
    g = from_edges([(0, 2), (1, 2)]).with_colors(np.asarray([0, 0, 1]))
    coords = np.asarray([[0.0, 0.0], [0.05, 0.0], [3.0, 0.0]])
    opts = EmbedderOptions(
        embedding_dimension=2, dtype="float64", repulsion_mode=RepulsionMode.DENSE
    )
    emb = _embedder(g, opts, coords, np.ones(3))
    emb.calculate_step()
    assert int(emb.state.num_rep_forces) == 0


# ----------------------------------------------------------- end-to-end runs


def test_full_embedding_converges_and_separates():
    set_seed(9)
    g = _small_graph()
    opts = EmbedderOptions(embedding_dimension=2, max_iterations=1000)
    emb = WEmbedEmbedder(g, opts, verbose=False)
    emb.calculate_embedding()
    assert emb.is_finished()
    pos = emb.get_coordinates()
    w = emb.get_weights()
    inv_w = w ** (-0.5)
    # weighted distance of edges should on average be below non-edges
    dist = np.linalg.norm(pos[:, None] - pos[None, :], axis=-1)
    wdist = dist * inv_w[:, None] * inv_w[None, :]
    edge_mask = np.zeros((5, 5), dtype=bool)
    for v, u in g.edge_list():
        edge_mask[v, u] = edge_mask[u, v] = True
    non_edge = ~edge_mask & ~np.eye(5, dtype=bool)
    assert wdist[edge_mask].mean() < wdist[non_edge].mean()


def test_float32_mode_runs():
    set_seed(10)
    g = _small_graph()
    opts = EmbedderOptions(embedding_dimension=4, max_iterations=50, dtype="float32")
    emb = WEmbedEmbedder(g, opts, verbose=False)
    emb.calculate_embedding()
    assert emb.get_coordinates().dtype == np.float64  # host copy is f64
    assert np.isfinite(emb.get_coordinates()).all()


def test_step_loop_equals_while_loop():
    """calculate_step N times == calculate_embedding limited to N iterations
    (same PRNG consumption path)."""
    set_seed(11)
    g = _small_graph()
    rng = np.random.default_rng(77)
    coords = rng.uniform(0, 2, size=(5, 2))
    opts = EmbedderOptions(
        embedding_dimension=2, dtype="float64", max_iterations=7,
        position_min_change=0.0,
    )
    w = weights_mod.initial_weights(g, opts)
    set_seed(11)
    a = _embedder(g, opts, coords, w)
    for _ in range(7):
        a.calculate_step()
    set_seed(11)
    b = _embedder(g, opts, coords, w)
    b.calculate_embedding()
    np.testing.assert_allclose(a.get_coordinates(), b.get_coordinates(), rtol=1e-12)


def test_weight_construction_semantics():
    g = from_edges([(0, 1), (1, 2)], num_vertices=4)  # vertex 3 isolated
    w = weights_mod.degree_weights(g)
    assert w.tolist() == [1.0, 2.0, 1.0, 1.0]  # degree-0 clamped to 1
    r = weights_mod.rescale_weights(2.0, 4, np.asarray([1.0, 4.0]))
    # power first: [1, 16]; then mean-normalize: * 2/17
    np.testing.assert_allclose(r, [2 / 17, 32 / 17])


def test_loss_accessor():
    loss = Loss(1.5, 2.5)
    assert loss.total == 4.0


def test_set_coordinates_resume():
    set_seed(12)
    g = _small_graph()
    opts = EmbedderOptions(embedding_dimension=2, max_iterations=5)
    emb = WEmbedEmbedder(g, opts, verbose=False)
    target = np.arange(10, dtype=np.float64).reshape(5, 2)
    emb.set_coordinates(target)
    np.testing.assert_array_equal(emb.get_coordinates(), target)
    emb.calculate_embedding()
    assert np.isfinite(emb.get_coordinates()).all()


def test_simple_optimizer():
    """OptimizerType.SIMPLE: clip to +-1 then lr*cooling^t ascent
    (reference SimpleOptimizer.cpp:17-41)."""
    from wembed_tpu.core.options import OptimizerType

    set_seed(13)
    g = _small_graph()
    rng = np.random.default_rng(13)
    coords = rng.uniform(0, 5**0.5, size=(5, 2))
    opts = EmbedderOptions(
        embedding_dimension=2,
        dtype="float64",
        optimizer_type=OptimizerType.SIMPLE,
        repulsion_mode=RepulsionMode.DENSE,
        max_iterations=3,
    )
    w = weights_mod.initial_weights(g, opts)
    emb = _embedder(g, opts, coords, w)
    emb.calculate_step()
    # one step: |pre-gravity displacement per coordinate| <= lr * cooling
    # (gravity recentering then shifts all rows by the same vector, which
    # cancels in row differences)
    delta = emb.get_coordinates() - coords
    delta_rel = delta - delta.mean(axis=0)
    bound = opts.learning_rate * opts.cooling_factor + 1e-9
    assert np.all(np.abs(delta_rel) <= 2 * bound)
    # Adam moments untouched
    assert float(jnp.abs(emb.state.adam_m).sum()) == 0.0
    assert float(jnp.abs(emb.state.adam_v).sum()) == 0.0


def test_dump_weights(tmp_path, monkeypatch):
    """dump_weights appends one weight row per iteration to weight_dump.txt
    (reference NewWEmbedEmbedder.cpp:161-186)."""
    set_seed(14)
    g = _small_graph()
    monkeypatch.chdir(tmp_path)
    opts = EmbedderOptions(
        embedding_dimension=2, dump_weights=True, max_iterations=4,
        position_min_change=0.0,
    )
    emb = WEmbedEmbedder(g, opts, verbose=False)
    emb.calculate_embedding()
    lines = (tmp_path / "weight_dump.txt").read_text().strip().splitlines()
    assert len(lines) == 4
    row = np.asarray([float(x) for x in lines[0].split()])
    np.testing.assert_allclose(row, emb.get_weights())


@pytest.mark.slow
def test_bucket_colors_above_2pow24_stay_distinct():
    """Colors are compared as int32 in the span pass — distinct ids that
    would collide after a float32 cast (>= 2^24) must still repel
    (ADVICE round 1: the old float-packed colors silently dropped such
    pairs' repulsion)."""
    set_seed(11)
    rng = np.random.default_rng(77)
    g, _ = generators.geometric_graph(300, rng=rng)
    n = g.num_vertices
    coords = rng.uniform(0, n ** 0.5, size=(n, 2))
    opts = EmbedderOptions(
        embedding_dimension=2, dtype="float64",
        repulsion_mode=RepulsionMode.BUCKET, window_capacity=n,
    )
    w = weights_mod.initial_weights(g, opts)
    results = []
    for colors in [None, (2 ** 24 + np.arange(n, dtype=np.int64) % (2 ** 30)).astype(np.int32)]:
        gg = g.with_colors(colors) if colors is not None else g
        set_seed(11)
        emb = _embedder(gg, opts, coords, w)
        for _ in range(5):
            emb.calculate_step()
        results.append(emb.get_coordinates())
    # all-distinct colors (default arange vs 2^24+arange) are semantically
    # identical: every non-self pair repels either way
    np.testing.assert_allclose(results[0], results[1], rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("mode", [RepulsionMode.DENSE, RepulsionMode.BUCKET])
def test_profiled_step_matches_normal_step(mode):
    """Profiled (phase-split) stepping must match the fused jnp step up
    to XLA fusion-order rounding — same RNG splits, same math, only jit
    boundaries differ — and must produce the reference's per-phase timing
    tree (NewWEmbedEmbedder.cpp:38-91)."""
    set_seed(9)
    rng = np.random.default_rng(42)
    g, _ = generators.geometric_graph(200, rng=rng)
    n = g.num_vertices
    coords = rng.uniform(0, n ** 0.5, size=(n, 2))
    opts = EmbedderOptions(
        embedding_dimension=2, dtype="float64", repulsion_mode=mode,
        window_capacity=n, fused_dense="off",
    )
    w = weights_mod.initial_weights(g, opts)
    set_seed(9)
    normal = _embedder(g, opts, coords, w)
    set_seed(9)
    profiled = WEmbedEmbedder(
        g, opts, initial_coordinates=coords, initial_weights=w,
        verbose=False, profile=True,
    )
    for _ in range(6):
        normal.calculate_step()
        profiled.calculate_step()
    np.testing.assert_allclose(
        normal.get_coordinates(), profiled.get_coordinates(),
        rtol=1e-9, atol=1e-9,
    )
    np.testing.assert_allclose(
        float(normal.state.attract_loss), float(profiled.state.attract_loss),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        float(normal.state.repel_loss), float(profiled.state.repel_loss),
        rtol=1e-5,
    )
    assert int(normal.state.num_rep_forces) == int(profiled.state.num_rep_forces)

    names = [t.display_name for t in profiled.get_timings()]
    expected = ["attracting_forces", "repelling_forces", "apply_forces",
                "gravity", "position_change"]
    if mode is RepulsionMode.BUCKET:
        expected = ["index"] + expected
    for name in expected:
        assert name in names, names
    assert all(t.value > 0 for t in profiled.get_timings())
