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


# --------------------------------------------------- fused span (sparse) path


def _span_setup(n, d, additive, span_scale, seed=7):
    """(graph, opts, weights, inv_w, positions, SpanIndex, DeviceGraph)."""
    import jax.numpy as jnp

    from wembed_tpu.core.state import DeviceGraph
    from wembed_tpu.kernels import span_sparse as span_mod

    g, _, _ = generators.girg(
        n, dim=2, avg_degree=12, ple=2.2, rng=np.random.default_rng(seed)
    )
    opts = EmbedderOptions(embedding_dimension=d, additive_weights=additive)
    w = weights_mod.initial_weights(g, opts)
    inv_w = weights_mod.inv_exp_weights(w, d)
    rng = np.random.default_rng(1)
    pos = rng.normal(size=(g.num_vertices, d)).astype(np.float32) * 2.0
    idx = span_mod.SpanIndex.build(
        w, opts, g.edge_src, g.col_idx, span_scale=span_scale
    )
    return (
        g,
        opts,
        jnp.asarray(w, jnp.float32),
        jnp.asarray(inv_w, jnp.float32),
        jnp.asarray(pos),
        idx,
        DeviceGraph.build(g),
    )


@pytest.mark.parametrize("d,additive", [(2, False), (3, False), (2, True)])
def test_span_kernel_matches_dense_oracle(d, additive):
    """The fused span sweep (interpret mode) must reproduce the exact
    dense-path repulsion forces/losses when no window truncates: the
    active set (dist*ws <= L) is radius-independent, so merged-group
    candidate widening changes only the candidate COUNT."""
    import jax.numpy as jnp

    from wembed_tpu.core import forces
    from wembed_tpu.kernels import span_sparse as span_mod

    g, opts, w, inv_w, pos, idx, dg = _span_setup(900, d, additive, 8.0)
    f, loss, cnt, ovf, zc = span_mod.span_repulsion_forces(
        pos, inv_w, w, dg.colors, idx, opts, interpret=True
    )
    assert int(ovf) == 0
    adj = forces.build_dense_adjacency(dg)
    fd, lossd, cntd, zcd = forces.dense_repulsion_forces(
        pos, inv_w, adj, dg.colors, opts
    )
    scale = float(jnp.max(jnp.abs(fd))) + 1e-30
    np.testing.assert_allclose(
        np.asarray(f) / scale, np.asarray(fd) / scale, atol=5e-5
    )
    np.testing.assert_allclose(float(loss), float(lossd), rtol=2e-4)
    assert bool(jnp.all(zc == zcd))
    assert int(cnt) >= int(cntd)  # merged radii only widen the candidate set


@pytest.mark.slow
def test_span_embedder_matches_jnp_bucket():
    """Embedder trajectories: fused_span="interpret" vs the jnp bucket path
    with identical inits — same active sets => same forces up to f32
    rounding for the first few steps."""
    set_seed(11)
    rng = np.random.default_rng(17)
    g, _, _ = generators.girg(
        700, dim=2, avg_degree=10, ple=2.5, rng=np.random.default_rng(23)
    )
    n, d = g.num_vertices, 2
    coords = rng.uniform(0, n ** (1 / d), size=(n, d))
    base = dict(
        embedding_dimension=d,
        dtype="float32",
        repulsion_mode=RepulsionMode.BUCKET,
    )
    opts_s = EmbedderOptions(fused_span="interpret", **base)
    opts_j = EmbedderOptions(fused_span="off", **base)
    w = weights_mod.initial_weights(g, opts_j)
    emb_s = _embedder(g, opts_s, coords, w)
    emb_j = _embedder(g, opts_j, coords, w)
    from wembed_tpu.kernels import span_sparse as span_mod

    assert isinstance(emb_s._index, span_mod.SpanIndex)
    # f32 trajectories diverge chaotically (hinge flips near dist*ws == L
    # compound through Adam), so instead of comparing two trajectories,
    # drive ONE trajectory (the jnp path) and compare the span path's
    # FORCE FIELD at the same positions every step — a far stronger
    # semantic check over diverse configurations.
    import jax
    import jax.numpy as jnp

    from wembed_tpu.core import candidates as cand_mod
    from wembed_tpu.core.state import DeviceGraph

    dg = DeviceGraph.build(g)
    invw = jnp.asarray(emb_j._inv_w, jnp.float32)
    wj = jnp.asarray(emb_j._weights, jnp.float32)
    for it in range(3):
        emb_j.calculate_step()
        pos = jnp.asarray(emb_j.state.positions, jnp.float32)
        f_s, loss_s, cnt_s, ovf_s, zc_s = span_mod.span_repulsion_forces(
            pos, invw, wj, dg.colors, emb_s._index, opts_s, interpret=True
        )
        f_j, loss_j, cnt_j, ovf_j, zc_j = cand_mod.bucket_repulsion_forces(
            pos, invw, wj, dg, emb_j._index, opts_j, jax.random.PRNGKey(it)
        )
        assert int(ovf_s) == 0 and int(ovf_j) == 0
        scale = float(jnp.max(jnp.abs(f_j))) + 1e-30
        np.testing.assert_allclose(
            np.asarray(f_s) / scale, np.asarray(f_j) / scale, atol=5e-5
        )
        np.testing.assert_allclose(float(loss_s), float(loss_j), rtol=2e-4)
        assert bool(jnp.all(zc_s == zc_j))
        # counter parity (VERDICT r2 item 9): the span count channel uses
        # per-class radii, so it must EQUAL the jnp bucket path's count
        assert int(cnt_s) == int(cnt_j)


@pytest.mark.slow
def test_span_overflow_grows_and_recovers():
    """A deliberately starved window table must report overflow, and the
    embedder's span growth must recover full coverage (final overflow 0)."""
    set_seed(12)
    from wembed_tpu.kernels import span_sparse as span_mod

    g, opts, w, inv_w, pos, idx, dg = _span_setup(3000, 2, False, 1e-6, seed=5)
    # starved scale: every (qg, tg) pair gets the 1-tile minimum
    assert idx.can_grow() or int(np.max(idx.row_sizes)) <= 512
    f, loss, cnt, ovf, zc = span_mod.span_repulsion_forces(
        pos * 100.0, inv_w, w, dg.colors, idx, opts, interpret=True
    )
    if int(np.max(idx.row_sizes)) > 512:
        assert int(ovf) > 0  # spread positions overflow the 1-tile windows
    # growth: doubling span_scale until coverage is total must zero overflow
    scale = 1e-6
    while int(ovf) > 0 and idx.can_grow():
        scale *= 1024.0
        idx = span_mod.SpanIndex.build(
            np.asarray(w), opts, g.edge_src, g.col_idx, span_scale=scale
        )
        f, loss, cnt, ovf, zc = span_mod.span_repulsion_forces(
            pos * 100.0, inv_w, w, dg.colors, idx, opts, interpret=True
        )
    assert int(ovf) == 0


@pytest.mark.slow
def test_span_adaptive_growth_covers_in_one_rebuild():
    """grow_from_needs widens exactly the starved windows: one rebuild
    from measured needs must reach overflow 0 and dense-oracle forces."""
    import jax.numpy as jnp

    from wembed_tpu.core import forces
    from wembed_tpu.kernels import span_sparse as span_mod

    g, opts, w, inv_w, pos, idx, dg = _span_setup(3000, 2, False, 1e-6, seed=5)
    pos = pos * 100.0  # spread positions so 1-tile windows overflow
    s = span_mod.build_span_structures(pos, inv_w, w, dg.colors, idx, opts)
    assert int(s.overflow) > 0
    grown = idx.grow_from_needs(np.asarray(s.need))
    assert grown is not None and grown.w > idx.w
    s2 = span_mod.build_span_structures(pos, inv_w, w, dg.colors, grown, opts)
    assert int(s2.overflow) == 0
    f, loss, cnt, ovf, zc = span_mod.span_repulsion_forces(
        pos, inv_w, w, dg.colors, grown, opts, interpret=True, structures=s2
    )
    adj = forces.build_dense_adjacency(dg)
    fd, lossd, _, zcd = forces.dense_repulsion_forces(
        pos, inv_w, adj, dg.colors, opts
    )
    scale = float(jnp.max(jnp.abs(fd))) + 1e-30
    np.testing.assert_allclose(
        np.asarray(f) / scale, np.asarray(fd) / scale, atol=5e-5
    )
    assert bool(jnp.all(zc == zcd))


def test_span_fused_forces_matches_separate_passes():
    """span_fused_forces (kernel + ONE merged attraction/correction edge
    pass) must equal attraction_forces + span_repulsion_forces."""
    import jax
    import jax.numpy as jnp

    from wembed_tpu.core import forces
    from wembed_tpu.kernels import span_sparse as span_mod

    g, opts, w, inv_w, pos, idx, dg = _span_setup(900, 2, False, 8.0)
    key = jax.random.PRNGKey(3)
    f_r, loss_r, cnt_r, ovf_r, zc_r = span_mod.span_repulsion_forces(
        pos, inv_w, w, dg.colors, idx, opts, interpret=True
    )
    f_a, loss_a = forces.attraction_forces(pos, inv_w, dg, opts, key)
    f_m, att_m, rep_m, cnt_m, ovf_m, zc_m = span_mod.span_fused_forces(
        pos, inv_w, w, dg.colors, idx, opts, key, interpret=True
    )
    ref = np.asarray(f_r + f_a)
    scale = np.abs(ref).max() + 1e-30
    # the merged pass reduces edges by cumsum + CSR boundary diff while
    # attraction_forces scatters — f32 summation-order noise only
    np.testing.assert_allclose(
        np.asarray(f_m) / scale, ref / scale, atol=5e-5
    )
    np.testing.assert_allclose(float(att_m), float(loss_a), rtol=1e-6)
    np.testing.assert_allclose(float(rep_m), float(loss_r), rtol=1e-5)
    assert int(cnt_m) == int(cnt_r)
    assert int(ovf_m) == int(ovf_r)
    assert bool(jnp.all(zc_m == zc_r))

def test_shrunk_pairs_report_no_phantom_overflow():
    """A (query, target) pair shrunk to 0 tiles with zero members in range
    must contribute ZERO overflow (not its rank offset mod tile size), and
    grow_from_needs must NOT resurrect shrunk pairs whose measured need is
    still zero — otherwise every growth event undoes the zero-need resize and
    wastes capped growth budget (advisor r2, span_sparse.py)."""
    from wembed_tpu.kernels import span_sparse as span_mod

    g, opts, w, inv_w, pos, idx, dg = _span_setup(3000, 2, False, 4.0, seed=5)
    # force EVERY window to 0 tiles: with zero coverage, overflow must
    # equal the sum of true needs (stop - start), not need + rank junk
    bare = idx._with_blk_t(np.zeros_like(idx.blk_t))
    s = span_mod.build_span_structures(pos, inv_w, w, dg.colors, bare, opts)
    needs = np.asarray(s.need)
    # overflow counts TRUE truncated members (stop - start); ``need`` is
    # the tile-ALIGNED count (from floor(start/ST)), so overflow is
    # bounded by it with at most one tile of alignment slack per window
    nonzero = int((needs > 0).sum())
    assert 0 < int(s.overflow) <= int(needs.sum())
    assert int(needs.sum()) - int(s.overflow) < nonzero * span_mod._ST
    # growth from measured needs must keep zero-need pairs at 0 tiles
    grown = bare.grow_from_needs(needs)
    assert grown is not None
    assert (grown.blk_t[needs == 0] == 0).all()
    assert (grown.blk_t[needs > 0] > 0).all()

def test_measure_needs_host_matches_device():
    """The numpy needs measurement (presize/growth protocol) must agree
    with the device structures build: identical needs and overflow given
    the same projection axis semantics."""
    import jax.numpy as jnp

    from wembed_tpu.kernels import span_sparse as span_mod

    g, opts, w, inv_w, pos, idx, dg = _span_setup(3000, 2, False, 4.0, seed=5)
    s = span_mod.build_span_structures(pos, inv_w, w, dg.colors, idx, opts)
    need_dev = np.asarray(s.need)
    need_host, ovf_host = span_mod.measure_needs_host(
        np.asarray(pos), np.asarray(w), idx, opts
    )
    # axes come from independent power iterations (f32 device vs f64
    # host), so window boundaries can differ by a few members
    assert np.abs(need_host - need_dev).max() <= max(
        3, int(0.02 * need_dev.max())
    )
    assert abs(ovf_host - int(s.overflow)) <= 0.05 * max(int(s.overflow), 50)

def test_span_query_smem_chunking_matches(monkeypatch):
    """Work-tile lists beyond the SMEM budget run as several pallas calls
    with summed masked partials — must equal the single-call sweep (the
    scalar-prefetch tables at million-vertex scale exceed v5e SMEM)."""
    import jax.numpy as jnp

    from wembed_tpu.kernels import span_sparse as span_mod

    g, opts, w, inv_w, pos, idx, dg = _span_setup(3000, 2, False, 4.0, seed=5)
    s = span_mod.build_span_structures(pos, inv_w, w, dg.colors, idx, opts)
    full = span_mod.span_query(s, idx, opts, interpret=True)
    assert idx.w_pad > 256  # the patched budget actually splits the list
    monkeypatch.setattr(span_mod, "_W_SMEM", 256)
    monkeypatch.setattr(span_mod, "_W_SMEM_PACKED", 256)
    chunked = span_mod.span_query(s, idx, opts, interpret=True)
    np.testing.assert_allclose(
        np.asarray(chunked), np.asarray(full), rtol=1e-6, atol=1e-5
    )


def test_grow_all_fallback_terminates(monkeypatch):
    """Host/device needs divergence (VERDICT r3 item 8): when the host
    needs measurement claims full coverage but the device still reports
    overflow (independent projection axes CAN disagree — seen on d=4
    hardware), the growth protocol must fall back to ``grow_all`` and
    terminate with overflow 0 within a handful of events, not burn the
    growth budget.  Simulated by pinning the host measurement to
    zero-need (the worst case: presize shrinks every window to 0 tiles,
    and every subsequent growth event gets no host guidance)."""
    from wembed_tpu.core import span_driver
    from wembed_tpu.core.embedder import WEmbedEmbedder
    from wembed_tpu.core.options import RepulsionMode
    from wembed_tpu.kernels import span_sparse as span_mod

    g, _, _ = generators.girg(
        600, dim=2, avg_degree=10, ple=2.3, rng=np.random.default_rng(3)
    )
    monkeypatch.setattr(
        span_driver.span_mod,
        "measure_needs_host",
        lambda pos, w, idx, opts: (
            np.zeros((idx.nb, idx.num_rows), np.int64),
            0,
        ),
    )
    opts = EmbedderOptions(
        embedding_dimension=2,
        dtype="float32",
        repulsion_mode=RepulsionMode.BUCKET,
        fused_span="interpret",
        max_iterations=6,
        position_min_change=0.0,
    )
    set_seed(21)
    emb = WEmbedEmbedder(g, opts, verbose=False)
    assert isinstance(emb._index, span_mod.SpanIndex)
    # presize under the pinned zero needs shrank every window to nothing
    assert int(emb._index.blk_t.sum()) == 0
    emb.calculate_embedding()
    # device-truth growth (additive grow_all) recovered full coverage...
    assert int(emb.state.overflow) == 0
    assert np.isfinite(emb.get_coordinates()).all()
    # ...within a handful of +1-tile events, nowhere near the 200 budget
    assert 0 < emb._growth_events <= 12


@pytest.mark.slow
def test_sharded_structure_build_matches_unsharded():
    """VERDICT r3 item 7: the per-step structure rebuild is work-
    partitioned across the mesh (chunked gathers / window search /
    inverse scatter + one tiled all_gather or psum each) — and must be
    BITWISE identical to the single-device build."""
    import jax
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from wembed_tpu.distributed import make_mesh
    from wembed_tpu.kernels import span_sparse as span_mod

    if len(jax.devices()) < 8:
        import pytest

        pytest.skip("needs 8 virtual devices")
    g, opts, w, inv_w, pos, idx, dg = _span_setup(2500, 2, False, 4.0)
    mesh = make_mesh(8)

    plain = span_mod.build_span_structures(
        pos, inv_w, w, dg.colors, idx, opts
    )

    sharded_build = shard_map(
        lambda p, iw, wt, col: span_mod.build_span_structures(
            p, iw, wt, col, idx, opts, shard=("data", 8)
        ),
        mesh=mesh,
        in_specs=(P(), P(), P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    sharded = sharded_build(pos, inv_w, w, dg.colors)

    for name, a, b in zip(plain._fields, plain, sharded):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=name
        )


@pytest.mark.slow
def test_shrink_to_needs_reduces_and_stays_exact():
    """Segment-boundary shrink (r04): inflate every window to full row
    coverage (the post-bulge state), shrink to measured needs — tiles
    must drop, results must still match the dense oracle exactly, and a
    fresh measurement must report no starvation (no grow/shrink thrash)."""
    import jax.numpy as jnp

    from wembed_tpu.core import forces
    from wembed_tpu.kernels import span_sparse as span_mod

    g, opts, w, inv_w, pos, idx, dg = _span_setup(2500, 2, False, 8.0)
    # spread positions: tight true needs, so full-row windows are fat
    pos = pos * 25.0
    fat = idx._with_blk_t(
        np.broadcast_to(
            idx.row_tiles[None, :], (idx.nb, idx.num_rows)
        ).astype(np.int64)
    )
    needs, ovf = span_mod.measure_needs_host(
        np.asarray(pos, np.float64), np.asarray(w, np.float64), fat, opts
    )
    assert ovf == 0
    shrunk = fat.shrink_to_needs(needs)
    assert shrunk is not None
    assert shrunk.w < fat.w
    # bucket either kept (zero recompile) or re-bucketed DOWN the ladder
    # (a previously-compiled size => persistent-cache hit)
    assert shrunk.w_pad <= fat.w_pad

    f, loss, cnt, ovf2, zc = span_mod.span_repulsion_forces(
        pos, inv_w, w, dg.colors, shrunk, opts, interpret=True
    )
    assert int(ovf2) == 0
    adj = forces.build_dense_adjacency(dg)
    fd, lossd, _, _ = forces.dense_repulsion_forces(
        pos, inv_w, adj, dg.colors, opts
    )
    scale = float(jnp.max(jnp.abs(fd))) + 1e-30
    # the kernel's q*rowsum - acc reduction carries an f32 residual of
    # O(eps * |position| * coeff); the 25x coordinate spread scales it
    np.testing.assert_allclose(
        np.asarray(f) / scale, np.asarray(fd) / scale, atol=1e-3
    )
    np.testing.assert_allclose(float(loss), float(lossd), rtol=2e-4)
    # hysteresis: a second shrink pass with the same needs is a no-op
    assert shrunk.shrink_to_needs(needs) is None


def test_grow_all_restricted_to_live_windows():
    """grow_all must not resurrect zero-width zero-need windows: on the
    r04 1M layered trajectory two unrestricted +1 events grew 546K
    overlap-but-empty windows to 1.8M work tiles (real need 143K) and the
    resulting 2^22-tile bucket recompile died mid-run."""
    from wembed_tpu.core import weights as wmod
    from wembed_tpu.kernels import span_sparse as span_mod

    g, _, _ = generators.girg(
        800, dim=2, avg_degree=8, ple=2.4, rng=np.random.default_rng(11)
    )
    opts = EmbedderOptions(embedding_dimension=2)
    w = wmod.initial_weights(g, opts)
    idx = span_mod.SpanIndex.build(w, opts, g.edge_src, g.col_idx)

    # dead first half (zero width, zero need); alive second half pinned
    # one tile below each row's cap so +1 growth is possible
    blk_t = np.zeros_like(idx.blk_t, dtype=np.int64)
    half = idx.nb // 2 + 1
    blk_t[half:] = np.maximum(idx.row_tiles[None, :] - 1, 0)
    grow_room = (blk_t[half:] < idx.row_tiles[None, :]).any()
    assert grow_room  # the fixture must leave something to grow
    idx0 = idx._with_blk_t(blk_t)
    needs = np.zeros((idx.nb, idx.num_rows), np.int64)
    needs[half:] = 1

    grown = idx0.grow_all(needs)
    assert grown is not None
    assert int(grown.blk_t[:half].sum()) == 0  # dead windows stayed dead
    expect = np.minimum(
        blk_t[half:] + 1, np.broadcast_to(idx.row_tiles[None, :], blk_t[half:].shape)
    )
    np.testing.assert_array_equal(grown.blk_t[half:], expect)


def test_stale_overflow_resumes_without_growth():
    """Device-measured needs saying 'covered' while the state carries an
    overflow flag means the overflow is STALE (positions moved one step
    between the overflowing sweep and the measurement) — the driver must
    resume the loop without growing anything, bounded at 3 consecutive
    resumes before escalating to the additive live-window fallback."""
    import jax.numpy as jnp

    from wembed_tpu.core.options import RepulsionMode
    from wembed_tpu.kernels import span_sparse as span_mod

    g, _, _ = generators.girg(
        600, dim=2, avg_degree=10, ple=2.3, rng=np.random.default_rng(3)
    )
    opts = EmbedderOptions(
        embedding_dimension=2,
        dtype="float32",
        repulsion_mode=RepulsionMode.BUCKET,
        fused_span="interpret",
        max_iterations=3,
    )
    set_seed(13)
    emb = WEmbedEmbedder(g, opts, verbose=False)
    assert isinstance(emb._index, span_mod.SpanIndex)
    emb.calculate_embedding()

    # pin windows to one tile (below the row caps ⇒ can_grow is True) and
    # the needs measurement to zero ⇒ grow_from_needs reports covered
    idx1 = emb._index._with_blk_t(np.minimum(emb._index.blk_t, 1).astype(np.int64))
    emb._swap_index(idx1)
    emb._current_needs = lambda: np.zeros(
        (idx1.nb, idx1.num_rows), np.int64
    )
    emb._needs_from_device = True
    emb._state = emb._state._replace(overflow=jnp.asarray(7, jnp.int32))

    events_before = emb._growth_events
    for _ in range(3):
        assert emb._grow_spans() is True  # resume, no growth
        assert emb._index is idx1
        assert emb._growth_events == events_before
    # 4th consecutive stale overflow escalates to restricted grow_all
    assert emb._grow_spans() is True
    assert emb._index is not idx1
    assert emb._growth_events == events_before + 1
    grew = emb._index.blk_t.astype(np.int64) - idx1.blk_t
    assert grew.max() == 1 and grew.min() >= 0
    assert (grew[idx1.blk_t == 0] == 0).all()  # only live windows grew


# ---------------------------------------------------------- cell-compact


def _cell_setup(n, d, additive=False, seed=7):
    """(graph, opts, w, inv_w, positions, presized CellIndex, DeviceGraph)."""
    import jax.numpy as jnp

    from wembed_tpu.core.state import DeviceGraph
    from wembed_tpu.kernels import span_compact as cc

    g, _, _ = generators.girg(
        n, dim=2, avg_degree=12, ple=2.2, rng=np.random.default_rng(seed)
    )
    opts = EmbedderOptions(embedding_dimension=d, additive_weights=additive)
    w = weights_mod.initial_weights(g, opts)
    inv_w = weights_mod.inv_exp_weights(w, d)
    pos = np.random.default_rng(1).normal(
        size=(g.num_vertices, d)
    ).astype(np.float32) * 2.0
    idx = cc.CellIndex.build(w, opts, g.edge_src, g.col_idx)
    for _ in range(8):
        needs, ovf = cc.measure_cell_needs_host(
            np.asarray(pos, np.float64), w, idx, opts
        )
        if ovf == 0:
            break
        grown = idx.grow_from_needs(needs)
        if grown is None:
            break
        idx = grown
    resized = idx.resize_to_needs(needs)
    if resized is not None:
        idx = resized
    return (
        g,
        opts,
        jnp.asarray(w, jnp.float32),
        jnp.asarray(inv_w, jnp.float32),
        jnp.asarray(pos),
        idx,
        DeviceGraph.build(g),
    )


import jax.numpy as jnp  # noqa: E402  (test helpers below)


@pytest.mark.parametrize(
    "d,additive",
    [
        # d=3 non-additive is the largest variant (~22 s) — slow tier; the
        # d=4 and additive variants keep cell-vs-dense parity in the
        # default tier
        pytest.param(3, False, marks=pytest.mark.slow),
        (4, False),
        (3, True),
    ],
)
def test_cell_kernel_matches_dense_oracle(d, additive):
    """The cell-compacted sweep (interpret mode) must reproduce the exact
    dense-path repulsion when no block truncates — same contract as the
    windowed span test, with the three-level layout exercised (multiple
    rows AND cells)."""
    from wembed_tpu.core import forces
    from wembed_tpu.kernels import span_compact as cc

    g, opts, w, inv_w, pos, idx, dg = _cell_setup(6000, d, additive)
    assert idx.num_rows > 1 and idx.num_cells > idx.num_rows
    f, loss, cnt, ovf, zc = cc.cell_repulsion_forces(
        pos, inv_w, w, dg.colors, idx, opts, interpret=True
    )
    assert int(ovf) == 0
    adj = forces.build_dense_adjacency(dg)
    fd, lossd, cntd, zcd = forces.dense_repulsion_forces(
        pos, inv_w, adj, dg.colors, opts
    )
    scale = float(jnp.max(jnp.abs(fd))) + 1e-30
    np.testing.assert_allclose(
        np.asarray(f) / scale, np.asarray(fd) / scale, atol=5e-5
    )
    np.testing.assert_allclose(float(loss), float(lossd), rtol=2e-4)
    assert bool(jnp.all(zc == zcd))
    assert int(cnt) >= int(cntd)


def test_cell_counts_match_windowed_span():
    """Both span layouts count the IDENTICAL per-class candidate set when
    nothing truncates (the count channel's radius is per-target-class in
    both; layouts only change window COVERAGE)."""
    from wembed_tpu.kernels import span_compact as cc
    from wembed_tpu.kernels import span_sparse as span_mod

    d = 3
    g, opts, w, inv_w, pos, idx, dg = _cell_setup(6000, d)
    fc, lc, cnt_c, ovf_c, _ = cc.cell_repulsion_forces(
        pos, inv_w, w, dg.colors, idx, opts, interpret=True
    )
    si = span_mod.SpanIndex.build(
        np.asarray(w, np.float64), opts, g.edge_src, g.col_idx, span_scale=8.0
    )
    for _ in range(8):
        needs, ovf = span_mod.measure_needs_host(
            np.asarray(pos, np.float64), np.asarray(w, np.float64), si, opts
        )
        if ovf == 0:
            break
        grown = si.grow_from_needs(needs)
        if grown is None:
            break
        si = grown
    fs, ls, cnt_s, ovf_s, _ = span_mod.span_repulsion_forces(
        pos, inv_w, w, dg.colors, si, opts, interpret=True
    )
    assert int(ovf_c) == 0 and int(ovf_s) == 0
    assert int(cnt_c) == int(cnt_s)
    scale = float(jnp.max(jnp.abs(fs))) + 1e-30
    np.testing.assert_allclose(
        np.asarray(fc) / scale, np.asarray(fs) / scale, atol=5e-5
    )


@pytest.mark.slow
def test_cell_truncation_surfaces_and_growth_recovers():
    """Starved per-block capacities must surface overflow (never silent)
    and keep the edge correction consistent (only pairs the truncated
    sweep actually counted get corrected); capacity growth from measured
    needs recovers the exact untruncated result."""
    from wembed_tpu.core import forces
    from wembed_tpu.kernels import span_compact as cc

    g, opts, w, inv_w, pos, idx, dg = _cell_setup(3000, 3)
    full, loss_full, cnt_full, ovf0, _ = cc.cell_repulsion_forces(
        pos, inv_w, w, dg.colors, idx, opts, interpret=True
    )
    assert int(ovf0) == 0

    starved = idx._with_caps(np.minimum(idx.cap_t, 1))
    f1, l1, c1, ovf1, _ = cc.cell_repulsion_forces(
        pos, inv_w, w, dg.colors, starved, opts, interpret=True
    )
    assert int(ovf1) > 0
    assert int(c1) < int(cnt_full)
    assert np.isfinite(np.asarray(f1)).all()

    regrown = starved
    for _ in range(10):
        needs, ovf = cc.measure_cell_needs_host(
            np.asarray(pos, np.float64), np.asarray(w, np.float64),
            regrown, opts,
        )
        if ovf == 0:
            break
        nxt = regrown.grow_from_needs(needs)
        if nxt is None:
            break
        regrown = nxt
    f2, l2, c2, ovf2, _ = cc.cell_repulsion_forces(
        pos, inv_w, w, dg.colors, regrown, opts, interpret=True
    )
    assert int(ovf2) == 0
    assert int(c2) == int(cnt_full)
    scale = float(jnp.max(jnp.abs(full))) + 1e-30
    np.testing.assert_allclose(
        np.asarray(f2) / scale, np.asarray(full) / scale, atol=5e-5
    )


def test_cell_host_needs_mirror_matches_device():
    """The numpy presize mirror and the in-jit structures build must agree
    on per-block needs and overflow (same f32 power-iteration axes)."""
    from wembed_tpu.kernels import span_compact as cc

    g, opts, w, inv_w, pos, idx, dg = _cell_setup(4000, 3)
    host_needs, host_ovf = cc.measure_cell_needs_host(
        np.asarray(pos, np.float64), np.asarray(w, np.float64), idx, opts
    )
    s = cc.build_cell_structures(
        pos.astype(jnp.float32), inv_w, w, dg.colors, idx, opts
    )
    np.testing.assert_array_equal(np.asarray(s.need), host_needs)
    assert int(s.overflow) == host_ovf


@pytest.mark.slow
def test_cell_embedder_end_to_end_d3():
    """span_layout='cells' drives the cell-compact index end to end
    through the shared growth protocol."""
    from wembed_tpu.core.options import RepulsionMode
    from wembed_tpu.kernels import span_compact as cc

    g, _, _ = generators.girg(
        2000, dim=3, avg_degree=10, ple=2.4, rng=np.random.default_rng(4)
    )
    opts = EmbedderOptions(
        embedding_dimension=3,
        dtype="float32",
        repulsion_mode=RepulsionMode.BUCKET,
        fused_span="interpret",
        span_layout="cells",
        max_iterations=30,
    )
    set_seed(9)
    emb = WEmbedEmbedder(g, opts, verbose=False)
    assert isinstance(emb._index, cc.CellIndex)
    emb.calculate_embedding()
    assert emb.iteration > 0
    assert np.isfinite(emb.get_coordinates()).all()
    assert int(emb.state.overflow) == 0
