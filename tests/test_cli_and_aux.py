"""CLI, drawing, checkpoint, and parser tests."""

import numpy as np
import pytest

from wembed_tpu.cli import embed as cli_embed
from wembed_tpu.cli import evaluate as cli_evaluate
from wembed_tpu.cli import generate as cli_generate
from wembed_tpu.core import EmbedderOptions, WEmbedEmbedder
from wembed_tpu.core.checkpoint import load_checkpoint, save_checkpoint
from wembed_tpu.draw import write_ipe, write_svg
from wembed_tpu.eval.parsers import parse_csv_config, parse_time_file, parse_wembed_log
from wembed_tpu.graphs import generators, io
from wembed_tpu.utils import Timer, set_seed, timings_to_string


def test_cli_embed_end_to_end(tmp_path):
    out = tmp_path / "emb.csv"
    rc = cli_embed.main(
        [
            "-i", "assets/small_graph.edg",
            "-o", str(out),
            "--dim", "2",
            "--iterations", "30",
            "--seed", "5",
            "--timings",
        ]
    )
    assert rc == 0
    coords = io.read_coordinates(str(out))
    assert coords.shape == (5, 3)  # 2 dims + weight


def test_cli_embed_init_coordinates(tmp_path):
    emb_a = tmp_path / "a.csv"
    cli_embed.main(
        ["-i", "assets/small_graph.edg", "-o", str(emb_a), "--dim", "2",
         "--iterations", "10", "--seed", "1"]
    )
    emb_b = tmp_path / "b.csv"
    rc = cli_embed.main(
        ["-i", "assets/small_graph.edg", "-o", str(emb_b), "--dim", "2",
         "--iterations", "5", "--init-coordinates", str(emb_a)]
    )
    assert rc == 0


def test_cli_embed_layered(tmp_path):
    out = tmp_path / "lay.csv"
    rc = cli_embed.main(
        ["-i", "assets/small_graph.edg", "-o", str(out), "--dim", "2",
         "--iterations", "20", "--layered", "--seed", "2"]
    )
    assert rc == 0


def test_cli_generate_and_evaluate(tmp_path, capsys):
    edg = tmp_path / "g.edg"
    coords = tmp_path / "g.csv"
    rc = cli_generate.main(
        ["-o", str(edg), "-w", str(coords), "-n", "400", "--avg-deg", "8",
         "--seed", "3", "-t", "0"]
    )
    assert rc == 0
    capsys.readouterr()

    rc = cli_evaluate.main(
        ["-g", str(edg), "-e", str(coords), "--emb-type", "0",
         "--node-samples", "50", "--seed", "4"]
    )
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    header, values = out[0].split(","), out[1].split(",")
    assert header[-5:] == ["constructDeg", "MAP", "precision", "recall", "edgeF1"]
    m = dict(zip(header, values))
    # true GIRG coordinates+weights should reconstruct well
    assert float(m["MAP"]) > 0.5
    assert float(m["edgeF1"]) > 0.5


def test_cli_evaluate_header_only(tmp_path, capsys):
    edg = tmp_path / "g.edg"
    coords = tmp_path / "g.csv"
    cli_generate.main(["-o", str(edg), "-w", str(coords), "-n", "100", "--seed", "3"])
    capsys.readouterr()
    rc = cli_evaluate.main(
        ["-g", str(edg), "-e", str(coords), "--header-only"]
    )
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1


def test_svg_and_ipe_writers(tmp_path):
    rng = np.random.default_rng(0)
    g, coords = generators.geometric_graph(100, rng=rng)
    svg = tmp_path / "g.svg"
    write_svg(str(svg), g, coords, weights=np.ones(g.num_vertices))
    text = svg.read_text()
    assert text.startswith("<svg")
    assert text.count("<circle") == g.num_vertices
    assert text.count("<line") == g.num_edges

    ipe = tmp_path / "g.ipe"
    write_ipe(str(ipe), g, coords)
    t = ipe.read_text()
    assert "<ipe" in t and t.count("<use") == g.num_vertices


def test_animated_svg(tmp_path):
    from wembed_tpu import api
    from wembed_tpu.draw import FrameRecorder, animate_embedding, write_animated_svg

    set_seed(5)
    g, _ = generators.geometric_graph(60, rng=np.random.default_rng(2))
    graph = api.Graph(g)
    emb = api.createEmbedder(
        graph, api.Options(embeddingDimension=2, maxIterations=30)
    )
    rec = animate_embedding(emb, every=5)
    assert len(rec) >= 3  # init frame + interval frames + final frame
    out = tmp_path / "anim.svg"
    write_animated_svg(
        str(out), g, rec.frames, weights=np.asarray(emb.getWeights())
    )
    text = out.read_text()
    assert text.startswith("<svg")
    assert text.count("<circle") == g.num_vertices
    # every circle animates both coordinates across all frames
    assert text.count('attributeName="cx"') == g.num_vertices
    first_track = text.split('values="', 1)[1].split('"', 1)[0]
    assert first_track.count(";") == len(rec) - 1


def test_checkpoint_roundtrip(tmp_path):
    set_seed(13)
    g, _ = generators.geometric_graph(80, rng=np.random.default_rng(1))
    opts = EmbedderOptions(embedding_dimension=2, max_iterations=50,
                           position_min_change=0.0)
    emb = WEmbedEmbedder(g, opts, verbose=False)
    for _ in range(5):
        emb.calculate_step()
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, emb)

    set_seed(13)
    emb2 = WEmbedEmbedder(g, opts, verbose=False)
    load_checkpoint(path, emb2)
    # continued trajectories must match bit-for-bit
    for _ in range(3):
        emb.calculate_step()
        emb2.calculate_step()
    np.testing.assert_array_equal(emb.get_coordinates(), emb2.get_coordinates())
    assert emb2.iteration == emb.iteration


def test_parsers(tmp_path):
    log = tmp_path / "run.log"
    log.write_text("noise\n> learningRate=10\n> dimension(default)=4\n")
    cfg = parse_wembed_log(str(log))
    assert cfg == {"learningRate": "10", "dimension": "4"}

    csvf = tmp_path / "cfg.csv"
    csvf.write_text("a,b\n1,2\n")
    assert parse_csv_config(str(csvf)) == {"a": "1", "b": "2"}

    tf = tmp_path / "time.txt"
    tf.write_text("12.5\n")
    assert parse_time_file(str(tf)) == "12.5"


def test_timer_tree():
    t = Timer()
    with t.phase("a", "Phase A"):
        with t.phase("b", "Phase B"):
            pass
        with t.phase("b", "Phase B"):
            pass
    res = t.results()
    assert [r.display_name for r in res] == ["Phase A", "Phase B"]
    assert [r.depth for r in res] == [0, 1]
    assert "Phase A" in timings_to_string(res)


def test_layered_checkpoint_resumes_mid_hierarchy(tmp_path):
    """A multilevel run checkpointed mid-hierarchy must resume with the
    SAME hierarchy (saved parent pointers, not re-coarsened) and continue
    the inner embedder bit-for-bit (the reference cannot resume layered
    runs at all, LayeredEmbedder.cpp:26-36)."""
    from wembed_tpu.multilevel import LayeredEmbedder

    set_seed(21)
    g, _ = generators.geometric_graph(300, rng=np.random.default_rng(2))
    opts = EmbedderOptions(embedding_dimension=2, max_iterations=40,
                           position_min_change=0.0)
    emb = LayeredEmbedder(g, opts, verbose=False)
    # step until at least one expansion happened (mid-hierarchy)
    while emb.current_layer == emb.hierarchy.num_layers - 1:
        emb.calculate_step()
    for _ in range(3):
        emb.calculate_step()
    assert 0 <= emb.current_layer < emb.hierarchy.num_layers - 1
    path = str(tmp_path / "layered.npz")
    save_checkpoint(path, emb)

    set_seed(99)  # different seed: hierarchy must come from the checkpoint
    emb2 = LayeredEmbedder(g, opts, verbose=False)
    load_checkpoint(path, emb2)
    assert emb2.current_layer == emb.current_layer
    assert emb2.current_iteration == emb.current_iteration
    assert emb2.hierarchy.num_layers == emb.hierarchy.num_layers
    for a, b in zip(emb.hierarchy.layers, emb2.hierarchy.layers):
        np.testing.assert_array_equal(a.parent, b.parent)
        assert a.graph.num_vertices == b.graph.num_vertices
        assert a.graph.num_edges == b.graph.num_edges
    np.testing.assert_array_equal(emb.get_coordinates(), emb2.get_coordinates())
    for _ in range(3):
        emb.calculate_step()
        emb2.calculate_step()
    np.testing.assert_array_equal(emb.get_coordinates(), emb2.get_coordinates())


def test_debug_checks_flag(tmp_path):
    """debug_checks (the EMBEDDING_USE_ASSERTIONS analogue,
    Macros.hpp:7-11) passes clean runs and raises on injected NaNs."""
    import jax
    import jax.numpy as jnp

    set_seed(3)
    g, _ = generators.geometric_graph(60, rng=np.random.default_rng(4))
    opts = EmbedderOptions(
        embedding_dimension=2, max_iterations=5, debug_checks=True,
        fused_dense="off",
    )
    try:
        emb = WEmbedEmbedder(g, opts, verbose=False)
        emb.calculate_step()  # clean step passes
        bad = np.asarray(emb.get_coordinates())
        bad[0, 0] = np.nan
        emb.state = emb.state._replace(
            positions=jnp.asarray(bad, emb.state.positions.dtype)
        )
        with pytest.raises(FloatingPointError):
            emb._debug_validate()
    finally:
        jax.config.update("jax_debug_nans", False)
