#!/usr/bin/env python
"""Large-graph (sparse bucket path) throughput measurement on the TPU.

Usage: python baselines/scale_bench.py <graph.edg> [dim] [iters] [init.csv]

Prints a JSON line with steady-state edges/s for the bucketed sparse
repulsion path, plus per-phase wall time, so sparse-path optimization has
a stable yardstick (BASELINE.md row 4).

The optional ``init.csv`` warm-starts from a saved embedding (reference
CSV format), so post-convergence steady state — e.g. the geometry the
1M layered pipeline ends in — is measurable without re-running the whole
pipeline (VERDICT r4 item 5's cross-round trend line).
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    import jax

    from wembed_tpu.core import EmbedderOptions, WEmbedEmbedder
    from wembed_tpu.graphs import io
    from wembed_tpu.kernels import span_sparse as span_mod
    from wembed_tpu.utils import set_seed

    path = sys.argv[1]
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 50
    init_csv = sys.argv[4] if len(sys.argv) > 4 else None

    set_seed(1)
    g = io.read_edge_list(path)
    m = g.num_edges
    opts = EmbedderOptions(embedding_dimension=dim, max_iterations=iters)
    t0 = time.perf_counter()
    emb = WEmbedEmbedder(g, opts, verbose=False)
    if init_csv:
        # trailing weight column (if present) is dropped by the reference's
        # overlapping-prefix rule; set_coordinates re-presizes the spans to
        # the warm-start geometry
        emb.set_coordinates(io.read_coordinates(init_csv))
    build_s = time.perf_counter() - t0

    # warm segment: compiles the step + while-loop jits and runs 3 iters.
    # Per-dispatch host->TPU latency is ~60ms through the tunnel, so all
    # timing below uses DEVICE-SIDE loop segments (calculate_embedding with
    # a traced iteration cap), never per-step host walls.
    t0 = time.perf_counter()
    emb.calculate_embedding(max_iterations=3)
    compile_s = time.perf_counter() - t0

    # steady-state segment: device-side windows of up to iters-3 more
    # iterations each.  Adaptive span growth mid-window rebuilds the step
    # closure (a fresh compile) and would poison the wall time, so re-run
    # windows until one completes WITHOUT growth — the persistent compile
    # cache makes post-growth repeats cheap.
    wall = 0.0
    done = 0
    for _ in range(6):
        # growth in a PREVIOUS window can swap the step closure — its
        # recompile cost lands lazily on the FIRST execution after the
        # swap, so always warm a couple of iterations before timing
        emb.calculate_embedding(max_iterations=emb.iteration + 2)
        scale_before = getattr(emb, "_span_scale", 1.0)
        index_before = emb._index
        it0 = emb.iteration
        t0 = time.perf_counter()
        emb.calculate_embedding(max_iterations=it0 + max(iters - 3, 1))
        wall = time.perf_counter() - t0
        done = emb.iteration - it0
        grew = (
            getattr(emb, "_span_scale", 1.0) != scale_before
            or emb._index is not index_before
        )
        if not grew and done > 0:
            break
        if emb.is_finished():
            break
    if done <= 0:
        # converged during warm-up — a throughput number from this would be
        # meaningless
        print(json.dumps({"metric": "edges_per_s_sparse", "graph": path,
                          "error": "no steady-state iterations; rerun with iters >= 5",
                          "iters": done}))
        return
    step_s = wall / done
    eps = m / step_s
    print(
        json.dumps(
            {
                "metric": "edges_per_s_sparse",
                "graph": path,
                "n": g.num_vertices,
                "m": m,
                "dim": dim,
                "iters": done,
                "value": round(eps, 1),
                "unit": "edges/s",
                "step_s": round(step_s, 4),
                "wall_s": round(wall, 3),
                "build_s": round(build_s, 3),
                "compile_s": round(compile_s, 3),
                "overflow": int(emb.state.overflow),
                "rep_count": int(emb.state.num_rep_forces),
                "work_tiles": getattr(emb._index, "w", None),
                "w_pad": getattr(emb._index, "w_pad", None),
                # counted candidates per computed pair lane (VERDICT r3
                # item 5: the tile-size/grouping tuning signal)
                "occupancy": (
                    round(
                        int(emb.state.num_rep_forces)
                        / max(emb._index.w * span_mod._Q * span_mod._ST, 1),
                        5,
                    )
                    if getattr(emb._index, "w", None)
                    else None
                ),
                "span_scale": getattr(emb, "_span_scale", None),
                "att_loss": round(float(emb.state.attract_loss), 1),
                "rep_loss": round(float(emb.state.repel_loss), 1),
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
