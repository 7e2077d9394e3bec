#!/usr/bin/env python
"""Layered (multilevel) embedder benchmark — VERDICT r2 item 8.

Runs the layered embedder on a large graph, recording per-layer vertex
counts, iterations, and wallclock, plus total wall vs the flat embedder
on the same graph.  The multilevel path is the reference's scaling story
(LayeredEmbedder.cpp:46-94): coarse layers converge on tiny graphs, so
the expensive fine-layer iterations start from a good geometry.

Usage: python baselines/layered_bench.py <graph.edg> [dim]
Prints one JSON line; commit the result into baselines/tpu_measured.json.
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    import jax

    from wembed_tpu.core import EmbedderOptions
    from wembed_tpu.graphs import io
    from wembed_tpu.multilevel.layered import LayeredEmbedder
    from wembed_tpu.utils import set_seed

    path = sys.argv[1]
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    set_seed(1)
    g = io.read_edge_list(path)
    opts = EmbedderOptions(embedding_dimension=dim)

    t0 = time.perf_counter()
    emb = LayeredEmbedder(g, opts, verbose=False)
    build_s = time.perf_counter() - t0

    # mirror LayeredEmbedder.calculate_embedding (each layer runs its
    # device-side while-loop) with a per-layer wall clock around it
    layers = []
    t_start = time.perf_counter()
    while True:
        t_layer = time.perf_counter()
        emb._current.calculate_embedding()
        layers.append(
            {
                "layer": emb.current_layer,
                "n": emb.hierarchy.layers[emb.current_layer].graph.num_vertices,
                "iters": emb._current.iteration,
                "wall_s": round(time.perf_counter() - t_layer, 3),
            }
        )
        emb.current_iteration += emb._current.iteration
        if emb.current_layer == 0:
            break
        emb._expand_positions()
    total = time.perf_counter() - t_start
    print(
        json.dumps(
            {
                "metric": "layered_embedding",
                "graph": path,
                "n": g.num_vertices,
                "m": g.num_edges,
                "dim": dim,
                "build_s": round(build_s, 3),
                "total_wall_s": round(total, 3),
                "total_iters": emb.current_iteration,
                "num_layers": emb.hierarchy.num_layers,
                "layers": layers,
                "edges_per_s_total": round(
                    g.num_edges * emb.current_iteration / total, 1
                ),
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
