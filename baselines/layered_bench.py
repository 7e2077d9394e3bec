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

    g = io.read_edge_list(path)
    opts = EmbedderOptions(embedding_dimension=dim)

    def one_run(seed):
        """(build_s, total_s, iters, num_layers, per-layer records)."""
        set_seed(seed)
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
                    "n": emb.hierarchy.layers[
                        emb.current_layer
                    ].graph.num_vertices,
                    "iters": emb._current.iteration,
                    "wall_s": round(time.perf_counter() - t_layer, 3),
                }
            )
            emb.current_iteration += emb._current.iteration
            if emb.current_layer == 0:
                break
            emb._expand_positions()
        return build_s, time.perf_counter() - t_start, emb.current_iteration, emb.hierarchy.num_layers, layers

    # run 1: cold (includes every per-layer compile / cache load);
    # run 2: steady (compiles amortized) — the honest recurring cost
    # (VERDICT r3 item 9: report both, labeled)
    build_s, total_cold, iters_cold, num_layers, layers_cold = one_run(1)
    _, total_steady, iters_steady, _, layers_steady = one_run(2)
    print(
        json.dumps(
            {
                "metric": "layered_embedding",
                "graph": path,
                "n": g.num_vertices,
                "m": g.num_edges,
                "dim": dim,
                "build_s": round(build_s, 3),
                "total_wall_cold_s": round(total_cold, 3),
                "total_iters_cold": iters_cold,
                "total_wall_steady_s": round(total_steady, 3),
                "total_iters_steady": iters_steady,
                "num_layers": num_layers,
                "layers_cold": layers_cold,
                "layers_steady": layers_steady,
                "edges_per_s_steady": round(
                    g.num_edges * iters_steady / total_steady, 1
                ),
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
