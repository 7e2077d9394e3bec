#!/usr/bin/env python
"""True reference-binary parity: replay the C++ reference's run (VERDICT #5).

Protocol (SURVEY M1 parity gate):
  1. Build the reference offline (`baselines/refbuild/build.sh`) and run
     `ref_driver <graph> <prefix> <dim> <seed> <steps>` — it dumps its random
     init coordinates+weights and per-step coordinate snapshots.
  2. This script feeds the SAME init into WEmbedEmbedder (float64, CPU,
     unfused jnp path — the deterministic semantics reference), steps in
     lockstep, and reports per-step max |Δcoord|.
  3. Both finals are scored with our evaluator (MAP / edge-F1) for a
     quality-parity verdict that survives f64 trajectory divergence.

Usage: python baselines/parity_run.py <graph.edg> <ref_prefix> [steps]
Prints one JSON line.
"""
from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import numpy as np

    from wembed_tpu.core import EmbedderOptions, WEmbedEmbedder
    from wembed_tpu.eval.reconstruction import reconstruction_metrics
    from wembed_tpu.eval.edge_detection import edge_detection_metrics
    from wembed_tpu.eval.spaces import WeightedGeometric
    from wembed_tpu.graphs import io

    graph_path = sys.argv[1]
    prefix = sys.argv[2]
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 25

    g = io.read_edge_list(graph_path)
    init_coords, init_weights = io.split_last_column(
        io.read_coordinates(prefix + "_init.csv")
    )
    dim = init_coords.shape[1]

    from wembed_tpu.core import RepulsionMode

    # bucket mode: same EXACT active force set as the reference's SNN
    # radius index (overflow 0 == no truncation), at candidate cost instead
    # of the dense path's O(n^2) — f64 CPU lockstep is feasible this way
    opts = EmbedderOptions(
        embedding_dimension=dim,
        dtype="float64",
        fused_dense="off",
        fused_span="off",
        repulsion_mode=RepulsionMode.BUCKET,
    )
    emb = WEmbedEmbedder(
        g,
        opts,
        initial_coordinates=init_coords,
        initial_weights=init_weights,
        verbose=False,
    )

    # pre-size the candidate spans so the lockstep starts untruncated
    # (the reference's exact radius index never truncates): probe a step,
    # read the overflow counter, double the spans, restore the state
    state0 = emb.state
    for _ in range(12):
        emb.calculate_step()
        overflow = int(emb.state.overflow)
        emb.state = state0
        if overflow == 0 or not emb._grow_spans():
            break

    # Per-coordinate lockstep vs an independently compiled binary is
    # meaningless under Adam: the first update is sign(force)*lr per
    # coordinate, so a force coordinate near 0 flips the full +-lr on
    # rounding differences.  Compare the SMOOTH per-step loss sums
    # instead, plus final quality.
    ref_losses = []
    loss_path = Path(prefix + "_steploss.jsonl")
    if loss_path.exists():
        ref_losses = [json.loads(l) for l in loss_path.read_text().splitlines()]

    step_diffs = []
    loss_rel = []
    for k in range(1, steps + 1):
        emb.calculate_step()
        ref_k, _ = io.split_last_column(
            io.read_coordinates(f"{prefix}_step{k}.csv")
        )
        diff = float(np.max(np.abs(emb.get_coordinates() - ref_k)))
        step_diffs.append(diff)
        if k <= len(ref_losses):
            ra, rr = ref_losses[k - 1]["att"], ref_losses[k - 1]["rep"]
            oa = float(emb.state.attract_loss)
            orr = float(emb.state.repel_loss)
            loss_rel.append(
                max(abs(oa - ra) / max(abs(ra), 1e-30),
                    abs(orr - rr) / max(abs(rr), 1e-30))
            )

    emb.calculate_embedding()
    ours_final = emb.get_coordinates()
    ref_final, _ = io.split_last_column(io.read_coordinates(prefix + "_final.csv"))

    rng = np.random.default_rng(7)

    def quality(coords):
        space = WeightedGeometric(coords, weights=np.asarray(emb.get_weights()))
        rec = reconstruction_metrics(
            g, space, num_node_samples=2000, rng=np.random.default_rng(7)
        )
        edge = edge_detection_metrics(
            g, space, rng=np.random.default_rng(11)
        )
        return {"map": round(rec["MAP"], 4), "edge_f1": round(edge["edgeF1"], 4)}

    out = {
        "metric": "reference_parity",
        "graph": graph_path,
        "n": g.num_vertices,
        "m": g.num_edges,
        "dim": dim,
        "lockstep_steps": steps,
        "max_loss_rel_diff_by_step": [float(f"{d:.3e}") for d in loss_rel],
        "max_coord_diff_by_step": [float(f"{d:.3e}") for d in step_diffs],
        "iters_ours": emb.iteration,
        "att_loss_ours": round(float(emb.state.attract_loss), 1),
        "rep_loss_ours": round(float(emb.state.repel_loss), 1),
        "quality_ours": quality(ours_final),
        "quality_ref": quality(ref_final),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
