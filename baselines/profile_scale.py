#!/usr/bin/env python
"""Per-phase TPU profile of the sparse span step at scale (VERDICT r3
items 1/5).

Usage: python baselines/profile_scale.py <graph.edg> [dim] [warm_iters] [reps]

Warms the embedder into a representative mid-run state with the
device-side loop, then times each phase as its OWN jitted program,
dispatched ``reps`` times back-to-back with one final block_until_ready —
the axon tunnel's ~10-60ms dispatch latency pipelines across the queued
calls, so the wall/reps quotient reflects device time (per-step host
walls through the tunnel lie; see tpu-tunnel-discipline).

Phases:
  step        — the full production step (one fused jit)
  structures  — build_span_structures (projection, sort, gathers, windows)
  axis_sort   — its projection + lexsort prefix (isolated)
  sweep       — the pallas span kernel given fixed structures
  accum       — sweep + unsort/reduce epilogue (_kernel_accumulate)
  forces      — span_fused_forces (structures + sweep + merged edge pass)

Derived: gathers+windows = structures - axis_sort; edge pass =
forces - structures - accum; optimizer+rest = step - forces.

Also reports sweep occupancy = counted candidates / (W * Q * ST)
(the fraction of computed pair lanes that hit a true candidate).
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from wembed_tpu.core import EmbedderOptions, WEmbedEmbedder
    from wembed_tpu.graphs import io
    from wembed_tpu.kernels import span_sparse as span
    from wembed_tpu.utils import set_seed

    path = sys.argv[1]
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    warm = int(sys.argv[3]) if len(sys.argv) > 3 else 30
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 10

    set_seed(1)
    g = io.read_edge_list(path)
    opts = EmbedderOptions(embedding_dimension=dim, max_iterations=1000)
    emb = WEmbedEmbedder(g, opts, verbose=False)
    emb.calculate_embedding(max_iterations=warm)
    assert isinstance(emb._index, span.SpanIndex), "span path required"
    idx, tables = emb._index, emb._tables
    dg = emb._dg
    state = emb.state
    pos = state.positions
    invw, weights = emb._inv_w, emb._weights
    key = jax.random.split(state.key, 4)[1]

    def timeit(fn, *args) -> float:
        out = fn(*args)
        jax.block_until_ready(out)  # compile + first run
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / reps

    @jax.jit
    def structures_fn(p):
        return span.build_span_structures(
            p, invw, weights, dg.colors, idx, opts, tables=tables
        )

    @jax.jit
    def axis_sort_fn(p):
        # the projection + two-level sort prefix of build_span_structures
        # (span_sparse.py build_span_structures head), isolated
        from wembed_tpu.core.candidates import _principal_axes2

        p = p.astype(jnp.float32)
        centered = p - jnp.mean(p, axis=0)
        v1, v2 = _principal_axes2(centered)
        y = centered @ v1
        x = (centered @ v2) if dim >= 2 else y
        order1 = jnp.lexsort((y, jnp.asarray(idx.group_of)))
        x_s1 = x[order1]
        return order1[jnp.lexsort((x_s1, jnp.asarray(idx.row_of_sorted)))]

    @jax.jit
    def sweep_fn(structures):
        return span.span_query(structures, idx, opts, tables=tables)

    @jax.jit
    def accum_fn(structures):
        return span._kernel_accumulate(structures, idx, opts, tables, False)

    @jax.jit
    def forces_fn(p, k):
        return span.span_fused_forces(
            p, invw, weights, dg.colors, idx, opts, k, tables=tables
        )

    def step_fn(s):
        return emb._jitted_step(s, weights, invw, tables)

    structures = jax.block_until_ready(structures_fn(pos))

    t = {
        "step": timeit(step_fn, state),
        "structures": timeit(structures_fn, pos),
        "axis_sort": timeit(axis_sort_fn, pos),
        "sweep": timeit(sweep_fn, structures),
        "accum": timeit(accum_fn, structures),
        "forces": timeit(forces_fn, pos, key),
    }
    work_lanes = idx.w * span._Q * span._ST
    rep_count = int(state.num_rep_forces)
    result = {
        "metric": "span_phase_profile",
        "graph": path,
        "n": g.num_vertices,
        "m": g.num_edges,
        "dim": dim,
        "warm_iters": int(state.iteration),
        "reps": reps,
        "phases_s": {k: round(v, 4) for k, v in t.items()},
        "derived_s": {
            "gathers_windows": round(t["structures"] - t["axis_sort"], 4),
            "unsort_epilogue": round(t["accum"] - t["sweep"], 4),
            "edge_pass": round(t["forces"] - t["structures"] - t["accum"], 4),
            "optimizer_rest": round(t["step"] - t["forces"], 4),
        },
        "work_tiles": idx.w,
        "w_pad": idx.w_pad,
        "rep_count": rep_count,
        "occupancy": round(rep_count / work_lanes, 5),
        "overflow": int(state.overflow),
        "us_per_tile": round(t["sweep"] / max(idx.w, 1) * 1e6, 3),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
