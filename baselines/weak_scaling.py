#!/usr/bin/env python
"""Weak-scaling protocol for the distributed backends (BASELINE.md row 5).

Measures steady-state edges/s of the sharded embedding step at increasing
device counts with the PROBLEM SIZE PER DEVICE held constant (weak
scaling): at P devices the graph has P * base_n vertices.  Efficiency at
P is (edges/s at P) / (P * edges/s at 1).

Usage:
  # single-host (ICI or virtual CPU mesh):
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python baselines/weak_scaling.py --backend halo --base-n 20000

  # multi-host (per host; DCN between hosts):
  WEMBED_COORDINATOR=host0:1234 WEMBED_NUM_PROCESSES=2 WEMBED_PROCESS_ID=<i> \
      python baselines/weak_scaling.py --multihost --backend halo

The target (BASELINE.json north star) is >= 80% weak-scaling efficiency
1 -> N hosts on a 100M-edge graph; this script is the measurement
harness — it runs on whatever mesh is available (virtual CPU devices for
logic validation, a real pod for the record)."""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def bench_config(backend: str, num_devices: int, n: int, dim: int, iters: int,
                 avg_deg: float, seed: int) -> dict:
    import numpy as np

    from wembed_tpu.core import EmbedderOptions
    from wembed_tpu.distributed.mesh import make_mesh
    from wembed_tpu.graphs import generators
    from wembed_tpu.utils import set_seed

    set_seed(seed)
    g, _, _ = generators.girg(
        n, dim=2, avg_degree=avg_deg, ple=2.5, rng=np.random.default_rng(seed)
    )
    opts = EmbedderOptions(
        embedding_dimension=dim, max_iterations=iters + 5,
        position_min_change=0.0,
    )
    mesh = make_mesh(num_devices)
    if backend == "halo":
        from wembed_tpu.distributed.halo import HaloEmbedder

        emb = HaloEmbedder(g, opts, mesh=mesh, verbose=False)
    else:
        from wembed_tpu.distributed.step import MultiChipEmbedder

        emb = MultiChipEmbedder(g, opts, mesh=mesh, verbose=False)

    # warm: compile + 5 iters
    emb.calculate_embedding(max_iterations=5)
    t0 = time.perf_counter()
    emb.calculate_embedding(max_iterations=5 + iters)
    wall = time.perf_counter() - t0
    done = emb.iteration - 5
    eps = g.num_edges * done / wall if done else 0.0
    return {
        "devices": num_devices,
        "n": g.num_vertices,
        "m": g.num_edges,
        "iters": done,
        "wall_s": round(wall, 3),
        "edges_per_s": round(eps, 1),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--backend", choices=["replicated", "halo"], default="halo")
    ap.add_argument("--base-n", type=int, default=20000,
                    help="vertices per device (weak scaling)")
    ap.add_argument("--dim", type=int, default=2)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--avg-deg", type=float, default=15.0)
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--devices", type=str, default="",
                    help="comma list of device counts (default 1,2,4,...,all)")
    ap.add_argument("--multihost", action="store_true")
    ap.add_argument("--platform", default="",
                    help="force a jax platform (e.g. 'cpu' with "
                    "XLA_FLAGS=--xla_force_host_platform_device_count=8 for "
                    "logic validation; overrides sitecustomize pinning)")
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    if args.multihost:
        from wembed_tpu.distributed.mesh import init_distributed

        init_distributed()
    import jax

    total = len(jax.devices())
    if args.devices:
        counts = [int(x) for x in args.devices.split(",")]
    else:
        counts = []
        p = 1
        while p <= total:
            counts.append(p)
            p *= 2
        if counts[-1] != total:
            counts.append(total)

    rows = []
    for p in counts:
        row = bench_config(
            args.backend, p, args.base_n * p, args.dim, args.iters,
            args.avg_deg, args.seed,
        )
        rows.append(row)
        base = rows[0]["edges_per_s"] or 1.0
        row["efficiency"] = round(row["edges_per_s"] / (p * base), 3)
        print(json.dumps(row), flush=True)

    print(json.dumps({
        "metric": "weak_scaling",
        "backend": args.backend,
        "base_n": args.base_n,
        "dim": args.dim,
        "rows": rows,
        "efficiency_at_max": rows[-1]["efficiency"] if rows else None,
    }))


if __name__ == "__main__":
    main()
