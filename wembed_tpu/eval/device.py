"""Device-side evaluation kernels: batched similarity rows + ranking.

TPU re-design of the reference's NodeSampler (reference:
src/evaluationLib/src/metrics/NodeSampler.cpp:5-111, OMP-parallel per-node
O(n) similarity scans + std::sort): here a block of sampled vertices gets
its similarity rows computed on device (one matmul-shaped pass), ranked
with one batched stable sort, and scored with cumulative-sum precision
curves — no per-node host work.  Tie-breaking matches the reference's
(similarity, id) lexicographic order (NodeSampler.cpp:40): stable argsort
over the similarity row IS that order.

Every similarity space from ``spaces.py`` has a jnp row implementation
here; formulas are identical (see spaces.py for the reference file:line of
each).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.forces import _edge_membership
from ..core.state import DeviceGraph
from ..graphs.csr import CSRGraph
from . import spaces as spaces_mod
from .reconstruction import NodeEntry


def _rows_builder(space: spaces_mod.Space):
    """(device_arrays, row_fn) where row_fn(arrays, ids) -> (B, n) jnp
    similarities — a jnp mirror of ``space.rows``."""
    t = type(space)

    def dist_rows(pos, ids, inf=False):
        diff = pos[ids][:, None, :] - pos[None, :, :]
        if inf:
            return jnp.max(jnp.abs(diff), axis=-1)
        return jnp.sqrt(jnp.sum(diff * diff, axis=-1))

    if t is spaces_mod.Euclidean:
        arrays = (jnp.asarray(space.positions),)
        return arrays, lambda a, ids: dist_rows(a[0], ids)
    if t is spaces_mod.InfNorm:
        arrays = (jnp.asarray(space.positions),)
        return arrays, lambda a, ids: dist_rows(a[0], ids, inf=True)
    if t is spaces_mod.DotProduct:
        arrays = (jnp.asarray(space.positions),)
        return arrays, lambda a, ids: -(a[0][ids] @ a[0].T)
    if t is spaces_mod.Cosine:
        arrays = (jnp.asarray(space._unit),)
        return arrays, lambda a, ids: -(a[0][ids] @ a[0].T)
    if t is spaces_mod.WeightedGeometric:
        w = space.weights ** (1.0 / space.dimension)
        arrays = (jnp.asarray(space.positions), jnp.asarray(w))
        return arrays, lambda a, ids: dist_rows(a[0], ids) / (
            a[1][ids][:, None] * a[1][None, :]
        )
    if t is spaces_mod.WeightedGeometricInf:
        w = space.weights ** (1.0 / space.dimension)
        arrays = (jnp.asarray(space.positions), jnp.asarray(w))
        return arrays, lambda a, ids: dist_rows(a[0], ids, inf=True) / (
            a[1][ids][:, None] * a[1][None, :]
        )
    if t is spaces_mod.WeightedNoDim:
        arrays = (jnp.asarray(space.positions), jnp.asarray(space.weights))
        return arrays, lambda a, ids: dist_rows(a[0], ids) / (
            a[1][ids][:, None] * a[1][None, :]
        )
    if t is spaces_mod.Additive:
        w = space.weights ** (1.0 / space.dimension)
        arrays = (jnp.asarray(space.positions), jnp.asarray(w))
        return arrays, lambda a, ids: dist_rows(a[0], ids) / (
            a[1][ids][:, None] + a[1][None, :]
        )
    if t is spaces_mod.Poincare:
        arrays = (jnp.asarray(space.positions), jnp.asarray(space._sqnorm))

        def poincare_rows(a, ids):
            pos, sq = a
            diff = pos[ids][:, None, :] - pos[None, :, :]
            sqdist = jnp.sum(diff * diff, axis=-1)
            x = sqdist / ((1.0 - sq[ids][:, None]) * (1.0 - sq[None, :])) * 2.0 + 1.0
            z = jnp.sqrt(jnp.maximum(x * x - 1.0, 0.0))
            return jnp.log(x + z)

        return arrays, poincare_rows
    if t is spaces_mod.Mercator:
        arrays = (jnp.asarray(space.radii), jnp.asarray(space.angular))
        s1 = space.angular.ndim == 1

        def mercator_rows(a, ids):
            radii, angular = a
            if s1:
                dtheta = jnp.pi - jnp.abs(
                    jnp.pi - jnp.abs(angular[ids][:, None] - angular[None, :])
                )
            else:
                norms = jnp.linalg.norm(angular, axis=-1)
                cosang = (angular[ids] @ angular.T) / (
                    norms[ids][:, None] * norms[None, :]
                )
                dtheta = jnp.arccos(jnp.clip(cosang, -1.0, 1.0))
                dtheta = jnp.where(jnp.abs(cosang - 1.0) < 1e-15, 0.0, dtheta)
            r1 = radii[ids][:, None]
            r2 = radii[None, :]
            x = 0.5 * (
                (1 - jnp.cos(dtheta)) * jnp.cosh(r1 + r2)
                + (1 + jnp.cos(dtheta)) * jnp.cosh(r1 - r2)
            )
            hyper = jnp.arccosh(jnp.maximum(x, 1.0))
            out = jnp.where(dtheta == 0, jnp.abs(r1 - r2), hyper)
            return jnp.where((r1 == r2) & (dtheta == 0), 0.0, out)

        return arrays, mercator_rows
    raise NotImplementedError(f"no device rows for {t.__name__}")


def _make_score_block(arrays, dg: DeviceGraph, row_fn):
    """Jitted (deg_precision (B,), average_precision (B,), deg (B,)) for one
    block of sampled vertices — similarity rows, stable rank, precision
    curves.  Closes over the (device-resident) space arrays and graph."""
    n = dg.n

    @jax.jit
    def score_block(ids: jax.Array):
        sims = row_fn(arrays, ids)  # (B, n)
        B = sims.shape[0]
        # exclude self by ranking it last (reference skips the v==x pair)
        sims = sims.at[jnp.arange(B), ids].set(jnp.inf)
        order = jnp.argsort(sims, axis=1, stable=True)  # (sim, id) lex order
        hits = _edge_membership(dg, ids[:, None], order)  # (B, n) bool
        cums = jnp.cumsum(hits.astype(sims.dtype), axis=1)
        ranks = jnp.arange(1, n + 1, dtype=cums.dtype)
        precisions = cums / ranks
        deg = (dg.row_ptr[ids + 1] - dg.row_ptr[ids]).astype(jnp.int32)
        deg_precision = jnp.where(
            deg >= 1,
            jnp.take_along_axis(
                precisions, jnp.maximum(deg[:, None] - 1, 0), axis=1
            )[:, 0],
            0.0,
        )
        nbr_prec_sum = jnp.sum(jnp.where(hits, precisions, 0.0), axis=1)
        avg_precision = jnp.where(deg >= 1, nbr_prec_sum / jnp.maximum(deg, 1), 0.0)
        return deg_precision, avg_precision, deg

    return score_block


def sample_node_entries_device(
    g: CSRGraph,
    space: spaces_mod.Space,
    num_node_samples: int,
    rng: np.random.Generator | None = None,
    block: int = 128,
    node_ids: np.ndarray | None = None,
):
    """Device-side NodeSampler::sampleHistEntries — returns the same
    ``NodeEntry`` list as the host version (same sampling, same
    tie-breaking), computed in blocks of ``block`` vertices on device.
    ``node_ids`` pins the sample set (see reconstruction.py)."""
    rng = rng or np.random.default_rng()
    n = g.num_vertices
    if node_ids is not None:
        sampled = np.asarray(node_ids, dtype=np.int64)
        num = sampled.shape[0]
    else:
        num = min(num_node_samples, n)
        sampled = rng.permutation(n)[:num]
    arrays, row_fn = _rows_builder(space)
    dg = DeviceGraph.build(g)
    score_block = _make_score_block(arrays, dg, row_fn)

    entries: list[NodeEntry] = []
    for start in range(0, num, block):
        ids = sampled[start : start + block]
        nb = ids.shape[0]
        # pad to the full block so every batch reuses one compilation
        ids_pad = np.concatenate([ids, np.zeros(block - nb, dtype=ids.dtype)])
        dp, ap, deg = score_block(jnp.asarray(ids_pad, jnp.int32))
        dp, ap, deg = np.asarray(dp), np.asarray(ap), np.asarray(deg)
        for i, v in enumerate(ids):
            entries.append(NodeEntry(int(v), int(deg[i]), float(dp[i]), float(ap[i])))
    return entries
