"""Size-capped weighted label-propagation coarsening.

Re-implementation of the reference's LabelPropagation
(reference: src/embeddingLib/src/partition/LabelPropagation.cpp:13-239) with
identical sequential semantics: per sweep, each node (in ascending-degree or
random order) moves to the neighbor cluster with the largest summed edge
weight, subject to the cluster-size cap; when a level shrinks by less than
2x, an aggressive pass merges single-child nodes into their heaviest-edge
neighbor and pairs degree-0 nodes, guaranteeing logarithmic hierarchy
height.

The sweeps are inherently order-dependent and sequential, so the hot loop
runs in the native C++ extension (wembed_tpu/_native/labelprop.cpp); a
pure-Python replica backs it for environments without a compiler and for
differential testing.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .. import _native
from ..core.options import PartitionerOptions
from ..graphs import algorithms
from ..graphs.csr import CSRGraph
from ..utils import rng as rng_mod


@dataclass
class CoarseningResult:
    """Parent-pointer tree: per layer, node -> cluster id in the next layer
    (the reference's ParentPointerTree, Partitioner.hpp:18).  Following the
    reference, the last two entries are the all-into-one mapping and the
    terminal {-1} (LabelPropagation.cpp:47-55)."""

    parent_pointers: list[np.ndarray]
    graphs: list[CSRGraph] = field(default_factory=list)
    edge_weights: list[np.ndarray] = field(default_factory=list)


def label_propagation_order(g: CSRGraph, order_type: int, rng: np.random.Generator) -> np.ndarray:
    """Visit order (LabelPropagation.cpp:181-200): 0 = ascending degree
    (stable), 1 = random permutation."""
    if order_type == 0:
        return np.argsort(g.degrees, kind="stable").astype(np.int32)
    if order_type == 1:
        return rng.permutation(g.num_vertices).astype(np.int32)
    raise ValueError(f"unknown order type {order_type}")


def _label_propagation_python(
    g: CSRGraph, ew: np.ndarray, order: np.ndarray, num_iterations: int, max_cluster_size: int
) -> np.ndarray:
    n = g.num_vertices
    row_ptr, col = g.row_ptr, g.col_idx
    cluster = np.arange(n, dtype=np.int32)
    edge_sum = np.zeros(n)
    cluster_size = np.zeros(n, dtype=np.int64)
    for _ in range(num_iterations):
        for v in order:
            begin, end = row_ptr[v], row_ptr[v + 1]
            nbr_clusters = cluster[col[begin:end]]
            for c, w in zip(nbr_clusters, ew[begin:end]):
                edge_sum[c] += w
            original = cluster[v]
            largest = original
            max_weight = 0.0
            for c in nbr_clusters:
                if edge_sum[c] > max_weight and (
                    cluster_size[c] + 1 <= max_cluster_size or c == original
                ):
                    max_weight = edge_sum[c]
                    largest = c
                edge_sum[c] = 0.0
            cluster_size[largest] += 1
            cluster_size[original] -= 1
            cluster[v] = largest
    return cluster


def _aggressive_python(
    g: CSRGraph, ew: np.ndarray, prev_parents: np.ndarray
) -> np.ndarray:
    n = g.num_vertices
    row_ptr, col = g.row_ptr, g.col_idx
    num_children = np.bincount(prev_parents, minlength=n)
    cluster = -np.ones(n, dtype=np.int32)
    edge_sum = np.zeros(n)
    degree_zero = []
    for v in range(n):
        if num_children[v] > 1:
            cluster[v] = v
            continue
        begin, end = row_ptr[v], row_ptr[v + 1]
        if end > begin:
            targets = col[begin:end]
            for t, w in zip(targets, ew[begin:end]):
                edge_sum[t] += w
            largest, max_weight = -1, -1.0
            for t in targets:
                if edge_sum[t] > max_weight:
                    max_weight = edge_sum[t]
                    largest = t
                edge_sum[t] = 0.0
            cluster[v] = largest
        else:
            degree_zero.append(v)
    for i, v in enumerate(degree_zero):
        cluster[v] = degree_zero[i - 1] if i % 2 == 1 else v
    return cluster


def _run_label_propagation(
    g: CSRGraph, ew: np.ndarray, order: np.ndarray, opts: PartitionerOptions
) -> np.ndarray:
    lib = _native.get_lib()
    if lib is None:
        return _label_propagation_python(
            g, ew, order, opts.max_iterations, opts.max_cluster_size
        )
    import ctypes

    n = g.num_vertices
    out = np.empty(n, dtype=np.int32)
    row_ptr = np.ascontiguousarray(g.row_ptr, dtype=np.int64)
    col = np.ascontiguousarray(g.col_idx, dtype=np.int32)
    eww = np.ascontiguousarray(ew, dtype=np.float64)
    orderc = np.ascontiguousarray(order, dtype=np.int32)
    lib.wembed_label_propagation(
        n,
        row_ptr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        col.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        eww.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        orderc.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        opts.max_iterations,
        opts.max_cluster_size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out


def _run_aggressive(g: CSRGraph, ew: np.ndarray, prev_parents: np.ndarray) -> np.ndarray:
    lib = _native.get_lib()
    if lib is None:
        return _aggressive_python(g, ew, prev_parents)
    import ctypes

    n = g.num_vertices
    out = np.empty(n, dtype=np.int32)
    row_ptr = np.ascontiguousarray(g.row_ptr, dtype=np.int64)
    col = np.ascontiguousarray(g.col_idx, dtype=np.int32)
    eww = np.ascontiguousarray(ew, dtype=np.float64)
    prev = np.ascontiguousarray(prev_parents, dtype=np.int32)
    lib.wembed_aggressive_propagation(
        n,
        row_ptr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        col.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        eww.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        prev.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        prev.shape[0],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out


def compact_cluster_ids(cluster: np.ndarray) -> np.ndarray:
    """Renumber clusters to 0..k-1 in order of first appearance
    (LabelPropagation.cpp:203-221)."""
    n = cluster.shape[0]
    id_map = -np.ones(int(cluster.max(initial=0)) + 1, dtype=np.int64)
    compacted = np.empty(n, dtype=np.int64)
    next_id = 0
    for v in range(n):
        c = cluster[v]
        if id_map[c] == -1:
            id_map[c] = next_id
            next_id += 1
        compacted[v] = id_map[c]
    return compacted


def _compact_vectorized(cluster: np.ndarray) -> np.ndarray:
    """Same contract as compact_cluster_ids, vectorized: first-appearance
    order == order of min vertex index per cluster? No — first appearance in
    vertex order; implemented with unique + argsort of first indices."""
    _, first_idx, inverse = np.unique(cluster, return_index=True, return_inverse=True)
    order = np.argsort(np.argsort(first_idx))
    return order[inverse]


def calculate_new_edge_weights(old_weights: np.ndarray, edge_map: np.ndarray) -> np.ndarray:
    """Aggregate fine edge weights onto coarse edges
    (LabelPropagation.cpp:223-239)."""
    keep = edge_map >= 0
    num_new = int(edge_map.max()) + 1 if keep.any() else 0
    out = np.zeros(num_new)
    np.add.at(out, edge_map[keep], old_weights[keep])
    return out


def coarsen_all_layers(
    g: CSRGraph,
    edge_weights: np.ndarray | None = None,
    opts: PartitionerOptions | None = None,
    rng: np.random.Generator | None = None,
) -> CoarseningResult:
    """The reference's coarsenAllLayers loop (LabelPropagation.cpp:13-56)."""
    opts = opts or PartitionerOptions()
    rng = rng or rng_mod.host_rng()
    if edge_weights is None:
        edge_weights = np.ones(g.num_directed_edges)

    parent_pointers: list[np.ndarray] = []
    graphs = [g]
    weights_per_layer = [np.asarray(edge_weights, dtype=np.float64)]
    shrink = 0.0  # always do a normal propagation first

    while graphs[-1].num_vertices > opts.final_graph_size and graphs[-1].num_edges > 0:
        current = graphs[-1]
        ew = weights_per_layer[-1]
        if shrink < 0.5:
            order = label_propagation_order(current, opts.order_type, rng)
            raw = _run_label_propagation(current, ew, order, opts)
        else:
            raw = _run_aggressive(current, ew, parent_pointers[-1])
        mapping = _compact_vectorized(raw)
        coarse, edge_map = algorithms.coarsen_graph(current, mapping)
        parent_pointers.append(mapping.astype(np.int64))
        graphs.append(coarse)
        weights_per_layer.append(calculate_new_edge_weights(ew, edge_map))
        shrink = coarse.num_vertices / current.num_vertices

    # terminal mappings (LabelPropagation.cpp:47-55)
    parent_pointers.append(np.zeros(graphs[-1].num_vertices, dtype=np.int64))
    parent_pointers.append(np.asarray([-1], dtype=np.int64))
    return CoarseningResult(parent_pointers, graphs, weights_per_layer)
