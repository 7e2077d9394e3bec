"""Stable public API, mirroring the reference's C++/pybind11 surface.

Names and semantics follow ``include/wembed.h`` (reference
include/wembed.h:50-168) and the python bindings
(reference python/bindings.cpp:11-100) 1:1, so a user of the reference's
``wembed`` python module can switch imports and keep their code:

    import wembed_tpu.api as wembed
    g = wembed.graphFromEdgeListFile("graph.edg")
    opts = wembed.Options(); opts.embeddingDimension = 2
    emb = wembed.createEmbedder(g, opts)
    emb.calculateEmbedding()
    coords = emb.getCoordinates()
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Sequence

import numpy as np

from .core.embedder import Loss, WEmbedEmbedder
from .core.options import EmbedderOptions, WeightType
from .graphs import csr, io
from .multilevel.layered import LayeredEmbedder
from .utils import rng as rng_mod
from .utils.timer import TimingResult, timings_to_string


NodeId = int
EdgeId = int

# SpatialIndex enum values (include/wembed.h:24-27).  Both map onto the
# TPU bucket index; kept for signature compatibility.
IndexSNN = 1
IndexSprk = 2


@dataclass
class Edge:
    """(include/wembed.h:30-33)"""

    src: int
    dst: int

    def __repr__(self) -> str:
        return f"Edge({self.src}, {self.dst})"


@dataclass
class Options:
    """Public, curated subset of the embedder options with the reference's
    defaults (include/wembed.h:50-70)."""

    embeddingDimension: int = 4
    useUnitWeights: bool = False
    dimensionHint: float = -1.0
    layeredEmbedding: bool = False
    # layered child placement: "sphere" (default; fixes the reference's
    # sibling-radius-0 expansion, measured 2x its reconstruction MAP) or
    # "reference" for bug-for-bug parity (no reference counterpart knob:
    # the reference hardcodes the buggy behavior)
    expansionMode: str = "sphere"

    indexType: int = IndexSprk
    attractionScale: float = 1.0
    repulsionScale: float = 1.0
    centreScale: float = 0.0
    edgeLength: float = 1.0
    expansionStretch: float = 1.0

    coolingFactor: float = 0.99
    learningRate: float = 10.0
    maxIterations: int = 1000
    positionMinChange: float = 1e-4

    # TPU-native extensions (the reference is single-process OpenMP only,
    # SURVEY.md §2.13): multi-device execution over a jax.sharding.Mesh.
    #   "none"       — single device (default)
    #   "replicated" — replicated state, work-partitioned forces, one psum
    #                  per step (distributed/step.py MultiChipEmbedder)
    #   "halo"       — vertex-sharded state + halo exchange, O(n/P) memory
    #                  per device (distributed/halo.py HaloEmbedder)
    distributedMode: str = "none"
    numDevices: int = -1  # -1: all visible devices
    multiHost: bool = False  # call jax.distributed.initialize first
    # layered x distributed composition: hierarchy layers with fewer
    # vertices than this run single-device (coarse layers are tiny — the
    # per-step collective latency would dominate); larger layers use the
    # selected distributed backend
    distributedMinLayerSize: int = 4096


def _translate_options(options: Options) -> EmbedderOptions:
    """Option translation (reference src/wembed.cpp:162-177)."""
    return EmbedderOptions(
        embedding_dimension=options.embeddingDimension,
        weight_type=WeightType.UNIT if options.useUnitWeights else WeightType.DEGREE,
        dimension_hint=options.dimensionHint,
        attraction_scale=options.attractionScale,
        repulsion_scale=options.repulsionScale,
        centre_scale=options.centreScale,
        edge_length=options.edgeLength,
        expansion_stretch=options.expansionStretch,
        cooling_factor=options.coolingFactor,
        learning_rate=options.learningRate,
        max_iterations=options.maxIterations,
        position_min_change=options.positionMinChange,
    )


class Graph:
    """Pimpl-style wrapper over the CSR arrays (include/wembed.h:72-103)."""

    def __init__(self, graph: csr.CSRGraph):
        self._graph = graph

    # global information
    def getNumVertices(self) -> int:
        return self._graph.num_vertices

    def getNumEdges(self) -> int:
        return self._graph.num_edges

    # neighborhood information
    def getEdges(self, v: int) -> List[int]:
        return list(
            range(int(self._graph.row_ptr[v]), int(self._graph.row_ptr[v + 1]))
        )

    def getNeighbors(self, v: int) -> List[int]:
        return self._graph.neighbors(v).tolist()

    def getNumNeighbors(self, v: int) -> int:
        return self._graph.num_neighbors(v)

    def getEdgeTarget(self, e: int) -> int:
        return int(self._graph.col_idx[e])

    def areNeighbors(self, v: int, u: int) -> bool:
        return self._graph.are_neighbors(v, u)

    def getEdgeList(self) -> List[Edge]:
        """Each undirected edge exactly once with src < dst
        (include/wembed.h:95-97)."""
        return [Edge(int(a), int(b)) for a, b in self._graph.edge_list()]

    def toString(self) -> str:
        return repr(self._graph)

    __repr__ = toString

    @property
    def csr(self) -> csr.CSRGraph:
        """The underlying array representation (TPU-native extension)."""
        return self._graph


class Embedder:
    """(include/wembed.h:105-145)"""

    def __init__(self, impl: WEmbedEmbedder | LayeredEmbedder):
        self._embedder = impl

    # embedding calculation
    def calculateStep(self) -> None:
        self._embedder.calculate_step()

    def isFinished(self) -> bool:
        return self._embedder.is_finished()

    def calculateEmbedding(self) -> None:
        self._embedder.calculate_embedding()

    # size accessors — reflect the CURRENT graph (changes across layers for
    # the layered embedder, include/wembed.h:118-121)
    def getNumVertices(self) -> int:
        return self._embedder.num_vertices

    def getEmbeddingDimension(self) -> int:
        return self._embedder.embedding_dimension

    def copyCoordinatesTo(self, out: np.ndarray) -> None:
        """Flat row-major copy (include/wembed.h:123-125)."""
        np.copyto(
            out.reshape(self.getNumVertices(), self.getEmbeddingDimension()),
            self._embedder.get_coordinates(),
        )

    def getCurrentGraph(self) -> Graph:
        if isinstance(self._embedder, LayeredEmbedder):
            return Graph(self._embedder.get_current_graph())
        return Graph(self._embedder.graph)

    def getCoordinates(self) -> List[List[float]]:
        return self._embedder.get_coordinates().tolist()

    def getWeights(self) -> List[float]:
        return self._embedder.get_weights().tolist()

    def setCoordinates(self, coordinates: Sequence[Sequence[float]]) -> None:
        self._embedder.set_coordinates(np.asarray(coordinates, dtype=np.float64))

    def setWeights(self, weights: Sequence[float]) -> None:
        self._embedder.set_weights(np.asarray(weights, dtype=np.float64))

    def getTimings(self) -> List[TimingResult]:
        return self._embedder.get_timings()

    def getLoss(self) -> Loss:
        return self._embedder.get_loss()

    def writeCoordinates(self, filePath: str, writeWeights: bool = True) -> None:
        io.write_coordinates(
            filePath,
            self._embedder.get_coordinates(),
            self._embedder.get_weights() if writeWeights else None,
        )

    @property
    def impl(self) -> WEmbedEmbedder | LayeredEmbedder:
        """The underlying embedder (TPU-native extension)."""
        return self._embedder


def createEmbedder(graph: Graph, options: Options) -> Embedder:
    """(reference src/wembed.cpp:162-188; distributed modes are TPU-native
    extensions selecting the sharded backends)"""
    opts = _translate_options(options)
    if options.distributedMode not in ("none", "replicated", "halo"):
        raise ValueError(
            f"unknown distributedMode {options.distributedMode!r} "
            "(expected 'none', 'replicated', or 'halo')"
        )
    if options.distributedMode != "none":
        from .distributed.mesh import init_distributed, make_mesh

        if options.multiHost:
            init_distributed()
        mesh = make_mesh(
            None if options.numDevices < 0 else options.numDevices
        )
        if options.distributedMode == "halo":
            from .distributed.halo import HaloEmbedder as DistEmbedder
        else:
            from .distributed.step import MultiChipEmbedder as DistEmbedder

        if options.layeredEmbedding:
            factory = _distributed_layer_factory(
                DistEmbedder, mesh, options.distributedMinLayerSize
            )
            return Embedder(
                LayeredEmbedder(
                    graph.csr, opts, verbose=False, embedder_factory=factory,
                    expansion_mode=_expansion_mode(options),
                )
            )
        return Embedder(DistEmbedder(graph.csr, opts, mesh=mesh, verbose=False))
    if options.layeredEmbedding:
        return Embedder(
            LayeredEmbedder(
                graph.csr, opts, verbose=False,
                expansion_mode=_expansion_mode(options),
            )
        )
    return Embedder(WEmbedEmbedder(graph.csr, opts, verbose=False))


def _expansion_mode(options: Options):
    from .multilevel.hierarchy import ExpansionMode

    return (
        ExpansionMode.REFERENCE
        if options.expansionMode == "reference"
        else ExpansionMode.SIBLING_SPHERE
    )


def _distributed_layer_factory(dist_cls, mesh, min_layer_size: int):
    """Per-layer embedder factory for layered x distributed runs
    (reference composability: src/wembed.cpp:180-187 builds its multilevel
    mode over the same embedder machinery as the flat path).  Hierarchy
    layers below ``min_layer_size`` vertices run single-device — at
    coarse-layer sizes the per-step collective latency dominates any
    compute win."""

    def factory(
        layer_graph,
        opts,
        *,
        timer=None,
        initial_coordinates=None,
        initial_weights=None,
        verbose=True,
        profile=False,
    ):
        if layer_graph.num_vertices < max(min_layer_size, 2 * mesh.devices.size):
            return WEmbedEmbedder(
                layer_graph,
                opts,
                timer=timer,
                initial_coordinates=initial_coordinates,
                initial_weights=initial_weights,
                verbose=verbose,
                profile=profile,
            )
        # the distributed drivers have no profiled (phase-split) mode —
        # profile requests fall back to their normal step
        return dist_cls(
            layer_graph,
            opts,
            mesh=mesh,
            timer=timer,
            initial_coordinates=initial_coordinates,
            initial_weights=initial_weights,
            verbose=verbose,
        )

    return factory


def graphFromEdges(edges: Sequence[Edge] | np.ndarray) -> Graph:
    """Each undirected edge should appear exactly once; vertex ids must be
    consecutive starting at 0 (include/wembed.h:149-151)."""
    if len(edges) and isinstance(edges[0], Edge):
        arr = np.asarray([[e.src, e.dst] for e in edges], dtype=np.int64)
    else:
        arr = np.asarray(edges, dtype=np.int64)
    return Graph(csr.from_edges(arr))


def graphFromEdgeListFile(
    filePath: str, comment: str = "#", delimiter: str = " "
) -> Graph:
    delim = None if delimiter in (" ", "\t") else delimiter
    return Graph(io.read_edge_list(filePath, comment, delim))


def graph_from_networkx(nx_graph) -> Graph:
    """Convert a networkx graph whose nodes are hashable labels into a
    ``Graph`` (relabelled to consecutive ids) — the helper from the
    reference's Python example (python/examples/cli_example.py:46-63).

    Returns the Graph; the id mapping is available as ``.node_labels``
    (index -> original label)."""
    labels = list(nx_graph.nodes())
    index_of = {label: i for i, label in enumerate(labels)}
    arr = np.asarray(
        [[index_of[u], index_of[v]] for u, v in nx_graph.edges()], dtype=np.int64
    ).reshape(-1, 2)
    g = Graph(csr.from_edges(arr, num_vertices=len(labels)))
    g.node_labels = labels
    return g


def readCoordinatesFromFile(
    filePath: str, comment: str = "%", delimiter: str = ","
) -> List[List[float]]:
    return io.read_coordinates(filePath, comment, delimiter).tolist()


def timingsToString(timings: List[TimingResult]) -> str:
    return timings_to_string(timings)


def setSeed(seed: int) -> None:
    rng_mod.set_seed(seed)
