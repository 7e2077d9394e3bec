from .csr import CSRGraph, from_adjacency, from_edges, induced_subgraph
from . import algorithms, generators, io

__all__ = [
    "CSRGraph",
    "from_adjacency",
    "from_edges",
    "induced_subgraph",
    "algorithms",
    "generators",
    "io",
]
