"""Pallas TPU kernels for the per-iteration hot ops.

The reference runs its force loops as OpenMP C++ with native spatial
indexes (reference: src/embeddingLib/src/embedder/NewWEmbedEmbedder.cpp:306-336,
src/SNN/src/snn.cpp:149-160).  Here the hot ops are hand-fused Pallas
kernels so the whole force pass stays in VMEM: no (n, n) intermediates in
HBM, no scatter/segment-sum, two MXU matmuls per tile.
"""

from .fused_dense import fused_dense_forces

__all__ = ["fused_dense_forces"]
