"""Embedder configuration.

Mirrors the reference's internal EmbedderOptions
(reference: src/embeddingLib/include/embedder/EmbedderOptions.hpp:21-51) with
identical defaults, plus TPU-specific execution knobs (dtype, repulsion
mode, candidate window capacity) that have no reference counterpart.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass


class WeightType(enum.Enum):
    UNIT = 0
    DEGREE = 1
    ORIGINAL = 2


class OptimizerType(enum.Enum):
    SIMPLE = 0
    ADAM = 1


class RepulsionMode(enum.Enum):
    """How repulsion partners are found.

    AUTO   — dense below ``dense_threshold`` vertices, bucket above.
    DENSE  — exact all-pairs repulsion via MXU matmuls (the ideal candidate
             set; what the reference's exact radius index approximates).
    BUCKET — weight-bucketed projected-sort candidate windows, the TPU-native
             equivalent of the reference's SNN/sprk spatial index stack
             (reference src/embeddingLib/src/spacialQuery/).
    """

    AUTO = 0
    DENSE = 1
    BUCKET = 2


@dataclass(frozen=True)
class EmbedderOptions:
    # ---- embedding parameters (EmbedderOptions.hpp:22-24)
    embedding_dimension: int = 4
    dimension_hint: float = -1.0
    lp_norm: int = 2  # only 2 is supported, as in the reference

    # ---- force parameters (EmbedderOptions.hpp:27-38)
    weight_type: WeightType = WeightType.DEGREE
    num_negative_samples: int = -1  # -1 => use the spatial candidate index
    index_size: float = 1.0  # fraction of nodes inserted into the index
    doubling_factor: float = 2.0
    position_min_change: float = 1e-4
    attraction_scale: float = 1.0
    repulsion_scale: float = 1.0
    centre_scale: float = 0.0
    edge_length: float = 1.0
    expansion_stretch: float = 1.0

    # ---- weights (EmbedderOptions.hpp:41-45)
    additive_weights: bool = False
    dump_weights: bool = False

    # ---- gradient descent (EmbedderOptions.hpp:48-51)
    optimizer_type: OptimizerType = OptimizerType.ADAM
    cooling_factor: float = 0.99
    learning_rate: float = 10.0
    max_iterations: int = 1000

    # ---- TPU execution knobs (no reference counterpart)
    dtype: str = "float32"  # positions/forces dtype; "float64" for parity runs
    repulsion_mode: RepulsionMode = RepulsionMode.AUTO
    dense_threshold: int = 16384  # AUTO switches to BUCKET above this
    window_capacity: int = 48  # per-bucket candidate window size
    block_size: int = 1024  # row-block size for chunked dense repulsion
    # fused Pallas force kernel (attraction+repulsion in one all-pairs pass):
    # "auto" = on TPU backends for the unsharded f32 dense mode,
    # "on"/"off" force it, "interpret" runs the kernel in interpreter mode
    # (CPU-testable, slow)
    fused_dense: str = "auto"
    # fused Pallas sparse-span kernel (the bucketed candidate sweep as one
    # VMEM-resident pallas_call, kernels/span_sparse.py): "auto" = on TPU
    # backends for the unsharded f32 bucket mode with index_size == 1,
    # "on"/"off" force it, "interpret" runs it in interpreter mode
    fused_span: str = "auto"
    # span-kernel candidate layout: "windows" = per-(query block, target
    # row) tile windows on the second principal axis, "cells" =
    # three-level binning (rows x cells on the first two axes, windows on
    # the THIRD) with per-query-block COMPACTION of window members into
    # dense tiles (kernels/span_compact.py).  "auto" currently resolves
    # to windows everywhere: on girg100k d=4 hardware the two layouts
    # measured at parity (cells 29-33K tiles / 0.16 s-step vs windows
    # 35K / 0.12 s) — at this scale the conservative-reach geometry, not
    # per-window quantization, bounds the swept volume (decomposition in
    # baselines/tpu_measured.json girg100k_d4), and the d4 step is not
    # sweep-bound.  The cell layout remains selectable ("cells") and
    # fully tested; it is expected to win where window-count quantization
    # dominates (deeper bulges, larger n at d >= 3).
    span_layout: str = "auto"
    # segment the device-side embedding loop every this many iterations to
    # let the host SHRINK over-provisioned span windows (the mid-run
    # candidate bulge inflates windows that overflow-driven growth alone
    # never deflates; measured ~1.7x work-tile inflation at 1M vertices).
    # 0 disables the checks (single uninterrupted device loop).
    span_resize_interval: int = 50
    # halo backend only: shard the sweep-RESIDENT span structures by
    # query-block range (each device holds its 1/P qdata slice and a
    # compact per-work-tile span buffer instead of replicated O(n*C)
    # qdata/sdata — VERDICT r4 item 6).  The equal-block partition
    # balances queries, not tiles; overflow of the per-device tile budget
    # is surfaced through the overflow counter (never silent).  The sorts
    # and the O(n*C) sorted-value BUILD TRANSIENT remain replicated — a
    # distributed sample-sort is the documented follow-up.
    halo_resident_structures: bool = False
    # debug mode, the analogue of the reference's EMBEDDING_USE_ASSERTIONS
    # toggle (Macros.hpp:7-11, CMakeLists.txt:65-68): enables
    # jax_debug_nans (jit raises where a NaN is produced) and validates
    # that the whole state pytree is finite after every host-visible step
    debug_checks: bool = False

    def resolve_repulsion_mode(self, n: int) -> RepulsionMode:
        if self.num_negative_samples >= 0:
            return RepulsionMode.DENSE  # unused; sampling path replaces index
        if self.repulsion_mode is RepulsionMode.AUTO:
            return (
                RepulsionMode.DENSE if n <= self.dense_threshold else RepulsionMode.BUCKET
            )
        return self.repulsion_mode


@dataclass(frozen=True)
class PartitionerOptions:
    """Multilevel coarsening knobs (reference
    src/embeddingLib/include/partition/Partitioner.hpp:9-16)."""

    max_iterations: int = 20
    max_cluster_size: int = 6
    final_graph_size: int = 10
    order_type: int = 0  # 0 = ascending degree, 1 = random
    num_hierarchies: int = 1
