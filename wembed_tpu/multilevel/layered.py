"""Multilevel (layered) embedder.

Re-design of the reference's LayeredEmbedder
(reference: src/embeddingLib/src/embedder/LayeredEmbedder.cpp): build a
label-propagation hierarchy, embed the coarsest layer with a flat
embedder, then repeatedly expand to the next-finer layer —
``child = geometricStretch * parentPos + sphereSize * randomUnitVec`` with
``geometricStretch = (newN/oldN)^(1/d) * expansionStretch``
(LayeredEmbedder.cpp:46-94) — starting a FRESH flat embedder (fresh Adam
state and iteration counter) per layer, with per-layer degree weights.

Each layer gets its own jitted step (shapes are static per layer); the
persistent compilation cache amortizes per-layer compiles across runs.
"""

from __future__ import annotations

from typing import Callable

import numpy as np

from ..core.embedder import Loss, WEmbedEmbedder
from ..core.options import EmbedderOptions, WeightType
from ..core import weights as weights_mod
from ..graphs.csr import CSRGraph
from ..utils import rng as rng_mod
from ..utils.timer import Timer, TimingResult
from .hierarchy import ExpansionMode, GraphHierarchy
from .label_prop import coarsen_all_layers


class LayeredEmbedder:
    def __init__(
        self,
        graph: CSRGraph,
        opts: EmbedderOptions | None = None,
        timer: Timer | None = None,
        partitioner_opts=None,
        # SIBLING_SPHERE by default: the reference's expansion places all
        # children EXACTLY on their parent (its GraphHierarchy never
        # populates totalContainedNodes, so sphere_size = 0^(1/d) = 0 —
        # SURVEY 2.5) and relies on coincident-point kicks to separate
        # them; measured r05 on girg100k d=2 that quirk costs HALF the
        # reconstruction quality (layered MAP 0.403 vs 0.823 with the
        # sibling sphere; flat 0.508).  ExpansionMode.REFERENCE remains
        # for bug-for-bug parity runs.
        expansion_mode: ExpansionMode = ExpansionMode.SIBLING_SPHERE,
        verbose: bool = True,
        profile: bool = False,
        embedder_factory: Callable | None = None,
    ):
        """``embedder_factory(graph, opts, *, timer, initial_coordinates,
        initial_weights, verbose, profile)`` builds the per-layer flat
        embedder — the hook that composes multilevel with the distributed
        backends (the reference's multilevel mode composes with its whole
        embedder surface, src/wembed.cpp:180-187).  Default: the
        single-device ``WEmbedEmbedder``."""
        self.graph = graph
        self.opts = opts or EmbedderOptions()
        self.timer = timer or Timer()
        self.expansion_mode = expansion_mode
        self.verbose = verbose
        self.profile = profile
        self.embedder_factory = embedder_factory

        result = coarsen_all_layers(graph, opts=partitioner_opts)
        self.hierarchy = GraphHierarchy.build(result)
        self.current_layer = self.hierarchy.num_layers - 1
        self.current_iteration = 0
        self._current = self._make_embedder(
            self.hierarchy.layers[self.current_layer].graph
        )

    def _make_embedder(
        self,
        graph: CSRGraph,
        initial_coordinates: np.ndarray | None = None,
        initial_weights: np.ndarray | None = None,
    ):
        factory = self.embedder_factory or WEmbedEmbedder
        return factory(
            graph,
            self.opts,
            timer=self.timer,
            initial_coordinates=initial_coordinates,
            initial_weights=initial_weights,
            verbose=self.verbose,
            profile=self.profile,
        )

    # ------------------------------------------------------------- stepping
    def calculate_step(self) -> None:
        """(LayeredEmbedder.cpp:5-11)"""
        self.current_iteration += 1
        if self._current.is_finished() and self.current_layer > 0:
            self._expand_positions()
        self._current.calculate_step()

    def is_finished(self) -> bool:
        return self.current_layer == 0 and self._current.is_finished()

    def calculate_embedding(self) -> None:
        with self.timer.phase("embedding_all", "Embedding"):
            while True:
                # run the current layer to convergence on-device, then expand
                self._current.calculate_embedding()
                self.current_iteration += self._current.iteration
                if self.current_layer == 0:
                    break
                self._expand_positions()

    # ------------------------------------------------------------ expansion
    def _expand_positions(self) -> None:
        """(LayeredEmbedder.cpp:46-94)"""
        with self.timer.phase("expanding", "Expanding Positions"):
            d = self.opts.embedding_dimension
            finer = self.hierarchy.layers[self.current_layer - 1]
            new_n = finer.graph.num_vertices
            old_n = self.hierarchy.layers[self.current_layer].graph.num_vertices
            old_positions = self._current.get_coordinates()

            if self.opts.weight_type is WeightType.DEGREE:
                new_weights = weights_mod.rescale_weights(
                    self.opts.dimension_hint, d, weights_mod.degree_weights(finer.graph)
                )
            elif self.opts.weight_type is WeightType.UNIT:
                new_weights = weights_mod.unit_weights(new_n)
            else:
                raise ValueError("weight type not supported for layered embedding")

            stretch = (new_n / old_n) ** (1.0 / d) * self.opts.expansion_stretch
            parents = finer.parent
            base = stretch * old_positions[parents]

            if self.expansion_mode is ExpansionMode.SIBLING_SPHERE:
                siblings = self.hierarchy.num_siblings(self.current_layer - 1)
                sphere = siblings.astype(np.float64) ** (1.0 / d)
            else:
                # reference behavior: totalContainedNodes never populated =>
                # sphere radius 0 (GraphHierarchy.cpp:39-57, SURVEY.md §2.5)
                sphere = np.zeros(new_n)
            rng = rng_mod.host_rng()
            gauss = rng.normal(size=(new_n, d))
            norms = np.linalg.norm(gauss, axis=1, keepdims=True)
            unit = gauss / np.where(norms > 0, norms, 1.0)
            new_positions = base + sphere[:, None] * unit

            self.current_layer -= 1
            if self.verbose:
                print(
                    f"Expanding to layer {self.current_layer} "
                    f"(n={new_n}) at iteration {self.current_iteration}"
                )
            if new_n > 100_000:
                # large finer layer: drop the coarser layers' compiled
                # executables and their baked device constants before
                # building the new step — ten layers of accumulated
                # programs alongside a million-vertex layer's buffers
                # crashed the device at 1M (the persistent disk cache
                # keeps any recompile cheap)
                import jax

                self._current = None
                jax.clear_caches()
            self._current = self._make_embedder(
                finer.graph,
                initial_coordinates=new_positions,
                initial_weights=new_weights,
            )

    # ------------------------------------------------------------ accessors
    def get_coordinates(self) -> np.ndarray:
        return self._current.get_coordinates()

    def get_weights(self) -> np.ndarray:
        return self._current.get_weights()

    def get_current_graph(self) -> CSRGraph:
        return self.hierarchy.layers[self.current_layer].graph

    def get_timings(self) -> list[TimingResult]:
        return self.timer.results()

    def get_loss(self) -> Loss:
        return self._current.get_loss()

    def set_coordinates(self, coordinates) -> None:
        # reference: no-op with a warning (LayeredEmbedder.cpp:26-36)
        import warnings

        warnings.warn("Setting coordinates for layered embedder has no effect")

    def set_weights(self, weights) -> None:
        import warnings

        warnings.warn("Setting weights for layered embedder has no effect")

    @property
    def num_vertices(self) -> int:
        return self.get_current_graph().num_vertices

    @property
    def embedding_dimension(self) -> int:
        return self.opts.embedding_dimension

    @property
    def iteration(self) -> int:
        return self.current_iteration
