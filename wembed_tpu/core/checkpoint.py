"""Checkpoint / resume of the full embedding state.

The reference's resume path loses optimizer state: only coordinates round-
trip through CSV (reference src/cli_wembed/main.cpp:22-26,
include/wembed.h:157-162 — Adam m/v/t and the iteration counter are not
checkpointed, SURVEY.md §5.4), and LayeredEmbedder cannot resume at all
(setCoordinates is a no-op, LayeredEmbedder.cpp:26-36).  Here the ENTIRE
state pytree (positions, Adam moments, iteration, PRNG key) plus the
weights snapshot to one .npz, so a resumed run continues bit-for-bit —
and a layered checkpoint additionally saves the layer index, the
accumulated iteration count, and the per-layer parent-pointer mappings, so
a multilevel run resumes MID-HIERARCHY (the coarse graphs are rebuilt
deterministically from the finest graph + saved mappings).

CSV import/export for reference interop lives in graphs.io
(write_coordinates / read_coordinates).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .embedder import WEmbedEmbedder
from .state import EmbedState


def _flat_state_arrays(embedder: WEmbedEmbedder) -> dict:
    # distributed embedders (HaloEmbedder) expose host_state: per-vertex
    # arrays gathered and trimmed to (n, ...) — device-count independent,
    # so a halo checkpoint restores into any backend and mesh size
    s = getattr(embedder, "host_state", embedder.state)
    return dict(
        positions=np.asarray(s.positions),
        adam_m=np.asarray(s.adam_m),
        adam_v=np.asarray(s.adam_v),
        iteration=np.asarray(s.iteration),
        key=np.asarray(jax.random.key_data(s.key)),
        attract_loss=np.asarray(s.attract_loss),
        repel_loss=np.asarray(s.repel_loss),
        pos_change=np.asarray(s.pos_change),
        num_rep_forces=np.asarray(s.num_rep_forces),
        overflow=np.asarray(s.overflow),
        weights=embedder.get_weights(),
        span_scale=np.asarray(embedder._span_scale),
    )


def save_checkpoint(path: str, embedder) -> None:
    """Snapshot a WEmbedEmbedder or LayeredEmbedder to ``path`` (.npz)."""
    if hasattr(embedder, "hierarchy"):  # LayeredEmbedder
        inner = embedder._current
        arrays = _flat_state_arrays(inner)
        arrays["layered"] = np.asarray(1)
        arrays["current_layer"] = np.asarray(embedder.current_layer)
        arrays["current_iteration"] = np.asarray(embedder.current_iteration)
        arrays["num_layers"] = np.asarray(embedder.hierarchy.num_layers)
        for i, layer in enumerate(embedder.hierarchy.layers[:-1]):
            arrays[f"parent_{i}"] = layer.parent
        np.savez(path, **arrays)
        return
    np.savez(path, **_flat_state_arrays(embedder))


def _restore_flat_state(data, embedder: WEmbedEmbedder) -> None:
    from ..kernels import span_sparse as span_mod

    embedder.set_weights(data["weights"])
    dtype = embedder._dtype
    embedder.state = EmbedState(
        positions=jnp.asarray(data["positions"], dtype),
        adam_m=jnp.asarray(data["adam_m"], dtype),
        adam_v=jnp.asarray(data["adam_v"], dtype),
        iteration=jnp.asarray(data["iteration"], jnp.int32),
        key=jax.random.wrap_key_data(jnp.asarray(data["key"])),
        attract_loss=jnp.asarray(data["attract_loss"], jnp.float32),
        repel_loss=jnp.asarray(data["repel_loss"], jnp.float32),
        pos_change=jnp.asarray(data["pos_change"], jnp.float32),
        num_rep_forces=jnp.asarray(data["num_rep_forces"], jnp.int32),
        overflow=jnp.asarray(data["overflow"], jnp.int32),
    )
    from .span_driver import SPAN_TYPES

    if isinstance(getattr(embedder, "_index", None), SPAN_TYPES):
        # size candidate windows from the RESTORED positions (growth is
        # needs-based, so replaying the original run's growth count would
        # size windows for the constructor's random init instead — the
        # resumed run must start untruncated at the restored geometry)
        embedder._presize_spans()
    else:
        # BucketIndex growth is scale-based: replay the saved doublings
        span_scale = float(data["span_scale"])
        while embedder._span_scale < span_scale and embedder._grow_spans():
            pass


def load_checkpoint(path: str, embedder) -> None:
    """Restore a checkpoint into an embedder built on the same graph/opts.

    Flat checkpoints restore into a WEmbedEmbedder; layered checkpoints
    into a LayeredEmbedder on the same FINEST graph — the hierarchy is
    rebuilt from the saved parent pointers (NOT re-coarsened, so the
    resumed hierarchy is identical even though label propagation is
    randomized)."""
    data = np.load(path if path.endswith(".npz") else path + ".npz")
    if "layered" in data.files:
        _restore_layered(data, embedder)
        return
    if data["positions"].shape[0] != embedder.graph.num_vertices:
        raise ValueError(
            f"checkpoint has {data['positions'].shape[0]} vertices, embedder "
            f"graph has {embedder.graph.num_vertices}"
        )
    _restore_flat_state(data, embedder)


def _restore_layered(data, embedder) -> None:
    from ..graphs import algorithms
    from ..multilevel.hierarchy import GraphHierarchy
    from ..multilevel.label_prop import CoarseningResult

    if not hasattr(embedder, "hierarchy"):
        raise ValueError("layered checkpoint requires a LayeredEmbedder")
    num_layers = int(data["num_layers"])
    g = embedder.graph
    graphs = [g]
    mappings = []
    for i in range(num_layers - 1):
        m = data[f"parent_{i}"]
        if m.shape[0] != g.num_vertices:
            raise ValueError(
                f"checkpoint layer {i} has {m.shape[0]} vertices, rebuilt "
                f"hierarchy has {g.num_vertices} — wrong finest graph?"
            )
        mappings.append(m)
        g, _ = algorithms.coarsen_graph(g, m)
        graphs.append(g)
    embedder.hierarchy = GraphHierarchy.build(
        CoarseningResult(parent_pointers=mappings, graphs=graphs)
    )
    embedder.current_layer = int(data["current_layer"])
    embedder.current_iteration = int(data["current_iteration"])
    inner = WEmbedEmbedder(
        embedder.hierarchy.layers[embedder.current_layer].graph,
        embedder.opts,
        timer=embedder.timer,
        initial_coordinates=data["positions"],
        initial_weights=data["weights"],
        verbose=embedder.verbose,
        profile=embedder.profile,
    )
    _restore_flat_state(data, inner)
    embedder._current = inner
