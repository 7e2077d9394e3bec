"""Checkpoint / resume of the full embedding state.

The reference's resume path loses optimizer state: only coordinates round-
trip through CSV (reference src/cli_wembed/main.cpp:22-26,
include/wembed.h:157-162 — Adam m/v/t and the iteration counter are not
checkpointed, SURVEY.md §5.4).  Here the ENTIRE state pytree (positions,
Adam moments, iteration, PRNG key) plus the weights snapshot to one .npz,
so a resumed run continues bit-for-bit.

CSV import/export for reference interop lives in graphs.io
(write_coordinates / read_coordinates).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .embedder import WEmbedEmbedder
from .state import EmbedState


def save_checkpoint(path: str, embedder: WEmbedEmbedder) -> None:
    s = embedder.state
    np.savez(
        path,
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


def load_checkpoint(path: str, embedder: WEmbedEmbedder) -> None:
    """Restore a checkpoint into an embedder built on the same graph/opts."""
    data = np.load(path if path.endswith(".npz") else path + ".npz")
    if data["positions"].shape[0] != embedder.graph.num_vertices:
        raise ValueError(
            f"checkpoint has {data['positions'].shape[0]} vertices, embedder "
            f"graph has {embedder.graph.num_vertices}"
        )
    embedder.set_weights(data["weights"])
    span_scale = float(data["span_scale"])
    while embedder._span_scale < span_scale and embedder._grow_spans():
        pass
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
