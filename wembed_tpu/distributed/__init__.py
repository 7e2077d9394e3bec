from .mesh import init_distributed, make_mesh
from .step import (
    MultiChipEmbedder,
    build_multichip_step,
    multichip_run_embedding,
)

__all__ = [
    "make_mesh",
    "init_distributed",
    "build_multichip_step",
    "multichip_run_embedding",
    "MultiChipEmbedder",
    "HaloEmbedder",
]


def __getattr__(name):
    # HaloEmbedder imported lazily: halo.py pulls in the span kernel stack
    if name == "HaloEmbedder":
        from .halo import HaloEmbedder

        return HaloEmbedder
    raise AttributeError(name)
