"""wembed_tpu — a TPU-native weighted graph-embedding framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of WEmbed
(weighted low-dimensional vertex embeddings by force-directed descent):
graph = arrays, step = one jitted pure function over a state pytree,
scale = sharding annotations over a device mesh.
"""

from .utils.compile_cache import enable_default_compile_cache

enable_default_compile_cache()

from . import core, graphs, utils
from .core import EmbedderOptions, WEmbedEmbedder

__version__ = "0.1.0"

__all__ = ["core", "graphs", "utils", "EmbedderOptions", "WEmbedEmbedder", "__version__"]
