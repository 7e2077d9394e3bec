from .mesh import make_mesh
from .step import build_multichip_step, multichip_run_embedding

__all__ = ["make_mesh", "build_multichip_step", "multichip_run_embedding"]
