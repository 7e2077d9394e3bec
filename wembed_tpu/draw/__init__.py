from .svg import project_onto_plane, weight_colors, write_svg
from .ipe import write_ipe

__all__ = ["project_onto_plane", "weight_colors", "write_svg", "write_ipe"]
