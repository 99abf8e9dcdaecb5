from .grid import load_background_grid, generate_background_grid
from .dmtet import MarchingTets
from .sdf_host import mesh_signed_distance

__all__ = [
    "load_background_grid",
    "generate_background_grid",
    "MarchingTets",
    "mesh_signed_distance",
]
