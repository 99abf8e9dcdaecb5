from .quadrature import gauss_tet_quadrature
from .shape_func import shape_function, shape_function_grad, num_nodes_for_order
from .mesh import TetMesh
from .assembly import FEMOperators
from .material import MatSet, Material, lame_params

__all__ = [
    "gauss_tet_quadrature",
    "shape_function",
    "shape_function_grad",
    "num_nodes_for_order",
    "TetMesh",
    "FEMOperators",
    "MatSet",
    "Material",
    "lame_params",
]
