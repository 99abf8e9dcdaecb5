from .lobpcg import lobpcg
from .diff_eigs import rayleigh_corrected_eigenvalues
from .arpack import eigsh_shift_invert

__all__ = ["lobpcg", "rayleigh_corrected_eigenvalues", "eigsh_shift_invert"]
