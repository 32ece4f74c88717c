from .core import Mesh, SymInfo, find_simplices, unique_simplices
from .io import read_mesh, read_msh2, read_msh4, read_nastran

__all__ = ["Mesh", "SymInfo", "find_simplices", "unique_simplices",
           "read_mesh", "read_msh2", "read_msh4", "read_nastran"]
