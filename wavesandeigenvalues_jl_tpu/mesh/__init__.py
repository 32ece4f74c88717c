from .annular import extend_mesh
from .core import (Mesh, SymInfo, color_domains, find_simplices,
                   unique_simplices)
from .io import read_ansys, read_mesh, read_msh2, read_msh4, read_nastran
from .refine import octosplit
from .vtk import vtk_write, vtk_write_tri

__all__ = ["Mesh", "SymInfo", "find_simplices", "unique_simplices",
           "read_mesh", "read_msh2", "read_msh4", "read_nastran",
           "read_ansys", "octosplit", "vtk_write", "vtk_write_tri",
           "extend_mesh", "color_domains"]
