from .assembly import aggregate_elements, scatter_matrix, scatter_vector
from . import elements

__all__ = ["aggregate_elements", "scatter_matrix", "scatter_vector",
           "elements"]
