from .linsolve import DenseLU, Factorization, SingularMatrixError, factorize
from .sparse import CSR, StackedOperator, coo_sum_duplicates, csr_to_ell

__all__ = ["CSR", "StackedOperator", "coo_sum_duplicates", "csr_to_ell",
           "DenseLU", "Factorization", "SingularMatrixError", "factorize"]
