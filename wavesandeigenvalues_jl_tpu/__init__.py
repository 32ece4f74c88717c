"""wavesandeigenvalues_jl_tpu — a TPU-native sparse-FEM / nonlinear-
eigenvalue framework with the capabilities of WavesAndEigenvalues.jl.

Built from scratch on JAX/XLA/Pallas: tetrahedral P1/P2 FEM assembly of
parameterized operator families K + ωC + ω²M + n·e^{-iωτ}Q for the
thermoacoustic Helmholtz equation, a domain-agnostic NLEVP stack
(Householder/MSLP iterations, Beyn contour integration, arbitrary-order
adjoint perturbation + Padé), Bloch-symmetry reduction, shape
sensitivities, and mesh/VTK tooling — with sharded operators, Pallas
SpMV kernels and contour-shift batching on TPU meshes.
"""
from .utils import config  # noqa: F401  (enables x64, defines dtypes)

__version__ = "0.1.0"
