"""Global configuration for the TPU-native waves/eigenvalues framework.

The framework runs in two numeric regimes:

* **reference precision** (complex128) — available on CPU backends and used
  for all correctness-critical orchestration (NLEVP outer iterations,
  perturbation recurrences, Padé algebra).
* **device precision** (complex64 / float32-pair / float64-pair) — used by
  the TPU compute kernels.  TPUs in this deployment compile ``complex64``
  natively but reject ``complex128``; ``float64`` is emulated.  High accuracy
  on TPU is recovered through mixed-precision iterative refinement
  (see :mod:`..ops.refine`).

Reference behaviour being reproduced: WavesAndEigenvalues.jl works in
``ComplexF64`` throughout (e.g. /root/reference/src/NLEVP/LinOpFam.jl:133).
"""
from __future__ import annotations

import os

import jax

# Enable x64 so the CPU path matches the reference's ComplexF64 semantics.
jax.config.update("jax_enable_x64", True)
# TPU matmuls default to bfloat16 MXU passes — that destroys Gram-Schmidt
# orthogonality inside GMRES (relres stalls ~1) and the accuracy of every
# coefficient contraction.  This is a numerics framework: full f32 matmul
# precision everywhere (kernels that want bf16 opt in explicitly).
jax.config.update("jax_default_matmul_precision", "highest")
# Persistent compilation cache: the slab/panel programs take 15-25 s each
# to compile and every fresh process (tests, bench, scale runs) re-pays
# it otherwise.  Cache dir is overridable / disablable via env.
if os.environ.get("WAE_COMPILE_CACHE", "1") != "0":
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("WAE_COMPILE_CACHE_DIR",
                       os.path.expanduser("~/.cache/wae_xla")))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402

#: dtype used by the orchestration layer (matches the reference).
CDTYPE = np.complex128
#: real counterpart.
RDTYPE = np.float64

#: dtype used on accelerators that cannot compile complex128.
DEVICE_CDTYPE = np.complex64

#: index dtype for sparse structures.
IDTYPE = np.int32


def default_backend() -> str:
    """The JAX backend currently in use ('cpu', 'tpu', 'axon', ...)."""
    return jax.default_backend()


def on_tpu() -> bool:
    plat = jax.devices()[0].platform
    return plat in ("tpu", "axon")


def device_complex_dtype():
    """Complex dtype safe to compile on the current default device."""
    return DEVICE_CDTYPE if on_tpu() else CDTYPE


#: perturbation order for which multi-index tables are pre-generated
#: (reference: deps/build.jl:4-11, env JULIA_WAE_PERT_ORDER, default 16).
PERT_ORDER = int(os.environ.get("WAE_TPU_PERT_ORDER", "16"))


# ---------------------------------------------------------------------------
# shifted-solve backend (the reference's UMFPACK role):
#   'host'         scipy SuperLU / LAPACK on CPU
#   'device'       XLA dense LU below DEVICE_DENSE_MAX_DIM, GMRES above
#   'device_lu' / 'device_gmres'   force one device path

_SOLVE_BACKENDS = ("host", "device", "device_lu", "device_gmres")
_solve_backend = os.environ.get("WAE_SOLVE_BACKEND", "host")


def solve_backend() -> str:
    """Current default backend for :func:`..ops.linsolve.factorize`."""
    return _solve_backend


def set_solve_backend(backend: str) -> str:
    """Set the default shifted-solve backend; returns the previous value
    (so callers can restore it)."""
    global _solve_backend
    if backend not in _SOLVE_BACKENDS:
        raise ValueError(f"unknown solve backend {backend!r}; "
                         f"one of {_SOLVE_BACKENDS}")
    prev = _solve_backend
    _solve_backend = backend
    return prev
