"""Tutorial 06 — higher-order elements (P2, cubic Hermite).

Counterpart of tutorial_06_second_order_elements
(/root/reference/docs/src/tutorial_06_second_order_elements.md): the same
duct discretized with P1 / P2 / Hermite elements; higher order is far more
accurate per DOF.

Run:  PYTHONPATH=. JAX_PLATFORMS=cpu python examples/tutorial_06_second_order_elements.py
"""
import numpy as np

from wavesandeigenvalues_jl_tpu.mesh.generate import box_mesh
from wavesandeigenvalues_jl_tpu.models import discretize
from wavesandeigenvalues_jl_tpu.nlevp import householder

C0 = 340.0
f_exact = C0 / 4

mesh = box_mesh(lx=0.2, ly=0.2, lz=1.0, nx=1, ny=1, nz=5)
errs = {}
for order in ("lin", "quad", "herm"):
    c = np.full(len(mesh.tetrahedra), C0)
    L = discretize(mesh, {"Interior": ("interior", ()),
                          "Zmax": ("admittance", ("Y", 1e15))}, c,
                   order=order)
    sol, n, flag = householder(L, 2 * np.pi * f_exact * 0.99, maxiter=25,
                               tol=1e-12, order=2)
    f = sol.params["ω"].real / 2 / np.pi
    errs[order] = abs(f - f_exact)
    print(f"{order:4s}: dim {L.size:6d} → f₁ = {f:.6f} Hz "
          f"(err {errs[order]:.2e} Hz)")

assert errs["quad"] < errs["lin"] / 10
assert errs["herm"] < errs["lin"] / 10
print("\nhigher-order elements: orders of magnitude more accurate — OK")
