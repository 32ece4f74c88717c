"""Tutorial 11 — acoustic perturbation equations (APE) with mean flow.

Counterpart of the reference's APE module (/root/reference/src/APE.jl):
(1) solve a potential-flow Poisson problem for the mean flow field from
volume-flux boundary conditions (Hermite elements give nodal velocities
directly), then (2) assemble the linearized APE system — mixed P2
velocity / P1 pressure — and find its acoustic eigenvalues s = iω.

Run:  PYTHONPATH=. JAX_PLATFORMS=cpu python examples/tutorial_11_ape_mean_flow.py
"""
import numpy as np

from wavesandeigenvalues_jl_tpu.mesh.generate import box_mesh
from wavesandeigenvalues_jl_tpu.models import ape, compute_potflow_field
from wavesandeigenvalues_jl_tpu.nlevp import mslp

# a 0.25×0.25×1 m duct with volume flux q through the ends
mesh = box_mesh(lx=0.25, ly=0.25, lz=1.0, nx=2, ny=2, nz=8)
mesh.collect_lines()
q = 0.05  # m³/s → U_z = q/A = 0.8 m/s

# ── mean flow: pure-Neumann Poisson solve; order='lin' uses cubic Hermite
# elements whose gradient DOFs ARE the nodal velocities
U = compute_potflow_field(mesh, {"Zmin": q, "Zmax": -q}, order="lin")
print(f"mean flow: U_z = {U[2].mean():.4f} ± {U[2].std():.1e} m/s "
      f"(plug flow q/A = {q/0.0625})")

# ── APE eigenvalue problem: s·M x + Y·B x + K x + v·U x = 0
L = ape.discretize(mesh, {"Zmin": q, "Zmax": -q}, U=U)
print(L)

c = np.sqrt(ape.AMBIENT_GAMMA * ape.AMBIENT_P / ape.AMBIENT_RHO)
sol, n, flag = mslp(L, 1j * np.pi * c * 1.05, maxiter=30, tol=1e-9)
s = sol.params["s"]
f = abs(s.imag) / 2 / np.pi
print(f"\nfirst axial mode: s = {s:.4f}  →  f = {f:.2f} Hz "
      f"(quiescent closed duct: {c/2:.2f} Hz)")
assert abs(s.imag - np.pi * c) < 0.05 * np.pi * c

# quiescent comparison: without mean flow the mode barely moves at M≈0.002
L0 = ape.discretize(mesh, {"Zmin": q, "Zmax": -q})
sol0, _, _ = mslp(L0, 1j * np.pi * c * 1.05, maxiter=30, tol=1e-9)
print(f"quiescent:        s = {sol0.params['s']:.4f}")
print("OK")
