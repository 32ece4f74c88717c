"""Tutorial 01 — thermoacoustic stability of a Rijke tube, end to end.

Counterpart of the reference's tutorial_01_rijke_tube
(/root/reference/examples/tutorials/tutorial_01_rijke_tube.jl): read the
tetrahedral mesh, assemble the parameterized Helmholtz operator family

    L(ω) = K + ω·Y·C + ω²·M + n·exp(-iωτ)·Q,

find the passive modes (≈272 and ≈695 Hz) with Beyn's global solver, then
switch the n-τ flame on and track the now-unstable mode with a local
iteration.  Writes the mode shape to VTU for ParaView.

Run:  PYTHONPATH=. JAX_PLATFORMS=cpu python examples/tutorial_01_rijke_tube.py
"""
import os

import numpy as np

from wavesandeigenvalues_jl_tpu.mesh import read_mesh, vtk_write
from wavesandeigenvalues_jl_tpu.mesh.generate import rijke_mesh
from wavesandeigenvalues_jl_tpu.models import discretize
from wavesandeigenvalues_jl_tpu.nlevp import beyn, mslp

# ── mesh: the reference's Rijke_mm.msh if present, else a generated twin
REF_MSH = "/root/reference/docs/src/Rijke_mm.msh"
if os.path.exists(REF_MSH):
    mesh = read_mesh(REF_MSH, scale=1e-3)  # mm → m
else:
    mesh = rijke_mesh()
print(mesh)

# ── physics: cold (300 K) upstream / hot (1200 K) downstream of the flame
gamma, R, Tu, Tb, P0, rho = 1.4, 287.05, 300.0, 1200.0, 101325.0, 1.225
# per-tet centroid sampling — the reference tutorial's generate_field default
c = mesh.generate_field(lambda x, y, z: np.where(
    z < 0, np.sqrt(gamma * R * Tu), np.sqrt(gamma * R * Tb)), order="const")
Q02U0 = P0 * (Tb / Tu - 1) * np.pi * 0.025 ** 2 * gamma / (gamma - 1)

dscrp = {
    "Interior": ("interior", ()),                 # wave operator M + K
    "Outlet": ("admittance", ("Y", 1e15)),        # open end: p ≈ 0
    "Flame": ("flame", (gamma, rho, Q02U0,        # n-τ flame, rank-one Q
                        [0.0, 0.0, -0.00101],     # reference point x_ref
                        [0.0, 0.0, 1.0],          # reference direction
                        "n", "τ", 0.0, 1e-3)),    # start passive: n = 0
}
L = discretize(mesh, dscrp, c)
print(L)

# ── passive modes: Beyn contour solve over 150–1000 Hz
Gamma = np.array([150 + 5j, 150 - 5j, 1000 - 5j, 1000 + 5j]) * 2 * np.pi
Om, P = beyn(L, Gamma, l=10, N=64, rtol=1e-12)
print("\npassive eigenfrequencies [Hz]:", np.sort(Om.real) / 2 / np.pi)

# ── active flame: n = 1 → the 272 Hz mode becomes unstable
L.params["n"] = 1.0
sol, n_it, flag = mslp(L, 340 * 2 * np.pi, maxiter=20, tol=1e-11)
om = sol.params["ω"]
print(f"\nactive eigenvalue ω = {om:.6f} rad/s "
      f"(f = {om.real/2/np.pi:.2f} Hz, growth rate {om.imag/2/np.pi:.2f} Hz)")
assert om.imag > 0, "flame should destabilize the mode"
if os.path.exists(REF_MSH):
    # committed output of the reference's tutorial_04 (…theory.md:81)
    assert abs(om - (1075.325211506839 + 372.1017670372039j)) < 1e-7

# ── export the mode shape (length == n_points → written as point data)
files = vtk_write("rijke_mode", mesh, {"abs(p)": np.abs(sol.v),
                                       "phase": np.angle(sol.v)})
print("wrote:", files)
