"""Tutorial 05 — hierarchical mesh refinement.

Counterpart of tutorial_05_mesh_refinement
(/root/reference/docs/src/tutorial_05_mesh_refinement.md): `octosplit`
uniformly subdivides every tetrahedron 1→8; eigenfrequencies converge
toward the analytic value as the mesh is refined.

Run:  PYTHONPATH=. JAX_PLATFORMS=cpu python examples/tutorial_05_mesh_refinement.py
"""
import numpy as np

from wavesandeigenvalues_jl_tpu.mesh import octosplit
from wavesandeigenvalues_jl_tpu.mesh.generate import box_mesh
from wavesandeigenvalues_jl_tpu.models import discretize
from wavesandeigenvalues_jl_tpu.nlevp import householder

C0 = 340.0
f_exact = C0 / 4  # quarter-wave mode of a closed-open 1 m duct

mesh = box_mesh(lx=0.2, ly=0.2, lz=1.0, nx=1, ny=1, nz=3)
errs = []
for level in range(3):
    c = np.full(len(mesh.tetrahedra), C0)
    L = discretize(mesh, {"Interior": ("interior", ()),
                          "Zmax": ("admittance", ("Y", 1e15))}, c)
    sol, n, flag = householder(L, 2 * np.pi * f_exact * 0.97, maxiter=25,
                               tol=1e-11, order=2)
    f = sol.params["ω"].real / 2 / np.pi
    errs.append(abs(f - f_exact))
    print(f"level {level}: {mesh.n_points:6d} pts, "
          f"{len(mesh.tetrahedra):7d} tets → f₁ = {f:.4f} Hz "
          f"(err {errs[-1]:.2e} Hz)")
    if level < 2:
        mesh = octosplit(mesh)

# P1 elements: error drops ~4× per octosplit (h² convergence)
assert errs[2] < errs[0] / 6
print(f"\nconvergence ratios: {errs[0]/errs[1]:.2f}, {errs[1]/errs[2]:.2f} "
      "(≈4 expected for P1) — OK")
