"""Tutorial 10 — eigenvalue shape sensitivities.

Counterpart of the reference's shape examples
(/root/reference/examples/shape/tutorial_09_shape_sensitivity.jl): the
gradient of an eigenvalue w.r.t. every surface-vertex position, computed
with the discrete adjoint (one re-assembly of only the simplices adjacent
to each point) and validated against eigenvalue finite differences — the
reference's own consistency check `findmax(abs.(sens-fd_sens))`.

Run:  PYTHONPATH=. JAX_PLATFORMS=cpu python examples/tutorial_10_shape_sensitivity.py
"""
import numpy as np

from wavesandeigenvalues_jl_tpu.mesh.generate import box_mesh
from wavesandeigenvalues_jl_tpu.models import (
    discrete_adjoint_shape_sensitivity, discretize,
    forward_finite_differences_shape_sensitivity, get_surface_point_masks,
    normal_sensitivity, normalize_sensitivity, surface_normal_vectors)
from wavesandeigenvalues_jl_tpu.nlevp import householder

C0 = 340.0
mesh = box_mesh(lx=0.2, ly=0.2, lz=1.0, nx=2, ny=2, nz=6)
dscrp = {"Interior": ("interior", ()), "Zmax": ("admittance", ("Y", 1e15))}
c = np.full(len(mesh.tetrahedra), C0)
L = discretize(mesh, dscrp, c)
sol, _, _ = householder(L, 2 * np.pi * C0 / 4 * 0.95, maxiter=20, tol=1e-11,
                        order=2)
print(f"quarter-wave mode: f = {sol.params['ω'].real/2/np.pi:.3f} Hz")

surf, tri_mask, tet_mask = get_surface_point_masks(mesh)
print(f"{len(surf)} surface points × 3 directions")

# ── discrete adjoint: sens[d, p] = ∂ω/∂x_d of surface point p
sens = discrete_adjoint_shape_sensitivity(mesh, dscrp, c, surf, tri_mask,
                                          tet_mask, L, sol, h=1e-8)

# ── validation on a subset: central finite differences of the eigenvalue
pick = np.linspace(0, len(surf) - 1, 5).astype(int)
fd = forward_finite_differences_shape_sensitivity(
    mesh, dscrp, c, surf[pick], [tri_mask[i] for i in pick],
    [tet_mask[i] for i in pick], L, sol, h=1e-6)
err = np.abs(sens[:, surf[pick]] - fd[:, surf[pick]]).max()
scale = np.abs(fd[:, surf[pick]]).max()
print(f"max |DA − FD| = {err:.3e}  (relative {err/scale:.1e})")
assert err / scale < 5e-3

# ── physics: stretching the duct (moving the z=1 end outward) lowers the
# frequency: dω/dL = −ω/L for the quarter-wave mode
end_pts = surf[np.isclose(mesh.points[2, surf], 1.0)]
dom_dL = sens[2, end_pts].sum()
om = sol.params["ω"]
print(f"Σ end-face ∂ω/∂z = {dom_dL:.3f} vs analytic −ω/L = {-om.real:.3f}")
assert abs(dom_dL.real + om.real) < 0.02 * abs(om.real)

# ── postprocessing: area-normalized / normal-projected sensitivity maps
normals = surface_normal_vectors(mesh)  # per-triangle, length = 2·area
normed = normalize_sensitivity(surf, normals, tri_mask, sens)
n_sens = normal_sensitivity(normals, normed)
print(f"normal-projected sensitivity range: "
      f"[{n_sens.real.min():.2f}, {n_sens.real.max():.2f}]")
print("OK")
