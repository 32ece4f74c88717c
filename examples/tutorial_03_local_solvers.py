"""Tutorial 03 — the local eigenvalue solvers.

Counterpart of tutorial_03_local_eigenvalue_solver
(/root/reference/examples/tutorials/tutorial_03_local_eigenvalue_solver.jl):
the whole family of local iterations on one problem — householder (orders
1–5), padesolve, mslp, inveriter, lancaster, traceiter, rf2s — plus the
integer status-flag protocol and the |λ| residual proxy.

Run:  PYTHONPATH=. JAX_PLATFORMS=cpu python examples/tutorial_03_local_solvers.py
"""
import numpy as np

from wavesandeigenvalues_jl_tpu.nlevp import (decode_error_flag, gallery,
                                              householder, inveriter,
                                              lancaster, mslp, padesolve,
                                              rf2s, traceiter)

L, grid = gallery.rijke_tube(128)  # 1-D Rijke FEM, eigvalue near 1+1.07j
z0 = 1.0 + 0.3j

print("solver       eigenvalue                     iters  flag")
for name, solver, kw in [
    ("householder", householder, dict(order=1)),
    ("householder5", householder, dict(order=5)),
    ("padesolve", padesolve, dict(order=2, num_order=1)),
    ("mslp", mslp, {}),
    ("inveriter", inveriter, {}),
    ("lancaster", lancaster, {}),
    ("traceiter", traceiter, {}),
    ("rf2s", rf2s, {}),
]:
    sol, n, flag = solver(L, z0, maxiter=40, tol=1e-11, **kw)
    om = sol.params["ω"]
    print(f"{name:12s} {om: .14f}  {n:3d}   {flag}"
          f"  ({decode_error_flag(flag)})")

# ── the auxiliary eigenvalue |λ| is the built-in residual proxy: at a
# converged ω it is ~machine-zero (tutorial_03…md:94-107)
sol, n, flag = householder(L, z0, maxiter=30, tol=1e-11, nev=1)
lam = sol.params.get("λ", 0.0)
print(f"\nresidual proxy |λ| at convergence: {abs(lam):.2e}")

# ── eigenvector quality: ‖L(ω)v‖/‖v‖
om = sol.params["ω"]
res = np.linalg.norm(L(om).to_dense() @ sol.v) / np.linalg.norm(sol.v)
print(f"eigenpair residual ‖L(ω)v‖/‖v‖:   {res:.2e}")
assert res < 1e-8
print("OK")
