"""Tutorial 00 — the nonlinear eigenvalue problem (NLEVP) engine.

Counterpart of the reference's tutorial_00_NLEVP
(/root/reference/docs/src/tutorial_00_NLEVP.md): build a small operator
family T(λ) = λ²A₂ + λA₁ + A₀ from the Betcke–Higham NLEVP collection,
find the eigenvalue 1/3 with a local solver, then ALL eigenvalues inside a
contour with Beyn's integral method.

Run:  PYTHONPATH=. JAX_PLATFORMS=cpu python examples/tutorial_00_nlevp.py
"""
import numpy as np

from wavesandeigenvalues_jl_tpu.nlevp import (beyn, gallery, householder,
                                              mslp)

# ── the 3×3 quadratic eigenvalue problem (gallery.qep3 == NLEVP 'qep')
# spectrum: ±i, 1/3, 1/2, 1 and one infinite eigenvalue
T = gallery.qep3()
print(T)

# ── local solve: Householder iteration from the initial guess λ₀ = 0
sol, n, flag = householder(T, 0.0, maxiter=10, tol=1e-10)
print(f"\nhouseholder: λ = {sol.params['λ']:.12f}  ({n} iterations, "
      f"flag {flag})")
assert abs(sol.params["λ"] - 1 / 3) < 1e-10

# mslp (method of successive linear problems) reaches the same fixed point
sol, n, flag = mslp(T, 0.0, maxiter=10, tol=1e-10)
print(f"mslp:        λ = {sol.params['λ']:.12f}  ({n} iterations)")

# ── global solve: Beyn contour integration over the square ±2±2i.
# 5 of the 6 finite/infinite eigenvalues lie inside; the residual tells
# the true ones apart (tutorial_00: "5 have extremely low residuals").
Gamma = [-2 - 2j, 2 - 2j, 2 + 2j, -2 + 2j]
Om, P = beyn(T, Gamma, l=6, N=32)
print("\nbeyn eigenvalues inside ±2±2i:")
for lam, v in zip(Om, P.T):
    res = np.linalg.norm(T(lam).to_dense() @ (v / np.linalg.norm(v)))
    print(f"  λ = {lam: .10f}   residual = {res:.2e}")
good = sum(np.linalg.norm(T(lam).to_dense() @ (P[:, i] / np.linalg.norm(P[:, i])))
           < 1e-8 for i, lam in enumerate(Om))
assert good == 5
print("\nOK — 5 true eigenvalues recovered.")
