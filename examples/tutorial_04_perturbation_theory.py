"""Tutorial 04 — arbitrary-order perturbation theory and Padé summation.

Counterpart of tutorial_04_perturbation_theory
(/root/reference/examples/tutorials/tutorial_04_perturbation_theory.jl):
Taylor-expand an eigenvalue ω(τ) around a baseline to order 20 using the
adjoint recurrence, estimate the convergence radius, and go *beyond* it
with a [10/10] Padé approximant — orders of magnitude cheaper than
re-solving the eigenproblem at every τ.

Run:  PYTHONPATH=. JAX_PLATFORMS=cpu python examples/tutorial_04_perturbation_theory.py
"""
import numpy as np

from wavesandeigenvalues_jl_tpu.nlevp import (conv_radius, estimate_pol,
                                              gallery, mslp, perturb_fast,
                                              polyval)

L, grid = gallery.rijke_tube(128)
sol, n, flag = mslp(L, 1.0 + 0.3j, maxiter=30, tol=1e-12)
om0, tau0 = sol.params["ω"], L.params["τ"]
print(f"baseline: ω(τ₀={tau0.real}) = {om0:.12f}")

# ── 20th-order Taylor coefficients of ω(τ) via the adjoint recurrence
# (one LU factorization amortized over all orders)
N = 20
perturb_fast(sol, L, "τ", N)
coeffs = sol.eigval_pert["τ/Taylor"]
print(f"ω'(τ₀) = {coeffs[1]:.6f},  ω''(τ₀)/2 = {coeffs[2]:.6f}")

# ── convergence radius of the series and nearest-pole estimate
r = conv_radius(coeffs)[-1]
pole_dist, _ = estimate_pol(coeffs)
print(f"estimated convergence radius r ≈ {abs(r):.4f}, "
      f"nearest pole at τ₀+{pole_dist[-1]:.4f}")

# ── inside the radius: Taylor is excellent
for frac, label in [(0.5, "inside"), (2.0, "beyond")]:
    dtau = frac * abs(r)
    taylor = polyval(coeffs, dtau)
    pade_est = sol("τ", (tau0 + dtau).real, 10, 10)  # [10/10] Padé
    L.params["τ"] = tau0 + dtau
    exact = mslp(L, om0, maxiter=40, tol=1e-12)[0].params["ω"]
    L.params["τ"] = tau0
    print(f"\nτ₀ + {frac}·r ({label} radius):")
    print(f"  exact        {exact:.10f}")
    print(f"  Taylor(20)   {taylor:.10f}   err {abs(taylor-exact):.2e}")
    print(f"  Padé[10/10]  {pade_est:.10f}   err {abs(pade_est-exact):.2e}")
    if frac > 1:
        assert abs(pade_est - exact) < abs(taylor - exact), \
            "Padé must beat Taylor beyond the convergence radius"
print("\nOK")
