"""Tutorial 02 — the global (contour-integral) eigenvalue solver in depth.

Counterpart of tutorial_02_global_eigenvalue_solver
(/root/reference/docs/src/tutorial_02_global_eigenvalue_solver.md):
quadrature resolution N, the singular-value filter, the position test,
eigenvalue counting by the winding number / residue theorem, and the
hybrid global-local driver `solve`.

Run:  PYTHONPATH=. JAX_PLATFORMS=cpu python examples/tutorial_02_global_solver.py
"""
import numpy as np

from wavesandeigenvalues_jl_tpu.nlevp import (beyn, count_poles_and_zeros,
                                              gallery, inpoly, solve, wn)

T = gallery.qep3()
Gamma = [-2 - 2j, 2 - 2j, 2 + 2j, -2 + 2j]

# ── too few quadrature nodes → garbage; N=32 resolves the integrand
for N in (4, 8, 32):
    Om, _ = beyn(T, Gamma, l=6, N=N)
    print(f"N={N:3d}:", np.sort_complex(np.round(Om, 6)))

# ── the singular-value cutoff removes spurious directions
Om, _ = beyn(T, Gamma, l=6, N=32, tol=1e-10)
print("with σ-filter:", np.sort_complex(np.round(Om, 8)))

# ── pos_test=False keeps estimates outside Γ too (for diagnostics)
Om_all, _ = beyn(T, Gamma, l=6, N=32, pos_test_flag=False)
print(f"pos_test off: {len(Om_all)} raw estimates, "
      f"{sum(inpoly(z, Gamma) for z in Om_all)} inside "
      f"(winding numbers {[wn(z, Gamma) for z in Om_all[:3]]}...)")

# ── how many eigenvalues are inside, before solving for them?
count = count_poles_and_zeros(T, Gamma, N=64)
print(f"\n#zeros − #poles of det T inside Γ (residue theorem): {count:.4f}")
assert abs(count - 5) < 1e-6

# ── hybrid global-local refinement: Beyn estimates polished by local
# iteration, converged pairs deflated from the moments analytically
eigvals = solve(T, Gamma, dl=2, N=64, tol=1e-9, maxcycles=6,
                max_outer_cycles=3)
inside = sorted((om for om, (s, ok) in eigvals.items() if ok),
                key=lambda z: z.real)
print("hybrid solve eigenvalues:", [f"{z:.8f}" for z in inside])
for target in (1 / 3, 0.5, 1.0):
    assert any(abs(z - target) < 1e-8 for z in inside)
print("OK")
