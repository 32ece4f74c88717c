"""Tutorial 08 — custom flame transfer functions.

Counterpart of tutorial_08_custom_FTF
(/root/reference/examples/tutorials/tutorial_08_custom_FTF.jl): beyond the
built-in n-τ model, a flame can carry ANY frequency response: a callable
FTF(ω) with analytic derivatives, a fitted state-space model
C(iωI−A)⁻¹B + D, or a multi-branch 'fancyflame' Σⱼ nⱼ·exp(aⱼω²−iωτⱼ).
A custom n-τ FTF must reproduce the built-in flame exactly.

Run:  PYTHONPATH=. JAX_PLATFORMS=cpu python examples/tutorial_08_custom_ftf.py
"""
import numpy as np

from wavesandeigenvalues_jl_tpu.mesh.generate import rijke_mesh
from wavesandeigenvalues_jl_tpu.models import discretize
from wavesandeigenvalues_jl_tpu.nlevp import mslp
from wavesandeigenvalues_jl_tpu.nlevp.algebra import ScalarFunc, exp_delay

mesh = rijke_mesh(n_rings=2, nz_cold=12, nz_hot=12)
gamma, R, Tu, Tb, P0, rho = 1.4, 287.05, 300.0, 1200.0, 101325.0, 1.225
c = mesh.generate_field(lambda x, y, z: np.where(
    z < 0, np.sqrt(gamma * R * Tu), np.sqrt(gamma * R * Tb)))
Q02U0 = P0 * (Tb / Tu - 1) * np.pi * 0.025 ** 2 * gamma / (gamma - 1)
X_REF, N_REF = [0.0, 0.0, -0.0012], [0.0, 0.0, 1.0]


def dscrp_with(flame_data):
    return {"Interior": ("interior", ()),
            "Outlet": ("admittance", ("Y", 1e15)),
            "Flame": ("flame", flame_data)}


# ── 1. built-in n-τ flame
L_ntau = discretize(mesh, dscrp_with(
    (gamma, rho, Q02U0, X_REF, N_REF, "n", "τ", 1.0, 1e-3)), c)


# ── 2. identical physics as a *custom* FTF: any ScalarFunc whose eval
# returns the k-th ω-derivative works (the solvers and the perturbation
# engine need those derivatives)
class NTauFTF(ScalarFunc):
    nargs = 1

    def __init__(self, n, tau):
        self.n, self.tau = n, tau

    def eval(self, values, orders):
        (z,), (k,) = values, orders
        return self.n * exp_delay.eval((z, self.tau), (k, 0))

    def symbol(self, names):
        return f"FTF({names[0]})"


L_custom = discretize(mesh, dscrp_with(
    (gamma, rho, Q02U0, X_REF, N_REF, NTauFTF(1.0, 1e-3))), c)

z = (1000 + 300j)
diff = np.abs((L_ntau(z).to_dense() - L_custom(z).to_dense())).max()
print(f"‖L_ntau(z) − L_custom(z)‖∞ = {diff:.2e}  (must be ~0)")
assert diff < 1e-9 * np.abs(L_ntau(z).to_dense()).max()

sol1, _, _ = mslp(L_ntau, 340 * 2 * np.pi, maxiter=20, tol=1e-10)
sol2, _, _ = mslp(L_custom, 340 * 2 * np.pi, maxiter=20, tol=1e-10)
print(f"n-τ flame   ω = {sol1.params['ω']:.6f}")
print(f"custom FTF  ω = {sol2.params['ω']:.6f}")
assert abs(sol1.params["ω"] - sol2.params["ω"]) < 1e-6

# ── 3. multi-branch 'fancyflame' n·exp(aω²−iωτ) (Helmholtz.jl:363-399)
L_fancy = discretize(mesh, {
    "Interior": ("interior", ()),
    "Outlet": ("admittance", ("Y", 1e15)),
    "Flame": ("fancyflame", (gamma, rho, Q02U0, X_REF, N_REF,
                             "n", "τ", "a", 1.0, 1e-3, -1e-9)),
}, c)
sol3, _, _ = mslp(L_fancy, 340 * 2 * np.pi, maxiter=20, tol=1e-10)
print(f"fancyflame  ω = {sol3.params['ω']:.6f} "
      f"(a={L_fancy.params['a']:.1e} Gaussian-delay spread)")
print("OK")
