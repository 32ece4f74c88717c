"""Tutorial 14 — flame models from experimental data.

The reference stubs this workflow (empty tutorial_11_experimental_data.jl,
fit_ss commented out); here it is end to end: take measured flame-transfer
-function samples, vector-fit them to a stable state-space model
C(iωI−A)⁻¹B + D with analytic ω-derivatives, and drive the Helmholtz
flame with the fitted model — every solver and the perturbation engine
work unchanged.

Run:  PYTHONPATH=. JAX_PLATFORMS=cpu python examples/tutorial_14_experimental_data.py
"""
import numpy as np

from wavesandeigenvalues_jl_tpu.mesh.generate import rijke_mesh
from wavesandeigenvalues_jl_tpu.models import discretize
from wavesandeigenvalues_jl_tpu.nlevp import fit_state_space, mslp

# ── "measured" FTF samples: an n-τ response with gain roll-off + noise
rng = np.random.default_rng(42)
freqs = np.linspace(100, 600, 120)                      # Hz
tau, fc = 1e-3, 450.0
truth = np.exp(-1j * 2 * np.pi * freqs * tau) / (1 + 1j * freqs / fc)
data = truth * (1 + 0.01 * (rng.standard_normal(len(freqs))
                            + 1j * rng.standard_normal(len(freqs))))

# ── vector fit → stable state-space coefficient function
ss, fitted = fit_state_space(freqs, data, order=12)
err = np.abs(fitted - truth).max() / np.abs(truth).max()
print(f"fit vs noise-free truth: max rel err {err:.2e} "
      f"(1% measurement noise)")
assert err < 0.03

# derivatives come analytically — required by Householder updates and
# arbitrary-order perturbation theory
w0 = 2 * np.pi * 300
h = 1e-3
fd = (ss.eval((w0 + h,), (0,)) - ss.eval((w0 - h,), (0,))) / (2 * h)
print(f"∂FTF/∂ω at 300 Hz: analytic {ss.eval((w0,), (1,)):.6e} ≈ FD {fd:.6e}")

# ── plug into the flame and solve
mesh = rijke_mesh(n_rings=2, nz_cold=12, nz_hot=12)
gamma, R, Tu, Tb, P0, rho = 1.4, 287.05, 300.0, 1200.0, 101325.0, 1.225
c = mesh.generate_field(lambda x, y, z: np.where(
    z < 0, np.sqrt(gamma * R * Tu), np.sqrt(gamma * R * Tb)))
Q02U0 = P0 * (Tb / Tu - 1) * np.pi * 0.025 ** 2 * gamma / (gamma - 1)
L = discretize(mesh, {
    "Interior": ("interior", ()),
    "Outlet": ("admittance", ("Y", 1e15)),
    "Flame": ("flame", (gamma, rho, Q02U0, [0, 0, -0.0012], [0, 0, 1.0], ss)),
}, c)
sol, n, flag = mslp(L, 340 * 2 * np.pi, maxiter=25, tol=1e-10)
om = sol.params["ω"]
print(f"eigenvalue with measured-FTF flame: ω = {om:.4f} "
      f"(f = {om.real/2/np.pi:.2f} Hz, growth {om.imag/2/np.pi:+.2f} Hz)")
assert flag in (0, 1, 2)
print("OK")
