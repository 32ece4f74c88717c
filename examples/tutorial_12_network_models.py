"""Tutorial 12 — 1-D thermoacoustic network models.

Counterpart of the reference's network module
(/root/reference/src/network.jl): low-order models built from duct /
terminal / flame / damper elements in Riemann invariants (F/G waves).
The same NLEVP solver stack runs on these small dense operator families.

Run:  PYTHONPATH=. JAX_PLATFORMS=cpu python examples/tutorial_12_network_models.py
"""
import numpy as np

from wavesandeigenvalues_jl_tpu.models import discretize_network
from wavesandeigenvalues_jl_tpu.nlevp import beyn, mslp

C, A = 347.0, 0.01

# ── closed-open duct: quarter-wave series f = (2m+1)·c/4L
net = [("unode", (C, A)),        # closed end  (u' = 0, R = +1)
       ("duct", (1.0, C, A)),    # 1 m duct
       ("pnode", (C, A))]        # open end    (p' = 0, R = −1)
L = discretize_network(net)
print(L)
Gamma = 2 * np.pi * np.array([20 + 20j, 20 - 20j, 500 - 20j, 500 + 20j])
Om, P = beyn(L, Gamma, l=6, K=2, N=64)
f = np.sort(Om.real[Om.real > 0]) / 2 / np.pi
print("quarter-wave series [Hz]:", np.round(f, 2),
      " (exact:", [C / 4, 3 * C / 4], ")")
assert np.isclose(f[0], C / 4, rtol=1e-6)

# ── Rijke-type network: duct | n-τ flame | duct
net = [("unode", (C, A)), ("duct", (0.5, C, A)),
       ("flame", (C, 2 * C, A)),           # temperature jump c₂ = 2c₁
       ("duct", (0.5, 2 * C, A)), ("pnode", (2 * C, A))]
Lf = discretize_network(net)
Lf.params["n"] = 0.0
Lf.params["τ"] = 1e-3
sol, _, _ = mslp(Lf, 2 * np.pi * 150, maxiter=40, tol=1e-10)
f_passive = sol.params["ω"].real / 2 / np.pi
Lf.params["n"] = 0.3
sol, _, _ = mslp(Lf, sol.params["ω"], maxiter=40, tol=1e-10)
om = sol.params["ω"]
print(f"\nflame network: passive {f_passive:.2f} Hz → active "
      f"{om.real/2/np.pi:.2f} Hz, growth {om.imag/2/np.pi:+.2f} Hz")

# ── Helmholtz-damper element: frequency-dependent impedance Z(ω) with
# analytic derivatives (network.jl:137-217)
net = [("unode", (C, A)), ("duct", (0.5, C, A)),
       ("helmholtz", (1e-4, 0.02, 0.005, C, A)),   # V, l_neck, d_neck
       ("duct", (0.5, C, A)), ("pnode", (C, A))]
Ld = discretize_network(net)
sol, _, flag = mslp(Ld, 2 * np.pi * 90, maxiter=50, tol=1e-9)
om = sol.params["ω"]
print(f"damped duct:   f = {om.real/2/np.pi:.2f} Hz, "
      f"decay {om.imag/2/np.pi:+.3f} Hz (damper absorbs)")
assert flag >= 0
print("OK")
