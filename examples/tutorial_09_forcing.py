"""Tutorial 09 — forced response (speaker boundary sources).

Counterpart of tutorial_09_forcing
(/root/reference/docs/src/tutorial_09_forcing.md): a :speaker descriptor
adds a parameterized boundary forcing vector; the forced response
p(ω) = L(ω)⁻¹ m(ω) peaks at the acoustic resonances.

Run:  PYTHONPATH=. JAX_PLATFORMS=cpu python examples/tutorial_09_forcing.py
"""
import numpy as np

from wavesandeigenvalues_jl_tpu.mesh.generate import rijke_mesh
from wavesandeigenvalues_jl_tpu.models import discretize
from wavesandeigenvalues_jl_tpu.ops.linsolve import factorize

mesh = rijke_mesh(n_rings=2, nz_cold=12, nz_hot=12)
gamma, R, Tu, Tb = 1.4, 287.05, 300.0, 1200.0
c = mesh.generate_field(lambda x, y, z: np.where(
    z < 0, np.sqrt(gamma * R * Tu), np.sqrt(gamma * R * Tb)))

# speaker at the inlet: strength symbol "S", admittance Yin
dscrp = {"Interior": ("interior", ()),
         "Outlet": ("admittance", ("Y", 1e15)),
         "Inlet": ("speaker", ("S", 1.0, "Yin", 1e-3))}
L, rhs = discretize(mesh, dscrp, c, source=True)
print(L)
print("forcing params:", dict(rhs.params))

# frequency sweep of the forced response at a probe point
probe = np.argmin(np.linalg.norm(mesh.points.T - [0, 0, 0.1], axis=1))
freqs = np.linspace(150, 900, 60)
amp = []
for f in freqs:
    om = 2 * np.pi * f
    A = L(om)
    m = rhs(om).to_dense()[:, 0]
    p = factorize(A).solve(m)
    amp.append(abs(p[probe]))
amp = np.asarray(amp)

# resonance peaks near the passive eigenfrequencies (≈272 / 695 Hz)
peaks = freqs[1:-1][(amp[1:-1] > amp[:-2]) & (amp[1:-1] > amp[2:])]
print("response peaks at [Hz]:", np.round(peaks, 1))
assert any(abs(p - 272) < 30 for p in peaks)
assert any(abs(p - 695) < 40 for p in peaks)
print("OK — forced response peaks at the passive resonances")
