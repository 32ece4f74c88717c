"""Tutorial 07 — Bloch periodicity for annular geometries.

Counterpart of tutorial_07_Bloch_periodicity
(/root/reference/docs/src/tutorial_07_Bloch_periodicity.md): a combustor
annulus with DOS-fold discrete rotational symmetry is solved on ONE unit
cell with Bloch-phase-twisted periodic coupling — same eigenvalues as the
DOS×-larger full-annulus model at a fraction of the cost, and the Bloch
wavenumber b doubles as an azimuthal mode-order filter.

Uses the reference's NTNU half-cell mesh when present, else a generated
annular half cell.

Run:  PYTHONPATH=. JAX_PLATFORMS=cpu python examples/tutorial_07_bloch_periodicity.py
"""
import os
import time

import numpy as np

from wavesandeigenvalues_jl_tpu.mesh import extend_mesh, read_mesh, vtk_write
from wavesandeigenvalues_jl_tpu.mesh.annular import bloch_expand
from wavesandeigenvalues_jl_tpu.mesh.generate import annular_halfcell
from wavesandeigenvalues_jl_tpu.models import discretize
from wavesandeigenvalues_jl_tpu.nlevp import mslp

half = annular_halfcell(DOS=8, nr=2, nphi=2, nz=6)
doms = [("Interior", "full"), ("Outlet", "full")]
unit = extend_mesh(half, doms, unit=True)    # half cell + mirror image
full = extend_mesh(half, doms, unit=False)   # all DOS sectors
print(f"unit cell: {unit.n_points} pts | full annulus: {full.n_points} pts "
      f"(DOS = {unit.dos.DOS})")

dscrp = {"Interior": ("interior", ()), "Outlet": ("admittance", ("Y", 1e15))}
c_u = unit.generate_field(lambda x, y, z: 340.0 * np.ones_like(z))
c_f = full.generate_field(lambda x, y, z: 340.0 * np.ones_like(z))

# b=:b activates Bloch assembly: each operator splits into interior /
# +shift / −shift terms with exp(±ibΔϕ) coefficient functions
l_unit = discretize(unit, dscrp, c_u, b="b")
L_full = discretize(full, dscrp, c_f)

for b, guess_hz in ((0, 170.0), (1, 300.0)):
    l_unit.params["b"] = float(b)
    t0 = time.time()
    sol_u, _, _ = mslp(l_unit, guess_hz, tol=1e-11, scale=2 * np.pi,
                       maxiter=25)
    t_unit = time.time() - t0
    f_u = sol_u.params["ω"] / 2 / np.pi
    t0 = time.time()
    sol_f, _, _ = mslp(L_full, f_u.real, tol=1e-11, scale=2 * np.pi,
                       maxiter=25)
    t_full = time.time() - t0
    f_f = sol_f.params["ω"] / 2 / np.pi
    print(f"b={b}:  unit {f_u.real:.4f} Hz ({t_unit:.2f}s) == "
          f"full {f_f.real:.4f} Hz ({t_full:.2f}s)")
    assert abs(f_u - f_f) < 1e-3 * abs(f_f)

# expand the unit-cell eigenvector to the full annulus for visualization:
# v_s = v·exp(2πi·b·s/DOS) per sector
v_full = bloch_expand(unit, sol_u, "b")
vtk_write("annulus_mode", full, {"abs(p)": np.abs(v_full)})
print("wrote annulus_mode_lin.vtu")

# the reference's NTNU_12 industrial half-cell mesh, if available:
# reproduce the tutorial-07 headline — the plenum-dominant first-order
# mode ≈1124 Hz (Indlekofer et al.), identical on unit cell and annulus
NTNU = "/root/reference/docs/src/NTNU_12.msh"
if os.path.exists(NTNU):
    ntnu = read_mesh(NTNU)
    print(f"\nNTNU half cell: {ntnu.n_points} pts, "
          f"domains {sorted(ntnu.domains)[:6]}…")
    doms = [("Interior", "full"), ("Inlet", "full"),
            ("Outlet_high", "full"), ("Outlet_low", "full"),
            ("Flame", "unit")]
    nunit = extend_mesh(ntnu, doms, unit=True)
    sos = lambda x, y, z: np.where(z < 0.415, 347.0, 850.0)
    ndscrp = {"Interior": ("interior", ()),
              "Outlet_high": ("admittance", ("Y_in", 0.0)),
              "Outlet_low": ("admittance", ("Y_out", 0.0))}
    ln = discretize(nunit, ndscrp,
                    nunit.generate_field(sos, order="const"), b="b")
    ln.params["b"] = 1.0
    sol_n, _, _ = mslp(ln, 1124.0, tol=1e-10, scale=2 * np.pi, maxiter=20)
    f_n = sol_n.params["ω"].real / 2 / np.pi
    print(f"NTNU unit-cell b=1 mode: {f_n:.2f} Hz (literature ≈1124 Hz)")
    assert abs(f_n - 1123.61) < 0.05

    # the azimuthal mode FAMILY b = 0..DOS-1 (tutorial_07…md:119-130):
    # the reference re-runs the solver DOS times; on the union pattern a
    # change of b is only a coefficient change, so the whole family runs
    # as ONE batched device iteration (nlevp/bloch_sweep.py)
    import time as _time
    from wavesandeigenvalues_jl_tpu.nlevp.bloch_sweep import bloch_mode_sweep
    bvals = list(range(nunit.dos.DOS // 2 + 1))     # 0..6 (b and DOS-b pair)
    t0 = _time.time()
    fam = bloch_mode_sweep(ln, 1124.0, [float(b) for b in bvals],
                           tol=1e-10, scale=2 * np.pi, maxiter=25)
    t_batched = _time.time() - t0
    t0 = _time.time()
    serial = []
    for b in bvals:
        ln.params["b"] = float(b)
        s_b, _, _ = mslp(ln, 1124.0, tol=1e-10, scale=2 * np.pi, maxiter=25)
        serial.append(s_b.params["ω"])
    t_serial = _time.time() - t0
    print(f"azimuthal family (batched sweep {t_batched:.1f}s vs serial "
          f"{t_serial:.1f}s — the batched dense LU wins on DEVICE, a "
          f"2-core CPU run inverts the comparison):")
    for b, (s_b, _, _), om_s in zip(bvals, fam, serial):
        f_b = s_b.params["ω"].real / 2 / np.pi
        print(f"  b={b}: {f_b:9.2f} Hz   (serial: {om_s.real/2/np.pi:9.2f})")
        if b == 0:
            # at b=0 the pure-Neumann unit cell has the trivial constant
            # mode at ω≈0 — both solvers land on it; a relative
            # comparison at |ω|≈0 is meaningless
            assert abs(s_b.params["ω"]) / 2 / np.pi < 1.0
            assert abs(om_s) / 2 / np.pi < 1.0
        else:
            assert abs(s_b.params["ω"] - om_s) < 1e-5 * abs(om_s)
print("OK")
