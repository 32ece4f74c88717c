"""State-space (vector) fitting tests: exact rational recovery, analytic
derivatives, delay-band approximation, end-to-end flame usage."""
import numpy as np

from wavesandeigenvalues_jl_tpu.nlevp import mslp
from wavesandeigenvalues_jl_tpu.nlevp.fitting import fit_state_space

FREQS = np.linspace(20, 400, 80)


def _rational(w):
    s = 1j * w
    return 2 / (s + 60) + (3 + 1j) / (s - (-40 + 900j)) + 0.2


def test_exact_rational_recovery():
    data = _rational(2 * np.pi * FREQS)
    ss, fitted = fit_state_space(FREQS, data, order=4)
    assert np.abs(fitted - data).max() / np.abs(data).max() < 1e-10
    # poles stable (s-plane)
    assert np.all(np.linalg.eigvals(ss.A).real < 0)


def test_fitted_derivatives_analytic():
    data = _rational(2 * np.pi * FREQS)
    ss, _ = fit_state_space(FREQS, data, order=4)
    w0 = 2 * np.pi * 123.0
    h = 1e-4
    # tolerances bounded by the FD truncation error, not the model
    for k, fd, tol in [
            (1, (_rational(w0 + h) - _rational(w0 - h)) / (2 * h), 1e-6),
            (2, (_rational(w0 + h) - 2 * _rational(w0)
                 + _rational(w0 - h)) / h ** 2, 1e-3)]:
        an = ss.eval((w0,), (k,))
        assert abs(an - fd) < tol * max(abs(fd), 1e-12), (k, an, fd)


def test_delay_band_fit():
    """A pure delay exp(-iωτ) (the n-τ FTF) is approximated to ~1e-6 over
    the sampled band by a 10th-order stable rational model."""
    tau = 1.2e-3
    data = np.exp(-1j * 2 * np.pi * FREQS * tau)
    ss, fitted = fit_state_space(FREQS, data, order=10)
    assert np.abs(fitted - data).max() < 1e-5


def test_fitted_ftf_drives_flame():
    """A fitted FTF plugs into the :flame descriptor and reproduces the
    built-in n-τ eigenvalue (the tutorial-08 equivalence, now through the
    fitted state-space path)."""
    from wavesandeigenvalues_jl_tpu.mesh.generate import rijke_mesh
    from wavesandeigenvalues_jl_tpu.models import discretize

    mesh = rijke_mesh(n_rings=2, nz_cold=12, nz_hot=12)
    gamma, R, Tu, Tb, P0, rho = 1.4, 287.05, 300.0, 1200.0, 101325.0, 1.225
    c = mesh.generate_field(lambda x, y, z: np.where(
        z < 0, np.sqrt(gamma * R * Tu), np.sqrt(gamma * R * Tb)))
    Q02U0 = P0 * (Tb / Tu - 1) * np.pi * 0.025 ** 2 * gamma / (gamma - 1)
    x_ref, n_ref = [0.0, 0.0, -0.0012], [0.0, 0.0, 1.0]

    tau = 1e-3
    freqs = np.linspace(100, 600, 120)
    ss, _ = fit_state_space(freqs, np.exp(-1j * 2 * np.pi * freqs * tau),
                            order=12)
    base = {"Interior": ("interior", ()), "Outlet": ("admittance", ("Y", 1e15))}
    L1 = discretize(mesh, {**base, "Flame": ("flame", (
        gamma, rho, Q02U0, x_ref, n_ref, "n", "τ", 1.0, tau))}, c)
    L2 = discretize(mesh, {**base, "Flame": ("flame", (
        gamma, rho, Q02U0, x_ref, n_ref, ss))}, c)
    om1 = mslp(L1, 340 * 2 * np.pi, maxiter=20, tol=1e-10)[0].params["ω"]
    om2 = mslp(L2, 340 * 2 * np.pi, maxiter=20, tol=1e-10)[0].params["ω"]
    assert abs(om1 - om2) < 1e-3 * abs(om1)
