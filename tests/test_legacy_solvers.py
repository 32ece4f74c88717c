"""Coverage for the legacy/auxiliary solver paths: nicoud, picard,
padesolve and perturb_norm on the gallery 1-D Rijke fixture."""
import numpy as np
import pytest

from wavesandeigenvalues_jl_tpu.nlevp import (gallery, mslp, nicoud,
                                              padesolve, perturb_norm,
                                              picard, polyval)


@pytest.fixture(scope="module")
def rijke():
    L, grid = gallery.rijke_tube(96)
    sol, _, flag = mslp(L, 1.0 + 0.3j, maxiter=30, tol=1e-12)
    assert flag in (0, 2)
    return L, sol.params["ω"]


def test_padesolve_converges(rijke):
    L, om_ref = rijke
    sol, n, flag = padesolve(L, 1.0 + 0.3j, maxiter=30, tol=1e-11, order=2,
                             num_order=1)
    assert abs(sol.params["ω"] - om_ref) < 1e-8
    assert flag in (0, 2)


def test_nicoud_fixed_point(rijke):
    """Companion-linearization fixed point (nicoud.jl): converges to the
    same eigenvalue from a nearby start using the M/K/C/Q label filter.
    The delayed flame makes the full-step iteration oscillate, so
    under-relaxation is required (as in the reference's usage)."""
    L, om_ref = rijke
    sol, n, flag = nicoud(L, om_ref * 1.02, maxiter=80, tol=1e-10,
                          relax=0.5)
    assert flag >= 0
    assert abs(sol.params["ω"] - om_ref) < 1e-7 * abs(om_ref)


def test_picard_fixed_point(rijke):
    L, om_ref = rijke
    sol, n, flag = picard(L, om_ref * 1.02, maxiter=80, tol=1e-10,
                          relax=0.5)
    assert flag >= 0
    assert abs(sol.params["ω"] - om_ref) < 1e-6 * abs(om_ref)


def test_perturb_norm_matches_perturb(rijke):
    """The Y-weighted series reproduces the same eigenvalue trajectory as
    the plain adjoint recurrence (different eigenvector normalization,
    identical eigenvalue coefficients up to truncation)."""
    L, om_ref = rijke
    sol, _, _ = mslp(L, om_ref, maxiter=10, tol=1e-12)
    from wavesandeigenvalues_jl_tpu.nlevp import perturb_fast
    perturb_fast(sol, L, "τ", 6)
    c_fast = np.array(sol.eigval_pert["τ/Taylor"])
    sol2, _, _ = mslp(L, om_ref, maxiter=10, tol=1e-12)
    perturb_norm(sol2, L, "τ", 6)
    c_norm = np.array(sol2.eigval_pert["τ/Taylor"])
    dtau = 0.005
    assert abs(polyval(c_fast, dtau) - polyval(c_norm, dtau)) \
        < 1e-8 * abs(polyval(c_fast, dtau))
