"""Core NLEVP engine tests against the reference's published fixtures:
QEP eigenvalue 1/3 and 5-of-6 count (tutorial 00), gallery 1-D Rijke tube,
perturbation/Padé consistency (tutorial 04 semantics at toy scale)."""
import numpy as np
import pytest

from wavesandeigenvalues_jl_tpu.nlevp import (OperatorFamily, Solution, Term,
                                              beyn, conv_radius,
                                              count_poles_and_zeros,
                                              decode_error_flag, gallery,
                                              generate_subspace, householder,
                                              inveriter, lancaster, mslp,
                                              pade, perturb, perturb_fast,
                                              picard, poly_roots, polyval,
                                              project, rf2s, solve, traceiter)
from wavesandeigenvalues_jl_tpu.nlevp.family import AUX_OPERATOR


def test_family_eval_and_derivs():
    T = gallery.qep3()
    z = 3 + 2j
    A2 = np.array([[0, 6, 0], [0, 6, 0], [0, 0, 1]], complex)
    A1 = np.array([[1, -6, 0], [2, -7, 0], [0, 0, 0]], complex)
    A0 = np.eye(3, dtype=complex)
    ref = z ** 2 * A2 + z * A1 + A0
    assert np.allclose(T(z).to_dense(), ref)
    assert np.allclose(T(z, 1).to_dense(), 2 * z * A2 + A1)
    assert np.allclose(T(z, 2).to_dense(), 2 * A2)
    assert np.allclose(T(z, 3).to_dense(), 0 * A2)


def test_term_merging_push():
    A = np.eye(2, dtype=complex)
    from wavesandeigenvalues_jl_tpu.nlevp import pow1
    L = OperatorFamily(["λ"])
    L.push(Term(A, (pow1,), (("λ",),), "λ", "A"))
    L.push(Term(2 * A, (pow1,), (("λ",),), "λ", "A"))
    assert len(L.terms) == 1
    assert np.allclose(L(1.0).to_dense(), 3 * A)
    # cancelling push removes the term
    L.push(Term(-3 * A, (pow1,), (("λ",),), "λ", "A"))
    assert len(L.terms) == 0


def test_mslp_qep_one_third():
    """mslp finds eigenvalue 1/3 from guess 0 in ≤10 its (tutorial_00,
    BASELINE.md: 6 iters at tol=1e-10)."""
    T = gallery.qep3()
    sol, n, flag = mslp(T, 0.0, tol=1e-10, maxiter=10)
    assert abs(sol.params["λ"] - 1.0 / 3.0) < 1e-10
    assert flag == 0
    assert n <= 8


def test_householder_qep():
    T = gallery.qep3()
    sol, n, flag = householder(T, 0.0, tol=1e-10, maxiter=10)
    assert abs(sol.params["λ"] - 1.0 / 3.0) < 1e-10
    # higher-order update must still land on a true eigenvalue
    # (spectrum: ±i, 1/3, 1/2, 1, ∞)
    T2 = gallery.qep3()
    sol2, n2, flag2 = householder(T2, 0.0, tol=1e-10, maxiter=10, order=2)
    spectrum = np.array([1j, -1j, 1 / 3, 0.5, 1.0])
    assert np.min(np.abs(spectrum - sol2.params["λ"])) < 1e-9


def test_beyn_qep_five_of_six():
    """Beyn finds 5 eigenvalues in the square ±2±2i with tiny residuals
    (tutorial_00 docs; BASELINE.md)."""
    T = gallery.qep3()
    Gamma = [-2 - 2j, 2 - 2j, 2 + 2j, -2 + 2j]
    Om, P = beyn(T, Gamma, l=6, N=32)
    # 5 true eigenvalues inside (±i, 1/3, 1/2, 1); with l=6 one spurious
    # value may appear with large residual (tutorial_00: "out of the 6
    # eigenvalues 5 have extremely low residuals")
    good = 0
    for i, lam in enumerate(Om):
        v = P[:, i]
        v = v / np.linalg.norm(v)
        res = np.linalg.norm(T(lam).to_dense() @ v)
        if res < 1e-8:
            good += 1
    assert good == 5
    assert np.min(np.abs(Om - 1.0 / 3.0)) < 1e-10
    for target in (1j, -1j, 0.5, 1.0):
        assert np.min(np.abs(Om - target)) < 1e-8


def test_count_poles_and_zeros_qep():
    T = gallery.qep3()
    Gamma = [-2 - 2j, 2 - 2j, 2 + 2j, -2 + 2j]
    n = count_poles_and_zeros(T, Gamma, N=64)
    assert abs(n - 5.0) < 1e-6


def test_classic_iterations_qep():
    T = gallery.qep3()
    for solver in (inveriter, lancaster, rf2s, traceiter):
        sol, n, flag = solver(T, 0.3, maxiter=30, tol=1e-12)
        assert abs(sol.params["λ"] - 1.0 / 3.0) < 1e-8, solver.__name__


def test_rijke_1d_active_eigenvalue():
    """Gallery 1-D Rijke tube: mslp converges and the eigenpair satisfies
    L(ω)v ≈ 0."""
    L, grid = gallery.rijke_tube(64)
    sol, n, flag = mslp(L, 1.0 + 0.3j, tol=1e-11, maxiter=30)
    om = sol.params["ω"]
    A = L(om).to_dense()
    v = sol.v
    res = np.linalg.norm(A @ v) / np.linalg.norm(v)
    assert res < 1e-8
    assert flag in (0, 2)


def test_perturbation_taylor_vs_exact():
    """Taylor coefficients from the adjoint recurrence reproduce the exact
    eigenvalue trajectory λ(τ) of the 1-D Rijke model (tutorial_04
    semantics)."""
    L, grid = gallery.rijke_tube(48)
    sol, n, flag = mslp(L, 1.0 + 0.3j, tol=1e-12, maxiter=30)
    om0 = sol.params["ω"]
    N = 8
    perturb_fast(sol, L, "τ", N)
    coeffs = sol.eigval_pert["τ/Taylor"]
    assert abs(coeffs[0] - om0) < 1e-12
    dtau = 0.01
    est = polyval(coeffs, dtau)
    L.params["τ"] = L.params["τ"] + dtau
    sol2, _, _ = mslp(L, om0, tol=1e-12, maxiter=30)
    exact = sol2.params["ω"]
    L.params["τ"] = L.params["τ"] - dtau
    assert abs(est - exact) < 1e-9 * max(1.0, abs(exact))


def test_pade_beats_taylor_outside_radius():
    L, grid = gallery.rijke_tube(48)
    sol, _, _ = mslp(L, 1.0 + 0.3j, tol=1e-12, maxiter=30)
    om0 = sol.params["ω"]
    N = 16
    perturb_fast(sol, L, "τ", N)
    coeffs = sol.eigval_pert["τ/Taylor"]
    r = conv_radius(coeffs)[-1]
    dtau = 2.5 * r
    taylor_est = polyval(coeffs, dtau)
    pade_est = sol("τ", L.params["τ"].real + dtau, 8, 8)
    L.params["τ"] = L.params["τ"] + dtau
    sol2, _, _ = mslp(L, om0, tol=1e-12, maxiter=40)
    exact = sol2.params["ω"]
    assert abs(pade_est - exact) < abs(taylor_est - exact)
    assert abs(pade_est - exact) < 1e-3 * abs(exact)


def test_pade_roundtrip():
    # Padé of a rational function is exact: f = (1+2z)/(1-z)
    import math
    taylor = np.array([1.0 + 0j] + [3.0 + 0j] * 10)  # 1 + 3z + 3z² + ...
    a, b = pade(taylor, 1, 1)
    z = 0.7
    assert abs(polyval(a, z) / polyval(b, z) - (1 + 2 * z) / (1 - z)) < 1e-10


def test_poly_roots():
    # roots of z² - 1
    r = np.sort_complex(poly_roots(np.array([-1.0, 0.0, 1.0])))
    assert np.allclose(r, [-1, 1])


def test_orr_sommerfeld_assembles():
    L, y = gallery.orr_sommerfeld(24)
    A = L(1.0 + 0.1j).to_dense()
    assert A.shape == (24, 24)
    assert np.isfinite(A).all()


def test_biharmonic_solves():
    L, x, y = gallery.biharmonic(8)
    sol, n, flag = mslp(L, 100.0, tol=1e-8, maxiter=30)
    lam = sol.params["λ"]
    # eigenvalue of D4 + εP with ε=0: check residual of the pair
    A = L(lam).to_dense()
    assert np.linalg.norm(A @ sol.v) / np.linalg.norm(sol.v) < 1e-6


def test_projection_subspace():
    """generate_subspace + project: the projected family reproduces the
    eigenvalue of the full problem (beyn.jl:429-595)."""
    L, grid = gallery.rijke_tube(48)
    d = L.size
    Y = np.zeros((d, 2), complex)
    Y[0, 0] = 1.0
    Y[1, 1] = 1.0
    # sample points ringing the eigenvalue region near 1+1.07j
    Z = [1.0 + 1.0j + 0.3 * np.exp(2j * np.pi * k / 6) for k in range(6)]
    Q, resnorm = generate_subspace(L, Y, 1e-10, Z)
    P = project(L, Q)
    solp, _, _ = mslp(P, 1.0 + 0.3j, tol=1e-11, maxiter=30)
    sol, _, _ = mslp(L, 1.0 + 0.3j, tol=1e-11, maxiter=30)
    assert Q.shape[1] < L.size  # genuinely reduced
    assert abs(solp.params["ω"] - sol.params["ω"]) < 1e-6


def test_hybrid_solve_qep():
    """Hybrid global-local solve on the QEP: incremental probes + rank-one
    moment deflation find the real eigenvalues 1/3, 1/2, 1 (±i have
    eigenvector e₃ and need the e₂ probe of a later outer cycle)."""
    T = gallery.qep3()
    Gamma = [-2 - 2j, 2 - 2j, 2 + 2j, -2 + 2j]
    eigvals = solve(T, Gamma, dl=2, N=64, tol=1e-9, maxcycles=6,
                    max_outer_cycles=3)
    inside = [k for k, (s, flag_in) in eigvals.items() if flag_in]
    for target in (1 / 3, 0.5, 1.0):
        assert any(abs(om - target) < 1e-8 for om in inside), target
    # residual gate: every accepted value is a true eigenvalue
    for om in inside:
        d = T(om).to_dense()
        assert np.linalg.svd(d, compute_uv=False)[-1] < 1e-7


def test_persistence_roundtrip(tmp_path):
    L, grid = gallery.rijke_tube(32)
    f = tmp_path / "fam.npz"
    L.save(str(f))
    L2 = OperatorFamily.load(str(f))
    z = 1.1 + 0.2j
    assert np.allclose(L(z).to_dense(), L2(z).to_dense())
    assert L2.params.keys() == L.params.keys()


def test_solution_persistence_roundtrip(tmp_path):
    from wavesandeigenvalues_jl_tpu.nlevp import read_solution, save_solution
    L, grid = gallery.rijke_tube(32)
    sol, _, _ = mslp(L, 1.0 + 0.3j, tol=1e-11, maxiter=30)
    perturb_fast(sol, L, "τ", 4)
    f = tmp_path / "sol.npz"
    save_solution(str(f), sol)
    s2 = read_solution(str(f))
    assert abs(s2.params["ω"] - sol.params["ω"]) < 1e-14
    assert np.allclose(s2.eigval_pert["τ/Taylor"], sol.eigval_pert["τ/Taylor"])
    assert np.allclose(s2.v, sol.v)


def test_decode_error_flag():
    assert "converged" in decode_error_flag(0)
    assert "Maximum" in decode_error_flag(1)
    assert "Singular" in decode_error_flag(-2)


def test_moments2eigs_multiblock_K2():
    """Incremental moment blocks with K=2: the multi-block column assembly
    of moments2eigs (solvers.py) against a fresh single-panel run — the
    K-augmentation path (beyn.jl:39,77-83) with len(A) > 1."""
    from wavesandeigenvalues_jl_tpu.nlevp.solvers import (
        compute_moment_matrices, initialize_V, moments2eigs, pos_test)

    T = gallery.qep3()
    Gamma = [-2 - 2j, 2 - 2j, 2 + 2j, -2 + 2j]
    V1 = initialize_V(3, 3)
    rng = np.random.default_rng(1)
    V2 = (rng.standard_normal((3, 3))
          + 1j * rng.standard_normal((3, 3))).astype(complex)
    A1 = compute_moment_matrices(T, Gamma, V1, K=2, N=32)
    A2 = compute_moment_matrices(T, Gamma, V2, K=2, N=32)
    Om, P = moments2eigs([A1, A2], rtol_sigma=1e-10)
    Om, P = pos_test(Om, P, Gamma)
    # the five true QEP eigenvalues inside the square (Betcke et al.):
    # the full-rank two-block probe recovers all of them cleanly
    for om in (1j, -1j, 1.0, 0.5, 1.0 / 3.0):
        assert np.min(np.abs(Om - om)) < 1e-8, om
    assert len(Om) == 5


def test_equilibrated_residual_rejects_corrupted_pair():
    """VERDICT r4 #8: on a Y=1e15-penalty family, the plain
    ‖Lv‖/(‖L‖_F‖v‖) residual is deflated ~13-16 orders of magnitude by
    the penalty rows, so a deliberately corrupted eigenpair passes
    res_tol=0.01; the row-equilibrated metric must REJECT it while
    keeping the true pair."""
    import numpy as np
    from wavesandeigenvalues_jl_tpu.mesh.generate import rijke_mesh
    from wavesandeigenvalues_jl_tpu.models import discretize
    from wavesandeigenvalues_jl_tpu.nlevp import mslp
    from wavesandeigenvalues_jl_tpu.nlevp.solvers import (
        row_equilibrated_residual, verify_eigenpairs)

    mesh = rijke_mesh(n_rings=2, nz_cold=10, nz_hot=10)
    gamma, R, Tu, Tb = 1.4, 287.05, 300.0, 1200.0
    c = mesh.generate_field(
        lambda x, y, z: np.where(z < 0, np.sqrt(gamma * R * Tu),
                                 np.sqrt(gamma * R * Tb)), order="const")
    L = discretize(mesh, {"Interior": ("interior", ()),
                          "Outlet": ("admittance", ("Y", 1e15))}, c)
    sol, _its, flag = mslp(L, 272 * 2 * np.pi, maxiter=30, tol=1e-11)
    assert flag == 0
    om = sol.params[sol.eigval]
    v_true = sol.v / np.linalg.norm(sol.v)

    # corrupt the eigenvector with 5% noise: visible at O(5e-2) in the
    # equilibrated metric, deflated to ~3e-3 in the Frobenius one
    rng = np.random.default_rng(3)
    noise = rng.standard_normal(L.size) + 1j * rng.standard_normal(L.size)
    v_bad = v_true + 0.05 * noise / np.linalg.norm(noise)

    Lz = L(complex(om))
    res_frob_bad = (np.linalg.norm(Lz @ v_bad) / Lz.norm()
                    / np.linalg.norm(v_bad))
    assert res_frob_bad < 0.01          # the OLD metric would accept it
    assert row_equilibrated_residual(Lz, v_bad) > 0.01   # the new rejects
    assert row_equilibrated_residual(Lz, v_true) < 1e-10  # true pair kept

    # and through the user-facing filter
    Om = np.array([om, om])
    P = np.stack([v_true, v_bad], axis=1)
    Om_f, P_f, res = verify_eigenpairs(L, Om, P, res_tol=0.01)
    assert len(Om_f) == 1
    assert np.allclose(P_f[:, 0], v_true)
