"""Auxiliary-subsystem tests: structured phase timing and mixed-precision
iterative refinement."""
import numpy as np

from wavesandeigenvalues_jl_tpu.ops.linsolve import factorize
from wavesandeigenvalues_jl_tpu.ops.refine import refine
from wavesandeigenvalues_jl_tpu.ops.sparse import CSR
from wavesandeigenvalues_jl_tpu.utils import timing


def test_phase_accumulates_and_nests():
    timing.reset()
    with timing.phase("outer"):
        with timing.phase("inner"):
            pass
        with timing.phase("inner"):
            pass
    rep = timing.report()
    assert rep["outer"]["calls"] == 1
    assert rep["outer.inner"]["calls"] == 2
    assert rep["outer"]["total_s"] >= rep["outer.inner"]["total_s"]
    assert "outer" in timing.format_report()
    timing.reset()
    assert timing.report() == {}


def test_discretize_records_phase():
    from wavesandeigenvalues_jl_tpu.mesh.generate import box_mesh
    from wavesandeigenvalues_jl_tpu.models import discretize
    timing.reset()
    mesh = box_mesh(nx=2, ny=2, nz=2)
    discretize(mesh, {"Interior": ("interior", ())},
               340.0 * np.ones(mesh.n_points))
    rep = timing.report(reset_after=True)
    assert rep["helmholtz.discretize"]["calls"] == 1
    assert rep["helmholtz.discretize"]["total_s"] > 0


def test_refine_recovers_f64_accuracy():
    rng = np.random.default_rng(0)
    n = 200
    A = np.diag(rng.standard_normal(n) + 5.0 + 0j)
    A += 0.3 * (rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n)))
    b = rng.standard_normal(n) + 1j * rng.standard_normal(n)

    def solve32(r):
        # single-precision solver (the device-precision stand-in)
        A32 = A.astype(np.complex64)
        return np.linalg.solve(A32, r.astype(np.complex64))

    x32 = solve32(b).astype(np.complex128)
    res32 = np.linalg.norm(b - A @ x32) / np.linalg.norm(b)
    x, hist = refine(A, b, solve32, iters=5, tol=1e-13)
    res = np.linalg.norm(b - A @ x) / np.linalg.norm(b)
    assert res < 1e-13            # f64-level backward error
    assert res < res32 / 1e4      # orders better than the f32 solve alone
    assert hist[-1] <= hist[0]


def test_refine_with_csr():
    rng = np.random.default_rng(1)
    n = 150
    D = np.diag(rng.standard_normal(n) + 4.0 + 0j)
    A = CSR.from_dense(D)
    b = rng.standard_normal(n) + 0j
    F32 = np.diag(1.0 / np.diag(D).astype(np.complex64))

    x, hist = refine(A, b, lambda r: F32 @ r.astype(np.complex64), iters=6)
    assert np.linalg.norm(b - A @ x) / np.linalg.norm(b) < 1e-13
