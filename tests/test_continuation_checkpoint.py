"""Branch continuation (track_branch) and Beyn quadrature checkpoint/resume
— capabilities the reference lacks (tutorials sweep by hand; no restart
story for long contour runs, SURVEY §5)."""
import numpy as np
import pytest

from wavesandeigenvalues_jl_tpu.nlevp import (beyn, compute_moment_matrices,
                                              gallery, mslp, track_branch)


def test_track_branch_rijke_tau_sweep():
    L, _grid = gallery.rijke_tube(48)
    taus = np.linspace(0.1, 0.6, 6)
    sols, flags = track_branch(L, "τ", taus, 1.0 + 0.3j, order=2,
                               tol=1e-11, maxiter=30)
    assert all(f >= 0 for f in flags)
    oms = np.array([s.params["ω"] for s in sols])
    # the branch is smooth: successive jumps stay far below the eigenvalue
    # spacing (the gallery Rijke modes are O(π) apart)
    steps = np.abs(np.diff(oms))
    assert steps.max() < 0.5
    # endpoint agrees with an independently seeded solve at the same τ
    L.params["τ"] = taus[-1]
    ref, _, flag = mslp(L, oms[-1], tol=1e-12, maxiter=30)
    assert flag >= 0
    assert abs(ref.params["ω"] - oms[-1]) < 1e-8


def test_track_branch_survives_failures():
    L, _grid = gallery.rijke_tube(32)

    calls = {"n": 0}

    def flaky(Lf, z, tol, maxiter, output=False):
        calls["n"] += 1
        if calls["n"] == 2:  # fail exactly at the second sweep point
            from wavesandeigenvalues_jl_tpu.nlevp.family import Solution
            return Solution(Lf.params, None, None, Lf.eigval), 0, -5
        return mslp(Lf, z, tol=tol, maxiter=maxiter, output=output)

    sols, flags = track_branch(L, "τ", [0.1, 0.2, 0.3], 1.0 + 0.3j,
                               solver=flaky, tol=1e-10)
    assert flags[1] < 0 and sols[1] is None
    assert flags[0] >= 0 and flags[2] >= 0 and sols[2] is not None


class _Interruptible:
    """Wrap a family; raise after ``limit`` evaluations at derivative 0."""

    def __init__(self, L, limit):
        self.L = L
        self.limit = limit
        self.calls = 0

    @property
    def size(self):
        return self.L.size

    def __getattr__(self, name):  # delegate params/terms/eigval/... for
        return getattr(self.L, name)  # the checkpoint digest

    def __call__(self, *args, **kwargs):
        if len(args) == 1:  # the factorized L(z) inside the node loop
            self.calls += 1
            if self.calls > self.limit:
                raise KeyboardInterrupt("simulated preemption")
        return self.L(*args, **kwargs)


def test_moment_checkpoint_resume(tmp_path):
    L, _grid = gallery.rijke_tube(24)
    L.params["τ"] = 0.2
    Gamma = [1.0 - 0.5j, 3.0 - 0.5j, 3.0 + 1.0j, 1.0 + 1.0j]
    ck = str(tmp_path / "moments.npz")

    A_ref = compute_moment_matrices(L, Gamma, l=3, K=1, N=8)

    wrapped = _Interruptible(L, limit=10)
    with pytest.raises(KeyboardInterrupt):
        compute_moment_matrices(wrapped, Gamma, l=3, K=1, N=8,
                                checkpoint=ck, checkpoint_every=4)
    # partial state was persisted
    with np.load(ck, allow_pickle=False) as z:
        assert 0 < int(z["next"]) < 4 * 8

    resumed = _Interruptible(L, limit=10 ** 9)
    A = compute_moment_matrices(resumed, Gamma, l=3, K=1, N=8,
                                checkpoint=ck, checkpoint_every=4)
    assert np.allclose(A, A_ref, atol=1e-12)
    # the resumed run did strictly fewer node solves than the full contour
    assert resumed.calls < 4 * 8


def test_moment_checkpoint_digest_mismatch(tmp_path):
    L, _grid = gallery.rijke_tube(24)
    L.params["τ"] = 0.2
    Gamma = [1.0 - 0.5j, 3.0 - 0.5j, 3.0 + 1.0j, 1.0 + 1.0j]
    ck = str(tmp_path / "moments.npz")
    compute_moment_matrices(L, Gamma, l=3, K=1, N=8, checkpoint=ck)
    # different quadrature order → stale checkpoint must be ignored
    A16 = compute_moment_matrices(L, Gamma, l=3, K=1, N=16, checkpoint=ck)
    A16_ref = compute_moment_matrices(L, Gamma, l=3, K=1, N=16)
    assert np.allclose(A16, A16_ref, atol=1e-12)


def test_moment_checkpoint_param_change_invalidates(tmp_path):
    """Changing a family parameter (e.g. τ) must invalidate the checkpoint:
    resuming stale moments silently returns wrong eigenvalues otherwise
    (round-1 advisor finding on the digest scope)."""
    L, _grid = gallery.rijke_tube(24)
    L.params["τ"] = 0.2
    Gamma = [1.0 - 0.5j, 3.0 - 0.5j, 3.0 + 1.0j, 1.0 + 1.0j]
    ck = str(tmp_path / "moments.npz")
    compute_moment_matrices(L, Gamma, l=3, K=1, N=8, checkpoint=ck)
    L.params["τ"] = 0.35
    A = compute_moment_matrices(L, Gamma, l=3, K=1, N=8, checkpoint=ck)
    A_ref = compute_moment_matrices(L, Gamma, l=3, K=1, N=8)
    assert np.allclose(A, A_ref, atol=1e-12)
    # but an untouched family still resumes: same digest, instant return
    wrapped = _Interruptible(L, limit=0)
    A2 = compute_moment_matrices(wrapped, Gamma, l=3, K=1, N=8,
                                 checkpoint=ck)
    assert wrapped.calls == 0 and np.allclose(A2, A_ref, atol=1e-12)


def test_beyn_checkpoint_kwarg(tmp_path):
    """beyn(checkpoint=...) produces the same eigenvalues as without."""
    T = gallery.qep3()
    Gamma = [-2 - 2j, 2 - 2j, 2 + 2j, -2 + 2j]
    Om1, _ = beyn(T, Gamma, l=6, N=32)
    Om2, _ = beyn(T, Gamma, l=6, N=32,
                  checkpoint=str(tmp_path / "b.npz"))
    assert np.allclose(np.sort_complex(Om1), np.sort_complex(Om2))
