"""Interop with the reference's Julia-enriched TOML persistence
(LinOpFam.jl:196-294, save.jl, toml.jl): safe parsing of reference-written
files, bidirectional round-trips, and the revived dead solvers
(mehrmann.jl, excluded at NLEVP.jl:17)."""
import numpy as np

from wavesandeigenvalues_jl_tpu.nlevp import (gallery, guettel, juniper,
                                              load_family_toml,
                                              load_solution_toml, mehrmann,
                                              perturb_fast, read_toml,
                                              save_family_toml,
                                              save_solution_toml)
from wavesandeigenvalues_jl_tpu.nlevp.toml_compat import _Parser

# A verbatim emulation of the reference writer's output quirks
# (save, LinOpFam.jl:231-294): Julia complex printing with spaces and *im,
# multiline params lists, typed V arrays, 1-based indices.
_REF_FAMILY = """# LinearOperatorFamily version 0
#2020-01-01T00:00:00
#+ωA+exp(-iωτ)B
params=[(:ω,NaN + NaN*im),
(:τ,0.001 + 0.0*im),
(:λ,Inf + 0.0*im),
]
eigval=:ω
auxval=:λ
[terms]
\t[terms.1]
\tfunctions=(pow1,)
\tsymbol="ω"
\tparams=((:ω,),)
\toperator="A"
\tsize=[2,2]
\t\t[terms.1.sparse_matrix]
\t\tI=[1, 2]
\t\tJ=[1, 2]
\t\tV=Complex{Float64}[1.0+0.0im,-2.0-3.0im,]

\t[terms.2]
\tfunctions=(exp_delay,)
\tsymbol="exp(-iωτ)"
\tparams=((:ω, :τ),)
\toperator="B"
\tsize=[2,2]
\t\t[terms.2.sparse_matrix]
\t\tI=[1]
\t\tJ=[2]
\t\tV=Complex{Float64}[0.5+0.25im,]
"""


def test_parse_julia_literals():
    p = lambda s: _Parser(s).parse_value()
    assert p(":ω") == "ω"
    assert p("(:ω, :τ)") == ("ω", "τ")
    assert p("[1, 2, 3]") == [1, 2, 3]
    assert p("NaN + NaN*im") != p("NaN + NaN*im") or True  # NaN parses
    z = p("1.0e+15-2.5im")
    assert z == complex(1.0e15, -2.5)
    assert p("Complex{Float64}[1.0+0.0im,-1.0-1.0im,]") == [1 + 0j, -1 - 1j]
    assert p('"exp(-iωτ)"') == "exp(-iωτ)"
    assert p("(pow1,)") == ("pow1",)
    assert p("()") == ()


def test_load_reference_written_family(tmp_path):
    fname = tmp_path / "fam.toml"
    fname.write_text(_REF_FAMILY, encoding="utf-8")
    L = load_family_toml(str(fname))
    assert L.eigval == "ω" and L.auxval == "λ"
    assert np.isnan(L.params["ω"].real) and L.params["τ"] == 0.001
    z, tau = 2.0 + 1.0j, 0.001
    A = np.array([[1, 0], [0, -2 - 3j]], complex)
    B = np.array([[0, 0.5 + 0.25j], [0, 0]], complex)
    L.params["τ"] = tau
    ref = z * A + np.exp(-1j * z * tau) * B
    assert np.allclose(L(z).to_dense(), ref, atol=1e-14)
    # analytic ω-derivative through the loaded coefficient functions
    dref = A + (-1j * tau) * np.exp(-1j * z * tau) * B
    assert np.allclose(L(z, 1).to_dense(), dref, atol=1e-14)


def test_family_toml_roundtrip(tmp_path):
    L, _grid = gallery.rijke_tube(15)
    L.params["n"], L.params["τ"] = 1.0, 0.2
    fname = str(tmp_path / "rijke.toml")
    save_family_toml(fname, L)
    L2 = load_family_toml(fname)
    z = 5.0 + 0.5j
    L2.params["n"], L2.params["τ"] = 1.0, 0.2
    assert np.allclose(L2(z).to_dense(), L(z).to_dense(), atol=1e-12)
    assert np.allclose(L2(z, 1).to_dense(), L(z, 1).to_dense(), atol=1e-12)
    assert set(L2.params) == set(L.params)


def test_solution_toml_roundtrip(tmp_path):
    from wavesandeigenvalues_jl_tpu.nlevp import mslp

    L, _grid = gallery.rijke_tube(32)
    sol, _, flag = mslp(L, 1.0 + 0.3j, tol=1e-12, maxiter=30)
    assert flag >= 0
    perturb_fast(sol, L, "τ", 4)  # populate τ/Taylor series
    fname = str(tmp_path / "sol.toml")
    save_solution_toml(fname, sol)
    s2 = load_solution_toml(fname)
    assert abs(s2.params["ω"] - sol.params["ω"]) < 1e-14
    assert np.allclose(s2.v, sol.v)
    key = "τ/Taylor"
    assert np.allclose(np.asarray(s2.eigval_pert[key]),
                       np.asarray(sol.eigval_pert[key]))
    assert np.allclose(np.stack(s2.v_pert[key]), np.stack(sol.v_pert[key]))


def test_read_toml_tolerates_stray_bracket(tmp_path):
    # the reference writer emits a stray "]" line after v (save.jl:14-16);
    # its own parser skips it and so must ours
    fname = tmp_path / "s.toml"
    fname.write_text("a=1\nv=[1.0+0.0im,]\n]\nb=2\n", encoding="utf-8")
    D = read_toml(str(fname))
    assert D["a"] == 1 and D["b"] == 2 and D["v"] == [1 + 0j]


def test_unsolved_family_nonfinite_julia_parseable(tmp_path):
    """Fresh families carry ω=NaN+NaN·im and λ=Inf; the writer must emit
    '*im' so Julia's eval-based loader (toml.jl:52) can parse them —
    'NaNim'/'Infim' are undefined identifiers there (round-1 advisor)."""
    L, _grid = gallery.rijke_tube(8)
    L.params["ω"] = complex(float("nan"), float("nan"))
    L.params["λ"] = complex(float("inf"), 0.0)
    fname = str(tmp_path / "fresh.toml")
    save_family_toml(fname, L)
    text = open(fname, encoding="utf-8").read()
    import re
    for bad in re.findall(r"(?:NaN|Inf)[^*\s,)]*im", text):
        assert False, f"non-Julia-parseable literal {bad!r}"
    assert "*im" in text
    L2 = load_family_toml(fname)
    assert np.isnan(L2.params["ω"].real)


def test_adjointless_solution_roundtrip(tmp_path):
    """Solutions without an adjoint vector (inveriter/lancaster/picard)
    must save as 'Complex{Float64}[]' (not the Julia-syntax-error '[,]')
    and load back with v_adj=None (round-1 advisor)."""
    from wavesandeigenvalues_jl_tpu.nlevp import inveriter

    T = gallery.qep3()
    sol, _, flag = inveriter(T, 0.2, maxiter=40, tol=1e-11)
    assert flag >= 0 and sol.v_adj is None
    fname = str(tmp_path / "noadj.toml")
    save_solution_toml(fname, sol)
    text = open(fname, encoding="utf-8").read()
    assert "[,]" not in text and "Complex{Float64}[]" in text
    s2 = load_solution_toml(fname)
    assert s2.v_adj is None
    assert np.allclose(s2.v, sol.v)
    assert abs(s2.params["λ"] - sol.params["λ"]) < 1e-14


def test_revived_dead_solvers_qep():
    """mehrmann/juniper/guettel (dead code in the reference, mehrmann.jl)
    as working solvers: eigenvalue 1/3 of the NLEVP-collection QEP."""
    for solver in (mehrmann, juniper, guettel):
        T = gallery.qep3()
        sol, n, flag = solver(T, 0.2, maxiter=40, tol=1e-11, output=False)
        assert flag >= 0, solver.__name__
        assert abs(sol.params["λ"] - 1.0 / 3.0) < 1e-9, solver.__name__
    # mehrmann additionally returns the left eigenvector for solve's
    # moment deflation: check it is a genuine adjoint null vector
    T = gallery.qep3()
    sol, _, _ = mehrmann(T, 0.2, maxiter=40, tol=1e-12, output=False)
    if sol.v_adj is not None:
        Lz = T(sol.params["λ"]).to_dense()
        r = np.linalg.norm(sol.v_adj.conj() @ Lz) / np.linalg.norm(Lz)
        assert r < 1e-6
