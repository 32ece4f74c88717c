"""Mesh-tooling tests: octosplit refinement (C14), VTU writer (C17),
field getters (C20), ANSYS fluent reader.  Assertion style follows the
reference's cross-consistency checks (SURVEY.md §4)."""
import xml.etree.ElementTree as ET

import numpy as np
import pytest

from wavesandeigenvalues_jl_tpu.fem import get_n_grad_p, get_p
from wavesandeigenvalues_jl_tpu.fem.assembly import aggregate_elements
from wavesandeigenvalues_jl_tpu.mesh import (Mesh, octosplit, read_ansys,
                                             vtk_write)
from wavesandeigenvalues_jl_tpu.mesh.generate import box_mesh


# --- octosplit ---------------------------------------------------------------

def test_octosplit_counts_and_volume():
    m = box_mesh(nx=2, ny=2, nz=2)
    m.collect_lines()
    n_t, n_s, n_l, n_p = (len(m.tetrahedra), len(m.triangles),
                          len(m.lines), m.n_points)
    r = octosplit(m)
    assert len(r.tetrahedra) == 8 * n_t
    assert len(r.triangles) == 4 * n_s
    assert r.n_points == n_p + n_l
    assert np.isclose(r.tet_volumes().sum(), m.tet_volumes().sum())
    # every child tet has positive volume
    assert r.tet_volumes().min() > 0


def test_octosplit_domains_preserved():
    m = box_mesh(nx=2, ny=2, nz=3)
    r = octosplit(m)
    for dom in ("Interior", "Zmin", "Zmax", "Xmin"):
        assert np.isclose(r.compute_size(dom), m.compute_size(dom)), dom
    assert len(r.domains["Interior"]["simplices"]) == \
        8 * len(m.domains["Interior"]["simplices"])


def test_octosplit_twice():
    m = box_mesh(nx=1, ny=1, nz=1)
    r = octosplit(octosplit(m))
    assert len(r.tetrahedra) == 64 * len(m.tetrahedra)
    assert np.isclose(r.tet_volumes().sum(), 1.0)


# --- getters ----------------------------------------------------------------

def test_get_p_linear_field():
    m = box_mesh(nx=3, ny=3, nz=3)
    x, y, z = m.points
    sol = 1.0 + 2.0 * x + 3.0 * y + 4.0 * z
    pt = np.array([0.37, 0.21, 0.55])
    assert np.isclose(get_p(m, sol, pt), 1 + 2 * .37 + 3 * .21 + 4 * .55)
    n = np.array([1.0, -1.0, 0.5])
    assert np.isclose(get_n_grad_p(m, sol, pt, n), 2 - 3 + 2.0)


def test_get_p_quadratic_field():
    m = box_mesh(nx=2, ny=2, nz=2)
    _, _, dim = aggregate_elements(m, "quad")
    mids = 0.5 * (m.points[:, m.lines[:, 0]] + m.points[:, m.lines[:, 1]])
    nodes = np.concatenate([m.points, mids], axis=1)
    f = lambda p: p[0] ** 2 + p[1] * p[2] - 2 * p[2] ** 2 + p[0]
    sol = f(nodes)
    assert len(sol) == dim
    pt = np.array([0.63, 0.44, 0.17])
    assert np.isclose(get_p(m, sol, pt), f(pt))
    # gradient of the quadratic: (2x+1, z, y-4z)
    g = np.array([2 * pt[0] + 1, pt[2], pt[1] - 4 * pt[2]])
    n = np.array([0.3, -0.8, 0.52])
    assert np.isclose(get_n_grad_p(m, sol, pt, n), g @ n)


# --- vtk --------------------------------------------------------------------

def _read_arrays(path):
    root = ET.parse(path).getroot()
    out = {}
    for da in root.iter("DataArray"):
        vals = np.array([float(v) for v in da.text.split()])
        out[da.get("Name")] = vals
    return out


def test_vtk_write_dispatch(tmp_path):
    m = box_mesh(nx=2, ny=2, nz=3)  # all four data lengths distinct
    m.collect_lines()
    base = str(tmp_path / "out")
    p_lin = np.arange(m.n_points, dtype=float)
    p_cell = np.arange(len(m.tetrahedra), dtype=float)
    p_quad = np.arange(m.n_points + len(m.lines)) * (1.0 + 2.0j)
    p_tri = np.arange(len(m.triangles), dtype=float)
    files = vtk_write(base, m, {"a": p_lin, "b": p_cell,
                                "c": p_quad, "d": p_tri})
    assert sorted(files) == [base + "_const.vtu", base + "_lin.vtu",
                             base + "_quad.vtu", base + "_tri.vtu"]
    lin = _read_arrays(base + "_lin.vtu")
    assert np.allclose(lin["a"], p_lin)
    quad = _read_arrays(base + "_quad.vtu")
    assert np.allclose(quad["c.real"], p_quad.real)
    assert np.allclose(quad["c.imag"], p_quad.imag)
    # connectivity indices stay in range
    assert quad["connectivity"].max() < m.n_points + len(m.lines)


def test_vtk_write_binary(tmp_path):
    m = box_mesh(nx=1, ny=1, nz=1)
    base = str(tmp_path / "bin")
    files = vtk_write(base, m, {"a": np.arange(m.n_points, dtype=float)},
                      fmt="binary")
    txt = open(files[0]).read()
    assert 'format="binary"' in txt
    ET.parse(files[0])  # well-formed XML


def test_vtk_write_compressed_roundtrip(tmp_path):
    """zlib block compression (implements the reference's stub,
    vtk_write.jl:410): decode the block table + payload back to the field."""
    import base64
    import struct
    import zlib

    m = box_mesh(nx=1, ny=1, nz=1)
    field = np.arange(m.n_points, dtype=float) * np.pi
    base = str(tmp_path / "comp")
    files = vtk_write(base, m, {"a": field}, fmt="compressed")
    root = ET.parse(files[0]).getroot()
    assert root.get("compressor") == "vtkZLibDataCompressor"
    da = [e for e in root.iter("DataArray") if e.get("Name") == "a"][0]
    assert da.get("format") == "binary"
    b64 = da.text.strip()
    # UInt32 block table [nblocks, blocksize, lastblock, compsize] is
    # base64-encoded separately from the payload
    header = struct.unpack("<4I", base64.b64decode(b64[:24])[:16])
    nblocks, blocksize, lastblock, compsize = header
    assert nblocks == 1 and blocksize == lastblock == field.nbytes
    comp = base64.b64decode(b64[24:])
    assert len(comp) == compsize
    payload = zlib.decompress(comp)
    assert len(payload) == field.nbytes
    out = np.frombuffer(payload, dtype=np.float64)
    assert np.array_equal(out, field)


def test_vtk_bad_length(tmp_path):
    m = box_mesh(nx=1, ny=1, nz=1)
    with pytest.raises(ValueError):
        vtk_write(str(tmp_path / "x"), m, {"a": np.zeros(3)})


# --- ANSYS fluent reader -----------------------------------------------------

FLUENT_TET = """\
(10 (0 1 4 0 3))
(10 (1 1 4 1 3)(
0.0 0.0 0.0
1.0 0.0 0.0
0.0 1.0 0.0
0.0 0.0 1.0
))
(12 (0 1 1 0))
(12 (2 1 1 1 2))
(13 (0 1 4 0))
(13 (3 1 4 3 3)(
1 2 3 1 0
1 2 4 1 0
1 3 4 1 0
2 3 4 1 0
))
(45 (2 fluid volume)())
(45 (3 wall walls)())
"""


def test_read_ansys_single_tet(tmp_path):
    p = tmp_path / "one.cas"
    p.write_text(FLUENT_TET)
    points, lines, tris, tets, domains = read_ansys(str(p))
    m = Mesh.from_raw(points, lines, tris, tets, domains)
    assert m.n_points == 4
    assert len(m.tetrahedra) == 1
    assert len(m.triangles) == 4
    assert set(domains) == {"volume", "walls"}
    assert domains["volume"]["dimension"] == 3
    assert domains["walls"]["dimension"] == 2
    assert np.isclose(m.compute_size("volume"), 1 / 6)
