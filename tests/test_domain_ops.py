"""Domain-algebra and visualization-helper tests: unify/keep
(Meshutils.jl:818-882), color_domains (:1139-1190), vtk_write_tri."""
import numpy as np
import pytest

from wavesandeigenvalues_jl_tpu.mesh import color_domains, vtk_write_tri
from wavesandeigenvalues_jl_tpu.mesh.generate import box_mesh


def test_unify_and_keep():
    mesh = box_mesh(nx=2, ny=2, nz=3)
    n_zmin = len(mesh.domains["Zmin"]["simplices"])
    n_zmax = len(mesh.domains["Zmax"]["simplices"])
    mesh.unify("Ends", "Zmin", "Zmax")
    assert mesh.domains["Ends"]["dimension"] == 2
    assert len(mesh.domains["Ends"]["simplices"]) == n_zmin + n_zmax
    with pytest.raises(ValueError):
        mesh.unify("Bad", "Interior", "Zmin")  # mixed dimension
    mesh.keep("Interior", "Ends")
    assert sorted(mesh.domains) == ["Ends", "Interior"]


def test_color_domains():
    mesh = box_mesh(nx=2, ny=2, nz=3)
    data, surf_keys, vol_keys = color_domains(mesh)
    assert vol_keys == {"Interior": 1}
    assert len(surf_keys) == 6
    # every surface triangle belongs to exactly one face domain
    assert np.all(data["__all_surfaces__"] > 0)
    assert np.all(data["__all_volumes__"] == 1)
    for name, idx in surf_keys.items():
        sel = np.asarray(mesh.domains[name]["simplices"])
        assert np.all(data[name][sel] == idx)


def test_vtk_write_tri_explicit(tmp_path):
    """Direct surface writer: needed when cell counts collide (the
    symmetric-box gotcha: #tris can equal #tets)."""
    mesh = box_mesh(nx=2, ny=2, nz=2)
    assert len(mesh.triangles) == len(mesh.tetrahedra)  # the collision
    field = np.arange(len(mesh.triangles), dtype=float)
    p = vtk_write_tri(str(tmp_path / "surf"), mesh, {"id": field})
    txt = open(p).read()
    assert "UnstructuredGrid" in txt and "id" in txt
