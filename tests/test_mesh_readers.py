"""Mesh reader tests from synthesized fixture files: gmsh v2.2, gmsh v4.1
and Nastran bulk, all describing the same unit tetrahedron with one
surface domain and one volume domain."""
import numpy as np
import pytest

from wavesandeigenvalues_jl_tpu.mesh import read_mesh

PTS = [(0.0, 0.0, 0.0), (1.0, 0.0, 0.0), (0.0, 1.0, 0.0), (0.0, 0.0, 1.0)]

MSH2 = """$MeshFormat
2.2 0 8
$EndMeshFormat
$PhysicalNames
2
2 1 "Wall"
3 2 "Interior"
$EndPhysicalNames
$Nodes
4
1 0 0 0
2 1 0 0
3 0 1 0
4 0 0 1
$EndNodes
$Elements
2
1 2 2 1 1 1 2 3
2 4 2 2 2 1 2 3 4
$EndElements
"""

MSH4 = """$MeshFormat
4.1 0 8
$EndMeshFormat
$PhysicalNames
2
2 1 "Wall"
3 2 "Interior"
$EndPhysicalNames
$Entities
0 0 1 1
1 0 0 0 1 1 0 1 1 0
1 0 0 0 1 1 1 1 2 0
$EndEntities
$Nodes
2 4 1 4
2 1 0 4
1
2
3
4
0 0 0
1 0 0
0 1 0
0 0 1
3 1 0 0
$EndNodes
$Elements
2 2 1 2
2 1 2 1
1 1 2 3
3 1 4 1
2 1 2 3 4
$EndElements
"""

def _nas_fixture():
    # exact 8-character Nastran short-format fields
    out = ["$ANSA_NAME_COMMENT;1;PSHELL;Wall;",
           "$ANSA_NAME_COMMENT;2;PSOLID;Interior;"]
    for i, (x, y, z) in enumerate(PTS, start=1):
        out.append(f"{'GRID':<8}{i:>8}{'':8}{x:>8}{y:>8}{z:>8}")
    out.append(f"{'CTRIA3':<8}{1:>8}{1:>8}{1:>8}{2:>8}{3:>8}")
    out.append(f"{'CTETRA':<8}{2:>8}{2:>8}{1:>8}{2:>8}{3:>8}{4:>8}")
    return "\n".join(out) + "\n"


NAS = None  # built lazily (needs PTS)


def _check(mesh):
    assert mesh.n_points == 4
    assert np.allclose(np.sort(mesh.points.ravel()),
                       np.sort(np.array(PTS).T.ravel()))
    assert len(mesh.tetrahedra) == 1
    assert len(mesh.triangles) >= 1
    assert mesh.domains["Interior"]["dimension"] == 3
    assert list(mesh.domains["Interior"]["simplices"]) == [0]
    assert mesh.domains["Wall"]["dimension"] == 2
    # the Wall triangle is (0,1,2) up to order
    wi = mesh.domains["Wall"]["simplices"][0]
    assert sorted(mesh.triangles[wi]) == [0, 1, 2]
    # volume of the unit tet
    assert abs(mesh.tet_volumes()[0] - 1 / 6) < 1e-12


@pytest.mark.parametrize("name,content", [("t.msh2.msh", MSH2),
                                          ("t.msh4.msh", MSH4),
                                          ("t.nas", "NAS")])
def test_readers_roundtrip(tmp_path, name, content):
    if content == "NAS":
        content = _nas_fixture()
    p = tmp_path / name
    p.write_text(content)
    mesh = read_mesh(str(p))
    _check(mesh)


def test_reader_scale(tmp_path):
    p = tmp_path / "scaled.msh"
    p.write_text(MSH2)
    mesh = read_mesh(str(p), scale=1e-3)
    assert abs(mesh.tet_volumes()[0] - 1e-9 / 6) < 1e-22
