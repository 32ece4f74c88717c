"""Mesh file readers: gmsh v4.1, gmsh v2.2, Nastran bulk data, ANSYS fluent.

Reference parsers: read_msh4 (Meshutils.jl:272-402), read_msh2
(Meshutils.jl:412-499), read_nastran (src/Mesh/read_nastran.jl), fluent
(Meshutils.jl:1239-1341).  Node/element tags are converted to 0-based
indices; duplicate elements are removed and domain references re-indexed by
:meth:`Mesh.from_raw`."""
from __future__ import annotations

import os
import re
from typing import Dict, List

import numpy as np

from .core import Mesh


def read_mesh(file_name: str, scale: float = 1.0) -> Mesh:
    """Dispatch on file extension like the reference Mesh constructor
    (Meshutils.jl:92-120)."""
    ext = file_name.rsplit(".", 1)[-1].lower()
    if ext == "msh":
        with open(file_name) as f:
            f.readline()
            ver = f.readline().strip()
        if ver.startswith("4"):
            raw = read_msh4(file_name)
        else:
            raw = read_msh2(file_name)
    elif ext in ("nas", "bdf"):
        raw = read_nastran(file_name)
    elif ext in ("cas", "msh2"):
        raise ValueError("ANSYS fluent reader: use read_fluent directly")
    else:
        raise ValueError(f"mesh type .{ext} not supported")
    points, lines, triangles, tetrahedra, domains = raw
    return Mesh.from_raw(points, lines, triangles, tetrahedra, domains,
                         name=os.path.basename(file_name), file=file_name,
                         scale=scale)


def read_msh4(file_name: str):
    """gmsh v4.1 ASCII: PhysicalNames / Entities / Nodes / Elements."""
    tag2dom: Dict[str, str] = {}
    ent2dom = [dict() for _ in range(4)]
    domains: Dict[str, Dict] = {}
    points = None
    lines: List[List[int]] = []
    triangles: List[List[int]] = []
    tetrahedra: List[List[int]] = []
    with open(file_name) as fid:
        it = iter(fid)
        for line in it:
            fld = line.strip()
            if fld == "$PhysicalNames":
                n = int(next(it))
                for _ in range(n):
                    parts = next(it).split()
                    dim, tag = int(parts[0]), parts[1]
                    dom = " ".join(parts[2:]).strip('"')
                    tag2dom[tag] = dom
                    domains[dom] = {"dimension": dim, "simplices": []}
            elif fld == "$Entities":
                counts = [int(x) for x in next(it).split()]
                for d, cnt in enumerate(counts):
                    for _ in range(cnt):
                        parts = next(it).split()
                        ent_tag = parts[0]
                        # points entities: tag x y z numPhys phys...
                        # others: tag 6×bbox numPhys phys... (v4.1)
                        off = 4 if d == 0 else 7
                        n_phys = int(parts[off])
                        phys = parts[off + 1: off + 1 + n_phys]
                        ent2dom[d][ent_tag] = [tag2dom[t] for t in phys
                                               if t in tag2dom]
            elif fld == "$Nodes":
                nblocks, nnodes, _, maxtag = (int(x) for x in next(it).split())
                points = np.zeros((3, maxtag))
                used = np.zeros(maxtag, dtype=bool)
                for _ in range(nblocks):
                    _, _, parametric, nb = (int(x) for x in next(it).split())
                    tags = [int(next(it)) for _ in range(nb)]
                    for t in tags:
                        xyz = [float(x) for x in next(it).split()]
                        points[:, t - 1] = xyz[:3]
                        used[t - 1] = True
            elif fld == "$Elements":
                nblocks, *_ = (int(x) for x in next(it).split())
                for _ in range(nblocks):
                    parts = next(it).split()
                    ent_dim, ent_tag = int(parts[0]), parts[1]
                    etype, nb = int(parts[2]), int(parts[3])
                    doms = ent2dom[ent_dim].get(ent_tag, [])
                    for _ in range(nb):
                        nodes = [int(x) - 1 for x in next(it).split()[1:]]
                        if etype == 1:
                            lines.append(nodes[:2])
                            for dm in doms:
                                domains[dm]["simplices"].append(len(lines) - 1)
                        elif etype == 2:
                            triangles.append(nodes[:3])
                            for dm in doms:
                                domains[dm]["simplices"].append(len(triangles) - 1)
                        elif etype == 4:
                            tetrahedra.append(nodes[:4])
                            for dm in doms:
                                domains[dm]["simplices"].append(len(tetrahedra) - 1)
    lines = np.asarray(lines, np.int64).reshape(-1, 2)
    triangles = np.asarray(triangles, np.int64).reshape(-1, 3)
    tetrahedra = np.asarray(tetrahedra, np.int64).reshape(-1, 4)
    return points, lines, triangles, tetrahedra, domains


def read_msh2(file_name: str):
    """gmsh v2.2 ASCII (legacy) reader."""
    tag2dom: Dict[int, str] = {}
    domains: Dict[str, Dict] = {}
    points = None
    lines, triangles, tetrahedra = [], [], []
    with open(file_name) as fid:
        it = iter(fid)
        for line in it:
            fld = line.strip()
            if fld == "$PhysicalNames":
                n = int(next(it))
                for _ in range(n):
                    parts = next(it).split()
                    dim, tag = int(parts[0]), int(parts[1])
                    dom = " ".join(parts[2:]).strip('"')
                    tag2dom[tag] = dom
                    domains[dom] = {"dimension": dim, "simplices": []}
            elif fld == "$Nodes":
                n = int(next(it))
                points = np.zeros((3, n))
                for _ in range(n):
                    parts = next(it).split()
                    points[:, int(parts[0]) - 1] = [float(x) for x in parts[1:4]]
            elif fld == "$Elements":
                n = int(next(it))
                for _ in range(n):
                    parts = [int(x) for x in next(it).split()]
                    etype, ntags = parts[1], parts[2]
                    tags = parts[3:3 + ntags]
                    nodes = [x - 1 for x in parts[3 + ntags:]]
                    phys = tags[0] if tags else None
                    dom = tag2dom.get(phys)
                    if etype == 1:
                        lines.append(nodes[:2])
                        if dom:
                            domains[dom]["simplices"].append(len(lines) - 1)
                    elif etype == 2:
                        triangles.append(nodes[:3])
                        if dom:
                            domains[dom]["simplices"].append(len(triangles) - 1)
                    elif etype == 4:
                        tetrahedra.append(nodes[:4])
                        if dom:
                            domains[dom]["simplices"].append(len(tetrahedra) - 1)
    lines = np.asarray(lines, np.int64).reshape(-1, 2)
    triangles = np.asarray(triangles, np.int64).reshape(-1, 3)
    tetrahedra = np.asarray(tetrahedra, np.int64).reshape(-1, 4)
    return points, lines, triangles, tetrahedra, domains


def _nas_number(txt: str) -> float:
    """Nastran exponent-less float format: '1.5-3' == 1.5e-3."""
    t = txt.strip()
    if not t:
        return 0.0
    m = re.fullmatch(r"([+-]?[\d.]+)([+-]\d+)", t)
    if m:
        return float(m.group(1) + "e" + m.group(2))
    return float(t)


def _nas_fields(line: str, fmt: str = "short") -> List[str]:
    if "," in line:
        return [x.strip() for x in line.split(",")]
    if fmt == "long":
        out = [line[:8]]
        rest = line[8:]
        for i in range(0, len(rest), 16):
            out.append(rest[i:i + 16])
        return out
    return [line[i:i + 8] for i in range(0, len(line), 8)]


def read_nastran(file_name: str):
    """Nastran bulk data: GRID/GRID*/CTRIA3/CTRIA6/CTETRA with ANSA and
    HMNAME comment name-tags (read_nastran.jl:9-255)."""
    name_tags: Dict[str, str] = {}
    pts: Dict[int, List[float]] = {}
    triangles, tetrahedra = [], []
    domains: Dict[str, Dict] = {}

    def dom_name(tag: str, kind: str) -> str:
        tag = tag.strip()
        if tag in name_tags:
            return name_tags[tag]
        return (("surf" if kind == "s" else "vol") + tag.zfill(4))

    with open(file_name) as fid:
        it = iter(fid)
        for line in it:
            line = line.rstrip("\n")
            if not line:
                continue
            if line[0] == "$":
                if line[1:18] == "ANSA_NAME_COMMENT":
                    data = line[1:].split(";")
                    if len(data) > 3 and data[2] in ("PSOLID", "PSHELL"):
                        name_tags[data[1]] = data[3]
                elif line[1:12] == "HMNAME COMP":
                    data = line[13:].strip().split('"')
                    if len(data) >= 2:
                        name_tags[data[0].strip()] = data[1]
                continue
            if len(line) < 8:
                continue
            head = line[:8]
            if head == "GRID    " or head.startswith("GRID,"):
                d = _nas_fields(line)
                pts[int(d[1])] = [_nas_number(d[3]), _nas_number(d[4]),
                                  _nas_number(d[5])]
            elif head == "GRID*   ":
                d = _nas_fields(line, "long")
                idx = int(d[1])
                x, y = _nas_number(d[3]), _nas_number(d[4])
                d2 = _nas_fields(next(it), "long")
                pts[idx] = [x, y, _nas_number(d2[1])]
            elif head[:6] in ("CTRIA3", "CTRIA6"):
                d = _nas_fields(line)
                dom = dom_name(d[2], "s")
                triangles.append([int(d[3]) - 1, int(d[4]) - 1, int(d[5]) - 1])
                domains.setdefault(dom, {"dimension": 2, "simplices": []})[
                    "simplices"].append(len(triangles) - 1)
            elif head[:6] == "CTETRA":
                d = _nas_fields(line)
                dom = dom_name(d[2], "v")
                tetrahedra.append([int(d[3]) - 1, int(d[4]) - 1,
                                   int(d[5]) - 1, int(d[6]) - 1])
                domains.setdefault(dom, {"dimension": 3, "simplices": []})[
                    "simplices"].append(len(tetrahedra) - 1)
    n = max(pts) if pts else 0
    points = np.zeros((3, n))
    for i, xyz in pts.items():
        points[:, i - 1] = xyz
    # trim unused trailing points (read_nastran.jl:166-183)
    used = set()
    for t in tetrahedra:
        used.update(t)
    for t in triangles:
        used.update(t)
    if used:
        points = points[:, :max(used) + 1]
    lines = np.zeros((0, 2), np.int64)
    return (points, lines, np.asarray(triangles, np.int64).reshape(-1, 3),
            np.asarray(tetrahedra, np.int64).reshape(-1, 4), domains)


__all__ = ["read_mesh", "read_msh4", "read_msh2", "read_nastran"]
