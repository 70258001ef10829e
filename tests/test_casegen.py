"""Structural checks on the OpenFOAM case generators (no OpenFOAM in the
image — validate dictionary structure, indices and arc geometry)."""

import os
import re

import numpy as np
import pytest

from tpufoam.data.casegen import (write_blockmesh_dict, write_mirror_mesh_dict,
                                  write_openfoam_case)


def test_blockmesh_structure(tmp_path):
    path = str(tmp_path / "blockMeshDict")
    text = write_blockmesh_dict(path, length=15.0, height=2.0, cx=5.0,
                                cy=1.0, r=0.25, refinement=2)
    assert os.path.exists(path)

    verts = re.findall(r"\(([-\d.e ]+)\)",
                       text.split("vertices")[1].split(");")[0])
    n_verts = len(verts)
    assert n_verts == 40  # (16 lattice + 4 circle) x 2 planes

    blocks = re.findall(r"hex \(([\d ]+)\)", text)
    assert len(blocks) == 12  # 3x3 lattice minus centre + 4 ring blocks
    for b in blocks:
        idx = list(map(int, b.split()))
        assert len(idx) == 8
        assert max(idx) < n_verts

    arcs = re.findall(r"arc (\d+) (\d+) \(([-\d.e ]+)\)", text)
    assert len(arcs) == 8  # 4 arcs x 2 planes
    for _, _, mid in arcs:
        x, y, _ = map(float, mid.split())
        assert abs(np.hypot(x - 5.0, y - 1.0) - 0.25) < 1e-6

    for patch in ("inlet", "outlet", "top", "obstacle"):
        assert patch in text
    assert "refinement" not in text  # sanity: template fully rendered


def test_blockmesh_rejects_oversized_obstacle(tmp_path):
    with pytest.raises(ValueError):
        write_blockmesh_dict(str(tmp_path / "bmd"), length=2.0, height=0.5,
                             cx=1.0, cy=0.25, r=0.4)


def test_full_case_skeleton(tmp_path):
    case = str(tmp_path / "case")
    write_openfoam_case(case, nu=8e-3, end_time=73.0, n_subdomains=4)
    for rel in ("system/blockMeshDict", "system/controlDict",
                "system/fvSchemes", "system/fvSolution",
                "system/decomposeParDict", "constant/transportProperties",
                "0/U", "0/p"):
        assert os.path.exists(os.path.join(case, rel)), rel
    fv = open(os.path.join(case, "system/fvSolution")).read()
    assert "GAMG" in fv and "maxIter         6" in fv
    tp = open(os.path.join(case, "constant/transportProperties")).read()
    assert "0.008" in tp
    dp = open(os.path.join(case, "system/decomposeParDict")).read()
    assert "scotch" in dp


def test_mirror_mesh_dict(tmp_path):
    text = write_mirror_mesh_dict(str(tmp_path / "mirrorMeshDict"))
    assert "pointAndNormal" in text
    assert "(0 -1 0)" in text
