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


# ---------------------------------------------------------------------------
# per-shape external-flow generators (Generate_blockMeshDict/* parity)
# ---------------------------------------------------------------------------

from tpufoam.data.blockmesh import (SHAPE_SPECS, cylinder_spec,  # noqa: E402
                                    ellipse_spec, emit_blockmesh, plate_spec,
                                    rectangle_spec, triangle_spec,
                                    write_spec)

ALL_SPECS = {
    "cylinder": cylinder_spec(0.5, 3.0, refinement=1.0),
    "cylinder_kwsst": cylinder_spec(0.5, 3.0, refinement=1.0,
                                    bl_grading=10.0),
    "rectangle": rectangle_spec(4.0, 5.0, 0.3, cell_scale=1.0),
    "triangle": triangle_spec(4.0, 5.0, 0.3, cell_scale=1.0),
    "ellipse": ellipse_spec(0.6, 0.3, y_max=2.0),
    "plate": plate_spec(5.0, 0.8, 0.05, 30.0),
}


def _quad_area(spec, quad):
    pts = [spec.verts[k] for k in quad]
    return 0.5 * sum(pts[i][0] * pts[(i + 1) % 4][1]
                     - pts[(i + 1) % 4][0] * pts[i][1] for i in range(4))


@pytest.mark.parametrize("name", sorted(ALL_SPECS))
def test_spec_blocks_are_ccw_and_sized(name):
    spec = ALL_SPECS[name]
    for b in spec.blocks:
        assert _quad_area(spec, b.quad) > 1e-9, (name, b.quad)
        assert b.nx >= 2 and b.ny >= 2


@pytest.mark.parametrize("name", sorted(ALL_SPECS))
def test_spec_edge_conformity(name):
    """Shared block edges must carry identical cell counts (blockMesh
    rejects non-conforming division counts)."""
    spec = ALL_SPECS[name]
    counts = {}
    for b in spec.blocks:
        q = b.quad
        for k in range(4):
            e = frozenset((q[k], q[(k + 1) % 4]))
            n = b.nx if k in (0, 2) else b.ny
            counts.setdefault(e, []).append(n)
    for e, ns in counts.items():
        assert len(set(ns)) == 1, (name, e, ns)
        assert len(ns) <= 2   # an edge is shared by at most 2 blocks


@pytest.mark.parametrize("name", sorted(ALL_SPECS))
def test_spec_patch_faces_outward(name):
    """Every patch edge is a boundary edge of exactly one block and the
    emitted face normal points away from that block (the reason
    _orient_patch_edges exists)."""
    from tpufoam.data.blockmesh import _orient_patch_edges
    spec = ALL_SPECS[name]
    owners = {}
    for bi, b in enumerate(spec.blocks):
        q = b.quad
        for k in range(4):
            owners.setdefault(frozenset((q[k], q[(k + 1) % 4])), []).append(bi)
    oriented = _orient_patch_edges(spec)
    for pname, (_, edges) in oriented.items():
        for (va, vb) in edges:
            own = owners[frozenset((va, vb))]
            assert len(own) == 1, (name, pname, va, vb)
            b = spec.blocks[own[0]]
            cx = sum(spec.verts[k][0] for k in b.quad) / 4.0
            cy = sum(spec.verts[k][1] for k in b.quad) / 4.0
            pa, pb = spec.verts[va], spec.verts[vb]
            ex, ey = pb[0] - pa[0], pb[1] - pa[1]
            nx_, ny_ = ey, -ex                     # (vb-va) x z_hat
            mx, my = 0.5 * (pa[0] + pb[0]), 0.5 * (pa[1] + pb[1])
            assert nx_ * (mx - cx) + ny_ * (my - cy) > 0, (name, pname)


@pytest.mark.parametrize("name", sorted(ALL_SPECS))
def test_spec_emits_and_covers_boundary(name):
    """Rendered text is complete, and the union of patch edges equals the
    set of boundary (single-owner) block edges — nothing silently falls
    into the default patch except front/back."""
    spec = ALL_SPECS[name]
    text = emit_blockmesh(spec)
    assert len(re.findall(r"hex \(", text)) == len(spec.blocks)
    assert len(re.findall(r"arc \d", text)) == 2 * len(spec.arcs)
    for pname in spec.patches:
        assert pname in text

    owners = {}
    for b in spec.blocks:
        q = b.quad
        for k in range(4):
            e = frozenset((q[k], q[(k + 1) % 4]))
            owners[e] = owners.get(e, 0) + 1
    boundary = {e for e, c in owners.items() if c == 1}
    patch_edges = {frozenset(e) for (_, edges) in spec.patches.values()
                   for e in edges}
    assert patch_edges == boundary, (name, boundary ^ patch_edges)


def test_cylinder_arcs_on_circle():
    spec = ALL_SPECS["cylinder"]
    r = 0.5
    for (v0, v1, (mx, my)) in spec.arcs:
        rad = np.hypot(mx, my)
        assert (abs(rad - r) < 1e-9) or (abs(rad - 2 * r) < 1e-9)
        for v in (v0, v1):
            x, y = spec.verts[v]
            rv = np.hypot(x, y)
            assert (abs(rv - r) < 1e-9) or (abs(rv - 2 * r) < 1e-9)


def test_ellipse_arcs_on_ellipse():
    spec = ALL_SPECS["ellipse"]
    a, b = 0.6, 0.3
    for (_, _, (mx, my)) in spec.arcs:
        q = (mx / a) ** 2 + (my / b) ** 2
        assert abs(q - 1.0) < 1e-9 or abs(q - 4.0) < 1e-9


def test_plate_obstacle_is_the_rotated_rectangle():
    spec = ALL_SPECS["plate"]
    import math
    al = math.radians(30.0)
    L, bw, xc = 0.8, 0.05, 5.0
    edges = spec.patches["obstacle"][1]
    pts = {spec.verts[v] for e in edges for v in e}
    assert len(pts) == 4
    # all corners at distance sqrt((L/2)^2 + bw^2) from the centre
    for (x, y) in pts:
        d = np.hypot(x - xc, y)
        assert abs(d - np.hypot(L / 2, bw)) < 1e-9
    # obstacle edges have lengths 2*bw (short) and L (long), two of each
    lens = sorted(np.hypot(spec.verts[a][0] - spec.verts[b][0],
                           spec.verts[a][1] - spec.verts[b][1])
                  for a, b in edges)
    np.testing.assert_allclose(lens, [2 * bw, 2 * bw, L, L], rtol=1e-9)


def test_half_domain_specs_sit_on_axis(tmp_path):
    for name in ("cylinder", "rectangle", "triangle", "ellipse"):
        spec = ALL_SPECS[name]
        assert spec.half_domain
        assert min(y for (_, y) in spec.verts) == 0.0
        case = str(tmp_path / name)
        write_spec(spec, case)
        assert os.path.exists(os.path.join(case, "system/blockMeshDict"))
        assert os.path.exists(os.path.join(case, "system/mirrorMeshDict"))
    assert not plate_spec(5.0, 0.8, 0.05, 30.0).half_domain


def test_kwsst_grading_differs():
    lam = emit_blockmesh(ALL_SPECS["cylinder"])
    turb = emit_blockmesh(ALL_SPECS["cylinder_kwsst"])
    assert "simpleGrading (10 " in turb and "simpleGrading (10 " in lam
    assert "simpleGrading (0.1 1" in turb   # 1/bl_grading on mirror-side ring
    assert lam != turb


def test_shape_specs_registry():
    assert set(SHAPE_SPECS) == {"cylinder", "rectangle", "triangle",
                                "ellipse", "plate"}


def test_casegen_cli_sweep(tmp_path):
    """make_dataset.py role: stratified sweep writes N mirrored cases."""
    from tpufoam.cli import casegen_main
    root = str(tmp_path / "sweep")
    casegen_main(["--shape", "cylinder", "--out", root, "--sweep", "3"])
    for i in range(3):
        assert os.path.exists(f"{root}/{i}/system/blockMeshDict")
        assert os.path.exists(f"{root}/{i}/system/mirrorMeshDict")
        assert os.path.exists(f"{root}/{i}/params.json")
    casegen_main(["--shape", "triangle", "--out", str(tmp_path / "tri"),
                  "--size", "0.3", "--size2", "1.0"])
    txt = open(tmp_path / "tri" / "system" / "blockMeshDict").read()
    assert "obstacle" in txt
