"""Node welding + non-conforming interface matching (mesh/conforming.py).

The 3DKershawTetra fixtures (ladder /root/reference/meshes/README.md:30-33)
store duplicated vertices per cell (3DKershawTetra1: 3865 node slots, 2697
distinct coordinates) AND split some warped interfaces into different
triangles on each side. Without treatment, thousands of interior faces are
silently classified boundary and the assembled operator is wrong. These
tests pin down:
- weld_points merges exact/near-exact duplicates and never merges distinct
  mesh nodes,
- after read_mesh (weld + sub-face matching), KershawTetra fixtures have
  (a) essentially no interior-suspect boundary faces and (b) machine-precision
  closure Σ_f ±n_f·A_f = 0 per cell — the divergence-theorem invariant the
  FV assembly relies on,
- clean fixtures are bit-identical to their pre-pass state (no-op),
- a synthetic two-cell mesh with a mismatched split interface is repaired
  exactly.
"""

import os

import numpy as np
import pytest

from circulantpreconditioner_tpu.mesh.conforming import match_nonconforming_faces
from circulantpreconditioner_tpu.mesh.med import read_med, read_mesh
from circulantpreconditioner_tpu.mesh.unstructured import (
    build_mesh_from_cells,
    weld_points,
)

MESHES = "/root/reference/meshes"


def closure_max(m) -> float:
    fc, nrm, ar = m.face_cells, m.face_normal, m.face_area
    acc = np.zeros((m.n_cells, 3))
    np.add.at(acc, fc[:, 0], nrm * ar[:, None])
    msk = fc[:, 1] >= 0
    np.add.at(acc, fc[msk, 1], -(nrm * ar[:, None])[msk])
    return float((np.linalg.norm(acc, axis=1)
                  / np.maximum(m.cell_volume ** (2 / 3), 1e-300)).max())


def off_bbox_boundary(m) -> int:
    bnd = m.boundary_faces()
    c = m.face_center[bnd]
    bb = m.bbox()
    scale = float((bb[:, 1] - bb[:, 0]).max())
    on = np.zeros(len(bnd), dtype=bool)
    for ax in range(3):
        for v in bb[ax]:
            on |= np.abs(c[:, ax] - v) < 1e-6 * scale
    return int((~on).sum())


def test_weld_points_merges_duplicates_only():
    pts = np.array([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 0.0],
                    [1.0, 0.0, 1e-12], [0.5, 0.5, 0.5]])
    welded, remap = weld_points(pts)
    assert len(welded) == 3
    assert remap[0] == remap[2]          # exact duplicate
    assert remap[1] == remap[3]          # near-exact duplicate
    assert len({remap[0], remap[1], remap[4]}) == 3  # distinct stay distinct
    np.testing.assert_allclose(welded[remap], pts, atol=1e-11)


def test_weld_points_noop_on_clean():
    pts = np.random.default_rng(0).random((50, 3))
    welded, remap = weld_points(pts)
    assert remap is None
    np.testing.assert_array_equal(welded, pts)


def test_synthetic_mismatched_split_interface_repaired():
    """Two unit cubes sharing the x=1 quad; the left cube's interface is
    split along diagonal (1,0,0)-(1,1,1), the right one's along
    (1,1,0)-(1,0,1). Vertex-set matching fails on all four triangles; the
    conforming pass must recover the full shared area 1 as interior pieces
    with exact closure."""
    pts = np.array([
        [0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
        [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1],
        [2, 0, 0], [2, 1, 0], [2, 0, 1], [2, 1, 1],
    ], dtype=np.float64)
    # left cell: hex faces, but x+ quad replaced by two triangles (diag 1-6)
    left_faces = [
        (0, 3, 2, 1), (4, 5, 6, 7), (0, 1, 5, 4), (3, 7, 6, 2), (0, 4, 7, 3),
        (1, 2, 6), (1, 6, 5),
    ]
    # right cell vertices (1,2,8,9,5,6,10,11) — faces in LOCAL indices; the
    # x=1 quad is split along the OTHER diagonal (globals 2-5 = locals 1-4)
    right_faces = [
        (0, 1, 3, 2), (4, 6, 7, 5), (0, 2, 6, 4), (1, 5, 7, 3), (2, 3, 7, 6),
        (0, 1, 4), (1, 5, 4),
    ]
    cells = [(0, 1, 2, 3, 4, 5, 6, 7), (1, 2, 8, 9, 5, 6, 10, 11)]
    m = build_mesh_from_cells(pts, cells, cell_faces=[left_faces, right_faces])
    interior_before = int((m.face_cells[:, 1] >= 0).sum())
    assert interior_before == 0  # all four interface triangles unmatched
    n_pieces = match_nonconforming_faces(m)
    assert n_pieces >= 2
    msk = m.face_cells[:, 1] >= 0
    # recovered interface area = the full unit quad
    np.testing.assert_allclose(m.face_area[msk].sum(), 1.0, rtol=1e-12)
    assert closure_max(m) < 1e-12
    assert off_bbox_boundary(m) == 0


@pytest.mark.skipif(not os.path.isdir(MESHES),
                    reason="reference mesh fixtures not available")
def test_kershawtetra1_welded_and_conforming():
    m = read_mesh(os.path.join(MESHES, "3DTetrahedra_Kershaw/3DKershawTetra1.med"))
    assert m.n_cells == 11072  # meshes/README.md:30-33
    # without weld+matching: 16,384 interior faces and 10,176 interior-suspect
    # "boundary" faces; after: ~21.8k interior, a handful of sliver residuals
    assert int((m.face_cells[:, 1] >= 0).sum()) > 21000
    assert off_bbox_boundary(m) < 50
    assert closure_max(m) < 1e-10


@pytest.mark.skipif(not os.path.isdir(MESHES),
                    reason="reference mesh fixtures not available")
def test_clean_fixture_passes_are_noop():
    raw = read_med(os.path.join(MESHES, "3DTetrahedra/mesh_tetra_0.med"))
    n_faces = raw.face_cells.shape[0]
    assert match_nonconforming_faces(raw) == 0
    assert raw.face_cells.shape[0] == n_faces
    assert closure_max(raw) < 1e-12
