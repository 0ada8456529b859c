"""Structured mesh generator tests."""

import numpy as np
import pytest

from circulantpreconditioner_tpu.mesh import cartesian_mesh
from circulantpreconditioner_tpu.mesh.structured import set_group_at_plane


@pytest.mark.parametrize("n,bounds", [
    ((4,), ((-0.5, 0.5),)),
    ((4, 3), ((-0.5, 0.5), (0.0, 1.5))),
    ((3, 4, 5), ((-0.5, 0.5), (-0.5, 0.5), (-0.5, 0.5))),
])
def test_cartesian_invariants(n, bounds):
    m = cartesian_mesh(bounds, n)
    m.validate()
    dim = len(n)
    h = np.array([(b[1] - b[0]) / k for b, k in zip(bounds, n)])
    np.testing.assert_allclose(m.cell_volume, np.prod(h))
    # total count of faces: interior + boundary
    n_int = sum((np.prod(n) // n[d]) * (n[d] - 1) for d in range(dim))
    n_bnd = sum(2 * np.prod(n) // n[d] for d in range(dim))
    assert m.n_faces == n_int + n_bnd
    assert len(m.boundary_faces()) == n_bnd
    # min vol/surf ratio: prod(h) / (2*sum over axes of prod(h)/h_d)
    surf = 2 * sum(np.prod(h) / h[d] for d in range(dim))
    np.testing.assert_allclose(m.min_ratio_vol_surf(), np.prod(h) / surf, rtol=1e-12)


def test_cell_numbering_x_fastest():
    m = cartesian_mesh(((0, 3), (0, 2)), (3, 2))
    # cell 0 at (0.5, 0.5), cell 1 at (1.5, 0.5) — x fastest
    np.testing.assert_allclose(m.cell_center[0], [0.5, 0.5])
    np.testing.assert_allclose(m.cell_center[1], [1.5, 0.5])
    np.testing.assert_allclose(m.cell_center[3], [0.5, 1.5])


def test_periodic_twins():
    m = cartesian_mesh(((0, 1), (0, 1)), (4, 3), periodic=True)
    bf = m.boundary_faces()
    assert (m.face_group[bf] == m.groups["Periodic"]).all()
    # low-x boundary face of cell 0 must couple to cell 3 (x-wrap)
    for f in bf:
        L = m.face_cells[f, 0]
        twin = m.periodic_twin[f]
        assert twin >= 0
        nrm = m.face_normal[f]
        d = int(np.nonzero(np.abs(nrm) > 0.5)[0][0])
        # twin differs from L only along axis d, wrapped
        cL = m.cell_center[L].copy()
        cT = m.cell_center[twin].copy()
        other_axes = [a for a in range(2) if a != d]
        np.testing.assert_allclose(cL[other_axes], cT[other_axes])


def test_group_tagging():
    m = cartesian_mesh(((0, 1), (0, 1)), (4, 4))
    set_group_at_plane(m, axis=0, value=0.0, name="Neumann")
    bf = m.boundary_faces()
    left = bf[np.abs(m.face_center[bf, 0]) < 1e-12]
    assert (m.face_group[left] == m.groups["Neumann"]).all()
    others = bf[np.abs(m.face_center[bf, 0]) >= 1e-12]
    assert (m.face_group[others] == m.groups["Wall"]).all()


def test_max_neighbours():
    m = cartesian_mesh(((0, 1), (0, 1), (0, 1)), (3, 3, 3))
    assert m.max_neighbours() == 6
