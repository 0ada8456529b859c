"""typ3 reader + generic periodic-face pairing tests.

typ3 is the third FVCA6 fixture format the reference ships (meshes/README.md);
set_periodic is the getIndexFacePeriodic analog (reference
src/WaveSystem.cxx:159-167) generalized to arbitrary meshes.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from circulantpreconditioner_tpu.mesh import cartesian_mesh, read_typ3
from circulantpreconditioner_tpu.mesh.unstructured import hex_mesh, tet_mesh
from circulantpreconditioner_tpu.models import TransportEquation, WaveSystem

MESHES = "/root/reference/meshes"


@pytest.mark.skipif(not os.path.isdir(MESHES), reason="fixtures unavailable")
def test_typ3_matches_med_geometry():
    """The .typ3 and .med encodings of mesh_tetra_0 must yield identical
    geometry (independent parse paths: face-list vs face-extraction)."""
    from circulantpreconditioner_tpu.mesh import read_med

    a = read_typ3(os.path.join(MESHES, "3DTetrahedra", "mesh_tetra_0.typ3"))
    b = read_med(os.path.join(MESHES, "3DTetrahedra", "mesh_tetra_0.med"))
    a.validate()
    assert (a.n_cells, a.n_faces) == (b.n_cells, b.n_faces)
    np.testing.assert_allclose(np.sort(a.cell_volume), np.sort(b.cell_volume), atol=1e-12)
    np.testing.assert_allclose(a.cell_volume.sum(), 1.0, atol=1e-9)


def test_set_periodic_tags_and_twins():
    m = tet_mesh(((0, 1),) * 3, (3, 3, 3))
    m.set_periodic()
    code = m.groups["Periodic"]
    tagged = m.face_group == code
    assert tagged.sum() == 6 * 9 * 2  # 2 triangles per exposed quad, 6 sides
    assert (m.periodic_twin[tagged] >= 0).all()
    # twins are symmetric: twin-of-twin comes back to the owner cell
    bnd = np.nonzero(tagged)[0]
    own = m.face_cells[bnd, 0]
    assert set(map(int, m.periodic_twin[bnd])) == set(map(int, own))


def test_periodic_unstructured_matches_structured_operator():
    """Periodic transport operator on an unstructured hex grid must equal the
    structured-generator operator entry for entry (same grid, same BC)."""
    n = (4, 3, 2)
    bounds = ((0, 1),) * 3
    ms = cartesian_mesh(bounds, n, periodic=True)
    mu = hex_mesh(bounds, n)
    mu.set_periodic()
    a = [1.0, 0.7, -0.4]
    ts = TransportEquation(ms, velocity=a, cfl=5.0, dtype=jnp.float64)
    tu = TransportEquation(mu, velocity=a, cfl=5.0, dtype=jnp.float64)
    np.testing.assert_allclose(ts.dt, tu.dt, rtol=1e-12)
    Ds = ts.divergence.to_dense()
    Du = tu.divergence.to_dense()
    # cell numbering may differ; compare via matvec on a smooth function of
    # position evaluated at each mesh's own cell centers
    def field(m):
        c = m.cell_center
        return np.sin(2 * np.pi * c[:, 0]) + np.cos(2 * np.pi * c[:, 1]) * c[:, 2]
    ys = np.asarray(Ds) @ field(ms)
    yu = np.asarray(Du) @ field(mu)
    # match cells by rounded center key
    ks = {tuple(np.round(c, 9)): i for i, c in enumerate(ms.cell_center)}
    perm = [ks[tuple(np.round(c, 9))] for c in mu.cell_center]
    np.testing.assert_allclose(yu, ys[perm], atol=1e-12)


def test_periodic_conservation_kernel():
    """Fully periodic upwind transport: constants are in the kernel of the
    divergence operator (no boundary leakage)."""
    m = tet_mesh(((0, 1),) * 3, (2, 2, 2))
    m.set_periodic()
    t = TransportEquation(m, velocity=[1.0, 0.5, 0.25], cfl=2.0, dtype=jnp.float64)
    ones = np.ones(m.n_cells)
    y = np.asarray(t.divergence.matvec(jnp.asarray(ones)))
    np.testing.assert_allclose(y, 0.0, atol=1e-12)


def test_periodic_wave_on_unstructured():
    """Wave system with Periodic BC on a paired unstructured mesh: one
    explicit step stays finite and conserves the constant state."""
    m = hex_mesh(((0, 1),) * 3, (3, 3, 3))
    m.set_periodic()
    model = WaveSystem(m, cfl=0.4, dtype=jnp.float64)
    step = model.explicit_stepper()
    U1 = np.asarray(step(model.initial_state())[0])
    assert np.isfinite(U1).all()
    # constant state (uniform p, zero q) is stationary under periodic BC
    nb = model.nb
    U = np.zeros(m.n_cells * nb)
    U[::nb] = 1.0
    U2 = np.asarray(step(jnp.asarray(U))[0])
    np.testing.assert_allclose(U2, U, atol=1e-12)
