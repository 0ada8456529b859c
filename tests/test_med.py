"""MED (HDF5) reader tests against the reference's shipped fixtures.

The reference's ctest registers every driver on meshes/meshCube.med
(/root/reference/tests/CMakeLists.txt:30-38); the FVCA6 families
(meshes/README.md) are the benchmark ladder. Cell counts asserted here are
the ones published in meshes/README.md:16-40.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from circulantpreconditioner_tpu.mesh import cartesian_mesh, read_med, read_mesh
from circulantpreconditioner_tpu.models import WaveSystem

MESHES = "/root/reference/meshes"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(MESHES), reason="reference mesh fixtures not available"
)


def _p(*parts):
    return os.path.join(MESHES, *parts)


@pytest.mark.parametrize(
    "rel,cells",
    [
        ("meshCube.med", 270),
        ("3DHexaèdres/mesh_hexa_1.med", 8),  # meshes/README.md:16
        ("3DTetrahedra/mesh_tetra_0.med", 215),  # meshes/README.md:23
        ("3DKershaw/Kershaw1.med", 512),  # polyhedra, meshes/README.md:37
    ],
)
def test_fixture_loads_and_closes(rel, cells):
    m = read_med(_p(rel))
    m.validate()  # positive volumes/areas, unit normals, divergence closure
    assert m.n_cells == cells
    # every fixture tiles the unit cube
    np.testing.assert_allclose(m.cell_volume.sum(), 1.0, atol=1e-9)
    bb = m.bbox()
    np.testing.assert_allclose(bb[:, 0], 0.0, atol=1e-12)
    np.testing.assert_allclose(bb[:, 1], 1.0, atol=1e-12)


def test_boundary_groups_tagged():
    """meshCube.med carries the 6 named side groups; every boundary face must
    resolve to one (Face::getGroupName analog)."""
    m = read_med(_p("meshCube.med"))
    for g in ("Gauche", "Droite", "Haut", "Bas", "Devant", "Derriere"):
        assert g in m.groups
    bnd = m.boundary_faces()
    assert (m.face_group[bnd] > 1).all()  # all tagged beyond the default
    # interior faces stay interior
    inter = m.face_cells[:, 1] >= 0
    assert (m.face_group[inter] == 0).all()


def test_hexa_fixture_matches_structured_generator():
    """mesh_hexa_1 is the 2x2x2 uniform cube — must agree with our structured
    generator geometry exactly."""
    mu = read_med(_p("3DHexaèdres", "mesh_hexa_1.med"))
    ms = cartesian_mesh(((0.0, 1.0),) * 3, (2, 2, 2))
    assert mu.n_cells == ms.n_cells and mu.n_faces == ms.n_faces
    np.testing.assert_allclose(np.sort(mu.cell_volume), np.sort(ms.cell_volume), atol=1e-12)
    np.testing.assert_allclose(mu.min_ratio_vol_surf(), ms.min_ratio_vol_surf(), atol=1e-12)


def test_read_mesh_dispatch():
    m = read_mesh(_p("meshCube.med"))
    assert m.n_cells == 270
    with pytest.raises(ValueError):
        read_mesh("mesh.xyz")


def test_wave_implicit_on_meshcube():
    """The reference's flagship ctest case: implicit WaveSystem on
    meshCube.med (WaveSystem_3DUnstructuredCubes_..., tests/CMakeLists.txt:34-38)
    — one implicit step must converge and stay finite."""
    m = read_med(_p("meshCube.med"))
    model = WaveSystem(m, cfl=100.0, dtype=jnp.float64)
    step = model.implicit_stepper(rtol=1e-6, atol=1e-8)
    U1, dn, iters, *_ = step(model.initial_state())
    assert np.isfinite(np.asarray(U1)).all()
    assert int(iters) > 0


def test_kershaw_polyhedra_wave_explicit_step():
    """Kershaw1.med exercises the MED polyhedron (POE/IFN/INN) path end to
    end through assembly."""
    m = read_med(_p("3DKershaw", "Kershaw1.med"))
    model = WaveSystem(m, cfl=0.3, dtype=jnp.float64)
    step = model.explicit_stepper()
    U1, dn = step(model.initial_state())[:2]
    assert np.isfinite(np.asarray(U1)).all()


def test_driver_accepts_med_positional(tmp_path):
    """Reference CLI parity: `exe mesh.med resultDir`."""
    from circulantpreconditioner_tpu.drivers import wave_explicit

    res = wave_explicit.main(
        [_p("meshCube.med"), "--tmax", "0.0001", "--ntmax", "3",
         "--result-dir", str(tmp_path)]
    )
    assert np.isfinite(np.asarray(res.state)).all()
