"""Grid-topology recovery for loaded meshes (mesh/topology.py).

Closes the round-3 gap: every mesh the reference actually ships is a FILE
(meshes/README.md:12-40), and only generated meshes used to carry
`topology_shape`. These tests assert that (a) the hexa/Kershaw fixture
families are recognized as topological grids, (b) the recovered numbering
yields the gather-free stencil operator EXACTLY equal to the assembled
operator, (c) a loaded uniform-hex fixture produces the *identical* matrix to
the same grid generated in-process, and (d) tetra fixtures (genuinely
unstructured) are left untouched.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from circulantpreconditioner_tpu.mesh import read_med, read_mesh
from circulantpreconditioner_tpu.mesh.topology import (
    permute_cells,
    recover_grid_topology,
)
from circulantpreconditioner_tpu.mesh.unstructured import hex_mesh, read_gmsh
from circulantpreconditioner_tpu.models import TransportEquation, WaveSystem

MESHES = "/root/reference/meshes"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(MESHES), reason="reference mesh fixtures not available"
)


def _p(*parts):
    return os.path.join(MESHES, *parts)


@pytest.mark.parametrize(
    "rel,shape",
    [
        ("3DHexaèdres/mesh_hexa_1.med", (2, 2, 2)),  # meshes/README.md:16-19
        ("3DHexaèdres/mesh_hexa_2.med", (4, 4, 4)),
        ("3DHexaèdres/mesh_hexa_3.med", (8, 8, 8)),
        ("3DKershaw/Kershaw1.med", (8, 8, 8)),  # meshes/README.md:37-40
    ],
)
def test_fixture_topology_recovered(rel, shape):
    m = read_mesh(_p(rel))
    assert getattr(m, "topology_shape", None) == shape
    perm = getattr(m, "cell_permutation", None)
    assert perm is not None and sorted(perm) == list(range(m.n_cells))
    m.validate()  # renumbering must preserve mesh invariants


@pytest.mark.parametrize(
    "rel",
    [
        "meshCube.med",  # 270 tets
        "3DTetrahedra/mesh_tetra_0.med",  # gentle tetrahedra — unstructured
        "3DTetrahedra_Kershaw/3DKershawTetra1.med",
    ],
)
def test_unstructured_fixture_not_grid_tagged(rel):
    """Tetra fixtures are not topological grids: no topology_shape; instead
    they get the RCM bandwidth order for the windowed SpMV."""
    m = read_mesh(_p(rel))
    assert getattr(m, "topology_shape", None) is None
    assert getattr(m, "bandwidth_ordered", False)
    perm = getattr(m, "cell_permutation", None)
    assert perm is not None and sorted(perm) == list(range(m.n_cells))
    m.validate()


def test_loaded_kershaw_stencil_equals_assembled():
    """The recovered numbering must make the assembled wave operator a true
    7-point block stencil: varying-stencil matvec == BSR matvec exactly."""
    m = read_mesh(_p("3DKershaw/Kershaw1.med"))
    ws = WaveSystem(m, dt=1e-4, dtype=jnp.float64)
    Dv = ws.divergence_op("varying")  # raises if not a 7-point stencil
    Dm = ws.divergence_op("matrix")
    x = jnp.asarray(np.random.default_rng(0).standard_normal(m.n_cells * 4))
    np.testing.assert_allclose(np.asarray(Dv(x)), np.asarray(Dm(x)),
                               rtol=1e-12, atol=1e-9)


def test_loaded_kershaw_transport_stencil_equals_assembled():
    m = read_mesh(_p("3DKershaw/Kershaw1.med"))
    te = TransportEquation(m, velocity=(1.0, 0.0, 0.0), dt=1e-3,
                           dtype=jnp.float64)
    Dv = te.divergence_op("varying")
    Dm = te.divergence_op("matrix")
    x = jnp.asarray(np.random.default_rng(1).standard_normal(m.n_cells))
    np.testing.assert_allclose(np.asarray(Dv(x)), np.asarray(Dm(x)),
                               rtol=1e-12, atol=1e-12)


def test_loaded_hexa_matches_generated_grid():
    """mesh_hexa_2.med is the uniform 4^3 grid on [0,1]^3: after recovery the
    assembled divergence must be the IDENTICAL matrix to the in-process
    generator's (same lexicographic numbering, same geometry)."""
    ml = read_mesh(_p("3DHexaèdres/mesh_hexa_2.med"))
    mg = hex_mesh(((0, 1), (0, 1), (0, 1)), (4, 4, 4))
    Al = WaveSystem(ml, dt=1e-4, dtype=jnp.float64).divergence.to_scipy()
    Ag = WaveSystem(mg, dt=1e-4, dtype=jnp.float64).divergence.to_scipy()
    assert abs(Al - Ag).max() < 1e-12 * abs(Ag).max()


def test_permutation_roundtrips_cell_data():
    """cell_permutation maps recovered numbering back to file order."""
    raw = read_med(_p("3DKershaw/Kershaw1.med"))
    rec = read_mesh(_p("3DKershaw/Kershaw1.med"))
    perm = rec.cell_permutation  # new -> original
    np.testing.assert_allclose(rec.cell_center, raw.cell_center[perm])
    np.testing.assert_allclose(rec.cell_volume, raw.cell_volume[perm])


def test_permute_cells_composes():
    """Two successive renumberings record the composed original-order map."""
    m = read_med(_p("3DHexaèdres/mesh_hexa_1.med"))
    centers0 = m.cell_center.copy()
    rng = np.random.default_rng(2)
    p1 = rng.permutation(m.n_cells)
    p2 = rng.permutation(m.n_cells)
    permute_cells(m, p1)
    permute_cells(m, p2)
    np.testing.assert_allclose(m.cell_center, centers0[m.cell_permutation])
    m.validate()


@pytest.mark.parametrize(
    "med,msh",
    [
        ("3DHexaèdres/mesh_hexa_1.med", "3DHexaèdres/mesh_hexa_1.msh"),
        ("3DTetrahedra/mesh_tetra_0.med", "3DTetrahedra/mesh_tetra_0.msh"),
    ],
)
def test_reference_msh_matches_med_twin(med, msh):
    """The reference ships .msh twins of the .med fixtures (Gmsh 2.2); the
    gmsh reader must produce the same geometry (cells, volumes, total area).
    Reference parity: tests/CMakeLists.txt runs drivers on the .med files —
    the .msh route must be interchangeable."""
    a = read_med(_p(med))
    b = read_gmsh(_p(msh))
    assert a.n_cells == b.n_cells
    assert a.n_faces == b.n_faces
    # cell ordering matches between the twin files in the FVCA6 exports
    np.testing.assert_allclose(a.cell_volume, b.cell_volume, rtol=1e-10)
    np.testing.assert_allclose(a.cell_center, b.cell_center, atol=1e-10)
    np.testing.assert_allclose(a.face_area.sum(), b.face_area.sum(), rtol=1e-10)


def test_recovery_is_idempotent_and_safe_on_generated():
    mg = hex_mesh(((0, 1), (0, 1), (0, 1)), (3, 4, 5))
    shape0 = mg.topology_shape
    assert recover_grid_topology(mg)  # already tagged -> no-op True
    assert mg.topology_shape == shape0
