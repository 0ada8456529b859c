"""Stencil operators == assembled matrices on structured grids."""

import numpy as np
import pytest

import jax.numpy as jnp

from circulantpreconditioner_tpu.mesh import cartesian_mesh
from circulantpreconditioner_tpu.ops.assembly import (
    transport_divergence_csr,
    wave_divergence_bsr,
)
from circulantpreconditioner_tpu.ops.stencil import (
    TransportStencilOperator,
    WaveStencilOperator,
)


@pytest.mark.parametrize("periodic", [False, True])
@pytest.mark.parametrize("n,bounds", [
    ((5, 4), ((-0.5, 0.5), (-0.25, 0.75))),
    ((4, 3, 5), ((-0.5, 0.5),) * 3),
])
def test_wave_stencil_matches_bsr(n, bounds, periodic):
    m = cartesian_mesh(bounds, n, periodic=periodic)
    dt, c0 = 3e-5, 700.0
    D = wave_divergence_bsr(m, dt, c0, dtype=jnp.float64)
    S = WaveStencilOperator.create(n, dt, c0, m.spacing,
                                   bc="periodic" if periodic else "wall",
                                   dtype=jnp.float64)
    rng = np.random.default_rng(0)
    U = rng.random(D.shape[0])
    y_mat = np.asarray(D.matvec(jnp.asarray(U)))
    y_st = np.asarray(S.matvec(jnp.asarray(U)))
    np.testing.assert_allclose(y_st, y_mat, atol=1e-10)


@pytest.mark.parametrize("periodic", [False, True])
@pytest.mark.parametrize("velocity", [[1.0, 0.5], [-0.7, 0.3], [1.0, -2.0]])
def test_transport_stencil_matches_csr(periodic, velocity):
    n = (6, 5)
    m = cartesian_mesh(((-0.5, 0.5), (0.0, 1.0)), n, periodic=periodic)
    dt = 0.01
    D = transport_divergence_csr(m, dt, velocity, dtype=jnp.float64)
    S = TransportStencilOperator.create(n, velocity, dt, m.spacing,
                                        bc="periodic" if periodic else "neumann")
    rng = np.random.default_rng(1)
    u = rng.random(m.n_cells)
    np.testing.assert_allclose(
        np.asarray(S.matvec(jnp.asarray(u))), np.asarray(D.matvec(jnp.asarray(u))),
        atol=1e-12)


def test_transport_stencil_3d():
    n = (4, 5, 3)
    m = cartesian_mesh(((-0.5, 0.5),) * 3, n, periodic=True)
    dt = 0.02
    v = [0.5, -1.0, 2.0]
    D = transport_divergence_csr(m, dt, v, dtype=jnp.float64)
    S = TransportStencilOperator.create(n, v, dt, m.spacing, bc="periodic")
    rng = np.random.default_rng(2)
    u = rng.random(m.n_cells)
    np.testing.assert_allclose(
        np.asarray(S.matvec(jnp.asarray(u))), np.asarray(D.matvec(jnp.asarray(u))),
        atol=1e-12)


def test_varying_stencil_matches_assembled_kershaw():
    """VaryingStencilOperator (gather-free SpMV for topologically structured
    meshes) must equal the assembled CSR/BSR matvec exactly — wall and
    periodic BCs, scalar and block."""
    import jax.numpy as jnp

    from circulantpreconditioner_tpu.mesh.unstructured import kershaw_mesh
    from circulantpreconditioner_tpu.models import TransportEquation, WaveSystem
    from circulantpreconditioner_tpu.ops.stencil import VaryingStencilOperator

    rng = np.random.default_rng(0)
    m = kershaw_mesh(((0.0, 1.0),) * 3, (4, 3, 2))
    t = TransportEquation(m, velocity=[1.0, 0.5, -0.2], cfl=3.0, dtype=jnp.float64)
    V = VaryingStencilOperator.from_csr(t.divergence, m.topology_shape)
    x = rng.random(m.n_cells)
    np.testing.assert_allclose(np.asarray(V.matvec(jnp.asarray(x))),
                               np.asarray(t.divergence.matvec(jnp.asarray(x))), atol=1e-14)

    w = WaveSystem(m, cfl=10.0, dtype=jnp.float64)
    Vb = VaryingStencilOperator.from_bsr(w.divergence, m.topology_shape)
    xb = rng.random(m.n_cells * 4)
    np.testing.assert_allclose(np.asarray(Vb.matvec(jnp.asarray(xb))),
                               np.asarray(w.divergence.matvec(jnp.asarray(xb))), atol=1e-12)

    m2 = kershaw_mesh(((0.0, 1.0),) * 3, (4, 4, 2))
    m2.set_periodic()
    t2 = TransportEquation(m2, velocity=[1.0, 0.5, -0.2], cfl=3.0, dtype=jnp.float64)
    V2 = VaryingStencilOperator.from_csr(t2.divergence, m2.topology_shape)
    x2 = rng.random(m2.n_cells)
    np.testing.assert_allclose(np.asarray(V2.matvec(jnp.asarray(x2))),
                               np.asarray(t2.divergence.matvec(jnp.asarray(x2))), atol=1e-14)


def test_varying_stencil_rejects_non_stencil():
    """A matrix with non-neighbour coupling must be refused."""
    import jax.numpy as jnp

    from circulantpreconditioner_tpu.ops.csr import CSRMatrix
    from circulantpreconditioner_tpu.ops.stencil import VaryingStencilOperator

    A = CSRMatrix.from_coo(8, 8, [0, 0], [0, 5], [1.0, 2.0], dtype=jnp.float64)
    with pytest.raises(ValueError):
        VaryingStencilOperator.from_csr(A, (2, 2, 2))


def test_wave_auto_dispatches_varying_on_kershaw():
    import jax.numpy as jnp

    from circulantpreconditioner_tpu.mesh.unstructured import kershaw_mesh
    from circulantpreconditioner_tpu.models import WaveSystem
    from circulantpreconditioner_tpu.ops.stencil import (
        VaryingStencilOperator,
        WaveNormalStencilOperator,
    )

    m = kershaw_mesh(((0.0, 1.0),) * 3, (3, 3, 3))
    w = WaveSystem(m, cfl=10.0, dtype=jnp.float64)
    D = w.divergence_op()  # auto
    assert D.func in (WaveNormalStencilOperator.matvec,
                      VaryingStencilOperator.matvec)
    U = w.initial_state()
    # atol scaled to the 1.55e7-magnitude pressures: different (equivalent)
    # summation orders differ at f64 roundoff of the inputs
    np.testing.assert_allclose(np.asarray(D(U)), np.asarray(w.divergence.matvec(U)),
                               atol=1e-5)


def test_wave_normal_stencil_matches_assembled():
    """WaveNormalStencilOperator (the default auto wave path on
    topologically-structured meshes) == assembled BSR, wall and periodic."""
    import jax.numpy as jnp

    from circulantpreconditioner_tpu.mesh.unstructured import kershaw_mesh
    from circulantpreconditioner_tpu.models import WaveSystem
    from circulantpreconditioner_tpu.ops.stencil import (
        VaryingStencilOperator,
        WaveNormalStencilOperator,
    )

    rng = np.random.default_rng(3)
    # NB periodic needs every axis >= 3: with n=2 the +1/-1 roll offsets
    # alias and the merged block leaves the wave normal form (decomposition
    # correctly refuses and the dispatcher falls back to the dense varying
    # stencil).
    for grid, periodic in (((4, 3, 2), False), ((4, 4, 3), True)):
        m = kershaw_mesh(((0.0, 1.0),) * 3, grid)
        if periodic:
            m.set_periodic()
        w = WaveSystem(m, cfl=10.0, dtype=jnp.float64)
        Vfull = VaryingStencilOperator.from_bsr(w.divergence, m.topology_shape)
        V = WaveNormalStencilOperator.from_varying(Vfull, c0=700.0)
        assert V is not None, "wave-form decomposition must succeed"
        x = rng.random(m.n_cells * 4)
        np.testing.assert_allclose(
            np.asarray(V.matvec(jnp.asarray(x))),
            np.asarray(w.divergence.matvec(jnp.asarray(x))), atol=1e-12)


def test_supercell_stencil_tet_mesh_matches_assembled():
    """6-tets-per-hex supercell grouping: the gather-free path extends to
    the FVCA6 tetra family; exact vs assembled for all three models."""
    import jax.numpy as jnp

    from circulantpreconditioner_tpu.mesh.unstructured import tet_mesh
    from circulantpreconditioner_tpu.models import (
        DiffusionEquation,
        TransportEquation,
        WaveSystem,
    )
    from circulantpreconditioner_tpu.ops.stencil import VaryingStencilOperator

    rng = np.random.default_rng(0)
    m = tet_mesh(((0.0, 1.0),) * 3, (3, 2, 4))
    assert m.cells_per_site == 6

    t = TransportEquation(m, velocity=[1.0, 0.5, -0.2], cfl=3.0, dtype=jnp.float64)
    D = t.divergence_op()  # auto → varying supercell
    assert D.func is VaryingStencilOperator.matvec
    x = rng.random(m.n_cells)
    np.testing.assert_allclose(np.asarray(D(jnp.asarray(x))),
                               np.asarray(t.divergence.matvec(jnp.asarray(x))), atol=1e-14)

    w = WaveSystem(m, cfl=10.0, dtype=jnp.float64)
    xb = rng.random(m.n_cells * 4)
    np.testing.assert_allclose(np.asarray(w.divergence_op()(jnp.asarray(xb))),
                               np.asarray(w.divergence.matvec(jnp.asarray(xb))), atol=1e-12)

    d = DiffusionEquation(m, nu=0.5, cfl=20.0, dtype=jnp.float64)
    np.testing.assert_allclose(np.asarray(d.divergence_op()(jnp.asarray(x))),
                               np.asarray(d.divergence.matvec(jnp.asarray(x))), atol=1e-14)

    m2 = tet_mesh(((0.0, 1.0),) * 3, (2, 2, 2))
    m2.set_periodic()
    t2 = TransportEquation(m2, velocity=[1.0, 0.5, 0.25], cfl=2.0, dtype=jnp.float64)
    x2 = rng.random(m2.n_cells)
    np.testing.assert_allclose(np.asarray(t2.divergence_op()(jnp.asarray(x2))),
                               np.asarray(t2.divergence.matvec(jnp.asarray(x2))), atol=1e-14)


def test_field_major_matvec_matches_cell_major():
    """matvec_fm (field-major (m,N) in/out, no relayouts) == matvec for the
    varying and normal-form stencils, flat and grid_last layouts."""
    import numpy as np

    from circulantpreconditioner_tpu.mesh.unstructured import kershaw_mesh
    from circulantpreconditioner_tpu.models import WaveSystem
    from circulantpreconditioner_tpu.ops.stencil import (
        VaryingStencilOperator,
        WaveNormalStencilOperator,
    )

    m = kershaw_mesh(((0.0, 1.0),) * 3, (4, 3, 5))
    model = WaveSystem(m, cfl=50.0, dtype=jnp.float64)
    V = VaryingStencilOperator.from_bsr(model.divergence, m.topology_shape)
    assert V.layout == "flat"
    Wn = WaveNormalStencilOperator.from_varying(V, model.c0)
    rng = np.random.default_rng(0)
    x = rng.random(m.n_cells * 4)
    g = jnp.asarray(x.reshape(-1, 4).T.copy())
    for op in (V, Wn):
        y_cm = np.asarray(op.matvec(jnp.asarray(x)))
        y_fm = np.asarray(op.matvec_fm(g)).T.reshape(-1)
        np.testing.assert_allclose(y_fm, y_cm, atol=1e-13)

    # grid_last layout (periodic wrap)
    m2 = kershaw_mesh(((0.0, 1.0),) * 3, (4, 4, 4))
    m2.set_periodic()
    from circulantpreconditioner_tpu.models import TransportEquation

    t2 = TransportEquation(m2, velocity=[1.0, 0.5, -0.2], cfl=3.0, dtype=jnp.float64)
    V2 = VaryingStencilOperator.from_csr(t2.divergence, m2.topology_shape)
    assert V2.layout == "grid_last"
    x2 = rng.random(m2.n_cells)
    g2 = jnp.asarray(x2.reshape(m2.topology_shape[::-1])[None])  # (1, *grid)
    y2_cm = np.asarray(V2.matvec(jnp.asarray(x2)))
    y2_fm = np.asarray(V2.matvec_fm(g2))[0].reshape(-1)
    np.testing.assert_allclose(y2_fm, y2_cm, atol=1e-13)


def test_explicit_stepper_field_major_matches():
    """The field-major explicit wave stepper gives the same trajectory as
    the cell-major one (the driver's fast path)."""
    import numpy as np

    from circulantpreconditioner_tpu.mesh.unstructured import kershaw_mesh
    from circulantpreconditioner_tpu.models import WaveSystem

    m = kershaw_mesh(((0.0, 1.0),) * 3, (4, 4, 4))
    model = WaveSystem(m, cfl=0.5, dtype=jnp.float64)
    step = model.explicit_stepper()
    step_fm = model.explicit_stepper_fm()
    assert step_fm is not None
    U = model.initial_state()
    G = model.pack_fm(U)
    for _ in range(3):
        U, dn = step(U)
        G, dn_fm = step_fm(G)
    np.testing.assert_allclose(model.unpack_fm(G), np.asarray(U), atol=1e-9)
    assert abs(float(dn) - float(dn_fm)) < 1e-9 * max(float(dn), 1.0)


def test_implicit_stepper_field_major_matches():
    """Field-major implicit GMRES (fm matvec + adapted cell-major two-level
    PC + fm pbjacobi) reproduces the cell-major stepper: same iteration
    count, same solution."""
    import numpy as np

    from circulantpreconditioner_tpu.mesh.unstructured import kershaw_mesh
    from circulantpreconditioner_tpu.models import WaveSystem
    from circulantpreconditioner_tpu.solvers import preconditioners as pcs
    from circulantpreconditioner_tpu.solvers.circulant_pc import DCTBlockProjectionPC

    m = kershaw_mesh(((0.0, 1.0),) * 3, (6, 6, 6))
    model = WaveSystem(m, cfl=333.0, dtype=jnp.float64)
    coarse = DCTBlockProjectionPC(m, model.dt, model.c0, dtype=jnp.float64)

    M_cm = pcs.additive(coarse.apply, pcs.pbjacobi(model.divergence, shift=1.0))
    step_cm = model.implicit_stepper(M=M_cm, rtol=1e-8, atol=1e-10,
                                     maxiter=500, side="right")
    step_fm = model.implicit_stepper_fm(
        M_cm=coarse.apply, M_fm=pcs.pbjacobi_fm(model.divergence, shift=1.0),
        rtol=1e-8, atol=1e-10, maxiter=500, side="right")
    assert step_fm is not None

    U = model.initial_state()
    out_cm = step_cm(U)
    out_fm = step_fm(model.pack_fm(U).reshape(-1))
    assert bool(out_cm[4]) and bool(out_fm[4])
    assert int(out_cm[2]) == int(out_fm[2]), (int(out_cm[2]), int(out_fm[2]))
    np.testing.assert_allclose(model.unpack_fm(out_fm[0]), np.asarray(out_cm[0]),
                               rtol=1e-9, atol=1e-9 * float(jnp.abs(out_cm[0]).max()))


def test_explicit_stepper_field_major_supercell_tet():
    """Field-major explicit stepping on a TET mesh (6 cells/site supercell,
    fm_block = 24) matches the cell-major trajectory — guards the
    pack/unpack granularity on supercell meshes."""
    import numpy as np

    from circulantpreconditioner_tpu.mesh.unstructured import tet_mesh
    from circulantpreconditioner_tpu.models import WaveSystem

    m = tet_mesh(((0.0, 1.0),) * 3, (3, 3, 3))
    model = WaveSystem(m, cfl=0.5, dtype=jnp.float64)
    assert model.fm_block == 24
    step = model.explicit_stepper()
    step_fm = model.explicit_stepper_fm()
    assert step_fm is not None
    # implicit fm path must REFUSE supercell meshes (per-cell PC mismatch)
    assert model.implicit_matvec_fm() is None
    U = model.initial_state()
    G = model.pack_fm(U)
    for _ in range(3):
        U, _ = step(U)
        G, _ = step_fm(G)
    np.testing.assert_allclose(model.unpack_fm(G), np.asarray(U), atol=1e-9)
