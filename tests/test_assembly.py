"""FV assembly tests: vectorized scatter-add vs slow reference-style loops
and vs the circulant operator on periodic grids."""

import numpy as np
import pytest

import jax.numpy as jnp

from circulantpreconditioner_tpu.mesh import cartesian_mesh
from circulantpreconditioner_tpu.ops.assembly import (
    transport_divergence_csr,
    wave_block_stencil,
    wave_divergence_bsr,
    wave_jacobian_blocks,
)
from circulantpreconditioner_tpu.ops.circulant import (
    BlockCirculantOperator,
    CirculantTransportOperator,
)


def slow_transport_divergence(mesh, dt, a):
    """Reference-style cell×face loop (TransportEquation.cxx:75-133 with the
    neighbour-sign defect corrected: D[j,other] += coeff·un for un<0)."""
    n = mesh.n_cells
    D = np.zeros((n, n))
    for f in range(mesh.n_faces):
        L, R = mesh.face_cells[f]
        area = mesh.face_area[f]
        nrm = mesh.face_normal[f]
        sides = [(L, R, nrm)]
        if R >= 0:
            sides.append((R, L, -nrm))
        for (j, other, normal) in sides:
            un = float(normal @ a[: mesh.dim])
            coeff = dt * area / mesh.cell_volume[j]
            if other >= 0:
                if un > 0:
                    D[j, j] += coeff * un
                else:
                    D[j, other] += coeff * un
            else:
                group = mesh.face_group[f]
                if mesh.periodic_twin is not None and group == mesh.groups.get("Periodic", -99):
                    twin = mesh.periodic_twin[f]
                    if un > 0:
                        D[j, j] += coeff * un
                    else:
                        D[j, twin] += coeff * un
                # else Neumann/Wall: nothing
    return D


def slow_wave_divergence(mesh, dt, c0):
    """Reference-style loop for the wave system (WaveSystem.cxx:109-176)."""
    dim = mesh.dim
    nb = dim + 1
    n = mesh.n_cells
    D = np.zeros((n * nb, n * nb))
    per = mesh.groups.get("Periodic", -99)
    neu = mesh.groups.get("Neumann", -98)
    for f in range(mesh.n_faces):
        L, R = mesh.face_cells[f]
        area = mesh.face_area[f]
        nrm = mesh.face_normal[f]
        sides = [(L, R, nrm)]
        if R >= 0:
            sides.append((R, L, -nrm))
        for (j, other, normal) in sides:
            coeff = dt * area / mesh.cell_volume[j]
            A, absA = wave_jacobian_blocks(normal[None, :], c0)
            Am = 0.5 * (A[0] - absA[0]) * coeff
            if other >= 0:
                D[j * nb:(j + 1) * nb, other * nb:(other + 1) * nb] += Am
                D[j * nb:(j + 1) * nb, j * nb:(j + 1) * nb] -= Am
            else:
                g = mesh.face_group[f]
                if g == per and mesh.periodic_twin is not None:
                    tw = mesh.periodic_twin[f]
                    D[j * nb:(j + 1) * nb, tw * nb:(tw + 1) * nb] += Am
                    D[j * nb:(j + 1) * nb, j * nb:(j + 1) * nb] -= Am
                elif g == neu:
                    pass
                else:  # Wall mirror
                    v = np.zeros(nb)
                    v[1:] = normal
                    D[j * nb:(j + 1) * nb, j * nb:(j + 1) * nb] += -Am @ (2 * np.outer(v, v))
    return D


@pytest.mark.parametrize("periodic", [False, True])
def test_transport_assembly_matches_slow_loop(periodic):
    m = cartesian_mesh(((0, 1), (0, 1)), (4, 3), periodic=periodic)
    a = np.array([1.0, -0.7])
    dt = 0.01
    D = transport_divergence_csr(m, dt, a, dtype=jnp.float64)
    Dref = slow_transport_divergence(m, dt, a)
    np.testing.assert_allclose(D.to_dense(), Dref, atol=1e-13)


def test_transport_periodic_equals_circulant():
    """On a periodic uniform grid the assembled I+D is EXACTLY the circulant
    operator diagonalized by ops/circulant.py."""
    n = (5, 4, 3)
    m = cartesian_mesh(((0, 1), (0, 1), (0, 1)), n, periodic=True)
    a = np.array([1.0, 2.0, 0.5])
    dt = 0.01
    D = transport_divergence_csr(m, dt, a, dtype=jnp.float64)
    op = CirculantTransportOperator.from_transport(n, a, dt, m.spacing, dtype=jnp.float64)
    rng = np.random.default_rng(0)
    u = rng.random(m.n_cells)
    lhs = u + np.asarray(D.matvec(jnp.asarray(u)))
    rhs = np.asarray(op.matvec(jnp.asarray(u)))
    np.testing.assert_allclose(lhs, rhs, atol=1e-12)
    # ... and the FFT solve inverts the assembled matrix
    x = np.asarray(op.solve(jnp.asarray(u)))
    np.testing.assert_allclose(x + np.asarray(D.matvec(jnp.asarray(x))), u, atol=1e-10)


def test_transport_mass_conservation_periodic():
    m = cartesian_mesh(((0, 1), (0, 1)), (6, 6), periodic=True)
    D = transport_divergence_csr(m, 0.02, [1.0, 0.3], dtype=jnp.float64)
    # conservative flux form: column sums of D vanish → explicit step
    # preserves total mass
    np.testing.assert_allclose(D.to_dense().sum(axis=0), 0.0, atol=1e-13)


@pytest.mark.parametrize("periodic", [False, True])
def test_wave_assembly_matches_slow_loop(periodic):
    m = cartesian_mesh(((0, 1), (0, 1)), (3, 3), periodic=periodic)
    dt = 1e-4
    c0 = 700.0
    D = wave_divergence_bsr(m, dt, c0, dtype=jnp.float64)
    Dref = slow_wave_divergence(m, dt, c0)
    np.testing.assert_allclose(D.to_dense(), Dref, atol=1e-9)


def test_wave_assembly_3d_wall():
    m = cartesian_mesh(((0, 1),) * 3, (2, 3, 2))
    dt = 1e-4
    D = wave_divergence_bsr(m, dt, 700.0, dtype=jnp.float64)
    Dref = slow_wave_divergence(m, dt, 700.0)
    np.testing.assert_allclose(D.to_dense(), Dref, atol=1e-9)


def test_wave_periodic_equals_block_stencil_symbol():
    """Periodic wave assembly == the block stencil fed to the block-circulant
    solver, and the solver inverts I + D."""
    n = (4, 3)
    m = cartesian_mesh(((0, 1), (0, 1)), n, periodic=True)
    dt = 1e-4
    c0 = 700.0
    D = wave_divergence_bsr(m, dt, c0, dtype=jnp.float64)
    dense = np.eye(D.shape[0]) + D.to_dense()
    offsets, blocks = wave_block_stencil(m.dim, dt, c0, m.spacing)
    op = BlockCirculantOperator.from_stencil(tuple(reversed(n)), offsets, blocks, jnp.float64)
    rng = np.random.default_rng(1)
    x_ref = rng.random(D.shape[0])
    b = dense @ x_ref
    x = np.asarray(op.solve(jnp.asarray(b)))
    np.testing.assert_allclose(x, x_ref, rtol=1e-8, atol=1e-8)
