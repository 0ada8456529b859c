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
