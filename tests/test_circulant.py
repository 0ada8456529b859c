"""Oracle tests for the circulant FFT direct solver.

Manufactured-solution pattern carried over from the reference's oracles
(/root/reference/tests/FFTDirectSolver/testFftSolver_{1,2,3}D.py and .c):
build the dense block-circulant C explicitly via Kronecker products, set
b = C @ x_ref, solve with the FFT pipeline, assert relative error/residual.
"""

import numpy as np
import pytest
import scipy.linalg as spl
from scipy.fft import fft

import jax.numpy as jnp

from circulantpreconditioner_tpu.ops.circulant import (
    BlockCirculantOperator,
    CirculantTransportOperator,
    eigenvalue_diagonal,
    stencil_symbol,
    transport_column,
    transport_spectrum,
)


def np_circulant_col(n):
    col = np.zeros(n)
    col[0] = 1.0
    col[1] = -1.0
    return col


def dense_C(shape_xyz, lambdas_xyz):
    """Dense block-circulant operator, same Kronecker layout as the oracle
    (testFftSolver_3D.py build_C_3D)."""
    n_x, n_y, n_z = (list(shape_xyz) + [1, 1])[:3]
    lx, ly, lz = (list(lambdas_xyz) + [0.0, 0.0])[:3]
    Cx = spl.circulant(np_circulant_col(n_x)) if n_x > 1 else np.zeros((1, 1))
    Cy = spl.circulant(np_circulant_col(n_y)) if n_y > 1 else np.zeros((1, 1))
    Cz = spl.circulant(np_circulant_col(n_z)) if n_z > 1 else np.zeros((1, 1))
    N = n_x * n_y * n_z
    C = np.eye(N)
    C += lx * np.kron(np.eye(n_y * n_z), Cx)
    C += ly * np.kron(np.eye(n_z), np.kron(Cy, np.eye(n_x)))
    C += lz * np.kron(Cz, np.eye(n_x * n_y))
    return C


def test_transport_spectrum_matches_fft():
    for n in [2, 3, 8, 17]:
        got = np.asarray(transport_spectrum(n, jnp.float64))
        want = fft(np_circulant_col(n))
        np.testing.assert_allclose(got, want, atol=1e-12)
        col = np.asarray(transport_column(n, jnp.float64))
        np.testing.assert_allclose(fft(col), want, atol=1e-12)


def test_eigenvalue_diagonal_matches_oracle_layout():
    """Λ flattened C-order equals the oracle's tile/repeat formula
    (testFftSolver_3D.py:35)."""
    n_x, n_y, n_z = 4, 3, 5
    lx, ly, lz = 0.7, 0.3, 0.1
    cx, cy, cz = (fft(np_circulant_col(n)) for n in (n_x, n_y, n_z))
    want = (
        1
        + lx * np.tile(cx, n_y * n_z)
        + ly * np.repeat(np.tile(cy, n_z), n_x)
        + lz * np.repeat(cz, n_x * n_y)
    )
    lam = eigenvalue_diagonal((n_z, n_y, n_x), (lz, ly, lx), jnp.float64)
    np.testing.assert_allclose(np.asarray(lam).reshape(-1), want, atol=1e-12)


def test_eigenvalue_diagonal_equals_generic_symbol():
    shape = (5, 3, 4)
    lams = (0.25, 0.5, 1.5)
    lam = eigenvalue_diagonal(shape, lams, jnp.float64)
    # C = I + Σ_d λ_d (I - S_d): identity offset + for each axis offsets 0,-1
    offsets = [(0, 0, 0)]
    coeffs = [1.0 + sum(lams)]
    for ax, l in enumerate(lams):
        off = [0, 0, 0]
        off[ax] = -1
        offsets.append(tuple(off))
        coeffs.append(-l)
    sym = stencil_symbol(shape, offsets, coeffs, jnp.float64)
    np.testing.assert_allclose(np.asarray(lam), np.asarray(sym), atol=1e-12)


@pytest.mark.parametrize(
    "shape_xyz,lambdas_xyz",
    [
        ((8,), (1.0,)),
        ((10, 25), (3.0, 0.15)),
        ((10, 25, 40), (0.6, 0.15, 0.02)),  # oracle's 3D config λ=a·dt/Δ
        ((4, 4, 4), (10.0, 10.0, 10.0)),  # large-CFL regime
    ],
)
def test_solve_manufactured(shape_xyz, lambdas_xyz):
    rng = np.random.default_rng(123)
    C = dense_C(shape_xyz, lambdas_xyz)
    N = C.shape[0]
    x_ref = rng.random(N)
    b = C @ x_ref
    shape_zyx = tuple(reversed(shape_xyz))
    lambdas_zyx = tuple(reversed(lambdas_xyz))
    op = CirculantTransportOperator.create(shape_zyx, lambdas_zyx, jnp.float64)
    x = np.asarray(op.solve(jnp.asarray(b)))
    assert np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref) < 1e-10
    assert np.linalg.norm(C @ x - b) / np.linalg.norm(b) < 1e-10
    # real path == complex path (replaces the reference's packed real-FFT
    # machinery, VecPointwiseDivideForRealFFT)
    xc = np.asarray(op.solve(jnp.asarray(b, dtype=jnp.complex128)))
    np.testing.assert_allclose(xc.real, x, atol=1e-10)
    np.testing.assert_allclose(xc.imag, 0.0, atol=1e-10)


def test_from_transport_lambda_formula():
    op = CirculantTransportOperator.from_transport(
        n_xyz=(10, 25, 40),
        velocity_xyz=(6.0, 3.0, 1.0),
        dt=0.01,
        spacing_xyz=(0.1, 0.2, 0.5),
        dtype=jnp.float64,
    )
    assert op.shape_zyx == (40, 25, 10)
    np.testing.assert_allclose(op.lambdas_zyx, (1.0 * 0.01 / 0.5, 3.0 * 0.01 / 0.2, 6.0 * 0.01 / 0.1))


def test_matvec_matches_dense():
    shape_xyz = (6, 4, 3)
    lambdas_xyz = (0.9, 0.4, 0.2)
    C = dense_C(shape_xyz, lambdas_xyz)
    rng = np.random.default_rng(7)
    u = rng.random(C.shape[0])
    op = CirculantTransportOperator.create(
        tuple(reversed(shape_xyz)), tuple(reversed(lambdas_xyz)), jnp.float64
    )
    got = np.asarray(op.matvec(jnp.asarray(u)))
    np.testing.assert_allclose(got, C @ u, atol=1e-12)


def test_solve_float32_precision():
    op = CirculantTransportOperator.create((16, 16, 16), (0.5, 0.5, 0.5), jnp.float32)
    rng = np.random.default_rng(3)
    x_ref = rng.random(16**3).astype(np.float32)
    b = np.asarray(op.matvec(jnp.asarray(x_ref)))
    x = np.asarray(op.solve(jnp.asarray(b)))
    assert np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref) < 1e-5


def test_block_circulant_scalar_reduces_to_circulant():
    shape = (4, 3, 5)
    lams = (0.3, 0.7, 1.1)
    offsets = [(0, 0, 0)]
    blocks = [np.array([[1.0 + sum(lams)]])]
    for ax, l in enumerate(lams):
        off = [0, 0, 0]
        off[ax] = -1
        offsets.append(tuple(off))
        blocks.append(np.array([[-l]]))
    op = BlockCirculantOperator.from_stencil(shape, offsets, np.array(blocks), jnp.float64)
    sc = CirculantTransportOperator.create(shape, lams, jnp.float64)
    rng = np.random.default_rng(11)
    b = rng.random(np.prod(shape))
    np.testing.assert_allclose(
        np.asarray(op.solve(jnp.asarray(b))), np.asarray(sc.solve(jnp.asarray(b))), atol=1e-10
    )


def test_block_circulant_manufactured_2x2():
    """Random symmetric-dominant 2x2-block periodic stencil in 2D: dense
    block-circulant assembly vs. FFT block solve."""
    rng = np.random.default_rng(42)
    nz, ny = 4, 6  # use axes (z,y) with m=2 blocks
    m = 2
    offsets = [(0, 0), (-1, 0), (1, 0), (0, -1), (0, 1)]
    blocks = rng.normal(size=(len(offsets), m, m)) * 0.1
    blocks[0] += 3 * np.eye(m)  # dominance → invertible symbol
    N = nz * ny
    dense = np.zeros((N * m, N * m))
    for (oz, oy), B in zip(offsets, blocks):
        for z in range(nz):
            for y in range(ny):
                r = z * ny + y
                c = ((z + oz) % nz) * ny + (y + oy) % ny
                dense[r * m : r * m + m, c * m : c * m + m] += B
    x_ref = rng.random(N * m)
    b = dense @ x_ref
    op = BlockCirculantOperator.from_stencil((nz, ny), offsets, blocks, jnp.float64)
    x = np.asarray(op.solve(jnp.asarray(b)))
    assert np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref) < 1e-10
