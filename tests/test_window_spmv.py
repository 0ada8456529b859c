"""Clustered-window dense SpMV (ops/window_spmv.py) — exactness vs the
assembled operator, on synthetic matrices and on the reference's unstructured
tetra fixtures (the ladder half with no grid topology,
/root/reference/meshes/README.md:22-33)."""

import os

import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

from circulantpreconditioner_tpu.ops.csr import BSRMatrix, CSRMatrix
from circulantpreconditioner_tpu.ops.window_spmv import WindowedBlockOperator

MESHES = "/root/reference/meshes"


@pytest.mark.parametrize("n,b,G,unit", [(37, 1, 8, 1), (64, 4, 8, 2),
                                        (100, 4, 16, 4), (129, 2, 8, 2),
                                        (41, 3, 8, 2)])
def test_window_matches_bsr_random_banded(n, b, G, unit):
    rng = np.random.default_rng(n)
    rows, cols = [], []
    for i in range(n):
        nb = rng.integers(1, 6)
        for j in np.unique(np.clip(i + rng.integers(-9, 10, nb), 0, n - 1)):
            rows.append(i)
            cols.append(int(j))
    rows = np.asarray(rows)
    cols = np.asarray(cols)
    blocks = rng.standard_normal((len(rows), b, b))
    A = BSRMatrix.from_block_coo(n, n, rows, cols, blocks, dtype=jnp.float64)
    W = WindowedBlockOperator.from_bsr(A, G=G, unit=unit)
    x = jnp.asarray(rng.standard_normal(n * b))
    np.testing.assert_allclose(np.asarray(W.matvec(x)), np.asarray(A.matvec(x)),
                               rtol=1e-12, atol=1e-12)


def test_window_from_csr_scalar():
    rng = np.random.default_rng(3)
    n = 83
    D = sp.random(n, n, density=0.08, random_state=7, format="csr") + sp.eye(n)
    A = CSRMatrix.from_scipy(D.tocsr(), dtype=jnp.float64)
    W = WindowedBlockOperator.from_csr(A, G=8)
    x = rng.standard_normal(n)
    np.testing.assert_allclose(np.asarray(W.matvec(jnp.asarray(x))),
                               D @ x, rtol=1e-12, atol=1e-12)


@pytest.mark.skipif(not os.path.isdir(MESHES),
                    reason="reference mesh fixtures not available")
def test_window_matches_assembled_on_kershawtetra1():
    """End-to-end on the welded+RCM-ordered fixture: the windowed wave
    operator equals the assembled BSR exactly, and the union padding stays
    in the measured band (G=8: U ≤ 48)."""
    from circulantpreconditioner_tpu.mesh import read_mesh
    from circulantpreconditioner_tpu.models import WaveSystem

    m = read_mesh(os.path.join(MESHES, "3DTetrahedra_Kershaw/3DKershawTetra1.med"))
    assert getattr(m, "bandwidth_ordered", False)
    model = WaveSystem(m, dt=1e-4, dtype=jnp.float64)
    A = model.divergence
    W = WindowedBlockOperator.from_bsr(A, G=8, unit=2)
    assert W.src.shape[1] <= 32, W.src.shape
    x = jnp.asarray(np.random.default_rng(0).standard_normal(m.n_cells * 4))
    np.testing.assert_allclose(np.asarray(W.matvec(x)), np.asarray(A.matvec(x)),
                               rtol=1e-12, atol=1e-9)


def test_rectangular_multivector_matches_scipy():
    """Rectangular (n_bcols != n_brows) windowed operator + matvec_multi —
    the projection-matrix apply path of the two-level PCs
    (solvers/circulant_pc.py)."""
    rng = np.random.default_rng(7)
    n_rows, n_cols, m = 53, 131, 4
    dens = sp.random(n_rows, n_cols, density=0.08, random_state=3,
                     format="csr")
    dens.data[:] = rng.standard_normal(dens.nnz)
    A = CSRMatrix.from_scipy(dens, dtype=jnp.float64)
    W = WindowedBlockOperator.from_csr(A, G=8, unit=8)
    assert W.shape == (n_rows, n_cols)
    x = rng.standard_normal(n_cols)
    np.testing.assert_allclose(np.asarray(W.matvec(jnp.asarray(x))),
                               dens @ x, rtol=1e-12, atol=1e-12)
    X = rng.standard_normal((n_cols, m))
    np.testing.assert_allclose(np.asarray(W.matvec_multi(jnp.asarray(X))),
                               dens @ X, rtol=1e-12, atol=1e-12)


def test_empty_cluster_points_at_own_unit():
    """A cluster with no stored blocks must not reference unit 0 (it would
    inflate the halo width HaloWindowOperator derives from src)."""
    rows = np.array([0, 1, 30, 31])
    cols = np.array([0, 1, 30, 31])
    blocks = np.ones((4, 1, 1))
    W = WindowedBlockOperator.from_block_coo(32, rows, cols, blocks, G=8,
                                             unit=2)
    src = np.asarray(W.src)
    # clusters 1 and 2 (rows 8..23) are empty: their src must stay near
    # their own rows, not at unit 0
    assert src[1].min() >= 4 and src[2].min() >= 8
    x = jnp.asarray(np.arange(32, dtype=np.float64))
    np.testing.assert_allclose(np.asarray(W.matvec(x))[[0, 1, 30, 31]],
                               [0, 1, 30, 31], rtol=1e-12)
