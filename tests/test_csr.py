"""CSR/BSR/ELL container and SpMV tests against SciPy."""

import numpy as np
import scipy.sparse as sp

import jax.numpy as jnp

from circulantpreconditioner_tpu.ops.csr import BSRMatrix, CSRMatrix


def random_csr(rng, n, m, density=0.1):
    A = sp.random(n, m, density=density, random_state=np.random.RandomState(0), format="csr")
    A.data = rng.normal(size=A.data.shape)
    return A


def test_csr_from_coo_sums_duplicates():
    rows = [0, 0, 1, 2, 0]
    cols = [1, 1, 2, 0, 1]
    vals = [1.0, 2.0, 3.0, 4.0, 5.0]
    A = CSRMatrix.from_coo(3, 3, rows, cols, vals, dtype=jnp.float64)
    dense = A.to_dense()
    want = np.zeros((3, 3))
    want[0, 1] = 8.0
    want[1, 2] = 3.0
    want[2, 0] = 4.0
    np.testing.assert_allclose(dense, want)
    assert A.nnz == 3


def test_csr_matvec_matches_scipy():
    rng = np.random.default_rng(0)
    A = random_csr(rng, 50, 40)
    Aj = CSRMatrix.from_scipy(A, dtype=jnp.float64)
    x = rng.normal(size=40)
    np.testing.assert_allclose(np.asarray(Aj.matvec(jnp.asarray(x))), A @ x, atol=1e-12)
    np.testing.assert_allclose(np.asarray(Aj @ jnp.asarray(x)), A @ x, atol=1e-12)


def test_csr_diagonal():
    rng = np.random.default_rng(1)
    A = random_csr(rng, 30, 30, density=0.2)
    A = A + sp.eye(30) * 2.0
    Aj = CSRMatrix.from_scipy(A.tocsr(), dtype=jnp.float64)
    np.testing.assert_allclose(np.asarray(Aj.diagonal()), A.diagonal(), atol=1e-12)


def test_ell_matvec_matches_scipy():
    rng = np.random.default_rng(2)
    A = random_csr(rng, 37, 37, density=0.15)
    Aj = CSRMatrix.from_scipy(A, dtype=jnp.float64)
    E = Aj.to_ell()
    x = rng.normal(size=37)
    np.testing.assert_allclose(np.asarray(E.matvec(jnp.asarray(x))), A @ x, atol=1e-12)


def test_bsr_matvec_and_blockdiag():
    rng = np.random.default_rng(3)
    nb, b = 12, 3
    brows, bcols, blocks = [], [], []
    for i in range(nb):
        for j in [i, (i + 1) % nb, (i - 1) % nb, i]:  # duplicate diag on purpose
            brows.append(i)
            bcols.append(j)
            blocks.append(rng.normal(size=(b, b)))
    A = BSRMatrix.from_block_coo(nb, nb, brows, bcols, np.array(blocks), dtype=jnp.float64)
    dense = A.to_dense()
    x = rng.normal(size=nb * b)
    np.testing.assert_allclose(np.asarray(A.matvec(jnp.asarray(x))), dense @ x, atol=1e-12)
    D = np.asarray(A.block_diagonal())
    for i in range(nb):
        np.testing.assert_allclose(D[i], dense[i * b : (i + 1) * b, i * b : (i + 1) * b], atol=1e-12)
    Acsr = A.to_csr(dtype=jnp.float64)
    np.testing.assert_allclose(np.asarray(Acsr.matvec(jnp.asarray(x))), dense @ x, atol=1e-12)
