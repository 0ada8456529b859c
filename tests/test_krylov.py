"""Krylov solver + preconditioner tests (vs SciPy direct solves)."""

import os
import warnings

import numpy as np
import pytest
import scipy.sparse as sp
import scipy.sparse.linalg as spla

import jax.numpy as jnp

from circulantpreconditioner_tpu.ops.circulant import CirculantTransportOperator
from circulantpreconditioner_tpu.ops.csr import CSRMatrix
from circulantpreconditioner_tpu.solvers import bicgstab, cg, gmres, make_gmres
from circulantpreconditioner_tpu.solvers import preconditioners as pcs


def upwind_1d_periodic(n, lam, dtype=np.float64):
    """I + lam*(I - S): the 1D implicit upwind operator (circulant)."""
    main = (1 + lam) * np.ones(n)
    lower = -lam * np.ones(n - 1)
    A = sp.diags([main, lower], [0, -1]).tolil()
    A[0, n - 1] = -lam
    return A.tocsr().astype(dtype)


def laplace_2d(nx, ny, dtype=np.float64):
    ex = np.ones(nx)
    ey = np.ones(ny)
    Tx = sp.diags([2 * ex, -ex[:-1], -ex[:-1]], [0, -1, 1])
    Ty = sp.diags([2 * ey, -ey[:-1], -ey[:-1]], [0, -1, 1])
    return (sp.kronsum(Tx, Ty) + 0.05 * sp.eye(nx * ny)).tocsr().astype(dtype)


def test_gmres_unpreconditioned_matches_direct():
    rng = np.random.default_rng(0)
    A = upwind_1d_periodic(64, 3.0)
    b = rng.normal(size=64)
    Aj = CSRMatrix.from_scipy(A, dtype=jnp.float64)
    res = gmres(Aj.matvec, jnp.asarray(b), rtol=1e-10, atol=1e-12)
    x_ref = spla.spsolve(A, b)
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.x), x_ref, rtol=1e-8, atol=1e-8)


def test_gmres_restart_path():
    rng = np.random.default_rng(1)
    A = laplace_2d(12, 12)
    b = rng.normal(size=A.shape[0])
    Aj = CSRMatrix.from_scipy(A, dtype=jnp.float64)
    res = gmres(Aj.matvec, jnp.asarray(b), restart=10, rtol=1e-8, atol=1e-10, maxiter=2000)
    assert bool(res.converged)
    assert int(res.iters) > 10  # forced through at least one restart
    x_ref = spla.spsolve(A, b)
    np.testing.assert_allclose(np.asarray(res.x), x_ref, rtol=1e-5, atol=1e-6)


def test_gmres_tolerance_semantics():
    """PETSc KSPConvergedDefault: stop when ||r_pre|| < max(rtol*||b_pre||, atol)."""
    rng = np.random.default_rng(2)
    A = upwind_1d_periodic(128, 10.0)
    b = rng.normal(size=128)
    Aj = CSRMatrix.from_scipy(A, dtype=jnp.float64)
    res = gmres(Aj.matvec, jnp.asarray(b), rtol=1e-5, atol=1e-50)
    r = b - A @ np.asarray(res.x)
    assert np.linalg.norm(r) < 1e-5 * np.linalg.norm(b) * 1.01


def test_gmres_with_jacobi_pc():
    rng = np.random.default_rng(3)
    A = laplace_2d(10, 10) + sp.diags(rng.random(100) * 5)
    A = A.tocsr()
    b = rng.normal(size=100)
    Aj = CSRMatrix.from_scipy(A, dtype=jnp.float64)
    M = pcs.jacobi(Aj)
    res = gmres(Aj.matvec, jnp.asarray(b), M=M, rtol=1e-8, atol=1e-10)
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.x), spla.spsolve(A, b), rtol=1e-5, atol=1e-6)


def test_gmres_with_circulant_pc_is_direct():
    """The circulant PC applied to the exactly-circulant operator must make
    GMRES converge in one iteration (M = A⁻¹)."""
    op = CirculantTransportOperator.create((32,), (5.0,), jnp.float64)
    A = upwind_1d_periodic(32, 5.0)
    rng = np.random.default_rng(4)
    b = rng.normal(size=32)
    Aj = CSRMatrix.from_scipy(A, dtype=jnp.float64)
    res = gmres(Aj.matvec, jnp.asarray(b), M=op.as_preconditioner(), rtol=1e-10, atol=1e-12)
    assert bool(res.converged)
    assert int(res.iters) <= 2
    np.testing.assert_allclose(np.asarray(res.x), spla.spsolve(A, b), rtol=1e-8, atol=1e-8)


def test_cg_spd():
    rng = np.random.default_rng(5)
    A = laplace_2d(15, 15)
    b = rng.normal(size=A.shape[0])
    Aj = CSRMatrix.from_scipy(A, dtype=jnp.float64)
    res = cg(Aj.matvec, jnp.asarray(b), M=pcs.jacobi(Aj), rtol=1e-10, atol=1e-12)
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.x), spla.spsolve(A, b), rtol=1e-6, atol=1e-7)


def test_bicgstab_nonsymmetric():
    rng = np.random.default_rng(6)
    A = upwind_1d_periodic(100, 2.0)
    b = rng.normal(size=100)
    Aj = CSRMatrix.from_scipy(A, dtype=jnp.float64)
    res = bicgstab(Aj.matvec, jnp.asarray(b), rtol=1e-10, atol=1e-12)
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.x), spla.spsolve(A, b), rtol=1e-6, atol=1e-6)


def test_ilu0_exact_for_triangular_pattern():
    """For a matrix whose LU factors fit the sparsity pattern (here: a lower
    bidiagonal + diagonal), ILU(0) is an exact factorization."""
    n = 50
    A = sp.diags([2 * np.ones(n), -np.ones(n - 1)], [0, -1]).tocsr()
    Aj = CSRMatrix.from_scipy(A, dtype=jnp.float64)
    M = pcs.ilu0(Aj)
    rng = np.random.default_rng(7)
    r = rng.normal(size=n)
    np.testing.assert_allclose(np.asarray(M.apply(jnp.asarray(r))), spla.spsolve(A, r), atol=1e-12)


def test_ilu0_apply_matches_dense_triangular_solves():
    rng = np.random.default_rng(8)
    A = laplace_2d(8, 8)
    Aj = CSRMatrix.from_scipy(A, dtype=jnp.float64)
    from circulantpreconditioner_tpu.solvers.preconditioners import _ilu0_factor_host

    indptr, indices = np.asarray(Aj.indptr), np.asarray(Aj.indices)
    f, diag_pos = _ilu0_factor_host(indptr, indices, np.asarray(Aj.data))
    n = A.shape[0]
    L = np.eye(n)
    U = np.zeros((n, n))
    for i in range(n):
        for p in range(indptr[i], indptr[i + 1]):
            j = indices[p]
            if j < i:
                L[i, j] = f[p]
            else:
                U[i, j] = f[p]
    M = pcs.ilu0(Aj)
    r = rng.normal(size=n)
    want = np.linalg.solve(U, np.linalg.solve(L, r))
    np.testing.assert_allclose(np.asarray(M.apply(jnp.asarray(r))), want, atol=1e-10)


def test_gmres_ilu0_accelerates():
    rng = np.random.default_rng(9)
    A = laplace_2d(20, 20)
    b = rng.normal(size=A.shape[0])
    Aj = CSRMatrix.from_scipy(A, dtype=jnp.float64)
    res_plain = gmres(Aj.matvec, jnp.asarray(b), rtol=1e-8, atol=1e-10, maxiter=2000)
    M = pcs.ilu0(Aj)
    res_ilu = gmres(Aj.matvec, jnp.asarray(b), M=M.apply, rtol=1e-8, atol=1e-10, maxiter=2000)
    assert bool(res_ilu.converged)
    assert int(res_ilu.iters) < int(res_plain.iters)
    np.testing.assert_allclose(np.asarray(res_ilu.x), spla.spsolve(A, b), rtol=1e-5, atol=1e-6)


def test_block_jacobi_ilu0():
    rng = np.random.default_rng(10)
    A = laplace_2d(16, 16)
    b = rng.normal(size=A.shape[0])
    Aj = CSRMatrix.from_scipy(A, dtype=jnp.float64)
    M = pcs.block_jacobi_ilu0(Aj, 4)
    res = gmres(Aj.matvec, jnp.asarray(b), M=M, rtol=1e-8, atol=1e-10, maxiter=2000)
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.x), spla.spsolve(A, b), rtol=1e-5, atol=1e-6)


def test_make_gmres_reusable():
    """make_gmres returns a jitted solver reusable across RHS without retrace."""
    A = upwind_1d_periodic(32, 1.0)
    Aj = CSRMatrix.from_scipy(A, dtype=jnp.float64)
    solver = make_gmres(Aj.matvec, rtol=1e-10, atol=1e-12)
    rng = np.random.default_rng(11)
    for _ in range(3):
        b = rng.normal(size=32)
        res = solver(jnp.asarray(b), None)
        np.testing.assert_allclose(np.asarray(res.x), spla.spsolve(A, b), rtol=1e-7, atol=1e-8)


def _ilu0_numpy(A, n):
    """Textbook IKJ ILU(0) on the CSR pattern — the independent oracle
    factorization (SuperLU's zero-fill ILU is exactly singular on the wave
    matrix, so the canonical algorithm is implemented here directly)."""
    A = A.tocsr().copy().astype(np.float64)
    A.sort_indices()  # searchsorted below requires per-row sorted columns
    indptr, ind, data = A.indptr, A.indices, A.data
    for i in range(n):
        cols = ind[indptr[i]:indptr[i + 1]]
        for kk in range(indptr[i], indptr[i + 1]):
            k = ind[kk]
            if k >= i:
                break
            dk = None
            for t in range(indptr[k], indptr[k + 1]):
                if ind[t] == k:
                    dk = data[t]
                    break
            assert dk is not None, f"ILU(0) pivot row {k} has no stored diagonal"
            data[kk] /= dk
            lik = data[kk]
            for t in range(indptr[k], indptr[k + 1]):
                j = ind[t]
                if j <= k:
                    continue
                pos = np.searchsorted(cols, j)
                if pos < len(cols) and cols[pos] == j:
                    data[indptr[i] + pos] -= lik * data[t]
    return A


def _wave_system_50x50(cfl):
    from circulantpreconditioner_tpu.mesh import cartesian_mesh
    from circulantpreconditioner_tpu.models import WaveSystem

    m = cartesian_mesh(((0.0, 1.0),) * 2, (50, 50))
    model = WaveSystem(m, cfl=cfl, dtype=jnp.float64)
    D = model.divergence.to_csr(jnp.float64).to_scipy()
    A = (sp.eye(D.shape[0]) + D).tocsr()
    b = np.asarray(model.initial_state(), dtype=np.float64)
    return A, b


def _scipy_ilu0_gmres(A, b, maxiter_restarts):
    n = A.shape[0]
    F = _ilu0_numpy(A, n)
    L = (sp.tril(F, k=-1) + sp.eye(n)).tocsr()
    U = sp.triu(F).tocsr()

    def Msolve(r):
        y = spla.spsolve_triangular(L, r, lower=True, unit_diagonal=True)
        return spla.spsolve_triangular(U, y, lower=False)

    counts = {"n": 0}

    def cb(pr_norm):
        counts["n"] += 1

    x, info = spla.gmres(A, b, M=spla.LinearOperator(A.shape, Msolve),
                         restart=30, rtol=1e-5, atol=1e-5 * np.linalg.norm(b),
                         maxiter=maxiter_restarts, callback=cb,
                         callback_type="pr_norm")
    return x, info, counts["n"]


def test_gmres_ilu0_iteration_parity_reference_config():
    """Iteration-count parity oracle on the reference's implicit-wave setup.

    Reference: WaveSystem_SphericalExplosion_impl_seq.cxx:31-33,95-101 — the
    50×50 square wave system, A = I + D (MatShift :92), GMRES restart 30 +
    ILU, rtol=atol=1e-5, maxits 1000; iterations printed at :138-148. The
    independent pipeline is SciPy's gmres with a numpy IKJ ILU(0) applied via
    SciPy triangular solves. At a moderate CFL both converge and the inner
    iteration counts must match within a small margin."""
    A, b = _wave_system_50x50(cfl=50.0)
    Aj = CSRMatrix.from_scipy(A, dtype=jnp.float64)
    M = pcs.ilu0(Aj)
    res = gmres(Aj.matvec, jnp.asarray(b), M=M.apply, restart=30,
                rtol=1e-5, atol=1e-5, maxiter=1000)
    assert bool(res.converged)
    ours = int(res.iters)

    x_ref, info, theirs = _scipy_ilu0_gmres(A, b, maxiter_restarts=34)
    assert info == 0

    # never slower than SciPy by more than 10% (hard); an iteration count
    # below 0.6x SciPy is only a canary (it could be a legitimately sharper
    # solver, not a broken convergence test — the true-residual assert below
    # is the correctness gate), so it warns instead of failing.
    # Measured: ours 22 vs scipy 29 — CGS2 + Givens tracks the true
    # preconditioned residual slightly more sharply than SciPy's MGS.
    assert ours <= 1.1 * theirs + 3, (ours, theirs)
    if ours < 0.6 * theirs:
        warnings.warn(f"GMRES+ILU0 iterations {ours} < 0.6x SciPy's {theirs}: "
                      "verify the convergence test is not passing early")

    # ours converges on the PRECONDITIONED residual (PETSc left-PC default,
    # KSPConvergedDefault) so the true residual lands near-but-above rtol
    bn = np.linalg.norm(b)
    assert np.linalg.norm(A @ np.asarray(res.x) - b) <= 1e-4 * bn
    x_direct = spla.spsolve(A, b)
    np.testing.assert_allclose(np.asarray(res.x), x_direct,
                               rtol=1e-3, atol=1e-3 * np.abs(x_direct).max())


@pytest.mark.skipif(not os.path.isdir("/root/reference/meshes"),
                    reason="reference mesh fixtures not available")
def test_gmres_ilu0_iteration_parity_meshcube():
    """Parity oracle on the reference's UNSTRUCTURED ctest config: GMRES
    restart 30 + ILU, rtol=atol=1e-5 on meshCube.med (the mesh every 3D
    driver is registered with, tests/CMakeLists.txt:34-38; solver config
    WaveSystem_SphericalExplosion_impl_seq.cxx:190-192,138-148, cfl=1e3/dim).
    Both pipelines must converge, with iteration counts in the same
    asymmetric band as the structured case (measured: ours 119, scipy 175)."""
    from circulantpreconditioner_tpu.mesh.med import read_med
    from circulantpreconditioner_tpu.models import WaveSystem

    m = read_med("/root/reference/meshes/meshCube.med")
    model = WaveSystem(m, cfl=1e3 / 3, dtype=jnp.float64)
    D = model.divergence.to_csr(jnp.float64).to_scipy()
    A = (sp.eye(D.shape[0]) + D).tocsr()
    b = np.asarray(model.initial_state(), dtype=np.float64)

    Aj = CSRMatrix.from_scipy(A, dtype=jnp.float64)
    res = gmres(Aj.matvec, jnp.asarray(b), M=pcs.ilu0(Aj).apply, restart=30,
                rtol=1e-5, atol=1e-5, maxiter=1000)
    assert bool(res.converged)
    ours = int(res.iters)

    _, info, theirs = _scipy_ilu0_gmres(A, b, maxiter_restarts=34)
    assert info == 0
    assert ours <= 1.1 * theirs + 3, (ours, theirs)
    if ours < 0.6 * theirs:
        warnings.warn(f"GMRES+ILU0 iterations {ours} < 0.6x SciPy's {theirs}: "
                      "verify the convergence test is not passing early")

    # left-PC converges on the PRECONDITIONED residual (PETSc semantics);
    # the TRUE residual lands near-but-above rtol (measured 1.3e-4 here)
    bn = np.linalg.norm(b)
    assert np.linalg.norm(A @ np.asarray(res.x) - b) <= 5e-4 * bn


def test_gmres_ilu0_nonconvergence_parity_reference_cfl():
    """At the reference's own cfl=1e3/dim the implicit wave system is stiff
    enough that GMRES+ILU(0) stalls — in BOTH implementations. The reference
    drivers log non-convergence and continue (impl_seq.cxx:138-148 prints the
    KSP reason); this framework reproduces the same behavior, and this test
    pins the parity of that behavior against SciPy."""
    A, b = _wave_system_50x50(cfl=1e3 / 2)
    Aj = CSRMatrix.from_scipy(A, dtype=jnp.float64)
    M = pcs.ilu0(Aj)
    res = gmres(Aj.matvec, jnp.asarray(b), M=M.apply, restart=30,
                rtol=1e-5, atol=1e-5, maxiter=90)
    assert not bool(res.converged)

    _, info, _ = _scipy_ilu0_gmres(A, b, maxiter_restarts=3)
    assert info != 0  # scipy stalls too


def test_ilu0_scan_schedule_matches_unrolled():
    """The O(1)-trace lax.scan triangular-solve schedule must reproduce the
    unrolled per-level apply exactly (identical arithmetic, only the
    scheduling differs), and auto must pick scan on deep level structures."""
    import jax.numpy as jnp

    from circulantpreconditioner_tpu.mesh.unstructured import kershaw_mesh
    from circulantpreconditioner_tpu.models import WaveSystem
    from circulantpreconditioner_tpu.ops.csr import CSRMatrix
    from circulantpreconditioner_tpu.solvers import preconditioners as pcs

    m = kershaw_mesh(((0.0, 1.0),) * 3, (6, 6, 6))
    model = WaveSystem(m, cfl=100.0, dtype=jnp.float64)
    import scipy.sparse as sp

    A = CSRMatrix.from_scipy(
        (sp.eye(model.divergence.shape[0])
         + model.divergence.to_csr(jnp.float64).to_scipy()).tocsr(),
        dtype=jnp.float64)
    pc_u = pcs.ilu0(A, schedule="unrolled")
    pc_s = pcs.ilu0(A, schedule="scan")
    pc_a = pcs.ilu0(A)  # auto
    assert max(pc_u.n_levels) > pc_u._SCAN_THRESHOLD
    assert pc_a.schedule == "scan"
    rng = np.random.default_rng(3)
    r = jnp.asarray(rng.random(A.shape[0]))
    z_u = np.asarray(pc_u.apply(r))
    z_s = np.asarray(pc_s.apply(r))
    # identical arithmetic up to XLA reduction-order roundoff (the uniform
    # K padding changes the tree-reduction shape)
    scale = np.abs(z_u).max()
    np.testing.assert_allclose(z_s, z_u, rtol=1e-12, atol=1e-12 * scale)
    # and it actually inverts LU: A z ~ r up to ILU(0) fill error pattern
    assert np.isfinite(z_s).all()


def test_lane_and_flat_layouts_agree():
    """The lane-tiled Krylov basis (layout='lane': V folded onto the 128-lane
    axis, including the n % 128 != 0 padding path) runs the identical
    arithmetic to the flat basis — same iteration count, same solution."""
    n = 20000  # >= the auto threshold, and NOT a multiple of 128
    rng = np.random.default_rng(5)
    A = sp.diags([np.full(n - 1, -0.3), np.full(n, 2.0), np.full(n - 1, -0.4)],
                 [-1, 0, 1]).tocsr()
    Aj = CSRMatrix.from_scipy(A, dtype=jnp.float64)
    b = jnp.asarray(rng.standard_normal(n))
    kw = dict(restart=20, rtol=1e-8, atol=1e-10, maxiter=400)
    res_f = make_gmres(Aj.matvec_partial(), layout="flat", **kw)(b, None)
    res_l = make_gmres(Aj.matvec_partial(), layout="lane", **kw)(b, None)
    assert bool(res_f.converged) and bool(res_l.converged)
    assert int(res_f.iters) == int(res_l.iters)
    np.testing.assert_allclose(np.asarray(res_l.x), np.asarray(res_f.x),
                               rtol=1e-10, atol=1e-10)
    bn = np.linalg.norm(np.asarray(b))
    assert np.linalg.norm(A @ np.asarray(res_l.x) - np.asarray(b)) < 1e-7 * bn
