"""End-to-end model tests: the six reference driver workloads in miniature.

Mirrors the ctest strategy (SURVEY.md §4) but with actual numerical
assertions (the reference only checks exit codes)."""

import numpy as np
import scipy.sparse.linalg as spla

import jax.numpy as jnp

from circulantpreconditioner_tpu.mesh import cartesian_mesh
from circulantpreconditioner_tpu.models import TransportEquation, WaveSystem, run_time_loop
from circulantpreconditioner_tpu.models.runner import scan_steps
from circulantpreconditioner_tpu.solvers import preconditioners as pcs


def test_transport_fft_driver_slice():
    """TransportEquationFFT_SphericalExplosion analog: implicit FFT stepping
    on a periodic structured grid at the reference's huge CFL."""
    m = cartesian_mesh(((-0.5, 0.5),) * 2, (16, 16), periodic=True)
    model = TransportEquation(m, velocity=[1.0, 0.0], cfl=1e3 / 2, dtype=jnp.float64)
    step = model.fft_stepper()
    u0 = model.initial_state()
    res = run_time_loop(step, u0, model.dt, tmax=0.05, ntmax=50, output_freq=10, log=None)
    u = np.asarray(res.state)
    # implicit upwind is monotone: values stay within [600, 650]
    assert u.min() > 599.999 and u.max() < 650.001
    # mass conservation on periodic grid
    np.testing.assert_allclose(u.sum(), np.asarray(u0).sum(), rtol=1e-10)


def test_transport_fft_equals_gmres_on_periodic():
    """FFT direct solve and GMRES on the assembled CSR must produce the same
    next state (same linear system)."""
    m = cartesian_mesh(((-0.5, 0.5),) * 2, (12, 10), periodic=True)
    model = TransportEquation(m, velocity=[1.0, 0.5], cfl=100.0, dtype=jnp.float64)
    u0 = model.initial_state()
    fft_step = model.fft_stepper()
    imp_step = model.implicit_stepper(rtol=1e-12, atol=1e-12)
    u_fft, _ = fft_step(u0)
    u_gmres, _, iters, *_ = imp_step(u0)
    np.testing.assert_allclose(np.asarray(u_fft), np.asarray(u_gmres), rtol=1e-8, atol=1e-8)


def test_transport_implicit_with_circulant_pc_one_iteration():
    m = cartesian_mesh(((-0.5, 0.5),) * 3, (6, 6, 6), periodic=True)
    model = TransportEquation(m, velocity=[1.0, 0.0, 0.0], cfl=1e3 / 3, dtype=jnp.float64)
    step = model.implicit_stepper(M=model.fft_operator.as_preconditioner(),
                                  rtol=1e-8, atol=1e-10)
    u1, dnorm, iters, resnorm, conv = step(model.initial_state())
    assert int(iters) <= 2


def test_transport_explicit_cfl_stable():
    m = cartesian_mesh(((-0.5, 0.5),) * 2, (16, 16), periodic=True)
    # explicit upwind stable iff sum of per-axis CFL ≤ 1; min_ratio = h/4 in
    # 2D so cfl=1 gives dt = h/(4|a|) → λx+λy = 0.25 ≤ 1 — fine.
    model = TransportEquation(m, velocity=[1.0, 0.0], cfl=1.0, dtype=jnp.float64)
    step = model.explicit_stepper()
    u = model.initial_state()
    for _ in range(20):
        u, _ = step(u)
    u = np.asarray(u)
    assert u.min() > 599.999 and u.max() < 650.001


def test_wave_explicit_driver_slice():
    """WaveSystem_SphericalExplosion_expl analog on the 2D wall-bounded
    square: explicit stepping is stable at cfl=1/dim and dissipates energy."""
    m = cartesian_mesh(((-0.5, 0.5),) * 2, (10, 10))
    model = WaveSystem(m, dtype=jnp.float64)
    step = model.explicit_stepper()
    U = model.initial_state()
    p0, _ = model.split_fields(U)
    n0 = np.linalg.norm(np.asarray(U))
    for _ in range(50):
        U, dn = step(U)
    assert np.isfinite(np.asarray(U)).all()
    p, v = model.split_fields(U)
    # pressure stays within the physically sensible envelope
    assert p.min() > 0 and p.max() < 160e5


def test_wave_implicit_matches_direct():
    """WaveSystem_impl analog: GMRES+ILU0 next state equals SciPy direct."""
    m = cartesian_mesh(((-0.5, 0.5),) * 2, (8, 8))
    model = WaveSystem(m, cfl=1e3 / 2, dtype=jnp.float64)
    U0 = model.initial_state()
    Acsr = model.divergence.to_csr(dtype=jnp.float64)
    import scipy.sparse as sp

    Asp = sp.eye(Acsr.shape[0]) + Acsr.to_scipy()
    from circulantpreconditioner_tpu.ops.csr import CSRMatrix

    AI = CSRMatrix.from_scipy(Asp.tocsr(), dtype=jnp.float64)
    M = pcs.ilu0(AI)
    step = model.implicit_stepper(M=M.apply, rtol=1e-10, atol=1e-12)
    U1, dn, iters, res, conv = step(U0)
    U_ref = spla.spsolve(Asp.tocsr(), np.asarray(U0))
    np.testing.assert_allclose(np.asarray(U1), U_ref, rtol=1e-6, atol=1e-4)
    assert int(iters) < 200


def test_wave_block_circulant_direct_solver():
    """Periodic structured wave: the block-circulant FFT direct solver steps
    the implicit system exactly (vs SciPy direct)."""
    m = cartesian_mesh(((-0.5, 0.5),) * 2, (8, 6), periodic=True)
    model = WaveSystem(m, cfl=50.0, dtype=jnp.float64)
    U0 = model.initial_state()
    step = model.block_fft_stepper()
    U1, _ = step(U0)
    import scipy.sparse as sp

    Asp = (sp.eye(model.divergence.shape[0]) + model.divergence.to_csr(jnp.float64).to_scipy()).tocsr()
    U_ref = spla.spsolve(Asp, np.asarray(U0))
    np.testing.assert_allclose(np.asarray(U1), U_ref, rtol=1e-7, atol=1e-3)


def test_run_time_loop_stationarity():
    m = cartesian_mesh(((-0.5, 0.5),) * 1, (32,), periodic=True)
    model = TransportEquation(m, velocity=[1.0], cfl=10.0, dtype=jnp.float64)
    step = model.fft_stepper()
    # constant initial state is already stationary
    u0 = jnp.ones(32, dtype=jnp.float64) * 600.0
    res = run_time_loop(step, u0, model.dt, tmax=1.0, ntmax=100, log=None)
    assert res.stationary and res.iterations == 1


def test_scan_steps_matches_python_loop():
    m = cartesian_mesh(((-0.5, 0.5),) * 2, (8, 8), periodic=True)
    model = TransportEquation(m, velocity=[1.0, 0.2], cfl=20.0, dtype=jnp.float64)
    step = model.fft_stepper()
    u0 = model.initial_state()
    u_scan, dnorms = scan_steps(step, u0, 5)
    u = u0
    for _ in range(5):
        u, _ = step(u)
    np.testing.assert_allclose(np.asarray(u_scan), np.asarray(u), atol=1e-12)
