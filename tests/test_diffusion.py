"""DiffusionEquation tests — the reference's named next capability
(ToDo.md:5-8): diffusion model + FFT context + exact-solution verification."""

import numpy as np
import pytest

import jax.numpy as jnp

from circulantpreconditioner_tpu.mesh import cartesian_mesh
from circulantpreconditioner_tpu.mesh.unstructured import kershaw_mesh
from circulantpreconditioner_tpu.models import DiffusionEquation
from circulantpreconditioner_tpu.solvers.circulant_pc import DiffusionProjectionPC


def test_operator_spd_and_conservative():
    """L symmetric, PSD; constants in the kernel on a periodic mesh."""
    m = cartesian_mesh(((0, 1),) * 2, (6, 5), periodic=True)
    d = DiffusionEquation(m, nu=0.7, cfl=10.0, dtype=jnp.float64)
    A = np.asarray(d.divergence.to_dense())
    np.testing.assert_allclose(A, A.T, atol=1e-14)
    w = np.linalg.eigvalsh(A)
    assert w.min() > -1e-12
    np.testing.assert_allclose(A @ np.ones(m.n_cells), 0.0, atol=1e-12)


def test_operator_symmetric_on_warped_periodic_mesh():
    """On a warped (Kershaw) periodic mesh the two sides of a periodic face
    pair have different face-to-center distances; the assembly must use one
    shared pair distance so the unscaled flux form V·L stays symmetric
    (V = diag cell volumes) — the SPD assumption behind the CG stepper."""
    m = kershaw_mesh(((0.0, 1.0),) * 3, (4, 3, 3))
    m.set_periodic()
    d = DiffusionEquation(m, nu=0.3, cfl=5.0, dtype=jnp.float64)
    A = np.asarray(d.divergence.to_dense())
    VA = m.cell_volume[:, None] * A
    np.testing.assert_allclose(VA, VA.T, atol=1e-12 * np.abs(VA).max())
    np.testing.assert_allclose(A @ np.ones(m.n_cells), 0.0, atol=1e-10)


def test_exact_discrete_mode_decay_implicit():
    """Implicit Euler damps a periodic Fourier mode by exactly
    (1 + dt·λ_h(k))⁻¹ per step — machine-precision oracle (ToDo.md:8),
    via BOTH the CG stepper and the FFT direct stepper."""
    n = 16
    m = cartesian_mesh(((0.0, 1.0),) * 1, (n,), periodic=True)
    d = DiffusionEquation(m, nu=0.05, cfl=40.0, dtype=jnp.float64)
    x = m.cell_center[:, 0]
    u0 = np.sin(2 * np.pi * 3 * x)
    factor = d.exact_mode_decay((3,), n_steps=4)

    for make in (lambda: d.implicit_stepper(rtol=1e-13, atol=1e-13, maxiter=500),
                 lambda: d.fft_stepper()):
        u = jnp.asarray(u0)
        step = make()
        for _ in range(4):
            u = step(u)[0]
        np.testing.assert_allclose(np.asarray(u), factor * u0, atol=1e-9)


def test_exact_continuous_solution_convergence():
    """Against the exact PDE solution e^{−ν(2πk)²t} sin(2πkx): the discrete
    decay converges at O(h² + dt) — errors shrink with refinement."""
    errs = []
    for n, cfl in ((16, 4.0), (32, 4.0)):
        m = cartesian_mesh(((0.0, 1.0),) * 1, (n,), periodic=True)
        d = DiffusionEquation(m, nu=0.02, cfl=cfl, dtype=jnp.float64)
        steps = max(int(round(0.5 / d.dt)), 1)
        x = m.cell_center[:, 0]
        u = jnp.asarray(np.sin(2 * np.pi * x))
        step = d.fft_stepper()
        for _ in range(steps):
            u = step(u)[0]
        t = steps * d.dt
        exact = np.exp(-d.nu * (2 * np.pi) ** 2 * t) * np.sin(2 * np.pi * x)
        errs.append(np.abs(np.asarray(u) - exact).max())
    assert errs[1] < 0.5 * errs[0]  # refining h (and dt ∝ h²) shrinks error


def test_fft_equals_cg_3d():
    m = cartesian_mesh(((0, 1),) * 3, (6, 5, 4), periodic=True)
    d = DiffusionEquation(m, nu=0.3, cfl=100.0, dtype=jnp.float64)
    u0 = d.initial_state()
    u_fft = d.fft_stepper()(u0)[0]
    u_cg = d.implicit_stepper(rtol=1e-12, atol=1e-12)(u0)[0]
    np.testing.assert_allclose(np.asarray(u_fft), np.asarray(u_cg), atol=1e-8)


def test_varying_stencil_on_kershaw_matches_matrix():
    m = kershaw_mesh(((0, 1),) * 3, (4, 4, 3))
    d = DiffusionEquation(m, nu=1.0, cfl=50.0, dtype=jnp.float64)
    D = d.divergence_op()  # auto → varying
    x = np.random.default_rng(0).random(m.n_cells)
    np.testing.assert_allclose(np.asarray(D(jnp.asarray(x))),
                               np.asarray(d.divergence.matvec(jnp.asarray(x))),
                               atol=1e-13)


def test_diffusion_projection_pc_accelerates():
    """FFTPrecDiffusionContext analog: CG with the projection PC needs fewer
    iterations than plain CG on a stiff Kershaw diffusion system."""
    m = kershaw_mesh(((0, 1),) * 3, (8, 8, 8))
    d = DiffusionEquation(m, nu=1.0, cfl=5e3, dtype=jnp.float64)
    u0 = d.initial_state()
    res_plain = d.implicit_stepper(rtol=1e-8, atol=1e-10, maxiter=2000)(u0)
    pc = DiffusionProjectionPC(m, d.dt, d.nu, dtype=jnp.float64)
    # the projection PC is not symmetric → GMRES, not preconditioned CG
    res_pc = d.implicit_stepper(M=pc.apply, rtol=1e-8, atol=1e-10, maxiter=2000,
                                method="gmres")(u0)
    assert bool(np.asarray(res_pc[4])) and bool(np.asarray(res_plain[4]))
    assert int(res_pc[2]) < 0.7 * int(res_plain[2]), (int(res_pc[2]), int(res_plain[2]))
    np.testing.assert_allclose(np.asarray(res_pc[0]), np.asarray(res_plain[0]), atol=1e-5)


def test_explicit_stable_at_cfl_below_one():
    m = cartesian_mesh(((0, 1),) * 2, (12, 12), periodic=True)
    d = DiffusionEquation(m, nu=0.1, cfl=0.9, dtype=jnp.float64)
    u = d.initial_state()
    step = d.explicit_stepper()
    for _ in range(50):
        u = step(u)[0]
    u = np.asarray(u)
    assert u.min() >= 599.0 and u.max() <= 651.0  # maximum principle holds
