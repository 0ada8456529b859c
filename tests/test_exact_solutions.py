"""Exact-solution verification for the transport equation (reference
ToDo.md:8: 'ajouter des solutions exactes du transport et de la diffusion' —
the diffusion half lives in tests/test_diffusion.py)."""

import numpy as np

import jax.numpy as jnp

from circulantpreconditioner_tpu.mesh import cartesian_mesh
from circulantpreconditioner_tpu.models import TransportEquation


def test_explicit_upwind_unit_cfl_is_exact_shift():
    """At λ = a·dt/h = 1 the explicit upwind scheme advects EXACTLY one cell
    per step (the classic unit-CFL property) — machine-precision oracle."""
    n = 32
    m = cartesian_mesh(((0.0, 1.0),), (n,), periodic=True)
    h = 1.0 / n
    t = TransportEquation(m, velocity=[1.0], dt=h, dtype=jnp.float64)
    rng = np.random.default_rng(0)
    u0 = rng.random(n)
    u = jnp.asarray(u0)
    step = t.explicit_stepper()
    for _ in range(5):
        u = step(u)[0]
    np.testing.assert_allclose(np.asarray(u), np.roll(u0, 5), atol=1e-13)


def test_implicit_fft_mode_decay_matches_symbol():
    """One implicit step multiplies periodic mode k by 1/(1 + λ(1 − e^{−iθ}))
    — the discrete symbol; exact for the FFT direct solver."""
    n = 24
    m = cartesian_mesh(((0.0, 1.0),), (n,), periodic=True)
    h = 1.0 / n
    lam = 3.7
    t = TransportEquation(m, velocity=[1.0], dt=lam * h, dtype=jnp.float64)
    x = m.cell_center[:, 0]
    k = 2
    u0 = np.exp(2j * np.pi * k * x)
    theta = 2 * np.pi * k / n
    gain = 1.0 / (1.0 + lam * (1.0 - np.exp(-1j * theta)))
    step = t.fft_stepper(method="fft")
    ur = np.asarray(step(jnp.asarray(u0.real))[0])
    ui = np.asarray(step(jnp.asarray(u0.imag))[0])
    np.testing.assert_allclose(ur + 1j * ui, gain * u0, atol=1e-12)


def test_transport_convergence_to_continuous():
    """Against the exact PDE solution u0(x − at): refining h (fixed unit
    CFL ratio → dt ∝ h) shrinks the error (first-order upwind)."""
    errs = []
    for n in (32, 64):
        m = cartesian_mesh(((0.0, 1.0),), (n,), periodic=True)
        h = 1.0 / n
        t = TransportEquation(m, velocity=[1.0], dt=0.5 * h, dtype=jnp.float64)
        steps = int(round(0.25 / t.dt))
        x = m.cell_center[:, 0]
        u = jnp.asarray(np.sin(2 * np.pi * x))
        step = t.explicit_stepper()
        for _ in range(steps):
            u = step(u)[0]
        exact = np.sin(2 * np.pi * (x - steps * t.dt))
        errs.append(np.abs(np.asarray(u) - exact).max())
    assert errs[1] < 0.6 * errs[0]
