"""Wall-BC DCT/DST block solver (ops/dct_wave.py) and its projection PC.

The key property: on a uniform cartesian grid with mirror walls (the
reference's Wall BC, /root/reference/src/WaveSystem.cxx:150-157), the
implicit upwind wave operator is diagonalized EXACTLY by mixed DCT-II/DST-II
transforms — asserted here against the assembled FV operator itself, to
machine precision in float64.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from circulantpreconditioner_tpu.mesh import cartesian_mesh
from circulantpreconditioner_tpu.mesh.unstructured import kershaw_mesh
from circulantpreconditioner_tpu.models import WaveSystem
from circulantpreconditioner_tpu.ops.assembly import wave_divergence_bsr
from circulantpreconditioner_tpu.ops.dct_wave import DCTBlockWaveSolver
from circulantpreconditioner_tpu.solvers import preconditioners as pcs
from circulantpreconditioner_tpu.solvers.circulant_pc import (
    BlockCirculantProjectionPC,
    DCTBlockProjectionPC,
)


@pytest.mark.parametrize(
    "n_xyz,bounds",
    [
        ((4, 3, 5), ((0, 1), (0, 0.8), (0, 1.2))),  # anisotropic 3D
        ((6, 4), ((0, 1), (0, 1))),                  # 2D
        ((7,), ((0, 1),)),                           # 1D
    ],
)
def test_exact_inverse_of_assembled_wall_operator(n_xyz, bounds):
    """solve() inverts I + D of the ASSEMBLED wall-BC operator exactly."""
    dim = len(n_xyz)
    mesh = cartesian_mesh(bounds, n_xyz)
    dt, c0 = 0.001, 700.0
    D = wave_divergence_bsr(mesh, dt, c0, jnp.float64)
    spacing = [(bounds[d][1] - bounds[d][0]) / n_xyz[d] for d in range(dim)]
    s = DCTBlockWaveSolver.create(tuple(reversed(n_xyz)), dim, dt, c0, spacing,
                                  jnp.float64, precision="highest")
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.normal(size=mesh.n_cells * (dim + 1)))
    x = s.solve(b)
    r = x + D.matvec(x) - b
    assert float(jnp.linalg.norm(r) / jnp.linalg.norm(b)) < 1e-11


def test_shaped_and_flat_inputs_agree():
    n_xyz = (4, 3, 5)
    mesh = cartesian_mesh(((0, 1),) * 3, n_xyz)
    s = DCTBlockWaveSolver.create(tuple(reversed(n_xyz)), 3, 0.01, 700.0,
                                  (0.25, 1 / 3, 0.2), jnp.float64)
    rng = np.random.default_rng(1)
    b = rng.normal(size=(5, 3, 4, 4))
    x1 = np.asarray(s.solve(jnp.asarray(b)))
    x2 = np.asarray(s.solve(jnp.asarray(b.reshape(-1))))
    np.testing.assert_allclose(x2, x1.reshape(-1), atol=1e-12)


def test_dct_pc_beats_periodic_pc_on_kershaw():
    """The wall-BC coarse operator matches the FV operator's boundaries;
    two-level DCT must need strictly fewer GMRES iterations than the
    periodic two-level PC (the mismatch the periodic variant's own docstring
    flags). Kershaw 8³, the reference's stiff config cfl=1e3/3."""
    mesh = kershaw_mesh(((0.0, 1.0),) * 3, (8,) * 3)
    model = WaveSystem(mesh, cfl=1e3 / 3, dtype=jnp.float32)
    pj = pcs.pbjacobi(model.divergence, shift=1.0)

    def iters(M):
        step = model.implicit_stepper(M=M, rtol=1e-5, atol=1e-5, maxiter=1000,
                                      side="right")
        out = step(model.initial_state())
        assert bool(np.asarray(out[4]))
        return int(np.asarray(out[2]))

    per = iters(pcs.additive(
        BlockCirculantProjectionPC(mesh, model.dt, model.c0, dtype=jnp.float32).apply, pj))
    dct = iters(pcs.additive(
        DCTBlockProjectionPC(mesh, model.dt, model.c0, dtype=jnp.float32).apply, pj))
    assert dct < per, (dct, per)


def test_wave_implicit_driver_dct2l(tmp_path):
    """CLI wiring: --pc dct2l runs and converges on a kershaw mesh."""
    from circulantpreconditioner_tpu.drivers import wave_implicit

    res = wave_implicit.main(
        ["--mesh-family", "kershaw", "6", "6", "6", "--pc", "dct2l",
         "--ntmax", "2", "--tmax", "1.0", "--result-dir", str(tmp_path)]
    )
    assert np.isfinite(np.asarray(res.state)).all()


def test_field_major_stepper_matches_cell_major():
    """dct_fft_stepper_fm (production loop: no per-step (…,nb)↔(nb,…)
    relayouts) follows the identical trajectory to the cell-major stepper."""
    mesh = cartesian_mesh(((0, 1), (0, 0.8), (0, 1.2)), (5, 4, 3))
    model = WaveSystem(mesh, cfl=300.0, dtype=jnp.float64)
    step = model.dct_fft_stepper()
    step_fm = model.dct_fft_stepper_fm()
    U = model.initial_state()
    G = model.pack_fm(U)
    for _ in range(4):
        U, dU = step(U)
        G, dG = step_fm(G)
        np.testing.assert_allclose(float(dG), float(dU), rtol=1e-12)
    np.testing.assert_allclose(model.unpack_fm(G), np.asarray(U), rtol=1e-12,
                               atol=1e-9 * float(jnp.abs(U).max()))
