"""Driver CLI smoke tests — the pytest analog of the reference's ctest runs
(each driver executable on a small default problem, tests/CMakeLists.txt:29-42)
but with numerical checks instead of exit-code-only."""

import glob
import os

import numpy as np
import pytest

from circulantpreconditioner_tpu.drivers import (  # noqa: F401  (import check)
    transport_fft,
    transport_implicit,
    wave_explicit,
    wave_implicit,
)


def _common(tmp_path, extra):
    return ["--tmax", "0.002", "--ntmax", "5", "--result-dir", str(tmp_path)] + extra


def test_transport_fft_driver(tmp_path):
    res = transport_fft.main(["10", "10", "--method", "fft"] + _common(tmp_path, []))
    u = np.asarray(res.state)
    assert u.min() > 599.0 and u.max() < 651.0


def test_transport_implicit_driver(tmp_path):
    res = transport_implicit.main(["10", "10"] + _common(tmp_path, []))
    assert np.isfinite(np.asarray(res.state)).all()


def test_transport_implicit_kershaw_circulant_pc(tmp_path):
    res = transport_implicit.main(
        ["4", "4", "4", "--mesh-family", "kershaw", "--pc", "circulant"]
        + _common(tmp_path, [])
    )
    assert np.isfinite(np.asarray(res.state)).all()


def test_wave_explicit_driver_vtk(tmp_path):
    res = wave_explicit.main(["8", "8", "--vtk", "--output-freq", "2"] + _common(tmp_path, []))
    assert np.isfinite(np.asarray(res.state)).all()
    assert glob.glob(os.path.join(str(tmp_path), "*.vtk"))


def test_wave_implicit_driver_ilu(tmp_path):
    res = wave_implicit.main(["8", "8", "--pc", "ilu0"] + _common(tmp_path, []))
    p, v = np.asarray(res.state).reshape(-1, 3)[:, 0], None
    assert np.isfinite(p).all()


def test_wave_implicit_blockfft_periodic(tmp_path):
    res = wave_implicit.main(["8", "8", "--pc", "blockfft", "--periodic"] + _common(tmp_path, []))
    assert np.isfinite(np.asarray(res.state)).all()


def test_wave_implicit_checkpoint_resume(tmp_path):
    from circulantpreconditioner_tpu.io import load_checkpoint

    wave_implicit.main(["8", "8", "--pc", "pbjacobi", "--checkpoint-freq", "1"]
                       + _common(tmp_path, []))
    ckpts = glob.glob(os.path.join(str(tmp_path), "*_ckpt.npz"))
    assert ckpts
    state, t, it, _ = load_checkpoint(ckpts[0])
    assert it >= 1 and t > 0 and np.isfinite(state).all()


def test_transport_fft_driver_sharded_slab(tmp_path):
    res = transport_fft.main(["8", "8", "8", "--shard", "slab"] + _common(tmp_path, []))
    u = np.asarray(res.state)
    assert u.shape == (8, 8, 8)
    assert u.min() > 599.0 and u.max() < 651.0


def test_transport_fft_driver_sharded_pencil(tmp_path):
    res = transport_fft.main(
        ["6", "8", "8", "--shard", "pencil", "--pq", "4", "2"] + _common(tmp_path, []))
    u = np.asarray(res.state)
    assert u.min() > 599.0 and u.max() < 651.0


def test_wave_implicit_driver_sharded_rows(tmp_path):
    res = wave_implicit.main(["10", "10", "--shard", "rows", "--pc", "none"]
                             + _common(tmp_path, []))
    assert np.isfinite(np.asarray(res.state)).all()
    assert np.asarray(res.state).size == 10 * 10 * 3  # unsharded/unpadded


def test_diffusion_driver_cg(tmp_path):
    from circulantpreconditioner_tpu.drivers import diffusion_implicit

    res = diffusion_implicit.main(["10", "10"] + _common(tmp_path, []))
    u = np.asarray(res.state)
    assert u.min() > 599.0 and u.max() < 651.0


def test_diffusion_driver_fft_periodic(tmp_path):
    from circulantpreconditioner_tpu.drivers import diffusion_implicit

    res = diffusion_implicit.main(["8", "8", "8", "--method", "fft"] + _common(tmp_path, []))
    u = np.asarray(res.state)
    assert u.min() > 599.0 and u.max() < 651.0


def test_chunked_time_loop_matches_stepwise(tmp_path):
    """chunk>1 (device-resident lax.scan between outputs) gives the same
    final state and iteration count as the step-by-step host loop."""
    r1 = transport_fft.main(["10", "10", "--ntmax", "8", "--tmax", "1e9", "--chunk", "1"]
                            + _common(tmp_path, []))
    r4 = transport_fft.main(["10", "10", "--ntmax", "8", "--tmax", "1e9", "--chunk", "4"]
                            + _common(tmp_path, []))
    assert r1.iterations == r4.iterations
    np.testing.assert_allclose(np.asarray(r4.state), np.asarray(r1.state),
                               rtol=1e-6, atol=1e-6)


def test_chunked_sharded_wave_driver(tmp_path):
    """Chunked device loop composes with the sharded preconditioned solve."""
    res = wave_implicit.main(["10", "10", "--shard", "rows", "--pc", "pbjacobi",
                              "--ntmax", "4", "--chunk", "2"]
                             + _common(tmp_path, []))
    assert np.isfinite(np.asarray(res.state)).all()


def test_wave_explicit_driver_sharded_slab(tmp_path):
    """expl_mpi analog: distributed explicit MatMult loop (slab stencil,
    ppermute plane halos) must match the single-device run exactly.
    Reference: WaveSystem_SphericalExplosion_expl_mpi.cxx:90-135."""
    res_s = wave_explicit.main(
        ["4", "4", "8", "--mesh-family", "kershaw", "--shard", "slab"]
        + _common(tmp_path, []))
    res_1 = wave_explicit.main(
        ["4", "4", "8", "--mesh-family", "kershaw"] + _common(tmp_path, []))
    # f32 accumulation-order roundoff between the stencil and slab paths
    np.testing.assert_allclose(np.asarray(res_s.state), np.asarray(res_1.state),
                               rtol=1e-3, atol=1e-2)


def test_wave_explicit_driver_sharded_rows(tmp_path):
    res_s = wave_explicit.main(["8", "8", "--shard", "rows"] + _common(tmp_path, []))
    res_1 = wave_explicit.main(["8", "8"] + _common(tmp_path, []))
    np.testing.assert_allclose(np.asarray(res_s.state), np.asarray(res_1.state),
                               rtol=1e-3, atol=1e-2)


def test_wave_implicit_driver_sharded_circulant2l(tmp_path):
    """Flagship composition at driver level: row-sharded GMRES with the
    additive two-level distributed circulant PC on a 3D Kershaw mesh —
    the preconditioned impl_mpi analog the reference was building toward
    (ToDo.md:1 + WaveSystem_..._impl_mpi.cxx GMRES loop)."""
    res = wave_implicit.main(
        ["4", "4", "4", "--mesh-family", "kershaw", "--shard", "rows",
         "--pc", "circulant2l", "--ntmax", "3"]
        + _common(tmp_path, []))
    state = np.asarray(res.state)
    assert state.size == 4 * 4 * 4 * 4  # unsharded/unpadded (p + 3 velocities)
    assert np.isfinite(state).all()
    its = [d["extras"][0] for d in res.diagnostics if d["extras"]]
    assert its and max(its) < 1000  # GMRES converged within maxits each step


def test_wave_implicit_driver_dct2lm(tmp_path):
    """Multiplicative DCT two-level PC in the field-major GMRES loop."""
    res = wave_implicit.main(
        ["4", "4", "4", "--mesh-family", "kershaw", "--pc", "dct2lm",
         "--ntmax", "3"] + _common(tmp_path, []))
    state = np.asarray(res.state)
    assert state.size == 4 * 4 * 4 * 4
    assert np.isfinite(state).all()
    its = [d["extras"][0] for d in res.diagnostics if d["extras"]]
    assert its and max(its) < 1000


def test_transport_implicit_structured_circulant_pc(tmp_path):
    """On a wall/Neumann STRUCTURED grid the periodic circulant PC differs
    from the operator only on the boundary layer: GMRES must converge in a
    handful of iterations (the acceleration the reference project was built
    to demonstrate, ToDo.md:1 / PCSHELLFft_3D.cxx)."""
    res = transport_implicit.main(
        ["12", "12", "12", "--pc", "circulant", "--ntmax", "3"]
        + _common(tmp_path, []))
    assert np.isfinite(np.asarray(res.state)).all()
    its = [d["extras"][0] for d in res.diagnostics if d["extras"]]
    assert its and max(its) <= 4, its


def test_wave_implicit_dctfft_direct_matches_gmres(tmp_path):
    """The wall-BC DCT/DST DIRECT solve (no GMRES) reproduces the
    GMRES+ILU implicit trajectory on the reference's default cartesian
    wall mesh."""
    common = ["--ntmax", "3", "--tmax", "0.002", "--result-dir", str(tmp_path),
              "--f64"]
    r_dct = wave_implicit.main(["8", "8", "--pc", "dctfft"] + common)
    r_ilu = wave_implicit.main(["8", "8", "--pc", "ilu0", "--rtol", "1e-12",
                                "--atol", "1e-12"] + common)
    a, b = np.asarray(r_dct.state), np.asarray(r_ilu.state)
    np.testing.assert_allclose(a, b, rtol=1e-7, atol=1e-7 * np.abs(b).max())


def test_wave_implicit_driver_gridmg(tmp_path):
    """--pc gridmg: the geometric-Galerkin grid V-cycle on a recovered-grid
    mesh (round-5 headline PC for the Kershaw families)."""
    res = wave_implicit.main(["--mesh-family", "kershaw", "6", "6", "6",
                              "--pc", "gridmg"] + _common(tmp_path, []))
    assert res.iterations >= 1


def test_wave_implicit_driver_aggvcycle(tmp_path):
    """--pc aggvcycle: the algebraic aggregation V-cycle (the warped-fixture
    PC) through the driver path."""
    res = wave_implicit.main(["--mesh-family", "tetra", "4", "4", "4",
                              "--pc", "aggvcycle"] + _common(tmp_path, []))
    assert res.iterations >= 1
